package graft

import graft.ops.Pipeline
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** The Mongo-pipeline builder desugars each stage to the expected
  * DataFrame transformation (NoSQL Q1's exact stage sequence, plus
  * unwind/addFields/firstBy). */
class PipelineSpec extends AnyFunSuite with SharedSpark {

  private lazy val docs = {
    import spark.implicits._
    Seq(
      ("A", "tech", 10.0, 1.2), ("B", "tech", 30.0, 0.8),
      ("C", "energy", 50.0, 1.5), ("D", "energy", 20.0, 0.5),
      ("E", "util", 5.0, 1.0)
    ).toDF("sym", "sector", "price", "beta")
  }

  test("$match → $group/$avg → $sort → $limit (NoSQL Q1 shape)") {
    val out = Pipeline(docs)
      .matchStage(col("price") > 8)
      .group(col("sector"), avg("price").as("average"))
      .sort(desc("average"), col("_id"))
      .limit(1)
      .result.collect()
    assert(out.length === 1)
    assert(out.head.getString(0) === "energy")   // avg(50,20)=35 > avg(10,30)=20
    assert(out.head.getDouble(1) === 35.0)
  }

  test("$group with $push + $unwind round-trips elements") {
    val grouped = Pipeline(docs)
      .group(col("sector"), collect_list(col("sym")).as("syms"))
    val unwound = grouped.unwind("syms").result
      .select(col("_id"), col("syms").as("sym"))
    assert(unwound.count() === docs.count())
    assert(unwound.collect().map(_.getString(1)).toSet ===
      docs.collect().map(_.getString(0)).toSet)
  }

  test("$group with only _id is distinct (Mongo dedup idiom)") {
    val out = Pipeline(docs).group(col("sector")).result
    assert(out.columns.toSeq === Seq("_id"))
    assert(out.collect().map(_.getString(0)).sorted.toSeq === Seq("energy", "tech", "util"))
  }

  test("$addFields + $project") {
    val out = Pipeline(docs)
      .addFields("pb" -> col("price") * col("beta"))
      .project(col("sym"), col("pb"))
      .result
    assert(out.columns.toSeq === Seq("sym", "pb"))
    val a = out.collect().map(r => r.getString(0) -> r.getDouble(1)).toMap
    assert(a("A") === 12.0)
  }

  test("firstBy is the deterministic $sort+$first (argmin per group)") {
    val out = Pipeline(docs)
      .firstBy(col("sector"), order = Seq(col("beta"), col("sym")),
        keep = Seq(col("sym"), col("beta")))
      .result.collect().map(r => r.getString(0) -> r.getString(1)).toMap
    assert(out === Map("tech" -> "B", "energy" -> "D", "util" -> "E"))
  }
}
