package graft

import graft.ops.RelationalOps
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

class TopKStructsSpec extends AnyFunSuite with SharedSpark {

  test("topKPerGroup equals the window row_number idiom on real data") {
    val cust = graft.sources.Tables(spark, sf0001).table("customer")
    val viaAgg = RelationalOps.topKPerGroup(cust,
      Seq(col("c_nationkey")), struct(col("c_acctbal"), col("c_custkey")), k = 3)
      .select("c_nationkey", "c_custkey", "c_acctbal")
      .collect().map(r => (r.getInt(0), r.getLong(1), r.getDouble(2))).toSet
    val w = Window.partitionBy("c_nationkey").orderBy("c_acctbal", "c_custkey")
    val viaWindow = cust.withColumn("rn", row_number().over(w)).filter(col("rn") <= 3)
      .select("c_nationkey", "c_custkey", "c_acctbal")
      .collect().map(r => (r.getInt(0), r.getLong(1), r.getDouble(2))).toSet
    assert(viaAgg === viaWindow)
  }

  test("groups smaller than k return all rows; result is sorted ascending") {
    import spark.implicits._
    val df = Seq(("g1", 3.0, 1L), ("g1", 1.0, 2L), ("g2", 5.0, 3L)).toDF("g", "v", "id")
    val out = graft.functions.TopKStructs
      .topKStructs(struct(col("v"), col("id")), 5)
    val got = df.groupBy("g").agg(out.as("t")).orderBy("g").collect()
      .map(r => r.getString(0) -> r.getSeq[org.apache.spark.sql.Row](1).map(_.getDouble(0)))
    assert(got.toSeq === Seq("g1" -> Seq(1.0, 3.0), "g2" -> Seq(5.0)))
  }

  test("partition-invariant (partial heaps merge correctly)") {
    import spark.implicits._
    val big = (1 to 5000).map(i => (i % 7, (i * 37 % 1000).toDouble, i.toLong)).toDF("g", "v", "id")
    val a = RelationalOps.topKPerGroup(big, Seq(col("g")),
      struct(col("v"), col("id")), 10).collect()
      .map(r => (r.getInt(0), r.getDouble(1), r.getLong(2))).toSet
    val b = RelationalOps.topKPerGroup(big.repartition(13), Seq(col("g")),
      struct(col("v"), col("id")), 10).collect()
      .map(r => (r.getInt(0), r.getDouble(1), r.getLong(2))).toSet
    assert(a === b)
    assert(a.groupBy(_._1).forall(_._2.size == 10))
  }
}
