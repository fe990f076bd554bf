package graft

import graft.ext.{Multimodal, Sampling, TextAnalysis}
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Unit specs for the round-2 operators whose primary proof is the
  * DuckDB gate — golden values and edge cases the gate's real-data
  * runs may never hit. */
class RoundTwoOpsSpec extends AnyFunSuite with SharedSpark {

  private def one(text: String, c: org.apache.spark.sql.Column): Any = {
    import spark.implicits._
    Seq(text).toDF("text").select(c).head().get(0)
  }

  test("rollingHash: 31-polynomial goldens and edge cases") {
    // "abc" under h = h*31 + cp is the classic Java hashCode value
    assert(one("abc", TextAnalysis.rollingHash(col("text"))) === 96354L)
    assert(one("", TextAnalysis.rollingHash(col("text"))) === 0L)
    // order sensitivity (unlike a bag-of-words fingerprint)
    assert(one("ab", TextAnalysis.rollingHash(col("text"))) !==
      one("ba", TextAnalysis.rollingHash(col("text"))))
    // surrogate pair advances as ONE code point
    assert(one("😀", TextAnalysis.rollingHash(col("text"))) === 128512L)
  }

  test("sampleFrames: stride selection, ragged tail, empty payload") {
    val text = "a" * 600 // frames of 256: [0,256) [256,512) [512,600)
    def frames(stride: Int) =
      one(text, Multimodal.sampleFrames(col("text"), 256, stride))
        .asInstanceOf[scala.collection.Seq[String]]
    assert(frames(1).map(_.length) === Seq(256, 256, 88))
    assert(frames(2).map(_.length) === Seq(256, 88)) // frames 0 and 2
    assert(frames(4).map(_.length) === Seq(256))     // frame 0 only
    assert(one("", Multimodal.sampleFrames(col("text"), 256, 4))
      .asInstanceOf[scala.collection.Seq[String]].isEmpty)
  }

  test("minstdBucket: in-range, deterministic, and ANSI-safe on huge keys") {
    import spark.implicits._
    val df = (Seq(0L, 1L, 17L, Long.MaxValue, Long.MaxValue - 1)
      ++ (0L until 1000L)).toDF("k")
    val buckets = df.select(Sampling.minstdBucket(col("k"), 10).as("b")).collect()
      .map(_.getLong(0))
    assert(buckets.forall(b => b >= 0 && b < 10)) // no overflow error under ANSI
    // key 0 maps to bucket 0 (Lehmer of 0 is 0); nonzero keys spread
    assert(buckets.head === 0L)
    val spread = df.filter(col("k") > 0)
      .select(Sampling.minstdBucket(col("k"), 10).as("b"))
      .groupBy("b").count().collect()
    assert(spread.length === 10, s"all 10 buckets hit, got ${spread.length}")
    // stable across partitionings
    val a = df.select(col("k"), Sampling.minstdBucket(col("k"), 97).as("b"))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    val b = df.repartition(13)
      .select(col("k"), Sampling.minstdBucket(col("k"), 97).as("b"))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(a === b)
  }
}
