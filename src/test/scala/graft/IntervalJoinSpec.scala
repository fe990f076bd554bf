package graft

import graft.ops.IntervalJoin
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

class IntervalJoinSpec extends AnyFunSuite with SharedSpark {

  private def pairs(bucketWidth: Long): Set[(String, String)] = {
    import spark.implicits._
    val points = Seq(("p0", 0L), ("p1", 10L), ("p2", 15L), ("p3", 99L), ("p4", 20L))
      .toDF("pid", "x")
    val intervals = Seq(
      ("i_all", 0L, 100L),    // covers everything
      ("i_low", 5L, 16L),     // p1, p2
      ("i_empty", 10L, 10L),  // empty [10,10) matches nothing
      ("i_edge", 15L, 21L),   // p2, p4 — hi is exclusive, lo inclusive
      ("i_none", 40L, 50L))   // no points
      .toDF("iid", "lo", "hi")
    IntervalJoin.joinPointsToIntervals(points, col("x"), intervals,
        col("lo"), col("hi"), bucketWidth)
      .select("pid", "iid").collect().map(r => (r.getString(0), r.getString(1))).toSet
  }

  private val expected = Set(
    "p0" -> "i_all", "p1" -> "i_all", "p2" -> "i_all", "p3" -> "i_all", "p4" -> "i_all",
    "p1" -> "i_low", "p2" -> "i_low",
    "p2" -> "i_edge", "p4" -> "i_edge")

  test("half-open semantics, empty intervals, no matches — exact pair set") {
    assert(pairs(bucketWidth = 8L) === expected)
  }

  test("result is bucket-width independent (incl. width 1 and width >> span)") {
    for (w <- Seq(1L, 3L, 16L, 1000L)) assert(pairs(w) === expected, s"width $w")
  }

  test("duplicate-free: a pair meets in exactly the point's bucket") {
    import spark.implicits._
    // interval spanning many buckets must still yield ONE row per point
    val points = (0L until 50L).map(i => (s"p$i", i)).toDF("pid", "x")
    val intervals = Seq(("i", 0L, 50L)).toDF("iid", "lo", "hi")
    val out = IntervalJoin.joinPointsToIntervals(points, col("x"), intervals,
      col("lo"), col("hi"), bucketWidth = 4L)
    assert(out.count() === 50L)
    assert(out.select("pid").distinct().count() === 50L)
  }

  test("matches the naive predicate join on random data") {
    import spark.implicits._
    val rnd = new scala.util.Random(7)
    val points = (0 until 300).map(i => (i.toLong, rnd.nextInt(1000).toLong))
      .toDF("pid", "x")
    val intervals = (0 until 120).map { i =>
      val lo = rnd.nextInt(1000).toLong
      (i.toLong, lo, lo + rnd.nextInt(80).toLong)
    }.toDF("iid", "lo", "hi")
    val fast = IntervalJoin.joinPointsToIntervals(points, col("x"), intervals,
        col("lo"), col("hi"), bucketWidth = 64L)
      .select("pid", "iid").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val naive = points.join(intervals, col("x") >= col("lo") && col("x") < col("hi"))
      .select("pid", "iid").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(fast === naive)
  }
}
