package graft

import graft.ops.AsofJoin
import org.scalatest.funsuite.AnyFunSuite

class AsofJoinSpec extends AnyFunSuite with SharedSpark {

  test("backward as-of: latest right row at-or-before, per key; NULL when none") {
    import spark.implicits._
    val quotes = Seq(
      ("A", 1L, 10.0), ("A", 5L, 11.0), ("A", 9L, 12.0),
      ("B", 4L, 20.0)
    ).toDF("sym", "qt", "px")
    val trades = Seq(
      ("A", 0L, "t0"),   // before any quote → NULL
      ("A", 5L, "t1"),   // equal ts → inclusive match (11.0)
      ("A", 7L, "t2"),   // between quotes → 11.0
      ("A", 99L, "t3"),  // after all → 12.0
      ("B", 3L, "t4"),   // before B's only quote → NULL
      ("C", 5L, "t5")    // key with no right rows → NULL
    ).toDF("sym", "tt", "tid")

    val out = AsofJoin.asofJoin(trades, quotes, "sym", "tt", "qt", Seq("px"))
      .collect().map(r => r.getAs[String]("tid") ->
        (if (r.isNullAt(r.fieldIndex("asof_px"))) None else Some(r.getAs[Double]("asof_px"))))
      .toMap
    assert(out === Map(
      "t0" -> None, "t1" -> Some(11.0), "t2" -> Some(11.0),
      "t3" -> Some(12.0), "t4" -> None, "t5" -> None))
  }

  test("within bound nulls stale matches exactly as if no right row existed") {
    import spark.implicits._
    val quotes = Seq(("A", 1L, 10.0), ("A", 5L, 11.0), ("B", 4L, 20.0))
      .toDF("sym", "qt", "px")
    val trades = Seq(
      ("A", 5L, "fresh"),   // age 0 ≤ 3 → kept
      ("A", 8L, "edge"),    // age 3 ≤ 3 → kept (inclusive)
      ("A", 9L, "stale"),   // age 4 > 3 → nulled
      ("B", 4L, "b0"),      // age 0 → kept
      ("C", 9L, "none")     // no match at all
    ).toDF("sym", "tt", "tid")
    val out = AsofJoin.asofJoin(trades, quotes, "sym", "tt", "qt", Seq("px"),
        within = Some((l, r) => l - r <= 3L))
      .collect().map { r =>
        val px = if (r.isNullAt(r.fieldIndex("asof_px"))) None
                 else Some(r.getAs[Double]("asof_px"))
        val qt = if (r.isNullAt(r.fieldIndex("asof_qt"))) None
                 else Some(r.getAs[Long]("asof_qt"))
        r.getAs[String]("tid") -> ((px, qt))
      }.toMap
    assert(out === Map(
      "fresh" -> ((Some(11.0), Some(5L))),
      "edge"  -> ((Some(11.0), Some(5L))),
      "stale" -> ((None, None)),          // BOTH value and ts null out
      "b0"    -> ((Some(20.0), Some(4L))),
      "none"  -> ((None, None))))
  }

  test("randomized cross-check vs brute-force point-in-time lookup") {
    import spark.implicits._
    val rnd = new scala.util.Random(42)
    val right = (1 to 300).map(_ => (rnd.nextInt(8), rnd.nextInt(1000).toLong, rnd.nextDouble()))
      .distinct.toDF("k", "t", "v")
    val left = (1 to 150).map(i => (rnd.nextInt(10), rnd.nextInt(1200).toLong, s"L$i"))
      .toDF("k", "t", "id")
    val got = AsofJoin.asofJoin(left, right, "k", "t", "t", Seq("v"))
      .collect().map(r => r.getAs[String]("id") ->
        (if (r.isNullAt(r.fieldIndex("asof_v"))) None else Some(r.getAs[Double]("asof_v")))).toMap
    // driver-side reference: latest right (t, v) with t <= leftT per key,
    // max by (t, v) to break equal-timestamp ties the same way
    val rightRows = right.collect().map(r => (r.getInt(0), r.getLong(1), r.getDouble(2)))
    left.collect().foreach { lr =>
      val (k, t, id) = (lr.getInt(0), lr.getLong(1), lr.getString(2))
      val cands = rightRows.filter(r => r._1 == k && r._2 <= t)
      val expected = if (cands.isEmpty) None
        else Some(cands.maxBy(r => (r._2, r._3))._3)
      val tied = cands.nonEmpty && cands.count(_._2 == cands.maxBy(_._2)._2) > 1
      if (!tied) assert(got(id) === expected, s"left row $id (k=$k t=$t)")
      else assert(got(id).isDefined, s"tied row $id must still match something")
    }
  }

  test("as-of join is partition-invariant") {
    import spark.implicits._
    val right = (1 to 200).map(i => (i % 5, i.toLong, i * 1.0)).toDF("k", "t", "v")
    val left = (1 to 100).map(i => (i % 5, (i * 2).toLong, s"L$i")).toDF("k", "t", "id")
    val a = AsofJoin.asofJoin(left, right, "k", "t", "t", Seq("v"))
      .collect().map(r => r.getString(2) -> r.getAs[Any]("asof_v")).toMap
    val b = AsofJoin.asofJoin(left.repartition(7), right.repartition(3), "k", "t", "t", Seq("v"))
      .collect().map(r => r.getString(2) -> r.getAs[Any]("asof_v")).toMap
    assert(a === b)
  }
}
