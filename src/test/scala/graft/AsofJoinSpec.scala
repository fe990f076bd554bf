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
