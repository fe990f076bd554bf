package graft

import graft.ext.Quality
import graft.ext.Quality._
import org.scalatest.funsuite.AnyFunSuite

class QualitySpec extends AnyFunSuite with SharedSpark {

  test("checkConstraints: every constraint kind, exact ratios, pass and fail") {
    import spark.implicits._
    // 10 rows: 2 null names, a duplicated id, one out-of-set status,
    // two values outside [0, 100]
    val df = Seq(
      (1L, Option("a"), "ok", 50.0),
      (2L, Option("b"), "ok", 120.0),
      (3L, None, "ok", 10.0),
      (4L, Option("d"), "bad", 99.0),
      (5L, Option("e"), "ok", -5.0),
      (5L, Option("f"), "ok", 0.0),
      (7L, Option("g"), "ok", 100.0),
      (8L, None, "ok", 42.0),
      (9L, Option("i"), "ok", 7.0),
      (10L, Option("j"), "ok", 3.0)
    ).toDF("id", "name", "status", "score")
    val rep = Quality.checkConstraints(df, Seq(
      Complete("name", 0.8),
      Unique(Seq("id")),
      Unique(Seq("id"), minRatio = 0.9),
      InSet("status", Seq("ok"), 0.9),
      Between("score", 0.0, 100.0, 0.8),
      RowCountBetween(10L, 10L),
      RowCountBetween(11L, 20L)
    )).collect().map(r => (r.getString(0), r.getDouble(1), r.getDouble(2), r.getBoolean(3)))
    val byNameThresh = rep.map(r => (r._1, r._3) -> r).toMap
    assert(byNameThresh(("complete(name)", 0.8)) === (("complete(name)", 0.8, 0.8, true)))
    // 9 distinct ids of 10 rows
    assert(byNameThresh(("unique(id)", 1.0))._2 === 0.9)
    assert(!byNameThresh(("unique(id)", 1.0))._4)
    assert(byNameThresh(("unique(id)", 0.9))._4)
    assert(byNameThresh(("in_set(status)", 0.9)) === (("in_set(status)", 0.9, 0.9, true)))
    // 8 of 10 scores inside [0, 100]
    assert(byNameThresh(("between(score)", 0.8)) === (("between(score)", 0.8, 0.8, true)))
    assert(byNameThresh(("row_count", 10.0)) === (("row_count", 10.0, 10.0, true)))
    assert(!byNameThresh(("row_count", 11.0))._4)
    assert(rep.length === 7)
  }

  test("checkConstraints: nulls fail InSet and Between, report is one job") {
    import spark.implicits._
    val df = Seq((1L, Option.empty[String], Option.empty[java.lang.Double]),
      (2L, Some("ok"), Some(java.lang.Double.valueOf(5.0)))).toDF("id", "s", "x")
    val rep = Quality.checkConstraints(df, Seq(
      InSet("s", Seq("ok"), 1.0), Between("x", 0.0, 10.0, 1.0)))
      .collect().map(r => r.getString(0) -> (r.getDouble(1), r.getBoolean(3))).toMap
    assert(rep("in_set(s)") === ((0.5, false)))
    assert(rep("between(x)") === ((0.5, false)))
  }
}
