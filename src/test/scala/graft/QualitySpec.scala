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

  test("an EMPTY input fails every ratio constraint deterministically") {
    import spark.implicits._
    val empty = Seq.empty[(Long, String, Double)].toDF("id", "s", "x")
    val rep = Quality.checkConstraints(empty, Seq(
      Complete("s", 0.0), Unique(Seq("id")), UniqueApprox(Seq("id"), 0.5),
      InSet("s", Seq("ok"), 0.0), Between("x", 0.0, 1.0, 0.0),
      RowCountBetween(0L, 5L), RowCountBetween(1L, 5L)))
      .collect().map(r => (r.getString(0), r.getDouble(2)) ->
        (r.getDouble(1), r.getBoolean(3))).toMap
    // even a 0.0 threshold fails on empty input: no NULLs, no
    // vacuous passes — an empty corpus drop must trip the gate
    assert(rep(("complete(s)", 0.0)) === ((0.0, false)))
    assert(rep(("unique(id)", 1.0)) === ((0.0, false)))
    assert(rep(("unique_approx(id)", 0.5)) === ((0.0, false)))
    assert(rep(("in_set(s)", 0.0)) === ((0.0, false)))
    assert(rep(("between(x)", 0.0)) === ((0.0, false)))
    // row-count is the one constraint that can legitimately pass at 0
    assert(rep(("row_count", 0.0)) === ((0.0, true)))
    assert(rep(("row_count", 1.0)) === ((0.0, false)))
  }

  test("Unique counts NULL key components as distinct groups (SELECT DISTINCT semantics)") {
    import spark.implicits._
    // 4 rows, keys: (1,a), (1,null), (1,null), (2,a) → 3 distinct
    // groups; bare-column countDistinct would report 2 and deflate
    // the ratio for a merely-nullable key
    val df = Seq((1L, Option("a")), (1L, Option.empty[String]),
      (1L, Option.empty[String]), (2L, Option("a"))).toDF("k1", "k2")
    val rep = Quality.checkConstraints(df, Seq(Unique(Seq("k1", "k2"), 0.75)))
      .collect().map(r => (r.getDouble(1), r.getBoolean(3)))
    assert(rep.head === ((0.75, true)))
  }

  test("UniqueApprox tracks the exact ratio within sketch error in the same single pass") {
    import spark.implicits._
    val df = (1L to 5000L).map(i => (i, i % 997)).toDF("id", "dup")
    val rep = Quality.checkConstraints(df, Seq(
      Unique(Seq("id")), UniqueApprox(Seq("id"), 0.95),
      Unique(Seq("dup"), 0.5), UniqueApprox(Seq("dup"), 0.5)))
      .collect().map(r => r.getString(0) -> (r.getDouble(1), r.getBoolean(3))).toMap
    assert(rep("unique(id)") === ((1.0, true)))
    val (approxId, passId) = rep("unique_approx(id)")
    assert(passId && math.abs(approxId - 1.0) <= 0.02, s"approx=$approxId")
    // 997 distinct of 5000 → exact 0.1994; approx within 2% relative
    val (approxDup, passDup) = rep("unique_approx(dup)")
    assert(!passDup && math.abs(approxDup / 0.1994 - 1.0) <= 0.02, s"approx=$approxDup")
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

  test("driftReport: exact counts, hand-computed PSI, eps clamp for one-sided buckets") {
    import org.apache.spark.sql.functions.col
    import spark.implicits._
    // ref: 6a 2b 2c (10); cur: 2a 6b 2d (10) — c vanished, d is new
    val df = (Seq.fill(6)("a") ++ Seq.fill(2)("b") ++ Seq.fill(2)("c"))
      .map(v => (v, false))
      .++((Seq.fill(2)("a") ++ Seq.fill(6)("b") ++ Seq.fill(2)("d")).map(v => (v, true)))
      .toDF("dim", "cur")
    val rep = Quality.driftReport(df, col("cur"), "dim").orderBy("bucket")
      .collect().map(r => r.getString(0) ->
        (r.getLong(1), r.getLong(2), r.getDouble(3), r.getDouble(4), r.getDouble(5)))
      .toMap
    def psi(rs: Double, cs: Double): Double =
      math.round(math.floor((cs - rs) * math.log(cs / rs) * 1073741824.0 + 0.5)
        / 1073741824.0 * 1e6) / 1e6.toDouble
    assert(rep("a") === ((6L, 2L, 0.6, 0.2, psi(0.6, 0.2))))
    assert(rep("b") === ((2L, 6L, 0.2, 0.6, psi(0.2, 0.6))))
    // one-sided buckets: missing side clamps to eps, term large but finite
    assert(rep("c") === ((2L, 0L, 0.2, 1.0e-6, psi(0.2, 1e-6))))
    assert(rep("d") === ((0L, 2L, 1.0e-6, 0.2, psi(1e-6, 0.2))))
    assert(rep.values.forall(_._5 >= 0.0))
  }

  test("driftReport: an empty current slice yields eps shares, not division errors") {
    import org.apache.spark.sql.functions.col
    import spark.implicits._
    val df = Seq(("a", false), ("b", false)).toDF("dim", "cur")
    val rep = Quality.driftReport(df, col("cur"), "dim")
      .collect().map(r => r.getString(0) -> r.getDouble(4)).toMap
    assert(rep === Map("a" -> 1.0e-6, "b" -> 1.0e-6))
  }

  test("fdViolations: violating keys only; NULL next to a value violates") {
    import org.apache.spark.sql.functions.col
    import spark.implicits._
    val df = Seq(
      (1L, Some("A")), (1L, Some("A")),            // clean key
      (2L, Some("A")), (2L, Some("B")),            // two values
      (3L, Some("A")), (3L, None),                 // value + NULL
      (4L, None), (4L, None)                       // all-NULL: one "value"
    ).toDF("k", "v")
    val got = Quality.fdViolations(df, Seq("k"), "v")
      .collect().map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2)))).toMap
    assert(got === Map(2L -> ((2L, 2L)), 3L -> ((2L, 2L))))
    // clean data → empty frame
    assert(Quality.fdViolations(df.filter(col("k") === 1L), Seq("k"), "v")
      .count() === 0L)
  }
}
