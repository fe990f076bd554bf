package graft

import graft.ext.Scd
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

class ScdSpec extends AnyFunSuite with SharedSpark {

  // (key, ts, seq, status) change log: k1 has a no-op update at t=20
  // and a revert at t=40; k2 never changes after its first row.
  private def log = {
    import spark.implicits._
    Seq(
      ("k1", 10L, 1L, "bronze"),
      ("k1", 20L, 2L, "bronze"), // no-op: same tracked value
      ("k1", 30L, 3L, "silver"),
      ("k1", 40L, 4L, "bronze"), // revert IS a new version
      ("k2", 15L, 5L, "gold"),
      ("k2", 25L, 6L, "gold")    // no-op
    ).toDF("k", "ts", "seq", "status")
  }

  private def hist = Scd.scd2(log, Seq("k"), "ts",
    trackedCols = Seq("status"), tieBreak = Seq("seq"))

  test("no-op updates collapse; reverts open new versions; intervals chain") {
    val rows = hist.orderBy("k", "version")
      .select("k", "status", "valid_from", "valid_to", "is_current", "version")
      .collect().map(r => (r.getString(0), r.getString(1), r.getLong(2),
        if (r.isNullAt(3)) -1L else r.getLong(3), r.getBoolean(4), r.getInt(5)))
    assert(rows.toSeq === Seq(
      ("k1", "bronze", 10L, 30L, false, 1),
      ("k1", "silver", 30L, 40L, false, 2),
      ("k1", "bronze", 40L, -1L, true, 3),
      ("k2", "gold", 15L, -1L, true, 1)))
  }

  test("exactly one current version per key; intervals partition the timeline") {
    val cur = hist.filter(col("is_current")).groupBy("k").count().collect()
    assert(cur.forall(_.getLong(1) == 1L))
    // each version's valid_to equals the next version's valid_from
    val chain = hist.withColumn("next_from",
        lead(col("valid_from"), 1).over(org.apache.spark.sql.expressions.Window
          .partitionBy("k").orderBy("version")))
      .filter(col("next_from").isNotNull)
      .filter(col("valid_to") =!= col("next_from"))
    assert(chain.count() === 0L)
  }

  test("snapshotAt returns the one covering version per key") {
    def statusAt(at: Long): Map[String, String] =
      Scd.snapshotAt(hist, lit(at)).select("k", "status")
        .collect().map(r => r.getString(0) -> r.getString(1)).toMap
    assert(statusAt(10L) === Map("k1" -> "bronze"))          // k2 not yet born
    assert(statusAt(29L) === Map("k1" -> "bronze", "k2" -> "gold"))
    assert(statusAt(35L) === Map("k1" -> "silver", "k2" -> "gold"))
    assert(statusAt(1000L) === Map("k1" -> "bronze", "k2" -> "gold"))
  }

  test("same-timestamp ties resolve by the tie-break column, not partition order") {
    import spark.implicits._
    val tied = Seq(("k", 10L, 2L, "b"), ("k", 10L, 1L, "a"), ("k", 20L, 3L, "c"))
      .toDF("k", "ts", "seq", "status").repartition(8)
    val h = Scd.scd2(tied, Seq("k"), "ts", Seq("status"), Seq("seq"))
      .orderBy("version").select("status").collect().map(_.getString(0))
    assert(h.toSeq === Seq("a", "b", "c"))
  }

  test("pointInTimeLookup equals the brute-force interval join, incl. same-instant churn") {
    import spark.implicits._
    // k3 churns twice within the same instant t=50: versions 1 and 2
    // are zero-width, only version 3 ("z") is ever active
    val churn = Seq(
      ("k3", 50L, 7L, "x"), ("k3", 50L, 8L, "y"), ("k3", 50L, 9L, "z")
    ).toDF("k", "ts", "seq", "status")
    val h = Scd.scd2(log.union(churn), Seq("k"), "ts",
        trackedCols = Seq("status"), tieBreak = Seq("seq"))
      .select(col("k"), col("status"), col("valid_from"), col("valid_to"),
        col("version"))
    val facts = Seq(
      ("k1", 5L), ("k1", 10L), ("k1", 29L), ("k1", 35L), ("k1", 40L),
      ("k2", 100L), ("k3", 49L), ("k3", 50L), ("k3", 51L)
    ).toDF("k", "at")
    val got = Scd.pointInTimeLookup(facts, h, "k", "at", Seq("status"))
      .select("k", "at", "asof_status")
      .collect().map(r => (r.getString(0), r.getLong(1),
        if (r.isNullAt(2)) null else r.getString(2))).toSet
    val want = facts.join(h,
        facts("k") === h("k") && col("valid_from") <= col("at") &&
          (col("valid_to").isNull || col("at") < col("valid_to")), "left")
      .select(facts("k"), col("at"), col("status"))
      .collect().map(r => (r.getString(0), r.getLong(1),
        if (r.isNullAt(2)) null else r.getString(2))).toSet
    assert(got === want)
    // the same-instant fact saw only the churn survivor; the
    // before-birth fact honestly saw nothing
    assert(got.contains(("k3", 50L, "z")) && got.contains(("k1", 5L, null)))
  }

  test("snapshotDiff classifies added/removed/changed and drops the unchanged majority") {
    import spark.implicits._
    val oldS = Seq((1L, "a", 10.0), (2L, "b", 20.0), (3L, "c", 30.0), (4L, "d", 40.0))
      .toDF("id", "flag", "amount")
    val newS = Seq((2L, "b", 20.0), (3L, "c", 31.0), (4L, "D", 40.0), (5L, "e", 50.0))
      .toDF("id", "flag", "amount")
    val out = Scd.snapshotDiff(oldS, newS, Seq("id"), Seq("flag", "amount"))
      .collect().map(r => r.getLong(0) -> r.getString(r.fieldIndex("change_type"))).toMap
    assert(out === Map(1L -> "removed", 3L -> "changed", 4L -> "changed", 5L -> "added"),
      s"got $out") // id 2 unchanged: filtered out
  }

  test("scd2Apply equals the full rebuild across every batch-boundary shape") {
    import spark.implicits._
    // full log exercising every incremental edge: k1's delta opens
    // with a NO-OP against its open history row (t=50 bronze = the
    // t=40 revert) then changes; k2 gets nothing (untouched key);
    // k3 is brand-new in the delta with its own internal no-op
    val full = Seq(
      ("k1", 10L, 1L, "bronze"),
      ("k1", 20L, 2L, "bronze"),
      ("k1", 30L, 3L, "silver"),
      ("k1", 40L, 4L, "bronze"),
      ("k1", 50L, 5L, "bronze"), // delta: no-op vs open history row
      ("k1", 60L, 6L, "gold"),
      ("k2", 15L, 7L, "gold"),
      ("k3", 55L, 8L, "iron"),
      ("k3", 65L, 9L, "iron"),   // delta-internal no-op
      ("k3", 75L, 10L, "steel")
    ).toDF("k", "ts", "seq", "status")
    val old = full.filter(col("ts") < 45L)
    val delta = full.filter(col("ts") >= 45L)
    def canon(df: org.apache.spark.sql.DataFrame) =
      df.orderBy("k", "version").collect().map(_.toSeq).toSeq
    val rebuilt = Scd.scd2(full, Seq("k"), "ts", Seq("status"), Seq("seq"))
    val applied = Scd.scd2Apply(
      Scd.scd2(old, Seq("k"), "ts", Seq("status"), Seq("seq")),
      delta, Seq("k"), "ts", Seq("status"), Seq("seq"))
    assert(applied.columns.toSeq === rebuilt.columns.toSeq)
    assert(canon(applied) === canon(rebuilt))
    // an all-no-op delta leaves history bit-identical
    val noop = Seq(("k2", 95L, 11L, "gold")).toDF("k", "ts", "seq", "status")
    val hist = Scd.scd2(full, Seq("k"), "ts", Seq("status"), Seq("seq"))
    assert(canon(Scd.scd2Apply(hist, noop, Seq("k"), "ts", Seq("status"), Seq("seq")))
      === canon(hist))
  }

  test("scd2Apply routes LATE delta rows through a targeted rebuild and still equals scd2(log ∪ delta)") {
    import spark.implicits._
    def canon(df: org.apache.spark.sql.DataFrame) =
      df.orderBy("k", "version").collect().map(_.toSeq).toSeq
    def build(rows: Seq[(String, Long, Long, String)]) =
      Scd.scd2(rows.toDF("k", "ts", "seq", "status"), Seq("k"), "ts", Seq("status"), Seq("seq"))
    // history rows (all < 100); the delta carries one LATE row for k1
    // (t=25, mid-history: lands between silver@30 and bronze@10...),
    // one on-time row for k1, an on-time-only key k2, and a late row
    // that STALLS nothing for k3 (t equal to its open row's
    // valid_from — the ambiguous-tie case also routes late)
    val oldRows = Seq(
      ("k1", 10L, 1L, "bronze"), ("k1", 30L, 2L, "silver"),
      ("k2", 15L, 3L, "gold"),
      ("k3", 20L, 4L, "iron"))
    val deltaRows = Seq(
      ("k1", 25L, 5L, "copper"),  // LATE: before k1's open row (t=30)
      ("k1", 110L, 6L, "gold"),   // on-time row of the SAME late key
      ("k2", 120L, 7L, "pearl"),  // pure on-time key
      ("k3", 20L, 8L, "steel"))   // tie with open row → late route
    val full = oldRows ++ deltaRows
    val applied = Scd.scd2Apply(build(oldRows),
      deltaRows.toDF("k", "ts", "seq", "status"),
      Seq("k"), "ts", Seq("status"), Seq("seq"))
    assert(canon(applied) === canon(build(full)))
    // version chains renumber exactly as the full rebuild: k1 becomes
    // bronze(1) copper(2) silver(3) gold(4)
    val k1 = applied.filter(col("k") === "k1").orderBy("version")
      .select("status", "version").collect().map(r => (r.getString(0), r.getInt(1)))
    assert(k1.toSeq === Seq(("bronze", 1), ("copper", 2), ("silver", 3), ("gold", 4)))
    // documented boundary: a no-op that collapsed at build time is
    // absent from stored history, so a late row landing just before
    // it reflects the stored versions (scd2 over stored-versions ∪
    // delta), which scd2Apply reproduces exactly
    val withNoop = Seq(("k9", 10L, 1L, "a"), ("k9", 30L, 2L, "a"), ("k9", 50L, 3L, "b"))
    val lateD = Seq(("k9", 20L, 9L, "z")).toDF("k", "ts", "seq", "status")
    val storedThenLate = Scd.scd2Apply(build(withNoop), lateD,
      Seq("k"), "ts", Seq("status"), Seq("seq"))
    val storedAsLog = build(withNoop).select("k", "ts", "seq", "status")
      .union(lateD)
    assert(canon(storedThenLate) ===
      canon(Scd.scd2(storedAsLog, Seq("k"), "ts", Seq("status"), Seq("seq"))))
  }

  test("snapshotDiff treats null tracked values null-safely") {
    import spark.implicits._
    val oldS = Seq((1L, Option.empty[String]), (2L, Some("x"))).toDF("id", "v")
    val newS = Seq((1L, Option.empty[String]), (2L, Option.empty[String])).toDF("id", "v")
    val out = Scd.snapshotDiff(oldS, newS, Seq("id"), Seq("v"))
      .collect().map(r => r.getLong(0) -> r.getString(r.fieldIndex("change_type"))).toMap
    assert(out === Map(2L -> "changed"), s"null==null must not read as a change: $out")
  }
}
