package graft

import java.sql.Timestamp
import org.scalatest.funsuite.AnyFunSuite

/** Pins q_ev_churn semantics on a synthetic events table: inactivity
  * is measured in WHOLE days against the corpus horizon (global max
  * ts, floor division on non-negative microsecond deltas), and the
  * churned flag is inclusive at the 7-day threshold.
  */
class ChurnSpec extends AnyFunSuite with SharedSpark {

  private def writeEvents(dir: String): Unit = {
    import spark.implicits._
    def ts(s: String) = Timestamp.valueOf(s)
    Seq(
      // u1: active at the horizon itself → 0 days inactive
      (1L, ts("2026-01-02 00:00:00"), 1L, "view", 1.0, "{}"),
      (2L, ts("2026-01-10 00:00:00"), 1L, "click", 2.0, "{}"),
      // u2: last seen exactly 7 days before the horizon → churned
      // (threshold is inclusive)
      (3L, ts("2026-01-03 00:00:00"), 2L, "view", 3.0, "{}"),
      // u3: one microsecond short of 7 full days → 6 days, retained
      (4L, ts("2026-01-03 00:00:00.000001"), 3L, "view", 4.0, "{}")
    ).toDF("event_id", "ts", "user_id", "event_type", "value", "props")
      .coalesce(1).write.mode("overwrite").parquet(s"$dir/events.parquet")
  }

  test("q_ev_churn: floor-day inactivity vs horizon, inclusive 7-day flag") {
    withTempDir("churn") { dir =>
      writeEvents(dir)
      val q = QueryDef.all.find(_.name == "q_ev_churn").get
      val rows = q.fn(spark, dir).collect().map { r =>
        (r.getLong(r.fieldIndex("user_id")),
          r.getLong(r.fieldIndex("n_events")),
          r.getLong(r.fieldIndex("days_inactive")),
          r.getBoolean(r.fieldIndex("churned")))
      }.toSeq
      assert(rows === Seq(
        (1L, 2L, 0L, false),
        (2L, 1L, 7L, true),
        (3L, 1L, 6L, false)))
    }
  }
}
