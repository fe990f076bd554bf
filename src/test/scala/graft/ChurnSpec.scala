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

  test("streaming churn maintenance equals the batch rollup after every micro-batch") {
    import graft.streaming.EventStreams
    import org.apache.spark.sql.DataFrame
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    def ts(s: String) = Timestamp.valueOf(s)
    // user 1 re-appears in batch 2 (max/sum merge exercised); batch 3
    // moves the horizon, flipping users 1 and 3 into churned
    val batches = Seq(
      Seq((1L, ts("2026-01-01 00:00:00")), (2L, ts("2026-01-02 00:00:00"))),
      Seq((1L, ts("2026-01-09 12:00:00")), (3L, ts("2026-01-03 00:00:00"))),
      Seq((2L, ts("2026-01-20 00:00:00"))))
    val mem = MemoryStream[(Long, Timestamp)]
    var state: DataFrame = null
    val q = mem.toDF().toDF("user_id", "ts").writeStream
      .foreachBatch { (b: DataFrame, _: Long) =>
        // the foreachBatch maintenance shape: user-count-sized state
        // folded per batch (parquet/Delta-backed in production)
        state = (if (state == null) EventStreams.churnState(b)
                 else EventStreams.churnMerge(state, b)).localCheckpoint(true)
      }.start()
    def report(df: DataFrame) = EventStreams.churnReport(df).collect()
      .map(r => (r.getLong(0), r.getTimestamp(1), r.getLong(2),
        r.getLong(3), r.getBoolean(4))).sortBy(_._1).toSeq
    try {
      var all = Seq.empty[(Long, Timestamp)]
      for (batch <- batches) {
        mem.addData(batch: _*)
        q.processAllAvailable()
        all ++= batch
        val want = report(EventStreams.churnState(all.toDF("user_id", "ts")))
        assert(report(state) === want, s"diverged after ${all.size} events")
      }
      // the final horizon (2026-01-20) leaves only user 2 retained
      assert(report(state).map(t => t._1 -> t._5) ===
        Seq(1L -> true, 2L -> false, 3L -> true))
    } finally q.stop()
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
