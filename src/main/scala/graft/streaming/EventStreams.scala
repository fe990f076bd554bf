package graft.streaming

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/** Structured Streaming operators over the events schema
  * (event_id, ts, user_id, event_type, value, props).
  *
  * Batch twins live in [[graft.queries.EventQueries]]; these are the
  * incremental forms: watermarked tumbling-window aggregation and
  * stateful sessionization via flatMapGroupsWithState. Both are
  * keyed-state operators that scale horizontally — state is
  * partitioned by group key, nothing accumulates on the driver.
  */
object EventStreams {

  case class Event(event_id: Long, ts: java.sql.Timestamp, user_id: Long,
                   event_type: String, value: Double)

  case class SessionState(start: Long, lastSeen: Long, nEvents: Long, total: Double)

  case class SessionOut(user_id: Long, session_start: java.sql.Timestamp,
                        n_events: Long, duration_sec: Double, total_value: Double)

  /** File-source stream over an events parquet directory: explicit
    * schema (streaming reads never infer), taken from a one-off batch
    * read of the same files so the stream sees whatever timestamp
    * encoding the files actually carry (nanos-as-long, µs-NTZ, or
    * µs-LTZ), then normalized exactly like the batch path
    * ([[graft.sources.Tables.normalizeEventTs]]), so streaming and
    * batch results agree under any encoding. */
  def streamFromParquet(spark: SparkSession, sfDir: String): DataFrame = {
    // batch-inspect the actual file schema (footer read only — cheap);
    // hard-coding ts's type broke when the generator re-encoded
    // TIMESTAMP(NANOS) → TIMESTAMP(MICROS, isAdjustedToUTC=false).
    // If no file exists YET (an upstream writer populates the dir
    // after stream start — the usual file-stream pattern), fall back
    // to the current generator's encoding (µs NTZ); the normalization
    // resolves it identically once files land.
    import org.apache.spark.sql.types._
    val schema =
      try spark.read.option("pathGlobFilter", "events.parquet").parquet(sfDir).schema
      catch { case _: org.apache.spark.sql.AnalysisException => StructType(Seq(
        StructField("event_id", LongType), StructField("ts", TimestampNTZType),
        StructField("user_id", LongType), StructField("event_type", StringType),
        StructField("value", DoubleType), StructField("props", StringType)))
      }
    // file streams require a directory; the testdata layout is one
    // parquet file per table, so glob-filter to the events file
    graft.sources.Tables.normalizeEventTs(
      spark.readStream.schema(schema)
        .option("pathGlobFilter", "events.parquet")
        .parquet(sfDir))
  }

  /** Streaming exact dedup on a key, with bounded state: duplicates
    * arriving within the watermark horizon are dropped; state for
    * keys older than the watermark is purged — the streaming twin of
    * [[graft.ext.Dedup.exact]]. */
  def dedupStream(events: DataFrame, keyCols: Seq[String],
                  watermarkDelay: String = "10 minutes"): DataFrame =
    events.withWatermark("ts", watermarkDelay)
      .dropDuplicatesWithinWatermark(keyCols.head, keyCols.tail: _*)

  /** Stream-stream interval join (click attribution): each purchase
    * joins the same user's clicks from the preceding `attributionWindow`.
    * Both sides carry watermarks and the join condition bounds the
    * event-time distance, so Spark can purge click state older than
    * (watermark + window) and purchase state older than the watermark —
    * bounded state for an unbounded stream pair, the streaming twin of
    * the batch as-of/interval join ([[graft.ops.AsofJoin]]). */
  def clickAttribution(clicks: DataFrame, purchases: DataFrame,
                       attributionWindow: String = "1 hour",
                       watermarkDelay: String = "10 minutes"): DataFrame = {
    val c = clicks.withWatermark("ts", watermarkDelay)
      .select(col("user_id").as("c_user"), col("ts").as("c_ts"),
        col("event_id").as("click_id"))
    val p = purchases.withWatermark("ts", watermarkDelay)
      .select(col("user_id").as("p_user"), col("ts").as("p_ts"),
        col("event_id").as("purchase_id"), col("value"))
    p.join(c,
      col("p_user") === col("c_user") &&
        col("c_ts") <= col("p_ts") &&
        col("c_ts") >= col("p_ts") - expr(s"INTERVAL $attributionWindow"))
      .select(col("purchase_id"), col("p_user").as("user_id"), col("p_ts"),
        col("click_id"), col("c_ts"), col("value"))
  }

  /** Watermarked tumbling-window count/sum per event type. Late data
    * beyond 10 minutes is dropped; state for closed windows is purged
    * automatically — bounded state at any corpus rate. */
  def hourlyCounts(events: DataFrame): DataFrame =
    events
      .withWatermark("ts", "10 minutes")
      .groupBy(window(col("ts"), "1 hour"), col("event_type"))
      .agg(count(lit(1)).as("n"), round(sum("value"), 2).as("total"))
      .select(col("window.start").as("hour"), col("event_type"), col("n"), col("total"))

  /** Per-user activity state from a batch of events — the mergeable
    * partial behind the churn rollup (`q_ev_churn`): last-seen
    * timestamp (and its microsecond image) plus event count. ONE
    * shuffle, map-side partial aggregation. */
  def churnState(events: DataFrame): DataFrame =
    events.groupBy("user_id")
      .agg(max("ts").as("last_seen"), count(lit(1)).as("n_events"),
        max(unix_micros(col("ts"))).as("last_us"))

  /** Fold a micro-batch's per-user partials into the running churn
    * state: max composes with max and count with sum, so merging
    * per-batch states is EXACTLY recomputing over the union of all
    * events seen — ChurnSpec proves it per micro-batch. The state is
    * user-count-sized (not event-count-sized); in production it lives
    * in a parquet/Delta table rewritten per batch, the same
    * foreachBatch maintenance shape as SCD2 apply. */
  def churnMerge(state: DataFrame, batch: DataFrame): DataFrame =
    state.unionByName(churnState(batch))
      .groupBy("user_id")
      .agg(max("last_seen").as("last_seen"), sum("n_events").as("n_events"),
        max("last_us").as("last_us"))

  /** The churn report off a per-user state frame — days inactive
    * against the corpus horizon (max last-seen, a 1-row aggregate
    * over the ALREADY-aggregated state, broadcast back) and the
    * churned flag, inclusive at `thresholdDays`. Shared by the batch
    * rollup (q_ev_churn) and the streaming maintenance loop, so the
    * two cannot drift. */
  def churnReport(state: DataFrame, thresholdDays: Long = 7L): DataFrame =
    state.crossJoin(broadcast(state.agg(max("last_us").as("horizon_us"))))
      .withColumn("days_inactive",
        expr("(horizon_us - last_us) div 86400000000"))
      .withColumn("churned", col("days_inactive") >= thresholdDays)
      .select("user_id", "last_seen", "n_events", "days_inactive", "churned")

  /** Sessionization with a 30-minute inactivity gap, emitted on
    * timeout — custom keyed state via flatMapGroupsWithState.
    * Events may arrive unordered within a batch; the state tracks
    * min(start)/max(lastSeen) so ordering does not matter. */
  def sessionize(spark: SparkSession, events: DataFrame,
                 gapMs: Long = 30 * 60 * 1000L,
                 watermarkDelay: String = "10 minutes"): Dataset[SessionOut] = {
    import spark.implicits._
    events.withWatermark("ts", watermarkDelay).as[Event]
      .groupByKey(_.user_id)
      .flatMapGroupsWithState[SessionState, SessionOut](
        OutputMode.Append, GroupStateTimeout.EventTimeTimeout) {
        (userId: Long, batch: Iterator[Event], state: GroupState[SessionState]) =>
          val evs = batch.toSeq
          if (evs.isEmpty && state.hasTimedOut) {
            val s = state.get
            state.remove()
            Iterator(SessionOut(userId, new java.sql.Timestamp(s.start), s.nEvents,
              (s.lastSeen - s.start) / 1000.0, math.round(s.total * 100) / 100.0))
          } else if (evs.isEmpty) Iterator.empty
          else {
            val sorted = evs.sortBy(e => (e.ts.getTime, e.event_id))
            var closed = List.empty[SessionOut]
            var cur = state.getOption
            sorted.foreach { e =>
              val t = e.ts.getTime
              cur match {
                case Some(s) if t - s.lastSeen <= gapMs =>
                  cur = Some(s.copy(lastSeen = math.max(s.lastSeen, t),
                    nEvents = s.nEvents + 1, total = s.total + e.value))
                case Some(s) =>
                  closed ::= SessionOut(userId, new java.sql.Timestamp(s.start), s.nEvents,
                    (s.lastSeen - s.start) / 1000.0, math.round(s.total * 100) / 100.0)
                  cur = Some(SessionState(t, t, 1, e.value))
                case None =>
                  cur = Some(SessionState(t, t, 1, e.value))
              }
            }
            cur.foreach { s =>
              state.update(s)
              state.setTimeoutTimestamp(s.lastSeen + gapMs)
            }
            closed.reverseIterator
          }
      }
  }
}
