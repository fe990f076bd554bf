package graft.streaming

import graft.ext.TextAnalysis
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Streaming text-pipeline monitors: the batch text-analysis
  * expressions applied over watermarked event-time windows, so an
  * ingestion stream surfaces quality regressions (a scraper gone bad,
  * a source flipping language) while the data is still arriving.
  * All scoring is the SAME codegen'd expressions the batch gates
  * verify — streaming here is purely a windowing concern.
  */
object TextStreams {

  /** Per-window document count + mean quality score over a stream of
    * (ts, doc_id, text). Watermarked tumbling windows → append mode:
    * each window emits once, when the watermark passes its end.
    * State is one partial aggregate per open window — bounded by the
    * watermark regardless of stream rate. */
  def qualityMonitor(docs: DataFrame, windowLen: String = "1 minute",
                     watermarkDelay: String = "30 seconds"): DataFrame =
    docs.withWatermark("ts", watermarkDelay)
      .groupBy(window(col("ts"), windowLen))
      .agg(count(lit(1)).as("n_docs"),
        round(avg(TextAnalysis.qualityScore(col("text"))), 4).as("mean_quality"))
      .select(col("window.start").as("win_start"), col("n_docs"), col("mean_quality"))

  /** Per-window distinct-key estimate via the mergeable HLL sketch —
    * streaming `COUNT(DISTINCT)` is unsupported (Spark would have to
    * hold every key per open window in state), and the usual
    * `approx_count_distinct` workaround's estimate can't be re-derived
    * offline. The HLL aggregate keeps 2^p bytes per open window (the
    * state-store entry is the serialized register array), merges
    * across micro-batches by register-max, and — because the sketch
    * is deterministic in the input SET — a streaming window's
    * estimate EQUALS the batch estimate over the same rows, which is
    * exactly what StreamingSpec asserts. */
  def distinctMonitor(events: DataFrame, keyCol: String,
                      windowLen: String = "1 hour",
                      watermarkDelay: String = "30 minutes",
                      p: Int = 12, portable: Boolean = false): DataFrame = {
    // portable = keyCol is an ALREADY-HASHED column in the universal
    // family's domain and the m=64 portable sketch runs instead of
    // the xxhash64 production one — the variant whose registers a SQL
    // oracle re-derives bit-for-bit (the batch-twin gate
    // q_ev_distinct_monitor runs this exact function on a static
    // frame: withWatermark is analyzer-eliminated outside streaming,
    // so the gated plan IS the streaming plan minus the state store)
    val est =
      if (portable) graft.ext.Sketches.hllDistinctPortable(col(keyCol))
      else graft.ext.Sketches.hllDistinct(col(keyCol), p)
    events.withWatermark("ts", watermarkDelay)
      .groupBy(window(col("ts"), windowLen))
      .agg(count(lit(1)).as("n_events"),
        round(est, 4).as("approx_distinct"))
      .select(col("window.start").as("win_start"), col("n_events"), col("approx_distinct"))
  }

  /** Per-micro-batch distribution-drift monitor: each arriving batch's
    * `dim` mix is PSI-compared against a STATIC reference slice via
    * [[graft.ext.Quality.driftReport]] — the deployment shape of the
    * batch gate q_quality_drift (reference = last known-good corpus
    * snapshot; alert when a batch's summed PSI crosses ~0.2). Rides
    * foreachBatch because drift is a whole-batch-vs-reference
    * statistic, not a per-window aggregate: the report needs the
    * batch's own bucket totals, which watermarked window state cannot
    * express. Each emitted row carries `batch_id`; the per-batch
    * frame handed to `sink` is exactly `driftReport(reference ∪
    * batch)` — spec-pinned equal to the batch computation. Pass a
    * cached/checkpointed `reference` (it is re-read every batch). */
  /** Per-window blocklist hit monitor: total occurrences of each
    * pattern ([[graft.functions.MultiPatternCount]] — ONE automaton
    * pass per document, all patterns) summed per event-time window.
    * The per-row counts array is decomposed into per-pattern columns
    * BEFORE the windowed aggregation so state per open window is
    * one long per pattern — never a collected array. Deterministic
    * in the input set, so a streaming window equals the batch
    * aggregation over the same rows (the monitor-twin contract the
    * other monitors follow). */
  def blocklistMonitor(docs: DataFrame, patterns: Seq[String],
                       windowLen: String = "1 minute",
                       watermarkDelay: String = "30 seconds"): DataFrame = {
    val c = graft.functions.TextExpressions
      .multiPatternCount(lower(col("text")), patterns)
    val withCounts = docs.select(col("ts") +: patterns.indices.map(i =>
      c.getItem(i).as(s"c$i")): _*)
    withCounts.withWatermark("ts", watermarkDelay)
      .groupBy(window(col("ts"), windowLen))
      .agg(count(lit(1)).as("n_docs"),
        patterns.indices.map(i => sum(col(s"c$i")).as(s"hits_$i")): _*)
      .select(col("window.start").as("win_start") +: col("n_docs") +:
        patterns.indices.map(i => col(s"hits_$i")): _*)
  }

  def driftMonitor(stream: DataFrame, reference: DataFrame, dim: String)(
      sink: DataFrame => Unit): org.apache.spark.sql.streaming.StreamingQuery =
    stream.writeStream.outputMode("update")
      .foreachBatch { (batch: DataFrame, batchId: Long) =>
        val u = reference.select(col(dim)).withColumn("__cur", lit(false))
          .unionByName(batch.select(col(dim)).withColumn("__cur", lit(true)))
        sink(graft.ext.Quality.driftReport(u, col("__cur"), dim)
          .withColumn("batch_id", lit(batchId)))
      }
      .start()
}
