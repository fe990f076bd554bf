package graft.ext

import graft.ops.RelationalOps
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** End-to-end training-data curation pipeline — the composition a
  * 100 TB corpus actually runs, built entirely from the engine's own
  * operators so every stage inherits their scale properties:
  *
  *   1. score: language ID + quality + token counts (per-row, codegen)
  *   2. filter: quality ≥ minQuality, language identified
  *   3. exact dedup: min-id representative per identical text
  *   4. near-dup removal: inverted-index Jaccard pairs, drop the
  *      higher id of each pair (candidates from shared shingles only)
  *   5. corpus stats per language
  *
  * Shuffle budget: one window shuffle (3), one shingle-join (4), one
  * final agg — nothing quadratic, nothing on the driver.
  */
object Curation {

  /** Per-document scores; reused by [[curate]] and queryable alone. */
  def score(docs: DataFrame): DataFrame =
    docs.select(
      col("doc_id"), col("text"),
      TextAnalysis.langId(col("text")).as("pred_lang"),
      TextAnalysis.qualityScore(col("text")).as("quality"),
      TextAnalysis.tokenCountWs(col("text")).cast("long").as("n_tokens"))

  /** The curated corpus (documents surviving all four stages).
    *
    * The plan is diamond-shaped: the scored+deduped frame feeds the
    * Jaccard self-join's shingle index AND the final anti-join, so
    * without materialization the regex-heavy scoring subtree
    * re-evaluates once per consumer. `checkpointDir` cuts the
    * diamond: the scored+exact-deduped corpus is written to parquet
    * once and every downstream stage reads that — an explicit
    * materialization, not an in-memory cache (a measured persist()
    * barrier was slower: cache build + lost whole-stage fusion
    * exceeded the saved regex work, and at 100 TB an executor-memory
    * cache of the corpus is not an option anyway). With
    * `checkpointDir = None` the single-pass diamond plan is kept.
    *
    * NOTE: with `checkpointDir` set, construction is EAGER — the
    * scoring + exact-dedup job runs (and overwrites
    * `dir/curation_scored`) when this method is CALLED, not when the
    * returned frame is first evaluated. Callers should pass a fresh
    * per-run dir (see [[graft.Scratch.tempDir]], which also cleans
    * it up on JVM exit) and not share one path across concurrent
    * invocations. */
  def curatedDocs(docs: DataFrame, minQuality: Double = 0.5,
                  jaccardThreshold: Double = 0.6,
                  checkpointDir: Option[String] = None): DataFrame = {
    val exactKept = scoredExactKept(docs, minQuality, checkpointDir)
    // pairwise loser-removal policy: any doc that lost a comparison
    // (appeared as d2 of a qualifying pair) is dropped. See
    // [[curatedDocsTransitive]] for the connected-component policy.
    val nearDupLosers = nearDupPairs(exactKept, jaccardThreshold, checkpointDir)
      .select(col("d2").as("loser")).distinct()
    exactKept.join(nearDupLosers, col("doc_id") === col("loser"), "left_anti")
  }

  /** EAGER parquet checkpoint: write `df` to `dir/name` (overwrite)
    * and return the read-back frame. Cuts plan diamonds — every
    * consumer scans the materialized parquet instead of re-running
    * the producing subtree. The write job runs when this is CALLED,
    * not when the returned frame is evaluated; callers pass a fresh
    * per-run dir and never share one path across concurrent
    * invocations (the [[curatedDocs]] contract). */
  private def checkpoint(df: DataFrame, dir: String, name: String): DataFrame = {
    val path = s"$dir/$name"
    df.write.mode("overwrite").parquet(path)
    df.sparkSession.read.parquet(path)
  }

  /** Qualifying near-dup pairs for stages 4+, shingling the corpus
    * EXACTLY once when a checkpoint dir is available: the pair join's
    * plan references the shingle frame four times (document
    * frequencies, prefix build, both verify sides —
    * [[Dedup.jaccardPairsFromShingles]] documents this), so without
    * materialization the explode+distinct re-runs per reference. */
  private def nearDupPairs(exactKept: DataFrame, jaccardThreshold: Double,
                           checkpointDir: Option[String]): DataFrame = {
    val sh0 = Dedup.shingleTable(exactKept, "doc_id", "text", n = 5)
    val sh = checkpointDir.fold(sh0)(checkpoint(sh0, _, "curation_shingles"))
    Dedup.jaccardPairsFromShingles(sh, jaccardThreshold)
  }

  /** Shared stages 1–3 (score → filter → exact dedup), with the
    * optional parquet checkpoint cutting the plan diamond. */
  private def scoredExactKept(docs: DataFrame, minQuality: Double,
                              checkpointDir: Option[String]): DataFrame = {
    val filtered = score(docs)
      .filter(col("quality") >= minQuality && col("pred_lang") =!= "other")
    val exactKept0 = RelationalOps.argminBy(
      filtered, Seq(col("text")), Seq(col("doc_id")))
    checkpointDir.fold(exactKept0)(checkpoint(exactKept0, _, "curation_scored"))
  }

  /** The transitive-collapse near-dup policy: ONE representative per
    * connected component of the qualifying pair graph. The pairwise
    * loser-drop of [[curatedDocs]] under-deletes A~B~C chains where
    * A~C itself never qualified (it keeps A AND C); here the pair
    * graph runs through [[Dedup.clusters]] and every non-representative
    * member is dropped — the policy a 100 TB dedup pass actually
    * wants. With `checkpointDir` set the cluster labels also
    * materialize to parquet (zero cache residue, the
    * [[Dedup.clusters]] scratch contract). */
  def curatedDocsTransitive(docs: DataFrame, minQuality: Double = 0.5,
                            jaccardThreshold: Double = 0.6,
                            checkpointDir: Option[String] = None): DataFrame = {
    val exactKept = scoredExactKept(docs, minQuality, checkpointDir)
    val pairs = nearDupPairs(exactKept, jaccardThreshold, checkpointDir)
    val labels = Dedup.clusters(pairs, scratchDir = checkpointDir.map(d => s"$d/cc"))
    val losers = labels.filter(col("id") =!= col("rep")).select(col("id").as("loser"))
    exactKept.join(losers, col("doc_id") === col("loser"), "left_anti")
  }

  /** Per-language stats under the transitive-collapse policy. */
  def curateTransitive(docs: DataFrame, minQuality: Double = 0.5,
                       jaccardThreshold: Double = 0.6,
                       checkpointDir: Option[String] = None): DataFrame =
    curatedDocsTransitive(docs, minQuality, jaccardThreshold, checkpointDir)
      .groupBy("pred_lang")
      .agg(count(lit(1)).as("n_docs"),
        sum("n_tokens").as("sum_tokens"),
        round(avg("quality"), 4).as("avg_quality"))
      .orderBy("pred_lang")

  /** Keep documents at or above the per-language `q`-quantile of the
    * quality score — mixture-aware quality gating (one global cutoff
    * over-prunes low-resource languages whose score distribution sits
    * lower; per-stratum cutoffs prune each language against itself).
    * The cutoffs are an EXACT percentile aggregate per stratum — a
    * tiny (lang, cutoff) frame broadcast back onto the scored corpus,
    * so the data flows once and nothing is approximate (the DuckDB
    * oracle re-derives quantile_cont identically). At 100 TB swap the
    * exact percentile for `approx_percentile` if the per-stratum sort
    * memory bites; the plan shape is unchanged. */
  def qualityCutoff(docs: DataFrame, q: Double): DataFrame = {
    val scored = score(docs)
    val cuts = scored.groupBy("pred_lang")
      .agg(expr(s"percentile(quality, $q)").as("__cut"))
    scored.join(broadcast(cuts), "pred_lang")
      .filter(col("quality") >= col("__cut"))
      .drop("__cut")
  }

  /** Per-language stats of the curated corpus. */
  def curate(docs: DataFrame, minQuality: Double = 0.5,
             jaccardThreshold: Double = 0.6,
             checkpointDir: Option[String] = None): DataFrame =
    curatedDocs(docs, minQuality, jaccardThreshold, checkpointDir)
      .groupBy("pred_lang")
      .agg(count(lit(1)).as("n_docs"),
        sum("n_tokens").as("sum_tokens"),
        round(avg("quality"), 4).as("avg_quality"))
      .orderBy("pred_lang")
}
