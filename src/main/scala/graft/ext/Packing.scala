package graft.ext

import graft.ops.RelationalOps
import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Sequence packing for LLM pretraining: documents in a fixed
  * deterministic order are conceptually concatenated into one token
  * stream and cut into fixed-size context windows — the standard
  * "concat-and-chunk" packing that turns a ragged corpus into
  * training shards with zero padding waste.
  *
  * The plan for each document — which window its first token lands
  * in, at what offset, and how many windows it spans — is pure
  * prefix-sum arithmetic, so the whole operator reduces to ONE
  * scalable exclusive running total
  * ([[RelationalOps.runningTotal]]: per-bucket window cumsum +
  * broadcast prefix offsets — never the single-task global window)
  * plus per-row integer arithmetic. 100 TB posture: one narrow
  * shuffle on the order-bucket prefix and one broadcast of bucket
  * totals; a shard writer then groups by `bin_id` (one more shuffle)
  * to emit the packed windows. Token prefix sums stay below 2^53
  * (~9e15 — far above any real corpus), so the double-typed running
  * total is exact.
  */
object Packing {

  /** Per-document packing plan: adds `bin_id` (context window of the
    * document's first token), `bin_offset` (token offset within that
    * window) and `n_bins_spanned` (how many windows the document
    * crosses — a shard writer reads consecutive windows for
    * boundary-crossing docs).
    *
    * `orderBucket` must be a coarse order-preserving prefix of
    * `order` (e.g. `floor(id / 10000)`) with a broadcastable bucket
    * count — the [[RelationalOps.runningTotal]] contract. */
  def packPlan(docs: DataFrame, order: Column, orderBucket: Column,
               nTokens: Column, contextLen: Int): DataFrame = {
    val withCum = RelationalOps.runningTotal(
      docs.withColumn("__n", nTokens.cast("double")),
      orderBucket, Seq(order), col("__n"), "__cum")
    val cumBefore = (col("__cum") - col("__n")).cast("long")
    val n = col("__n").cast("long")
    withCum
      .withColumn("bin_id", floor(cumBefore / contextLen))
      .withColumn("bin_offset", cumBefore % contextLen)
      .withColumn("n_bins_spanned",
        floor((cumBefore + n - lit(1)) / contextLen) - col("bin_id") + lit(1))
      .drop("__n", "__cum")
  }

  /** Shard-writer manifest from a [[packPlan]]: one row per
    * (window, document) intersection with the document-local token
    * range [tok_from, tok_to) that lands in that window — exactly
    * what a packed-shard writer consumes after one `groupBy(bin_id)`
    * shuffle. Pure per-row explode + integer arithmetic; every
    * window's ranges sum to `contextLen` (except the final partial
    * window) and every document's ranges sum to its token count
    * (PackingSpec pins both invariants). */
  /** Deterministic corpus shuffle + shard assignment: every row gets a
    * `shard` in [0, nShards) and a 0-based `pos` within its shard,
    * both pure functions of `key` — the "global random shuffle" step
    * before packed-shard writing, reproducible across runs, cluster
    * sizes, and partitionings (unlike `repartition` +
    * `monotonically_increasing_id`, whose assignment is
    * partition-order dependent).
    *
    * shard and the within-shard order come from two chained MINSTD
    * steps of the key (SQL-portable — the gate re-derives every
    * position in DuckDB). `pos` is ranked via
    * [[RelationalOps.runningTotal]] over a fine-grained
    * (shard, hash-range) order bucket, so no single-task global sort
    * and no per-shard single-partition window: parallelism is
    * 64·nShards regardless of shard size. */
  def shardAssign(df: DataFrame, key: Column, nShards: Int): DataFrame = {
    require(nShards > 0, "need nShards > 0")
    val m = 2147483647L
    val h1 = pmod(pmod(key, lit(m)) * 48271L, lit(m))
    val bucketed = df
      .withColumn("shard", pmod(h1, lit(nShards.toLong)))
      .withColumn("__oh", pmod(pmod(h1 * 48271L, lit(m)), lit(1000000L)))
    // coarse prefix of the (shard, oh, key) order: oh < 1e6 → oh»14
    // fits [0, 62), so shard·64 + oh»14 sorts identically
    val orderBucket = col("shard") * 64 + floor(col("__oh") / 16384)
    val ranked = RelationalOps.runningTotal(bucketed, orderBucket,
      Seq(col("__oh"), key), lit(1L), "__rank")
    val starts = ranked.groupBy("shard").agg(min("__rank").as("__start"))
    ranked.join(broadcast(starts), "shard")
      .withColumn("pos", (col("__rank") - col("__start")).cast("long"))
      .drop("__oh", "__rank", "__start")
  }

  /** Length-bucketed batching: the INFERENCE-side counterpart of
    * concat-and-chunk packing. Where packing concatenates documents
    * into fixed windows (zero waste, boundaries crossed), batched
    * inference must keep documents whole and pads every sequence in a
    * batch to the batch maximum — so the curator's lever is grouping
    * similar lengths together. Documents are bucketed by
    * `bucketWidth` tokens, ranked inside their bucket by (length,
    * id), and cut into `batchSize`-document batches; the report per
    * batch is its size, max length and padding waste
    * (n·max − Σlen), the number the serving bill actually scales
    * with.
    *
    * 100 TB posture: the within-bucket rank uses the same two-phase
    * running total as [[shardAssign]] with the fine (bucket, length)
    * compound as the order bucket — parallelism is the number of
    * DISTINCT (bucket, length) pairs, never one task per length
    * bucket — then subtracts each bucket's broadcast start offset.
    * No global window, no per-doc text movement at all (only lengths
    * travel). */
  def lengthBucketedBatches(docs: DataFrame, idCol: String, textCol: String,
                            bucketWidth: Int, batchSize: Int): DataFrame = {
    require(bucketWidth > 0 && batchSize > 0, "need positive bucketWidth and batchSize")
    val base = docs.select(col(idCol).as("doc_id"),
        TextAnalysis.tokenCountWs(col(textCol)).cast("long").as("dl"))
      .withColumn("bucket", floor(col("dl") / bucketWidth).cast("long"))
    val ranked = RelationalOps.runningTotal(base,
      struct(col("bucket"), col("dl")), Seq(col("doc_id")), lit(1L), "__grank")
    val starts = ranked.groupBy("bucket").agg(min("__grank").as("__start"))
    ranked.join(broadcast(starts), "bucket")
      .withColumn("batch_id",
        floor((col("__grank") - col("__start")) / batchSize).cast("long"))
      .groupBy("bucket", "batch_id")
      .agg(count(lit(1)).as("n_docs"), max("dl").as("max_dl"),
        (count(lit(1)) * max("dl") - sum("dl")).cast("long").as("waste"))
  }

  /** Materialized packed windows: the full concat-and-chunk pipeline
    * ending in actual training rows — (bin_id, n_tokens, payload)
    * with every payload exactly `contextLen` tokens (the final window
    * may be partial). Composition of [[packPlan]] → [[binManifest]] →
    * a token-slice join back to the text → one `groupBy(bin_id)`
    * assembly (boundary-crossing docs contribute a piece to each
    * window they span; pieces concatenate in document order). That
    * last shuffle is THE shard-writer shuffle — everything upstream
    * is the single running-total pass plus per-row arithmetic. */
  def packWindows(docs: DataFrame, orderBucket: Column, contextLen: Int,
                  idCol: String = "doc_id", textCol: String = "text"): DataFrame = {
    val base = docs.select(col(idCol).as("doc_id"), col(textCol).as("__text"),
      TextAnalysis.tokenCountWs(col(textCol)).cast("long").as("n_tokens"))
    val plan = packPlan(base, col("doc_id"), orderBucket, col("n_tokens"), contextLen)
    val mani = binManifest(plan, contextLen)
    val pieces = mani.join(base.select("doc_id", "__text"), "doc_id")
      .select(col("bin_id"), col("doc_id"),
        slice(split(col("__text"), "\\s+"),
          (col("tok_from") + 1).cast("int"),
          (col("tok_to") - col("tok_from")).cast("int")).as("piece"))
    pieces.groupBy("bin_id")
      .agg(flatten(transform(
        array_sort(collect_list(struct(col("doc_id"), col("piece")))),
        e => e.getField("piece"))).as("toks"))
      .select(col("bin_id"), size(col("toks")).cast("long").as("n_tokens"),
        concat_ws(" ", col("toks")).as("payload"))
  }

  def binManifest(plan: DataFrame, contextLen: Int): DataFrame =
    plan.select(col("doc_id"), col("n_tokens"), col("bin_id"), col("bin_offset"),
        explode(sequence(lit(0L), col("n_bins_spanned") - 1)).as("k"))
      .select(
        (col("bin_id") + col("k")).as("bin_id"),
        col("doc_id"),
        greatest(lit(0L), col("k") * contextLen - col("bin_offset")).as("tok_from"),
        least(col("n_tokens"), (col("k") + 1) * contextLen - col("bin_offset")).as("tok_to"))
}
