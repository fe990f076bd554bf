package graft.ext

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Corpus-statistics operators for training-data curation: quality
  * signals derived from the corpus's own token distribution (the
  * rule-based [[TextAnalysis.qualityScore]] is content-blind to
  * rarity; these see it), and distribution-drift monitoring between
  * corpus cuts.
  *
  * Both operators sum per-token doubles across arbitrary partition
  * orders, so each per-row term is quantized to an integer grid
  * BEFORE aggregation — integer sums are exact in any accumulation
  * order (the portable-IVF trick), which is what lets a SQL oracle
  * re-derive the results bit-for-bit and keeps repeated runs
  * byte-identical under any partitioning. The grids (2⁻²⁰ per-token
  * log-prob, 2⁻³⁰ per-vocab KL term) sit far below any decision
  * threshold a pipeline would apply.
  */
object CorpusStats {

  private def tokens(df: DataFrame, textCol: String, extra: Column*): DataFrame =
    df.select(extra :+ explode(split(lower(col(textCol)), "\\s+")).as("token"): _*)

  /** Per-document mean unigram log-probability under the corpus's own
    * empirical distribution — rare-token-heavy (noisy) documents score
    * low, boilerplate scores high. Two passes over the token stream:
    * one shuffle builds the frequency table, one join scores it; the
    * grand total rides along as a broadcast single row. */
  def unigramLogProb(docs: DataFrame, idCol: String = "doc_id",
                     textCol: String = "text"): DataFrame = {
    val toks = tokens(docs, textCol, col(idCol).as("id"))
    val freq = toks.groupBy("token").agg(count(lit(1)).as("tf"))
    val tot = broadcast(freq.agg(sum("tf").as("t")))
    toks.join(freq, "token").crossJoin(tot)
      .select(col("id"),
        floor(log(col("tf").cast("double") / col("t").cast("double"))
          * lit(1048576.0) + lit(0.5)).cast("long").as("qlp"))
      .groupBy("id")
      .agg(count(lit(1)).as("n_tokens"), sum("qlp").as("sq"))
      .select(col("id").as(idCol), col("n_tokens"),
        round(col("sq").cast("double") / (col("n_tokens") * lit(1048576.0)), 6)
          .as("avg_logprob"))
  }

  /** Per-document unigram entropy — the lexical-diversity signal
    * (templated or keyword-stuffed text has low entropy even when
    * its shingle-repetition score is clean; natural prose sits near
    * ln(vocab-in-doc)). −Σ p ln p rewritten as ln n − (Σ c·ln c)/n
    * so each (doc, token-TYPE) term `c·ln c` quantizes once on the
    * 2⁻²⁰ grid and the per-doc reduction is an exact integer sum —
    * partition-order-proof and SQL-replayable. Two map-side-combined
    * shuffles: (id, token) counts, then the per-doc rollup. */
  def lexicalEntropy(docs: DataFrame, idCol: String = "doc_id",
                     textCol: String = "text"): DataFrame =
    tokens(docs, textCol, col(idCol).as("id"))
      .groupBy("id", "token").agg(count(lit(1)).as("c"))
      .select(col("id"), col("c"),
        floor(log(col("c").cast("double")) * col("c") * lit(1048576.0) + lit(0.5))
          .cast("long").as("q"))
      .groupBy("id")
      .agg(sum("c").as("n_tokens"), sum("q").as("sq"))
      .select(col("id").as(idCol), col("n_tokens"),
        round(log(col("n_tokens").cast("double")) -
          col("sq").cast("double") / (col("n_tokens") * lit(1048576.0)), 6)
          .as("entropy"))

  /** Per-document cross-entropy under the corpus's own add-one-
    * smoothed BIGRAM model, −mean ln p(w2|w1) with p = (c(w1,w2)+1)
    * / (c(w1·)+V) — the sequence-aware upgrade of
    * [[unigramLogProb]]: scrambled or template-stitched text scores
    * high (its bigrams are rare even when its unigrams are common),
    * fluent text low. The cheap stand-in for LM-perplexity filtering
    * when no model is at hand.
    *
    * Determinism: each bigram TYPE's ln p is quantized on the 2⁻²⁰
    * grid once, then summed per document weighted by the doc's own
    * bigram count — integer sums, exact in any order.
    *
    * 100 TB posture: bigrams come from the shuffle-free array zip
    * ([[TextAnalysis.bigrams]]); per-doc bigram counts reduce the
    * stream BEFORE the model join, so a hot bigram joins once per
    * containing doc, not once per occurrence; the bigram-type model
    * table joins on the (w1, w2) compound key (its skew is the
    * doc-frequency of a bigram type — the same bounded shape as the
    * unigram score's token join); the unigram-prefix table is
    * vocab-sized and BROADCAST (if a web-scale vocab ever outgrows
    * that, drop the hint and it degrades to one more equi-join).
    * Documents with < 2 tokens carry a NULL entropy. */
  def bigramCrossEntropy(docs: DataFrame, idCol: String = "doc_id",
                         textCol: String = "text"): DataFrame = {
    val bi = docs.select(col(idCol).as("id"),
        explode(TextAnalysis.bigrams(col(textCol))).as("bg"))
      .select(col("id"), col("bg.w1").as("w1"), col("bg.w2").as("w2"))
    val d12 = bi.groupBy("id", "w1", "w2").agg(count(lit(1)).as("cd"))
    val c12 = bi.groupBy("w1", "w2").agg(count(lit(1)).as("c12"))
    val c1 = bi.groupBy("w1").agg(count(lit(1)).as("c1"))
    val vocab = broadcast(
      tokens(docs, textCol).agg(countDistinct("token").as("v")))
    val scored = d12.join(c12, Seq("w1", "w2"))
      .join(broadcast(c1), Seq("w1"))
      .crossJoin(vocab)
      .select(col("id"), col("cd"),
        floor(log((col("c12") + 1).cast("double") / (col("c1") + col("v")).cast("double"))
          * lit(1048576.0) + lit(0.5)).cast("long").as("qlp"))
      .groupBy("id")
      .agg(sum("cd").as("n_bigrams"), sum(col("qlp") * col("cd")).as("sq"))
      .select(col("id"), col("n_bigrams"),
        round(-col("sq").cast("double") / (col("n_bigrams") * lit(1048576.0)), 6)
          .as("cross_entropy"))
    docs.select(col(idCol).as("id")).join(scored, Seq("id"), "left")
      .select(col("id").as(idCol), col("n_bigrams"), col("cross_entropy"))
  }

  /** DSIR-style importance resampling: select the `k` raw documents
    * whose hashed-unigram profile looks most like a target domain
    * (Xie et al., "Data Selection for Language Models via Importance
    * Resampling", NeurIPS 2023). Tokens hash into `buckets` slots
    * ([[TextAnalysis.rollingHash]] mod `buckets` — a per-row
    * expression, no vocabulary join); each side's bucket distribution
    * is add-one smoothed over the full bucket space, and a document's
    * importance weight is its tokens' summed log-ratio
    * ln p̂_target(b) − ln p̂_raw(b).
    *
    * This is the deterministic top-k variant (the paper's Gumbel
    * resampling adds noise; a reproducible pipeline wants the same
    * selection on every run). Each bucket's two log terms are
    * quantized to the 2⁻²⁰ integer grid BEFORE the per-document sum,
    * and the top-k orders on the INTEGER score (ties → id), so the
    * selected set is bit-stable under any partitioning and exactly
    * re-derivable by a SQL oracle — no float comparison anywhere in
    * the selection.
    *
    * 100 TB posture: the raw corpus is exploded ONCE — the per-doc
    * (id, bucket) counts roll up into the raw bucket distribution
    * rather than re-scanning; the target side only ever materializes
    * its ≤`buckets`-row histogram; the log-ratio table (≤`buckets`
    * rows) broadcasts into the scoring join; selection is a
    * TakeOrderedAndProject (per-partition top-k, k rows to the
    * driver), never a global sort. */
  def dsirSelect(raw: DataFrame, target: DataFrame, k: Int,
                 buckets: Int = 1024, idCol: String = "doc_id",
                 textCol: String = "text"): DataFrame = {
    val grid = lit(1048576.0)
    def qlog(num: Column, den: Column): Column =
      floor(log(num.cast("double") / den.cast("double")) * grid + lit(0.5))
        .cast("long")
    // raw side: one explode, reduced straight to per-doc bucket counts
    val docBuckets = tokens(raw, textCol, col(idCol).as("id"))
      .select(col("id"),
        (TextAnalysis.rollingHash(col("token")) % buckets).as("bucket"))
      .groupBy("id", "bucket").agg(count(lit(1)).as("cnt"))
    val rawHist = docBuckets.groupBy("bucket").agg(sum("cnt").as("cr"))
    val tgtHist = tokens(target, textCol)
      .select((TextAnalysis.rollingHash(col("token")) % buckets).as("bucket"))
      .groupBy("bucket").agg(count(lit(1)).as("ct"))
    val nt = broadcast(tgtHist.agg(coalesce(sum("ct"), lit(0L)).as("nt")))
    val nr = broadcast(rawHist.agg(coalesce(sum("cr"), lit(0L)).as("nr")))
    // buckets absent from the raw corpus can never score a raw doc,
    // so the left join from the raw histogram loses nothing
    val logRatio = rawHist.join(tgtHist, Seq("bucket"), "left")
      .crossJoin(nt).crossJoin(nr)
      .select(col("bucket"),
        (qlog(coalesce(col("ct"), lit(0L)) + 1, col("nt") + buckets) -
          qlog(col("cr") + 1, col("nr") + buckets)).as("lam"))
    docBuckets.join(broadcast(logRatio), "bucket")
      .groupBy("id")
      .agg(sum("cnt").as("n_tokens"), sum(col("cnt") * col("lam")).as("sq"))
      .orderBy(desc("sq"), col("id"))
      .limit(k)
      .select(col("id").as(idCol), col("n_tokens"),
        round(col("sq").cast("double") / grid, 6).as("score"))
  }

  /** Add-one-smoothed unigram KL divergence KL(P‖Q) between two
    * corpus cuts (P = `a`, Q = `b`) over their union vocabulary —
    * the standard drift monitor between train/eval splits, corpus
    * snapshots, or data sources. One full outer join of the two
    * frequency tables, totals broadcast, one quantized sum. Output:
    * a single (vocab, kl) row. */
  def tokenKl(a: DataFrame, b: DataFrame, textCol: String = "text"): DataFrame = {
    def freq(df: DataFrame, name: String) =
      tokens(df, textCol).groupBy("token").agg(count(lit(1)).as(name))
    val joined = freq(a, "tfa").join(freq(b, "tfb"), Seq("token"), "full")
      .select(col("token"),
        coalesce(col("tfa"), lit(0L)).as("tfa"),
        coalesce(col("tfb"), lit(0L)).as("tfb"))
    val totals = broadcast(joined.agg(
      sum("tfa").as("ta"), sum("tfb").as("tb"), count(lit(1)).as("v")))
    joined.crossJoin(totals)
      .select(
        ((col("tfa") + 1).cast("double") / (col("ta") + col("v")).cast("double")).as("p"),
        ((col("tfb") + 1).cast("double") / (col("tb") + col("v")).cast("double")).as("q"))
      .select(floor(col("p") * log(col("p") / col("q")) * lit(1073741824.0) + lit(0.5))
        .cast("long").as("qt"))
      .agg(count(lit(1)).as("vocab"),
        round(sum("qt").cast("double") / lit(1073741824.0), 6).as("kl"))
  }

  /** Schema profile: one row per listed column with row/null/distinct
    * counts — the cheap first look every ingestion pipeline takes
    * before trusting a new source. All counts are exact integers
    * (type-free, so the long-form output has one stable schema for
    * any column mix). One aggregation pass per column, unioned; each
    * is a map-side-combined count — no wide shuffle. */
  def profile(df: DataFrame, cols: Seq[String]): DataFrame =
    cols.map { c =>
      df.agg(count(lit(1)).as("n_rows"),
          sum(when(col(c).isNull, 1L).otherwise(0L)).as("n_null"),
          countDistinct(col(c)).as("n_distinct"))
        .select(lit(c).as("column"), col("n_rows"), col("n_null"), col("n_distinct"))
    }.reduce(_.unionAll(_))

  /** Per-group ordinary-least-squares trend (slope + intercept) of
    * integer observations over an integer axis — the volume-trend /
    * drift-direction detector (is this event type growing? is this
    * source's daily volume decaying?). All five sufficient statistics
    * (n, Σx, Σy, Σxy, Σx²) are exact int64 sums; REBASE the axis
    * near zero first (e.g. hours since corpus start, not epoch
    * hours) so every derived double product stays under 2⁵³ and the
    * closed-form slope/intercept are exact-to-the-ulp in any engine
    * — the same fixed-IEEE-sequence contract as [[groupMoments]].
    * Degenerate groups (single distinct x) report NULLs. */
  def groupTrend(df: DataFrame, group: Column, x: Column,
                 y: Column): DataFrame = {
    val xl = x.cast("long")
    val yl = y.cast("long")
    val agg = df.groupBy(group.as("group")).agg(
      count(lit(1)).as("n"), sum(xl).as("sx"), sum(yl).as("sy"),
      sum(xl * yl).as("sxy"), sum(xl * xl).as("sxx"))
    val nd = col("n").cast("double")
    val num = nd * col("sxy").cast("double") -
      col("sx").cast("double") * col("sy").cast("double")
    val den = nd * col("sxx").cast("double") -
      col("sx").cast("double") * col("sx").cast("double")
    val slope = num / den
    agg.select(col("group"), col("n"),
      round(when(den =!= 0.0, slope), 6).as("slope"),
      round(when(den =!= 0.0,
        (col("sy").cast("double") - slope * col("sx").cast("double")) / nd), 6)
        .as("intercept"))
  }

  /** Per-group distribution-shape profile — population variance,
    * skewness and excess kurtosis — from EXACT integer power sums
    * S₁..S₄ of an integer-valued column: the power sums are int64
    * (map-side combinable, order-proof), and every double that
    * follows is derived from those same integers by one fixed
    * sequence of exactly-rounded IEEE operations (μ = S₁/n,
    * central moments by the binomial expansion, m₂^1.5 as
    * m₂·√m₂ — never pow(), whose libm varies across engines) — so
    * a SQL twin reproduces each statistic bit-for-bit before the
    * final 6-decimal round. Caller guarantees n·max(v)⁴ < 2⁶³
    * (switch the sums to decimal beyond that). Degenerate groups
    * (m₂ = 0) report NULL skew/kurtosis rather than ±Inf. */
  def groupMoments(df: DataFrame, group: Column, value: Column): DataFrame = {
    val v = value.cast("long")
    val agg = df.groupBy(group.as("group")).agg(
      count(lit(1)).as("n"), sum(v).as("s1"), sum(v * v).as("s2"),
      sum(v * v * v).as("s3"), sum(v * v * v * v).as("s4"))
    val n = col("n").cast("double")
    val mu = col("s1") / n
    val m2 = col("s2") / n - mu * mu
    val m3 = col("s3") / n - lit(3.0) * mu * (col("s2") / n) + lit(2.0) * mu * mu * mu
    val m4 = col("s4") / n - lit(4.0) * mu * (col("s3") / n) +
      lit(6.0) * mu * mu * (col("s2") / n) - lit(3.0) * mu * mu * mu * mu
    agg.select(col("group"), col("n"),
      round(mu, 6).as("mean"),
      round(m2, 6).as("variance"),
      round(when(m2 > 0, m3 / (m2 * sqrt(m2))), 6).as("skewness"),
      round(when(m2 > 0, m4 / (m2 * m2) - lit(3.0)), 6).as("kurtosis_excess"))
  }

  /** Key-skew diagnostic: the `k` heaviest values of `key` with their
    * exact corpus share — the pre-flight check before choosing join
    * strategy (a share over ~1/shuffle-partitions flags a key that
    * needs salting or AQE skew handling). One count shuffle + a tiny
    * top-k; share is an exact integer ratio rounded once. */
  def keySkew(df: DataFrame, key: Column, k: Int): DataFrame = {
    val counts = df.groupBy(key.as("key")).agg(count(lit(1)).as("cnt"))
    val tot = broadcast(counts.agg(sum("cnt").as("total")))
    counts.crossJoin(tot)
      .select(col("key"), col("cnt"),
        round(col("cnt").cast("double") / col("total").cast("double"), 6).as("share"))
      .orderBy(desc("cnt"), col("key")).limit(k)
  }

  /** Token frequency spectrum — for each occurrence count c, how
    * many distinct token TYPES occur exactly c times (Zipf's second
    * law view): the hapax-legomena share (c = 1) is the classic
    * OCR-noise / vocabulary-churn signal, and the spectrum's shape
    * feeds vocabulary-size estimators (Good–Turing). Two
    * map-side-combined shuffles: token counts, then the
    * count-of-counts rollup — the second input is vocabulary-sized,
    * not corpus-sized. `share` of vocabulary is an exact integer
    * ratio. */
  def freqSpectrum(docs: DataFrame, textCol: String = "text"): DataFrame = {
    val counts = tokens(docs, textCol).filter(col("token") =!= "")
      .groupBy("token").agg(count(lit(1)).as("c"))
    val spec = counts.groupBy("c").agg(count(lit(1)).as("n_types"))
    val vocab = broadcast(spec.agg(sum("n_types").as("v")))
    spec.crossJoin(vocab)
      .select(col("c").as("occurrences"), col("n_types"),
        round(col("n_types").cast("double") / col("v").cast("double"), 6)
          .as("vocab_share"))
  }

  /** Incremental new-token detection against a seen-vocabulary
    * store — the maintenance form of [[vocabGrowth]] (an OOV spike in
    * today's feed means a domain shift or an encoding break, and is
    * the cue to re-examine tokenizer coverage). The batch's distinct
    * tokens LEFT-ANTI join the store's `token` column: the store
    * never re-derives from its corpus, only the delta is tokenized —
    * the same contract as the incremental-dedup operators. Union the
    * result's tokens into the store to advance it. Returns one row
    * per genuinely-new token with its batch document and occurrence
    * counts. */
  def newTokens(seen: DataFrame, batch: DataFrame, idCol: String = "doc_id",
                textCol: String = "text"): DataFrame = {
    val tok = batch.select(col(idCol).as("id"),
        explode(split(lower(col(textCol)), "\\s+")).as("token"))
      .filter(col("token") =!= "")
    tok.join(seen.select(col("token")), Seq("token"), "left_anti")
      .groupBy("token")
      .agg(countDistinct("id").as("n_docs"), count(lit(1)).as("n_occurrences"))
  }

  /** Pairwise vocabulary overlap between corpus strata (sources):
    * for every stratum pair with any shared token, the exact
    * intersection / union sizes and Jaccard of their distinct-token
    * sets — the redundancy signal mixture planning reads (two
    * near-identical sources shouldn't both get full budget;
    * [[Sampling.budgetWaterfill]] consumes exactly this kind of
    * evidence).
    *
    * Shape: ONE distinct over (stratum, token) — the corpus's text
    * never moves again — then a token equi-join whose fanout per
    * token is the number of strata containing it (bounded by the
    * stratum count, not corpus size), and a broadcast of the
    * stratum-size table. Exact by construction; when the stratum
    * count grows to where |strata|² per hot token hurts, the
    * sketch path is [[Sketches.kmvOverlap]] on per-stratum KMV
    * states — same output shape, bounded error. */
  def sourceOverlap(docs: DataFrame, stratumCol: String = "source",
                    textCol: String = "text"): DataFrame = {
    val st = docs.select(col(stratumCol).as("s"),
        explode(split(lower(col(textCol)), "\\s+")).as("token"))
      .filter(col("token") =!= "").distinct()
    val sizes = st.groupBy("s").agg(count(lit(1)).as("n"))
    st.as("x").join(st.as("y"),
        col("x.token") === col("y.token") && col("x.s") < col("y.s"))
      .groupBy(col("x.s").as("s1"), col("y.s").as("s2"))
      .agg(count(lit(1)).as("n_inter"))
      .join(broadcast(sizes.select(col("s").as("s1"), col("n").as("n1"))), "s1")
      .join(broadcast(sizes.select(col("s").as("s2"), col("n").as("n2"))), "s2")
      .select(col("s1"), col("s2"), col("n_inter"),
        (col("n1") + col("n2") - col("n_inter")).as("n_union"),
        round(col("n_inter").cast("double") /
          (col("n1") + col("n2") - col("n_inter")).cast("double"), 6).as("jaccard"))
  }

  /** Vocabulary growth curve: per ingestion batch
    * (`floor(id / batchSize)`), the count of never-seen-before tokens
    * and the cumulative vocabulary size — the diminishing-returns
    * signal corpus collection decisions read (a flattening curve
    * means new data is re-treading old vocabulary).
    *
    * The naive formulation — `count(distinct token)` over every
    * prefix — rescans the corpus once per batch. The exact
    * reformulation here: a token's FIRST-SEEN batch is `min(batch)`
    * over its occurrences, the per-batch new-token count is a count
    * over that tiny table, and the cumulative curve is a prefix sum —
    * ONE shuffle on token, then batch-cardinality frames. The prefix
    * sum runs through [[graft.ops.RelationalOps.runningTotal]]'s
    * two-phase form (per-bucket windows + broadcast offsets), so no
    * unpartitioned window appears even when the batch axis grows.
    * Batches with tokens but no new ones still appear (new_tokens
    * 0); `vocab_size` is exact, not a sketch. */
  def vocabGrowth(docs: DataFrame, idCol: String = "doc_id",
                  textCol: String = "text", batchSize: Long = 50): DataFrame = {
    require(batchSize > 0, "need positive batchSize")
    val tok = docs
      .select(floor(col(idCol) / batchSize).cast("long").as("batch"),
        explode(split(lower(col(textCol)), "\\s+")).as("token"))
      .filter(col("token") =!= "")
    val firstSeen = tok.groupBy("token").agg(min("batch").as("batch"))
    val perBatch = tok.select("batch").distinct()
      .join(firstSeen.groupBy("batch").agg(count(lit(1)).as("new_tokens")),
        Seq("batch"), "left")
      .withColumn("new_tokens", coalesce(col("new_tokens"), lit(0L)))
    graft.ops.RelationalOps.runningTotal(perBatch,
        floor(col("batch") / 64L).cast("long"), Seq(col("batch")),
        col("new_tokens"), "vocab_size")
      .withColumn("vocab_size", col("vocab_size").cast("long"))
      .select("batch", "new_tokens", "vocab_size")
      .orderBy("batch")
  }
}
