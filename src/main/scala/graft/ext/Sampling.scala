package graft.ext

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Deterministic sampling and splitting for training-data pipelines.
  *
  * `DataFrame.sample`/`randomSplit` are partition-order dependent —
  * a repartition or a different file split silently changes which
  * rows are sampled, which is unacceptable for reproducible training
  * mixes. Everything here derives membership from `xxhash64(key,
  * salt)` only: stable across runs, partitionings, and cluster sizes,
  * and embarrassingly parallel (a per-row filter, no shuffle).
  */
object Sampling {

  /** Uniform bucket in [0, buckets) from a key column. */
  private def bucket(key: Column, salt: Int, buckets: Int = 1000000): Column =
    pmod(xxhash64(key, lit(salt)), lit(buckets))

  /** SQL-portable bucket for integer keys: Lehmer/MINSTD,
    * `(((key mod m) · 48271) mod m) mod buckets` with m = 2³¹−1. The
    * key is reduced BEFORE the multiply so every intermediate fits a
    * signed 64-bit integer for any bigint key (safe under ANSI
    * overflow checking, and the identical expression evaluates in any
    * SQL engine — the driver gate value-checks it against DuckDB).
    * Weaker mixing than xxhash64; use when sampling decisions must be
    * re-derivable outside Spark (audits, cross-engine pipelines). */
  def minstdBucket(key: Column, buckets: Int): Column =
    pmod(pmod(pmod(key, lit(2147483647L)) * 48271L, lit(2147483647L)), lit(buckets))

  /** Twice-iterated MINSTD of a small positive Int, evaluated at
    * plan-build time — the driver-side constant generator behind the
    * portable universal-hash family `h_i(x) = (A_i·x + B_i) mod P`
    * (P = 1e9+7) used by the portable MinHash/SimHash variants. One
    * iteration is NOT enough: 16807·n stays below the modulus for all
    * constant indexes used here, so its low bits are just n's — the
    * second multiplication wraps and mixes. Returns a value in
    * [1, 2³¹−2]; with x < P the product A·x < 2³¹·P ≈ 2.3·10¹⁸ stays
    * inside a signed 64-bit integer on any engine. */
  def minstd2(n: Int): Long = {
    val m = 2147483647L
    (16807L * ((16807L * n) % m)) % m
  }

  /** Keep ~`fraction` of rows, selected by key hash. */
  def hashSample(df: DataFrame, key: Column, fraction: Double, salt: Int = 0): DataFrame =
    df.filter(bucket(key, salt) < (fraction * 1000000).toLong)

  /** Disjoint named splits with the given weights (normalized), e.g.
    * `split(df, $"doc_id", Seq("train" -> 0.9, "eval" -> 0.1))` adds
    * a `split` column. A row's split depends only on its key.
    * `portable = true` swaps the xxhash64 bucket for the MINSTD
    * bucket so the membership arithmetic re-derives in any SQL
    * engine (integer keys only; the driver gate value-checks it). */
  def split(df: DataFrame, key: Column, weights: Seq[(String, Double)],
            salt: Int = 0, portable: Boolean = false): DataFrame = {
    require(weights.nonEmpty && weights.forall(_._2 > 0), "need positive weights")
    val total = weights.map(_._2).sum
    val b = if (portable) minstdBucket(key, 1000000) else bucket(key, salt)
    val cuts = weights.scanLeft(0.0) { case (acc, (_, w)) => acc + w / total }
      .map(f => (f * 1000000).toLong)
    val expr = weights.zipWithIndex.foldLeft(lit(weights.last._1)) {
      case (acc, ((name, _), i)) =>
        when(b >= lit(cuts(i)) && b < lit(cuts(i + 1)), lit(name)).otherwise(acc)
    }
    df.withColumn("split", expr)
  }

  /** Per-stratum sampling: different fraction per value of `stratum`
    * (e.g. downsample dominant languages, keep all of rare ones).
    * Unlisted strata keep `defaultFraction`. `portable = true` swaps
    * the xxhash64 bucket for the MINSTD bucket (integer keys, SQL
    * re-derivable — see [[minstdBucket]]). */
  def stratifiedSample(df: DataFrame, key: Column, stratum: Column,
                       fractions: Map[String, Double],
                       defaultFraction: Double = 1.0, salt: Int = 0,
                       portable: Boolean = false): DataFrame = {
    val frac = fractions.foldLeft(lit(defaultFraction)) {
      case (acc, (value, f)) => when(stratum === value, lit(f)).otherwise(acc)
    }
    val b = if (portable) minstdBucket(key, 1000000) else bucket(key, salt)
    df.filter(b < (frac * 1000000).cast("long"))
  }

  /** Weighted sampling WITHOUT replacement, k items with inclusion
    * probability ≈ proportional to `weight` — Duffield–Lund–Thorup
    * priority sampling: per-row priority `u / w` from a key-derived
    * uniform `u`, keep the k SMALLEST. All-integer (`u · scale div
    * w`, MINSTD bucket for u), so the sample membership re-derives
    * exactly in any SQL engine — same portability contract as the
    * [[minstdBucket]] splits. A doubled weight exactly halves a
    * row's priority, so inclusion odds scale linearly.
    *
    * Scale: the sort is a top-k (TakeOrderedAndProject — per-
    * partition k-heaps, no full sort), and the priority is a per-row
    * map: the whole operator is one bounded-state pass, the same
    * shape as the per-group cap. Weights are integer ≥ 1 (quantize
    * upstream); `u·scale ≤ 10⁶·10¹²` stays far inside int64. */
  def prioritySample(df: DataFrame, key: Column, weight: Column, k: Int,
                     scale: Long = 1000000000000L): DataFrame =
    df.withColumn("priority",
        call_function("div", (minstdBucket(key, 1000000) + 1L) * lit(scale),
          greatest(weight.cast("long"), lit(1L))))
      .orderBy(col("priority"), key).limit(k)

  /** k deterministic NEGATIVE candidates per query for contrastive
    * training pairs, without a cross join: the corpus gets a dense
    * `0..N-1` numbering from the two-phase prefix sum (never the
    * single-task global window — [[graft.ops.RelationalOps.runningTotal]]),
    * each query explodes into k slots whose target index is a MINSTD
    * draw mod N, and the pairing is ONE equi-join on the index. The
    * draw arithmetic is all-integer and reduces every operand below
    * 2³¹ before multiplying, so the pair set re-derives in any SQL
    * engine. Self-pairs (a query drawing its own id) are dropped —
    * a query yields k or k−1 negatives; re-draw upstream if exact-k
    * matters. In-batch duplicates (two slots drawing the same doc)
    * are kept: they are what an in-batch-negatives trainer sees.
    *
    * Both keys must be non-negative integers from the same id space.
    * `orderBucket` must be a coarse order-preserving prefix of the
    * corpus key (default `key div 2¹⁰` — the runningTotal contract).
    * Scale: one corpus shuffle for the numbering (do it once at
    * ingest and persist alongside the corpus when serving many query
    * batches), one broadcast 1-row count, one equi-join on `__idx`.
    *
    * Returns `(q_key, slot, neg_key)`. */
  def negativePairs(queries: DataFrame, qKey: Column,
                    corpus: DataFrame, cKey: Column, k: Int): DataFrame = {
    require(k >= 1, "need k >= 1")
    val P = 2147483647L
    val numbered = graft.ops.RelationalOps.runningTotal(
        corpus.select(cKey.as("__ckey")),
        call_function("div", col("__ckey"), lit(1024L)),
        Seq(col("__ckey")), lit(1L), "__cum")
      .select(col("__ckey"), (col("__cum").cast("long") - 1L).as("__idx"))
    val total = corpus.agg(count(lit(1)).as("__n"))
    queries.select(qKey.as("q_key"))
      .crossJoin(broadcast(total))
      .withColumn("slot", explode(sequence(lit(0L), lit(k - 1L))))
      .withColumn("__idx", pmod(pmod(
        pmod(pmod(col("q_key"), lit(P)) * 1000003L + col("slot") * 7919L, lit(P))
          * 48271L, lit(P)), col("__n")))
      .join(numbered, "__idx")
      .filter(col("__ckey") =!= col("q_key"))
      .select(col("q_key"), col("slot"), col("__ckey").as("neg_key"))
  }

  /** Leakage-free train/eval split: near-duplicate CLUSTERS are
    * assigned to splits atomically, keyed on the cluster
    * representative — a doc and its near-duplicates can never land on
    * opposite sides of the cut (hash-splitting raw ids leaks ~10% of
    * every eval set back into training via near-dups, silently
    * inflating eval scores). Pairs → connected components →
    * [[split]] on the component representative (singletons are their
    * own representative, so clean docs split exactly as before).
    * Output: the input plus `rep` and `split`. */
  def leakFreeSplit(df: DataFrame, idCol: String, textCol: String,
                    weights: Seq[(String, Double)], n: Int, threshold: Double,
                    scratchDir: Option[String] = None): DataFrame =
    leakFreeSplitFromPairs(df, idCol,
      Dedup.jaccardPairs(df, idCol, textCol, n, threshold), weights, scratchDir)

  /** [[leakFreeSplit]] from a PRE-COMPUTED near-dup pair frame
    * (`d1`, `d2` columns) — the composition entry point: a pipeline
    * that already built pairs from a shared shingle frame (see
    * [[Dedup.jaccardPairsFromShingles]]) splits without re-shingling
    * or re-pairing the corpus. */
  def leakFreeSplitFromPairs(df: DataFrame, idCol: String, pairs: DataFrame,
                             weights: Seq[(String, Double)],
                             scratchDir: Option[String] = None): DataFrame = {
    val labels = Dedup.clusters(pairs.select("d1", "d2"), scratchDir = scratchDir)
      .withColumnRenamed("id", "__cc_id")
    val withRep = df.join(labels, col(idCol) === col("__cc_id"), "left")
      .withColumn("rep", coalesce(col("rep"), col(idCol)))
      .drop("__cc_id")
    split(withRep, col("rep"), weights, portable = true)
  }

  /** Temperature-scaled domain mixing: sample so each stratum's share
    * of the output follows `p(s) ∝ n_s^alpha` (alpha = 1 keeps natural
    * proportions, alpha → 0 flattens toward uniform — the standard
    * multilingual/domain rebalancing knob). With target output size
    * `targetFraction · N`, stratum s keeps fraction
    * `f_s = min(1, targetFraction · N · p(s) / n_s)`; capped strata
    * (rare domains whose flattened share exceeds their size) keep
    * everything and the output lands slightly under target —
    * documented, not renormalized, so f_s stays a pure per-stratum
    * formula.
    *
    * Scale: one small `groupBy(stratum)` count, a 1-row total, and a
    * broadcast join of per-stratum fractions back onto the corpus —
    * the corpus itself is touched by exactly one map-side filter.
    * Determinism: membership is a pure key-hash test (see class doc);
    * `alpha = 0.5` uses IEEE-exact `sqrt` and the weights are
    * quantized to a 2⁻²⁰ integer grid before the total, so the whole
    * fraction derivation is bit-reproducible in any SQL engine
    * (`portable = true` + the gate's DuckDB twin re-derive it). */
  def temperatureSample(df: DataFrame, key: Column, stratum: Column, alpha: Double,
                        targetFraction: Double, salt: Int = 0,
                        portable: Boolean = false): DataFrame = {
    require(alpha > 0 && alpha <= 1, "need 0 < alpha <= 1")
    require(targetFraction > 0 && targetFraction <= 1, "need 0 < targetFraction <= 1")
    val n = col("__n").cast("double")
    // 2^-20-grid integer weight: exact to sum in any order/engine
    val w = if (alpha == 0.5) sqrt(n) else pow(n, lit(alpha))
    val weighted = df.groupBy(stratum.as("__stratum"))
      .agg(count(lit(1)).as("__n"))
      .withColumn("__wq", floor(w * lit(1048576.0) + lit(0.5)).cast("long"))
    val tot = weighted.agg(sum("__n").as("__totN"), sum("__wq").as("__totW"))
    val fracs = weighted.crossJoin(broadcast(tot))
      .select(col("__stratum"),
        least(lit(1.0),
          lit(targetFraction) * col("__totN") * (col("__wq") / col("__totW")) / col("__n"))
          .as("__frac"))
    val b = if (portable) minstdBucket(key, 1000000) else bucket(key, salt)
    df.join(broadcast(fracs), stratum === col("__stratum"))
      .filter(b < floor(col("__frac") * 1000000).cast("long"))
      .drop("__stratum", "__frac")
  }

  /** Per-group frequency cap (domain capping: "at most `cap` docs
    * per source/domain", the standard web-corpus rebalancing rule).
    * Keeps the `cap` rows with the smallest (MINSTD bucket of key,
    * key) per group — deterministic across runs and partitionings,
    * and re-derivable in SQL (the gate's DuckDB twin replays it with
    * `row_number()`).
    *
    * Scale: the window-row_number idiom sorts every group in full;
    * this rides [[graft.ops.RelationalOps.topKPerGroup]]'s size-cap
    * heap — state ≤ cap rows per group, map-side combine, the shuffle
    * carries ≤ cap rows per (partition, group). Output is the narrow
    * (group, hb, key) frame; rejoin on the key for payload columns so
    * heavy text/binary never rides the aggregation shuffle. */
  def capPerGroup(df: DataFrame, group: Column, key: Column, cap: Int): DataFrame =
    graft.ops.RelationalOps.topKPerGroup(df, Seq(group),
      struct(minstdBucket(key, 1000000).as("hb"), key), cap)

  /** Exact integer water-filling of a token `budget` across groups:
    * every group contributes min(its capacity, the water level),
    * where the level is the largest value that spends the whole
    * budget — the mixture-budgeting step that turns "train on B
    * tokens, as uniformly as possible" into per-source take counts
    * (the hard-cap complement of [[temperatureMix]]'s soft
    * reweighting). Classic closed form over capacity-sorted groups:
    * a group is capped iff taking it in full — and at least as much
    * from every larger group — still fits the budget; the remaining
    * budget divides evenly among the uncapped, the integer remainder
    * going to the first `rem` of them in (capacity, group) order.
    * All-integer and total-order deterministic: repartitioning can
    * never move an allocation, and a SQL oracle replays it exactly.
    *
    * Returns one row per group: (group, cap, alloc), with
    * Σ alloc = min(budget, Σ cap) and 0 ≤ alloc ≤ cap.
    *
    * Scale: one shuffle builds the per-group capacities; rank and
    * prefix sums ride [[graft.ops.RelationalOps.runningTotal]]'s
    * two-phase form (a log₂-capacity order bucket — no single-task
    * global window even at web-domain group counts); the
    * capped-side totals are ONE broadcast row. `cap·n_groups` must
    * stay under 2⁶³ and prefix sums under 2⁵³ (the running total
    * accumulates in doubles) — ~10³ times today's public crawls. */
  def budgetWaterfill(df: DataFrame, group: Column, weight: Column,
                      budget: Long): DataFrame = {
    require(budget >= 0, "need budget >= 0")
    val caps = df.groupBy(group.as("source"))
      .agg(sum(weight).cast("long").as("cap"))
    val bucket = floor(log(2.0, col("cap").cast("double") + 1.0))
    val ranked = graft.ops.RelationalOps.runningTotal(
      graft.ops.RelationalOps.runningTotal(
        caps, bucket, Seq(col("cap"), col("source")), lit(1.0), "__k"),
      bucket, Seq(col("cap"), col("source")), col("cap").cast("double"), "__pfx")
    val flagged = ranked
      .select(col("source"), col("cap"), col("__k").cast("long").as("k"),
        (col("__pfx").cast("long") - col("cap")).as("pb"))
      .crossJoin(broadcast(caps.agg(count(lit(1)).as("n"))))
      .withColumn("capped",
        col("pb") + col("cap") * (col("n") - col("k") + 1L) <= budget)
    val st = broadcast(flagged.agg(
      coalesce(sum(when(col("capped"), col("cap"))), lit(0L)).as("pm"),
      coalesce(sum(when(col("capped"), 1L)), lit(0L)).as("m")))
    val u = greatest(col("n") - col("m"), lit(1L))
    flagged.crossJoin(st)
      .select(col("source"), col("cap"),
        when(col("capped"), col("cap"))
          .otherwise(call_function("div", lit(budget) - col("pm"), u) +
            when(col("k") - col("m") <= pmod(lit(budget) - col("pm"), u), 1L)
              .otherwise(0L))
          .as("alloc"))
  }

  /** Materialize a [[budgetWaterfill]] allocation as an actual
    * document subset: within each group, take whole documents in
    * deterministic MINSTD-hash order until the next one would
    * overrun the group's allocation (documents are atomic, so a
    * group may undershoot by less than one document — the budget is
    * never exceeded). The end-to-end "train on ≤B tokens, spread
    * across sources" selector; same determinism contract as
    * everything here: the subset is a pure function of the keys.
    *
    * Returns the narrow (source, id, w, cum_w) frame — rejoin on the
    * key for payloads so text never rides the prefix-sum shuffle.
    *
    * Scale: the per-group cumulative is a GLOBAL two-phase running
    * total over a (group, hash-range) order bucket minus each
    * group's broadcast start offset (the [[Packing.shardAssign]]
    * idiom) — 64-way parallel inside even the hottest group, no
    * per-group single-task window; the ≤n_groups-row allocation
    * table broadcasts into the cutoff filter. */
  def waterfillSample(df: DataFrame, group: Column, key: Column,
                      weight: Column, budget: Long): DataFrame = {
    val alloc = budgetWaterfill(df, group, weight, budget)
      .select(col("source"), col("alloc"))
    val narrow = df.select(group.as("source"), key.as("id"),
      weight.cast("long").as("w"), minstdBucket(key, 1000000).as("hb"))
    val bucket = struct(col("source"), call_function("div", col("hb"), lit(16384L)))
    val cum = graft.ops.RelationalOps.runningTotal(narrow, bucket,
      Seq(col("hb"), col("id")), col("w").cast("double"), "__gcum")
    val starts = cum.groupBy("source").agg(min(col("__gcum") - col("w")).as("__s0"))
    cum.join(broadcast(starts), "source")
      .withColumn("cum_w", (col("__gcum") - col("__s0")).cast("long"))
      .join(broadcast(alloc), "source")
      .filter(col("cum_w") <= col("alloc"))
      .select(col("source"), col("id"), col("w"), col("cum_w"))
  }

  /** Epoch-seeded deterministic global shuffle manifest — the
    * training-order stage at the END of a data pipeline: every
    * example gets `(shard, pos)` such that reading shards in order
    * (or shard-parallel) replays one fixed pseudorandom permutation
    * per epoch, reproducible across reruns, cluster layouts and
    * engines (the same MINSTD arithmetic every portable gate uses;
    * epoch enters as an additive salt BEFORE the multiply, so
    * epochs are distinct permutations, not rotations).
    *
    * Scale: the shard assignment is a pure per-row expression; the
    * per-shard position is a window partitioned BY SHARD — parallel
    * over `shards`, never a global sort. Pick shards ≈ cluster
    * parallelism (each window partition holds n/shards rows). Output:
    * input columns + `shard`, `pos` (0-based within shard, ordered
    * by (hash, key) so equal-hash rows stay deterministic). */
  def epochShuffle(df: DataFrame, key: Column, epoch: Int,
                   shards: Int): DataFrame = {
    require(shards > 0, "need at least one shard")
    val h = pmod(pmod(pmod(key + lit(epoch.toLong) * 999983L, lit(2147483647L))
      * 48271L, lit(2147483647L)) * 48271L, lit(2147483647L))
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col("__shard")).orderBy(col("__h"), key)
    df.withColumn("__h", h)
      .withColumn("__shard", pmod(col("__h"), lit(shards.toLong)))
      .withColumn("pos", row_number().over(w).cast("long") - 1L)
      .withColumn("shard", col("__shard").cast("int"))
      .drop("__h", "__shard")
  }

  /** Within-group quantile normalization: each row's score becomes
    * its percent-rank inside its group — the calibration step that
    * makes quality scores COMPARABLE across strata before a global
    * threshold or mixing policy is applied (a "0.7" from a
    * high-quality source and from a spam-heavy source mean different
    * things; their group-percentiles don't). `key` must make the
    * order total (ties would otherwise make percentiles
    * run-dependent). percent_rank = (rank−1)/(n−1) — identical
    * definition in any SQL engine, exact-rounded doubles. One window
    * per group, never global. */
  def quantileNormalize(df: DataFrame, group: Column, score: Column,
                        key: Column): DataFrame = {
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(group).orderBy(score, key)
    df.withColumn("pct_rank", round(percent_rank().over(w), 6))
  }

  /** Per-group top-p (nucleus) selection by quality mass: within each
    * group, rank rows by `score` descending (ties to the smaller
    * `key`) and keep the best rows until they cover fraction
    * `pNum/pDen` of the group's TOTAL score — the row that crosses
    * the threshold is kept, so every non-empty group retains at
    * least one row. The budget-style dual of [[capPerGroup]]: instead
    * of a fixed row count, each group keeps however many rows its
    * quality concentration needs — a skewed group keeps few, a flat
    * one keeps many.
    *
    * `score` must be integer-typed: the keep predicate
    * `(cum − score)·pDen < pNum·total` is all-int64, exact in any
    * engine and any partition order (no float cumsum drift). Scale:
    * one shuffle on `group`, windows partitioned by group — never
    * global; group size bounds window state exactly as every other
    * per-group operator here. */
  def topPSelect(df: DataFrame, group: Column, key: Column, score: Column,
                 pNum: Long, pDen: Long): DataFrame = {
    require(pNum >= 0 && pDen > 0, "need pNum >= 0 and pDen > 0")
    val W = org.apache.spark.sql.expressions.Window
    val wCum = W.partitionBy(group).orderBy(score.desc, key)
      .rowsBetween(W.unboundedPreceding, 0)
    val wTot = W.partitionBy(group)
    df.withColumn("__cum", sum(score).over(wCum))
      .withColumn("__tot", sum(score).over(wTot))
      .filter((col("__cum") - score) * pDen < lit(pNum) * col("__tot"))
      .drop("__cum", "__tot")
  }
}
