package graft.ext

import graft.functions.SketchAggregates
import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Mergeable sketch operators for corpus-scale cardinality and
  * frequency estimation — the 100 TB answer to `COUNT(DISTINCT)` and
  * exact token counting, whose state grows with the key space.
  *
  * Two hash regimes, mirroring the dedup/sampling split elsewhere in
  * the library:
  *   - production: `xxhash64` (strong mixing), estimates NOT
  *     re-derivable outside Spark;
  *   - portable: the universal family `(A_i·x + B_i) mod 1e9+7` with
  *     MINSTD-derived constants over a 31-polynomial rolling hash —
  *     weaker mixing, but the whole sketch re-derives in plain SQL,
  *     which is what the driver gate value-checks against DuckDB.
  */
object Sketches {

  val P = 1000000007L

  /** i-th member of the portable universal hash family over a long in
    * `[0, P)`. Returns a value in `[0, P)`; every intermediate fits a
    * signed 64-bit integer (`A_i < 2^31`, `x < 2^30`). */
  def uhash(x: Column, idx: Int): Column =
    pmod(lit(Sampling.minstd2(2 * idx + 1)) * x + lit(Sampling.minstd2(2 * idx + 2)), lit(P))

  /** HLL distinct estimate of any column: xxhash64, 63 usable bits,
    * `2^p` registers (default 2^14 = 16 KiB/group, ~0.8% error). */
  def hllDistinct(anyCol: Column, p: Int = 14): Column =
    SketchAggregates.hllSketch(
      xxhash64(anyCol).bitwiseAND(lit(Long.MaxValue)), p, hashBits = 63)

  /** SQL-portable HLL: input is a portable hash in `[0, P) ⊂ [0,
    * 2^30)` (e.g. [[uhash]] of a rolling hash), fixed `m = 64`
    * registers so `alpha_m` is the published 0.709 literal and every
    * `2^-register` term stays exact. Runs the RAW estimator (the
    * linear-counting correction needs `ln`, which isn't bit-portable
    * across engines), so it expects cardinalities ≳ 2.5·64 and reads
    * biased-high below that — ~13% standard error in its regime. Use
    * [[hllDistinct]] when cross-engine audits don't bind. */
  def hllDistinctPortable(portableHashCol: Column): Column =
    SketchAggregates.hllSketch(portableHashCol, p = 6, hashBits = 30, correct = false)

  /** KMV distinct estimate over a portable hash in `[0, P)` — the
    * exact-oracle distinct sketch: every intermediate (the bottom-k
    * distinct hash set, the k-th smallest θ) is an exact integer, so
    * plain SQL replays the estimate bit-for-bit, and the state is
    * simultaneously a uniform distinct sample. ~1/√(k−2) relative
    * error; below k distinct values the count is EXACT. */
  def kmvDistinct(portableHashCol: Column, k: Int = 64): Column =
    SketchAggregates.kmvSketch(portableHashCol, k)

  /** Materialized KMV state (ascending bottom-k distinct hashes) —
    * merge by union + re-bottom-k, estimate via [[kmvEstimateFromValues]]. */
  def kmvValues(portableHashCol: Column, k: Int = 64): Column =
    SketchAggregates.kmvValues(portableHashCol, k)

  /** Estimate from a (merged) ascending bottom-k value array — same
    * formula as the aggregate: exact size below k, `(k−1)·P/θ` at k. */
  def kmvEstimateFromValues(vals: Column, k: Int): Column =
    when(size(vals) < k, size(vals).cast("double"))
      .otherwise(lit((k - 1).toDouble) * lit(1000000007.0) /
        element_at(vals, k).cast("double"))

  /** KMV set-overlap estimates from two value states: the bottom-k
    * of the UNION is a uniform sample of A∪B, and a union-sample
    * member lies in A∩B exactly when it appears in BOTH sketches
    * (θ_U ≤ θ_A, θ_B, so no intersection member below θ_U was evicted
    * from either side) — hence `jaccard ≈ |K∩V_A∩V_B| / k` and
    * `n̂(A∩B) = jaccard · n̂(A∪B)`. This DIRECT estimator avoids HLL
    * inclusion–exclusion's error blow-up on small overlaps, and every
    * intermediate is an exact integer (SQL-replicable). Below k union
    * members everything is exact. Returns a struct
    * `(est_union, est_inter, jaccard)`. */
  def kmvOverlap(valsA: Column, valsB: Column, k: Int): Column = {
    val u = slice(array_sort(array_distinct(concat(valsA, valsB))), 1, k)
    val estU = kmvEstimateFromValues(u, k)
    val interK = size(array_intersect(array_intersect(u, valsA), valsB))
    val denom = when(size(u) < k, size(u)).otherwise(lit(k)).cast("double")
    val jac = when(size(u) === 0, lit(0.0)).otherwise(interK / denom)
    struct(estU.as("est_union"), (jac * estU).as("est_inter"), jac.as("jaccard"))
  }

  /** CMS counter matrix (row-major `d×w` array) over a portable hash
    * column; merge-friendly aggregate state of `d·w` longs. */
  def cmsSketch(portableHashCol: Column, d: Int = 4, w: Int = 512): Column =
    SketchAggregates.cmsSketch(portableHashCol, d, w)

  /** Materialized portable HLL state: the 64 register values as an
    * array column — persist these per batch/partition/day (64 ints)
    * and combine arbitrary subsets later with [[hllMergeRegisters]]
    * without touching raw data. */
  def hllRegistersPortable(portableHashCol: Column): Column =
    SketchAggregates.hllRegisters(portableHashCol, p = 6, hashBits = 30)

  /** Elementwise-max merge of materialized register arrays —
    * `merge(regs(A), regs(B)) = regs(A ∪ B)` exactly. */
  def hllMergeRegisters(regsCol: Column): Column =
    SketchAggregates.hllMerge(regsCol)

  /** Raw m=64 estimate from a register array, as a plain column
    * expression (`aggregate` HOF: every `2^-register` term is an
    * exact double, so this re-derives in SQL — same contract as
    * [[hllDistinctPortable]]). An empty or null array — the
    * merge-aggregate state for a group that saw zero rows — is an
    * empty set: estimate 0.0, not a divide-by-zero Infinity. */
  def hllEstimateFromRegisters(regs: Column): Column =
    when(regs.isNull || size(regs) === 0, lit(0.0))
      .otherwise(lit(0.709) * 64 * 64 / aggregate(regs, lit(0.0),
        (acc, r) => acc +
          lit(1.0) / call_function("shiftleft", lit(1L), r.cast("int")).cast("double")))

  /** Inclusion–exclusion intersection estimate from two materialized
    * register arrays: |A∩B| ≈ est(A) + est(B) − est(A ∪ B), the
    * union registers being the exact elementwise max (`zip_with`,
    * per-row — no aggregate needed for two in-hand sketches). The
    * audit-overlap primitive: "how many users/docs/keys do these two
    * corpus cuts share" from two 64-int summaries, no join. Same raw-
    * estimator regime note as [[hllDistinctPortable]]; subtraction
    * compounds the relative error, so treat small intersections of
    * large sets as noise — the gate carries the true value alongside
    * for exactly that honesty. */
  def hllIntersectEstimate(ra: Column, rb: Column): Column =
    hllEstimateFromRegisters(ra) + hllEstimateFromRegisters(rb) -
      hllEstimateFromRegisters(zip_with(ra, rb, (a, b) => greatest(a, b)))

  /** Misra–Gries heavy hitters over a long key column: at most `k`
    * (key, cnt) counters of state per group however many items
    * stream in (vs `groupBy(key)`'s full-vocabulary shuffle).
    * Returns array<struct<key, cnt>> sorted (cnt desc, key asc).
    * Guarantees (spec-asserted): every key with true frequency
    * > N/(k+1) present; stored ≤ true ≤ stored + N/(k+1). Pair with
    * [[cmsSketch]] to refine the survivors' counts upward. */
  def heavyHitters(keyCol: Column, k: Int): Column =
    org.apache.spark.sql.GraftColumnBridge.column(
      graft.functions.MisraGriesAgg(
        org.apache.spark.sql.GraftColumnBridge.expression(keyCol), k)
        .toAggregateExpression())

  /** CMS lifecycle merge: counter matrices combine by elementwise
    * sum (linearity of counting — `merge(cms(A), cms(B)) =
    * cms(A ⊎ B)` over the multiset union). Persist per-batch
    * matrices ([[cmsSketch]] already emits the full `d×w` array),
    * then combine arbitrary subsets without the raw token stream. */
  def cmsMerge(sketchCol: Column): Column =
    SketchAggregates.arraySum(sketchCol)

  /** Reduce any integer key into the universal family's domain
    * `[0, P)` — the identity for keys already below P. */
  def keyHash(key: Column): Column = pmod(key, lit(P))

  /** [[heavyHitters]]' summary as (key, cnt) ROWS — the storable /
    * mergeable form of the Misra–Gries state (≤ k rows). */
  def mgSummaryRows(df: DataFrame, keyCol: Column, k: Int): DataFrame =
    df.agg(heavyHitters(keyCol, k).as("hh"))
      .select(explode(col("hh")).as("h"))
      .select(col("h.key").as("key"), col("h.cnt").as("cnt"))

  /** Fold a new Misra–Gries summary into a running one with the
    * Agarwal et al. 2013 merge rule, expressed as plain DataFrame
    * algebra over the (key, cnt) rows: add counts keywise, subtract
    * the (k+1)-largest combined count from every counter, keep
    * positives. State stays ≤ k rows and the error bound COMPOSES —
    * after folding summaries covering N total items, every key with
    * true frequency > N/(k+1) is present and
    * `stored ≤ true ≤ stored + N/(k+1)` (SketchesSpec asserts both
    * across a multi-batch fold). Each input is collected through its
    * own `limit(k+1)` — one bounded action per side that both caps
    * the transfer and ENFORCES the ≤k-row summary contract (a raw
    * keyed count sneaking in refuses after k+1 rows, naming the
    * offending input) — and the keywise sum, (k+1)-th-largest
    * selection, and truncation finish on the driver over ≤ 2k rows:
    * no shuffle job at all. This is the streaming deployment of
    * the heavy-hitter monitor: per micro-batch, [[mgSummaryRows]]
    * the batch and fold it in (foreachBatch, like the churn and SCD2
    * maintenance loops) — per-batch cost is summary-sized, while a
    * `groupBy(key)` dashboard would re-shuffle the full vocabulary
    * every time. */
  def mgMergeSummaries(state: DataFrame, delta: DataFrame, k: Int): DataFrame = {
    require(k >= 1, "k must be >= 1")
    val spark = state.sparkSession
    import spark.implicits._
    // both inputs are summaries (≤ k rows each by the MG contract),
    // so the whole merge is driver-sized: collect each input through
    // a limit(k+1) — the limit both ENFORCES the contract per input
    // (the (key, cnt) schema matches any keyed count frame, and a raw
    // vocabulary-sized aggregate, an easy misuse, must refuse after
    // reading k+1 rows, naming the offending input, instead of
    // becoming an unbounded collect) and BOUNDS the transfer by
    // construction. The keywise sum and subtract-and-truncate then
    // finish on the driver over ≤ 2k rows — no union/groupBy shuffle
    // job at all, one bounded action per input.
    def summaryRows(df: DataFrame, which: String): Array[(Long, Long)] = {
      val rows = df.select(col("key"), col("cnt"))
        .limit(k + 1).as[(Long, Long)].collect()
      require(rows.length <= k,
        s"$which has more than $k rows — not a Misra-Gries summary " +
          s"for k=$k (pass mgSummaryRows output, not a raw keyed count)")
      rows
    }
    val summed = (summaryRows(state, "state") ++ summaryRows(delta, "delta"))
      .groupBy(_._1).map { case (key, xs) => (key, xs.map(_._2).sum) }
      .toArray
    val sub =
      if (summed.length <= k) 0L
      else summed.map(_._2).sorted(Ordering.Long.reverse).apply(k)
    summed.toSeq.map { case (key, cnt) => (key, cnt - sub) }
      .filter(_._2 > 0L)
      .toDF("key", "cnt")
  }

  /** Bloom bitset over a portable hash column (default 64 Kibit =
    * 8 KiB, k = 4: <0.1% false positives at ~3k keys, ~3% at 12k). */
  def bloomSketch(portableHashCol: Column, mBits: Int = 65536, k: Int = 4): Column =
    SketchAggregates.bloomSketch(portableHashCol, mBits, k)

  /** Membership probe against a [[bloomSketch]] array column. Plain
    * column expression: broadcast the 1-row sketch frame, crossJoin,
    * and probe — the probe side is filtered BEFORE any shuffle, which
    * is the whole point (semi-join reduction: ship 8 KiB instead of
    * shuffling the fact table). No false negatives; follow with the
    * exact join to cull false positives. */
  def bloomContains(bloom: Column, keyHash: Column, mBits: Int = 65536, k: Int = 4): Column =
    (0 until k).map { i =>
      val pos = pmod(uhash(keyHash, 180 + i), lit(mBits.toLong))
      val word = element_at(bloom, shiftright(pos, 6).cast("int") + 1)
      call_function("shiftright", word, (pos % 64).cast("int"))
        .bitwiseAND(lit(1L)) === lit(1L)
    }.reduce(_ && _)

  /** Fixed-grid histogram quantile: one-pass mergeable alternative to
    * exact `percentile` (which buffers whole groups) and
    * `percentile_approx` (whose sketch isn't re-derivable outside
    * Spark). Bins `value` on a fixed `[lo, hi)` grid — pick a
    * power-of-two width so the bin arithmetic is EXACT in IEEE
    * doubles and re-derives in any engine — then returns, per key,
    * the first bin whose cumulative count reaches `ceil(q·n)` and its
    * midpoint as the estimate (error ≤ half a bin width by
    * construction).
    *
    * Scale: state is ≤ `bins` counters per group (a groupBy(key, bin)
    * count with map-side combine); the window cumsum runs over the
    * tiny (key × bins) counter frame, never over the data. Out-of-
    * range values clamp into the edge bins — size the grid from
    * domain knowledge or a prior [[hllDistinct]]-style profile pass.
    * Output: key, n, qbin, q_est. */
  def histogramQuantile(df: DataFrame, key: Column, value: Column,
                        lo: Double, hi: Double, bins: Int, q: Double): DataFrame = {
    require(bins >= 2 && hi > lo && q > 0 && q < 1, "need bins>=2, hi>lo, 0<q<1")
    val step = (hi - lo) / bins
    val bin = least(lit(bins - 1), greatest(lit(0),
      floor((value - lit(lo)) / lit(step)).cast("int")))
    val counts = df.groupBy(key.as("k"), bin.as("bin")).agg(count(lit(1)).as("c"))
    val cum = counts
      .withColumn("cum", sum("c").over(Window.partitionBy("k").orderBy("bin")))
      .withColumn("n", sum("c").over(Window.partitionBy("k")))
    cum.filter(col("cum") >= ceil(col("n") * lit(q)))
      .groupBy(col("k"))
      .agg(min(col("bin")).as("qbin"), min(col("n")).as("n"))
      .select(col("k"), col("n"),
        col("qbin"), (lit(lo) + (col("qbin") + lit(0.5)) * lit(step)).as("q_est"))
  }

  /** Robust per-group outlier screen on the MAD (median absolute
    * deviation): flag values where |x − median| > cut·1.4826·MAD —
    * the monitoring-side anomaly rule that, unlike mean/σ z-scores,
    * is not dragged by the outliers it is hunting (one corrupt batch
    * of 10⁶-scale values shifts a mean but not a median). Both
    * medians come from [[histogramQuantile]]'s mergeable counter
    * frame, so the whole screen is two count shuffles, two
    * key-count-sized broadcasts, and one aggregation — no per-group
    * value buffering at any point, the shape that survives a
    * billion-row group. Midpoint estimates are exact bin arithmetic,
    * so the flag decision replays bit-for-bit in SQL. Output: one
    * row per key — n, med, mad, n_outliers. */
  def madOutliers(df: DataFrame, key: Column, value: Column,
                  lo: Double, hi: Double, bins: Int,
                  cut: Double = 3.0): DataFrame = {
    val med = histogramQuantile(df, key, value, lo, hi, bins, q = 0.5)
      .select(col("k"), col("q_est").as("med"))
    val dev = df.select(key.as("k"), value.as("v"))
      .join(broadcast(med), "k")
      .withColumn("dev", abs(col("v") - col("med")))
    val mad = histogramQuantile(dev, col("k"), col("dev"),
        0.0, hi - lo, bins, q = 0.5)
      .select(col("k"), col("q_est").as("mad"))
    dev.join(broadcast(mad), "k")
      .groupBy("k")
      .agg(count(lit(1)).as("n"),
        max(col("med")).as("med"), max(col("mad")).as("mad"),
        sum(when(col("dev") > lit(cut) * lit(1.4826) * col("mad"), 1L)
          .otherwise(0L)).as("n_outliers"))
  }

  /** Multi-quantile variant of [[histogramQuantile]]: every requested
    * quantile reads off the SAME per-group counter frame in one agg
    * pass (exact `percentile(..., array(...))` still buffers whole
    * groups; here extra quantiles are free). Output: key, n, and one
    * `<name>` midpoint-estimate column per requested quantile. */
  def histogramQuantiles(df: DataFrame, key: Column, value: Column,
                         lo: Double, hi: Double, bins: Int,
                         qs: Seq[(String, Double)]): DataFrame = {
    require(bins >= 2 && hi > lo && qs.nonEmpty && qs.forall(q => q._2 > 0 && q._2 < 1),
      "need bins>=2, hi>lo, quantiles in (0,1)")
    val step = (hi - lo) / bins
    val bin = least(lit(bins - 1), greatest(lit(0),
      floor((value - lit(lo)) / lit(step)).cast("int")))
    val counts = df.groupBy(key.as("k"), bin.as("bin")).agg(count(lit(1)).as("c"))
    val cum = counts
      .withColumn("cum", sum("c").over(Window.partitionBy("k").orderBy("bin")))
      .withColumn("n", sum("c").over(Window.partitionBy("k")))
    val qCols = qs.map { case (name, q) =>
      min(when(col("cum") >= ceil(col("n") * lit(q)), col("bin"))).as(s"__b_$name")
    }
    val aggCols = min(col("n")).as("n") +: qCols
    val est = cum.groupBy(col("k")).agg(aggCols.head, aggCols.tail: _*)
    qs.foldLeft(est) { case (d, (name, _)) =>
      d.withColumn(name, lit(lo) + (col(s"__b_$name") + lit(0.5)) * lit(step))
        .drop(s"__b_$name")
    }
  }

  /** Inner-product / join-cardinality estimate from two [[cmsSketch]]
    * matrices (Cormode & Muthukrishnan's classic result): each of the
    * d rows' dot product of the two sides' w counters estimates
    * Σ_k fA(k)·fB(k) — the exact row count of an inner equi-join on
    * the sketched key — biased upward by hash collisions; the min
    * over the d rows is the estimate (error ≤ e/w·‖A‖₁·‖B‖₁ w.h.p.).
    * The planner's pre-join sizing primitive: estimate a join's
    * output volume from two constant-size summaries without touching
    * either side's rows — at 100 TB, the difference between choosing
    * broadcast/shuffle/skew handling BEFORE launching the join and
    * discovering mid-job. Exact integer arithmetic on deterministic
    * sketches: engine-portable, SQL-replayable. */
  def cmsInnerProduct(a: Column, b: Column, d: Int = 4, w: Int = 512): Column = {
    val rows = (0 until d).map { i =>
      aggregate(sequence(lit(i * w + 1), lit((i + 1) * w)), lit(0L),
        (acc, j) => acc + element_at(a, j) * element_at(b, j))
    }
    if (rows.size == 1) rows.head else least(rows: _*)
  }

  /** Point estimate for `keyHash` from a [[cmsSketch]] array column:
    * min over the d row counters the key hashes to. Always ≥ the true
    * count. Plain column expression — composes with a broadcast of
    * the 1-row sketch frame over any key frame. */
  def cmsEstimate(sketch: Column, keyHash: Column, d: Int = 4, w: Int = 512): Column = {
    val rows = (0 until d).map { i =>
      element_at(sketch, (lit(i * w) + pmod(uhash(keyHash, 150 + i), lit(w))).cast("int") + 1)
    }
    if (rows.size == 1) rows.head else least(rows: _*)
  }
}
