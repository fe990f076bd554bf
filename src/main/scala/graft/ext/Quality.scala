package graft.ext

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Declarative data-quality constraint checking — the ingestion gate
  * a training-data pipeline fronts every new corpus drop with
  * (completeness, uniqueness, domain membership, bounds, volume)
  * before anything downstream sees the batch.
  *
  * All ratio metrics evaluate in ONE aggregation pass over the
  * input: each constraint contributes an exact integer `sum(CASE)`
  * counter, and the ratios derive from those integers with one
  * `round(x, 6)` at the end — integer counters are exact in any
  * aggregation order and any engine, so the report is
  * oracle-reproducible bit-for-bit. Exact uniqueness ([[Unique]])
  * adds `count(distinct struct(…))` columns to the same aggregate
  * (struct-packed so rows with NULL key components still count as
  * distinct groups, the `SELECT DISTINCT` semantics; Spark plans the
  * multi-distinct via Expand — N extra shuffles of the full input).
  * At 100 TB use [[UniqueApprox]] instead: the same uniqueness ratio
  * from the mergeable HLL sketch aggregate ([[Sketches.hllDistinct]],
  * ~0.8% error at p=14) — it rides the SAME single pass with no
  * Expand, and keeps the exact form for audits.
  *
  * An EMPTY input fails every ratio constraint deterministically
  * (`metric = 0.0, pass = false`): an empty corpus drop is the prime
  * case an ingestion gate exists to catch, so it must read as a
  * failure, not as a vacuous NULL a `filter(!pass)` consumer would
  * silently drop (only [[RowCountBetween]] can legitimately pass at
  * zero rows, when its `lo` is 0).
  *
  * Output: one row per constraint — `(constraint, metric, threshold,
  * pass)` — produced by exploding a literal-built struct array from
  * the single aggregate row, so the whole report stays one job.
  */
object Quality {

  sealed trait Constraint { def name: String }
  /** Non-null ratio of `column` must reach `minRatio`. */
  final case class Complete(column: String, minRatio: Double) extends Constraint {
    def name = s"complete($column)"
  }
  /** Distinct/total ratio over `columns` must reach `minRatio`
    * (1.0 = a true candidate key). Rows with NULL key components
    * count as distinct groups, the `SELECT DISTINCT` semantics. */
  final case class Unique(columns: Seq[String], minRatio: Double = 1.0) extends Constraint {
    def name = s"unique(${columns.mkString(",")})"
  }
  /** [[Unique]]'s 100 TB form: the distinct count comes from the HLL
    * sketch aggregate (~0.8% error at the default p=14) instead of an
    * exact multi-distinct, so the report stays ONE pass with no
    * Expand. Size `minRatio` with the error in mind (a true candidate
    * key reads ≈ 1.0 ± 0.8%, so gate at e.g. 0.95, not 1.0). */
  final case class UniqueApprox(columns: Seq[String], minRatio: Double = 1.0)
      extends Constraint {
    def name = s"unique_approx(${columns.mkString(",")})"
  }
  /** Ratio of rows whose `column` is one of `values` (nulls fail)
    * must reach `minRatio`. */
  final case class InSet(column: String, values: Seq[String], minRatio: Double)
      extends Constraint {
    def name = s"in_set($column)"
  }
  /** Ratio of rows with `lo <= column <= hi` (nulls fail) must reach
    * `minRatio`. */
  final case class Between(column: String, lo: Double, hi: Double, minRatio: Double)
      extends Constraint {
    def name = s"between($column)"
  }
  /** Total row count must land in `[lo, hi]`. Metric is the count
    * itself; threshold reported as `lo`. */
  final case class RowCountBetween(lo: Long, hi: Long) extends Constraint {
    def name = "row_count"
  }

  def checkConstraints(df: DataFrame, constraints: Seq[Constraint]): DataFrame = {
    require(constraints.nonEmpty, "need at least one constraint")
    val n = count(lit(1)).as("__n")
    // one exact integer counter (or distinct count) per constraint
    val aggs: Seq[Column] = constraints.zipWithIndex.map {
      case (Complete(c, _), i) =>
        sum(when(col(c).isNotNull, 1L).otherwise(0L)).as(s"__m$i")
      case (Unique(cs, _), i) =>
        // struct-packed: countDistinct over bare columns drops any
        // tuple containing a NULL from the numerator (while __n counts
        // all rows), deflating the ratio for nullable keys; a struct
        // is itself never null, so its distinct count includes
        // null-component groups — SELECT DISTINCT semantics
        countDistinct(struct(cs.map(col): _*)).as(s"__m$i")
      case (UniqueApprox(cs, _), i) =>
        Sketches.hllDistinct(struct(cs.map(col): _*)).as(s"__m$i")
      case (InSet(c, vs, _), i) =>
        sum(when(col(c).isin(vs: _*), 1L).otherwise(0L)).as(s"__m$i")
      case (Between(c, lo, hi, _), i) =>
        sum(when(col(c) >= lo && col(c) <= hi, 1L).otherwise(0L)).as(s"__m$i")
      case (RowCountBetween(_, _), i) => count(lit(1)).as(s"__m$i")
    }
    val one = df.agg(n, aggs: _*)
    val reports: Seq[Column] = constraints.zipWithIndex.map { case (c, i) =>
      val m = col(s"__m$i")
      // empty-input contract: a ratio over zero rows is a FAILED gate
      // (metric 0.0, pass false), never a NULL a consumer can miss
      def ratio = when(col("__n") === 0L, lit(0.0)).otherwise(round(m / col("__n"), 6))
      def ratioReport(r: Double) = (ratio, lit(r), col("__n") > 0L && ratio >= r)
      val (metric, threshold, pass) = c match {
        case Complete(_, r)      => ratioReport(r)
        case Unique(_, r)        => ratioReport(r)
        case UniqueApprox(_, r)  => ratioReport(r)
        case InSet(_, _, r)      => ratioReport(r)
        case Between(_, _, _, r) => ratioReport(r)
        case RowCountBetween(lo, hi) =>
          (m.cast("double"), lit(lo.toDouble), m >= lo && m <= hi)
      }
      struct(lit(c.name).as("constraint"), metric.cast("double").as("metric"),
        threshold.cast("double").as("threshold"), pass.as("pass"))
    }
    one.select(explode(array(reports: _*)).as("r"))
      .select(col("r.constraint"), col("r.metric"), col("r.threshold"), col("r.pass"))
  }

  /** Per-source corpus scorecard — the one-page ingestion report a
    * curation pipeline publishes per feed: document and character
    * volume, CORPUS-WIDE duplicate exposure (how many of this
    * source's docs also exist elsewhere — the "is this feed a mirror"
    * signal; per-hash counts come from one corpus-wide shuffle on the
    * 16-byte md5, never on text), and mean quality score. Pure
    * composition of gated primitives; one scan + one hash groupBy. */
  def corpusScorecard(docs: DataFrame, sourceCol: String,
                      textCol: String): DataFrame = {
    val h = docs.select(col(sourceCol).as("source"), col(textCol).as("__t"),
      md5(col(textCol)).as("__h"))
    val perHash = h.groupBy("__h").agg(count(lit(1)).as("__n"))
    h.join(perHash, "__h")
      .groupBy("source")
      .agg(count(lit(1)).as("n_docs"),
        sum(length(col("__t"))).cast("long").as("n_chars"),
        sum(when(col("__n") > 1, 1L).otherwise(0L)).as("n_dup"),
        round(avg(TextAnalysis.qualityScore(col("__t"))), 4).as("mean_quality"))
  }

  /** Distribution-drift report between two slices of one frame — the
    * "did yesterday's crawl change shape?" monitor that decides
    * whether a retrain/repartition is warranted before 100 TB of it
    * lands. `isCurrent` labels the current slice (rows where it is
    * NULL count as reference); per `dim` bucket the report carries
    * both slice counts, both shares, and the bucket's PSI
    * (population-stability-index) contribution
    * `(cur − ref) · ln(cur/ref)` — always ≥ 0, sum ≥ 0.2 is the
    * conventional "investigate" line.
    *
    * Shares are clamped to `eps` so a bucket present in only one
    * slice (the interesting case — a new language, a vanished
    * source) contributes a large finite term instead of ±∞.
    *
    * Exactness: counts are exact integers from ONE scan with
    * conditional aggregates (no per-slice re-scan); each PSI term is
    * quantized to a 2^-30 grid BEFORE any cross-engine comparison —
    * the [[CorpusStats.tokenKl]] idiom — so the report re-derives
    * bit-for-bit in SQL. Scale: one shuffle on `dim`; the totals ride
    * a broadcast of the (post-aggregation, small) bucket frame. */
  def driftReport(df: DataFrame, isCurrent: Column, dim: String,
                  eps: Double = 1e-6): DataFrame = {
    val counts = df.groupBy(col(dim).as("bucket"))
      .agg(sum(when(isCurrent, 0L).otherwise(1L)).as("ref_n"),
           sum(when(isCurrent, 1L).otherwise(0L)).as("cur_n"))
    val tot = counts.agg(sum("ref_n").as("__rt"), sum("cur_n").as("__ct"))
    val q = 1073741824.0 // 2^30
    def share(n: Column, t: Column): Column =
      when(t === 0L, lit(eps)).otherwise(greatest(n / t, lit(eps)))
    counts.crossJoin(broadcast(tot))
      .withColumn("__rs", share(col("ref_n"), col("__rt")))
      .withColumn("__cs", share(col("cur_n"), col("__ct")))
      .select(col("bucket"), col("ref_n"), col("cur_n"),
        round(col("__rs"), 6).as("ref_share"),
        round(col("__cs"), 6).as("cur_share"),
        round(floor((col("__cs") - col("__rs")) *
            log(col("__cs") / col("__rs")) * q + 0.5).cast("long") / q, 6)
          .as("psi"))
  }

  /** Chi-square contingency table for two categorical columns — the
    * independence screen (is quality stratified by source? did the
    * label mix shift with the pipeline version?). Emits the FULL
    * row×column grid — absent combinations appear with n_obs 0,
    * because a structurally-missing cell is exactly the dependence
    * signal the test exists to find — with each cell's expected
    * count (row·col/total from exact int64 marginals, one fixed
    * IEEE sequence) and chi² term (o−e)²/e. Sum the terms against a
    * χ² quantile downstream. One count shuffle; marginals are
    * category-sized and broadcast. */
  def chiSquare(df: DataFrame, rowCol: Column, colCol: Column): DataFrame = {
    val obs = df.groupBy(rowCol.as("r"), colCol.as("c"))
      .agg(count(lit(1)).as("n_obs"))
    val rt = obs.groupBy("r").agg(sum("n_obs").as("rt"))
    val ct = obs.groupBy("c").agg(sum("n_obs").as("ct"))
    val tot = obs.agg(sum("n_obs").as("t"))
    val e = col("rt").cast("double") * col("ct").cast("double") /
      col("t").cast("double")
    val o = coalesce(col("n_obs"), lit(0L))
    val term = (o.cast("double") - e) * (o.cast("double") - e) / e
    broadcast(rt).crossJoin(broadcast(ct)).crossJoin(broadcast(tot))
      .join(obs, Seq("r", "c"), "left")
      .select(col("r"), col("c"), o.as("n_obs"),
        round(e, 6).as("expected"), round(term, 6).as("chi2_term"))
  }

  /** Benford first-digit conformance report — the fabricated-data /
    * unit-mixup screen for naturally-spanning positive numeric
    * columns (amounts, populations, file sizes): genuine multi-scale
    * data has first significant digit d with probability
    * log₁₀(1+1/d); synthetic or truncated feeds visibly don't. One
    * count aggregation; the nine expected shares are FIXED literals
    * (pre-rounded to 6 decimals) rather than engine log10 calls, and
    * every digit row appears even at count 0. `value` must be ≥ 1
    * (first digit = first character of the floor's decimal
    * rendering). Deviation is |share − expected| from the exact
    * integer ratio. */
  def benfordReport(df: DataFrame, value: Column): DataFrame = {
    val spark = df.sparkSession
    import spark.implicits._
    val expected = Seq(
      1 -> 0.30103, 2 -> 0.176091, 3 -> 0.124939, 4 -> 0.09691,
      5 -> 0.079181, 6 -> 0.066947, 7 -> 0.057992, 8 -> 0.051153,
      9 -> 0.045757).toDF("digit", "expected_share")
    val counts = df
      .select(substring(value.cast("long").cast("string"), 1, 1)
        .cast("int").as("digit"))
      .groupBy("digit").agg(count(lit(1)).as("n"))
    val total = broadcast(counts.agg(sum("n").as("t")))
    val share = coalesce(col("n"), lit(0L)).cast("double") / col("t").cast("double")
    expected.join(counts, Seq("digit"), "left")
      .crossJoin(total)
      .select(col("digit"), coalesce(col("n"), lit(0L)).as("n"),
        round(share, 6).as("share"), col("expected_share"),
        round(abs(share - col("expected_share")), 6).as("abs_dev"))
  }

  /** Functional-dependency violation report: keys of `determinant`
    * that map to MORE than one distinct `dependent` value — the
    * "same order, two ship modes" class of integrity break that
    * column-wise constraints ([[checkConstraints]]) can't see
    * because it lives in the relationship between columns. Emits one
    * row per violating key with its distinct-dependent count and row
    * count. Clean data returns an EMPTY frame — cheap to alert on.
    * One map-side-combined aggregation on the determinant (the
    * dependent rides along in the same shuffle); NULL dependents
    * count as one more distinct value (a null next to a real value
    * IS a violation). */
  def fdViolations(df: DataFrame, determinant: Seq[String],
                   dependent: String): DataFrame = {
    require(determinant.nonEmpty, "need at least one determinant column")
    val nd = (countDistinct(col(dependent)) +
      max(when(col(dependent).isNull, 1).otherwise(0))).as("n_dependent")
    df.groupBy(determinant.map(col): _*)
      .agg(nd, count(lit(1)).as("n_rows"))
      .filter(col("n_dependent") > 1)
  }
}
