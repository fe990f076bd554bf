package graft

import org.apache.spark.sql.SparkSession

/** Session factory with the engine's recommended configuration.
  *
  * Tuned for correctness parity with the reference workload
  * (`/root/reference/Student_23098644/1.CourseworkOne` — UTC dates,
  * HALF_UP rounding) and for scale (AQE on, skew-join handling on,
  * shuffle partitions sized to the machine, not the 200 default).
  *
  * On a real cluster the same settings apply; only `master` and the
  * shuffle-partition count change (set partitions ≈ 2–3× total cores,
  * and let AQE coalesce down).
  */
object GraftSession {

  /** Apply engine defaults to any builder (local or cluster).
    *
    * Installs [[GraftExtensions]] too: a tuned session carries the
    * whole engine surface — the native SQL functions, the GRAFT SQL
    * dialect, and the reader rewrites (COUNT(*) from manifest,
    * deletion-vector application, manifest data skipping) that the
    * `format("graft")` relation depends on. Extensions only apply to
    * a NEW session (getOrCreate returning an existing one ignores
    * them — Spark's contract), and every injection is idempotent, so
    * stacking an explicit `.withExtensions(new GraftExtensions)` on
    * top is harmless. */
  def tuned(b: SparkSession.Builder, shufflePartitions: Int): SparkSession.Builder =
    b.withExtensions(new GraftExtensions)
      .config("spark.sql.shuffle.partitions", shufflePartitions.toString)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
      .config("spark.sql.adaptive.skewJoin.enabled", "true")
      // join strategy (opt r17, guide §3.1/§9): let the planner pick
      // shuffled-hash over sort-merge when a side is small enough to
      // hash per partition — skips both sorts; AQE additionally
      // rewrites SMJ→SHJ at runtime when every post-shuffle partition
      // is under 128 MB (the threshold that bounds the build-side OOM
      // risk, scale-independent: it is a per-partition bound, not a
      // per-table one). Measured 5-15% on the join-heavy bench rows
      // with no regressions; results are strategy-independent.
      .config("spark.sql.join.preferSortMergeJoin", "false")
      .config("spark.sql.adaptive.maxShuffledHashJoinLocalMapThreshold", "128m")
      // nested-struct pruning for document/struct columns (on by default,
      // pinned here because document queries depend on it at scale)
      .config("spark.sql.optimizer.nestedSchemaPruning.enabled", "true")
      .config("spark.sql.parquet.aggregatePushdown", "true")
      // encoding tolerance: if events.parquet carries TIMESTAMP(NANOS)
      // (which Spark rejects by default), read it as long; the ns/µs/
      // NTZ normalization itself lives in Tables.normalizeEventTs
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      // keep `Window.partitionBy(lit(0))` as a real (constant)
      // partition key: it is this library's explicit idiom for
      // "single-partition window over a frame bounded by
      // construction" (post-agg prefix sums, lag over daily totals).
      // EliminateWindowPartitions would fold it back to an empty
      // partitionSpec, whose only effects here are WindowExec's
      // move-everything warning on known-bounded frames — burying
      // real unpartitioned-window mistakes — and saving one constant
      // hash column. Execution is a single task either way.
      .config("spark.sql.optimizer.excludedRules",
        "org.apache.spark.sql.catalyst.optimizer.EliminateWindowPartitions")
      .config("spark.ui.enabled", "false")

  /** Local session: one JVM, `cores` executor threads. */
  def local(appName: String = "graft"): SparkSession = {
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = tuned(
      SparkSession.builder().master(s"local[$cpus]").appName(appName),
      shufflePartitions = cpus.toInt
    ).getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    spark
  }
}
