package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** The engine's general relational operator surface (SURVEY.md §2).
  *
  * Every helper is a thin, declarative wrapper over Catalyst-planned
  * primitives — no driver-side materialization anywhere, so each op
  * scales with partition count. Semantics notes cite the reference
  * workload (`/root/reference/Student_23098644/1.CourseworkOne/`).
  */
object RelationalOps {

  /** Conditional aggregation (manual pivot), as in SQLQueries.sql:19-24:
    * `avg(case when country = 'US' then daily_return end)`.
    * Spark's `avg` ignores the NULLs produced by the unmatched branch,
    * matching PostgreSQL. */
  def avgIf(cond: Column, value: Column): Column = avg(when(cond, value))

  /** `GROUP BY`-as-dedup (SQLQueries.sql:42,51): valid because the
    * select list ⊆ group keys, so `dropDuplicates` is equivalent and
    * is the idiomatic (partial-aggregation-friendly) Spark mapping. */
  def dedupRows(df: DataFrame, cols: Seq[String]): DataFrame =
    df.select(cols.map(col): _*).dropDuplicates(cols)

  /** Top-k: sort + limit, planned by Spark as TakeOrderedAndProject
    * (true top-k per partition + driver merge of k rows — no full
    * sort, no full shuffle), as the Mongo `$sort`+`$limit` pipeline
    * (NoSQLQueries.js:11-12) is optimized by mongod. Pass a unique
    * tie-break column for determinism. */
  def topK(df: DataFrame, k: Int, order: Column*): DataFrame =
    df.orderBy(order: _*).limit(k)

  /** Argmin-per-group: the reference's `$sort` + `$group`/`$first`
    * (NoSQLQueries.js:49-50). Spark's `first()` after `orderBy` is
    * NOT stable across partitions (SURVEY §7.4 Q3), so this is a
    * window row_number — deterministic given a total `order`. */
  def argminBy(df: DataFrame, partitionCols: Seq[Column], order: Seq[Column]): DataFrame = {
    val w = Window.partitionBy(partitionCols: _*).orderBy(order: _*)
    df.withColumn("__rn", row_number().over(w)).filter(col("__rn") === 1).drop("__rn")
  }

  /** Clean dirty numeric columns: the reference's documents hold "NA"
    * or null in numeric fields (NoSQLQueries.js:29-33). Drops rows
    * where any column is the sentinel or null, then casts to double.
    * Mirrors `$match: {f: {$nin: ["NA", null]}}` + implicit cast. */
  def cleanNumeric(df: DataFrame, cols: Seq[String], sentinel: String = "NA"): DataFrame = {
    val cleaned = cols.foldLeft(df) { (d, c) =>
      d.filter(col(c).isNotNull && col(c) =!= sentinel)
    }
    cols.foldLeft(cleaned)((d, c) => d.withColumn(c, col(c).cast("double")))
  }

  /** Permissive numeric read: cast-with-null (try_cast) so non-numeric
    * values become NULL and are skipped by avg/sum — Mongo `$avg`
    * semantics (it silently skips non-numeric values; SURVEY §7.4 Q2). */
  def numericOrNull(c: Column): Column = c.cast("string").try_cast("double")

  /** Bounded-state per-group top-k (see
    * [[graft.functions.TopKStructs]]): k smallest `orderStruct`s per
    * key, exploded back to rows. Unlike the window-row_number idiom
    * this never sorts a whole group and shuffles ≤ k rows per
    * (map partition, group). `orderStruct` should end with a unique
    * tie-break field. */
  def topKPerGroup(df: DataFrame, keyCols: Seq[Column], orderStruct: Column,
                   k: Int): DataFrame =
    df.groupBy(keyCols: _*)
      .agg(graft.functions.TopKStructs.topKStructs(orderStruct, k).as("__topk"))
      .withColumn("__e", explode(col("__topk")))
      .drop("__topk")
      .select(col("*"), col("__e.*")).drop("__e")

  /** Skew-safe equi-join of a skewed fact against a dimension: fact
    * rows get a salt in [0, salt), the dim side is replicated `salt`
    * times, and the join key becomes (key, salt) — a single hot key
    * spreads over `salt` reducers instead of one straggler task.
    * Result is identical to `fact.join(dim, key)` (inner). AQE's
    * skew-join handles moderate skew automatically; explicit salting
    * is for the pathological keys AQE splits can't fix (one key >
    * executor memory). */
  def saltedJoin(fact: DataFrame, dim: DataFrame, key: String, salt: Int): DataFrame = {
    val saltedFact = fact.withColumn("__salt",
      pmod(xxhash64(monotonically_increasing_id()), lit(salt)).cast("int"))
    val expandedDim = dim.withColumn("__salt",
      explode(sequence(lit(0), lit(salt - 1))))
    saltedFact.join(expandedDim, Seq(key, "__salt")).drop("__salt")
  }

  /** Scalable running total: a global-window cumulative sum executes
    * in ONE task (Spark moves everything to a single partition for an
    * unpartitioned window). This two-phase form computes the cumsum
    * within `bucket` partitions (parallel), then adds each bucket's
    * prefix offset — a window over the tiny bucket-totals frame,
    * broadcast back. Same result, parallelism = number of buckets.
    * Choose `bucket` as a coarse prefix of the sort order (e.g. month
    * truncation of the date ordering). */
  def runningTotal(df: DataFrame, bucket: Column, order: Seq[Column],
                   value: Column, resultName: String): DataFrame = {
    val wIn = Window.partitionBy(bucket).orderBy(order: _*)
      .rowsBetween(Window.unboundedPreceding, 0)
    val inner = df.withColumn("__bucket", bucket)
      .withColumn("__cum_in", sum(value).over(wIn))
    // partitionBy(lit(0)): same single-task execution over the TINY
    // bucket-totals frame (one row per bucket, bounded by
    // construction), but a non-empty partitionSpec — so WindowExec's
    // move-everything warning stays meaningful elsewhere
    val wPrefix = Window.partitionBy(lit(0)).orderBy("__bucket")
      .rowsBetween(Window.unboundedPreceding, -1)
    val offsets = df.groupBy(bucket.as("__bucket")).agg(sum(value).as("__btot"))
      .withColumn("__off", coalesce(sum(col("__btot")).over(wPrefix), lit(0.0)))
      .select(col("__bucket"), col("__off"))
    inner.join(broadcast(offsets), "__bucket")
      .withColumn(resultName, col("__cum_in") + col("__off"))
      .drop("__bucket", "__cum_in", "__off")
  }

  /** Exact per-group WEIGHTED median: the smallest `value` whose
    * cumulative weight (ordered by value) reaches half the group's
    * total — the robust center a per-domain quality/length profile
    * wants when rows carry unequal mass (docs weighted by tokens,
    * line items by quantity). Weights must be non-negative integers:
    * the crossing test `2·cumw ≥ totw` is then all-int64 and the
    * selected VALUE is deterministic even though within-tie row
    * order isn't (every order crosses inside the same value run).
    * One shuffle on `group`; windows partitioned by group, never
    * global. Returns (group, weighted_median). */
  def weightedMedian(df: DataFrame, group: Column, value: Column,
                     weight: Column): DataFrame = {
    val wOrd = Window.partitionBy(group).orderBy(value)
      .rowsBetween(Window.unboundedPreceding, 0)
    val wAll = Window.partitionBy(group)
    df.withColumn("__g", group)
      .withColumn("__cw", sum(weight).over(wOrd))
      .withColumn("__tw", sum(weight).over(wAll))
      .filter(col("__cw") * 2 >= col("__tw"))
      .groupBy(col("__g").as("group"))
      .agg(min(value).as("weighted_median"))
  }

  /** Ordered token-sequence assembly per group — the events-to-
    * training-sequences step (a user session's actions become one
    * ordered string a sequence model consumes). Rows rank within
    * their group by `order` (make it total — include a unique id —
    * or equal-key rows may swap), the first `maxLen` survive (the
    * cap bounds BOTH per-group window state and output string
    * length — without it one bot session produces an unbounded
    * training row), and tokens concatenate in rank order via
    * collect-then-sort on the (rank, token) struct — the aggregation
    * never depends on collection order. Returns group columns +
    * `n_tokens` (≤ maxLen) + `sequence`. */
  def sequenceAssembly(df: DataFrame, group: Seq[Column], order: Seq[Column],
                       token: Column, maxLen: Int,
                       sep: String = " "): DataFrame = {
    require(maxLen > 0, "need positive maxLen")
    val w = Window.partitionBy(group: _*).orderBy(order: _*)
    df.withColumn("__rn", row_number().over(w))
      .filter(col("__rn") <= maxLen)
      .withColumn("__tok", struct(col("__rn"), token.cast("string").as("t")))
      .groupBy(group: _*)
      .agg(count(lit(1)).as("n_tokens"),
        array_join(transform(array_sort(collect_list(col("__tok"))),
          x => x.getField("t")), sep).as("sequence"))
  }

  /** Per-group exact MODE (most frequent value, ties to the smallest
    * value) — the categorical summary [[weightedMedian]] is for
    * numerics. Two map-side-combined shuffles: (group, value) counts,
    * then a per-group argmax window over the count frame (group ×
    * distinct-value rows, already reduced). Returns (group, mode,
    * n_occurrences). NULL values are excluded (a NULL mode would be
    * indistinguishable from an empty group). */
  def modeBy(df: DataFrame, group: Column, value: Column): DataFrame = {
    val counts = df.filter(value.isNotNull)
      .groupBy(group.as("group"), value.as("mode"))
      .agg(count(lit(1)).as("n_occurrences"))
    val w = Window.partitionBy("group").orderBy(desc("n_occurrences"), col("mode"))
    counts.withColumn("__rn", row_number().over(w))
      .filter(col("__rn") === 1).drop("__rn")
  }

  /** Per-group sorted value list rendered to a deterministic string —
    * the order-stable form of `$push` (NoSQLQueries.js:40) for tests
    * and oracles. Unbounded per-group state: document the group-size
    * bound before using at scale (SURVEY §7.4 Q8). */
  def sortedList(c: Column, sep: String = ","): Column =
    array_join(sort_array(collect_list(c)), sep)

  /** Keyed upsert (MERGE: matched → replace, unmatched → insert) of a
    * delta batch into a store snapshot: delta rows win on key
    * collision, new keys append, untouched store rows pass through.
    * One left-anti equi-join on the key — the store side shuffles on
    * the same key every batch, so a store laid out bucketed on `keys`
    * ([[graft.ext.Layout.writeBucketed]]) upserts with zero store-side
    * exchange. The delta must be key-unique (enforce upstream with
    * [[dedupByGrouping]]); schemas must match by name. */
  def upsert(store: DataFrame, delta: DataFrame, keys: Seq[String]): DataFrame =
    store.join(delta.select(keys.map(col): _*), keys, "left_anti")
      .unionByName(delta)

  /** Schema-drift-tolerant union — the daily-ingest reality where an
    * upstream feed adds a column, drops one, or widens int → long
    * mid-year, and the backfill must still read as ONE frame.
    * Column set = union of all input columns in first-seen order; a
    * frame missing a column contributes typed NULLs; a column whose
    * type differs across frames resolves to the widest NUMERIC type
    * (int < long < float < double — silent data-loss coercions like
    * double → long or anything → string are REFUSED with an error
    * naming the column, because a quiet wrong-typed union is how a
    * 100 TB backfill corrupts itself). Per-frame work is a cast-only
    * projection; the union itself is plan-level, no shuffle. */
  def unionTolerant(frames: Seq[DataFrame]): DataFrame = {
    require(frames.nonEmpty, "need at least one frame")
    import org.apache.spark.sql.types._
    def rank(dt: DataType): Int = dt match {
      case IntegerType => 1
      case LongType => 2
      case FloatType => 3
      case DoubleType => 4
      case _ => 0
    }
    def widen(name: String, a: DataType, b: DataType): DataType =
      if (a == b) a
      else if (rank(a) > 0 && rank(b) > 0) { if (rank(a) >= rank(b)) a else b }
      else throw new IllegalArgumentException(
        s"unionTolerant: column '$name' has irreconcilable types $a vs $b")
    val cols = scala.collection.mutable.LinkedHashMap.empty[String, org.apache.spark.sql.types.DataType]
    frames.foreach(_.schema.fields.foreach { f =>
      cols(f.name) = cols.get(f.name)
        .map(widen(f.name, _, f.dataType)).getOrElse(f.dataType)
    })
    frames.map { df =>
      val have = df.schema.fieldNames.toSet
      df.select(cols.toSeq.map { case (n, dt) =>
        (if (have(n)) col(n).cast(dt) else lit(null).cast(dt)).as(n)
      }: _*)
    }.reduce(_.unionByName(_))
  }
}
