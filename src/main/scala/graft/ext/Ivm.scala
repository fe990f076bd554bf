package graft.ext

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Incremental view maintenance for distributive aggregates — keep a
  * materialized `GROUP BY` result current under a signed change feed
  * instead of recomputing it from the fact table. At 100 TB the
  * difference is the whole point of a materialized view: maintenance
  * cost is proportional to |changes| + |state| (the state is
  * group-count-sized, thousands of rows, not the fact's billions),
  * while a recompute re-shuffles the full table every refresh.
  *
  * The classic IVM boundary, enforced here rather than fudged:
  * COUNT and SUM are self-maintainable under inserts AND deletes
  * (AVG derives as sum/count), but MIN/MAX are not — a delete of the
  * current minimum needs the data to find the runner-up — so this
  * module deliberately offers no min/max maintenance. Re-derive those
  * from the table (or a [[Layout]] manifest, whose per-file stats
  * answer global min/max in metadata).
  *
  * Reference semantics (what the DuckDB gate re-derives): the
  * maintained state after applying a feed EQUALS the aggregate
  * recomputed over the base multiset with every `+1` row added and
  * every `-1` row removed.
  */
object Ivm {

  /** Full recompute of the maintainable aggregate — the bootstrap
    * that materializes a view's initial state, and the twin every
    * maintenance result must equal. Output: `keys`, `cnt`, one
    * `sum_<c>` per sum column. */
  def aggregateOf(df: DataFrame, keys: Seq[String],
                  sumCols: Seq[String]): DataFrame = {
    require(keys.nonEmpty, "aggregateOf needs at least one group key")
    df.groupBy(keys.map(col): _*)
      .agg(count(lit(1)).as("cnt"),
        sumCols.map(c => sum(col(c)).as(s"sum_$c")): _*)
  }

  /** Apply a SIGNED change feed to a materialized aggregate state:
    * `changes` carries data rows plus `opCol` ∈ {+1 insert, −1
    * delete}; an UPDATE is its delete+insert pair, in one feed or
    * across feeds. Returns the new state — `unionByName` of the old
    * state with the feed's group-sums, re-aggregated: one shuffle of
    * |state| + |distinct touched groups| rows, never the fact table.
    * Groups whose count reaches zero VANISH (their sums are
    * definitionally zero then — dropping the row, not keeping a
    * zero-count husk, is what makes maintain ≡ recompute exact).
    *
    * Loud contracts, checked before anything is returned: `opCol`
    * values other than ±1 are refused (a feed of quantities where
    * signs were expected would silently corrupt counts), and a group
    * whose maintained count goes NEGATIVE is refused by name — the
    * feed deleted rows the view never saw, which no ordering of a
    * correct delete+insert stream produces. Both probes run on
    * state-sized frames. */
  def maintainAgg(state: DataFrame, changes: DataFrame,
                  keys: Seq[String], sumCols: Seq[String],
                  opCol: String = "op"): DataFrame = {
    require(keys.nonEmpty, "maintainAgg needs at least one group key")
    val expected = (Seq("cnt") ++ sumCols.map(c => s"sum_$c")).toSet
    // EXACT shape, not subset: maintaining with a subset of the
    // view's sum columns would silently drop the others from the
    // returned state — a permanent loss, not a transient misread
    require(state.columns.toSet.diff(keys.toSet) == expected,
      s"state is not an aggregateOf(keys=$keys, sums=$sumCols) frame; " +
        s"has ${state.columns.mkString(", ")}")
    // an op that is NULL or non-±1 must be refused, not dropped:
    // sum(op) would silently ignore a null and misread anything else.
    // The invalid-row count rides the SAME single pass that builds
    // the delta (checkpointed once), so the advertised cost — one
    // feed pass plus one state-sized shuffle — holds
    val invalid = col(opCol).isNull ||
      (col(opCol) =!= lit(1) && col(opCol) =!= lit(-1))
    val delta = changes.groupBy(keys.map(col): _*)
      .agg(sum(col(opCol)).cast("long").as("cnt"),
        sumCols.map(c => sum(col(c) * col(opCol)).as(s"sum_$c")) :+
          count(when(invalid, lit(1))).as("__graft_bad"): _*)
      .localCheckpoint(true)
    val bad = delta.filter(col("__graft_bad") > 0L)
      .select(keys.map(col): _*).head(1)
    require(bad.isEmpty,
      s"change feed carries null or non-signed $opCol values (e.g. in " +
        s"group ${bad.headOption}) — ops must be +1 (insert) or -1 (delete)")
    val ordered = keys ++ expected.toSeq.sorted
    val merged = state.select(ordered.map(col): _*)
      .unionByName(delta.drop("__graft_bad").select(ordered.map(col): _*))
      .groupBy(keys.map(col): _*)
      .agg(sum(col("cnt")).as("cnt"),
        sumCols.map(c => sum(col(s"sum_$c")).as(s"sum_$c")): _*)
      // eagerly pinned: the negative-count probe and the returned
      // frame must not re-run the union+aggregate twice. State-sized;
      // Spark's context cleaner reclaims it once the caller drops the
      // reference
      .localCheckpoint(true)
    val neg = merged.filter(col("cnt") < 0L)
      .select(keys.map(col): _*).head(1)
    require(neg.isEmpty,
      s"change feed drove group ${neg.headOption} to a negative count " +
        "— it deleted rows the view never saw")
    merged.filter(col("cnt") > 0L)
      .select((keys ++ Seq("cnt") ++ sumCols.map(c => s"sum_$c")).map(col): _*)
  }
}
