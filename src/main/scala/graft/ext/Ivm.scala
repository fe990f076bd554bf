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
  * with [[Layout.minMaxFromManifest]]: the manifest's per-file stats,
  * kept current by every mutation verb, compose global min/max in one
  * file-count-sized metadata job.
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
    for (k <- keys) require(state.columns.contains(k),
      s"group key $k is not a column of the state " +
        s"(has ${state.columns.mkString(", ")})")
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
    // TYPES too, not just names: a feed whose summed type differs
    // from the state's (a double feed onto a long-sum state) would
    // silently retype the maintained state through unionByName
    // coercion — permanently changing exactness of later maintenance.
    // Compared on the AGGREGATED delta (sum of an int feed is long,
    // matching aggregateOf), so a consistent feed always passes.
    // Decimals compare by SCALE only: Spark widens sum(c) and
    // sum(c*op) to different precisions (p+10 vs p+21) for the very
    // same feed column, and precision widening under union keeps the
    // arithmetic exact — same scale is the invariant that matters
    for (c <- "cnt" +: sumCols.map(s => s"sum_$s")) {
      val (stateT, deltaT) = (state.schema(c).dataType, delta.schema(c).dataType)
      val compatible = stateT == deltaT || ((stateT, deltaT) match {
        case (s: org.apache.spark.sql.types.DecimalType,
              d: org.apache.spark.sql.types.DecimalType) => s.scale == d.scale
        case _ => false
      })
      require(compatible,
        s"change feed aggregates $c as $deltaT but the state holds " +
          s"$stateT — a union would silently retype the maintained " +
          "state; cast the feed to the state's element type")
    }
    val bad = delta.filter(col("__graft_bad") > 0L)
      .select(keys.map(col): _*).head(1)
    require(bad.isEmpty,
      s"change feed carries null or non-signed $opCol values (e.g. in " +
        s"group ${bad.headOption}) — ops must be +1 (insert) or -1 (delete)")
    mergeStates(state, delta.drop("__graft_bad"), keys, sumCols)
  }

  /** The shared merge tail of every maintenance verb: union the old
    * state with a PRE-AGGREGATED signed delta (`keys`, `cnt`,
    * `sum_<c>` — possibly several rows per group), re-aggregate,
    * refuse negative counts loudly, and vanish zero-count groups.
    * ONE implementation so [[maintainAgg]] and [[maintainJoinAgg]]
    * cannot fork on the vanish/negative semantics. */
  private def mergeStates(state: DataFrame, delta: DataFrame,
                          keys: Seq[String],
                          sumCols: Seq[String]): DataFrame = {
    val ordered = keys ++ Seq("cnt") ++ sumCols.map(c => s"sum_$c")
    val merged = state.select(ordered.map(col): _*)
      .unionByName(delta.select(ordered.map(col): _*))
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
    merged.filter(col("cnt") > 0L).select(ordered.map(col): _*)
  }

  /** Signed-multiset COMPRESSION of a relation over `cols`: one row
    * per distinct tuple with its multiplicity `cnt` — the side-state
    * representation [[maintainJoinAgg]] keeps for each base table of
    * a join view (a projection of A the maintenance joins against,
    * never A itself). Exactly [[aggregateOf]] with no sum columns. */
  def multisetOf(df: DataFrame, cols: Seq[String]): DataFrame =
    aggregateOf(df, cols, Nil)

  /** Maintain a [[multisetOf]] state under a signed feed — the same
    * ±1 contracts and vanish-at-zero rule as [[maintainAgg]] (it IS
    * maintainAgg with no sums). */
  def maintainMultiset(state: DataFrame, changes: DataFrame,
                       cols: Seq[String],
                       opCol: String = "op"): DataFrame =
    maintainAgg(state, changes, cols, Nil, opCol)

  /** Full recompute of a JOIN-view aggregate from the two sides'
    * multiset states — the bootstrap that materializes the view and
    * the twin every [[maintainJoinAgg]] result must equal. The view
    * is `SELECT groupKeys, count(*), sum(c)... FROM A JOIN B USING
    * (joinKeys) GROUP BY groupKeys` over the DECOMPRESSED multisets:
    * each (a-tuple, b-tuple) pair contributes `cnt_a × cnt_b` rows,
    * so the aggregate weights by that product and the base rows never
    * re-expand. Output: `groupKeys`, `cnt`, one `sum_<c>` per sum
    * column (columns drawn from either side). */
  def aggregateOfJoin(aState: DataFrame, bState: DataFrame,
                      joinKeys: Seq[String], groupKeys: Seq[String],
                      sumCols: Seq[String]): DataFrame = {
    requireJoinShapes(aState, bState, joinKeys, groupKeys, sumCols)
    val a = aState.withColumnRenamed("cnt", "__graft_cnt_a")
    val b = bState.withColumnRenamed("cnt", "__graft_cnt_b")
    val w = col("__graft_cnt_a") * col("__graft_cnt_b")
    a.join(b, joinKeys)
      .groupBy(groupKeys.map(col): _*)
      .agg(sum(w).cast("long").as("cnt"),
        sumCols.map(c => sum(col(c) * w).as(s"sum_$c")): _*)
  }

  /** The contracts [[aggregateOfJoin]] and [[maintainJoinAgg]] share:
    * join keys live on BOTH sides under the same names, every other
    * column name is unambiguous (on exactly one side), and the
    * view's group/sum columns all resolve. Checked loudly up front —
    * a name collision would otherwise surface as a confusing
    * ambiguous-reference analysis error deep inside the delta join. */
  private def requireJoinShapes(aState: DataFrame, bState: DataFrame,
                                joinKeys: Seq[String],
                                groupKeys: Seq[String],
                                sumCols: Seq[String]): Unit = {
    require(joinKeys.nonEmpty, "join view needs at least one join key")
    require(groupKeys.nonEmpty, "join view needs at least one group key")
    val aCols = aState.columns.toSet - "cnt"
    val bCols = bState.columns.toSet - "cnt"
    for (k <- joinKeys) require(aCols.contains(k) && bCols.contains(k),
      s"join key $k must be a column of BOTH side states " +
        s"(a: ${aCols.mkString(", ")}; b: ${bCols.mkString(", ")})")
    val shared = (aCols intersect bCols) -- joinKeys
    require(shared.isEmpty,
      s"side states share non-join columns ${shared.mkString(", ")} — " +
        "rename one side so every view column is unambiguous")
    for (c <- groupKeys ++ sumCols)
      require(aCols.contains(c) || bCols.contains(c),
        s"view column $c is on neither side state")
  }

  /** Incremental maintenance of an aggregate over `A ⋈ B` under
    * signed change feeds on EITHER side — the textbook delta-join:
    * {{{
    *   Δ(A ⋈ B) = ΔA ⋈ B_old  ∪  A_new ⋈ ΔB
    * }}}
    * (exact: the second term's `A_new = A_old + ΔA` absorbs the
    * `ΔA ⋈ ΔB` cross term). The module keeps each side as a
    * [[multisetOf]] state — a compressed projection of the base
    * table, NOT the table itself — so maintenance cost is
    * `|ΔA|·selectivity + |ΔB|·selectivity + |side states| + |view|`,
    * never a rescan of either base table: at 100 TB the side states
    * are the distinct (joinKey, view columns) tuples, orders of
    * magnitude smaller than the facts they compress.
    *
    * Takes the current view state (an [[aggregateOfJoin]] frame), the
    * two side states, and the two signed feeds (either may be empty —
    * pass a `limit(0)` frame); returns the maintained
    * `(view, aState, bState)` triple, each eagerly pinned by its own
    * maintenance pass. All [[maintainAgg]] contracts apply per side
    * (±1 ops refused loudly, phantom deletes caught by the side
    * state's negative-count probe) and to the view merge (negative
    * view counts refused, zero-count groups vanish). The side states
    * are maintained FIRST, so a malformed feed fails before the view
    * is touched. */
  def maintainJoinAgg(view: DataFrame, aState: DataFrame,
                      bState: DataFrame, aChanges: DataFrame,
                      bChanges: DataFrame, joinKeys: Seq[String],
                      groupKeys: Seq[String], sumCols: Seq[String],
                      opCol: String = "op")
      : (DataFrame, DataFrame, DataFrame) = {
    requireJoinShapes(aState, bState, joinKeys, groupKeys, sumCols)
    // EXACT view shape, like maintainAgg's: maintaining with a subset
    // of the view's sum columns would silently drop the others, and a
    // group key the view lacks must fail HERE by name, not as an
    // unresolved-column error deep inside the merge
    for (k <- groupKeys) require(view.columns.contains(k),
      s"group key $k is not a column of the view " +
        s"(has ${view.columns.mkString(", ")})")
    require(view.columns.toSet.diff(groupKeys.toSet) ==
        (Seq("cnt") ++ sumCols.map(c => s"sum_$c")).toSet,
      s"view is not an aggregateOfJoin(groupKeys=$groupKeys, " +
        s"sums=$sumCols) frame; has ${view.columns.mkString(", ")}")
    val aCols = aState.columns.filterNot(_ == "cnt").toSeq
    val bCols = bState.columns.filterNot(_ == "cnt").toSeq
    // side states first: their maintenance validates the feeds' ±1
    // contracts and phantom deletes before the view merge runs
    val aNew = maintainMultiset(aState, aChanges, aCols, opCol)
    val bNew = maintainMultiset(bState, bChanges, bCols, opCol)
    // one delta-join term per side: the feed's rows (op ±1) against
    // the OTHER side's multiset (cnt), each matched pair contributing
    // op × cnt copies of the joined tuple — pre-aggregated straight
    // to the view's group keys, so the merge below is state-sized
    def contrib(feed: DataFrame, other: DataFrame): DataFrame = {
      val w = col(opCol) * col("cnt")
      feed.join(other, joinKeys)
        .groupBy(groupKeys.map(col): _*)
        .agg(sum(w).cast("long").as("cnt"),
          sumCols.map(c => sum(col(c) * w).as(s"sum_$c")): _*)
    }
    val delta = contrib(aChanges, bState)
      .unionByName(contrib(bChanges, aNew))
    for (c <- "cnt" +: sumCols.map(s => s"sum_$s")) {
      val (viewT, deltaT) = (view.schema(c).dataType, delta.schema(c).dataType)
      require(viewT == deltaT,
        s"join delta aggregates $c as $deltaT but the view holds " +
          s"$viewT — cast the feed to the view's element type")
    }
    (mergeStates(view, delta, groupKeys, sumCols), aNew, bNew)
  }
}
