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
    requireMergeCompatible(state, delta, sumCols, "change feed")
    val bad = delta.filter(col("__graft_bad") > 0L)
      .select(keys.map(col): _*).head(1)
    require(bad.isEmpty,
      s"change feed carries null or non-signed $opCol values (e.g. in " +
        s"group ${bad.headOption}) — ops must be +1 (insert) or -1 (delete)")
    mergeStates(state, delta.drop("__graft_bad"), keys, sumCols)
  }

  /** TYPES too, not just names — the check every maintenance verb
    * runs before unioning a signed delta into a held state: a feed
    * whose summed type differs from the state's (a double feed onto a
    * long-sum state) would silently retype the maintained state
    * through unionByName coercion — permanently changing exactness of
    * later maintenance. Compared on the AGGREGATED delta (sum of an
    * int feed is long, matching aggregateOf), so a consistent feed
    * always passes. Decimals compare by SCALE only: Spark widens
    * sum(c), sum(c*op), and a persisted-then-re-merged state to
    * DIFFERENT precisions for the very same column, and precision
    * widening under union keeps the arithmetic exact — same scale is
    * the invariant that matters. ONE implementation so
    * [[maintainAgg]] and [[maintainJoinAgg]] cannot fork on it (a
    * strict-equality fork is precisely what would make a persisted
    * decimal join view permanently unrefreshable once mergeStates
    * widens its stored precision). */
  private def requireMergeCompatible(holder: DataFrame, delta: DataFrame,
                                     sumCols: Seq[String],
                                     what: String): Unit =
    for (c <- "cnt" +: sumCols.map(s => s"sum_$s")) {
      val (heldT, deltaT) =
        (holder.schema(c).dataType, delta.schema(c).dataType)
      val compatible = heldT == deltaT || ((heldT, deltaT) match {
        case (s: org.apache.spark.sql.types.DecimalType,
              d: org.apache.spark.sql.types.DecimalType) => s.scale == d.scale
        case _ => false
      })
      require(compatible,
        s"$what aggregates $c as $deltaT but the state holds " +
          s"$heldT — a union would silently retype the maintained " +
          "state; cast the feed to the state's element type")
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
                      sumCols: Seq[String],
                      where: Option[String] = None): DataFrame = {
    requireJoinShapes(aState, bState, joinKeys, groupKeys, sumCols)
    val a = aState.withColumnRenamed("cnt", "__graft_cnt_a")
    val b = bState.withColumnRenamed("cnt", "__graft_cnt_b")
    val w = col("__graft_cnt_a") * col("__graft_cnt_b")
    // a WHERE over the JOINED tuple (σ(A ⋈ B)): per-row membership,
    // so it applies identically here and to every delta term —
    // σ commutes with the delta-join
    val joined = a.join(b, joinKeys)
    where.fold(joined)(p => joined.filter(expr(p)))
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
                      opCol: String = "op",
                      where: Option[String] = None)
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
    // each feed is read TWICE (its side's maintenance + its delta
    // term) — pin once here so a feed carrying base-table or
    // changesBetween lineage does not recompute per consumer; feeds
    // are churn-sized by contract, and the pins drop before return
    // (every output below is eagerly pinned by its own pass)
    val aF = aChanges.localCheckpoint(true)
    val bF = bChanges.localCheckpoint(true)
    // side states first: their maintenance validates the feeds' ±1
    // contracts and phantom deletes before the view merge runs
    val aNew = maintainMultiset(aState, aF, aCols, opCol)
    val bNew = maintainMultiset(bState, bF, bCols, opCol)
    // one delta-join term per side: the feed's rows (op ±1) against
    // the OTHER side's multiset (cnt), each matched pair contributing
    // op × cnt copies of the joined tuple — pre-aggregated straight
    // to the view's group keys, so the merge below is state-sized
    def contrib(feed: DataFrame, other: DataFrame): DataFrame = {
      val w = col(opCol) * col("cnt")
      val joined = feed.join(other, joinKeys)
      // the view's WHERE filters each delta term over the SAME joined
      // tuple it filtered at bootstrap — per-row membership, so the
      // side states stay UNFILTERED (a row outside the predicate may
      // join into it later) while the view only ever sees σ rows
      where.fold(joined)(p => joined.filter(expr(p)))
        .groupBy(groupKeys.map(col): _*)
        .agg(sum(w).cast("long").as("cnt"),
          sumCols.map(c => sum(col(c) * w).as(s"sum_$c")): _*)
    }
    val delta = contrib(aF, bState)
      .unionByName(contrib(bF, aNew))
    requireMergeCompatible(view, delta, sumCols, "join delta")
    val merged = mergeStates(view, delta, groupKeys, sumCols)
    Checkpoints.unpersist(aF)
    Checkpoints.unpersist(bF)
    (merged, aNew, bNew)
  }

  // ──────────────────── self-refreshing materialized views ────────────────────
  //
  // The capstone the pieces exist for: a PERSISTED aggregate view over
  // a generation-tracked [[Layout]] directory that refreshes itself by
  // diffing generations ([[Layout.changesBetween]]) and maintaining
  // ([[maintainAgg]]) — never recomputing from the base. The view dir
  // holds a JSON meta sidecar (base dir, group keys, sum columns) and
  // exactly one state parquet dir named by the BASE GENERATION it
  // reflects (`state_gen=G`); refresh commits by writing the new state
  // to a temp dir, renaming it to `state_gen=cur`, then dropping the
  // old — a crash between rename and drop leaves two states, and the
  // next refresh takes the max and lazily cleans the rest, so every
  // crash window re-converges instead of double-applying a feed.

  /** One refresh's outcome: the generation span applied and whether
    * any maintenance ran (`refreshed = false` = already current). */
  case class ViewRefreshStats(fromGen: Long, toGen: Long, refreshed: Boolean)

  private def viewMetaPath(viewDir: String): org.apache.hadoop.fs.Path =
    new org.apache.hadoop.fs.Path(s"$viewDir/_graft_view.json")

  private def viewStatePath(viewDir: String,
                            gen: Long): org.apache.hadoop.fs.Path =
    new org.apache.hadoop.fs.Path(s"$viewDir/state_gen=$gen")

  private def viewFs(spark: org.apache.spark.sql.SparkSession,
                     viewDir: String): org.apache.hadoop.fs.FileSystem =
    new org.apache.hadoop.fs.Path(viewDir)
      .getFileSystem(spark.sparkContext.hadoopConfiguration)

  /** The state generations present on disk — normally one; two is a
    * refresh's rename-then-drop crash window (max wins). */
  private def viewStateGens(fs: org.apache.hadoop.fs.FileSystem,
                            viewDir: String): Seq[Long] = {
    val p = new org.apache.hadoop.fs.Path(viewDir)
    if (!fs.exists(p)) Nil
    else fs.listStatus(p).toSeq.map(_.getPath.getName)
      .filter(_.startsWith("state_gen="))
      .map(_.stripPrefix("state_gen=").toLong)
  }

  private def parseViewMeta(spark: org.apache.spark.sql.SparkSession,
                            viewDir: String): org.json4s.JValue = {
    val fs = viewFs(spark, viewDir)
    val p = viewMetaPath(viewDir)
    require(fs.exists(p),
      s"$viewDir holds no materialized view (missing ${p.getName}) — " +
        "createView first")
    val in = fs.open(p)
    val json = try {
      val out = new java.io.ByteArrayOutputStream()
      org.apache.hadoop.io.IOUtils.copyBytes(in, out, 8192, false)
      out.toString("UTF-8")
    } finally in.close()
    org.json4s.jackson.JsonMethods.parse(json)
  }

  private def metaStr(j: org.json4s.JValue, p: String,
                      what: String): String = j match {
    case org.json4s.JString(s) => s
    case other => throw new IllegalArgumentException(
      s"malformed view meta at $p: $what is $other")
  }

  private def metaStrs(j: org.json4s.JValue, p: String,
                       what: String): Seq[String] = j match {
    case org.json4s.JArray(xs) => xs.map(metaStr(_, p, what))
    case other => throw new IllegalArgumentException(
      s"malformed view meta at $p: $what is $other")
  }

  private def readViewMeta(spark: org.apache.spark.sql.SparkSession,
                           viewDir: String)
      : (String, Seq[String], Seq[String], Option[String]) = {
    import org.json4s._
    val jv = parseViewMeta(spark, viewDir)
    val p = viewMetaPath(viewDir).toString
    jv \ "kind" match {
      case JString("join") => throw new IllegalArgumentException(
        s"$viewDir holds a JOIN view — use refreshJoinView / " +
          "readJoinView / rebuildJoinView")
      case JString("chain") => throw new IllegalArgumentException(
        s"$viewDir holds a CHAIN view — use refreshChainView / " +
          "readChainView / rebuildChainView")
      case _ =>
    }
    val where = jv \ "where" match {
      case JNothing | JNull => None
      case w => Some(metaStr(w, p, "where"))
    }
    (metaStr(jv \ "base", p, "base"), metaStrs(jv \ "keys", p, "keys"),
      metaStrs(jv \ "sums", p, "sums"), where)
  }

  /** Commit a state frame as the view's `state_gen=[gen]` via the
    * temp + rename discipline: the write materializes into a
    * `_`-prefixed temp dir (invisible if orphaned, overwritten by the
    * next attempt), then one rename publishes it. */
  private def commitViewState(spark: org.apache.spark.sql.SparkSession,
                              viewDir: String, gen: Long,
                              state: DataFrame): Unit = {
    val fs = viewFs(spark, viewDir)
    val tmp = new org.apache.hadoop.fs.Path(s"$viewDir/_state_tmp")
    state.write.mode("overwrite").parquet(tmp.toString)
    val dest = viewStatePath(viewDir, gen)
    require(!fs.exists(dest),
      s"view state $dest already exists — concurrent refreshers?")
    require(fs.rename(tmp, dest),
      s"failed to publish the view state at $dest")
  }

  /** CREATE MATERIALIZED VIEW: bootstrap an [[aggregateOf]] state over
    * the base layout's CURRENT generation (pinned by number, so a
    * concurrent commit mid-bootstrap cannot tear the read) and persist
    * it under `viewDir` with a meta sidecar naming the base and the
    * aggregate shape. The base must be generation-tracked
    * ([[Layout.enableGenerations]]) — that is what [[refreshView]]
    * diffs against. `viewDir` must not already hold a view; stranded
    * state dirs from a crashed create (no meta sidecar yet = the view
    * never existed) are cleaned and rebuilt, not inherited. */
  def createView(spark: org.apache.spark.sql.SparkSession,
                 baseDir: String, viewDir: String, keys: Seq[String],
                 sumCols: Seq[String],
                 where: Option[String] = None): ViewRefreshStats = {
    require(keys.nonEmpty, "createView needs at least one group key")
    val fs = viewFs(spark, viewDir)
    require(!fs.exists(viewMetaPath(viewDir)),
      s"$viewDir already holds a materialized view — refreshView to " +
        "advance it, or remove the directory to re-create")
    for (g <- viewStateGens(fs, viewDir))
      require(fs.delete(viewStatePath(viewDir, g), true),
        s"failed to clean stranded pre-meta state state_gen=$g")
    val gen = Layout.currentGeneration(spark, baseDir)
    // readSnapshot both pins the bootstrap read AND loudly refuses an
    // untracked base — a view over an untracked dir could never refresh.
    // A WHERE predicate (filtered MV, the `... FROM t WHERE status='F'`
    // shape) applies to the bootstrap here and to every refresh feed:
    // a row's membership is a function of the row alone, so filtering
    // the signed feed maintains exactly the filtered aggregate
    val base0 = Layout.readSnapshot(spark, baseDir, gen)
    val state = aggregateOf(
      where.fold(base0)(w => base0.filter(expr(w)))
        .select((keys ++ sumCols).map(col): _*),
      keys, sumCols)
    commitViewState(spark, viewDir, gen, state)
    // meta last: its presence is what marks the view as existing, so
    // every earlier crash leaves "no view" rather than a half-view
    import org.json4s.JsonDSL._
    val json = org.json4s.jackson.JsonMethods.compact(
      org.json4s.jackson.JsonMethods.render(
        ("base" -> baseDir) ~ ("keys" -> keys) ~ ("sums" -> sumCols) ~
          ("where" -> where)))
    val out = fs.create(viewMetaPath(viewDir), true)
    try out.write(json.getBytes("UTF-8")) finally out.close()
    ViewRefreshStats(gen, gen, refreshed = true)
  }

  /** The base generation the view's persisted state reflects. */
  def viewGeneration(spark: org.apache.spark.sql.SparkSession,
                     viewDir: String): Long = {
    readViewMeta(spark, viewDir)
    val gens = viewStateGens(viewFs(spark, viewDir), viewDir)
    require(gens.nonEmpty,
      s"$viewDir has a meta sidecar but no state dir — rebuildView")
    gens.max
  }

  /** Read the materialized view's current state (`keys`, `cnt`,
    * `sum_<c>`) — a state-sized parquet read, never touching the
    * base. */
  def readView(spark: org.apache.spark.sql.SparkSession,
               viewDir: String): DataFrame =
    spark.read.parquet(
      viewStatePath(viewDir, viewGeneration(spark, viewDir)).toString)

  /** REFRESH MATERIALIZED VIEW, incrementally: diff the base's
    * generation store from the view's pinned generation to the live
    * one ([[Layout.changesBetween]] — file-level, churn-priced),
    * maintain the persisted state ([[maintainAgg]]), and commit the
    * result as the new pinned state. Idempotent when already current
    * (`refreshed = false`, no job runs). A base vacuumed PAST the
    * view's generation fails loudly in changesBetween (the archived
    * manifest is gone) — recovery is [[rebuildView]]; retain enough
    * generations to cover the refresh cadence. A view state AHEAD of
    * the base's live generation means the base was rebuilt out from
    * under the view and is refused by name. */
  def refreshView(spark: org.apache.spark.sql.SparkSession,
                  viewDir: String): ViewRefreshStats = {
    val (base, keys, sums, where) = readViewMeta(spark, viewDir)
    val fs = viewFs(spark, viewDir)
    val gens = viewStateGens(fs, viewDir)
    require(gens.nonEmpty,
      s"$viewDir has a meta sidecar but no state dir — rebuildView")
    val pinned = gens.max
    // lazily heal the rename-then-drop crash window: older states are
    // superseded by construction (max wins), never re-applied
    for (g <- gens if g < pinned)
      require(fs.delete(viewStatePath(viewDir, g), true),
        s"failed to drop superseded view state state_gen=$g")
    val cur = Layout.currentGeneration(spark, base)
    if (cur == pinned) return ViewRefreshStats(pinned, pinned, refreshed = false)
    require(cur > pinned,
      s"view state at generation $pinned is AHEAD of the base's live " +
        s"$cur — $base was rebuilt or replaced out from under the " +
        "view; rebuildView against the new base history")
    val state = spark.read.parquet(viewStatePath(viewDir, pinned).toString)
    val feed0 = Layout.changesBetween(spark, base, pinned, cur)
    // a filtered view filters its FEED by the same predicate: row
    // membership is a function of the row alone, so the signed feed's
    // filtered subset maintains exactly the filtered aggregate
    val feed = where.fold(feed0)(w => feed0.filter(expr(w)))
    val next = maintainAgg(state,
      feed.select((keys ++ sums :+ "op").map(col): _*), keys, sums)
    commitViewState(spark, viewDir, cur, next)
    require(fs.delete(viewStatePath(viewDir, pinned), true),
      s"failed to drop the superseded view state state_gen=$pinned")
    ViewRefreshStats(pinned, cur, refreshed = true)
  }

  /** Full recompute fallback for the documented refresh boundary
    * (base vacuumed past the view's generation, or a base rebuilt
    * under the view): re-bootstrap at the live generation and replace
    * the state, keeping the meta sidecar. */
  def rebuildView(spark: org.apache.spark.sql.SparkSession,
                  viewDir: String): ViewRefreshStats = {
    val (base, keys, sums, where) = readViewMeta(spark, viewDir)
    val fs = viewFs(spark, viewDir)
    val cur = Layout.currentGeneration(spark, base)
    val base0 = Layout.readSnapshot(spark, base, cur)
    val state = aggregateOf(
      where.fold(base0)(w => base0.filter(expr(w)))
        .select((keys ++ sums).map(col): _*),
      keys, sums)
    val old = viewStateGens(fs, viewDir)
    // any old state whose label would OUT-RANK the rebuilt one under
    // the readers' max rule (a collision, or a base rebuilt at a
    // LOWER generation) must clear BEFORE the publish — a crash
    // between publish and cleanup would otherwise leave the stale
    // state winning reads and the next refresh discarding the fresh
    // one as "superseded". The only crash window without a live
    // state is mid-pre-clear, whose recovery is this same verb.
    for (g <- old if g >= cur)
      require(fs.delete(viewStatePath(viewDir, g), true),
        s"failed to drop view state state_gen=$g before rebuild")
    commitViewState(spark, viewDir, cur, state)
    for (g <- old if g < cur)
      require(fs.delete(viewStatePath(viewDir, g), true),
        s"failed to drop superseded view state state_gen=$g")
    ViewRefreshStats(old.maxOption.getOrElse(cur), cur, refreshed = true)
  }

  /** The signed change feed OF A JOIN ITSELF — what turns two-table
    * maintenance into N-WAY maintenance by COMPOSITION: `Δ(A ⋈ B) =
    * ΔA ⋈ B_old ∪ A_new ⋈ ΔB`, emitted as a row-level signed feed
    * (joined tuples + `op` ∈ ±1) that every downstream consumer
    * treats exactly like a base-table feed. A chain `(A ⋈ B) ⋈ C`
    * maintains by keeping a [[multisetOf]] state for the INTERMEDIATE
    * join: feed that state with this delta via [[maintainMultiset]],
    * and pass the SAME delta as the left side's feed of the outer
    * join — each additional table adds one churn-priced delta-join,
    * never a recompute of the prefix.
    *
    * Each feed row (op ±1) matched against the OTHER side's multiset
    * row (cnt ≥ 1) contributes `cnt` unit tuples of sign `op` —
    * expanded via `sequence`/`explode`, churn-priced because the feed
    * side IS the churn. `aStateNew` must be the POST-feed state of A
    * (`maintainMultiset(aStateOld, aFeed, …)`): the `A_new ⋈ ΔB` term
    * is what absorbs the `ΔA ⋈ ΔB` cross term, so passing the
    * pre-feed state mis-counts it. Output columns: the union of both
    * sides' tuple columns plus `opCol`. */
  def deltaJoinFeed(aStateOld: DataFrame, aStateNew: DataFrame,
                    bStateOld: DataFrame, aFeed: DataFrame,
                    bFeed: DataFrame, joinKeys: Seq[String],
                    opCol: String = "op"): DataFrame = {
    require(joinKeys.nonEmpty, "deltaJoinFeed needs a join key")
    // loud shape guards, like the rest of the family — a mixed-up
    // argument must fail by name, not as an ambiguous-reference
    // AnalysisException deep inside the join
    for ((st, side) <- Seq((aStateOld, "aStateOld"),
        (aStateNew, "aStateNew"), (bStateOld, "bStateOld"))) {
      require(st.columns.contains("cnt"),
        s"$side is not a multisetOf frame (no cnt column)")
      require(!st.columns.contains(opCol),
        s"$side already carries a column named $opCol — pass a " +
          "different opCol")
    }
    for ((f, side) <- Seq((aFeed, "aFeed"), (bFeed, "bFeed")))
      require(!f.columns.contains("cnt"),
        s"$side carries a cnt column — it looks like a multiset " +
          "state, not a signed row feed")
    val aCols = aStateOld.columns.filterNot(_ == "cnt").toSeq
    val bCols = bStateOld.columns.filterNot(_ == "cnt").toSeq
    for (k <- joinKeys) require(aCols.contains(k) && bCols.contains(k),
      s"join key $k must be a column of BOTH side states")
    val shared = (aCols.toSet intersect bCols.toSet) -- joinKeys
    require(shared.isEmpty,
      s"side states share non-join columns ${shared.mkString(", ")} — " +
        "rename one side so every joined-tuple column is unambiguous")
    val outCols = (aCols ++ bCols).distinct
    def term(feed: DataFrame, other: DataFrame): DataFrame =
      feed.join(other, joinKeys)
        .withColumn("__graft_i", explode(sequence(lit(1L), col("cnt"))))
        .select((outCols :+ opCol).map(col): _*)
    term(aFeed, bStateOld).unionByName(term(bFeed, aStateNew))
  }

  // ───────────── persisted self-refreshing JOIN views ─────────────
  //
  // The same persistence discipline over [[maintainJoinAgg]]: a view
  // over A ⋈ B pins a generation PAIR, and its state is the TRIO the
  // delta-join needs — the view aggregate plus both side multisets
  // (compressed projections of the bases, never the bases). A refresh
  // diffs EACH base's generation store from its pinned generation
  // ([[Layout.changesBetween]], churn-priced; an unmoved side yields
  // an empty feed) and maintains all three in one pass. Commit
  // interleavings across the two bases cannot skew the result: the
  // view is a function of the two current multisets alone, and the
  // delta-join is exact for the pair transition whatever the true
  // temporal order of the underlying commits was.

  /** One join-view refresh's outcome: the generation span applied on
    * each base, and whether any maintenance ran. */
  case class JoinViewRefreshStats(fromAGen: Long, toAGen: Long,
                                  fromBGen: Long, toBGen: Long,
                                  refreshed: Boolean)

  private val JoinStateRe = """state_agen=(\d+)_bgen=(\d+)""".r

  private def joinStatePath(viewDir: String, gA: Long,
                            gB: Long): org.apache.hadoop.fs.Path =
    new org.apache.hadoop.fs.Path(s"$viewDir/state_agen=${gA}_bgen=$gB")

  /** State pairs on disk — normally one; two is the refresh's
    * rename-then-drop crash window. Refreshes advance at least one
    * component and never regress either, so any two states are
    * componentwise comparable and the lexicographic max IS the
    * componentwise max. */
  private def joinStateGens(fs: org.apache.hadoop.fs.FileSystem,
                            viewDir: String): Seq[(Long, Long)] = {
    val p = new org.apache.hadoop.fs.Path(viewDir)
    if (!fs.exists(p)) Nil
    else fs.listStatus(p).toSeq.map(_.getPath.getName).collect {
      case JoinStateRe(a, b) => (a.toLong, b.toLong)
    }
  }

  private case class JoinViewMeta(aBase: String, bBase: String,
                                  joinKeys: Seq[String],
                                  groupKeys: Seq[String],
                                  sums: Seq[String],
                                  aCols: Seq[String], bCols: Seq[String],
                                  where: Option[String])

  private def readJoinViewMeta(spark: org.apache.spark.sql.SparkSession,
                               viewDir: String): JoinViewMeta = {
    import org.json4s._
    val jv = parseViewMeta(spark, viewDir)
    val p = viewMetaPath(viewDir).toString
    jv \ "kind" match {
      case JString("join") =>
      case JString("chain") => throw new IllegalArgumentException(
        s"$viewDir holds a CHAIN view — use refreshChainView / " +
          "readChainView / rebuildChainView")
      case _ => throw new IllegalArgumentException(
        s"$viewDir holds a single-base view — use refreshView / " +
          "readView / rebuildView")
    }
    JoinViewMeta(metaStr(jv \ "abase", p, "abase"),
      metaStr(jv \ "bbase", p, "bbase"),
      metaStrs(jv \ "joinKeys", p, "joinKeys"),
      metaStrs(jv \ "groupKeys", p, "groupKeys"),
      metaStrs(jv \ "sums", p, "sums"),
      metaStrs(jv \ "acols", p, "acols"),
      metaStrs(jv \ "bcols", p, "bcols"),
      jv \ "where" match {
        case JNothing | JNull => None
        case w => Some(metaStr(w, p, "where"))
      })
  }

  /** Column names a WHERE predicate references — the side states must
    * carry them even when they are neither group nor sum columns (a
    * row OUTSIDE the predicate may join into it after the other side
    * changes, so membership is decided per delta term, never by
    * pre-filtering a side). Parsed from the unresolved expression. */
  private def whereColsOf(where: Option[String]): Seq[String] =
    where.toSeq.flatMap(w =>
      org.apache.spark.sql.catalyst.parser.CatalystSqlParser
        .parseExpression(w).collect {
          case a: org.apache.spark.sql.catalyst.analysis.UnresolvedAttribute =>
            a.nameParts.last
        }).distinct

  /** Publish a (view, aState, bState) trio as `state_agen=_bgen=` via
    * the same temp + rename discipline as [[commitViewState]]: all
    * three land in the `_`-prefixed temp dir, ONE rename makes the
    * pair live. */
  private def commitJoinState(spark: org.apache.spark.sql.SparkSession,
                              viewDir: String, gA: Long, gB: Long,
                              view: DataFrame, aState: DataFrame,
                              bState: DataFrame): Unit = {
    val fs = viewFs(spark, viewDir)
    val tmp = new org.apache.hadoop.fs.Path(s"$viewDir/_state_tmp")
    require(fs.delete(tmp, true) || !fs.exists(tmp),
      s"failed to clear the state staging dir at $tmp")
    view.write.parquet(s"$tmp/view")
    aState.write.parquet(s"$tmp/a")
    bState.write.parquet(s"$tmp/b")
    val dest = joinStatePath(viewDir, gA, gB)
    require(!fs.exists(dest),
      s"join view state $dest already exists — concurrent refreshers?")
    require(fs.rename(tmp, dest),
      s"failed to publish the join view state at $dest")
  }

  /** CREATE MATERIALIZED VIEW over `A ⋈ B`: bootstrap the side
    * multisets and the [[aggregateOfJoin]] view at both bases'
    * CURRENT generations (pinned by number) and persist the trio
    * under `viewDir` with a meta sidecar naming both bases and the
    * join/aggregate shape. Both bases must be generation-tracked.
    * Every non-join view column must live on exactly ONE base — the
    * same unambiguity [[maintainJoinAgg]] enforces on the states,
    * checked here against the base schemas so the error names the
    * column before anything persists. */
  def createJoinView(spark: org.apache.spark.sql.SparkSession,
                     aDir: String, bDir: String, viewDir: String,
                     joinKeys: Seq[String], groupKeys: Seq[String],
                     sumCols: Seq[String],
                     where: Option[String] = None): JoinViewRefreshStats = {
    require(joinKeys.nonEmpty, "createJoinView needs a join key")
    require(groupKeys.nonEmpty, "createJoinView needs a group key")
    val fs = viewFs(spark, viewDir)
    require(!fs.exists(viewMetaPath(viewDir)),
      s"$viewDir already holds a materialized view — refreshJoinView " +
        "to advance it, or remove the directory to re-create")
    for ((ga, gb) <- joinStateGens(fs, viewDir))
      require(fs.delete(joinStatePath(viewDir, ga, gb), true),
        s"failed to clean stranded pre-meta state ($ga, $gb)")
    val gA = Layout.currentGeneration(spark, aDir)
    val gB = Layout.currentGeneration(spark, bDir)
    val aAll = Layout.readSnapshot(spark, aDir, gA)
    val bAll = Layout.readSnapshot(spark, bDir, gB)
    for (k <- joinKeys)
      require(aAll.columns.contains(k) && bAll.columns.contains(k),
        s"join key $k must be a column of BOTH bases")
    // predicate columns ride along in the side states: membership is
    // decided per joined tuple at every delta term, so the states
    // stay UNFILTERED and must carry what the predicate reads
    val rest = (groupKeys ++ sumCols ++ whereColsOf(where)).distinct
      .filterNot(joinKeys.contains)
    for (c <- rest) {
      val (onA, onB) = (aAll.columns.contains(c), bAll.columns.contains(c))
      require(onA || onB, s"view column $c is on neither base")
      require(!(onA && onB),
        s"view column $c is on BOTH bases — project/rename one side " +
          "so every view column is unambiguous")
    }
    val aCols = joinKeys ++ rest.filter(aAll.columns.contains)
    val bCols = joinKeys ++ rest.filter(bAll.columns.contains)
    // pin the side multisets: the view bootstrap AND all three state
    // writes read them — unpinned, each consumer re-scans its base
    val a0 = multisetOf(aAll.select(aCols.map(col): _*), aCols)
      .localCheckpoint(true)
    val b0 = multisetOf(bAll.select(bCols.map(col): _*), bCols)
      .localCheckpoint(true)
    val v0 = aggregateOfJoin(a0, b0, joinKeys, groupKeys, sumCols, where)
    commitJoinState(spark, viewDir, gA, gB, v0, a0, b0)
    Checkpoints.unpersist(a0)
    Checkpoints.unpersist(b0)
    // meta last, same rule as createView: its presence marks existence
    import org.json4s.JsonDSL._
    val json = org.json4s.jackson.JsonMethods.compact(
      org.json4s.jackson.JsonMethods.render(
        ("kind" -> "join") ~ ("abase" -> aDir) ~ ("bbase" -> bDir) ~
          ("joinKeys" -> joinKeys) ~ ("groupKeys" -> groupKeys) ~
          ("sums" -> sumCols) ~ ("acols" -> aCols) ~
          ("bcols" -> bCols) ~ ("where" -> where)))
    val out = fs.create(viewMetaPath(viewDir), true)
    try out.write(json.getBytes("UTF-8")) finally out.close()
    JoinViewRefreshStats(gA, gA, gB, gB, refreshed = true)
  }

  /** The (aBase, bBase) generation pair the persisted state
    * reflects. */
  def joinViewGenerations(spark: org.apache.spark.sql.SparkSession,
                          viewDir: String): (Long, Long) = {
    readJoinViewMeta(spark, viewDir)
    val gens = joinStateGens(viewFs(spark, viewDir), viewDir)
    require(gens.nonEmpty,
      s"$viewDir has a meta sidecar but no state dir — rebuildJoinView")
    gens.max
  }

  /** Read the join view's current aggregate (`groupKeys`, `cnt`,
    * `sum_<c>`) — state-sized, never touching either base. */
  def readJoinView(spark: org.apache.spark.sql.SparkSession,
                   viewDir: String): DataFrame = {
    val (gA, gB) = joinViewGenerations(spark, viewDir)
    spark.read.parquet(s"${joinStatePath(viewDir, gA, gB)}/view")
  }

  /** REFRESH the join view incrementally: one churn-priced
    * [[Layout.changesBetween]] feed per base that moved (an unmoved
    * side contributes an empty feed and costs one manifest read),
    * one [[maintainJoinAgg]] pass over the persisted trio, one
    * commit. Idempotent when both bases are current. A base vacuumed
    * past its pinned generation fails loudly in changesBetween —
    * recovery is [[rebuildJoinView]]; a base BEHIND its pin was
    * rebuilt out from under the view and is refused by name. */
  def refreshJoinView(spark: org.apache.spark.sql.SparkSession,
                      viewDir: String): JoinViewRefreshStats = {
    val meta = readJoinViewMeta(spark, viewDir)
    val fs = viewFs(spark, viewDir)
    val states = joinStateGens(fs, viewDir)
    require(states.nonEmpty,
      s"$viewDir has a meta sidecar but no state dir — rebuildJoinView")
    val (pA, pB) = states.max
    for ((ga, gb) <- states if (ga, gb) != ((pA, pB)))
      require(fs.delete(joinStatePath(viewDir, ga, gb), true),
        s"failed to drop superseded join view state ($ga, $gb)")
    val curA = Layout.currentGeneration(spark, meta.aBase)
    val curB = Layout.currentGeneration(spark, meta.bBase)
    if (curA == pA && curB == pB)
      return JoinViewRefreshStats(pA, pA, pB, pB, refreshed = false)
    require(curA >= pA && curB >= pB,
      s"join view state pins ($pA, $pB) but the bases are at " +
        s"($curA, $curB) — a base was rebuilt or replaced out from " +
        "under the view; rebuildJoinView against the new history")
    val sp = joinStatePath(viewDir, pA, pB)
    val view = spark.read.parquet(s"$sp/view")
    val aState = spark.read.parquet(s"$sp/a")
    val bState = spark.read.parquet(s"$sp/b")
    val aFeed = Layout.changesBetween(spark, meta.aBase, pA, curA)
      .select((meta.aCols :+ "op").map(col): _*)
    val bFeed = Layout.changesBetween(spark, meta.bBase, pB, curB)
      .select((meta.bCols :+ "op").map(col): _*)
    val (v, a, b) = maintainJoinAgg(view, aState, bState, aFeed, bFeed,
      meta.joinKeys, meta.groupKeys, meta.sums, where = meta.where)
    commitJoinState(spark, viewDir, curA, curB, v, a, b)
    require(fs.delete(sp, true),
      s"failed to drop the superseded join view state ($pA, $pB)")
    JoinViewRefreshStats(pA, curA, pB, curB, refreshed = true)
  }

  // ─────────── persisted CHAIN views (N-way join MVs) ───────────
  //
  // The [[deltaJoinFeed]] composition, persisted: a materialized
  // aggregate over a LEFT-DEEP join chain T0 ⋈ T1 ⋈ … ⋈ T(k-1) of
  // generation-tracked bases, pinned to a generation VECTOR. The
  // state is everything the per-level delta-joins need — one multiset
  // per base, one per INTERMEDIATE prefix join (I1 … I(k-2)), and the
  // view — committed atomically under one `state_gens=` rename. A
  // refresh derives one churn-priced feed per base that moved, folds
  // [[deltaJoinFeed]] up the chain (each level joins deltas against
  // state multisets, never the bases), and finishes with one
  // [[maintainJoinAgg]] pass. k = 2 degenerates to [[createJoinView]];
  // this family exists for the fact ⋈ dim ⋈ dim shapes real
  // reporting views take.

  /** One chain-view refresh: the pinned and live generation vectors
    * (one entry per base, in chain order). */
  case class ChainViewRefreshStats(fromGens: Seq[Long], toGens: Seq[Long],
                                   refreshed: Boolean)

  private val ChainStateRe = """state_gens=([0-9-]+)""".r

  private def chainStatePath(viewDir: String,
                             gens: Seq[Long]): org.apache.hadoop.fs.Path =
    new org.apache.hadoop.fs.Path(
      s"$viewDir/state_gens=${gens.mkString("-")}")

  private def chainStateGens(fs: org.apache.hadoop.fs.FileSystem,
                             viewDir: String): Seq[Seq[Long]] = {
    val p = new org.apache.hadoop.fs.Path(viewDir)
    if (!fs.exists(p)) Nil
    else fs.listStatus(p).toSeq.map(_.getPath.getName).collect {
      case ChainStateRe(v) => v.split('-').toSeq.map(_.toLong)
    }
  }

  /** Reader ordering over generation vectors: element-wise sums never
    * regress across refreshes, so the vector with the largest SUM is
    * the newest (ties cannot arise: every commit advances the sum). */
  private def chainMax(states: Seq[Seq[Long]]): Seq[Long] =
    states.maxBy(_.sum)

  private case class ChainViewMeta(bases: Seq[String],
                                   levelKeys: Seq[Seq[String]],
                                   groupKeys: Seq[String],
                                   sums: Seq[String],
                                   baseCols: Seq[Seq[String]],
                                   where: Option[String])

  private def readChainViewMeta(spark: org.apache.spark.sql.SparkSession,
                                viewDir: String): ChainViewMeta = {
    import org.json4s._
    val jv = parseViewMeta(spark, viewDir)
    val p = viewMetaPath(viewDir).toString
    jv \ "kind" match {
      case JString("chain") =>
      case _ => throw new IllegalArgumentException(
        s"$viewDir does not hold a chain view — use the matching " +
          "create/refresh/read family for its kind")
    }
    def strss(j: JValue, what: String): Seq[Seq[String]] = j match {
      case JArray(xs) => xs.map(metaStrs(_, p, what))
      case other => throw new IllegalArgumentException(
        s"malformed view meta at $p: $what is $other")
    }
    ChainViewMeta(metaStrs(jv \ "bases", p, "bases"),
      strss(jv \ "levelKeys", "levelKeys"),
      metaStrs(jv \ "groupKeys", p, "groupKeys"),
      metaStrs(jv \ "sums", p, "sums"),
      strss(jv \ "baseCols", "baseCols"),
      jv \ "where" match {
        case JNothing | JNull => None
        case w => Some(metaStr(w, p, "where"))
      })
  }

  /** Publish a chain state (view + per-base multisets + intermediate
    * multisets) under one rename. Layout inside the dir: `view/`,
    * `base<i>/` for every base, `inter<j>/` for j = 1..k-2. */
  private def commitChainState(spark: org.apache.spark.sql.SparkSession,
                               viewDir: String, gens: Seq[Long],
                               view: DataFrame, baseStates: Seq[DataFrame],
                               interStates: Seq[DataFrame]): Unit = {
    val fs = viewFs(spark, viewDir)
    val tmp = new org.apache.hadoop.fs.Path(s"$viewDir/_state_tmp")
    require(fs.delete(tmp, true) || !fs.exists(tmp),
      s"failed to clear the state staging dir at $tmp")
    view.write.parquet(s"$tmp/view")
    baseStates.zipWithIndex.foreach { case (st, i) =>
      st.write.parquet(s"$tmp/base$i") }
    interStates.zipWithIndex.foreach { case (st, j) =>
      st.write.parquet(s"$tmp/inter${j + 1}") }
    val dest = chainStatePath(viewDir, gens)
    require(!fs.exists(dest),
      s"chain view state $dest already exists — concurrent refreshers?")
    require(fs.rename(tmp, dest),
      s"failed to publish the chain view state at $dest")
  }

  /** CREATE MATERIALIZED VIEW over a left-deep join CHAIN:
    * `bases(0) ⋈ bases(1) ⋈ …` with `levelKeys(j)` joining the prefix
    * I(j-1) to `bases(j)` (so `levelKeys` has `bases.length - 1`
    * entries), aggregated to `groupKeys`/`sumCols`. Every base must be
    * generation-tracked; every non-join view/key column must resolve
    * on exactly ONE base. Needs at least 3 bases — use
    * [[createJoinView]] for two. */
  def createChainView(spark: org.apache.spark.sql.SparkSession,
                      bases: Seq[String], viewDir: String,
                      levelKeys: Seq[Seq[String]], groupKeys: Seq[String],
                      sumCols: Seq[String],
                      where: Option[String] = None): ChainViewRefreshStats = {
    require(bases.length >= 3,
      "createChainView needs at least 3 bases — createJoinView covers 2")
    require(levelKeys.length == bases.length - 1,
      s"chain of ${bases.length} bases needs ${bases.length - 1} " +
        s"levelKeys entries, got ${levelKeys.length}")
    require(groupKeys.nonEmpty, "createChainView needs a group key")
    val fs = viewFs(spark, viewDir)
    require(!fs.exists(viewMetaPath(viewDir)),
      s"$viewDir already holds a materialized view")
    for (g <- chainStateGens(fs, viewDir))
      require(fs.delete(chainStatePath(viewDir, g), true),
        s"failed to clean stranded pre-meta state ${g.mkString("-")}")
    val gens = bases.map(Layout.currentGeneration(spark, _))
    val frames = bases.zip(gens).map { case (b, g) =>
      Layout.readSnapshot(spark, b, g) }
    // column-side assignment: every level key lives on its right base
    // AND somewhere earlier in the chain; every other view column on
    // exactly one base
    // predicate columns ride along (same rule as the join views):
    // the WHERE applies over the FULL joined tuple at the TOP level
    // only, so every column it reads must survive to the final join
    val rest = (groupKeys ++ sumCols ++ whereColsOf(where)).distinct
      .filterNot(levelKeys.flatten.contains)
    for (c <- rest) {
      val owners = frames.zipWithIndex.filter(_._1.columns.contains(c))
      require(owners.nonEmpty, s"view column $c is on no base")
      require(owners.length == 1,
        s"view column $c is on bases ${owners.map(_._2).mkString(", ")}" +
          " — project/rename so every view column is unambiguous")
    }
    for ((ks, j) <- levelKeys.zipWithIndex; k <- ks) {
      require(frames(j + 1).columns.contains(k),
        s"level-${j + 1} join key $k is not a column of bases(${j + 1})")
      require(frames.take(j + 1).exists(_.columns.contains(k)),
        s"level-${j + 1} join key $k resolves on no earlier base")
    }
    // each base's contributing columns: its level keys (as the RIGHT
    // side), any later level's keys it owns (carried up the chain),
    // and its unambiguous view columns
    val baseCols = frames.zipWithIndex.map { case (f, i) =>
      val own = rest.filter(f.columns.contains) ++
        levelKeys.zipWithIndex.collect {
          case (ks, j) if j + 1 == i => ks
          case (ks, j) if j + 1 != i =>
            ks.filter(k => f.columns.contains(k) &&
              !frames.take(i).exists(_.columns.contains(k)))
        }.flatten
      own.distinct
    }
    val (view0, baseStates, interStates) =
      bootstrapChain(frames, levelKeys, groupKeys, sumCols, baseCols,
        where)
    commitChainState(spark, viewDir, gens, view0, baseStates, interStates)
    baseStates.foreach(Checkpoints.unpersist)
    interStates.foreach(Checkpoints.unpersist)
    import org.json4s.JsonDSL._
    val json = org.json4s.jackson.JsonMethods.compact(
      org.json4s.jackson.JsonMethods.render(
        ("kind" -> "chain") ~ ("bases" -> bases) ~
          ("levelKeys" -> levelKeys) ~ ("groupKeys" -> groupKeys) ~
          ("sums" -> sumCols) ~ ("baseCols" -> baseCols) ~
          ("where" -> where)))
    val out = fs.create(viewMetaPath(viewDir), true)
    try out.write(json.getBytes("UTF-8")) finally out.close()
    ChainViewRefreshStats(gens, gens, refreshed = true)
  }

  /** The shared bootstrap of create and rebuild: per-base multisets,
    * intermediate-prefix multisets I1..I(k-2) (explode-expanded so
    * multiplicities weight exactly), and the top aggregate. */
  private def bootstrapChain(frames: Seq[DataFrame],
                             levelKeys: Seq[Seq[String]],
                             groupKeys: Seq[String], sumCols: Seq[String],
                             baseCols: Seq[Seq[String]],
                             where: Option[String])
      : (DataFrame, Seq[DataFrame], Seq[DataFrame]) = {
    val baseStates = frames.zip(baseCols).map { case (f, cols) =>
      multisetOf(f.select(cols.map(col): _*), cols).localCheckpoint(true) }
    def expand(state: DataFrame): DataFrame =
      state.withColumn("__graft_i",
          explode(sequence(lit(1L), col("cnt"))))
        .drop("cnt", "__graft_i")
    require(frames.length >= 3,
      "bootstrapChain serves 3+ base chains (2 is the join-view family)")
    var prefix = expand(baseStates.head)
    val interStates = (1 until frames.length - 1).map { j =>
      prefix = prefix.join(expand(baseStates(j)), levelKeys(j - 1))
      val m = multisetOf(prefix, prefix.columns.toSeq).localCheckpoint(true)
      prefix = expand(m)
      m
    }
    val view0 = aggregateOfJoin(interStates.last, baseStates.last,
      levelKeys.last, groupKeys, sumCols, where)
    (view0, baseStates, interStates)
  }

  /** The generation vector (one entry per base, chain order) the
    * persisted chain state reflects. */
  def chainViewGenerations(spark: org.apache.spark.sql.SparkSession,
                           viewDir: String): Seq[Long] = {
    readChainViewMeta(spark, viewDir)
    val gens = chainStateGens(viewFs(spark, viewDir), viewDir)
    require(gens.nonEmpty,
      s"$viewDir has a meta sidecar but no state dir — rebuildChainView")
    chainMax(gens)
  }

  /** Read the chain view's aggregate — state-sized, never touching a
    * base. */
  def readChainView(spark: org.apache.spark.sql.SparkSession,
                    viewDir: String): DataFrame =
    spark.read.parquet(s"${chainStatePath(viewDir,
      chainViewGenerations(spark, viewDir))}/view")

  /** REFRESH the chain view: one churn-priced feed per base that
    * moved, folded up the chain as [[deltaJoinFeed]]s against the
    * persisted multisets (each level = one delta-join; bases are
    * never re-joined), one [[maintainJoinAgg]] at the top, one
    * commit. */
  def refreshChainView(spark: org.apache.spark.sql.SparkSession,
                       viewDir: String): ChainViewRefreshStats = {
    val meta = readChainViewMeta(spark, viewDir)
    val fs = viewFs(spark, viewDir)
    val states = chainStateGens(fs, viewDir)
    require(states.nonEmpty,
      s"$viewDir has a meta sidecar but no state dir — rebuildChainView")
    val pinned = chainMax(states)
    for (g <- states if g != pinned)
      require(fs.delete(chainStatePath(viewDir, g), true),
        s"failed to drop superseded chain state ${g.mkString("-")}")
    val curs = meta.bases.map(Layout.currentGeneration(spark, _))
    if (curs == pinned)
      return ChainViewRefreshStats(pinned, pinned, refreshed = false)
    require(curs.zip(pinned).forall { case (c, p) => c >= p },
      s"chain state pins (${pinned.mkString(", ")}) but the bases are " +
        s"at (${curs.mkString(", ")}) — a base was rebuilt out from " +
        "under the view; rebuildChainView")
    val sp = chainStatePath(viewDir, pinned)
    val view = spark.read.parquet(s"$sp/view")
    val baseStates = meta.bases.indices
      .map(i => spark.read.parquet(s"$sp/base$i"))
    val inters = (1 until meta.bases.length - 1)
      .map(j => spark.read.parquet(s"$sp/inter$j"))
    val feeds = meta.bases.indices.map { i =>
      Layout.changesBetween(spark, meta.bases(i), pinned(i), curs(i))
        .select((meta.baseCols(i) :+ "op").map(col): _*)
        .localCheckpoint(true)
    }
    // fold the delta up the chain: D0 = f0; each level j maintains
    // its left state and emits D_j = Δ(I_j). The LAST level's
    // intermediate is not maintained here — maintainJoinAgg maintains
    // exactly that state internally and returns it, so computing it
    // in the loop too would run the chain's largest state-sized
    // shuffle twice per refresh. A middle level's delta is pinned
    // (two consumers: its intermediate's maintenance and the next
    // deltaJoinFeed); the final delta is left lazy — maintainJoinAgg
    // pins every feed it receives itself.
    val lastLevel = meta.bases.length - 2
    var leftOld: DataFrame = baseStates.head
    var leftNew = maintainMultiset(leftOld, feeds.head,
      leftOld.columns.filterNot(_ == "cnt").toSeq)
    var delta = feeds.head
    val newBaseStates = scala.collection.mutable.ArrayBuffer(leftNew)
    val newInters = scala.collection.mutable.ArrayBuffer.empty[DataFrame]
    val deltaPins = scala.collection.mutable.ArrayBuffer.empty[DataFrame]
    for (j <- 1 until meta.bases.length - 1) {
      val d2 = deltaJoinFeed(leftOld, leftNew, baseStates(j),
        delta, feeds(j), meta.levelKeys(j - 1))
      newBaseStates += maintainMultiset(baseStates(j), feeds(j),
        baseStates(j).columns.filterNot(_ == "cnt").toSeq)
      leftOld = inters(j - 1)
      delta = if (j < lastLevel) {
        val pinned2 = d2.localCheckpoint(true)
        deltaPins += pinned2
        val interNew = maintainMultiset(inters(j - 1), pinned2,
          inters(j - 1).columns.filterNot(_ == "cnt").toSeq)
        newInters += interNew
        leftNew = interNew
        pinned2
      } else d2
    }
    val (v2, lastInterNew, lastNew) = maintainJoinAgg(view, leftOld,
      baseStates.last, delta, feeds.last, meta.levelKeys.last,
      meta.groupKeys, meta.sums, where = meta.where)
    newInters += lastInterNew
    newBaseStates += lastNew
    commitChainState(spark, viewDir, curs, v2,
      newBaseStates.toSeq, newInters.toSeq)
    require(fs.delete(sp, true),
      s"failed to drop the superseded chain state ${pinned.mkString("-")}")
    feeds.foreach(Checkpoints.unpersist)
    deltaPins.foreach(Checkpoints.unpersist)
    ChainViewRefreshStats(pinned, curs, refreshed = true)
  }

  /** Full re-bootstrap fallback (a base vacuumed past its pin or
    * rebuilt under the view): recompute everything at the live
    * generation vector with the META UNTOUCHED, pre-clearing any
    * state whose vector would out-rank the rebuilt one under the
    * readers' rule — same crash discipline as the other rebuilds. */
  def rebuildChainView(spark: org.apache.spark.sql.SparkSession,
                       viewDir: String): ChainViewRefreshStats = {
    val meta = readChainViewMeta(spark, viewDir)
    val fs = viewFs(spark, viewDir)
    val old = chainStateGens(fs, viewDir)
    val gens = meta.bases.map(Layout.currentGeneration(spark, _))
    val frames = meta.bases.zip(gens).map { case (b, g) =>
      Layout.readSnapshot(spark, b, g) }
    val (view0, baseStates, interStates) = bootstrapChain(frames,
      meta.levelKeys, meta.groupKeys, meta.sums, meta.baseCols,
      meta.where)
    for (g <- old if g.sum >= gens.sum)
      require(fs.delete(chainStatePath(viewDir, g), true),
        s"failed to drop chain state ${g.mkString("-")} before rebuild")
    commitChainState(spark, viewDir, gens, view0, baseStates, interStates)
    baseStates.foreach(Checkpoints.unpersist)
    interStates.foreach(Checkpoints.unpersist)
    for (g <- old if g.sum < gens.sum)
      require(fs.delete(chainStatePath(viewDir, g), true),
        s"failed to drop superseded chain state ${g.mkString("-")}")
    ChainViewRefreshStats(chainMax(old :+ gens), gens, refreshed = true)
  }

  /** Full re-bootstrap fallback for the documented refresh boundary
    * (a base vacuumed past its pin, or rebuilt under the view):
    * recompute the trio at both live generations, keep the meta. */
  def rebuildJoinView(spark: org.apache.spark.sql.SparkSession,
                      viewDir: String): JoinViewRefreshStats = {
    val meta = readJoinViewMeta(spark, viewDir)
    val fs = viewFs(spark, viewDir)
    val gA = Layout.currentGeneration(spark, meta.aBase)
    val gB = Layout.currentGeneration(spark, meta.bBase)
    val a0 = multisetOf(Layout.readSnapshot(spark, meta.aBase, gA)
      .select(meta.aCols.map(col): _*), meta.aCols).localCheckpoint(true)
    val b0 = multisetOf(Layout.readSnapshot(spark, meta.bBase, gB)
      .select(meta.bCols.map(col): _*), meta.bCols).localCheckpoint(true)
    val v0 = aggregateOfJoin(a0, b0, meta.joinKeys, meta.groupKeys,
      meta.sums, meta.where)
    val old = joinStateGens(fs, viewDir)
    // same pre-clear rule as [[rebuildView]]: an old state whose pair
    // would out-rank the rebuilt label under the readers' max rule
    // (collision, or a base rebuilt at a LOWER generation) clears
    // BEFORE the publish, so a crash can never leave the stale state
    // winning reads
    val (ordA, ordB) = (gA, gB)
    for ((oa, ob) <- old if implicitly[Ordering[(Long, Long)]]
        .gteq((oa, ob), (ordA, ordB)))
      require(fs.delete(joinStatePath(viewDir, oa, ob), true),
        s"failed to drop join view state ($oa, $ob) before rebuild")
    commitJoinState(spark, viewDir, gA, gB, v0, a0, b0)
    for ((oa, ob) <- old if implicitly[Ordering[(Long, Long)]]
        .lt((oa, ob), (ordA, ordB)))
      require(fs.delete(joinStatePath(viewDir, oa, ob), true),
        s"failed to drop superseded join view state ($oa, $ob)")
    val (fa, fb) = old.maxOption.getOrElse((gA, gB))
    JoinViewRefreshStats(fa, gA, fb, gB, refreshed = true)
  }
}
