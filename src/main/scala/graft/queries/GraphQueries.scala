package graft.queries

import graft.QueryDef
import graft.ext.GraphRank
import graft.sources.Tables
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Link-graph gate queries ([[graft.ext.GraphRank]]) over a
  * deterministic trade graph derived from the TPC-H tables: nation
  * A → nation B when customers of A placed MORE than their
  * volume-proportional share of lineitems with suppliers of B
  * (`cnt · 480 ≥ total`, i.e. 1.25× the 600-pair uniform share —
  * RELATIVE, so the graph sparsifies identically at every sf where
  * a fixed count would go empty at sf0.001 or complete at sf0.1;
  * ~170 directed edges over 25 nodes at sf0.01 instead of all 600).
  * Stand-in for the real workload's host/domain link graph; the
  * 1-row total rides a broadcast, the same pattern as the
  * collocation token total.
  */
object GraphQueries {

  private def t(s: SparkSession, dir: String, n: String): DataFrame =
    Tables(s, dir).table(n)

  /** Directed (src, dst) nation trade edges, volume-thresholded. */
  private def tradeEdges(s: SparkSession, d: String): DataFrame = {
    val pairs = t(s, d, "lineitem")
      .join(t(s, d, "orders"), col("l_orderkey") === col("o_orderkey"))
      .join(t(s, d, "customer"), col("o_custkey") === col("c_custkey"))
      .join(t(s, d, "supplier"), col("l_suppkey") === col("s_suppkey"))
      .filter(col("c_nationkey") =!= col("s_nationkey"))
      .groupBy(col("c_nationkey").cast("long").as("src"),
               col("s_nationkey").cast("long").as("dst"))
      .agg(count(lit(1)).as("cnt"))
    pairs.crossJoin(broadcast(pairs.agg(sum("cnt").as("total"))))
      .filter(col("cnt") * 480L >= col("total"))
      .select("src", "dst")
  }

  private val edgeSql =
    s"""WITH p AS (
       |  SELECT CAST(c.c_nationkey AS BIGINT) AS src,
       |         CAST(s.s_nationkey AS BIGINT) AS dst, count(*) AS cnt
       |  FROM lineitem l
       |  JOIN orders o ON l.l_orderkey = o.o_orderkey
       |  JOIN customer c ON o.o_custkey = c.c_custkey
       |  JOIN supplier s ON l.l_suppkey = s.s_suppkey
       |  WHERE c.c_nationkey <> s.s_nationkey
       |  GROUP BY 1, 2),
       |tot AS (SELECT CAST(sum(cnt) AS BIGINT) AS total FROM p),
       |e AS (SELECT src, dst FROM p CROSS JOIN tot WHERE cnt * 480 >= total)""".stripMargin

  /** One unrolled fixed-point PageRank iteration (the DuckDB twin of
    * the loop body in [[GraphRank.pageRank]]); sums cast back to
    * BIGINT (DuckDB sum(BIGINT) widens to HUGEINT). */
  private def iterSql(prev: String, cur: String): String =
    s"""$cur AS (SELECT nd.node,
       |    (1000000000000 * 15 // 100 // p.n) + 85 * COALESCE(s.s, 0) // 100 AS rank_fp
       |  FROM nodes nd CROSS JOIN prm p
       |  LEFT JOIN (
       |    SELECT e.dst AS node, CAST(sum(r.rank_fp // d.outdeg) AS BIGINT) AS s
       |    FROM e JOIN d ON e.src = d.src JOIN $prev r ON e.src = r.node
       |    GROUP BY 1) s ON nd.node = s.node)""".stripMargin

  /** [[iterSql]]'s personalized twin: teleport mass lands only on
    * flagged seed nodes. */
  private def pprIterSql(prev: String, cur: String): String =
    s"""$cur AS (SELECT f.node, f.sflag,
       |    f.sflag * (1000000000000 * 15 // 100 // sn.ns)
       |      + 85 * COALESCE(s.s, 0) // 100 AS rank_fp
       |  FROM flag f CROSS JOIN sn
       |  LEFT JOIN (
       |    SELECT e.dst AS node, CAST(sum(r.rank_fp // d.outdeg) AS BIGINT) AS s
       |    FROM e JOIN d ON e.src = d.src JOIN $prev r ON e.src = r.node
       |    GROUP BY 1) s ON f.node = s.node)""".stripMargin

  def defs: Seq[QueryDef] = Seq(

    // Fixed-point PageRank (damping 85/100, 5 synchronous
    // iterations) over the trade graph — integer floor division
    // throughout, so scores and ORDER re-derive exactly in the
    // oracle's unrolled-CTE power iteration.
    QueryDef("q_graph_pagerank",
      (s, d) => GraphRank.pageRank(tradeEdges(s, d), col("src"), col("dst"), iters = 5)
        .withColumnRenamed("rank", "rank_fp")
        .join(t(s, d, "nation"), col("node") === col("n_nationkey").cast("long"))
        .select(col("n_name").as("nation"), col("rank_fp"))
        .orderBy(desc("rank_fp"), col("nation")),
      Some((Seq(edgeSql,
        """nodes AS (SELECT src AS node FROM e UNION SELECT dst FROM e),
          |prm AS (SELECT CAST(count(*) AS BIGINT) AS n FROM nodes),
          |d AS (SELECT src, CAST(count(*) AS BIGINT) AS outdeg FROM e GROUP BY 1),
          |r0 AS (SELECT node, 1000000000000 // n AS rank_fp FROM nodes, prm)""".stripMargin) ++
        (1 to 5).map(i => iterSql(s"r${i - 1}", s"r$i")))
        .mkString(",\n") +
        """
          |SELECT nn.n_name AS nation, r.rank_fp AS rank_fp
          |FROM r5 r JOIN nation nn ON r.node = CAST(nn.n_nationkey AS BIGINT)
          |ORDER BY rank_fp DESC, nation""".stripMargin), bench = true),

    // Until-convergence PageRank: same integer fixed point, but the
    // iteration count is DISCOVERED (stop when the L1 rank delta
    // drops to 1e6 units = 1e-6 of total mass), so the oracle cannot
    // unroll — instead a DuckDB RECURSIVE CTE carries the whole rank
    // vector as a LIST per iteration (nodes sorted, so positions
    // align) and re-derives the identical trajectory with scalar
    // list lambdas: emission continues while the carried prev-delta
    // exceeds tolerance, so the last emitted iteration is exactly the
    // round the Spark loop returns, including the `rounds` column.
    // Two DuckDB-1.0 traps documented by the shape: a bare UNION
    // inside WITH RECURSIVE parses as a recursive union (hence the
    // explicit DISTINCT dedup), and lambda closures do not bind
    // across LATERAL (hence the carried-prev column instead of a
    // computed-once delta).
    QueryDef("q_graph_pagerank_conv",
      (s, d) => GraphRank.pageRankUntilConverged(tradeEdges(s, d),
          col("src"), col("dst"), tolerance = 1000000L, maxIters = 100)
        .withColumnRenamed("rank", "rank_fp")
        .join(t(s, d, "nation"), col("node") === col("n_nationkey").cast("long"))
        .select(col("n_name").as("nation"), col("rank_fp"), col("rounds"))
        .orderBy(desc("rank_fp"), col("nation")),
      Some("""WITH RECURSIVE p AS (
             |  SELECT CAST(c.c_nationkey AS BIGINT) AS src,
             |         CAST(s.s_nationkey AS BIGINT) AS dst, count(*) AS cnt
             |  FROM lineitem l
             |  JOIN orders o ON l.l_orderkey = o.o_orderkey
             |  JOIN customer c ON o.o_custkey = c.c_custkey
             |  JOIN supplier s ON l.l_suppkey = s.s_suppkey
             |  WHERE c.c_nationkey <> s.s_nationkey
             |  GROUP BY 1, 2),
             |tot AS (SELECT CAST(sum(cnt) AS BIGINT) AS total FROM p),
             |e AS (SELECT src, dst FROM p CROSS JOIN tot WHERE cnt * 480 >= total),
             |d AS (SELECT src, CAST(count(*) AS BIGINT) AS outdeg FROM e GROUP BY 1),
             |nodes AS (SELECT DISTINCT node FROM
             |            (SELECT src AS node FROM e UNION ALL SELECT dst FROM e)),
             |nl AS (SELECT list(node ORDER BY node) AS ns FROM nodes),
             |el AS (SELECT list({'src': ed.src, 'dst': ed.dst, 'outdeg': d.outdeg}
             |                   ORDER BY ed.src, ed.dst) AS es
             |       FROM e ed JOIN d ON ed.src = d.src),
             |prm AS (SELECT CAST(len(ns) AS BIGINT) AS n FROM nl),
             |pr AS (
             |  SELECT 0 AS iter,
             |         list_transform(ns, x -> 1000000000000 // n) AS ranks,
             |         CAST(NULL AS BIGINT[]) AS prev
             |  FROM nl, prm
             |  UNION ALL
             |  SELECT pr.iter + 1,
             |         list_transform(ns, nd ->
             |           (1000000000000 * 15 // 100 // n) +
             |           85 * COALESCE(list_sum(list_transform(
             |                  list_filter(es, ed -> ed.dst = nd),
             |                  ed -> pr.ranks[list_position(ns, ed.src)] // ed.outdeg)), 0)::BIGINT // 100
             |         ) AS ranks,
             |         pr.ranks AS prev
             |  FROM pr, nl, prm, el
             |  WHERE pr.iter < 100 AND (pr.prev IS NULL
             |     OR list_sum(list_transform(range(1, len(pr.ranks) + 1),
             |                                i -> abs(pr.ranks[i] - pr.prev[i])))::BIGINT > 1000000)
             |),
             |fin AS (
             |  SELECT unnest(ns) AS node, unnest(last.ranks) AS rank_fp, last.iter AS rounds
             |  FROM (SELECT iter, ranks FROM pr ORDER BY iter DESC LIMIT 1) last, nl)
             |SELECT nn.n_name AS nation, f.rank_fp AS rank_fp, CAST(f.rounds AS INT) AS rounds
             |FROM fin f JOIN nation nn ON f.node = CAST(nn.n_nationkey AS BIGINT)
             |ORDER BY rank_fp DESC, nation""".stripMargin),
      bench = true),

    // Personalized PageRank: teleport mass restricted to 5 seed
    // nations — scores become proximity-to-seeds (trust propagation)
    // instead of global centrality. Same integer fixed point, same
    // unrolled-CTE oracle with a seed-conditional base term.
    QueryDef("q_graph_ppr",
      (s, d) => {
        val spark = s; import spark.implicits._
        val seeds = Seq(0L, 1L, 2L, 3L, 4L).toDF("node")
        GraphRank.personalizedPageRank(tradeEdges(s, d), col("src"), col("dst"),
            seeds, col("node"), iters = 5)
          .withColumnRenamed("rank", "rank_fp")
          .join(t(s, d, "nation"), col("node") === col("n_nationkey").cast("long"))
          .select(col("n_name").as("nation"), col("rank_fp"))
          .orderBy(desc("rank_fp"), col("nation"))
      },
      Some((Seq(edgeSql,
        """nodes AS (SELECT src AS node FROM e UNION SELECT dst FROM e),
          |d AS (SELECT src, CAST(count(*) AS BIGINT) AS outdeg FROM e GROUP BY 1),
          |sg AS (SELECT s.node FROM (SELECT CAST(unnest([0,1,2,3,4]) AS BIGINT) AS node) s
          |       JOIN nodes nd ON s.node = nd.node),
          |sn AS (SELECT CAST(count(*) AS BIGINT) AS ns FROM sg),
          |flag AS (SELECT nd.node,
          |           CASE WHEN sg.node IS NULL THEN 0 ELSE 1 END AS sflag
          |         FROM nodes nd LEFT JOIN sg ON nd.node = sg.node),
          |r0 AS (SELECT node, sflag, sflag * (1000000000000 // ns) AS rank_fp
          |       FROM flag, sn)""".stripMargin) ++
        (1 to 5).map(i => pprIterSql(s"r${i - 1}", s"r$i")))
        .mkString(",\n") +
        """
          |SELECT nn.n_name AS nation, r.rank_fp AS rank_fp
          |FROM r5 r JOIN nation nn ON r.node = CAST(nn.n_nationkey AS BIGINT)
          |ORDER BY rank_fp DESC, nation""".stripMargin)),

    // Personalized PageRank to convergence: the q_graph_pagerank_conv
    // recursive-CTE oracle with seed-flagged teleport — the flag is
    // re-derived positionally inside the list lambdas
    // (list_contains(seeds, ns[i])), so the carried state stays one
    // rank vector per iteration.
    QueryDef("q_graph_ppr_conv",
      (s, d) => {
        val spark = s; import spark.implicits._
        val seeds = Seq(0L, 1L, 2L, 3L, 4L).toDF("node")
        GraphRank.personalizedPageRankUntilConverged(tradeEdges(s, d),
            col("src"), col("dst"), seeds, col("node"),
            tolerance = 1000000L, maxIters = 100)
          .withColumnRenamed("rank", "rank_fp")
          .join(t(s, d, "nation"), col("node") === col("n_nationkey").cast("long"))
          .select(col("n_name").as("nation"), col("rank_fp"), col("rounds"))
          .orderBy(desc("rank_fp"), col("nation"))
      },
      Some("""WITH RECURSIVE p AS (
             |  SELECT CAST(c.c_nationkey AS BIGINT) AS src,
             |         CAST(s.s_nationkey AS BIGINT) AS dst, count(*) AS cnt
             |  FROM lineitem l
             |  JOIN orders o ON l.l_orderkey = o.o_orderkey
             |  JOIN customer c ON o.o_custkey = c.c_custkey
             |  JOIN supplier s ON l.l_suppkey = s.s_suppkey
             |  WHERE c.c_nationkey <> s.s_nationkey
             |  GROUP BY 1, 2),
             |tot AS (SELECT CAST(sum(cnt) AS BIGINT) AS total FROM p),
             |e AS (SELECT src, dst FROM p CROSS JOIN tot WHERE cnt * 480 >= total),
             |d AS (SELECT src, CAST(count(*) AS BIGINT) AS outdeg FROM e GROUP BY 1),
             |nodes AS (SELECT DISTINCT node FROM
             |            (SELECT src AS node FROM e UNION ALL SELECT dst FROM e)),
             |nl AS (SELECT list(node ORDER BY node) AS ns FROM nodes),
             |el AS (SELECT list({'src': ed.src, 'dst': ed.dst, 'outdeg': d.outdeg}
             |                   ORDER BY ed.src, ed.dst) AS es
             |       FROM e ed JOIN d ON ed.src = d.src),
             |sn AS (SELECT CAST(list_sum(list_transform(ns,
             |         nd -> CASE WHEN list_contains([0,1,2,3,4], nd) THEN 1 ELSE 0 END))
             |       AS BIGINT) AS nseed FROM nl),
             |pr AS (
             |  SELECT 0 AS iter,
             |         list_transform(ns, nd ->
             |           CASE WHEN list_contains([0,1,2,3,4], nd)
             |                THEN 1000000000000 // nseed ELSE 0 END) AS ranks,
             |         CAST(NULL AS BIGINT[]) AS prev
             |  FROM nl, sn
             |  UNION ALL
             |  SELECT pr.iter + 1,
             |         list_transform(range(1, len(ns) + 1), i ->
             |           (CASE WHEN list_contains([0,1,2,3,4], ns[i])
             |                 THEN 1000000000000 * 15 // 100 // nseed ELSE 0 END) +
             |           85 * COALESCE(list_sum(list_transform(
             |                  list_filter(es, ed -> ed.dst = ns[i]),
             |                  ed -> pr.ranks[list_position(ns, ed.src)] // ed.outdeg)), 0)::BIGINT // 100
             |         ) AS ranks,
             |         pr.ranks AS prev
             |  FROM pr, nl, sn, el
             |  WHERE pr.iter < 100 AND (pr.prev IS NULL
             |     OR list_sum(list_transform(range(1, len(pr.ranks) + 1),
             |                                i -> abs(pr.ranks[i] - pr.prev[i])))::BIGINT > 1000000)
             |),
             |fin AS (
             |  SELECT unnest(ns) AS node, unnest(last.ranks) AS rank_fp, last.iter AS rounds
             |  FROM (SELECT iter, ranks FROM pr ORDER BY iter DESC LIMIT 1) last, nl)
             |SELECT nn.n_name AS nation, f.rank_fp AS rank_fp, CAST(f.rounds AS INT) AS rounds
             |FROM fin f JOIN nation nn ON f.node = CAST(nn.n_nationkey AS BIGINT)
             |ORDER BY rank_fp DESC, nation""".stripMargin)),

    // K-core decomposition (k = 8): iterative peeling of the
    // undirected trade graph to its dense core — the crawl-curation
    // filter that strips link-farm/spam tails. The oracle carries the
    // surviving edge LIST through a recursive CTE, peeling with
    // nested list lambdas; the discovered round count (including the
    // final verification round, matching the Spark loop's exit
    // condition) is part of the hash.
    QueryDef("q_graph_kcore",
      (s, d) => GraphRank.kCore(tradeEdges(s, d), col("src"), col("dst"), k = 8)
        .join(t(s, d, "nation"), col("node") === col("n_nationkey").cast("long"))
        .select(col("n_name").as("nation"), col("deg"), col("rounds"))
        .orderBy(desc("deg"), col("nation")),
      Some("""WITH RECURSIVE p AS (
             |  SELECT CAST(c.c_nationkey AS BIGINT) AS src,
             |         CAST(s.s_nationkey AS BIGINT) AS dst, count(*) AS cnt
             |  FROM lineitem l
             |  JOIN orders o ON l.l_orderkey = o.o_orderkey
             |  JOIN customer c ON o.o_custkey = c.c_custkey
             |  JOIN supplier s ON l.l_suppkey = s.s_suppkey
             |  WHERE c.c_nationkey <> s.s_nationkey
             |  GROUP BY 1, 2),
             |tot AS (SELECT CAST(sum(cnt) AS BIGINT) AS total FROM p),
             |e AS (SELECT src, dst FROM p CROSS JOIN tot WHERE cnt * 480 >= total),
             |und AS (SELECT DISTINCT least(src, dst) AS u, greatest(src, dst) AS v
             |        FROM e WHERE src <> dst),
             |el AS (SELECT list({'u': u, 'v': v} ORDER BY u, v) AS es FROM und),
             |pr AS (
             |  SELECT 0 AS iter, es, CAST(NULL AS BIGINT) AS prev_len FROM el
             |  UNION ALL
             |  SELECT pr.iter + 1,
             |         list_filter(pr.es, ed ->
             |           len(list_filter(pr.es, e2 -> e2.u = ed.u OR e2.v = ed.u)) >= 8 AND
             |           len(list_filter(pr.es, e2 -> e2.u = ed.v OR e2.v = ed.v)) >= 8),
             |         CAST(len(pr.es) AS BIGINT)
             |  FROM pr
             |  WHERE pr.iter < 1000 AND
             |    ((pr.prev_len IS NULL AND len(pr.es) > 0)
             |     OR (pr.prev_len IS NOT NULL AND len(pr.es) < pr.prev_len AND len(pr.es) > 0))
             |),
             |last AS (SELECT iter, es FROM pr ORDER BY iter DESC LIMIT 1),
             |ends AS (SELECT unnest(es) AS ed, iter FROM last),
             |nd AS (SELECT ed.u AS node, iter FROM ends
             |       UNION ALL SELECT ed.v, iter FROM ends)
             |SELECT nn.n_name AS nation, CAST(count(*) AS BIGINT) AS deg,
             |       CAST(any_value(nd.iter) AS INT) AS rounds
             |FROM nd JOIN nation nn ON nd.node = CAST(nn.n_nationkey AS BIGINT)
             |GROUP BY 1 ORDER BY deg DESC, nation""".stripMargin),
      bench = true),

    // BFS hop distance from the 5 seed nations (trust-tier
    // propagation): frontier expansion with min-distance folding in
    // Spark; the oracle is the textbook recursive-UNION BFS (the
    // dedup keeps cyclic graphs from exploding into path
    // enumeration). Unreached nations are absent; the result is
    // cap-independent for cap >= eccentricity, so the fixed 10-hop
    // oracle replays the early-exiting loop exactly.
    QueryDef("q_graph_bfs",
      (s, d) => {
        val spark = s; import spark.implicits._
        val seeds = Seq(0L, 1L, 2L, 3L, 4L).toDF("node")
        GraphRank.seedDistances(tradeEdges(s, d), col("src"), col("dst"),
            seeds, col("node"), maxHops = 10)
          .join(t(s, d, "nation"), col("node") === col("n_nationkey").cast("long"))
          .select(col("n_name").as("nation"), col("dist"))
          .orderBy("dist", "nation")
      },
      Some("""WITH RECURSIVE p AS (
             |  SELECT CAST(c.c_nationkey AS BIGINT) AS src,
             |         CAST(s.s_nationkey AS BIGINT) AS dst, count(*) AS cnt
             |  FROM lineitem l
             |  JOIN orders o ON l.l_orderkey = o.o_orderkey
             |  JOIN customer c ON o.o_custkey = c.c_custkey
             |  JOIN supplier s ON l.l_suppkey = s.s_suppkey
             |  WHERE c.c_nationkey <> s.s_nationkey
             |  GROUP BY 1, 2),
             |tot AS (SELECT CAST(sum(cnt) AS BIGINT) AS total FROM p),
             |e AS (SELECT src, dst FROM p CROSS JOIN tot
             |      WHERE cnt * 480 >= total AND src <> dst),
             |bfs AS (
             |  SELECT CAST(unnest([0,1,2,3,4]) AS BIGINT) AS node, 0 AS dist
             |  UNION
             |  SELECT e.dst, bfs.dist + 1
             |  FROM bfs JOIN e ON bfs.node = e.src WHERE bfs.dist < 10
             |)
             |SELECT nn.n_name AS nation, CAST(min(bfs.dist) AS BIGINT) AS dist
             |FROM bfs JOIN nation nn ON bfs.node = CAST(nn.n_nationkey AS BIGINT)
             |GROUP BY 1 ORDER BY dist, nation""".stripMargin)),

    // Community detection by deterministic synchronous label
    // propagation ([[GraphRank.labelPropagation]]): 5 rounds of
    // adopt-the-most-frequent-neighbour-label (ties to the smallest)
    // over the undirected trade graph — the cheap community pass for
    // graphs that are one big connected component. The oracle carries
    // the full label state through a recursive CTE, recomputing each
    // node's neighbour-label mode with the same (count desc, label
    // asc) tie-break, so every node's final community hash-matches.
    QueryDef("q_graph_labelprop",
      (s, d) => GraphRank.labelPropagation(tradeEdges(s, d),
          col("src"), col("dst"), rounds = 5)
        .join(t(s, d, "nation"), col("node") === col("n_nationkey").cast("long"))
        .select(col("n_name").as("nation"), col("label"))
        .orderBy("label", "nation"),
      Some {
        val nb = "list_transform(list_filter(es, e -> e.u = n.nd OR e.v = n.nd), " +
          "e -> CASE WHEN e.u = n.nd THEN e.v ELSE e.u END)"
        val nl = s"list_transform($nb, x -> list_filter(ls, l -> l.nd = x)[1].lb)"
        val best = s"list_reduce(list_transform(list_distinct($nl), c -> " +
          s"{lb: c, ct: len(list_filter($nl, z -> z = c))}), " +
          "(a, b) -> CASE WHEN b.ct > a.ct OR (b.ct = a.ct AND b.lb < a.lb) " +
          "THEN b ELSE a END).lb"
        s"""WITH RECURSIVE p AS (
           |  SELECT CAST(c.c_nationkey AS BIGINT) AS src,
           |         CAST(s.s_nationkey AS BIGINT) AS dst, count(*) AS cnt
           |  FROM lineitem l
           |  JOIN orders o ON l.l_orderkey = o.o_orderkey
           |  JOIN customer c ON o.o_custkey = c.c_custkey
           |  JOIN supplier s ON l.l_suppkey = s.s_suppkey
           |  WHERE c.c_nationkey <> s.s_nationkey
           |  GROUP BY 1, 2),
           |tot AS (SELECT CAST(sum(cnt) AS BIGINT) AS total FROM p),
           |e AS (SELECT src, dst FROM p CROSS JOIN tot
           |      WHERE cnt * 480 >= total AND src <> dst),
           |eu AS (SELECT DISTINCT least(src, dst) AS u, greatest(src, dst) AS v FROM e),
           |gr AS (
           |  -- ORDER BY inside list() is load-bearing: without it the
           |  -- edge-list order follows DuckDB's parallel scan order and
           |  -- the final labeling was observed to flip between runs
           |  -- (~1/15) — a silent gate flake. Pinned order + the
           |  -- strict-total-order reduce make the replay deterministic
           |  -- and equal to the Spark labeling.
           |  SELECT list({u: u, v: v} ORDER BY u, v) AS es,
           |    list_transform(list_sort(list_distinct(flatten(
           |      list_transform(list({u: u, v: v} ORDER BY u, v), ed -> [ed.u, ed.v])))),
           |      x -> {nd: x, lb: x}) AS ls
           |  FROM eu),
           |st AS (
           |  SELECT 0 AS iter, es, ls FROM gr
           |  UNION ALL
           |  SELECT iter + 1, es,
           |    list_transform(ls, n -> {nd: n.nd, lb: coalesce($best, n.lb)})
           |  FROM st WHERE iter < 5
           |)
           |SELECT nn.n_name AS nation, lr.lb AS label
           |FROM (SELECT unnest(ls) AS lr
           |      FROM (SELECT ls FROM st ORDER BY iter DESC LIMIT 1))
           |JOIN nation nn ON lr.nd = CAST(nn.n_nationkey AS BIGINT)
           |ORDER BY label, nation""".stripMargin
      }),

    // Label propagation run to a DISCOVERED stopping point
    // ([[GraphRank.labelPropagationUntilConverged]]): stops when no
    // label changes (fixpoint, converged=true) or when the state
    // equals the round-2 state (synchronous LP's classic period-2
    // oscillation — converged=false; GraphRankSpec pins that case on
    // a single-edge graph). The oracle carries the label state PLUS
    // the two previous states through the recursive CTE and stops on
    // the identical conditions, so the final labeling, the discovered
    // round count, and the converged flag all hash-match.
    QueryDef("q_graph_labelprop_conv",
      (s, d) => GraphRank.labelPropagationUntilConverged(tradeEdges(s, d),
          col("src"), col("dst"), maxRounds = 30)
        .join(t(s, d, "nation"), col("node") === col("n_nationkey").cast("long"))
        .select(col("n_name").as("nation"), col("label"),
          col("rounds"), col("converged"))
        .orderBy("label", "nation"),
      Some {
        val nb = "list_transform(list_filter(es, e -> e.u = n.nd OR e.v = n.nd), " +
          "e -> CASE WHEN e.u = n.nd THEN e.v ELSE e.u END)"
        val nl = s"list_transform($nb, x -> list_filter(ls, l -> l.nd = x)[1].lb)"
        val best = s"list_reduce(list_transform(list_distinct($nl), c -> " +
          s"{lb: c, ct: len(list_filter($nl, z -> z = c))}), " +
          "(a, b) -> CASE WHEN b.ct > a.ct OR (b.ct = a.ct AND b.lb < a.lb) " +
          "THEN b ELSE a END).lb"
        s"""WITH RECURSIVE p AS (
           |  SELECT CAST(c.c_nationkey AS BIGINT) AS src,
           |         CAST(s.s_nationkey AS BIGINT) AS dst, count(*) AS cnt
           |  FROM lineitem l
           |  JOIN orders o ON l.l_orderkey = o.o_orderkey
           |  JOIN customer c ON o.o_custkey = c.c_custkey
           |  JOIN supplier s ON l.l_suppkey = s.s_suppkey
           |  WHERE c.c_nationkey <> s.s_nationkey
           |  GROUP BY 1, 2),
           |tot AS (SELECT CAST(sum(cnt) AS BIGINT) AS total FROM p),
           |e AS (SELECT src, dst FROM p CROSS JOIN tot
           |      WHERE cnt * 480 >= total AND src <> dst),
           |eu AS (SELECT DISTINCT least(src, dst) AS u, greatest(src, dst) AS v FROM e),
           |gr AS (
           |  SELECT list({u: u, v: v} ORDER BY u, v) AS es,
           |    list_transform(list_sort(list_distinct(flatten(
           |      list_transform(list({u: u, v: v} ORDER BY u, v), ed -> [ed.u, ed.v])))),
           |      x -> {nd: x, lb: x}) AS ls
           |  FROM eu),
           |st AS (
           |  SELECT 0 AS iter, es, ls,
           |    CAST(NULL AS STRUCT(nd BIGINT, lb BIGINT)[]) AS p1,
           |    CAST(NULL AS STRUCT(nd BIGINT, lb BIGINT)[]) AS p2
           |  FROM gr
           |  UNION ALL
           |  SELECT iter + 1, es,
           |    list_transform(ls, n -> {nd: n.nd, lb: coalesce($best, n.lb)}),
           |    ls, p1
           |  FROM st
           |  WHERE iter < 30 AND (p1 IS NULL OR ls <> p1)
           |    AND (p2 IS NULL OR ls <> p2)
           |),
           |fin AS (SELECT iter, ls, p1 FROM st ORDER BY iter DESC LIMIT 1),
           |ex AS (SELECT unnest(ls) AS lr, iter,
           |         (p1 IS NOT NULL AND ls = p1) AS converged
           |       FROM fin)
           |SELECT nn.n_name AS nation, ex.lr.lb AS label,
           |  CAST(ex.iter AS INT) AS rounds, ex.converged AS converged
           |FROM ex JOIN nation nn ON ex.lr.nd = CAST(nn.n_nationkey AS BIGINT)
           |ORDER BY label, nation""".stripMargin
      }),

    // Exact triangle count of the undirected trade graph —
    // degree-oriented wedge join in Spark, id-oriented in the
    // oracle; any total-order orientation counts each triangle once.
    QueryDef("q_graph_triangles",
      (s, d) => GraphRank.triangleCount(tradeEdges(s, d), col("src"), col("dst")),
      Some(edgeSql +
        """,
          |eu AS (SELECT DISTINCT least(src, dst) AS u, greatest(src, dst) AS v FROM e)
          |SELECT count(*) AS n_triangles
          |FROM eu e1 JOIN eu e2 ON e1.v = e2.u
          |JOIN eu e3 ON e3.u = e1.u AND e3.v = e2.v""".stripMargin)),
  )
}
