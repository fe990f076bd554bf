package graft

import graft.ext.GraphRank
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

class GraphRankSpec extends AnyFunSuite with SharedSpark {

  private def edges(pairs: (Long, Long)*): DataFrame = {
    import spark.implicits._
    pairs.toDF("src", "dst")
  }

  private def ranks(e: DataFrame, iters: Int): Map[Long, Long] =
    GraphRank.pageRank(e, col("src"), col("dst"), iters)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap

  private val Scale = 1000000000000L

  test("pageRank: symmetric cycle stays uniform at every iteration count") {
    val cycle = edges(1L -> 2L, 2L -> 3L, 3L -> 1L)
    for (it <- Seq(0, 1, 5)) {
      val r = ranks(cycle, it)
      assert(r.values.toSet.size === 1, s"iters=$it: $r")
      assert(r(1L) <= Scale / 3 && r(1L) > Scale / 3 - 100)
    }
  }

  test("pageRank: star center out-ranks leaves; duplicate edges collapse") {
    // 3 leaves all pointing at node 0, plus 0 -> 1 so 0 is not
    // dangling. 30 iterations: the 0<->1 cycle oscillates with period
    // 2 and contracts by 0.85^2 per round, so by 30 the steady state
    // (r0 ~ 0.48, r1 ~ 0.45, leaves at base) dominates the parity.
    val star = edges(1L -> 0L, 2L -> 0L, 3L -> 0L, 0L -> 1L, 1L -> 0L)
    val r = ranks(star, 30)
    assert(r(0L) > r(1L) && r(1L) > r(2L), r.toString)
    assert(r(2L) === r(3L)) // symmetric leaves tie exactly
    // duplicate 1->0 edge must not double 1's contribution
    val r2 = ranks(edges(1L -> 0L, 2L -> 0L, 3L -> 0L, 0L -> 1L), 30)
    assert(r === r2)
  }

  test("pageRank: mass stays <= scale and only drains (dangling + floor div)") {
    val g = edges(1L -> 2L, 2L -> 3L, 3L -> 1L, 1L -> 4L) // 4 is dangling
    val totals = Seq(1, 3, 8).map(it => ranks(g, it).values.sum)
    assert(totals.forall(t => t > 0 && t <= Scale), totals.toString)
    // dangling drain is monotone: more iterations, never more mass
    assert(totals === totals.sorted.reverse, totals.toString)
  }

  test("pageRankUntilConverged: agrees with fixed-iter at its round count, lineage truncated") {
    val g = edges(1L -> 2L, 2L -> 3L, 3L -> 1L, 1L -> 4L, 4L -> 1L, 2L -> 4L)
    val conv = GraphRank.pageRankUntilConverged(g, col("src"), col("dst"),
      tolerance = 1000000L, maxIters = 100)
    val rows = conv.collect()
    val rounds = rows.head.getInt(2)
    assert(rounds > 1 && rounds < 100, s"expected genuine convergence, got $rounds rounds")
    assert(rows.map(_.getInt(2)).toSet === Set(rounds))
    // integer arithmetic is deterministic: the converged vector IS the
    // fixed-iter vector at the same round count
    val fixedAt = ranks(g, rounds)
    assert(rows.map(r => r.getLong(0) -> r.getLong(1)).toMap === fixedAt)
    // one more round moves the vector by <= tolerance (the stop reason)
    val prev = ranks(g, rounds - 1)
    val l1 = fixedAt.map { case (k, v) => math.abs(v - prev(k)) }.sum
    assert(l1 <= 1000000L, s"stop-round L1 delta $l1 above tolerance")
    // lineage is a checkpoint scan, not a rounds-deep join tree
    assert(conv.queryExecution.optimizedPlan.toString.contains("LogicalRDD")
      || conv.queryExecution.optimizedPlan.collectLeaves()
           .forall(_.getClass.getSimpleName.contains("LogicalRDD")),
      "converged rank frame must read from the checkpoint")
  }

  test("personalizedPageRankUntilConverged: agrees with fixed-iter at its round count") {
    import spark.implicits._
    val g = edges(1L -> 2L, 2L -> 3L, 3L -> 1L, 1L -> 4L, 4L -> 1L, 2L -> 4L)
    val seeds = Seq(1L, 9L).toDF("node") // 9 is outside the graph, ignored
    val conv = GraphRank.personalizedPageRankUntilConverged(g,
      col("src"), col("dst"), seeds, col("node"),
      tolerance = 1000000L, maxIters = 100).collect()
    val rounds = conv.head.getInt(2)
    assert(rounds > 1 && rounds < 100, s"expected genuine convergence, got $rounds")
    val fixedAt = GraphRank.personalizedPageRank(g, col("src"), col("dst"),
        seeds, col("node"), iters = rounds)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(conv.map(r => r.getLong(0) -> r.getLong(1)).toMap === fixedAt)
  }

  test("kCore: peels tails, keeps the dense core, counts rounds like the loop") {
    def core(e: org.apache.spark.sql.DataFrame, k: Int) =
      GraphRank.kCore(e, col("src"), col("dst"), k)
        .collect().map(r => (r.getLong(0), r.getLong(1), r.getInt(2)))
    // triangle + pendant: round 1 peels the pendant, round 2 verifies
    val g = edges(1L -> 2L, 2L -> 3L, 3L -> 1L, 3L -> 4L)
    val c2 = core(g, 2)
    assert(c2.map(_._1).sorted.toSeq === Seq(1L, 2L, 3L))
    assert(c2.forall(_._2 === 2L), c2.mkString(","))
    assert(c2.forall(_._3 === 2), s"rounds: ${c2.toSeq}")
    // a path has no 2-core; the first peel empties it → rounds 1
    assert(core(edges(1L -> 2L, 2L -> 3L), 2).isEmpty)
    // already-a-core graph: one verification round, nothing removed
    val k4 = edges((for { a <- 0L to 3L; b <- 0L to 3L if a < b } yield a -> b): _*)
    val c3 = core(k4, 3)
    assert(c3.length === 4 && c3.forall(r => r._2 === 3L && r._3 === 1))
    // cascade: chain of decreasing support peels one layer per round
    // 1-2, plus 2-3-4 triangle, plus pendant 5 on 4: k=2 →
    // round 1 drops 1-2 edge and 4-5, round 2 verifies triangle
    val casc = edges(1L -> 2L, 2L -> 3L, 3L -> 4L, 4L -> 2L, 4L -> 5L)
    val c4 = core(casc, 2)
    assert(c4.map(_._1).sorted.toSeq === Seq(2L, 3L, 4L))
    assert(c4.forall(_._3 === 2))
  }

  test("seedDistances: BFS tiers on a directed path, early exit, cap honored") {
    import spark.implicits._
    def dists(e: org.apache.spark.sql.DataFrame, seeds: Seq[Long], cap: Int = 10) =
      GraphRank.seedDistances(e, col("src"), col("dst"),
          seeds.toDF("node"), col("node"), maxHops = cap)
        .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    // directed path 1→2→3→4 with a shortcut 1→3: BFS takes the shortcut
    val g = edges(1L -> 2L, 2L -> 3L, 3L -> 4L, 1L -> 3L)
    assert(dists(g, Seq(1L)) === Map(1L -> 0L, 2L -> 1L, 3L -> 1L, 4L -> 2L))
    // direction matters: seeding the sink reaches nothing else
    assert(dists(g, Seq(4L)) === Map(4L -> 0L))
    // cap truncates: 1 hop from node 1 misses node 4
    assert(dists(g, Seq(1L), cap = 1) === Map(1L -> 0L, 2L -> 1L, 3L -> 1L))
    // two seeds fold to the min distance; cycles terminate
    val cyc = edges(1L -> 2L, 2L -> 3L, 3L -> 1L)
    assert(dists(cyc, Seq(1L, 3L)) === Map(1L -> 0L, 3L -> 0L, 2L -> 1L))
  }

  test("triangleCount: known graphs") {
    def tri(e: DataFrame): Long =
      GraphRank.triangleCount(e, col("src"), col("dst")).collect()(0).getLong(0)
    // K4 has 4 triangles; direction/duplicates/self-loops must not matter
    val k4 = edges((for { a <- 0L to 3L; b <- 0L to 3L if a != b } yield a -> b): _*)
    assert(tri(k4) === 4L)
    assert(tri(edges(1L -> 2L, 2L -> 3L, 3L -> 4L)) === 0L) // path
    assert(tri(edges(1L -> 2L, 2L -> 1L, 1L -> 1L)) === 0L) // dup + self-loop
    assert(tri(edges(1L -> 2L, 2L -> 3L, 1L -> 3L,
      3L -> 4L, 4L -> 5L, 5L -> 3L)) === 2L) // two triangles sharing node 3
  }

  test("triangleCount: degree orientation matches brute force on a random graph") {
    import spark.implicits._
    val rnd = new scala.util.Random(11)
    val pairs = (0 until 200).map(_ => (rnd.nextInt(30).toLong, rnd.nextInt(30).toLong))
    val e = pairs.toDF("src", "dst")
    val got = GraphRank.triangleCount(e, col("src"), col("dst")).collect()(0).getLong(0)
    // brute force over the canonical undirected edge set
    val und = pairs.collect { case (a, b) if a != b => (math.min(a, b), math.max(a, b)) }.toSet
    val nodes = und.flatMap(p => Seq(p._1, p._2)).toSeq.sorted
    val brute = (for {
      i <- nodes.indices; j <- i + 1 until nodes.size; k <- j + 1 until nodes.size
      a = nodes(i); b = nodes(j); c = nodes(k)
      if und((a, b)) && und((b, c)) && und((a, c))
    } yield 1).size.toLong
    assert(got === brute)
  }

  test("personalizedPageRank: mass concentrates near seeds; unreachable stay 0") {
    import spark.implicits._
    // chain 0→1→2→3 plus an isolated pair 8→9; seed {0}
    val edges = Seq((0L, 1L), (1L, 2L), (2L, 3L), (8L, 9L)).toDF("s", "t")
    val seeds = Seq(0L).toDF("node")
    val r = GraphRank.personalizedPageRank(edges, col("s"), col("t"),
        seeds, col("node"), iters = 10)
      .collect().map(x => x.getLong(0) -> x.getLong(1)).toMap
    assert(r(0L) > r(1L) && r(1L) > r(2L) && r(2L) > r(3L),
      s"rank must decay with distance from the seed: $r")
    assert(r(8L) === 0L && r(9L) === 0L, "no teleport, no in-path → rank 0")
    // seeding everything uniformly = classic PageRank
    val all = edges.select(col("s").as("node"))
      .union(edges.select(col("t").as("node"))).distinct()
    val ppr = GraphRank.personalizedPageRank(edges, col("s"), col("t"),
        all, col("node"), iters = 5)
      .collect().map(x => x.getLong(0) -> x.getLong(1)).toMap
    val pr = GraphRank.pageRank(edges, col("s"), col("t"), iters = 5)
      .collect().map(x => x.getLong(0) -> x.getLong(1)).toMap
    assert(ppr === pr, "all-seed PPR must equal classic PageRank")
  }

  test("labelPropagation: two planted cliques resolve to two communities, layout-proof") {
    import org.apache.spark.sql.functions.col
    // cliques {0,1,2,3} and {10,11,12,13} joined by ONE bridge 3-10
    val clique = (a: Seq[Long]) =>
      for (x <- a; y <- a if x < y) yield (x, y)
    val e = edges(clique(Seq(0L, 1L, 2L, 3L)) ++ clique(Seq(10L, 11L, 12L, 13L)) :+
      ((3L, 10L)): _*)
    def run(df: DataFrame) =
      GraphRank.labelPropagation(df, col("src"), col("dst"), rounds = 5)
        .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    val lab = run(e)
    assert(lab.keySet === Set(0L, 1L, 2L, 3L, 10L, 11L, 12L, 13L))
    // each clique coalesces on its own minimum label; the one bridge
    // edge cannot outvote three intra-clique neighbours
    assert(Set(0L, 1L, 2L, 3L).map(lab) === Set(0L))
    assert(Set(10L, 11L, 12L, 13L).map(lab) === Set(10L))
    // deterministic under physical layout
    assert(run(e.repartition(7)) === lab)
  }

  test("labelPropagationUntilConverged: fixpoint on two cliques, converged=true") {
    import org.apache.spark.sql.functions.col
    val clique = (a: Seq[Long]) =>
      for (x <- a; y <- a if x < y) yield (x, y)
    val e = edges(clique(Seq(0L, 1L, 2L, 3L)) ++ clique(Seq(10L, 11L, 12L, 13L)) :+
      ((3L, 10L)): _*)
    val out = GraphRank.labelPropagationUntilConverged(e, col("src"), col("dst"),
      maxRounds = 30).collect()
    val lab = out.map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(Set(0L, 1L, 2L, 3L).map(lab) === Set(0L))
    assert(Set(10L, 11L, 12L, 13L).map(lab) === Set(10L))
    assert(out.forall(_.getBoolean(3)), "two planted cliques must converge")
    // the discovered round count confirms the fixpoint (last round
    // changes nothing), so it is at least 2 and well under the cap
    val rounds = out.head.getInt(2)
    assert(rounds >= 2 && rounds < 30, s"rounds=$rounds")
  }

  test("labelPropagationUntilConverged: single edge oscillates, detected at round 2") {
    import org.apache.spark.sql.functions.col
    // the textbook synchronous-LP 2-cycle: each node's only
    // neighbour is the other, so labels swap forever. Round 1:
    // (1→2, 2→1); round 2 reproduces the initial state — the
    // period-2 probe fires and the loop reports converged=false
    // instead of silently returning an arbitrary phase.
    val e = edges(1L -> 2L)
    val out = GraphRank.labelPropagationUntilConverged(e, col("src"), col("dst"),
      maxRounds = 30).collect()
    assert(out.forall(!_.getBoolean(3)), "single edge must NOT converge")
    assert(out.head.getInt(2) === 2, s"cycle detected at rounds=${out.head.getInt(2)}")
    // the returned state is the just-computed round-2 state = the
    // initial labeling (each node back to its own id)
    val lab = out.map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(lab === Map(1L -> 1L, 2L -> 2L))
  }

  test("labelPropagation: ties go to the smallest label, sync rounds exactly") {
    import org.apache.spark.sql.functions.col
    // path 5-7-9: after round 1 (sync), 5→7, 7→5 (tie {5,9}→min), 9→7
    val e = edges((5L, 7L), (7L, 9L))
    val lab = GraphRank.labelPropagation(e, col("src"), col("dst"), rounds = 1)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(lab === Map(5L -> 7L, 7L -> 5L, 9L -> 7L))
  }
}
