package graft

import graft.ext.GraphRank
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Scale-stress harness for [[GraphRank]]:
  *
  *   - triangle counting on the adversarial hub graph — a star whose
  *     hub sits at the MEDIAN id, so id-based orientation points half
  *     the edges into the hub and half out, creating in·out ≈ (d/2)²
  *     wedges through it; degree-based orientation points every edge
  *     INTO the hub (highest degree), creating ZERO hub wedges. The
  *     id-oriented baseline runs on a 1/10-size star (its wedge count
  *     grows with d², 100× the degree-oriented form's),
  *   - triangle counting on a uniform random graph at 1× and rep×
  *     (nodes scaled WITH edges — constant average degree, the
  *     "bigger crawl" axis; scaling edges over fixed nodes densifies
  *     the graph instead, and wedge volume is inherently quadratic
  *     in density: measured 858 s for 10× edges over fixed nodes),
  *   - 5-iteration PageRank at 1× and rep× edges (each iteration is
  *     two |E| shuffles; near-linear wall growth is the pass mark).
  *
  * One line per measurement, same format as [[StressDedup]].
  */
object StressGraph {

  private def randomEdges(spark: SparkSession, nE: Long, nV: Long): DataFrame =
    spark.range(nE).select(
      pmod(xxhash64(col("id")), lit(nV)).as("src"),
      pmod(xxhash64(col("id") * 31 + 7), lit(nV)).as("dst"))

  /** Star with hub at the median id — the id-orientation worst case. */
  private def hubStar(spark: SparkSession, leaves: Long): DataFrame = {
    val hub = leaves / 2
    spark.range(leaves + 1).filter(col("id") =!= hub)
      .select(col("id").as("src"), lit(hub).as("dst"))
  }

  /** Triangle count with the ORACLE's id-based orientation — the
    * baseline whose hub blowup degree orientation exists to avoid. */
  private def idOrientedTriangles(edges: DataFrame): Long = {
    val und = edges.select(least(col("src"), col("dst")).as("a"),
        greatest(col("src"), col("dst")).as("b"))
      .filter(col("a") =!= col("b")).distinct()
    val wedges = und.join(und.select(col("a").as("b"), col("b").as("c")), "b")
    wedges.join(und.select(col("a"), col("b").as("c")), Seq("a", "c"), "left_semi")
      .count()
  }

  private def time(label: String)(f: => Long): Unit = {
    val t0 = System.nanoTime()
    val rows = f
    println(f"STRESS $label%-28s ${(System.nanoTime() - t0) / 1e9}%8.2f s  ($rows)")
  }

  def main(args: Array[String]): Unit = {
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val rep = sys.env.getOrElse("SPARK_GRAFT_STRESS_REP", "10").toInt
    val spark = GraftSession.tuned(
      SparkSession.builder().master(s"local[$cpus]").appName("graft-stress-graph"),
      shufflePartitions = cpus.toInt).getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    val leaves = 200000L
    println(s"STRESS graph hub-star leaves=$leaves (id-baseline at 1/10 size); " +
      s"random 1x=2M edges over 200k nodes, ${rep}x scales both (constant degree)")

    time("tri-hub-id-oriented-1/10x") {
      idOrientedTriangles(hubStar(spark, leaves / 10))
    }
    time("tri-hub-degree-1x") {
      GraphRank.triangleCount(hubStar(spark, leaves), col("src"), col("dst"))
        .collect()(0).getLong(0)
    }
    time("tri-random-1x") {
      GraphRank.triangleCount(randomEdges(spark, 2000000L, 200000L),
        col("src"), col("dst")).collect()(0).getLong(0)
    }
    time(s"tri-random-${rep}x") {
      GraphRank.triangleCount(randomEdges(spark, 2000000L * rep, 200000L * rep),
        col("src"), col("dst")).collect()(0).getLong(0)
    }
    time("pagerank-5it-1x") {
      GraphRank.pageRank(randomEdges(spark, 2000000L, 200000L),
        col("src"), col("dst"), iters = 5).agg(sum("rank")).collect()(0).getLong(0)
    }
    time(s"pagerank-5it-${rep}x") {
      GraphRank.pageRank(randomEdges(spark, 2000000L * rep, 200000L),
        col("src"), col("dst"), iters = 5).agg(sum("rank")).collect()(0).getLong(0)
    }
    // until-convergence: rounds must stay modest and the per-round
    // checkpoint keeps wall ~linear in rounds (an unchecked loop's
    // re-planning cost would grow superlinearly); prints rounds as
    // the result so the capture shows convergence, not a cap hit
    time("pagerank-converged-1x") {
      GraphRank.pageRankUntilConverged(randomEdges(spark, 2000000L, 200000L),
          col("src"), col("dst"), tolerance = 1000000L, maxIters = 50)
        .select(max("rounds")).collect()(0).getInt(0).toLong
    }
    // k-core peel at avg degree ~20 (2M edges / 200k nodes). The
    // Erdős–Rényi k-core threshold is ≈ k + sqrt(k·ln k): k = 18
    // needs mean ≈ 25 and cascades to EMPTY here (measured), k = 12
    // (threshold ≈ 17) peels the sparse tail over several rounds and
    // keeps a ~195k-node core; prints the surviving-core node count
    time("kcore-k12-1x") {
      GraphRank.kCore(randomEdges(spark, 2000000L, 200000L),
        col("src"), col("dst"), k = 12).count()
    }
    spark.stop()
  }
}
