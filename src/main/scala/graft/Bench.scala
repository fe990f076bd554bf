package graft

import org.apache.spark.sql.SparkSession

/** Benchmark main: times the headline queries (QueryDef.bench) on
  * SPARK_GRAFT_SF_DIR and prints one JSON line. Each query is fully
  * executed via a noop-format write: every result row is produced and
  * handed to the sink, so Catalyst cannot prune projection work the
  * way it can under count(), and nothing is collected to the driver.
  * A warmup run of the flagship query absorbs JVM/codegen startup so
  * per-query numbers reflect steady state.
  */
object Bench {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = GraftSession.tuned(
      SparkSession.builder().master(s"local[$cpus]").appName("graft-bench"),
      shufflePartitions = cpus.toInt).getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    def run(q: QueryDef): Unit =
      q.fn(spark, sfDir).write.format("noop").mode("overwrite").save()

    val benchQueries = QueryDef.all.filter(_.bench)
    // warmup pass over every headline query: Janino codegen
    // compilation and JIT of each query's generated classes dominate
    // first runs (measured 2-4x on the text-heavy queries), and a
    // single-query warmup only absorbs that for plan shapes it shares
    val t0 = System.nanoTime()
    benchQueries.foreach { q =>
      try run(q)
      catch { case e: Throwable => System.err.println(s"[bench] warmup ${q.name}: $e") }
    }
    System.err.println(f"[bench] warmup pass ${(System.nanoTime() - t0) / 1e9}%.1f s")

    val results = benchQueries.map { q =>
      val t0 = System.nanoTime()
      try { run(q) }
      catch { case e: Throwable => System.err.println(s"[bench] ${q.name}: $e") }
      q.name -> (System.nanoTime() - t0) / 1e9
    }
    val qs = results.map { case (k, v) => "\"" + k + "\":" + v }.mkString("{", ",", "}")
    val total = results.map(_._2).sum
    println(s"""{"metric":"total","value":$total,"unit":"sec","queries":$qs,"sf":"$sfDir"}""")
    spark.stop()
  }
}
