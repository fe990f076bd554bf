package graft

import org.apache.spark.sql.SparkSession

/** Benchmark main: times the headline queries (QueryDef.bench) on
  * SPARK_GRAFT_SF_DIR and prints one JSON line. Each query is fully
  * executed via count() (materializes every operator, no collect of
  * payload to the driver). A warmup run of the flagship query absorbs
  * JVM/codegen startup so per-query numbers reflect steady state.
  */
object Bench {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = GraftSession.tuned(
      SparkSession.builder().master(s"local[$cpus]").appName("graft-bench"),
      shufflePartitions = cpus.toInt).getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    val benchQueries = QueryDef.all.filter(_.bench)
    // warmup: JIT + codegen + parquet footer caches
    benchQueries.headOption.foreach(q => q.fn(spark, sfDir).count())

    val results = benchQueries.map { q =>
      val t0 = System.nanoTime()
      try { q.fn(spark, sfDir).count() }
      catch { case e: Throwable => System.err.println(s"[bench] ${q.name}: $e"); -1L }
      q.name -> (System.nanoTime() - t0) / 1e9
    }
    val qs = results.map { case (k, v) => "\"" + k + "\":" + v }.mkString("{", ",", "}")
    val total = results.map(_._2).sum
    println(s"""{"metric":"total","value":$total,"unit":"sec","queries":$qs,"sf":"$sfDir"}""")
    spark.stop()
  }
}
