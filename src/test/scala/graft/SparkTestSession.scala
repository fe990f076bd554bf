package graft

import org.apache.spark.sql.SparkSession

/** One SparkSession for the whole forked test JVM. */
object SparkTestSession {
  lazy val spark: SparkSession = {
    val s = GraftSession.tuned(
      SparkSession.builder().master("local[8]").appName("graft-test"),
      shufflePartitions = 8).getOrCreate()
    s.sparkContext.setLogLevel("WARN")
    s
  }
}

trait SharedSpark {
  lazy val spark: SparkSession = SparkTestSession.spark
  lazy val sf0001 = "/root/testdata/sf0.001"
}
