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

  /** Run `f` with a fresh temp directory, deleted afterwards (specs
    * that skip cleanup leak a parquet dir per test run). */
  def withTempDir[A](prefix: String)(f: String => A): A = {
    val dir = java.nio.file.Files.createTempDirectory(prefix)
    try f(dir.toString)
    finally {
      import scala.jdk.CollectionConverters._
      java.nio.file.Files.walk(dir).iterator().asScala.toSeq.reverse
        .foreach(p => java.nio.file.Files.deleteIfExists(p))
    }
  }
}
