package graft

import graft.ext.Layout
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Scale-stress harness for DELETION VECTORS: the GDPR shape — a
  * sparse delete on a SECONDARY key (every file partially matches,
  * because the layout clusters on the primary) over a 64-file
  * clustered table — timed three ways:
  *
  *   - copy-on-write ([[Layout.deleteWhere]]): every partial file
  *     rewrites — the cost a 100 TB table cannot pay per point
  *     delete,
  *   - merge-on-read ([[Layout.deleteWhereDv]]): positions recorded,
  *     zero data files rewritten,
  *   - the read tax each leaves behind (full aggregate over the
  *     mutated layout vs the untouched twin), and the PURGE
  *     ([[Layout.optimizeSelective]]) that clears it.
  *
  * One line per measurement, same format as [[StressDedup]]. */
object StressDv {

  private def time(label: String)(f: => Long): Unit = {
    val t0 = System.nanoTime()
    val rows = f
    println(f"STRESS $label%-28s ${(System.nanoTime() - t0) / 1e9}%8.2f s  ($rows rows)")
  }

  private def mkLayout(spark: SparkSession, dir: String, n: Long,
                       files: Int): Unit = {
    spark.range(n).select(col("id").as("k"),
        pmod(xxhash64(col("id")), lit(997L)).as("k2"),
        (col("id") * 3).as("v"))
      .repartitionByRange(files, col("k")).sortWithinPartitions("k")
      .write.mode("overwrite").parquet(dir)
    Layout.buildFileManifest(spark, dir, Seq("k", "k2"))
      .write.mode("overwrite").parquet(s"$dir/_graft_manifest")
    Layout.enableGenerations(spark, dir)
  }

  def main(args: Array[String]): Unit = {
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = GraftSession.tuned(
      SparkSession.builder().master(s"local[$cpus]")
        .appName("graft-stress-dv"),
      shufflePartitions = cpus.toInt).getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    val n = 2000000L
    val files = 64
    val root = Scratch.tempDir("graft_stress_dv_")
    val cow = s"$root/cow"
    val mor = s"$root/mor"
    println(s"STRESS dv n=$n files=$files band=k2 in [0,49] of 997 " +
      "(~5% of every file — the sparse secondary-key GDPR shape)")
    mkLayout(spark, cow, n, files)
    mkLayout(spark, mor, n, files)
    val box = Seq(Layout.KeyBox("k2", 0L, 49L))

    time("dv-delete-cow") {
      val st = Layout.deleteWhere(spark, cow, box)
      require(st.filesRewritten > 0, s"degenerate: $st")
      st.rowsDeleted
    }
    time("dv-delete-mor") {
      val st = Layout.deleteWhereDv(spark, mor, box)
      require(st.filesVectorized > 0 && st.filesDropped == 0,
        s"degenerate: $st")
      st.rowsDeleted
    }
    time("dv-read-cow") {
      Layout.readLayout(spark, cow)
        .agg(count(lit(1)), sum("v")).collect()(0).getLong(0)
    }
    time("dv-read-mor-taxed") {
      Layout.readLayout(spark, mor)
        .agg(count(lit(1)), sum("v")).collect()(0).getLong(0)
    }
    time("dv-scan-pruned-mor") {
      Layout.scanPruned(spark, mor,
          Seq(Layout.KeyBox("k", 0L, n / 4)))
        .agg(count(lit(1))).collect()(0).getLong(0)
    }
    time("dv-purge") {
      val st = Layout.optimizeSelective(spark, mor, targetRows = n / files)
      require(st.reclustered, s"degenerate: $st")
      st.filesAfter.toLong
    }
    time("dv-read-mor-purged") {
      Layout.readLayout(spark, mor)
        .agg(count(lit(1)), sum("v")).collect()(0).getLong(0)
    }
    time("dv-snapshot-at-dv-gen") {
      Layout.readSnapshot(spark, mor, 1L)
        .agg(count(lit(1))).collect()(0).getLong(0)
    }
    spark.stop()
  }
}
