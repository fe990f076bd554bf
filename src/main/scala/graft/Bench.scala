package graft

import org.apache.spark.sql.SparkSession

/** Benchmark main: times the headline queries (QueryDef.bench) on
  * SPARK_GRAFT_SF_DIR and prints one JSON line. Each query is fully
  * executed via a noop-format write: every result row is produced and
  * handed to the sink, so Catalyst cannot prune projection work the
  * way it can under count(), and nothing is collected to the driver.
  * A warmup pass over every headline query absorbs JVM/codegen
  * startup, then each query is measured REPS times and the reported
  * number is the per-query MEDIAN — a single ambient-load spike on a
  * shared box cannot masquerade as a regression (min/max go to
  * stderr for dispersion checks). A query that throws reports -1.0,
  * never a misleading short wall time.
  */
object Bench {
  private val Reps = sys.env.getOrElse("SPARK_GRAFT_BENCH_REPS", "3").toInt

  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")

    // Thermal/ambient isolation: the driver invokes Bench minutes
    // after an 80+-query correctness sweep, and captures taken in
    // that heat shadow have read 2-7x quiet-box medians two rounds
    // running (r2/r3 verdicts). Gate on the 1-minute load average
    // decaying below half the hardware cores (immediate on a quiet
    // box), capped at 3 minutes so a genuinely busy host can't stall
    // the capture forever. SPARK_GRAFT_BENCH_NO_COOLDOWN=1 skips.
    if (!sys.env.contains("SPARK_GRAFT_BENCH_NO_COOLDOWN")) {
      val os = java.lang.management.ManagementFactory.getOperatingSystemMXBean
      val target = Runtime.getRuntime.availableProcessors() * 0.5
      val deadline = System.nanoTime() + 180L * 1000000000L
      var load = os.getSystemLoadAverage
      while (load > target && System.nanoTime() < deadline) {
        System.err.println(f"[bench] cool-down: 1-min load $load%.1f > target $target%.1f, waiting")
        Thread.sleep(10000)
        load = os.getSystemLoadAverage
      }
      System.err.println(f"[bench] starting at 1-min load $load%.1f (target $target%.1f)")
    }
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

    // Calibration gate: the load-average cool-down is necessary but
    // not sufficient — r2–r4 captures ran in the correctness sweep's
    // heat/page-cache shadow and read 2–7x quiet-box medians with
    // min≈median (the whole window degraded, not one cold rep). So
    // measurement starts only once a known-stable query (q_sim_topk,
    // steady state ~0.14 s at sf0.1/local[32]) lands within 1.5x of
    // its recorded reference; otherwise sleep and retry, and after the
    // retry budget flag the capture as calibration_failed in the JSON
    // so a reader knows to rerun rather than read a false regression.
    val calibRef = sys.env.getOrElse("SPARK_GRAFT_BENCH_CALIB_REF", "0.14").toDouble
    val calibGate = calibRef * 1.5
    var calibrationFailed = false
    QueryDef.all.find(_.name == "q_sim_topk").foreach { q =>
      def once(): Double = {
        val t = System.nanoTime(); run(q); (System.nanoTime() - t) / 1e9
      }
      var best = once()
      var attempts = 0
      while (best > calibGate && attempts < 10) {
        System.err.println(
          f"[bench] calibration: q_sim_topk $best%.3f s > gate $calibGate%.3f s, sleeping 15 s")
        Thread.sleep(15000)
        attempts += 1
        best = math.min(best, once())
      }
      calibrationFailed = best > calibGate
      System.err.println(
        f"[bench] calibration ${if (calibrationFailed) "FAILED" else "ok"}: " +
          f"q_sim_topk $best%.3f s (ref $calibRef%.3f s x 1.5)")
    }

    val results = benchQueries.map { q =>
      val times = (1 to Reps).map { _ =>
        val t0 = System.nanoTime()
        try { run(q); (System.nanoTime() - t0) / 1e9 }
        catch { case e: Throwable => System.err.println(s"[bench] ${q.name}: $e"); -1.0 }
      }
      // any failed rep poisons the query's number — a broken query
      // must not look fast
      val med =
        if (times.contains(-1.0)) -1.0
        else times.sorted.apply(Reps / 2)
      System.err.println(
        f"[bench] ${q.name}%-22s median $med%7.3f s  (min ${times.min}%.3f / max ${times.max}%.3f)")
      q.name -> med
    }
    val qs = results.map { case (k, v) => "\"" + k + "\":" + v }.mkString("{", ",", "}")
    val total = results.map(_._2).filter(_ >= 0).sum
    println(s"""{"metric":"total","value":$total,"unit":"sec","queries":$qs,"sf":"$sfDir","calibration_failed":$calibrationFailed}""")
    spark.stop()
  }
}
