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

    // dev affordance (mirrors Verify's SPARK_GRAFT_ONLY): time just the
    // named queries when chasing one number; the driver sets nothing
    // and times the full headline set
    val only = sys.env.get("SPARK_GRAFT_BENCH_ONLY")
      .map(_.split(",").map(_.trim).toSet)
    val benchQueries = QueryDef.all.filter(_.bench)
      .filter(q => only.forall(_.contains(q.name)))

    // Calibration gate: the load-average cool-down is necessary but
    // not sufficient — r2–r4 captures ran in the correctness sweep's
    // heat/page-cache shadow and read 2–7x quiet-box medians with
    // min≈median (the whole window degraded, not one cold rep). So
    // measurement starts only once a known-stable query (q_sim_topk,
    // steady state ~0.14 s at sf0.1/local[32] — the reference scales
    // with the core count for dev runs at local[8]) lands within 1.5x
    // of its recorded reference; otherwise sleep and retry, and after
    // the retry budget flag the capture as calibration_failed in the
    // JSON so a reader knows to rerun rather than read a false
    // regression.
    val calibDefault = 0.14 * math.max(1.0, 32.0 / cpus.toInt)
    val calibRef = sys.env.get("SPARK_GRAFT_BENCH_CALIB_REF")
      .map(_.toDouble).getOrElse(calibDefault)
    // 3x, not 1.5x: a cold session legitimately runs the canary ~2.4x
    // its steady state (shared Spark internals still JIT-ing); the
    // degradation this gate exists to catch reads 10-30x
    val calibGate = calibRef * 3.0
    var calibrationFailed = false
    QueryDef.all.find(_.name == "q_sim_topk").foreach { q =>
      def once(): Double = {
        val t = System.nanoTime(); run(q); (System.nanoTime() - t) / 1e9
      }
      once() // untimed: absorb the canary's own codegen/JIT cold start
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

    // Hypervisor CPU-steal accounting (/proc/stat col 9, USER_HZ
    // ticks): this box is a microVM, and host contention appears as
    // intermittent minutes-long windows where fixed CPU work runs
    // 10-30x slow — invisible to the guest's load average, which is
    // what poisoned the r2-r4 driver captures. Steal can't be
    // avoided from inside the guest, but it CAN be measured per
    // query, so a reader can tell a steal-window median from a real
    // regression.
    def stealTicks(): Long =
      try java.nio.file.Files.readAllLines(java.nio.file.Paths.get("/proc/stat"))
        .get(0).trim.split("\\s+")(8).toLong
      catch { case _: Throwable => -1L }

    // Per-query warmup + measurement. Earlier rounds ran ONE global
    // warmup pass over all headline queries and then measured them in
    // sequence — and the first-measured queries read 10-30x their
    // steady state while the session digested that pass's debris
    // (classloading of hundreds of generated classes, async shuffle/
    // broadcast cleanup), recovering minutes later. That artifact —
    // plus hypervisor steal windows — was the r2-r4 "capture
    // inflation". A warmup rep IMMEDIATELY before each query's
    // measured reps keeps exactly the property the warmup exists for
    // (Janino compilation and JIT of that query's generated classes
    // are absorbed) without a half-session of unrelated churn between
    // warm-up and measure.
    val steal0 = stealTicks()
    val results = benchQueries.map { q =>
      try run(q)
      catch { case e: Throwable => System.err.println(s"[bench] warmup ${q.name}: $e") }
      val s0 = stealTicks()
      val times = (1 to Reps).map { _ =>
        val t0 = System.nanoTime()
        try { run(q); (System.nanoTime() - t0) / 1e9 }
        catch { case e: Throwable => System.err.println(s"[bench] ${q.name}: $e"); -1.0 }
      }
      val qSteal = stealTicks() - s0
      // any failed rep poisons the query's number — a broken query
      // must not look fast
      val med =
        if (times.contains(-1.0)) -1.0
        else times.sorted.apply(Reps / 2)
      System.err.println(
        f"[bench] ${q.name}%-22s median $med%7.3f s  (min ${times.min}%.3f / max ${times.max}%.3f, steal $qSteal%d ticks)")
      (q.name, med, times.filterNot(_ == -1.0).foldLeft(-1.0)((a, t) => if (a < 0 || t < a) t else a))
    }
    val qs = results.map { case (k, v, _) => "\"" + k + "\":" + v }.mkString("{", ",", "}")
    val qsMin = results.map { case (k, _, mn) => "\"" + k + "\":" + mn }.mkString("{", ",", "}")
    val total = results.map(_._2).filter(_ >= 0).sum
    val stealTotal = if (steal0 < 0) -1L else stealTicks() - steal0
    println(s"""{"metric":"total","value":$total,"unit":"sec","queries":$qs,"queries_min":$qsMin,"sf":"$sfDir","calibration_failed":$calibrationFailed,"steal_ticks":$stealTotal}""")
    spark.stop()
  }
}
