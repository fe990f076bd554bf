package graft

import graft.ext.{Sketches, TextAnalysis}
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** HLL / CMS sketch properties the oracle gate can't express:
  * accuracy bounds, partition-order independence (which exercises
  * partial-aggregate merge + buffer serialization through a real
  * shuffle), and the CMS over-count guarantee under engineered
  * collisions.
  */
class SketchesSpec extends AnyFunSuite with SharedSpark {
  import spark.implicits._

  test("hllDistinct estimates 10k distinct longs within 3% at p=14") {
    val df = spark.range(10000).select(col("id"))
    val est = df.agg(Sketches.hllDistinct(col("id"), p = 14)).as[Double].head()
    assert(math.abs(est - 10000.0) / 10000.0 < 0.03, s"estimate $est")
  }

  test("hllDistinct is partition-independent (merge + serde through shuffle)") {
    val base = spark.range(5000).select((col("id") % 1234).as("k"))
    val one = base.repartition(1).agg(Sketches.hllDistinct(col("k"))).as[Double].head()
    val many = base.repartition(16).agg(Sketches.hllDistinct(col("k"))).as[Double].head()
    assert(one == many, s"one-partition $one != 16-partition $many")
  }

  test("hllDistinct counts hash-distinct values: duplicates don't inflate") {
    val dups = spark.range(20000).select((col("id") % 100).as("k"))
    val est = dups.agg(Sketches.hllDistinct(col("k"), p = 14)).as[Double].head()
    assert(est > 80 && est < 120, s"estimate $est for 100 distinct")
  }

  test("portable HLL matches a register-level re-derivation in Scala") {
    // Re-derive the m=64 raw estimate independently from first
    // principles over the same portable hashes, then compare exactly.
    val docs = spark.read.parquet(s"$sf0001/documents.parquet")
    val hashes = docs
      .select(Sketches.uhash(TextAnalysis.rollingHash(col("text")), 100).as("h"))
      .as[Long].collect()
    val regs = new Array[Int](64)
    for (h <- hashes) {
      val j = (h % 64).toInt
      val w = h / 64
      val rho = if (w == 0L) 25 else 24 - (63 - java.lang.Long.numberOfLeadingZeros(w))
      if (rho > regs(j)) regs(j) = rho
    }
    val expected = 0.709 * 64 * 64 / regs.map(r => 1.0 / (1L << r)).sum
    val est = docs
      .select(Sketches.uhash(TextAnalysis.rollingHash(col("text")), 100).as("h"))
      .agg(Sketches.hllDistinctPortable(col("h"))).as[Double].head()
    assert(est == expected, s"sketch $est != re-derivation $expected")
  }

  test("CMS estimate >= true count for every key, == without collisions") {
    val toks = spark.read.parquet(s"$sf0001/documents.parquet")
      .select(explode(split(lower(col("text")), "\\s+")).as("tok"))
      .filter(length(col("tok")) > 0)
      .withColumn("x", TextAnalysis.rollingHash(col("tok")))
    val sk = toks.agg(Sketches.cmsSketch(col("x"), d = 4, w = 512).as("sk"))
    val checked = toks.groupBy("tok").agg(count(lit(1)).as("n"), min(col("x")).as("x"))
      .crossJoin(broadcast(sk))
      .select(col("n"), Sketches.cmsEstimate(col("sk"), col("x"), d = 4, w = 512).as("est"))
      .as[(Long, Long)].collect()
    assert(checked.nonEmpty)
    assert(checked.forall { case (n, est) => est >= n },
      "CMS must never under-count")
    // vocab << 4*512 counters: w=512 should be collision-free here
    assert(checked.forall { case (n, est) => est == n },
      s"expected exact at w=512; worst ${checked.maxBy { case (n, e) => e - n }}")
  }

  test("CMS over-counts but stays bounded when w is squeezed") {
    val toks = spark.read.parquet(s"$sf0001/documents.parquet")
      .select(explode(split(lower(col("text")), "\\s+")).as("tok"))
      .filter(length(col("tok")) > 0)
      .withColumn("x", TextAnalysis.rollingHash(col("tok")))
    val n = toks.count()
    val sk = toks.agg(Sketches.cmsSketch(col("x"), d = 4, w = 8).as("sk"))
    val checked = toks.groupBy("tok").agg(count(lit(1)).as("cnt"), min(col("x")).as("x"))
      .crossJoin(broadcast(sk))
      .select(col("cnt"), Sketches.cmsEstimate(col("sk"), col("x"), d = 4, w = 8).as("est"))
      .as[(Long, Long)].collect()
    assert(checked.exists { case (cnt, est) => est > cnt },
      "w=8 with a bigger vocab must collide somewhere")
    // trivial upper bound: an estimate can never exceed the stream size
    assert(checked.forall { case (_, est) => est <= n })
  }

  test("bloom filter: no false negatives, strong pruning of non-members") {
    val members = spark.range(100).select(col("id").as("k"))
    val bloom = members.agg(
      ext.Sketches.bloomSketch(ext.Sketches.keyHash(col("k")), mBits = 4096, k = 4).as("bf"))
    val probes = spark.range(10000).select((col("id") + 50).as("k"))
    val passed = probes.crossJoin(broadcast(bloom))
      .filter(ext.Sketches.bloomContains(col("bf"), ext.Sketches.keyHash(col("k")),
        mBits = 4096, k = 4))
      .select("k").as[Long].collect().toSet
    // every true member that was probed must pass
    assert((50L until 100L).forall(passed.contains), "bloom false negative")
    // 4096 bits / 100 keys: non-members should almost all be pruned
    val falsePos = passed.count(_ >= 100)
    assert(falsePos < 500, s"$falsePos false positives out of 9950 non-members")
  }

  test("bloom filter is partition-independent (OR-merge through shuffle)") {
    val members = spark.range(1000).select(col("id").as("k"))
    def build(parts: Int) = members.repartition(parts)
      .agg(ext.Sketches.bloomSketch(ext.Sketches.keyHash(col("k"))))
      .as[Seq[Long]].head()
    assert(build(1) == build(16))
  }

  test("capPerGroup keeps exactly cap rows per group, deterministically") {
    val docs = spark.read.parquet(s"$sf0001/documents.parquet")
    val capped = ext.Sampling.capPerGroup(docs, col("source"), col("doc_id"), cap = 3)
    val sizes = capped.groupBy("source").count().as[(String, Long)].collect()
    assert(sizes.forall(_._2 <= 3), s"over cap: ${sizes.filter(_._2 > 3).mkString(",")}")
    val a = capped.orderBy("source", "doc_id").collect().toSeq
    val b = ext.Sampling.capPerGroup(docs.repartition(16), col("source"), col("doc_id"), 3)
      .orderBy("source", "doc_id").collect().toSeq
    assert(a == b, "kept set must not depend on partitioning")
  }

  test("sketch aggregates are callable from spark.sql after registration") {
    graft.functions.SketchAggregates.register(spark)
    spark.read.parquet(s"$sf0001/documents.parquet").createOrReplaceTempView("docs_sql")
    val sqlEst = spark.sql(
      """SELECT lang, hll_distinct(xxhash64(text) & 9223372036854775807, 14, 63) AS est
        |FROM docs_sql GROUP BY lang""".stripMargin)
      .collect().map(r => (r.getString(0), r.getDouble(1))).toMap
    val apiEst = spark.read.parquet(s"$sf0001/documents.parquet")
      .groupBy("lang").agg(ext.Sketches.hllDistinct(col("text"), 14).as("est"))
      .collect().map(r => (r.getString(0), r.getDouble(1))).toMap
    assert(sqlEst == apiEst, s"sql $sqlEst vs api $apiEst")
  }

  test("empty register array estimates 0.0, not a divide-by-zero Infinity") {
    // the merge-aggregate state for a group that saw zero rows
    val est = Seq(Seq.empty[Int]).toDF("regs")
      .select(Sketches.hllEstimateFromRegisters(col("regs"))).as[Double].head()
    assert(est === 0.0)
  }

  test("sketch aggregates reject bad inputs with clear errors, not index crashes") {
    graft.functions.SketchAggregates.register(spark)
    def chainMessages(t: Throwable): String =
      Iterator.iterate(t)(_.getCause).takeWhile(_ != null)
        .map(e => Option(e.getMessage).getOrElse("")).mkString(" | ")
    // negative / out-of-contract values: a clear contract message
    val e1 = intercept[Exception] {
      Seq(-5L).toDF("h").agg(Sketches.hllDistinctPortable(col("h"))).collect()
    }
    assert(chainMessages(e1).contains("non-negative"), chainMessages(e1))
    val e2 = intercept[Exception] {
      Seq(-1L).toDF("h").agg(Sketches.cmsSketch(col("h"))).collect()
    }
    assert(chainMessages(e2).contains("cms_sketch expects"), chainMessages(e2))
    // non-numeric input through the SQL registration: the declared
    // LONG input type makes the analyzer wrap it in a standard
    // (ANSI) cast, so "abc" dies with a clear cast error — never the
    // old ClassCastException / array-index crash from inside update()
    Seq("abc").toDF("s").createOrReplaceTempView("bad_input_sql")
    val e3 = intercept[Exception] {
      spark.sql("SELECT cms_sketch(s, 4, 512) FROM bad_input_sql").collect()
    }
    val chain3 = Iterator.iterate(e3: Throwable)(_.getCause).takeWhile(_ != null).toList
    assert(!chain3.exists(t => t.isInstanceOf[ClassCastException] ||
      t.isInstanceOf[ArrayIndexOutOfBoundsException]), chainMessages(e3))
    // integral widening still works: an INT column is usable directly
    val ok = spark.sql("SELECT hll_distinct(CAST(7 AS INT), 14, 63) FROM bad_input_sql")
      .collect()
    assert(ok.length == 1)
  }

  test("HLL lifecycle: persisted register arrays merge to the union sketch") {
    val docs = spark.read.parquet(s"$sf0001/documents.parquet")
      .select(col("source"),
        ext.Sketches.uhash(TextAnalysis.rollingHash(col("text")), 100).as("h"))
    val dir = java.nio.file.Files.createTempDirectory("graft_hll_").toString
    try {
      // day-1 pipeline: persist one 64-int register array per source
      docs.groupBy("source")
        .agg(ext.Sketches.hllRegistersPortable(col("h")).as("regs"))
        .write.mode("overwrite").parquet(dir)
      // day-N consumer: reload, merge arbitrary subsets, estimate —
      // never touching raw data
      val merged = spark.read.parquet(dir)
        .agg(ext.Sketches.hllMergeRegisters(col("regs")).as("m"))
        .select(ext.Sketches.hllEstimateFromRegisters(col("m")))
        .as[Double].head()
      val direct = docs.agg(ext.Sketches.hllDistinctPortable(col("h")))
        .as[Double].head()
      assert(merged == direct,
        s"merged-from-parquet $merged != direct $direct — union property broken")
    } finally {
      org.apache.commons.io.FileUtils.deleteDirectory(new java.io.File(dir))
    }
  }

  test("CMS lifecycle: persisted counter matrices sum-merge to the union sketch") {
    val toks = spark.read.parquet(s"$sf0001/documents.parquet")
      .select(col("source"), explode(split(lower(col("text")), "\\s+")).as("tok"))
      .withColumn("x", TextAnalysis.rollingHash(col("tok")))
    val dir = java.nio.file.Files.createTempDirectory("graft_cms_").toString
    try {
      toks.groupBy("source")
        .agg(ext.Sketches.cmsSketch(col("x")).as("sk"))
        .write.mode("overwrite").parquet(dir)
      val merged = spark.read.parquet(dir)
        .agg(ext.Sketches.cmsMerge(col("sk"))).as[Seq[Long]].head()
      val direct = toks.agg(ext.Sketches.cmsSketch(col("x"))).as[Seq[Long]].head()
      assert(merged == direct, "merged-from-parquet counters != direct counters")
    } finally {
      org.apache.commons.io.FileUtils.deleteDirectory(new java.io.File(dir))
    }
  }

  test("histogramQuantile lands within half a bin of the exact median") {
    val li = spark.read.parquet(s"$sf0001/lineitem.parquet")
    val approx = ext.Sketches.histogramQuantile(li, col("l_returnflag"),
        col("l_extendedprice"), lo = 0.0, hi = 131072.0, bins = 64, q = 0.5)
      .select(col("k"), col("q_est")).as[(String, Double)].collect().toMap
    val exact = li.groupBy("l_returnflag")
      .agg(expr("percentile(l_extendedprice, 0.5)").as("med"))
      .as[(String, Double)].collect().toMap
    assert(approx.keySet == exact.keySet)
    for ((k, est) <- approx)
      assert(math.abs(est - exact(k)) <= 1024.0 + 1e-9,
        s"key $k: est $est vs exact ${exact(k)}")
  }

  test("Misra-Gries heavy hitters: guarantees hold under any partitioning") {
    val toks = spark.read.parquet(s"$sf0001/documents.parquet")
      .select(explode(split(lower(col("text")), "\\s+")).as("tok"))
      .filter(length(col("tok")) > 0)
      .withColumn("x", TextAnalysis.rollingHash(col("tok")))
    val n = toks.count()
    val trueCounts = toks.groupBy("x").count().as[(Long, Long)].collect().toMap
    val k = 16
    for (parts <- Seq(1, 16)) {
      val hh = toks.repartition(parts)
        .agg(ext.Sketches.heavyHitters(col("x"), k))
        .as[Seq[(Long, Long)]].head().toMap
      assert(hh.size <= k, s"state exceeded k: ${hh.size}")
      val bound = n / (k + 1)
      // completeness: every key over the threshold must be tracked
      for ((key, c) <- trueCounts if c > bound)
        assert(hh.contains(key), s"missed heavy hitter $key (true $c > bound $bound)")
      // soundness: under-count only, by at most the bound
      for ((key, est) <- hh) {
        val t = trueCounts(key)
        assert(est <= t, s"over-count: key $key est $est > true $t")
        assert(t - est <= bound, s"error beyond bound: key $key true $t est $est")
      }
    }
  }

  test("Misra-Gries summary fold: guarantees compose across batches (streaming shape)") {
    import spark.implicits._
    // three disjoint micro-batches of the token stream, folded via
    // the Agarwal merge rule — exactly the foreachBatch deployment
    val toks = spark.read.parquet(s"$sf0001/documents.parquet")
      .select(explode(split(lower(col("text")), "\\s+")).as("tok"))
      .filter(length(col("tok")) > 0)
      .withColumn("x", TextAnalysis.rollingHash(col("tok")))
      .withColumn("b", pmod(col("x"), lit(3)))
    val k = 8
    var state = Seq.empty[(Long, Long)].toDF("key", "cnt")
    for (b <- 0 to 2)
      state = Sketches.mgMergeSummaries(state,
        Sketches.mgSummaryRows(toks.filter(col("b") === b), col("x"), k), k)
        .localCheckpoint(true)
    val hh = state.as[(Long, Long)].collect().toMap
    assert(hh.size <= k, s"state exceeded k: ${hh.size}")
    val n = toks.count()
    val trueCounts = toks.groupBy("x").count().as[(Long, Long)].collect().toMap
    val bound = n / (k + 1)
    for ((key, c) <- trueCounts if c > bound)
      assert(hh.contains(key), s"missed heavy hitter $key (true $c > bound $bound)")
    for ((key, est) <- hh) {
      val t = trueCounts(key)
      assert(est <= t, s"over-count: key $key est $est > true $t")
      assert(t - est <= bound, s"error beyond bound: key $key true $t est $est")
    }
  }

  test("Misra-Gries maintenance in a live streaming loop keeps its guarantees per micro-batch") {
    import spark.implicits._
    import org.apache.spark.sql.DataFrame
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    implicit val sqlCtx = spark.sqlContext
    // the actual deployment loop (ChurnSpec's shape): a MemoryStream
    // of keys, foreachBatch folding ≤k-row summaries — after EVERY
    // micro-batch the folded state must satisfy the composed MG
    // guarantees over the union of everything streamed so far
    val k = 8
    val batches = Seq(
      (1 to 200).map(i => (i % 11).toLong),  // heavy residues 0..10
      (1 to 150).map(i => (i % 7).toLong),
      (1 to 120).map(i => (i % 23).toLong)) // long tail arrives late
    val mem = MemoryStream[Long]
    var state: DataFrame = Seq.empty[(Long, Long)].toDF("key", "cnt")
    val q = mem.toDF().toDF("x").writeStream
      .foreachBatch { (b: DataFrame, _: Long) =>
        state = Sketches.mgMergeSummaries(state,
          Sketches.mgSummaryRows(b, col("x"), k), k).localCheckpoint(true)
      }.start()
    try {
      var all = Seq.empty[Long]
      for (batch <- batches) {
        mem.addData(batch: _*)
        q.processAllAvailable()
        all ++= batch
        val hh = state.as[(Long, Long)].collect().toMap
        assert(hh.size <= k, s"state exceeded k after ${all.size} items: ${hh.size}")
        val trueCounts = all.groupBy(identity).view.mapValues(_.size.toLong).toMap
        val bound = all.size.toLong / (k + 1)
        for ((key, c) <- trueCounts if c > bound)
          assert(hh.contains(key),
            s"missed heavy hitter $key after ${all.size} items (true $c > bound $bound)")
        for ((key, est) <- hh) {
          val t = trueCounts(key)
          assert(est <= t && t - est <= bound,
            s"bound violated after ${all.size} items: key $key true $t est $est")
        }
      }
    } finally q.stop()
  }

  test("mgMergeSummaries refuses a non-summary input instead of collecting it") {
    import spark.implicits._
    // a raw keyed count matches the (key, cnt) schema but is
    // vocabulary-sized — the bounded probe must reject it before the
    // driver-side collect, not after
    val k = 4
    val raw = (1 to 100).map(i => (i.toLong, 1L)).toDF("key", "cnt")
    val good = Seq((1L, 5L), (2L, 3L)).toDF("key", "cnt")
    val ex = intercept[IllegalArgumentException] {
      Sketches.mgMergeSummaries(good, raw, k)
    }
    assert(ex.getMessage.contains("delta has more than"))
    // a contract-violating STATE with k+1..2k rows must refuse too —
    // the old combined-distinct-count guard let it through and wiped
    // the fold's heavy-hitter state to an empty frame
    val slightlyBig = (1 to (k + 2)).map(i => (i.toLong, 1L)).toDF("key", "cnt")
    val ex2 = intercept[IllegalArgumentException] {
      Sketches.mgMergeSummaries(slightlyBig, good, k)
    }
    assert(ex2.getMessage.contains("state has more than"))
    intercept[IllegalArgumentException] {
      Sketches.mgMergeSummaries(raw, good, k)
    }
  }

  test("CMS is partition-independent (merge + serde through shuffle)") {
    val toks = spark.read.parquet(s"$sf0001/documents.parquet")
      .select(explode(split(lower(col("text")), "\\s+")).as("tok"))
      .withColumn("x", TextAnalysis.rollingHash(col("tok")))
    val a = toks.repartition(1).agg(Sketches.cmsSketch(col("x"))).as[Seq[Long]].head()
    val b = toks.repartition(16).agg(Sketches.cmsSketch(col("x"))).as[Seq[Long]].head()
    assert(a == b)
  }

  test("cmsInnerProduct bounds the true join size from above, within e/w slack") {
    val ev = spark.read.parquet(s"$sf0001/events.parquet")
      .select(col("user_id"), col("event_type"))
    def cut(t: String) = ev.filter(col("event_type") === t)
    val ska = cut("click").agg(Sketches.cmsSketch(col("user_id")).as("s"))
    val skb = cut("view").agg(Sketches.cmsSketch(col("user_id")).as("s2"))
    val est = ska.crossJoin(skb)
      .select(Sketches.cmsInnerProduct(col("s"), col("s2")))
      .head().getLong(0)
    val counts = cut("click").groupBy("user_id").count()
      .join(cut("view").groupBy("user_id").count()
        .withColumnRenamed("count", "c2"), "user_id")
    val exact = counts.agg(sum(col("count") * col("c2"))).head().getLong(0)
    val na = cut("click").count(); val nb = cut("view").count()
    assert(est >= exact, s"CMS inner product under-counted: $est < $exact")
    val slack = (math.E / 512 * na * nb).toLong
    assert(est <= exact + slack, s"est $est exceeds exact $exact + e/w slack $slack")
  }

  test("madOutliers flags exactly the planted anomalies, robustly to their size") {
    import spark.implicits._
    // 1000 well-behaved values in [0, 100) plus 5 corrupt ones far out;
    // a mean/σ screen would be dragged by the corruption — MAD is not
    val clean = (0 until 1000).map(i => ("a", (i % 100).toDouble + 0.5))
    val bad = (0 until 5).map(i => ("a", 10000.0 + i))
    val out = Sketches.madOutliers((clean ++ bad).toDF("k", "v"),
        col("k"), col("v"), lo = 0.0, hi = 512.0, bins = 64)
      .collect().head
    assert(out.getLong(1) === 1005L)
    assert(out.getLong(4) === 5L,
      s"expected exactly the 5 planted outliers, got ${out.getLong(4)}")
    // median estimate lands in the right bin neighborhood (step = 8)
    assert(math.abs(out.getDouble(2) - 50.0) <= 8.0)
  }

  test("hllIntersectEstimate: overlap ordering and 3-sigma bands in regime") {
    // the raw m=64 estimator needs ≳2.5·64 ≈ 160 distinct values per
    // side, and inclusion–exclusion compounds three ~13%-σ estimates,
    // so absolute error scales with the SET sizes (σ ≈ 850 here) —
    // assert 3σ bands plus the overlap ORDERING, not tight recovery
    def regsOf(df: org.apache.spark.sql.DataFrame, out: String) = df.agg(
      Sketches.hllRegistersPortable(
        xxhash64(col("k")).bitwiseAND(lit((1L << 30) - 1))).as(out))
    def inter(a: org.apache.spark.sql.DataFrame, b: org.apache.spark.sql.DataFrame) =
      regsOf(a, "ra").crossJoin(regsOf(b, "rb"))
        .select(Sketches.hllIntersectEstimate(col("ra"), col("rb")))
        .head().getDouble(0)
    val base = spark.range(0, 3000).toDF("k")
    val disjoint = inter(base, spark.range(5000, 8000).toDF("k"))   // true 0
    val heavy = inter(base, spark.range(500, 3500).toDF("k"))       // true 2500
    assert(math.abs(disjoint) < 2600, s"disjoint estimate $disjoint outside 3σ of 0")
    assert(math.abs(heavy - 2500.0) < 2600, s"heavy estimate $heavy outside 3σ of 2500")
    assert(heavy > disjoint + 1000,
      s"overlap ordering lost: heavy $heavy vs disjoint $disjoint")
    // union registers are an exact elementwise max: estimate of A∪B
    // from zip_with equals the estimate from the merge aggregate
    val b2 = spark.range(2000, 5000).toDF("k")
    val viaZip = regsOf(base, "ra").crossJoin(regsOf(b2, "rb"))
      .select(Sketches.hllEstimateFromRegisters(
        zip_with(col("ra"), col("rb"), (x, y) => greatest(x, y))))
      .head().getDouble(0)
    val viaMerge = regsOf(base, "r").select(col("r"))
      .unionAll(regsOf(b2, "r").select(col("r")))
      .agg(Sketches.hllMergeRegisters(col("r")).as("m"))
      .select(Sketches.hllEstimateFromRegisters(col("m")))
      .head().getDouble(0)
    assert(viaZip === viaMerge)
  }

  test("KMV: exact below k, duplicate-proof, ~1/sqrt(k) accurate, merge == direct") {
    import spark.implicits._
    // 40 distinct < k = 64 ⇒ the sketch IS the set, count exact;
    // duplicates occupy no slots
    val small = (1 to 400).map(i => (i % 40).toLong).toDF("x")
      .select(Sketches.uhash(col("x"), 100).as("h"))
    assert(small.agg(Sketches.kmvDistinct(col("h"), 64)).head().getDouble(0) === 40.0)
    // 5000 distinct at k=64: relative error concentrates ~1/sqrt(62)
    val big = (1L to 5000L).toDF("x")
      .select(Sketches.uhash(col("x"), 100).as("h")).repartition(7)
    val est = big.agg(Sketches.kmvDistinct(col("h"), 64)).head().getDouble(0)
    assert(math.abs(est - 5000.0) / 5000.0 < 0.4, s"estimate $est for 5000")
    // partition-independence (merge + serde through the shuffle)
    val est2 = big.repartition(31).agg(Sketches.kmvDistinct(col("h"), 64))
      .head().getDouble(0)
    assert(est2 === est)
    // value-state merge: union of per-group bottom-k, re-bottom-k,
    // estimate == direct (global bottom-k ⊆ union of group bottom-ks)
    val grouped = (1L to 5000L).map(i => (i % 7, i)).toDF("g", "x")
      .select(col("g"), Sketches.uhash(col("x"), 100).as("h"))
    val mergedEst = grouped.groupBy("g")
      .agg(Sketches.kmvValues(col("h"), 64).as("v"))
      .agg(flatten(collect_list(col("v"))).as("all"))
      .select(Sketches.kmvEstimateFromValues(
        slice(array_sort(array_distinct(col("all"))), 1, 64), 64))
      .head().getDouble(0)
    assert(mergedEst === est)
  }

  test("kmvOverlap: tracks planted union/intersection/Jaccard; exact below k") {
    import spark.implicits._
    def vals(xs: Range, k: Int) = xs.map(_.toLong).toDF("x")
      .select(Sketches.uhash(col("x"), 100).as("h"))
      .agg(Sketches.kmvValues(col("h"), k).as("v"))
    // A = 1..3000, B = 2000..5000: |A∪B| = 5000, |A∩B| = 1001, J ≈ 0.2
    val o = vals(1 to 3000, 64).crossJoin(
        vals(2000 to 5000, 64).withColumnRenamed("v", "w"))
      .select(Sketches.kmvOverlap(col("v"), col("w"), 64).as("o"))
      .select("o.est_union", "o.est_inter", "o.jaccard").head()
    assert(math.abs(o.getDouble(0) - 5000.0) / 5000.0 < 0.4, s"union ${o.getDouble(0)}")
    assert(o.getDouble(2) > 0.05 && o.getDouble(2) < 0.5, s"jaccard ${o.getDouble(2)}")
    assert(math.abs(o.getDouble(1) - o.getDouble(2) * o.getDouble(0)) < 1e-9)
    // below-k union: everything exact
    val e = vals(1 to 30, 64).crossJoin(
        vals(20 to 50, 64).withColumnRenamed("v", "w"))
      .select(Sketches.kmvOverlap(col("v"), col("w"), 64).as("o"))
      .select("o.est_union", "o.est_inter", "o.jaccard").head()
    assert(e.getDouble(0) === 50.0)
    assert(e.getDouble(1) === 11.0)
    assert(e.getDouble(2) === 11.0 / 50.0)
  }
}
