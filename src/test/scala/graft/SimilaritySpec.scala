package graft

import graft.ext.Similarity
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

class SimilaritySpec extends AnyFunSuite with SharedSpark {

  private lazy val emb = Tables0.embeddings

  private object Tables0 {
    lazy val embeddings = graft.sources.Tables(spark, sf0001).table("embeddings")
  }

  test("cosine matches a driver-side computation on real vectors") {
    val two = emb.filter(col("vec_id").isin(0, 1)).collect()
      .map(r => r.getLong(0) -> r.getSeq[Float](1).map(_.toDouble).toArray).toMap
    val a = two(0L); val b = two(1L)
    def dot(x: Array[Double], y: Array[Double]) = x.zip(y).map(p => p._1 * p._2).sum
    val expected = dot(a, b) / (math.sqrt(dot(a, a)) * math.sqrt(dot(b, b)))
    val got = emb.filter(col("vec_id") === 0).select(col("embedding").as("e1"))
      .crossJoin(emb.filter(col("vec_id") === 1).select(col("embedding").as("e2")))
      .select(Similarity.cosine(col("e1"), col("e2"))).head().getDouble(0)
    assert(math.abs(got - expected) < 1e-12)
  }

  test("brute-force topK is ordered and excludes nothing it shouldn't") {
    val q = emb.filter(col("vec_id") === 0)
    val top = Similarity.topK(emb.filter(col("vec_id") =!= 0), q, k = 10).collect()
    assert(top.length === 10)
    val cosines = top.map(_.getDouble(1)).toSeq
    assert(cosines === cosines.sorted.reverse, "descending by cosine")
    assert(top.forall(_.getLong(0) != 0L))
  }

  test("LSH ANN returns a subset of the query bucket, ranked by cosine; recall > 0") {
    val q = emb.filter(col("vec_id") === 0)
    val corpus = emb.filter(col("vec_id") =!= 0)
    val ann = Similarity.annLsh(corpus, q, k = 10, bits = 4).collect()
    assert(ann.nonEmpty, "4-bit buckets on 500 vectors are non-empty w.h.p.")
    val annCos = ann.map(_.getDouble(1)).toSeq
    assert(annCos === annCos.sorted.reverse)
    // recall vs brute force (4 bits → 16 buckets → ~31 candidates;
    // random-hyperplane LSH concentrates near neighbours in-bucket)
    val brute = Similarity.topK(corpus, q, k = 10).collect().map(_.getLong(0)).toSet
    val recall = ann.map(_.getLong(0)).count(brute) / 10.0
    assert(recall > 0.0, s"ANN should recover some true neighbours, got $recall")
  }

  test("annJl: full-corpus pool equals exact topK; default pool has real recall with exact cosines") {
    val q = emb.filter(col("vec_id") === 0)
    val corpus = emb.filter(col("vec_id") =!= 0)
    val brute = Similarity.topK(corpus, q, k = 10).collect()
      .map(r => r.getLong(0) -> r.getDouble(1)).toMap
    // pool ≥ corpus ⇒ the re-rank sees everything ⇒ exact equality
    val full = Similarity.annJl(corpus, q, k = 10, poolFactor = 60).collect()
      .map(r => r.getLong(0) -> r.getDouble(1)).toMap
    assert(full === brute)
    // default pool: approximate candidate set, but every returned
    // cosine is the exact full-vector value
    val ann = Similarity.annJl(corpus, q, k = 10).collect()
      .map(r => r.getLong(0) -> r.getDouble(1))
    assert(ann.length === 10)
    val cosines = ann.map(_._2).toSeq
    assert(cosines === cosines.sorted.reverse)
    val hits = ann.count { case (id, c) => brute.get(id).contains(c) }
    assert(hits > 0, "JL pool should recover some true neighbours with exact scores")
  }

  test("annHamming: corpus-covering pool equals exact topK; sign sketches rank sensibly") {
    val q = emb.filter(col("vec_id") === 0)
    val corpus = emb.filter(col("vec_id") =!= 0)
    val brute = Similarity.topK(corpus, q, k = 10).collect()
      .map(r => r.getLong(0) -> r.getDouble(1)).toMap
    val full = Similarity.annHamming(corpus, q, k = 10, poolFactor = 60).collect()
      .map(r => r.getLong(0) -> r.getDouble(1)).toMap
    assert(full === brute)
    val ann = Similarity.annHamming(corpus, q, k = 10).collect()
      .map(r => r.getLong(0) -> r.getDouble(1))
    assert(ann.length === 10)
    val hits = ann.count { case (id, c) => brute.get(id).contains(c) }
    assert(hits > 0, "Hamming pool should recover some true neighbours with exact scores")
  }

  test("dimPrincipal recovers a planted dominant direction; sign canonical; L∞ = 1") {
    import spark.implicits._
    val dim = 16
    val rnd = new scala.util.Random(42)
    val dRaw = Array.tabulate(dim)(i => math.sin(i * 1.7) + 0.3)
    val dNorm = math.sqrt(dRaw.map(x => x * x).sum)
    val dvec = dRaw.map(_ / dNorm)
    // noise σ≈0.3 + a planted direction with σ≈3 ⇒ big spectral gap,
    // so 20 fixed-point rounds must align with the planted axis
    val data = (0 until 300).map { _ =>
      val scale = rnd.nextGaussian() * 3.0
      Tuple1(Array.tabulate(dim)(i =>
        (rnd.nextGaussian() * 0.3 + scale * dvec(i)).toFloat))
    }.toDF("embedding")
    val got = Similarity.dimPrincipal(data, dim = dim, iters = 20)
      .orderBy("pos").collect().map(_.getLong(1).toDouble / 1048576.0)
    assert(got.map(math.abs).max === 1.0, "L∞-normalized to the 2^20 grid")
    assert(got.sum >= 0.0, "sign canonicalized to non-negative component sum")
    val gNorm = math.sqrt(got.map(x => x * x).sum)
    val cos = math.abs(got.lazyZip(dvec).map(_ * _).sum / gNorm)
    assert(cos > 0.98, s"|cos(got, planted)| = $cos")
    // an empty corpus fails loudly, not with an index error
    val err = intercept[IllegalArgumentException] {
      Similarity.dimPrincipal(data.filter(lit(false)), dim = dim)
    }
    assert(err.getMessage.contains("no rows"))
  }

  test("dimPrincipalK: deflation recovers a second planted direction; PC1 == dimPrincipal") {
    import spark.implicits._
    val dim = 16
    val rnd = new scala.util.Random(99)
    def unit(raw: Array[Double]): Array[Double] = {
      val n = math.sqrt(raw.map(x => x * x).sum); raw.map(_ / n)
    }
    val d1 = unit(Array.tabulate(dim)(i => math.sin(i * 1.7) + 0.3))
    // orthogonalize the second planted direction against the first
    val raw2 = Array.tabulate(dim)(i => math.cos(i * 0.9) - 0.2)
    val proj = raw2.lazyZip(d1).map(_ * _).sum
    val d2 = unit(raw2.lazyZip(d1).map((r, a) => r - proj * a).toArray)
    val data = (0 until 400).map { _ =>
      val s1 = rnd.nextGaussian() * 4.0
      val s2 = rnd.nextGaussian() * 2.0
      Tuple1(Array.tabulate(dim)(i =>
        (rnd.nextGaussian() * 0.2 + s1 * d1(i) + s2 * d2(i)).toFloat))
    }.toDF("embedding")
    val got = Similarity.dimPrincipalK(data, dim = dim, iters = 25, components = 2)
      .orderBy("component", "pos").collect()
      .map(r => (r.getInt(0), r.getLong(2).toDouble / 1048576.0))
    val v1 = got.filter(_._1 == 1).map(_._2)
    val v2 = got.filter(_._1 == 2).map(_._2)
    def cosTo(v: Array[Double], d: Array[Double]): Double = {
      val n = math.sqrt(v.map(x => x * x).sum)
      math.abs(v.lazyZip(d).map(_ * _).sum / n)
    }
    assert(cosTo(v1, d1) > 0.97, s"PC1 vs planted-1: ${cosTo(v1, d1)}")
    assert(cosTo(v2, d2) > 0.95, s"PC2 vs planted-2: ${cosTo(v2, d2)}")
    val n1 = math.sqrt(v1.map(x => x * x).sum)
    val n2 = math.sqrt(v2.map(x => x * x).sum)
    val ortho = math.abs(v1.lazyZip(v2).map(_ * _).sum / (n1 * n2))
    assert(ortho < 0.2, s"components should be near-orthogonal, cos = $ortho")
    // the leading component is EXACTLY dimPrincipal's
    val single = Similarity.dimPrincipal(data, dim = dim, iters = 25)
      .orderBy("pos").collect().map(_.getLong(1).toDouble / 1048576.0)
    assert(v1.toSeq === single.toSeq)
  }

  test("multi-probe LSH recall ≥ single-probe recall, both ⊆ brute-force ranking") {
    val q = emb.filter(col("vec_id") === 0)
    val corpus = emb.filter(col("vec_id") =!= 0)
    val single = Similarity.annLsh(corpus, q, k = 10, bits = 8).collect()
    val multi = Similarity.annLsh(corpus, q, k = 10, bits = 8, multiProbe = true).collect()
    // probe set includes the base bucket → candidate superset → the
    // returned top-k can only get better (more results or ≥ cosines)
    assert(multi.length >= single.length)
    val sumS = single.map(_.getDouble(1)).sum
    val sumM = multi.take(single.length).map(_.getDouble(1)).sum
    assert(sumM >= sumS - 1e-9, s"multi-probe quality $sumM < single $sumS")
    assert(multi.nonEmpty)
  }

  test("multi-probe recall delta: strictly more true neighbours than single-probe over 10 queries") {
    // the aggregate recall-delta assertion behind the gate's
    // q_sim_ann_lsh_mp entry: at 8 bits (256 buckets over 500
    // vectors) single-probe recall is starved; probing the 9-bucket
    // Hamming-1 ball recovers a strictly larger share of the
    // brute-force top-10 (measured 2 vs 17 hits over query ids 0-9 —
    // deterministic corpus + deterministic planes, so a stable gap)
    var singleHits = 0; var multiHits = 0
    for (qid <- 0L until 10L) {
      val q = emb.filter(col("vec_id") === qid)
      val corpus = emb.filter(col("vec_id") =!= qid)
      val brute = Similarity.topK(corpus, q, k = 10).collect().map(_.getLong(0)).toSet
      singleHits += Similarity.annLsh(corpus, q, k = 10, bits = 8)
        .collect().map(_.getLong(0)).count(brute)
      multiHits += Similarity.annLsh(corpus, q, k = 10, bits = 8, multiProbe = true)
        .collect().map(_.getLong(0)).count(brute)
    }
    assert(multiHits > singleHits,
      s"multi-probe should strictly improve aggregate recall: $singleHits vs $multiHits")
    assert(multiHits >= singleHits + 5,
      s"expected a decisive recall gap, got $singleHits -> $multiHits")
  }

  test("batch ANN with a single query reproduces the single-query ANN exactly") {
    val q = emb.filter(col("vec_id") === 0)
    val corpus = emb.filter(col("vec_id") =!= 0)
    val single = Similarity.annLsh(corpus, q, k = 10, bits = 6).collect()
      .map(r => (r.getLong(0), r.getDouble(1))).toSet
    val batch = Similarity.annLshBatch(corpus, q, k = 10, bits = 6).collect()
      .map(r => (r.getLong(1), r.getDouble(2))).toSet
    assert(batch === single, "the amortized batch plan must not change results")
  }

  test("lshPairs ⊆ cosinePairs (candidate pruning never invents pairs)") {
    val small = emb.limit(120)
    val brute = Similarity.cosinePairs(small, threshold = 0.2).collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    val lsh = Similarity.lshPairs(small, threshold = 0.2, bits = 4).collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(lsh.subsetOf(brute))
  }

  test("multi-table portable lshPairs ⊆ cosinePairs with identical verified cosines") {
    val brute = Similarity.cosinePairs(emb, threshold = 0.35).collect()
      .map(r => (r.getLong(0), r.getLong(1)) -> r.getDouble(2)).toMap
    val lsh = Similarity.lshPairs(emb, threshold = 0.35, bits = 8, tables = 8,
      portable = true).collect()
      .map(r => (r.getLong(0), r.getLong(1)) -> r.getDouble(2))
    assert(lsh.nonEmpty, "8 tables x 8 bits over 500 vectors must surface some pairs")
    lsh.foreach { case (pair, cos) =>
      assert(brute.contains(pair), s"LSH invented pair $pair")
      assert(math.abs(brute(pair) - cos) < 1e-9, s"cosine mismatch on $pair")
    }
  }

  test("lshPairs recall ≥ 0.95 on a planted near-dup corpus (the operating regime)") {
    // Random low-threshold pairs are LSH's worst case; REAL near-dup
    // corpora have cosine ≥ 0.9 pairs, where 8x8-bit tables recover
    // essentially everything: p = 1 - acos(0.9)/pi = 0.856,
    // 1 - (1 - p^8)^8 = 0.965. Build such a corpus: 60 base vectors,
    // each with a planted near-dup (tiny deterministic perturbation).
    import spark.implicits._
    val rnd = new scala.util.Random(7)
    val base = (0 until 60).map(i => i.toLong -> Array.fill(64)(rnd.nextGaussian().toFloat))
    val dups = base.map { case (i, v) =>
      (i + 1000L, v.map(x => x + 0.08f * rnd.nextGaussian().toFloat))
    }
    val corpus = (base ++ dups).toDF("vec_id", "embedding")
    val truePairs = Similarity.cosinePairs(corpus, threshold = 0.9).collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(truePairs.size >= 50, s"corpus should contain >= 50 planted pairs, got ${truePairs.size}")
    val found = Similarity.lshPairs(corpus, threshold = 0.9, bits = 8, tables = 8,
      portable = true).collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(found.subsetOf(truePairs))
    val recall = found.size.toDouble / truePairs.size
    assert(recall >= 0.95, s"recall $recall below 0.95 (${found.size}/${truePairs.size})")
  }

  test("int8 quantization round-trips within half a quantization step") {
    val rows = emb.limit(100)
      .withColumn("scale", Similarity.int8Scale(col("embedding")))
      .select(col("embedding"), col("scale"),
        Similarity.quantizeInt8(col("embedding"), col("scale")).as("q"))
      .collect()
    rows.foreach { r =>
      val v = r.getSeq[Float](0)
      val scale = r.getDouble(1)
      val q = r.getSeq[Int](2)
      assert(q.forall(x => x >= -127 && x <= 127))
      if (scale > 0) {
        val step = 1.0 / scale
        v.zip(q).foreach { case (orig, quant) =>
          assert(math.abs(orig - quant / scale) <= step / 2 + 1e-9,
            s"dequantized $quant/$scale too far from $orig")
        }
      }
    }
  }

  test("annIvfBatch with a single query equals annIvf (shared index, same probes)") {
    val corpus = emb.filter(col("vec_id") =!= 0)
    val q = emb.filter(col("vec_id") === 0)
    val single = Similarity.annIvf(corpus, q, k = 10, portable = true, lloydIters = 1)
      .collect().map(r => (r.getLong(0), r.getDouble(1))).toSeq
    val batch = Similarity.annIvfBatch(corpus, q, k = 10, portable = true, lloydIters = 1)
      .orderBy(desc("cosine"), col("vec_id"))
      .select("vec_id", "cosine")
      .collect().map(r => (r.getLong(0), r.getDouble(1))).toSeq
    assert(batch === single)
  }

  test("bucket assignment is deterministic across partitioning") {
    val a = emb.limit(50).select(col("vec_id"), Similarity.lshBucket(col("embedding"), 8).as("b"))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    val b = emb.limit(50).repartition(7)
      .select(col("vec_id"), Similarity.lshBucket(col("embedding"), 8).as("b"))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(a === b)
  }

  test("dimStats wide=true stays exact where the BIGINT sum_q2 would overflow") {
    // 9M rows of 1.0f in one dimension: q = 2^20, q² = 2^40, and
    // 9e6·2^40 ≈ 9.9e18 exceeds Long.MaxValue ≈ 9.22e18 — past the
    // documented ~2^22-rows/dim bound of the narrow path
    val overflowScale = spark.range(9000000L).select(array(lit(1.0f)).as("embedding"))
    val row = Similarity.dimStats(overflowScale, wide = true).collect().head
    assert(row.getLong(1) === 9000000L)
    val expectedQ2 = BigDecimal(1099511627776L) * BigDecimal(9000000L) // (2^40)·n
    assert(BigDecimal(row.getDecimal(3)) === expectedQ2, "sum_q2 exact in DECIMAL(38,0)")
    assert(row.getDouble(4) === 1.0, "mean of constant-1.0 inputs")
    assert(row.getDouble(5) === 0.0, "std of constant inputs")
    // the narrow default fails loudly (ANSI long-sum overflow) instead
    // of silently wrapping — the reason `wide` exists
    intercept[Exception] {
      Similarity.dimStats(overflowScale).collect()
    }
  }

  test("mmrSelect: first pick is the top hit; lambda trades relevance for diversity") {
    import spark.implicits._
    // query along e1; the top hit sits off-axis, its near-copy is the
    // second-most relevant, and an equally-far vector sits on the
    // OTHER side of the query (high relevance, low sim to the top
    // hit) — the geometry where redundancy actually costs
    def v(x: Double, y: Double) = Array(x.toFloat, y.toFloat)
    val corpus = Seq((1L, v(0.9, 0.436)), (2L, v(0.88, 0.47)), (3L, v(0.85, -0.53)))
      .toDF("vec_id", "embedding")
    val query = Seq((0L, v(1.0, 0.0))).toDF("vec_id", "embedding")
    val picks = Similarity.mmrSelect(corpus, query, k = 2)
      .orderBy("step").collect().map(_.getLong(0)).toSeq
    // plain top-2 would be (1, 2); MMR at λ=0.5 swaps the near-copy
    // for the diverse candidate
    assert(picks.head === 1L, "first pick must be the plain top hit")
    assert(picks(1) === 3L, s"second pick should be the diverse vector, got $picks")
    // λ = 0 (ppm 0) degrades to plain relevance ranking
    val plain = Similarity.mmrSelect(corpus, query, k = 2, lambdaPpm = 0L)
      .orderBy("step").collect().map(_.getLong(0)).toSeq
    assert(plain === Seq(1L, 2L))
  }

  test("dimCovariance: diagonal matches dimStats variance, matrix symmetric") {
    val cov = Similarity.dimCovariance(emb)
      .collect().map(r => (r.getLong(0), r.getLong(1)) -> r.getDouble(2)).toMap
    assert(cov.size === 64 * 64)
    // symmetry is structural (same products), so exact equality holds
    for (i <- 0L until 64L; j <- 0L until i)
      assert(cov((i, j)) === cov((j, i)), s"asymmetry at ($i,$j)")
    // diagonal ≈ dimStats std² (different grids: 2^-10 vs 2^-20)
    val stds = Similarity.dimStats(emb)
      .collect().map(r => r.getLong(0) -> r.getDouble(5)).toMap
    for (i <- 0L until 64L) {
      val v = stds(i) * stds(i)
      assert(math.abs(cov((i, i)) - v) < 1e-3,
        s"diag($i) ${cov((i, i))} vs variance $v")
    }
  }

  test("mmrSelectPooled: agrees with mmrSelect, and with a full-corpus pool is identical") {
    // same planted fixture as the mmrSelect spec: doc 2 is a
    // near-copy of top hit 1, doc 3 diverse — the pooled rerank must
    // make the same swap
    import spark.implicits._
    val corpus = Seq(
      (1L, Array(1.0f, 0.0f, 0.0f)),
      (2L, Array(0.999f, 0.045f, 0.0f)),
      (3L, Array(0.6f, 0.8f, 0.0f))
    ).toDF("vec_id", "embedding")
    val query = Seq((0L, Array(1.0f, 0.01f, 0.0f))).toDF("vec_id", "embedding")
    val pooled = Similarity.mmrSelectPooled(corpus, query, k = 2, poolFactor = 2)
      .orderBy("step").collect().map(_.getLong(0)).toSeq
    assert(pooled === Seq(1L, 3L), "pooled MMR must swap the near-copy for the diverse doc")
    // full-corpus pool ⇒ bit-identical trajectory to the k-scan form,
    // on the real embeddings table (exercises the float→double mirror)
    val big = emb.filter(col("vec_id") =!= 0)
    val qv = emb.filter(col("vec_id") === 0)
    val kScan = Similarity.mmrSelect(big, qv, k = 5)
      .orderBy("step").collect().map(_.getLong(0)).toSeq
    val fullPool = Similarity.mmrSelectPooled(big, qv, k = 5, poolFactor = 500)
      .orderBy("step").collect().map(_.getLong(0)).toSeq
    assert(fullPool === kScan,
      s"full-pool trajectory $fullPool must equal k-scan trajectory $kScan")
  }

  test("dimCovariance: signed-zero and .5-micro-tie cells round engine-portably") {
    // Crafted 2-row, 3-dim corpus whose difference vector in 2^-10
    // q-units is d = (1, 32768, -1); with n = 2 every covariance
    // numerator is d_i·d_j and den = n²·2²⁰ = 4194304, so the cells
    // hit the exact edges the integer micro-unit rounding exists for:
    //   (0,1): num =  32768 → cov =  0.0078125, an EXACT .5-micro tie
    //   (1,2): num = -32768 → cov = -0.0078125, the NEGATIVE tie
    //   (0,2): num = -1     → cov ≈ -2.4e-7, tiny negative → zero
    // Half-away-from-zero must take the ties to ±0.007813, and the
    // tiny negative must land on POSITIVE zero (bit pattern 0L): the
    // sign is reapplied on the integer micro value, which has no
    // signed zero — a revert that rounds in double space and then
    // negates (when(num<0, -round(...))) emits -0.0 here and fails.
    import spark.implicits._
    val corpus = Seq(
      (1L, Array(1.0 / 1024, 32.0, 0.0).map(_.toFloat)),
      (2L, Array(0.0, 0.0, 1.0 / 1024).map(_.toFloat))
    ).toDF("vec_id", "embedding")
    val cov = Similarity.dimCovariance(corpus, dim = 3)
      .collect().map(r => (r.getLong(0), r.getLong(1)) -> r.getDouble(2)).toMap
    assert(cov.size === 9)
    assert(cov((0L, 1L)) === 0.007813, "positive .5-micro tie must round away from zero")
    assert(cov((1L, 2L)) === -0.007813, "negative .5-micro tie must round away from zero")
    assert(java.lang.Double.doubleToRawLongBits(cov((0L, 2L))) === 0L,
      s"tiny negative cell must be +0.0, got bits ${java.lang.Double.doubleToRawLongBits(cov((0L, 2L)))}")
    assert(java.lang.Double.doubleToRawLongBits(cov((0L, 0L))) === 0L)
    // sanity: a clean cell is exact (num = 32768² = 2³⁰, den = 2²²)
    assert(cov((1L, 1L)) === 256.0)
    // symmetry across the crafted edges too
    for (i <- 0L until 3L; j <- 0L until i)
      assert(cov((i, j)) === cov((j, i)))
  }

  test("semanticDecontaminate: drops exactly the above-threshold corpus vectors") {
    val corpus = emb.filter(col("vec_id") >= 10)
    val evals = emb.filter(col("vec_id") < 10)
    val kept = Similarity.semanticDecontaminate(corpus, evals, threshold = 0.35)
      .select("vec_id").collect().map(_.getLong(0)).toSet
    // brute-force max cosine per corpus vector (small frames)
    val expect = corpus.alias("c").crossJoin(evals.alias("e"))
      .select(col("c.vec_id").as("cid"),
        Similarity.cosine(col("c.embedding"), col("e.embedding")).as("cos"))
      .groupBy("cid").agg(max("cos").as("m"))
      .filter(col("m") < 0.35)
      .collect().map(_.getLong(0)).toSet
    assert(kept === expect)
    // the survivors frame keeps the corpus schema intact
    val cols = Similarity.semanticDecontaminate(corpus, evals, 0.35).columns.toSeq
    assert(cols === corpus.columns.toSeq)
    // an EMPTY eval set decontaminates NOTHING — the whole corpus
    // survives (the shingle twin's hit_shingles = 0 behavior), never
    // the silent full drop an inner join on a null nearest id gives
    val keptAll = Similarity.semanticDecontaminate(corpus,
      evals.where(lit(false)), threshold = 0.35)
    assert(keptAll.count() === corpus.count(),
      "empty eval set must keep the whole corpus")
  }

  test("knnGraph: no self edges, at most k neighbors, symmetric candidate pool") {
    val g = Similarity.knnGraph(emb, k = 3, bits = 6, portable = true)
      .collect().map(r => (r.getLong(0), r.getLong(1)))
    assert(g.nonEmpty)
    assert(g.forall { case (q, n) => q != n }, "self edge in the kNN graph")
    assert(g.groupBy(_._1).values.forall(_.length <= 3))
    // the graph is annLshBatch with corpus = queries, self excluded;
    // a self match occupies one batch top-k slot, so the k=4 batch
    // minus self must cover every k=3 graph edge
    val batch = Similarity.annLshBatch(emb, emb, k = 4, bits = 6, portable = true)
      .filter(col("q_id") =!= col("vec_id"))
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(g.toSet.subsetOf(batch),
      "graph edge absent from the self-filtered batch top-4")
  }

  test("semdedupKeep: min-id survives, survivors have no close smaller neighbor") {
    val kept = Similarity.semdedupKeep(emb, threshold = 0.35, bits = 6,
      portable = true).select("vec_id").collect().map(_.getLong(0)).toSet
    val all = emb.select("vec_id").collect().map(_.getLong(0)).toSet
    assert(kept.nonEmpty && kept.subsetOf(all))
    assert(kept.contains(all.min), "the global min id can never be dropped")
    // recompute the drop condition independently from the kNN graph at
    // the same bucketing: any kept vector with a >=0.35 smaller-id
    // same-bucket neighbor is a bug
    val close = Similarity.knnGraph(emb, k = 500, bits = 6, portable = true)
      .filter(col("cosine") >= 0.35 && col("vec_id") < col("q_id"))
      .select("q_id").collect().map(_.getLong(0)).toSet
    assert(kept.intersect(close).isEmpty,
      s"kept vectors with a close smaller neighbor: ${kept.intersect(close).take(5)}")
    assert(all.diff(close) === kept, "dropped more than the close set")
  }

  test("pcaProject: equals a driver fold over dimPrincipalK loadings; layout-proof") {
    import org.apache.spark.sql.functions._
    val lv = graft.ext.Similarity.dimPrincipalK(emb, components = 2).collect()
      .groupBy(_.getInt(0))
      .map { case (c, rs) => c -> rs.sortBy(_.getInt(1)).map(_.getLong(2)) }
    val got = graft.ext.Similarity.pcaProject(emb, components = 2).collect()
      .map(r => r.getLong(0) -> ((r.getDouble(1), r.getDouble(2)))).toMap
    val vecs = emb.select(col("vec_id"), col("embedding")).collect()
      .map(r => r.getLong(0) -> r.getSeq[Float](1).toArray).toMap
    // same left-to-right fold on the driver; coordinates are along
    // the UNIT principal axes — divided by the loading's L2 norm
    def proj(x: Array[Float], v: Array[Long]): Double = {
      var acc = 0.0
      var i = 0
      while (i < v.length) { acc += x(i).toDouble * v(i).toDouble; i += 1 }
      val n = math.sqrt(v.map(w => w.toDouble * w.toDouble).sum)
      BigDecimal(acc / (if (n == 0.0) 1.0 else n))
        .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
    }
    vecs.foreach { case (id, x) =>
      assert(got(id) === ((proj(x, lv(1)), proj(x, lv(2)))), s"vec $id")
    }
    // physical layout must not matter
    val again = graft.ext.Similarity.pcaProject(emb.repartition(7), components = 2)
      .collect().map(r => r.getLong(0) -> ((r.getDouble(1), r.getDouble(2)))).toMap
    assert(again === got)
  }
}
