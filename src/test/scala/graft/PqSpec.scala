package graft

import graft.ext.Similarity
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Product-quantization pipeline on the real embeddings fixture:
  * codebook/codes invariants, partition-order independence, and ADC
  * retrieval quality vs the exact scan. The gate (q_sim_pq) then
  * value-checks the same pipeline bit-for-bit against DuckDB.
  */
class PqSpec extends AnyFunSuite with SharedSpark {

  private val dim = 64
  private val m = 4
  private val kSub = 16

  private lazy val emb = graft.sources.Tables(spark, sf0001).table("embeddings")
  private lazy val corpus = emb.filter(col("vec_id") =!= 0)
  private lazy val query = emb.filter(col("vec_id") === 0)

  test("codebook: m subspaces, ≤ kPerSub centroids each, subDim-sized centroids") {
    val cb = Similarity.pqCodebook(corpus, dim, m, kSub, portable = true, lloydIters = 1)
      .collect().map(r => (r.getInt(0), r.getLong(1), r.getSeq[Float](2)))
    assert(cb.map(_._1).toSet === (0 until m).toSet)
    cb.groupBy(_._1).foreach { case (s, cs) =>
      assert(cs.length <= kSub, s"subspace $s has ${cs.length} centroids")
      assert(cs.forall(_._3.length === dim / m), s"subspace $s centroid dims")
    }
  }

  test("codes: every vector gets m codes drawn from its subspace's codebook") {
    val cb = Similarity.pqCodebook(corpus, dim, m, kSub, portable = true, lloydIters = 1)
    val valid = cb.collect().map(r => r.getInt(0) -> r.getLong(1))
      .groupBy(_._1).view.mapValues(_.map(_._2).toSet).toMap
    val codes = Similarity.pqEncode(corpus, cb, dim, m)
      .collect().map(r => r.getLong(0) -> r.getSeq[Long](1))
    assert(codes.length === corpus.count())
    codes.foreach { case (id, cs) =>
      assert(cs.length === m, s"vec $id code width")
      cs.zipWithIndex.foreach { case (c, s) =>
        assert(valid(s).contains(c), s"vec $id sub $s code $c not in codebook")
      }
    }
    // partition-order independence: same codes after a repartition
    val again = Similarity.pqEncode(corpus.repartition(7), cb, dim, m)
      .collect().map(r => r.getLong(0) -> r.getSeq[Long](1)).toMap
    assert(codes.toMap === again)
  }

  private def exactL2Top(k: Int): Set[Long] = {
    val d2 = aggregate(
      zip_with(col("embedding"), col("q_emb"),
        (x, y) => (x.cast("double") - y.cast("double")) * (x.cast("double") - y.cast("double"))),
      lit(0.0), (acc, v) => acc + v)
    corpus.crossJoin(broadcast(query.select(col("embedding").as("q_emb"))))
      .select(col("vec_id"), d2.as("d"))
      .orderBy(col("d"), col("vec_id")).limit(k)
      .collect().map(_.getLong(0)).toSet
  }

  test("ADC shortlist covers the exact L2 top-10 well enough to rerank from") {
    // 2-byte codes (m = 4) are deliberately coarse: the retrieval
    // contract is SHORTLIST recall, not top-k recall. Measured on the
    // fixed corpus: 6/10 of the exact top-10 inside the ADC top-100
    // (vs ~2 for a random 100-cut of 499).
    val short = Similarity.pqTopK(corpus, query, k = 100, dim, m, kSub,
      portable = true, lloydIters = 1)
      .collect().map(_.getLong(0)).toSet
    val hits = (short & exactL2Top(10)).size
    assert(hits >= 5, s"shortlist hits = $hits/10")
  }

  test("batch ADC for a single query equals the single-query path") {
    val single = Similarity.pqTopK(corpus, query, k = 10, dim, m, kSub,
      portable = true, lloydIters = 1)
      .collect().map(r => (r.getLong(0), r.getDouble(1))).toSeq
    val batch = Similarity.pqTopKBatch(corpus, query, k = 10, dim, m, kSub,
      portable = true, lloydIters = 1)
      .collect().map(r => (r.getLong(1), r.getDouble(2))).toSeq
    assert(batch.sortBy(_._1) === single.sortBy(_._1))
  }

  test("persisted index: queries served from disk equal the in-session build") {
    val dir = graft.Scratch.tempDir("graft_pq_index_")
    Similarity.saveIndex(corpus, dir, dim, m, kSub, portable = true)
    val fromDisk = Similarity.queryIndex(spark, dir, query, k = 10, dim, m)
      .collect().map(r => (r.getLong(0), r.getDouble(1))).toSeq
    val inSession = Similarity.pqTopK(corpus, query, k = 10, dim, m, kSub,
      portable = true, lloydIters = 1)
      .collect().map(r => (r.getLong(0), r.getDouble(1))).toSeq
    assert(fromDisk === inSession)
    // with a literal query vector, the plan over the stored index
    // never reads the embeddings table at all
    import spark.implicits._
    val qLit = query.select("vec_id", "embedding").collect().map(r =>
        (r.getLong(0), r.getSeq[Float](1).toArray)).toSeq
      .toDF("vec_id", "embedding")
      .select(col("vec_id"), col("embedding").cast("array<float>").as("embedding"))
    val plan = Similarity.queryIndex(spark, dir, qLit, k = 10, dim, m)
      .queryExecution.executedPlan.toString
    assert(!plan.contains("embeddings.parquet"),
      s"index queries must not touch corpus embeddings:\n$plan")
  }

  test("IVF-PQ: pruning never changes a survivor's ADC score") {
    val ivfpq = Similarity.pqIvfTopK(corpus, query, k = 10, dim, m, kSub,
      nCentroids = 8, nProbe = 2, portable = true,
      lloydIters = 1, ivfLloydIters = 1)
      .collect().map(r => r.getLong(0) -> r.getDouble(1)).toMap
    assert(ivfpq.size === 10)
    // the unpruned ADC ranking over the whole corpus: every IVF-PQ
    // survivor must carry exactly the score the full scan gives it
    val full = Similarity.pqTopK(corpus, query, k = 1000, dim, m, kSub,
      portable = true, lloydIters = 1)
      .collect().map(r => r.getLong(0) -> r.getDouble(1)).toMap
    ivfpq.foreach { case (id, d) =>
      assert(full(id) === d, s"vec $id: pruned=$d full=${full(id)}")
    }
  }

  test("rerank with finer codes (m = 8) recovers most of the exact top-10") {
    // 4-byte codes + exact re-rank of a 50-shortlist: the production
    // two-stage shape. Deterministic measurement: 7/10.
    val got = Similarity.pqTopKRerank(corpus, query, k = 10, shortlist = 50,
      dim, m = 8, kPerSub = kSub, portable = true, lloydIters = 1)
      .collect().map(_.getLong(0)).toSet
    val recall = (got & exactL2Top(10)).size / 10.0
    assert(recall >= 0.6, s"reranked recall@10 = $recall")
    // reranked distances are the EXACT metric: monotone non-decreasing
    val dists = Similarity.pqTopKRerank(corpus, query, k = 10, shortlist = 50,
      dim, m = 8, kPerSub = kSub, portable = true, lloydIters = 1)
      .collect().map(_.getDouble(1))
    assert(dists.sameElements(dists.sorted), s"dists not sorted: ${dists.mkString(",")}")
  }
}
