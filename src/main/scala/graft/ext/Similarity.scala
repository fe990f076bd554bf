package graft.ext

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Similarity search over embedding columns (`array<float>`).
  *
  * Baseline: brute-force cosine top-k — a single broadcast of the
  * query vector, one pass over the corpus, TakeOrderedAndProject for
  * the top-k (no full sort). Scale path: random-hyperplane LSH —
  * a 16-bit deterministic bucket signature per vector; candidate
  * generation becomes an equi-join on the bucket id, so the all-pairs
  * cost is confined to single buckets (~n/2^16 of the corpus each).
  */
object Similarity {

  /** Elementwise dot product as a sequential double fold (index order,
    * deterministic and oracle-reproducible). */
  def dot(a: Column, b: Column): Column =
    aggregate(zip_with(a, b, (x, y) => x.cast("double") * y.cast("double")),
      lit(0.0), (acc, v) => acc + v)

  def norm(a: Column): Column = sqrt(dot(a, a))

  def cosine(a: Column, b: Column): Column = dot(a, b) / (norm(a) * norm(b))

  /** Cosine for the hot paths: the fused codegen'd Catalyst
    * expression ([[graft.functions.CosineSimilarity]]) — identical
    * semantics to [[cosine]] (index-order double accumulation), one
    * tight loop instead of interpreted lambdas. */
  private def fastCos(a: Column, b: Column): Column =
    graft.functions.VectorExpressions.cosineNative(a, b)

  /** Brute-force cosine top-k to one query vector.
    * @param queryVec single-row DataFrame with column `embedding` —
    *   broadcast, so the corpus is scanned exactly once. */
  def topK(corpus: DataFrame, queryVec: DataFrame, k: Int,
           idCol: String = "vec_id"): DataFrame = {
    val q = broadcast(queryVec.select(col("embedding").as("q_emb")))
    val cos = fastCos(col("embedding"), col("q_emb"))
    corpus.crossJoin(q)
      .select(col(idCol), cos.as("cos_raw"))
      .orderBy(desc("cos_raw"), col(idCol))
      .limit(k)
      .select(col(idCol), round(col("cos_raw"), 6).as("cosine"))
  }

  /** ANN via Johnson–Lindenstrauss compression + exact re-rank: score
    * every vector by cosine in the `outDim`-dimensional ±1-projected
    * space ([[graft.functions.JlProject]] — exact fixed-point
    * integers, so the candidate ORDER is engine-reproducible), keep
    * the top `k·poolFactor` by `TakeOrderedAndProject`, then re-rank
    * those few with the full-precision codegen'd cosine. The
    * projection-space scan does outDim instead of dim multiply-adds
    * per corpus row (4× less arithmetic at 64→16) and is the shape
    * that pays off when projected vectors are PRECOMPUTED as a
    * column — then the full-width embedding is only read for the
    * pool. The corpus embedding rides THROUGH the TakeOrdered (k·pool
    * rows, trivial), so the whole query is ONE corpus scan with no
    * second join back — the same one-pass contract as
    * [[mmrSelectPooled]]'s retrieve stage.
    *
    * Projected cosine is computed from exact integer dot/norm sums
    * (longs; doubles only at the final divide), so ties and ordering
    * match plain-SQL integer arithmetic bit-for-bit. Recall is
    * approximate — distortion ~1/√outDim — which the pool absorbs;
    * the returned top-k cosines are EXACT (full-vector). */
  def annJl(corpus: DataFrame, queryVec: DataFrame, k: Int,
            outDim: Int = 16, poolFactor: Int = 4,
            idCol: String = "vec_id"): DataFrame = {
    import graft.functions.VectorExpressions.{cosineNative, jlProjectNative}
    def dotL(a: Column, b: Column): Column =
      aggregate(zip_with(a, b, (x, y) => x * y), lit(0L), (acc, x) => acc + x)
    // the query's own projected norm is a CONSTANT — computed once in
    // the broadcast row, not re-folded per corpus row (an outDim-long
    // interpreted HOF fold the hot scan would otherwise repeat
    // n times for the same value)
    val q = broadcast(queryVec.select(col("embedding").as("q_emb"),
      jlProjectNative(col("embedding"), outDim).as("q_p"))
      .withColumn("q_n", sqrt(dotL(col("q_p"), col("q_p")).cast("double"))))
    val pool = corpus
      .select(col(idCol), col("embedding"),
        jlProjectNative(col("embedding"), outDim).as("p"))
      .crossJoin(q)
      .withColumn("jl_cos", dotL(col("p"), col("q_p")).cast("double") /
        (sqrt(dotL(col("p"), col("p")).cast("double")) * col("q_n")))
      .orderBy(desc("jl_cos"), col(idCol))
      .limit(k * poolFactor)
    pool
      .withColumn("cos_raw", cosineNative(col("embedding"), col("q_emb")))
      .orderBy(desc("cos_raw"), col(idCol))
      .limit(k)
      .select(col(idCol), round(col("cos_raw"), 6).as("cosine"))
  }

  /** ANN via BINARY sign sketches + exact re-rank: each vector's
    * `planes`-bit signature is the SIGN pattern of its
    * [[graft.functions.JlProject]] projections (quadratic-residue
    * hyperplanes — the portable-MINSTD family degenerates at stride
    * dim, see JlProject's scaladoc), candidates rank by Hamming
    * distance to the query's signature, and the `k·poolFactor` pool
    * re-ranks with exact cosine. The signature is the cheapest
    * possible index payload — at scale it is PRECOMPUTED as an
    * 8-byte-per-64-planes column and the candidate scan reads ONLY
    * it (sign agreement approximates angle: P[signs agree] =
    * 1 − θ/π, Goemans–Williamson), the same one-TakeOrdered-pass
    * shape as [[annJl]]. Sign pattern and Hamming count are exact
    * integer comparisons — engine-reproducible bit-for-bit. */
  def annHamming(corpus: DataFrame, queryVec: DataFrame, k: Int,
                 planes: Int = 64, poolFactor: Int = 4,
                 idCol: String = "vec_id"): DataFrame = {
    import graft.functions.VectorExpressions.{cosineNative, jlProjectNative}
    val q = broadcast(queryVec.select(col("embedding").as("q_emb"),
      jlProjectNative(col("embedding"), planes).as("q_p")))
    val pool = corpus
      .select(col(idCol), col("embedding"),
        jlProjectNative(col("embedding"), planes).as("p"))
      .crossJoin(q)
      .withColumn("dist", size(filter(zip_with(col("p"), col("q_p"),
        (a, b) => (a > 0) =!= (b > 0)), x => x)).cast("long"))
      .orderBy(col("dist"), col(idCol))
      .limit(k * poolFactor)
    pool
      .withColumn("cos_raw", cosineNative(col("embedding"), col("q_emb")))
      .orderBy(desc("cos_raw"), col(idCol))
      .limit(k)
      .select(col(idCol), round(col("cos_raw"), 6).as("cosine"))
  }

  /** `bits`-bit LSH bucket signature: bit j = sign of the projection
    * onto deterministic hyperplane j. Per-row, no shuffle — a single
    * fused loop ([[graft.functions.HyperplaneLshBucket]]); the
    * equivalent HOF fold (`aggregate(sequence(...), ...)` over
    * `zip_with(vec, planeSign)`) is interpreted per (plane, dim) pair
    * and was measured ~O(bits·dim) lambda dispatches slower. */
  def lshBucket(vec: Column, bits: Int): Column =
    graft.functions.VectorExpressions.lshBucketNative(vec, bits)

  /** ANN via LSH buckets: search only the query's bucket — or, with
    * `multiProbe`, also every bucket at Hamming distance 1 (a vector
    * near a hyperplane lands on either side; probing the 1-bit
    * neighbours recovers most of that lost recall for bits+1 bucket
    * lookups instead of a bigger-bucket scan). */
  def annLsh(corpus: DataFrame, queryVec: DataFrame, k: Int,
             bits: Int = 8, idCol: String = "vec_id",
             multiProbe: Boolean = false, portable: Boolean = false): DataFrame = {
    def bucketOf(vec: Column): Column =
      graft.functions.VectorExpressions.lshBucketNative(vec, bits, 0, portable)
    val bucketed = corpus.withColumn("bucket", bucketOf(col("embedding")))
    val base = queryVec.select(col("embedding").as("q_emb"),
      bucketOf(col("embedding")).as("q_bucket"))
    val probes =
      if (!multiProbe) base.withColumn("q_probe", col("q_bucket"))
      else base.withColumn("q_probe", explode(array(
        col("q_bucket") +: (0 until bits).map(j =>
          col("q_bucket").bitwiseXOR(lit(1L << j))): _*)))
    val q = broadcast(probes)
    val cos = fastCos(col("embedding"), col("q_emb"))
    bucketed.join(q, col("bucket") === col("q_probe"))
      .select(col(idCol), cos.as("cos_raw"))
      .orderBy(desc("cos_raw"), col(idCol))
      .limit(k)
      .select(col(idCol), round(col("cos_raw"), 6).as("cosine"))
  }

  /** Batch ANN: top-k per query for a whole FRAME of queries — the
    * shape a production similarity-search job actually runs (one
    * query vector at a time cannot amortize the corpus scan). Both
    * sides are bucketed by the same deterministic hyperplanes;
    * candidates come from the bucket equi-join (shuffle on bucket id,
    * no broadcast needed — both sides may be arbitrarily large), and
    * each query keeps its k best by cosine via a per-query window.
    * At 100 TB this is the plan that works: the corpus is re-read
    * once per batch of queries, not once per query. */
  def annLshBatch(corpus: DataFrame, queries: DataFrame, k: Int,
                  bits: Int = 8, idCol: String = "vec_id",
                  portable: Boolean = false): DataFrame = {
    def bucketOf(vec: Column): Column =
      graft.functions.VectorExpressions.lshBucketNative(vec, bits, 0, portable)
    val c = corpus.select(col(idCol).as("id"), col("embedding"),
      bucketOf(col("embedding")).as("bucket"))
    val q = queries.select(col(idCol).as("q_id"), col("embedding").as("q_emb"),
      bucketOf(col("embedding")).as("q_bucket"))
    val cos = fastCos(col("embedding"), col("q_emb"))
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col("q_id")).orderBy(desc("cos_raw"), col("id"))
    c.join(q, col("bucket") === col("q_bucket"))
      .select(col("q_id"), col("id"), cos.as("cos_raw"))
      .withColumn("rn", row_number().over(w))
      .filter(col("rn") <= k)
      .select(col("q_id"), col("id").as(idCol),
        round(col("cos_raw"), 6).as("cosine"))
  }

  /** Corpus k-NN graph: every vector's `k` nearest same-bucket
    * neighbors (self excluded) — the input shape for semantic-dedup
    * and diversity analysis over an embedded corpus. One bucketing
    * pass, one equi-self-join on the hyperplane bucket (the
    * [[annLshBatch]] machinery with corpus = queries), per-vector
    * top-k windows over bucket-local candidates. Neighbors in other
    * buckets are unseen — the standard LSH recall trade; lower
    * `bits` for recall, raise for speed. */
  def knnGraph(corpus: DataFrame, k: Int, bits: Int = 8,
               idCol: String = "vec_id", portable: Boolean = false): DataFrame = {
    def bucketOf(vec: Column): Column =
      graft.functions.VectorExpressions.lshBucketNative(vec, bits, 0, portable)
    val b = corpus.select(col(idCol).as("id"), col("embedding"),
      bucketOf(col("embedding")).as("bucket"))
    val q = b.select(col("id").as("q_id"), col("embedding").as("q_emb"),
      col("bucket").as("q_bucket"))
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col("q_id")).orderBy(desc("cos_raw"), col("id"))
    b.join(q, col("bucket") === col("q_bucket") && col("id") =!= col("q_id"))
      .select(col("q_id"), col("id"), fastCos(col("embedding"), col("q_emb")).as("cos_raw"))
      .withColumn("rn", row_number().over(w))
      .filter(col("rn") <= k)
      .select(col("q_id"), col("id").as(idCol),
        round(col("cos_raw"), 6).as("cosine"))
  }

  /** SemDeDup-style semantic prune (Abbas et al. 2023, bucket-scoped
    * variant): drop every vector that has a same-bucket neighbor
    * with cosine ≥ `threshold` and a smaller id — exactly one
    * representative (the min-id) survives from each
    * threshold-neighborhood chain inside a bucket. No transitive
    * closure (that policy is [[lshPairs]] → `Dedup.clusters`); this
    * is the cheap one-join form: bucket self-join restricted to
    * `id < q_id`, distinct drop set, one anti join. Candidate volume
    * is bucket-bounded exactly like [[knnGraph]]. */
  def semdedupKeep(corpus: DataFrame, threshold: Double, bits: Int = 8,
                   idCol: String = "vec_id", portable: Boolean = false): DataFrame = {
    def bucketOf(vec: Column): Column =
      graft.functions.VectorExpressions.lshBucketNative(vec, bits, 0, portable)
    val b = corpus.select(col(idCol).as("id"), col("embedding"),
      bucketOf(col("embedding")).as("bucket"))
    val q = b.select(col("id").as("q_id"), col("embedding").as("q_emb"),
      col("bucket").as("q_bucket"))
    val drops = b.join(q, col("bucket") === col("q_bucket") && col("id") < col("q_id"))
      .filter(fastCos(col("embedding"), col("q_emb")) >= threshold)
      .select(col("q_id")).distinct()
    corpus.join(drops, col(idCol) === col("q_id"), "left_anti")
  }

  /** Maximal Marginal Relevance selection (Carbonell & Goldstein
    * 1998): greedily pick `k` vectors maximizing
    * (1−λ)·rel(d) − λ·max_{s∈selected} sim(d, s) — the diversity
    * counterweight to plain top-k (which returns k near-copies of
    * the best hit; MMR returns the best hit plus its complements).
    * Relevance and similarity are cosines quantized to the 2⁻²⁰
    * grid and λ to parts-per-million, so every step's argmax is
    * EXACT integer arithmetic (ties → smaller id) — the greedy
    * trajectory is deterministic and a SQL oracle replays it
    * step-for-step unrolled.
    *
    * Inherently sequential: k driver-side rounds, each ONE corpus
    * scan (query relevance re-derived map-side, the ≤k selected
    * embeddings broadcast for the penalty max, argmax via
    * TakeOrderedAndProject), one (id) row collected per round —
    * bounded like the Lloyd loop. Use for k ≲ 100 result-page /
    * exemplar selection; at corpus scale use [[mmrSelectPooled]]
    * (one scan + bounded-pool rerank), and for corpus-scale subset
    * extraction proper, [[semdedupKeep]] / [[Sampling]]. */
  def mmrSelect(corpus: DataFrame, queryVec: DataFrame, k: Int,
                lambdaPpm: Long = 500000L,
                idCol: String = "vec_id"): DataFrame = {
    require(k >= 1 && lambdaPpm >= 0 && lambdaPpm <= 1000000L,
      "need k >= 1 and lambda in [0, 1e6] ppm")
    val grid = lit(1048576.0)
    def qcos(a: Column, b: Column): Column =
      floor(fastCos(a, b) * grid + lit(0.5)).cast("long")
    // id cast to long like mmrSelectPooled — an int-typed id must not
    // ClassCastException at the driver-side getLong
    val q = broadcast(queryVec.select(col("embedding").as("q_emb")))
    def scored = corpus
      .select(col(idCol).cast("long").as("id"), col("embedding"))
      .crossJoin(q)
      .select(col("id"), col("embedding"),
        qcos(col("embedding"), col("q_emb")).as("qrel"))
    var selected = Vector.empty[Long]
    var exhausted = false
    // stop early when the corpus runs out of rows — k larger than
    // the candidate pool returns what exists, like mmrSelectPooled
    for (_ <- 1 to k if !exhausted) {
      val cand = scored.filter(!col("id").isin(selected: _*))
      val withPenalty =
        if (selected.isEmpty) cand.withColumn("maxsim", lit(0L))
        else {
          val selEmb = broadcast(scored.filter(col("id").isin(selected: _*))
            .select(col("embedding").as("s_emb")))
          cand.crossJoin(selEmb)
            .select(col("id"), col("qrel"),
              qcos(col("embedding"), col("s_emb")).as("qsim"))
            .groupBy("id", "qrel").agg(max("qsim").as("maxsim"))
        }
      val best = withPenalty
        .select(col("id"),
          ((lit(1000000L) - lit(lambdaPpm)) * col("qrel") -
            lit(lambdaPpm) * col("maxsim")).as("score"))
        .orderBy(desc("score"), col("id")).limit(1)
        .collect()
      if (best.isEmpty) exhausted = true
      else selected :+= best(0).getLong(0)
    }
    val spark = corpus.sparkSession
    import spark.implicits._
    selected.zipWithIndex.map { case (id, i) => (id, (i + 1).toLong) }
      .toDF(idCol, "step")
  }

  /** [[mmrSelect]] restructured for corpus scale: ONE distributed
    * relevance pass takes the top `k·poolFactor` candidates
    * (TakeOrderedAndProject — never a global sort), and the greedy
    * MMR loop then runs driver-side over that bounded pool with the
    * SAME integer-grid arithmetic (the cosine mirrors
    * [[graft.functions.CosineSimilarity]]'s sequential double
    * accumulation bit-for-bit, so pooled and distributed trajectories
    * agree exactly wherever both are defined).
    *
    * This is the standard retrieve-then-rerank shape: k corpus scans
    * become one, at the cost of exactness ONLY when an MMR pick would
    * have come from outside the relevance pool — impossible for the
    * first pick, and increasingly unlikely as `poolFactor` grows,
    * since low-relevance picks score (1−λ)·qrel − λ·maxsim below
    * in-pool alternatives unless λ is diversity-extreme (λ → 1 wants
    * the FARTHEST vectors regardless of relevance; use a sampler for
    * that, not MMR). Pool rows collected to the driver:
    * k·poolFactor·(dim+2) values — bounded like the Lloyd/Z-order
    * collects, and documented as such. Zero-norm vectors (cosine
    * undefined) are excluded, matching the null-cosine drop in the
    * distributed form. Returns (idCol, step), step 1-based. */
  def mmrSelectPooled(corpus: DataFrame, queryVec: DataFrame, k: Int,
                      lambdaPpm: Long = 500000L, poolFactor: Int = 8,
                      idCol: String = "vec_id"): DataFrame = {
    require(k >= 1 && lambdaPpm >= 0 && lambdaPpm <= 1000000L && poolFactor >= 1,
      "need k >= 1, lambda in [0, 1e6] ppm, poolFactor >= 1")
    val grid = lit(1048576.0)
    val q = broadcast(queryVec.select(col("embedding").as("q_emb")))
    val pool = corpus.select(col(idCol).cast("long").as("id"), col("embedding"))
      .crossJoin(q)
      .select(col("id"), col("embedding"),
        floor(fastCos(col("embedding"), col("q_emb")) * grid + lit(0.5))
          .cast("long").as("qrel"))
      .filter(col("qrel").isNotNull)
      .orderBy(desc("qrel"), col("id")).limit(k * poolFactor)
      .collect()
      .map(r => (r.getLong(0), r.getSeq[Float](1).toArray, r.getLong(2)))

    // driver-side mirror of CosineSimilarity.nullSafeEval: floats
    // widened to double, sequential accumulation — same rounding
    def qcos(a: Array[Float], b: Array[Float]): Long = {
      var dot = 0.0; var nx = 0.0; var ny = 0.0; var i = 0
      while (i < a.length) {
        val xi = a(i).toDouble; val yi = b(i).toDouble
        dot += xi * yi; nx += xi * xi; ny += yi * yi; i += 1
      }
      math.floor(dot / (math.sqrt(nx) * math.sqrt(ny)) * 1048576.0 + 0.5).toLong
    }
    // greedy with an incrementally-maintained per-candidate max
    // similarity: after each pick, every remaining candidate folds in
    // ONE new cosine (vs the newest pick) — O(k·pool·dim) total, not
    // O(k²·pool·dim) from recomputing the max over all picks each
    // round. maxsim starts at MinValue (a TRUE running max — cosines
    // can be negative, and clamping at 0 would mute the bonus the
    // distributed form gives anti-similar candidates); the first
    // round scores with an explicit 0 penalty, matching mmrSelect's
    // empty-selection case.
    val n = pool.length
    val alive = Array.fill(n)(true)
    val maxsim = Array.fill(n)(Long.MinValue)
    var selected = Vector.empty[Long]
    while (selected.size < k && selected.size < n) {
      var bestIdx = -1
      var bestScore = Long.MinValue
      var i = 0
      while (i < n) {
        if (alive(i)) {
          val (id, _, qrel) = pool(i)
          val penalty = if (selected.isEmpty) 0L else maxsim(i)
          val score = (1000000L - lambdaPpm) * qrel - lambdaPpm * penalty
          if (score > bestScore ||
              (score == bestScore && (bestIdx < 0 || id < pool(bestIdx)._1)))
            { bestIdx = i; bestScore = score }
        }
        i += 1
      }
      alive(bestIdx) = false
      selected :+= pool(bestIdx)._1
      val pickedEmb = pool(bestIdx)._2
      i = 0
      while (i < n) {
        if (alive(i)) {
          val s = qcos(pool(i)._2, pickedEmb)
          if (s > maxsim(i)) maxsim(i) = s
        }
        i += 1
      }
    }
    val spark = corpus.sparkSession
    import spark.implicits._
    selected.zipWithIndex.map { case (id, i) => (id, (i + 1).toLong) }
      .toDF(idCol, "step")
  }

  /** Semantic decontamination: drop every corpus vector whose cosine
    * to ANY eval-benchmark vector reaches `threshold` — the
    * embedding-space complement of the shingle-overlap
    * [[Dedup.decontaminate]] (paraphrased or translated benchmark
    * leakage carries no shingles but still embeds close). The eval
    * set is benchmarks — MBs against a corpus of TBs — so it rides
    * the [[ivfAssign]] shape: folded into one broadcast array, each
    * corpus row finds its nearest eval id with the fused
    * [[graft.functions.NearestCentroid]] argmax (cosine to the
    * argmax IS the max cosine), then one broadcast join attaches
    * that eval's embedding for the threshold test. The corpus is
    * never exchanged: zero shuffles, pure map-side. */
  def semanticDecontaminate(corpus: DataFrame, evalSet: DataFrame,
                            threshold: Double,
                            idCol: String = "vec_id"): DataFrame = {
    // an EMPTY eval set means nothing to decontaminate — keep the
    // whole corpus, matching the shingle twin's hit_shingles = 0
    // behavior. Without the guard the empty centroid array makes
    // every __near null and the join below would silently drop the
    // ENTIRE corpus. The probe is benchmark-sized (one head).
    if (evalSet.head(1).isEmpty) return corpus
    val evals = broadcast(evalSet.agg(
      collect_list(struct(col(idCol).cast("long").as("cid"),
        col("embedding").as("c_emb"))).as("cents")))
    val evalEmb = broadcast(evalSet.select(col(idCol).cast("long").as("__near"),
      col("embedding").as("__e_emb")))
    corpus.crossJoin(evals)
      .withColumn("__near", graft.functions.VectorExpressions
        .nearestCentroidNative(col("embedding"), col("cents")))
      .drop("cents")
      // LEFT join + null-keeping filter: a corpus vector with an
      // undefined cosine (zero norm) cannot be near any benchmark —
      // it is KEPT, never silently dropped by inner-join/null-filter
      // semantics
      .join(evalEmb, Seq("__near"), "left")
      .filter(coalesce(fastCos(col("embedding"), col("__e_emb")) < threshold,
        lit(true)))
      .drop("__near", "__e_emb")
  }

  /** Shuffle-free IVF cluster assignment: the ≤nCentroids centroid
    * rows are folded into ONE `array<struct<cid, c_emb>>` row and
    * broadcast; each corpus row then picks its nearest centroid with
    * the fused [[graft.functions.NearestCentroid]] argmax (index-order
    * double cosine, ties to the larger cid — `max(struct(sim, cid))`
    * semantics, so the oracle's `ORDER BY sim DESC, cid DESC` twin
    * reproduces it). The corpus is never exchanged: no crossJoin row
    * explosion, no `groupBy(id)` argmax — the two full-corpus shuffles
    * the naive assignment pays per Lloyd iteration. The argmax is
    * invariant to the collect_list order, so the nondeterministic
    * array order cannot leak into results. */
  def ivfAssign(corpus: DataFrame, centroids: DataFrame,
                idCol: String = "vec_id"): DataFrame = {
    val centsRow = broadcast(centroids.agg(
      collect_list(struct(col("cid").cast("long").as("cid"), col("c_emb")))
        .as("cents")))
    corpus.crossJoin(centsRow)
      .withColumn("cluster",
        graft.functions.VectorExpressions
          .nearestCentroidNative(col("embedding"), col("cents")))
      .drop("cents")
  }

  /** IVF (inverted-file) ANN: partition the corpus into `nCentroids`
    * clusters, search only the `nProbe` clusters nearest the query.
    *
    * Centroids seed from a deterministic hash-ordered sample of the
    * corpus (reproducible, one-pass), then `lloydIters` k-means
    * iterations refine them: assign every vector to its nearest
    * centroid ([[ivfAssign]] — a broadcast centroid array + per-row
    * fused argmax, zero corpus shuffle), recompute each centroid
    * as the elementwise mean of its members (posexplode +
    * (cluster, pos) aggregation — never a per-group array
    * materialization), repeat. Each iteration is one corpus scan plus
    * one NARROW shuffle (map-side-combined partials of ≤nCentroids×dim
    * (cluster, pos) groups), so 1–2 iterations cost a small constant
    * factor and fix the hash-seed pathology where clumped seeds leave
    * true clusters smeared across arbitrary cells (see IvfLloydSpec's
    * engineered corpus: probe recall fails without refinement). At
    * scale the final assignment is computed once and persisted
    * alongside the embeddings, making queries touch only
    * ~nProbe/nCentroids of the data. */
  /** Deterministic IVF centroid build shared by [[annIvf]] and
    * [[annIvfBatch]]: hash-ordered seed sample + `lloydIters` k-means
    * refinement rounds. `portable` orders the seed sample by the
    * MINSTD bucket instead of xxhash64 — same deterministic one-pass
    * seeding, but re-derivable in plain SQL for the oracle gates. */
  /** The Lloyd-step elementwise mean over exploded `(…, pos, v)`
    * rows: portable mode quantizes each component to the 2⁻²⁰ grid
    * BEFORE summing — integer sums are exact in any aggregation
    * order, so the refined centroids are engine-portable and a SQL
    * oracle re-derives them bit-for-bit; default is the plain double
    * avg. ONE definition for both k-means refiners (IVF cells, PQ
    * subspace codebooks), so the oracle-exactness trick cannot be
    * half-updated. */
  private def lloydMean(portable: Boolean): Column =
    if (portable)
      sum(floor(col("v").cast("double") * lit(1048576.0) + lit(0.5)).cast("long"))
        .cast("double") / (count(lit(1)) * lit(1048576.0))
    else avg(col("v").cast("double"))

  /** Deterministic seed-sampling order — portable MINSTD walk over
    * the id, else xxhash64 — shared by both index builders. */
  private def seedOrder(id: Column, portable: Boolean): Column =
    if (portable) pmod(pmod(id, lit(2147483647L)) * 48271L, lit(2147483647L))
    else xxhash64(id)

  def ivfCentroids(corpus: DataFrame, nCentroids: Int, idCol: String,
                   portable: Boolean, lloydIters: Int): DataFrame = {
    val sampleOrder = seedOrder(col("cid"), portable)
    var centroids =
      corpus.select(col(idCol).as("cid"), col("embedding").as("c_emb"))
        .orderBy(sampleOrder, col("cid")).limit(nCentroids)
    for (_ <- 1 to lloydIters) {
      // Lloyd step: elementwise member mean per cell. Cells that
      // capture no members drop out (the standard empty-cluster
      // handling); means cast back to float so the fused cosine
      // kernel applies unchanged. The portable path quantizes each
      // component to 2⁻²⁰ before summing: integer sums are EXACT in
      // any order, so the refined centroids — and with them every
      // downstream assignment/probe argmax — no longer depend on
      // Spark's partial-aggregation order, and a SQL oracle
      // re-derives them bit-for-bit. The 2⁻²⁰ grid sits ~10⁵ below
      // the corpus noise scale, so cluster geometry is unaffected.
      val mean = lloydMean(portable)
      val refined = ivfAssign(corpus, centroids, idCol)
        .select(col("cluster").as("cid"),
          posexplode(col("embedding")).as(Seq("pos", "v")))
        .groupBy("cid", "pos").agg(mean.as("mv"))
        .groupBy("cid")
        .agg(transform(array_sort(collect_list(struct(col("pos"), col("mv")))),
          s => s.getField("mv").cast("float")).as("c_emb"))
      centroids = refined
    }
    centroids
  }

  def annIvf(corpus: DataFrame, queryVec: DataFrame, k: Int,
             nCentroids: Int = 16, nProbe: Int = 2,
             idCol: String = "vec_id", portable: Boolean = false,
             lloydIters: Int = 0): DataFrame = {
    val centroids = ivfCentroids(corpus, nCentroids, idCol, portable, lloydIters)
    val clustered = ivfAssign(corpus, centroids, idCol)
    // the query's nProbe nearest clusters
    val probed = broadcast(
      queryVec.select(col("embedding").as("q_emb")).crossJoin(broadcast(centroids))
        .orderBy(fastCos(col("q_emb"), col("c_emb")).desc, col("cid"))
        .limit(nProbe)
        .select(col("cid").as("p_cid"), col("q_emb")))
    val cos = fastCos(col("embedding"), col("q_emb"))
    clustered.join(probed, col("cluster") === col("p_cid"))
      .select(col(idCol), cos.as("cos_raw"))
      .orderBy(desc("cos_raw"), col(idCol))
      .limit(k)
      .select(col(idCol), round(col("cos_raw"), 6).as("cosine"))
  }

  /** Batch IVF ANN: top-k per query for a whole FRAME of queries over
    * ONE shared index — the amortized production shape ([[annLshBatch]]
    * rationale: the index build and the corpus scan are paid once per
    * batch, not once per query). Per-query probe sets come from a
    * window top-nProbe over the broadcast centroids; candidates from
    * the (cluster == probed cid) equi-join — both sides may be
    * arbitrarily large, no broadcast of queries required; each query
    * keeps its k best by cosine via a per-query window. */
  def annIvfBatch(corpus: DataFrame, queries: DataFrame, k: Int,
                  nCentroids: Int = 16, nProbe: Int = 2,
                  idCol: String = "vec_id", portable: Boolean = false,
                  lloydIters: Int = 0): DataFrame = {
    val centroids = ivfCentroids(corpus, nCentroids, idCol, portable, lloydIters)
    val clustered = ivfAssign(corpus, centroids, idCol)
    val wProbe = org.apache.spark.sql.expressions.Window
      .partitionBy(col("q_id"))
      .orderBy(fastCos(col("q_emb"), col("c_emb")).desc, col("cid"))
    val qProbes = queries
      .select(col(idCol).as("q_id"), col("embedding").as("q_emb"))
      .crossJoin(broadcast(centroids))
      .withColumn("rk", row_number().over(wProbe))
      .filter(col("rk") <= nProbe)
      .select(col("q_id"), col("q_emb"), col("cid").as("p_cid"))
    val cos = fastCos(col("embedding"), col("q_emb"))
    val wTopK = org.apache.spark.sql.expressions.Window
      .partitionBy(col("q_id")).orderBy(desc("cos_raw"), col(idCol))
    clustered.join(qProbes, col("cluster") === col("p_cid"))
      .select(col("q_id"), col(idCol), cos.as("cos_raw"))
      .withColumn("rn", row_number().over(wTopK))
      .filter(col("rn") <= k)
      .select(col("q_id"), col(idCol), round(col("cos_raw"), 6).as("cosine"))
  }

  /** Per-vector symmetric int8 quantization scale: 127 / max|v|
    * (0 for an all-zero vector). Compute this ONCE as a column and
    * feed it to [[quantizeInt8]] — referencing it inside the
    * quantize lambda as an attribute costs nothing per element,
    * whereas inlining the max-abs subtree would re-evaluate it per
    * element (interpreted HOF lambdas have no subtree caching). */
  def int8Scale(vec: Column): Column = {
    val maxAbs = array_max(transform(vec, v => abs(v.cast("double"))))
    when(maxAbs > 0, lit(127.0) / maxAbs).otherwise(lit(0.0))
  }

  /** Symmetric int8 quantization of an embedding given its
    * [[int8Scale]]: `floor(v·scale + 0.5)` per element — floor+0.5
    * instead of round() because floor has identical semantics in
    * every engine (round's half-way rule does not), keeping the
    * DuckDB oracle exact. The standard 4× compression for
    * billion-scale ANN corpora; dequantize with v ≈ q / scale. */
  def quantizeInt8(vec: Column, scale: Column): Column =
    transform(vec, v => floor(v.cast("double") * scale + lit(0.5)).cast("int"))

  /** All near-duplicate pairs with cosine ≥ threshold. Brute-force
    * variant (cross join) for oracle-checkable correctness at small
    * scale; [[lshPairs]] is the scale path. */
  def cosinePairs(corpus: DataFrame, threshold: Double,
                  idCol: String = "vec_id"): DataFrame = {
    val a = corpus.select(col(idCol).as("d1"), col("embedding").as("e1"))
    val b = corpus.select(col(idCol).as("d2"), col("embedding").as("e2"))
    val cos = fastCos(col("e1"), col("e2"))
    a.join(b, col("d1") < col("d2"))
      .filter(cos >= threshold)
      .select(col("d1"), col("d2"), round(cos, 4).as("cosine"))
  }

  /** Near-duplicate pairs via shared LSH bucket (equi-join candidate
    * generation), then exact cosine verification — the scale path
    * [[cosinePairs]]'s quadratic self-join cannot take.
    *
    * `tables` independent `bits`-bit hash tables (plane offsets 0,
    * bits, 2·bits, …) amplify recall the standard way: a pair with
    * per-bit collision probability p = 1 − θ/π is a candidate with
    * probability 1 − (1 − p^bits)^tables. Candidate generation is a
    * self-join of the NARROW (id, table, bucket) signature frame —
    * the embeddings themselves are not exploded per table; they are
    * re-joined only for the deduplicated candidate pairs, so the
    * wide rows flow once, the way a 100 TB corpus must.
    *
    * `portable = true` uses the MINSTD-parity hyperplanes
    * ([[graft.functions.HyperplaneLshBucket]]) so a SQL oracle can
    * re-derive the exact same buckets; the default XXH64 planes are
    * otherwise equivalent. */
  def lshPairs(corpus: DataFrame, threshold: Double, bits: Int = 8,
               tables: Int = 1, portable: Boolean = false,
               idCol: String = "vec_id"): DataFrame = {
    val sigs = corpus.select(col(idCol).as("id"),
      explode(array((0 until tables).map(l =>
        struct(lit(l).as("tbl"),
          graft.functions.VectorExpressions
            .lshBucketNative(col("embedding"), bits, l * bits, portable)
            .as("bucket"))): _*)).as("tb"))
      .select(col("id"), col("tb.tbl").as("tbl"), col("tb.bucket").as("bucket"))
    val cand = sigs.as("a").join(sigs.as("b"),
        col("a.tbl") === col("b.tbl") && col("a.bucket") === col("b.bucket") &&
          col("a.id") < col("b.id"))
      .select(col("a.id").as("d1"), col("b.id").as("d2"))
      .dropDuplicates("d1", "d2")
    val ea = corpus.select(col(idCol).as("ia"), col("embedding").as("e1"))
    val eb = corpus.select(col(idCol).as("ib"), col("embedding").as("e2"))
    val cos = fastCos(col("e1"), col("e2"))
    cand.join(ea, col("d1") === col("ia")).join(eb, col("d2") === col("ib"))
      .filter(cos >= threshold)
      .select(col("d1"), col("d2"), round(cos, 4).as("cosine"))
  }

  // ---------------------------------------------------------------
  // Product quantization (PQ): compress each vector to `m` small
  // centroid codes (one per dim/m-sized subspace) and answer top-k
  // with asymmetric distance computation (ADC) — the memory-scale
  // path when even int8 vectors are too big (m·log2(k) bits/vector;
  // 4 subspaces × 16 centroids = 2 bytes for a 64-dim float vector).
  // ---------------------------------------------------------------

  /** Per-subspace k-means codebook: `(s, cid, c_sub)` rows, subspace
    * s covering dims [s·dim/m, (s+1)·dim/m). Seeds are the hash-
    * ordered first `kPerSub` corpus vectors' sub-slices (same
    * deterministic sample as [[ivfCentroids]], `cid` = seed vec id),
    * refined by `lloydIters` Lloyd rounds. Assignment is the fused
    * [[graft.functions.NearestCentroidL2]] argmin over a BROADCAST
    * per-subspace centroid array — the corpus is never shuffled; the
    * re-center is one narrow (s, cid, pos) aggregation per round with
    * the 2⁻²⁰-grid integer mean (`portable` Lloyd trick: exact in any
    * accumulation order, so a SQL oracle re-derives the codebook
    * bit-for-bit; the grid sits far below corpus noise). */
  def pqCodebook(corpus: DataFrame, dim: Int, m: Int, kPerSub: Int,
                 idCol: String = "vec_id", portable: Boolean = false,
                 lloydIters: Int = 1): DataFrame = {
    require(dim % m == 0, s"dim $dim must split into $m subspaces")
    val subDim = dim / m
    val sampleOrder = seedOrder(col(idCol), portable)
    val seeds = corpus.orderBy(sampleOrder, col(idCol)).limit(kPerSub)
    def subSlices(emb: Column, out: String): Column =
      posexplode(transform(sequence(lit(0), lit(m - 1)),
        s => slice(emb, s * subDim + 1, lit(subDim)))).as(Seq("s", out))
    var codebook = seeds.select(col(idCol).cast("long").as("cid"),
        subSlices(col("embedding"), "c_sub"))
      .select(col("s"), col("cid"), col("c_sub"))
    val subVecs = corpus.select(col(idCol).as("vid"), subSlices(col("embedding"), "sv"))
    for (_ <- 1 to lloydIters) {
      val mean = lloydMean(portable)
      codebook = pqAssign(subVecs, codebook, "sv")
        .select(col("s"), col("cluster").as("cid"), posexplode(col("sv")).as(Seq("pos", "v")))
        .groupBy("s", "cid", "pos").agg(mean.as("mv"))
        .groupBy("s", "cid")
        .agg(transform(array_sort(collect_list(struct(col("pos"), col("mv")))),
          p => p.getField("mv").cast("float")).as("c_sub"))
    }
    codebook
  }

  /** Nearest-centroid-per-subspace assignment: joins the exploded
    * (vid, s, subvec) frame with the BROADCAST per-subspace centroid
    * arrays and adds `cluster` via the fused per-row L2 argmin (ties
    * to the smaller cid — `ORDER BY dist ASC, cid ASC` semantics). */
  private def pqAssign(subVecs: DataFrame, codebook: DataFrame,
                       vecCol: String): DataFrame = {
    val centsBySub = broadcast(codebook.groupBy("s")
      .agg(collect_list(struct(col("cid"), col("c_sub"))).as("cents")))
    subVecs.join(centsBySub, "s")
      .withColumn("cluster",
        graft.functions.VectorExpressions
          .nearestCentroidL2Native(col(vecCol), col("cents")))
      .drop("cents")
  }

  /** PQ-encode the corpus: `(idCol, codes)` with `codes(s)` = the
    * nearest subspace-s centroid id. Pure per-row work against the
    * broadcast codebook (array-of-arrays, subspace-indexed) — no
    * explode, no shuffle: exactly the map a 100 TB encode job is. */
  def pqEncode(corpus: DataFrame, codebook: DataFrame, dim: Int, m: Int,
               idCol: String = "vec_id"): DataFrame = {
    val subDim = dim / m
    val centsRow = broadcast(codebook.groupBy("s")
      .agg(collect_list(struct(col("cid"), col("c_sub"))).as("cs"))
      .agg(transform(array_sort(collect_list(struct(col("s"), col("cs")))),
        e => e.getField("cs")).as("allcents")))
    corpus.crossJoin(centsRow)
      .select(col(idCol),
        transform(sequence(lit(0), lit(m - 1)), s =>
          graft.functions.VectorExpressions.nearestCentroidL2Native(
            slice(col("embedding"), s * subDim + 1, lit(subDim)),
            element_at(col("allcents"), (s + 1).cast("int")))).as("codes"))
  }

  /** ADC top-k: score every encoded corpus vector against ONE query
    * by summing per-subspace squared-L2 distances query→centroid,
    * looked up from a broadcast distance table — the corpus side
    * touches only its 2-byte codes (never the embeddings), which is
    * the entire point of PQ at 100 TB. Distances quantize to the
    * 2⁻²⁰ integer grid before the m-way sum, so the total is exact in
    * any order and a SQL oracle re-derives every score. Returns
    * (idCol, adist) — approximate squared L2, smaller = closer —
    * via TakeOrderedAndProject (no global sort). */
  def pqTopK(corpus: DataFrame, queryVec: DataFrame, k: Int, dim: Int,
             m: Int, kPerSub: Int, idCol: String = "vec_id",
             portable: Boolean = false, lloydIters: Int = 1): DataFrame =
    pqAdcScores(corpus, queryVec, dim, m, kPerSub, idCol, portable, lloydIters)
      .orderBy(col("adq"), col(idCol)).limit(k)
      .select(col(idCol), round(col("adq") / lit(1048576.0), 6).as("adist"))

  /** PQ with exact re-ranking — the production retrieval shape: the
    * 2–4-byte codes prune the corpus to a `shortlist`, then ONLY the
    * shortlist's float vectors are re-read for the exact squared-L2
    * top-k. ADC error caps recall when codes are this small; a
    * 5–10× oversampled shortlist recovers it while still touching
    * `shortlist/|corpus|` of the embedding bytes — at 100 TB the
    * embeddings never move: the broadcast shortlist id set prunes at
    * the scan. */
  def pqTopKRerank(corpus: DataFrame, queryVec: DataFrame, k: Int,
                   shortlist: Int, dim: Int, m: Int, kPerSub: Int,
                   idCol: String = "vec_id", portable: Boolean = false,
                   lloydIters: Int = 1): DataFrame = {
    val short = pqAdcScores(corpus, queryVec, dim, m, kPerSub, idCol, portable, lloydIters)
      .orderBy(col("adq"), col(idCol)).limit(shortlist)
      .select(col(idCol))
    val d2full = aggregate(
      zip_with(col("embedding"), col("q_emb"),
        (x, y) => (x.cast("double") - y.cast("double")) * (x.cast("double") - y.cast("double"))),
      lit(0.0), (acc, v) => acc + v)
    corpus.join(broadcast(short), idCol)
      .crossJoin(broadcast(queryVec.select(col("embedding").as("q_emb"))))
      .select(col(idCol), d2full.as("d2"))
      .orderBy(col("d2"), col(idCol)).limit(k)
      .select(col(idCol), round(col("d2"), 6).as("dist"))
  }

  /** Batch PQ ADC: top-k per query for a FRAME of queries sharing ONE
    * codebook — the index build and the code scan amortize over the
    * batch (the annLshBatch/annIvfBatch rationale applied to PQ).
    * Per-query distance tables are broadcast (m·kPerSub·|queries|
    * rows); the corpus side explodes its m codes once, joins the
    * broadcast tables map-side, and partial-aggregates the exact
    * integer ADC sums before the one (q_id, vec_id) shuffle; a
    * per-query window keeps the k best. The embeddings themselves
    * never move — only codes do, which is the PQ contract at 100 TB. */
  def pqTopKBatch(corpus: DataFrame, queries: DataFrame, k: Int, dim: Int,
                  m: Int, kPerSub: Int, idCol: String = "vec_id",
                  portable: Boolean = false, lloydIters: Int = 1): DataFrame = {
    val subDim = dim / m
    val codebook = pqCodebook(corpus, dim, m, kPerSub, idCol, portable, lloydIters)
    val codes = pqEncode(corpus, codebook, dim, m, idCol)
    val qSubs = pqQuerySubs(queries, dim, m, Seq(col(idCol).as("q_id")))
    val dt = broadcast(codebook.join(qSubs, "s")
      .select(col("q_id"), col("s"), col("cid"), adcDq.as("dq")))
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col("q_id")).orderBy(col("adq"), col(idCol))
    codes.select(col(idCol), posexplode(col("codes")).as(Seq("s", "cid")))
      .join(dt, Seq("s", "cid"))
      .groupBy(col("q_id"), col(idCol)).agg(sum(col("dq")).as("adq"))
      .withColumn("rn", row_number().over(w))
      .filter(col("rn") <= k)
      .select(col("q_id"), col(idCol),
        round(col("adq") / lit(1048576.0), 6).as("adist"))
  }

  /** IVF-PQ: the two index structures composed the way large vector
    * stores deploy them — coarse IVF cells prune the corpus to
    * ~nProbe/nCentroids of its rows, then PQ codes rank ONLY the
    * survivors by integer-grid ADC. Both prune and rank touch codes
    * and cluster ids, never candidate embeddings; both index builds
    * are the portable deterministic ones, so the full composition is
    * SQL-oracle-checkable. Returns (idCol, adist) like [[pqTopK]]. */
  def pqIvfTopK(corpus: DataFrame, queryVec: DataFrame, k: Int, dim: Int,
                m: Int, kPerSub: Int, nCentroids: Int = 16, nProbe: Int = 2,
                idCol: String = "vec_id", portable: Boolean = false,
                lloydIters: Int = 1, ivfLloydIters: Int = 2): DataFrame = {
    val centroids = ivfCentroids(corpus, nCentroids, idCol, portable, ivfLloydIters)
    val clustered = ivfAssign(corpus, centroids, idCol)
    val probed = broadcast(
      queryVec.select(col("embedding").as("q_emb")).crossJoin(broadcast(centroids))
        .orderBy(fastCos(col("q_emb"), col("c_emb")).desc, col("cid"))
        .limit(nProbe)
        .select(col("cid").as("p_cid")))
    val cand = clustered.join(probed, col("cluster") === col("p_cid"))
      .select(col(idCol), col("embedding"))
    val codebook = pqCodebook(corpus, dim, m, kPerSub, idCol, portable, lloydIters)
    val codes = pqEncode(cand, codebook, dim, m, idCol)
    adcScoreCodes(codes, codebook, queryVec, dim, m, idCol)
      .orderBy(col("adq"), col(idCol)).limit(k)
      .select(col(idCol), round(col("adq") / lit(1048576.0), 6).as("adist"))
  }

  /** Embedding dedup via PQ codes: vectors whose m codes all agree
    * quantize to the same cell in every subspace — a semantic-hash
    * grouping that costs ONE shuffle on a tiny code tuple (the
    * pairwise cosine alternatives need candidate joins). Coarse by
    * construction (codes are lossy), so it is the cheap first pass
    * before an exact verify, exactly like exact-dedup's md5 role for
    * text. Returns one row per group with ≥ `minGroup` members. */
  def codeDedupGroups(corpus: DataFrame, dim: Int, m: Int, kPerSub: Int,
                      idCol: String = "vec_id", portable: Boolean = false,
                      lloydIters: Int = 1, minGroup: Int = 2): DataFrame = {
    val codebook = pqCodebook(corpus, dim, m, kPerSub, idCol, portable, lloydIters)
    pqEncode(corpus, codebook, dim, m, idCol)
      .groupBy(col("codes"))
      .agg(count(lit(1)).as("n_members"),
        min(col(idCol)).as("rep"),
        array_join(transform(array_sort(collect_list(col(idCol))),
          _.cast("string")), ",").as("members"))
      .filter(col("n_members") >= minGroup)
      .select(array_join(transform(col("codes"), _.cast("string")), ",").as("code_key"),
        col("rep"), col("n_members"), col("members"))
  }

  /** Persisted ANN index lifecycle: build once, serve later — the
    * production separation between the index job (heavy, scheduled)
    * and query jobs (light, interactive). Layout under `dir`:
    * `codebook/` (PQ subspace centroids), `codes/` (per-vector PQ
    * codes), `centroids/` (IVF cells), `assign/` (per-vector cell) —
    * all plain parquet, so any later session (or engine) reads them
    * without rebuilding. Determinism of the builds makes a rebuild
    * bit-identical to a reload. */
  def saveIndex(corpus: DataFrame, dir: String, dim: Int, m: Int,
                kPerSub: Int, nCentroids: Int = 16,
                idCol: String = "vec_id", portable: Boolean = false,
                lloydIters: Int = 1, ivfLloydIters: Int = 2): Unit = {
    val codebook = pqCodebook(corpus, dim, m, kPerSub, idCol, portable, lloydIters)
    codebook.write.mode("overwrite").parquet(s"$dir/codebook")
    pqEncode(corpus, codebook, dim, m, idCol)
      .write.mode("overwrite").parquet(s"$dir/codes")
    val centroids = ivfCentroids(corpus, nCentroids, idCol, portable, ivfLloydIters)
    centroids.write.mode("overwrite").parquet(s"$dir/centroids")
    ivfAssign(corpus, centroids, idCol).select(col(idCol), col("cluster"))
      .write.mode("overwrite").parquet(s"$dir/assign")
  }

  /** ADC top-k served purely from a persisted index: reads codes +
    * codebook, touches no corpus embeddings at all. */
  def queryIndex(spark: org.apache.spark.sql.SparkSession, dir: String,
                 queryVec: DataFrame, k: Int, dim: Int, m: Int,
                 idCol: String = "vec_id"): DataFrame = {
    val codebook = spark.read.parquet(s"$dir/codebook")
    val codes = spark.read.parquet(s"$dir/codes")
    adcScoreCodes(codes, codebook, queryVec, dim, m, idCol)
      .orderBy(col("adq"), col(idCol)).limit(k)
      .select(col(idCol), round(col("adq") / lit(1048576.0), 6).as("adist"))
  }

  /** Shared ADC scorer: `(idCol, adq)` — integer-grid approximate
    * squared L2 of every corpus vector to the single query, computed
    * from codes + a broadcast (s, cid) → distance map only. */
  private def pqAdcScores(corpus: DataFrame, queryVec: DataFrame, dim: Int,
                          m: Int, kPerSub: Int, idCol: String,
                          portable: Boolean, lloydIters: Int): DataFrame = {
    val codebook = pqCodebook(corpus, dim, m, kPerSub, idCol, portable, lloydIters)
    val codes = pqEncode(corpus, codebook, dim, m, idCol)
    adcScoreCodes(codes, codebook, queryVec, dim, m, idCol)
  }

  /** Query-side subspace slices `(s, qv)` — the ONE slicing both ADC
    * scorers (single-query map, batch join) derive their distance
    * tables from, so the subspace geometry cannot fork between them. */
  private def pqQuerySubs(queries: DataFrame, dim: Int, m: Int,
                          extraCols: Seq[Column] = Seq.empty): DataFrame = {
    val subDim = dim / m
    queries.select(extraCols :+
      posexplode(transform(sequence(lit(0), lit(m - 1)),
        s => slice(col("embedding"), s * subDim + 1, lit(subDim))))
        .as(Seq("s", "qv")): _*)
  }

  /** The quantized ADC sub-distance `floor(‖qv − c_sub‖² · 2²⁰ + ½)`
    * — index-order double fold over the slice, snapped to the
    * integer grid. Shared by both scorers: a quantization change
    * cannot make single-query and batch ADC disagree. */
  private def adcDq: Column = {
    val d2 = aggregate(
      zip_with(col("qv"), col("c_sub"),
        (x, y) => (x.cast("double") - y.cast("double")) * (x.cast("double") - y.cast("double"))),
      lit(0.0), (acc, v) => acc + v)
    floor(d2 * lit(1048576.0) + lit(0.5)).cast("long")
  }

  /** ADC scoring of pre-encoded codes against one query: broadcast
    * (s, cid) → quantized-distance map, per-row m-way integer sum. */
  private def adcScoreCodes(codes: DataFrame, codebook: DataFrame,
                            queryVec: DataFrame, dim: Int, m: Int,
                            idCol: String): DataFrame = {
    val qSubs = pqQuerySubs(queryVec, dim, m)
    val dMap = broadcast(codebook.join(qSubs, "s")
      .select((col("cid") * m + col("s")).as("key"), adcDq.as("dq"))
      .agg(map_from_entries(collect_list(struct(col("key"), col("dq")))).as("dmap")))
    codes.crossJoin(dMap)
      .select(col(idCol),
        aggregate(sequence(lit(0), lit(m - 1)), lit(0L),
          (acc, s) => acc + element_at(col("dmap"),
            element_at(col("codes"), (s + 1).cast("int")) * m + s)).as("adq"))
  }

  /** Per-dimension corpus statistics — the profiling pass before
    * standardization/whitening (PQ and IVF both assume comparably
    * scaled dimensions). Values are quantized to the 2⁻²⁰ integer
    * grid BEFORE summing (the same trick as the portable Lloyd
    * means): integer sums are exact in any aggregation order, so
    * `sum_q`/`sum_q2` are engine-portable, and the derived mean/std
    * doubles follow deterministically from exact integer inputs.
    * One posexplode + one (pos) aggregation: the corpus is read once.
    *
    * `sum_q2` holds n·2⁴⁰-magnitude integers, so the BIGINT sum is
    * exact only to ~2²² rows per dimension (beyond it, ANSI mode
    * fails the job rather than wrapping). `wide = true` runs both
    * sums in DECIMAL(38,0) — exact to ~10²⁵ rows — at a modest
    * per-row cost; the derived mean/std then combine the sums in
    * double space (they are doubles regardless). The narrow default
    * keeps the gate's integer-for-integer oracle comparison. */
  /** Full dim×dim covariance matrix of an embedding corpus — the
    * whitening/PCA prep that [[dimStats]]'s per-dimension variances
    * cannot provide (decorrelating dimensions needs the off-diagonal
    * terms). One pass, NO explode: each row emits its flattened
    * outer product as a dim² long array (elements quantized to the
    * 2⁻¹⁰ grid first, so every product and sum is exact in integer
    * arithmetic), and [[graft.functions.SketchAggregates.arraySum]]
    * reduces them with constant dim²·8-byte state per partition —
    * the corpus shuffles one array per partition, never a
    * (row × dim²) stream. Numerators n·Σxy − Σx·Σy stay in exact
    * longs (document bound: n < ~90k rows per call at unit-scale
    * embeddings before 2⁶³ wraps); the 6-decimal rounding is done in
    * EXACT integer arithmetic — DECIMAL(38,0) micro-units with
    * floor((2·10⁶·|num| + den) / (2·den)) half-away rounding, sign
    * reapplied on the integer — rather than `round(double, 6)`,
    * because the double path is engine-divergent at the edges: a
    * numerator in (−den/2·10⁻⁶, 0) rounds to IEEE −0.0 under
    * DuckDB's binary rounding but +0.0 under Spark's BigDecimal
    * HALF_UP (BigDecimal has no signed zero), and exact .5-ulp ties
    * can split either way. Integer negation has no signed zero, so
    * both engines emit bit-identical doubles for every cell.
    * Output: (i, j, cov), dim² rows. */
  /** ONE distributed pass of exact integer moment sums on the 2^-10
    * grid — single row `(n, s[dim], sp[dim²])` shared by
    * [[dimCovariance]] and [[dimPrincipal]] (the covariance cell is
    * `n·sp[i·dim+j] − s[i]·s[j]`, exact in longs up to n ≈ 10⁸ rows
    * at this grid; beyond that the [[dimStats]] wide-decimal path is
    * the template). */
  private def covSums(embeddings: DataFrame, dim: Int,
                      vecCol: String): DataFrame = {
    val qArr = transform(col(vecCol),
      v => floor(v.cast("double") * lit(1024.0) + lit(0.5)).cast("long"))
    val outer = transform(sequence(lit(0), lit(dim * dim - 1)),
      k => element_at(col("__q"), (call_function("div", k.cast("long"), lit(dim.toLong))).cast("int") + 1) *
           element_at(col("__q"), pmod(k, lit(dim)).cast("int") + 1))
    embeddings.select(qArr.as("__q"))
      .select(col("__q"), outer.as("__op"))
      .agg(count(lit(1)).as("n"),
        graft.functions.SketchAggregates.arraySum(col("__q")).as("s"),
        graft.functions.SketchAggregates.arraySum(col("__op")).as("sp"))
  }

  def dimCovariance(embeddings: DataFrame, dim: Int = 64,
                    vecCol: String = "embedding"): DataFrame = {
    val sums = covSums(embeddings, dim, vecCol)
    val k = col("k")
    val i = call_function("div", k.cast("long"), lit(dim.toLong))
    val j = pmod(k, lit(dim)).cast("long")
    val num = col("n") * element_at(col("sp"), k.cast("int") + 1) -
      element_at(col("s"), i.cast("int") + 1) *
      element_at(col("s"), j.cast("int") + 1)
    val numD = abs(num).cast(org.apache.spark.sql.types.DecimalType(38, 0))
    val denD = (col("n") * col("n")).cast(
      org.apache.spark.sql.types.DecimalType(38, 0)) * lit(1048576L)
    val micro = call_function("div", numD * lit(2000000L) + denD, denD * lit(2L))
    sums.select(explode(sequence(lit(0), lit(dim * dim - 1))).as("k"),
        col("n"), col("s"), col("sp"))
      .select(i.as("i"), j.as("j"),
        (when(num < 0, -micro).otherwise(micro).cast("double") /
          lit(1000000.0)).as("cov"))
  }

  /** Dominant principal component by fixed-point power iteration —
    * the whitening/axis-selection pass downstream of [[dimStats]] /
    * [[dimCovariance]]. The DATA work is the same single distributed
    * moment pass ([[covSums]]); the iteration itself runs on the
    * driver over the dim² integer matrix (4096 longs at dim 64 — the
    * bounded-collect contract of Z-order bounds, NOT a corpus
    * collect), which is the right split at any corpus size: the
    * matrix is dim², never data-sized.
    *
    * Exactness: every step is integer arithmetic — covariance cells
    * `n·sp − s·s` (exact longs), a one-time descale by 2^23
    * (sign·(abs div), floor-on-magnitude, so truncating and flooring
    * engines agree), then `iters` rounds of matvec + L∞
    * renormalization to the 2^20 grid (the ·2^20/maxabs step widens
    * through 128-bit — BigInt here, HUGEINT in SQL). The final sign
    * is canonicalized by `Σv ≥ 0`. A SQL oracle replays every round
    * bit-for-bit; there is NO floating point anywhere until the
    * caller divides by 2^20 for display.
    *
    * Convergence is the standard (λ₂/λ₁)^iters rate — fast on
    * anisotropic data (spec-pinned against a planted dominant
    * direction), slow when the spectrum is flat, in which case the
    * result is a deterministic partial iterate, not a wrong answer.
    * Returns `(pos, loading_fp)` — fixed-point loadings, L∞ = 2^20. */
  def dimPrincipal(embeddings: DataFrame, dim: Int = 64, iters: Int = 12,
                   vecCol: String = "embedding"): DataFrame = {
    val row = covSums(embeddings, dim, vecCol).collect()(0)
    val n = row.getLong(0)
    // empty corpus: the moment arrays are empty aggregates — there is
    // no covariance and no principal direction; fail loudly rather
    // than index out of bounds or fabricate a vector
    require(n > 0, "dimPrincipal: input has no rows")
    val s = row.getSeq[Long](1)
    val sp = row.getSeq[Long](2)
    val cs = Array.tabulate(dim * dim) { k =>
      val num = n * sp(k) - s(k / dim) * s(k % dim)
      val m = math.abs(num) / 8388608L
      if (num < 0) -m else m
    }
    val v = powerIterate(cs, dim, iters)
    val spark = embeddings.sparkSession
    spark.createDataFrame(
      spark.sparkContext.parallelize(
        (0 until dim).map(i => org.apache.spark.sql.Row(i, v(i))), 1),
      org.apache.spark.sql.types.StructType(Seq(
        org.apache.spark.sql.types.StructField("pos",
          org.apache.spark.sql.types.IntegerType, nullable = false),
        org.apache.spark.sql.types.StructField("loading_fp",
          org.apache.spark.sql.types.LongType, nullable = false))))
  }

  /** Shared fixed-point power-iteration core: `iters` rounds of
    * integer matvec + L∞ renorm to the 2^20 grid, sum-sign flip. */
  private def powerIterate(cs: Array[Long], dim: Int, iters: Int): Array[Long] = {
    var v = Array.fill(dim)(1048576L)
    var it = 0
    while (it < iters) {
      val u = Array.tabulate(dim) { i =>
        var acc = 0L
        var j = 0
        while (j < dim) { acc += cs(i * dim + j) * v(j); j += 1 }
        acc
      }
      val m = u.map(math.abs).max
      if (m > 0L)
        v = u.map { x =>
          val t = (BigInt(math.abs(x)) * 1048576L / m).toLong
          if (x < 0) -t else t
        }
      it += 1
    }
    if (v.sum < 0) v.map(x => -x) else v
  }

  /** Top-`components` principal directions by power iteration WITH
    * integer Hotelling deflation: after each component, the matrix
    * loses its projection onto the found direction —
    * `C' = C − v·vᵀ·(vᵀCv)/(vᵀv)²` — with the per-cell adjustment
    * computed as sign·(|v_i·v_j·num| div den) through 128-bit
    * integers, so every deflated cell (and hence every later
    * component) is bit-reproducible in SQL (HUGEINT twin). The
    * leading component equals [[dimPrincipal]] exactly; later
    * components are the dominant directions of the exactly-deflated
    * matrix — deterministic iterates whose quality inherits the
    * usual power-iteration spectral-gap caveat, compounded by the
    * finite convergence of the earlier components (spec-pinned on
    * planted two-direction data). Returns
    * `(component 1-based, pos, loading_fp)`. */
  def dimPrincipalK(embeddings: DataFrame, dim: Int = 64, iters: Int = 12,
                    components: Int = 2,
                    vecCol: String = "embedding"): DataFrame = {
    require(components >= 1, "need at least one component")
    val row = covSums(embeddings, dim, vecCol).collect()(0)
    val n = row.getLong(0)
    require(n > 0, "dimPrincipalK: input has no rows")
    val s = row.getSeq[Long](1)
    val sp = row.getSeq[Long](2)
    val cs = Array.tabulate(dim * dim) { k =>
      val num = n * sp(k) - s(k / dim) * s(k % dim)
      val m = math.abs(num) / 8388608L
      if (num < 0) -m else m
    }
    val out = Seq.newBuilder[org.apache.spark.sql.Row]
    var c = 1
    while (c <= components) {
      val v = powerIterate(cs, dim, iters)
      var i = 0
      while (i < dim) { out += org.apache.spark.sql.Row(c, i, v(i)); i += 1 }
      if (c < components) {
        var num = BigInt(0)
        var vv = BigInt(0)
        i = 0
        while (i < dim) {
          var acc = 0L
          var j = 0
          while (j < dim) { acc += cs(i * dim + j) * v(j); j += 1 }
          num += BigInt(v(i)) * acc
          vv += BigInt(v(i)) * v(i)
          i += 1
        }
        val den = vv * vv
        if (den.signum > 0) {
          var k = 0
          while (k < dim * dim) {
            val t = BigInt(v(k / dim)) * v(k % dim) * num
            val adj = (t.abs / den).toLong
            cs(k) -= (if (t.signum < 0) -adj else adj)
            k += 1
          }
        }
      }
      c += 1
    }
    val spark = embeddings.sparkSession
    spark.createDataFrame(
      spark.sparkContext.parallelize(out.result(), 1),
      org.apache.spark.sql.types.StructType(Seq(
        org.apache.spark.sql.types.StructField("component",
          org.apache.spark.sql.types.IntegerType, nullable = false),
        org.apache.spark.sql.types.StructField("pos",
          org.apache.spark.sql.types.IntegerType, nullable = false),
        org.apache.spark.sql.types.StructField("loading_fp",
          org.apache.spark.sql.types.LongType, nullable = false))))
  }

  def dimStats(embeddings: DataFrame, vecCol: String = "embedding",
               wide: Boolean = false): DataFrame = {
    val q = col("q")
    val (sumQ, sumQ2) =
      if (wide) (sum(q.cast("decimal(38,0)")),
        sum(q.cast("decimal(38,0)") * q.cast("decimal(38,0)")))
      else (sum(q), sum(q * q))
    val variance =
      if (wide)
        // the ~1e26-magnitude products round independently in double
        // space, so a near-constant dimension can land the difference
        // slightly NEGATIVE by cancellation (sqrt → NaN); the true
        // value is provably ≥ 0, so clamp. The narrow path is exact
        // integer arithmetic and needs no clamp.
        greatest(
          col("n").cast("double") * col("sum_q2").cast("double") -
            col("sum_q").cast("double") * col("sum_q").cast("double"),
          lit(0.0))
      else (col("n") * col("sum_q2") - col("sum_q") * col("sum_q")).cast("double")
    embeddings
      .select(posexplode(col(vecCol)).as(Seq("pos", "v")))
      .select(col("pos").cast("long").as("pos"),
        floor(col("v").cast("double") * lit(1048576.0) + lit(0.5)).cast("long").as("q"))
      .groupBy("pos")
      .agg(count(lit(1)).as("n"), sumQ.as("sum_q"), sumQ2.as("sum_q2"))
      .select(col("pos"), col("n"), col("sum_q"), col("sum_q2"),
        round((col("sum_q") / lit(1048576.0)) / col("n"), 6).as("mean"),
        round(sqrt(variance) / (col("n") * lit(1048576.0)), 6).as("std"))
  }

  /** PCA projection / dimensionality reduction: every embedding's
    * coordinates along the top-`components` principal axes from
    * [[dimPrincipalK]] — the 64→k compression that feeds
    * visualization, coarse clustering, and drift monitoring on a
    * k-float footprint instead of 64.
    *
    * Determinism contract: the loadings are the power-iteration
    * fixed-point INTEGERS (driver-side, dim²-bounded as documented
    * on dimPrincipalK), broadcast into the plan as literal double
    * arrays; each projection is one left-to-right fold of
    * exactly-rounded products (the same accumulation-order contract
    * the cosine gates rely on), scaled by 2⁻²⁰ once at the end.
    * Projection itself is a narrow per-row map — at 100 TB the only
    * driver work is the dim² covariance the PCA already needs. */
  def pcaProject(embeddings: DataFrame, components: Int = 2, dim: Int = 64,
                 iters: Int = 12, vecCol: String = "embedding",
                 idCol: String = "vec_id"): DataFrame = {
    val lv: Map[Int, Array[Long]] =
      dimPrincipalK(embeddings, dim, iters, components, vecCol).collect()
        .groupBy(_.getInt(0))
        .map { case (c, rows) =>
          c -> rows.sortBy(_.getInt(1)).map(_.getLong(2))
        }
    val projCols = (1 to components).map { c =>
      val arr = array(lv(c).map(x => lit(x.toDouble)): _*)
      // TRUE orthonormal-axis coordinate: divide by the loading
      // vector's L2 norm, not the 2^20 L∞ grid — the fixed-point
      // loadings have per-component L2 anywhere in [2^20, √dim·2^20],
      // and without this the components' coordinates are mutually
      // incomparable (up to 8× at dim 64). The norm is exact in
      // double (Σ w², w ≤ 2^20, dim ≤ 64 → every partial sum < 2^53),
      // so the SQL oracle's sqrt(list_dot_product(w, w)) lands on the
      // identical double regardless of summation order. A collapsed
      // all-zero component divides by 1 (its projection is 0 anyway).
      val n = math.sqrt(lv(c).map(x => x.toDouble * x.toDouble).sum)
      val safeN = if (n == 0.0) 1.0 else n
      round(aggregate(
        zip_with(col(vecCol).cast("array<double>"), arr, (a, b) => a * b),
        lit(0.0), (acc, t) => acc + t) / lit(safeN), 6).as(s"pc$c")
    }
    embeddings.select(col(idCol) +: projCols: _*)
  }
}
