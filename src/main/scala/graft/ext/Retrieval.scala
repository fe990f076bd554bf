package graft.ext

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Inverted-index retrieval over a document corpus: posting lists,
  * document statistics, and BM25 ranking — the lexical-search
  * complement of the embedding ANN stack in [[Similarity]] (RAG
  * training pipelines mine hard negatives and dedup retrieval sets
  * with exactly this pair of engines).
  *
  * 100 TB posture: the index build is ONE shuffle on (term, doc) with
  * map-side partial aggregation, and the document length rides inside
  * the posting row, so scoring never joins back to the corpus. Query
  * scoring prunes the postings to the query's terms BEFORE any
  * exchange (a plan-time literal filter, or a broadcast semi-join
  * that Catalyst pushes below the postings aggregate for the batch
  * form), then attaches per-term document frequency via a BROADCAST
  * of the tiny (term, df) aggregate — deliberately not a per-term
  * window, whose single partition for a stopword-hot term would be
  * the classic skew trap.
  *
  * The convenience forms that take the raw corpus derive the postings
  * twice (score side + df side — both semi-pruned before their
  * exchange, but still two corpus scans). The scale path is the
  * production one: persist [[postings]] as parquet ONCE per corpus
  * version and serve every query from [[bm25TopKFromPostings]] /
  * [[bm25BatchFromPostings]], where each consumer reads the compact
  * index — term filters reach the parquet scan as pushed filters —
  * and the text is never re-tokenized.
  */
object Retrieval {

  /** Whitespace/lowercase tokenizer — the same normalization the
    * text-analysis battery uses, reproduced verbatim in the DuckDB
    * oracles. */
  private def tokens(text: Column): Column = split(lower(text), "\\s+")

  /** Query-side tokenizer — the ONE driver-side mirror of [[tokens]]
    * (lowercase, whitespace split, empties dropped), shared by every
    * ranker and the phrase matcher so a tokenization fix cannot fork
    * their candidate sets. Order and duplicates preserved; callers
    * that want a term SET apply `.distinct`. */
  private def queryTerms(query: String): Seq[String] =
    query.toLowerCase.split("\\s+").filter(_.nonEmpty).toSeq

  /** Posting lists: one row per (term, doc_id) with term frequency
    * and the document's token count (BM25's length normalization —
    * kept denormalized in the posting so queries never rejoin the
    * corpus). The groupBy partial-aggregates map-side, so the one
    * shuffle moves (term, doc, dl, count) tuples, not raw token
    * occurrences. */
  def postings(docs: DataFrame, idCol: String, textCol: String): DataFrame =
    docs.select(col(idCol).as("doc_id"),
        TextAnalysis.tokenCountWs(col(textCol)).cast("long").as("dl"),
        explode(tokens(col(textCol))).as("term"))
      .filter(length(col("term")) > 0)
      .groupBy("term", "doc_id", "dl").agg(count(lit(1)).as("tf"))

  /** Corpus normalizers (n_docs, avgdl) recovered from a postings
    * frame: a distinct over the narrow (doc_id, dl) projection — on a
    * persisted index this is a 2-column parquet scan. Pipelines that
    * already track corpus stats can pass their own 1-row frame to the
    * FromPostings entry points instead. */
  def postingsStats(post: DataFrame): DataFrame =
    post.select(col("doc_id"), col("dl")).distinct()
      .agg(count(lit(1)).as("n_docs"), avg(col("dl").cast("double")).as("avgdl"))

  /** Corpus stats straight from the raw corpus (narrow 2-column
    * scan) — used by the convenience forms so stats stay correct even
    * though their scoring side sees term-pruned postings. */
  private def corpusStats(docs: DataFrame, idCol: String, textCol: String): DataFrame =
    docs.agg(count(lit(1)).as("n_docs"),
      avg(TextAnalysis.tokenCountWs(col(textCol)).cast("double")).as("avgdl"))

  /** Lucene-style BM25 idf: ln(1 + (N − df + 0.5)/(df + 0.5)) —
    * always positive, so a term in most documents dampens rather
    * than flips the score. */
  private def idf(dfCol: Column, nDocs: Column): Column =
    log(lit(1.0) + (nDocs - dfCol + lit(0.5)) / (dfCol + lit(0.5)))

  private def bm25Term(tf: Column, dl: Column, avgdl: Column,
                       k1: Double, b: Double): Column =
    tf * (lit(k1) + 1.0) / (tf + lit(k1) * (lit(1.0) - lit(b) + lit(b) * dl / avgdl))

  /** Score pruned postings (already restricted to the query's terms)
    * and keep top `k` per query. `keyed` must carry (query_id, term,
    * doc_id, dl, tf, df). */
  private def score(keyed: DataFrame, stats: DataFrame, k: Int,
                    k1: Double, b: Double): DataFrame = {
    val w = Window.partitionBy("query_id").orderBy(desc("score"), col("doc_id"))
    keyed.crossJoin(broadcast(stats))
      .select(col("query_id"), col("doc_id"),
        // each term's contribution is quantized to 9 decimals BEFORE
        // the per-document sum, so partial-aggregation order cannot
        // move the 6-decimal reported score (the oracle twins this)
        round(idf(col("df"), col("n_docs")) *
          bm25Term(col("tf"), col("dl"), col("avgdl"), k1, b), 9).as("s"))
      .groupBy("query_id", "doc_id").agg(round(sum(col("s")), 6).as("score"))
      .withColumn("rank", row_number().over(w).cast("long"))
      .filter(col("rank") <= k)
  }

  /** BM25 top-`k` from a (possibly persisted) postings frame. The
    * query's DISTINCT terms are a plan-time literal `isin` filter —
    * static pruning, no join, pushed to the index's parquet scan.
    * Returns (doc_id, score, rank) ordered by rank. */
  def bm25TopKFromPostings(post: DataFrame, stats: DataFrame, query: String,
                           k: Int, k1: Double = 1.2, b: Double = 0.75): DataFrame = {
    val terms = queryTerms(query).distinct
    require(terms.nonEmpty, "bm25: query has no terms")
    val pruned = post.filter(col("term").isin(terms: _*))
    val dfT = pruned.groupBy("term").agg(count(lit(1)).as("df"))
    score(pruned.join(broadcast(dfT), "term").withColumn("query_id", lit(0L)),
        stats, k, k1, b)
      .select(col("doc_id"), col("score"), col("rank"))
      .orderBy("rank")
  }

  /** Batch BM25 from a (possibly persisted) postings frame: top-`k`
    * per query for a whole frame of (query_id, query_text) rows — the
    * retrieval-mining shape (hard-negative candidates for a
    * contrastive set, decontamination lookups).
    *
    * The query side is benchmarks/training prompts — MBs against an
    * index of TBs — so its term set broadcasts: first a semi-join
    * that prunes the postings map-side, then the (query_id, term)
    * attach that fans each posting out to the queries containing its
    * term. Document frequency comes from the pruned postings BEFORE
    * the query attach (the fan-out would double-count df). */
  def bm25BatchFromPostings(post: DataFrame, stats: DataFrame,
                            queries: DataFrame, qidCol: String, qtextCol: String,
                            k: Int, k1: Double = 1.2, b: Double = 0.75): DataFrame =
    bm25BatchFromTerms(post, stats,
      queries
        .select(col(qidCol).as("query_id"), explode(tokens(col(qtextCol))).as("term"))
        .filter(length(col("term")) > 0)
        .distinct(),
      k, k1, b)

  /** Batch BM25 from a pre-built DISTINCT (query_id, term) frame —
    * the entry point expansion techniques compose on (the term set
    * need not come from query text). Same broadcast shapes as
    * [[bm25BatchFromPostings]]. */
  def bm25BatchFromTerms(post: DataFrame, stats: DataFrame, qTerms: DataFrame,
                         k: Int, k1: Double = 1.2, b: Double = 0.75): DataFrame = {
    // NOTE (opt r17): the pruned postings feed two consumers (df and
    // the scoring join), so `post` with explode lineage tokenizes the
    // corpus twice. A localCheckpoint pin was measured at only −17%
    // executor time here, and a per-term df window would re-partition
    // the postings on the skew-prone term key — both rejected; the
    // double evaluation is the deliberate trade for keeping every
    // exchange off `term`.
    val pruned = post.join(broadcast(qTerms.select("term").distinct()),
      Seq("term"), "left_semi")
    val dfT = pruned.groupBy("term").agg(count(lit(1)).as("df"))
    score(pruned.join(broadcast(dfT), "term").join(broadcast(qTerms), "term"),
      stats, k, k1, b)
  }

  /** Pseudo-relevance feedback (RM3-lite): run BM25, harvest the
    * `fbTerms` most frequent NON-query terms from each query's top
    * `fbDocs` documents (tf summed over the feedback docs, ties to
    * the lexicographically smaller term), union them into the term
    * set, and re-score — the classic recall lever when queries are
    * short and the corpus vocabulary drifts from query language.
    *
    * Scale: the feedback-doc frame is queries × fbDocs rows —
    * broadcast into a map-side join that prunes the postings to the
    * feedback docs (no shuffle of the postings on doc_id); both
    * scoring passes are the standard broadcast-pruned batch path. */
  def bm25Prf(post: DataFrame, stats: DataFrame,
              queries: DataFrame, qidCol: String, qtextCol: String, k: Int,
              fbDocs: Int = 5, fbTerms: Int = 3,
              k1: Double = 1.2, b: Double = 0.75): DataFrame = {
    val qTerms = queries
      .select(col(qidCol).as("query_id"), explode(tokens(col(qtextCol))).as("term"))
      .filter(length(col("term")) > 0)
      .distinct()
    val topDocs = bm25BatchFromTerms(post, stats, qTerms, fbDocs, k1, b)
      .select(col("query_id"), col("doc_id"))
    val w = Window.partitionBy("query_id").orderBy(desc("fb_tf"), col("term"))
    val expansion = post.join(broadcast(topDocs), "doc_id")
      .join(qTerms, Seq("query_id", "term"), "left_anti") // non-query terms only
      .groupBy("query_id", "term").agg(sum("tf").as("fb_tf"))
      .withColumn("rn", row_number().over(w))
      .filter(col("rn") <= fbTerms)
      .select("query_id", "term")
    bm25BatchFromTerms(post, stats, qTerms.unionByName(expansion).distinct(),
      k, k1, b)
  }

  /** POSITIONAL posting lists: like [[postings]] plus the sorted
    * 0-based token positions of each term in the document — the index
    * layout phrase and proximity queries need. Same ONE shuffle; the
    * positions array adds O(tf) ints per posting row (the classic
    * positional-index overhead). */
  def positionalPostings(docs: DataFrame, idCol: String, textCol: String): DataFrame =
    docs.select(col(idCol).as("doc_id"),
        TextAnalysis.tokenCountWs(col(textCol)).cast("long").as("dl"),
        posexplode(tokens(col(textCol))).as(Seq("pos", "term")))
      .filter(length(col("term")) > 0)
      .groupBy("term", "doc_id", "dl")
      .agg(sort_array(collect_list(col("pos"))).as("positions"),
        count(lit(1)).as("tf"))

  /** Phrase search over a positional postings frame: documents
    * containing `phrase`'s terms in order, with the occurrence
    * count — (doc_id, n_occurrences), hits only. `slop = 0` is the
    * exact adjacent phrase; `slop > 0` is ordered proximity — term i
    * may land anywhere in [p+i, p+i+slop] (each later term allowed up
    * to `slop` extra positions of slack after the previous ideal
    * spot).
    *
    * The phrase's terms prune the postings with a plan-time literal
    * filter (pushed to a persisted index's scan); each term's posting
    * then equi-joins on doc_id — k−1 narrow joins among lists already
    * restricted to the phrase's terms, never a corpus scan. The
    * position test is per-row array arithmetic: an occurrence is a
    * position p of the first term with every later term inside its
    * window. */
  def phraseSearch(post: DataFrame, phrase: String, slop: Int = 0): DataFrame = {
    val terms = queryTerms(phrase)
    require(terms.nonEmpty, "phraseSearch: empty phrase")
    require(slop >= 0, "phraseSearch: negative slop")
    val pruned = post.filter(col("term").isin(terms.distinct: _*))
    def termPos(i: Int): DataFrame = pruned
      .filter(col("term") === terms(i))
      .select(col("doc_id"), col("positions").as(s"p$i"))
    val joined = (1 until terms.length).foldLeft(termPos(0)) {
      (acc, i) => acc.join(termPos(i), "doc_id")
    }
    def inWindow(pi: Column, p: Column, i: Int): Column =
      if (slop == 0) array_contains(pi, p + i)
      else exists(pi, q => q >= p + i && q <= p + i + slop)
    val matched = (1 until terms.length).foldLeft(col("p0")) {
      (acc, i) => filter(acc, p => inWindow(col(s"p$i"), p, i))
    }
    joined.select(col("doc_id"), size(matched).cast("long").as("n_occurrences"))
      .filter(col("n_occurrences") > 0)
  }

  /** Convenience phrase search straight off a corpus frame. */
  def phraseSearch(docs: DataFrame, idCol: String, textCol: String,
                   phrase: String): DataFrame =
    phraseSearch(positionalPostings(docs, idCol, textCol), phrase)

  /** Convenience ordered-proximity search off a corpus frame. */
  def proximitySearch(docs: DataFrame, idCol: String, textCol: String,
                      phrase: String, slop: Int): DataFrame =
    phraseSearch(positionalPostings(docs, idCol, textCol), phrase, slop)

  /** Boolean retrieval over a postings frame: documents containing
    * EVERY term of `must`, at least one of `should` (ignored when
    * empty), and none of `mustNot` — pure posting-list algebra
    * (k semi-joins + one anti-join on doc_id among lists already
    * pruned to the query's terms), the filter stage a retrieval
    * pipeline runs before any scoring. Returns distinct doc_ids. */
  def booleanSearch(post: DataFrame, must: Seq[String],
                    should: Seq[String] = Nil, mustNot: Seq[String] = Nil): DataFrame = {
    require(must.nonEmpty || should.nonEmpty, "booleanSearch: no positive terms")
    def docsWith(term: String): DataFrame =
      post.filter(col("term") === term.toLowerCase).select("doc_id")
    val positive =
      if (must.nonEmpty) must.map(docsWith).reduce(_.join(_, Seq("doc_id"), "left_semi"))
      else should.map(docsWith).reduce(_ unionAll _).distinct()
    val withShould =
      if (must.nonEmpty && should.nonEmpty)
        positive.join(should.map(docsWith).reduce(_ unionAll _),
          Seq("doc_id"), "left_semi")
      else positive
    val negative = mustNot.map(docsWith)
    val base = withShould.distinct()
    if (negative.isEmpty) base
    else base.join(negative.reduce(_ unionAll _), Seq("doc_id"), "left_anti")
  }

  /** BM25 hard-negative mining — the retrieval-training data shape
    * (Karpukhin et al., "Dense Passage Retrieval", EMNLP 2020): for
    * each (query, positive) pair, the `negPerQuery` highest-BM25
    * documents that are NOT the positive. Lexically-close-but-wrong
    * documents are what a contrastive ranker must learn to push
    * below the positive; random negatives (the
    * [[Sampling.negativePairs]] draw) are too easy.
    *
    * `queries` carries (qidCol, qtextCol, posCol). Candidates come
    * from the top `candK` of the batch scorer, so a positive inside
    * the shortlist still leaves candK−1 candidates.
    *
    * Scale: candidate generation is [[bm25BatchFromPostings]] — the
    * postings prune map-side against the broadcast query-term set
    * and never shuffle on doc_id; the (query, positive) frame is
    * queries-sized and broadcasts into the exclusion join; the
    * re-rank window partitions on query_id over ≤candK rows. */
  def hardNegatives(post: DataFrame, stats: DataFrame, queries: DataFrame,
                    qidCol: String, qtextCol: String, posCol: String,
                    negPerQuery: Int, candK: Int,
                    k1: Double = 1.2, b: Double = 0.75): DataFrame = {
    require(candK > negPerQuery, "hardNegatives: candK must exceed negPerQuery")
    val ranked = bm25BatchFromPostings(post, stats, queries, qidCol, qtextCol,
      candK, k1, b)
    val pos = queries.select(col(qidCol).as("query_id"), col(posCol).as("pos_id"))
    val w = Window.partitionBy("query_id").orderBy("rank")
    ranked.join(broadcast(pos), "query_id")
      .filter(col("doc_id") =!= col("pos_id"))
      .withColumn("neg_rank", row_number().over(w).cast("long"))
      .filter(col("neg_rank") <= negPerQuery)
      .select(col("query_id"), col("pos_id"), col("doc_id").as("neg_id"),
        col("neg_rank"), col("score"))
  }

  /** Convenience hard-negative form over the raw corpus. */
  def hardNegatives(docs: DataFrame, idCol: String, textCol: String,
                    queries: DataFrame, qidCol: String, qtextCol: String,
                    posCol: String, negPerQuery: Int, candK: Int): DataFrame =
    hardNegatives(postings(docs, idCol, textCol),
      corpusStats(docs, idCol, textCol), queries, qidCol, qtextCol, posCol,
      negPerQuery, candK)

  /** Dirichlet-smoothed query-likelihood top-`k` (Zhai & Lafferty,
    * SIGIR 2001) — the classical probabilistic LM baseline next to
    * BM25, in its sparse rank-equivalent decomposition:
    *
    *   score(q,d) = Σ_{w ∈ q∩d} log(1 + tf / (μ · cf_w / |C|))
    *              + |q| · log(μ / (dl + μ))
    *
    * where `cf_w` is the COLLECTION frequency of `w` and `|C|` the
    * total token count (derived as `n_docs · avgdl` from the same
    * stats frame BM25 uses). The first sum runs only over matching
    * postings — index-sparse, identical pruning to BM25 (static
    * `isin` pushed to the postings scan) — and the second term is a
    * per-document constant, so candidates are docs holding ≥ 1 query
    * term, like every sparse ranker here. μ defaults to 2000, the
    * original paper's long-query sweet spot. A repeated query term
    * weights its contribution by its query frequency, and `|q|` is
    * the TOTAL token count — the faithful Zhai–Lafferty likelihood,
    * not the distinct-term approximation. Per-term contributions
    * quantize to 9 decimals before the sum (the oracle twins this),
    * score reports at 6. Returns (doc_id, score, rank). */
  def qlTopKFromPostings(post: DataFrame, stats: DataFrame, query: String,
                         k: Int, mu: Double = 2000.0): DataFrame = {
    val toks = queryTerms(query)
    require(toks.nonEmpty, "ql: query has no terms")
    val qtf = toks.groupBy(identity).view.mapValues(_.size).toMap
    val terms = qtf.keys.toSeq.sorted
    val pruned = post.filter(col("term").isin(terms: _*))
    val cfT = pruned.groupBy("term")
      .agg(sum(col("tf")).cast("double").as("cf"))
    // query term frequency rides the plan as one map literal
    val qtfCol = element_at(
      map(terms.flatMap(t => Seq(lit(t), lit(qtf(t).toDouble))): _*),
      col("term"))
    val w = Window.orderBy(desc("score"), col("doc_id"))
    pruned.join(broadcast(cfT), "term").crossJoin(broadcast(stats))
      .select(col("doc_id"), col("dl"),
        round(qtfCol * log(lit(1.0) +
          col("tf") / (lit(mu) * col("cf") / (col("n_docs") * col("avgdl")))),
          9).as("s"))
      .groupBy(col("doc_id"), col("dl"))
      .agg(sum(col("s")).as("s1"))
      .select(col("doc_id"),
        round(col("s1") +
          lit(toks.length.toDouble) * log(lit(mu) / (col("dl") + lit(mu))),
          6).as("score"))
      .withColumn("rank", row_number().over(w).cast("long"))
      .filter(col("rank") <= k)
      .orderBy("rank")
  }

  /** Convenience single-query form of the Dirichlet LM ranker. */
  def qlTopK(docs: DataFrame, idCol: String, textCol: String, query: String,
             k: Int, mu: Double = 2000.0): DataFrame =
    qlTopKFromPostings(postings(docs, idCol, textCol),
      corpusStats(docs, idCol, textCol), query, k, mu)

  /** Convenience single-query form over the raw corpus. */
  def bm25TopK(docs: DataFrame, idCol: String, textCol: String, query: String,
               k: Int, k1: Double = 1.2, b: Double = 0.75): DataFrame =
    bm25TopKFromPostings(postings(docs, idCol, textCol),
      corpusStats(docs, idCol, textCol), query, k, k1, b)

  /** Convenience batch form over the raw corpus. */
  def bm25Batch(docs: DataFrame, idCol: String, textCol: String,
                queries: DataFrame, qidCol: String, qtextCol: String,
                k: Int, k1: Double = 1.2, b: Double = 0.75): DataFrame =
    bm25BatchFromPostings(postings(docs, idCol, textCol),
      corpusStats(docs, idCol, textCol), queries, qidCol, qtextCol, k, k1, b)

  /** Reciprocal-rank fusion (Cormack, Clarke & Büttcher, SIGIR 2009)
    * of two per-query candidate lists — the standard score-free way
    * to combine lexical and dense retrieval (incomparable score
    * scales fuse by RANK: rrf = Σ 1/(kRrf + rank)). Inputs are
    * `(query_id, doc_id, score)` frames; each is ranked per query by
    * (score desc, doc_id), joined full-outer on (query_id, doc_id)
    * — a doc missing from one list contributes 0 from that list —
    * and the top `topN` per query survive (ties → smaller doc_id).
    *
    * Determinism: every rrf value is a sum of two exactly-rounded
    * rationals 1/(k+r) computed in a fixed order — bit-identical in
    * any engine, so the fused ORDER is value-checkable. Scale: the
    * inputs are per-query top-k lists (bounded), so the rank windows
    * and the join are per-query-bounded; nothing corpus-sized moves. */
  def rrfFuse(a: DataFrame, b: DataFrame, kRrf: Int = 60,
              topN: Int = 10): DataFrame = {
    require(kRrf >= 1 && topN >= 1, "need kRrf >= 1 and topN >= 1")
    def ranked(df: DataFrame, name: String) = {
      val w = Window.partitionBy("query_id").orderBy(desc("score"), col("doc_id"))
      df.select(col("query_id"), col("doc_id"), row_number().over(w).as(name))
    }
    val fused = ranked(a, "ra").join(ranked(b, "rb"),
        Seq("query_id", "doc_id"), "full_outer")
      .withColumn("rrf",
        coalesce(lit(1.0) / (col("ra") + kRrf), lit(0.0)) +
          coalesce(lit(1.0) / (col("rb") + kRrf), lit(0.0)))
    val w2 = Window.partitionBy("query_id").orderBy(desc("rrf"), col("doc_id"))
    fused.withColumn("__rn", row_number().over(w2))
      .filter(col("__rn") <= topN).drop("__rn")
  }
}
