package graft.queries

import graft.QueryDef
import graft.ext.Retrieval
import graft.sources.Tables
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Inverted-index / BM25 retrieval gate queries. The DuckDB oracles
  * reproduce the scoring arithmetic with the identical expression
  * trees (same parenthesization, natural log, double math); each
  * term's contribution is rounded to 9 decimals on both sides before
  * the per-document sum so aggregation ORDER can never move the
  * 6-decimal reported score.
  */
object RetrievalQueries {

  private def t(s: SparkSession, dir: String, n: String): DataFrame =
    Tables(s, dir).table(n)

  /** Shared oracle scaffolding: postings with in-row document length,
    * document frequency, corpus stats — the SQL twin of
    * [[Retrieval.postings]] / corpusStats. `termFilter` restricts the
    * postings (SQL boolean over `term`). */
  private def oraclePost(termFilter: String): String =
    s"""toks AS (
       |  SELECT doc_id, len(string_split_regex(text, '\\s+')) AS dl,
       |         unnest(string_split_regex(lower(text), '\\s+')) AS term
       |  FROM documents),
       |post AS (
       |  SELECT term, doc_id, dl, count(*) AS tf
       |  FROM toks WHERE len(term) > 0 AND ($termFilter)
       |  GROUP BY 1, 2, 3),
       |dfT AS (SELECT term, count(*) AS df FROM post GROUP BY 1),
       |stats AS (
       |  SELECT count(*) AS n_docs,
       |         avg(len(string_split_regex(text, '\\s+')) * 1.0) AS avgdl
       |  FROM documents)""".stripMargin

  /** Per-(term, doc) BM25 contribution, k1 = 1.2, b = 0.75 — textual
    * twin of Retrieval.idf × Retrieval.bm25Term, rounded to 9. */
  private val oracleTermScore: String =
    """round(ln(1.0 + (s.n_docs - df + 0.5) / (df + 0.5)) *
      |  tf * (1.2 + 1.0) / (tf + 1.2 * (1.0 - 0.75 + 0.75 * dl / s.avgdl)), 9)""".stripMargin

  def defs: Seq[QueryDef] = Seq(

    // Single-query BM25 top-10: literal term pruning reaches the
    // postings before any exchange; ranking is TakeOrderedAndProject.
    QueryDef("q_ir_bm25",
      (s, d) => Retrieval.bm25TopK(t(s, d, "documents"), "doc_id", "text",
        "spark join window table", k = 10),
      Some(s"""WITH ${oraclePost("term IN ('spark','join','window','table')")},
             |scored AS (
             |  SELECT doc_id, round(sum($oracleTermScore), 6) AS score
             |  FROM post JOIN dfT USING (term), stats s
             |  GROUP BY doc_id)
             |SELECT doc_id, score, rank FROM (
             |  SELECT doc_id, score,
             |         row_number() OVER (ORDER BY score DESC, doc_id) AS rank
             |  FROM scored)
             |WHERE rank <= 10 ORDER BY rank""".stripMargin), bench = true),

    // Dirichlet query-likelihood top-10 (Zhai & Lafferty) — the
    // classical probabilistic LM ranker beside BM25, same pruned
    // postings, different arithmetic: matching terms contribute
    // log(1 + tf/(μ·cf/|C|)) and every candidate pays the
    // |q|·log(μ/(dl+μ)) length normalizer. The oracle re-derives
    // collection frequencies and the identical expression tree.
    QueryDef("q_ir_qld",
      (s, d) => Retrieval.qlTopK(t(s, d, "documents"), "doc_id", "text",
        "spark join window table", k = 10),
      Some(s"""WITH ${oraclePost("term IN ('spark','join','window','table')")},
             |cfT AS (
             |  SELECT term, CAST(sum(tf) AS DOUBLE) AS cf
             |  FROM post GROUP BY 1),
             |scored AS (
             |  SELECT doc_id,
             |    round(sum(round(ln(1.0 +
             |        tf / (2000.0 * cf / (s.n_docs * s.avgdl))), 9))
             |      + 4.0 * ln(2000.0 / (dl + 2000.0)), 6) AS score
             |  FROM post JOIN cfT USING (term), stats s
             |  GROUP BY doc_id, dl)
             |SELECT doc_id, score, rank FROM (
             |  SELECT doc_id, score,
             |         row_number() OVER (ORDER BY score DESC, doc_id) AS rank
             |  FROM scored)
             |WHERE rank <= 10 ORDER BY rank""".stripMargin), bench = true),

    // Persisted-index lifecycle: build the postings, write them as
    // parquet, read them back, and serve the query from the persisted
    // frame (stats recovered from the index's narrow (doc_id, dl)
    // projection). Deterministic build makes rebuild ≡ reload, so the
    // oracle is the same scoring SQL — any drift in write → scan →
    // score hash-fails the gate.
    QueryDef("q_ir_index",
      (s, d) => {
        val dir = graft.Scratch.tempDir("graft_iridx_")
        Retrieval.postings(t(s, d, "documents"), "doc_id", "text")
          .write.mode("overwrite").parquet(dir)
        val post = s.read.parquet(dir)
        Retrieval.bm25TopKFromPostings(post, Retrieval.postingsStats(post),
          "customer order data group", k = 10)
      },
      Some(s"""WITH ${oraclePost("term IN ('customer','order','data','group')")},
             |scored AS (
             |  SELECT doc_id, round(sum($oracleTermScore), 6) AS score
             |  FROM post JOIN dfT USING (term), stats s
             |  GROUP BY doc_id)
             |SELECT doc_id, score, rank FROM (
             |  SELECT doc_id, score,
             |         row_number() OVER (ORDER BY score DESC, doc_id) AS rank
             |  FROM scored)
             |WHERE rank <= 10 ORDER BY rank""".stripMargin)),

    // Incremental index maintenance: postings for the first corpus
    // cut are persisted, the late-arriving delta's postings APPEND to
    // the same index directory (no rebuild, no read of the existing
    // postings — the delta tokenizes itself and nothing else), and
    // the merged index serves queries identically to a full rebuild:
    // the oracle scores the WHOLE corpus. df/avgdl derive from the
    // merged postings at query time, so they are exact after any
    // number of appends.
    QueryDef("q_ir_inc",
      (s, d) => {
        val docs = t(s, d, "documents")
        val dir = graft.Scratch.tempDir("graft_irinc_")
        Retrieval.postings(docs.filter(col("doc_id") < 400), "doc_id", "text")
          .write.mode("overwrite").parquet(dir)
        Retrieval.postings(docs.filter(col("doc_id") >= 400), "doc_id", "text")
          .write.mode("append").parquet(dir)
        val post = s.read.parquet(dir)
        Retrieval.bm25TopKFromPostings(post, Retrieval.postingsStats(post),
          "spark join window table", k = 10)
      },
      Some(s"""WITH ${oraclePost("term IN ('spark','join','window','table')")},
             |scored AS (
             |  SELECT doc_id, round(sum($oracleTermScore), 6) AS score
             |  FROM post JOIN dfT USING (term), stats s
             |  GROUP BY doc_id)
             |SELECT doc_id, score, rank FROM (
             |  SELECT doc_id, score,
             |         row_number() OVER (ORDER BY score DESC, doc_id) AS rank
             |  FROM scored)
             |WHERE rank <= 10 ORDER BY rank""".stripMargin)),

    // Pseudo-relevance feedback (RM3-lite): first BM25 pass, harvest
    // the 3 most frequent non-query terms from each query's top-5
    // docs, re-score with the expanded term set. The oracle replays
    // BOTH passes including the feedback harvest — an expansion
    // drift anywhere flips the final ranking and hash-fails.
    QueryDef("q_ir_prf",
      (s, d) => {
        val docs = t(s, d, "documents")
        val q = docs.filter(col("doc_id") % 251 === 0)
          .select(col("doc_id").as("query_id"),
            array_join(slice(split(col("text"), " "), 1, 8), " ").as("qtext"))
        val post = Retrieval.postings(docs, "doc_id", "text")
        val stats = Retrieval.postingsStats(post)
        Retrieval.bm25Prf(post, stats, q, "query_id", "qtext", k = 5)
          .orderBy("query_id", "rank")
      },
      Some(s"""WITH queries AS (
             |  SELECT doc_id AS query_id,
             |         array_to_string(string_split(text, ' ')[1:8], ' ') AS qtext
             |  FROM documents WHERE doc_id % 251 = 0),
             |qterms AS (
             |  SELECT DISTINCT query_id,
             |         unnest(string_split_regex(lower(qtext), '\\s+')) AS term
             |  FROM queries),
             |${oraclePost("TRUE")},
             |df1 AS (SELECT term, count(*) AS df FROM post
             |        WHERE term IN (SELECT term FROM qterms) GROUP BY 1),
             |s1 AS (
             |  SELECT q.query_id, p.doc_id, round(sum($oracleTermScore), 6) AS score
             |  FROM post p JOIN df1 df_t USING (term) JOIN qterms q USING (term),
             |       stats s
             |  GROUP BY 1, 2),
             |top1 AS (
             |  SELECT query_id, doc_id FROM (
             |    SELECT query_id, doc_id,
             |           row_number() OVER (PARTITION BY query_id
             |                              ORDER BY score DESC, doc_id) AS rk
             |    FROM s1) WHERE rk <= 5),
             |fb AS (
             |  SELECT t.query_id, p.term, sum(p.tf) AS fb_tf
             |  FROM post p JOIN top1 t USING (doc_id)
             |  ANTI JOIN qterms q2 ON q2.query_id = t.query_id AND q2.term = p.term
             |  GROUP BY 1, 2),
             |exp AS (
             |  SELECT query_id, term FROM (
             |    SELECT query_id, term,
             |           row_number() OVER (PARTITION BY query_id
             |                              ORDER BY fb_tf DESC, term) AS rn
             |    FROM fb) WHERE rn <= 3),
             |allterms AS (
             |  SELECT query_id, term FROM qterms
             |  UNION SELECT query_id, term FROM exp),
             |df2 AS (SELECT term, count(*) AS df FROM post
             |        WHERE term IN (SELECT term FROM allterms) GROUP BY 1),
             |s2 AS (
             |  SELECT a.query_id, p.doc_id, round(sum($oracleTermScore), 6) AS score
             |  FROM post p JOIN df2 df_t USING (term) JOIN allterms a USING (term),
             |       stats s
             |  GROUP BY 1, 2)
             |SELECT query_id, doc_id, score, rank FROM (
             |  SELECT query_id, doc_id, score,
             |         row_number() OVER (PARTITION BY query_id
             |                            ORDER BY score DESC, doc_id) AS rank
             |  FROM s2)
             |WHERE rank <= 5 ORDER BY query_id, rank""".stripMargin)),

    // Boolean retrieval: (spark AND join) AND (stream OR batch) AND
    // NOT window — posting-list algebra only (semi/anti joins over
    // term-pruned lists), the pre-scoring filter stage.
    QueryDef("q_ir_boolean",
      (s, d) => Retrieval.booleanSearch(
        Retrieval.postings(t(s, d, "documents"), "doc_id", "text"),
        must = Seq("spark", "join"), should = Seq("stream", "batch"),
        mustNot = Seq("window")).orderBy("doc_id"),
      Some("""WITH toks AS (
             |  SELECT DISTINCT doc_id,
             |         unnest(string_split_regex(lower(text), '\s+')) AS term
             |  FROM documents)
             |SELECT doc_id FROM documents
             |WHERE doc_id IN (SELECT doc_id FROM toks WHERE term = 'spark')
             |  AND doc_id IN (SELECT doc_id FROM toks WHERE term = 'join')
             |  AND doc_id IN (SELECT doc_id FROM toks
             |                 WHERE term = 'stream' OR term = 'batch')
             |  AND doc_id NOT IN (SELECT doc_id FROM toks WHERE term = 'window')
             |ORDER BY doc_id""".stripMargin)),

    // Exact-phrase search over the positional index: documents where
    // "table value" occurs ADJACENTLY, with occurrence counts. The
    // phrase's terms prune the positional postings before their one
    // shuffle; adjacency is per-row array arithmetic.
    QueryDef("q_ir_phrase",
      (s, d) => Retrieval.phraseSearch(t(s, d, "documents"), "doc_id", "text",
        "table value").orderBy("doc_id"),
      Some("""WITH tokd AS (
             |  SELECT doc_id, string_split_regex(lower(text), '\s+') AS t
             |  FROM documents),
             |tp AS (
             |  SELECT doc_id, t[r.i + 1] AS term, r.i AS pos
             |  FROM tokd, LATERAL (SELECT unnest(range(0, len(t)))) AS r(i)
             |  WHERE len(t[r.i + 1]) > 0),
             |pos AS (
             |  SELECT doc_id, term, list(pos ORDER BY pos) AS ps
             |  FROM tp GROUP BY 1, 2),
             |a AS (SELECT doc_id, ps AS p0 FROM pos WHERE term = 'table'),
             |b AS (SELECT doc_id, ps AS p1 FROM pos WHERE term = 'value')
             |SELECT a.doc_id,
             |  CAST(len(list_filter(a.p0, p -> list_contains(b.p1, p + 1)))
             |    AS BIGINT) AS n_occurrences
             |FROM a JOIN b USING (doc_id)
             |WHERE len(list_filter(a.p0, p -> list_contains(b.p1, p + 1))) > 0
             |ORDER BY doc_id""".stripMargin)),

    // HYBRID retrieval composition — the RAG mining pattern: a cheap
    // lexical BM25 pass shortlists 20 candidates (never touching the
    // embedding column), then the dense re-rank scores ONLY the
    // shortlist by cosine to the query document's embedding (codegen
    // CosineSimilarity; the embedding scan is pruned to 21 rows by
    // the broadcast semi-join on the shortlist ids). Query = doc 42:
    // its 8-token prefix is the lexical query, its vector the dense
    // one. Cross-module: a drift in EITHER the BM25 chain or the
    // cosine kernel hash-fails this gate.
    QueryDef("q_ir_hybrid",
      (s, d) => {
        val docs = t(s, d, "documents")
        val q = docs.filter(col("doc_id") === 42)
          .select(col("doc_id").as("query_id"),
            array_join(slice(split(col("text"), " "), 1, 8), " ").as("qtext"))
        val shortlist = Retrieval.bm25Batch(docs, "doc_id", "text",
            q, "query_id", "qtext", k = 21)
          .filter(col("doc_id") =!= 42)
          .select(col("doc_id"), col("score").as("bm25"))
        val emb = t(s, d, "embeddings")
        val qEmb = broadcast(emb.filter(col("vec_id") === 42)
          .select(col("embedding").as("q_emb")))
        emb.join(broadcast(shortlist), emb("vec_id") === shortlist("doc_id"))
          .crossJoin(qEmb)
          .select(col("doc_id"), col("bm25"),
            round(graft.functions.VectorExpressions.cosineNative(
              col("embedding"), col("q_emb")), 6).as("cosine"))
          .orderBy(desc("cosine"), col("doc_id")).limit(5)
      },
      Some(s"""WITH queries AS (
             |  SELECT doc_id AS query_id,
             |         array_to_string(string_split(text, ' ')[1:8], ' ') AS qtext
             |  FROM documents WHERE doc_id = 42),
             |qterms AS (
             |  SELECT DISTINCT query_id,
             |         unnest(string_split_regex(lower(qtext), '\\s+')) AS term
             |  FROM queries),
             |${oraclePost("term IN (SELECT term FROM qterms)")},
             |scored AS (
             |  SELECT p.doc_id, round(sum($oracleTermScore), 6) AS bm25
             |  FROM post p JOIN dfT USING (term) JOIN qterms q USING (term), stats s
             |  GROUP BY 1),
             |shortlist AS (
             |  SELECT doc_id, bm25 FROM (
             |    SELECT doc_id, bm25,
             |           row_number() OVER (ORDER BY bm25 DESC, doc_id) AS rank
             |    FROM scored) WHERE rank <= 21 AND doc_id <> 42),
             |qv AS (SELECT embedding AS q_emb FROM embeddings WHERE vec_id = 42)
             |SELECT sl.doc_id, sl.bm25,
             |  round(list_dot_product(CAST(e.embedding AS DOUBLE[]), CAST(qv.q_emb AS DOUBLE[]))
             |    / (sqrt(list_dot_product(CAST(e.embedding AS DOUBLE[]), CAST(e.embedding AS DOUBLE[])))
             |       * sqrt(list_dot_product(CAST(qv.q_emb AS DOUBLE[]), CAST(qv.q_emb AS DOUBLE[])))), 6)
             |    AS cosine
             |FROM shortlist sl JOIN embeddings e ON e.vec_id = sl.doc_id, qv
             |ORDER BY cosine DESC, sl.doc_id LIMIT 5""".stripMargin)),

    // Reciprocal-rank fusion ([[graft.ext.Retrieval.rrfFuse]]): the
    // standard score-free lexical+dense combiner — doc 42's 8-token
    // prefix retrieves a BM25 top-20 and a dense cosine top-20, each
    // ranked by (score desc, id), fused by Σ 1/(60 + rank) with
    // full-outer semantics (single-list docs keep the other term 0).
    // Every rrf value is a fixed-order sum of exactly-rounded
    // rationals, so the fused ORDER itself is value-checked.
    QueryDef("q_ir_rrf",
      (s, d) => {
        val docs = t(s, d, "documents")
        val q = docs.filter(col("doc_id") === 42)
          .select(col("doc_id").as("query_id"),
            array_join(slice(split(col("text"), " "), 1, 8), " ").as("qtext"))
        val lex = Retrieval.bm25Batch(docs, "doc_id", "text",
            q, "query_id", "qtext", k = 21)
          .filter(col("doc_id") =!= 42)
          .select(col("query_id"), col("doc_id"), col("score"))
        val emb = t(s, d, "embeddings")
        val qEmb = broadcast(emb.filter(col("vec_id") === 42)
          .select(col("embedding").as("q_emb")))
        val dense = emb.filter(col("vec_id") =!= 42).crossJoin(qEmb)
          .select(lit(42L).as("query_id"), col("vec_id").as("doc_id"),
            graft.functions.VectorExpressions.cosineNative(
              col("embedding"), col("q_emb")).as("score"))
          .orderBy(desc("score"), col("doc_id")).limit(20)
        Retrieval.rrfFuse(lex, dense, kRrf = 60, topN = 10)
          .select(col("doc_id"), col("ra"), col("rb"),
            round(col("rrf"), 6).as("rrf"))
          .orderBy("doc_id")
      },
      Some(s"""WITH queries AS (
             |  SELECT doc_id AS query_id,
             |         array_to_string(string_split(text, ' ')[1:8], ' ') AS qtext
             |  FROM documents WHERE doc_id = 42),
             |qterms AS (
             |  SELECT DISTINCT query_id,
             |         unnest(string_split_regex(lower(qtext), '\\s+')) AS term
             |  FROM queries),
             |${oraclePost("term IN (SELECT term FROM qterms)")},
             |scored AS (
             |  SELECT p.doc_id, round(sum($oracleTermScore), 6) AS score
             |  FROM post p JOIN dfT USING (term) JOIN qterms q USING (term), stats s
             |  GROUP BY 1),
             |lex21 AS (SELECT doc_id, score FROM (
             |  SELECT doc_id, score, row_number() OVER (ORDER BY score DESC, doc_id) AS rk
             |  FROM scored) WHERE rk <= 21),
             |lex AS (SELECT doc_id,
             |    CAST(row_number() OVER (ORDER BY score DESC, doc_id) AS INT) AS ra
             |  FROM lex21 WHERE doc_id <> 42),
             |qv AS (SELECT embedding AS q_emb FROM embeddings WHERE vec_id = 42),
             |dcos AS (SELECT vec_id AS doc_id,
             |    list_dot_product(CAST(embedding AS DOUBLE[]), CAST(q_emb AS DOUBLE[]))
             |      / (sqrt(list_dot_product(CAST(embedding AS DOUBLE[]), CAST(embedding AS DOUBLE[])))
             |         * sqrt(list_dot_product(CAST(q_emb AS DOUBLE[]), CAST(q_emb AS DOUBLE[])))) AS c
             |  FROM embeddings, qv WHERE vec_id <> 42),
             |den20 AS (SELECT doc_id, c FROM (
             |  SELECT doc_id, c, row_number() OVER (ORDER BY c DESC, doc_id) AS rk
             |  FROM dcos) WHERE rk <= 20),
             |den AS (SELECT doc_id,
             |    CAST(row_number() OVER (ORDER BY c DESC, doc_id) AS INT) AS rb
             |  FROM den20),
             |fused AS (SELECT coalesce(l.doc_id, d.doc_id) AS doc_id, l.ra, d.rb,
             |    coalesce(CAST(1 AS DOUBLE) / (l.ra + 60), 0) +
             |    coalesce(CAST(1 AS DOUBLE) / (d.rb + 60), 0) AS rrf
             |  FROM lex l FULL JOIN den d ON l.doc_id = d.doc_id)
             |SELECT doc_id, ra, rb, round(rrf, 6) AS rrf FROM (
             |  SELECT * FROM fused ORDER BY rrf DESC, doc_id LIMIT 10)
             |ORDER BY doc_id""".stripMargin), bench = true),

    // Batch BM25: every 97th document's 8-token prefix becomes a
    // query; top-5 per query via broadcast term pruning + window.
    QueryDef("q_ir_bm25_batch",
      (s, d) => {
        val docs = t(s, d, "documents")
        val queries = docs.filter(col("doc_id") % 97 === 0)
          .select(col("doc_id").as("query_id"),
            array_join(slice(split(col("text"), " "), 1, 8), " ").as("qtext"))
        Retrieval.bm25Batch(docs, "doc_id", "text", queries, "query_id", "qtext", k = 5)
          .orderBy("query_id", "rank")
      },
      Some(s"""WITH queries AS (
             |  SELECT doc_id AS query_id,
             |         array_to_string(string_split(text, ' ')[1:8], ' ') AS qtext
             |  FROM documents WHERE doc_id % 97 = 0),
             |qterms AS (
             |  SELECT DISTINCT query_id,
             |         unnest(string_split_regex(lower(qtext), '\\s+')) AS term
             |  FROM queries),
             |${oraclePost("term IN (SELECT term FROM qterms)")},
             |scored AS (
             |  SELECT q.query_id, p.doc_id, round(sum($oracleTermScore), 6) AS score
             |  FROM post p JOIN dfT USING (term) JOIN qterms q USING (term), stats s
             |  WHERE len(q.term) > 0
             |  GROUP BY 1, 2)
             |SELECT query_id, doc_id, score, rank FROM (
             |  SELECT query_id, doc_id, score,
             |         row_number() OVER (PARTITION BY query_id
             |                            ORDER BY score DESC, doc_id) AS rank
             |  FROM scored)
             |WHERE rank <= 5 ORDER BY query_id, rank""".stripMargin), bench = true),

    // DPR-style hard-negative mining: per query doc, the 3 top-BM25
    // docs that are not the positive (the query's own source doc),
    // drawn from a 10-candidate shortlist. The oracle replays the
    // whole chain — batch scoring, shortlist rank, positive
    // exclusion, re-rank.
    QueryDef("q_ir_negatives",
      (s, d) => {
        val docs = t(s, d, "documents")
        val queries = docs.filter(col("doc_id") % 97 === 0)
          .select(col("doc_id").as("query_id"),
            array_join(slice(split(col("text"), " "), 1, 8), " ").as("qtext"),
            col("doc_id").as("pos_id"))
        Retrieval.hardNegatives(docs, "doc_id", "text",
            queries, "query_id", "qtext", "pos_id", negPerQuery = 3, candK = 10)
          .orderBy("query_id", "neg_rank")
      },
      Some(s"""WITH queries AS (
             |  SELECT doc_id AS query_id,
             |         array_to_string(string_split(text, ' ')[1:8], ' ') AS qtext
             |  FROM documents WHERE doc_id % 97 = 0),
             |qterms AS (
             |  SELECT DISTINCT query_id,
             |         unnest(string_split_regex(lower(qtext), '\\s+')) AS term
             |  FROM queries),
             |${oraclePost("term IN (SELECT term FROM qterms)")},
             |scored AS (
             |  SELECT q.query_id, p.doc_id, round(sum($oracleTermScore), 6) AS score
             |  FROM post p JOIN dfT USING (term) JOIN qterms q USING (term), stats s
             |  WHERE len(q.term) > 0
             |  GROUP BY 1, 2),
             |topk AS (
             |  SELECT query_id, doc_id, score,
             |         row_number() OVER (PARTITION BY query_id
             |                            ORDER BY score DESC, doc_id) AS rank
             |  FROM scored),
             |negs AS (
             |  SELECT query_id, query_id AS pos_id, doc_id AS neg_id, score,
             |         row_number() OVER (PARTITION BY query_id
             |                            ORDER BY rank) AS neg_rank
             |  FROM topk WHERE rank <= 10 AND doc_id <> query_id)
             |SELECT query_id, pos_id, neg_id, neg_rank, score FROM negs
             |WHERE neg_rank <= 3 ORDER BY query_id, neg_rank""".stripMargin)),
  )
}
