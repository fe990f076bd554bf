package graft.queries

import graft.QueryDef
import graft.ext.Dedup
import graft.sources.Tables
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Deduplication gate queries over the `documents` table.
  * Exact dedup and n-gram Jaccard have full DuckDB oracles; the
  * hash-based methods (MinHash-LSH, SimHash) have no portable SQL
  * analogue of xxhash64, so they are rows-only here and get exact
  * golden tests in DedupSpec (engineered near-duplicate corpora).
  */
object DedupQueries {

  private def t(s: SparkSession, dir: String, n: String): DataFrame =
    Tables(s, dir).table(n)

  def defs: Seq[QueryDef] = Seq(

    // Exact dedup: one shuffle on md5(text), lowest-id representative
    QueryDef("q_dd_exact",
      (s, d) => Dedup.exact(t(s, d, "documents"), "doc_id", "text")
        .orderBy("keep_id"),
      Some("""SELECT md5(text) AS text_hash, min(doc_id) AS keep_id, count(*) AS n_copies
             |FROM documents GROUP BY text ORDER BY keep_id""".stripMargin), bench = true),

    // N-gram Jaccard near-dup pairs via inverted shingle index
    QueryDef("q_dd_jaccard",
      (s, d) => Dedup.jaccardPairs(t(s, d, "documents"), "doc_id", "text",
        n = 5, threshold = 0.6).orderBy("d1", "d2"),
      Some("""WITH toks AS (
             |  SELECT doc_id, string_split_regex(lower(text), '\s+') AS tokens
             |  FROM documents),
             |sh AS (
             |  SELECT DISTINCT doc_id, s FROM (
             |    SELECT doc_id,
             |      unnest(list_transform(range(1, greatest(len(tokens) - 3, 1)),
             |                            i -> array_to_string(tokens[i:i+4], ' '))) AS s
             |    FROM toks)),
             |sz AS (SELECT doc_id, count(*) AS n_sh FROM sh GROUP BY doc_id),
             |inter AS (
             |  SELECT a.doc_id AS d1, b.doc_id AS d2, count(*) AS n_inter
             |  FROM sh a JOIN sh b ON a.s = b.s AND a.doc_id < b.doc_id
             |  GROUP BY 1, 2)
             |SELECT d1, d2,
             |  round(n_inter / (s1.n_sh + s2.n_sh - n_inter), 4) AS jaccard
             |FROM inter
             |JOIN sz s1 ON d1 = s1.doc_id
             |JOIN sz s2 ON d2 = s2.doc_id
             |WHERE n_inter / (s1.n_sh + s2.n_sh - n_inter) >= 0.6
             |ORDER BY d1, d2""".stripMargin), bench = true),

    // MinHash + LSH banding (shingle → signature → band → bucket join)
    QueryDef("q_dd_minhash_lsh",
      (s, d) => Dedup.minhashLshPairs(t(s, d, "documents"), "doc_id", "text")
        .orderBy("d1", "d2"),
      None, bench = true),

    // SimHash with pigeonhole-chunk candidate generation
    QueryDef("q_dd_simhash",
      (s, d) => Dedup.simhashPairs(t(s, d, "documents"), "doc_id", "text")
        .orderBy("d1", "d2"),
      None),
  )
}
