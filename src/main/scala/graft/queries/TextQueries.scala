package graft.queries

import graft.QueryDef
import graft.ext.TextAnalysis
import graft.sources.Tables
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Text-analysis gate queries over the `documents` table. Every
  * expression is reproduced verbatim in the DuckDB oracle (both
  * engines use RE2-compatible patterns and double arithmetic).
  */
object TextQueries {

  private def t(s: SparkSession, dir: String, n: String): DataFrame =
    Tables(s, dir).table(n)

  def defs: Seq[QueryDef] = Seq(

    // Token counting: whitespace + BPE-ish regex pre-tokenization
    QueryDef("q_tx_tokens",
      (s, d) => t(s, d, "documents").select(
        col("doc_id"),
        TextAnalysis.tokenCountWs(col("text")).cast("long").as("n_ws_tokens"),
        TextAnalysis.tokenCountRegex(col("text")).cast("long").as("n_re_tokens"))
        .orderBy("doc_id"),
      Some("""SELECT doc_id,
             |  len(string_split_regex(text, '\s+')) AS n_ws_tokens,
             |  len(regexp_extract_all(text, '\w+|[^\w\s]')) AS n_re_tokens
             |FROM documents ORDER BY doc_id""".stripMargin)),

    // Quality scoring: stopword / punctuation / word-length ratios
    QueryDef("q_tx_quality",
      (s, d) => t(s, d, "documents").select(
        col("doc_id"),
        length(col("text")).cast("long").as("n_chars"),
        TextAnalysis.tokenCountWs(col("text")).cast("long").as("n_words"),
        round(TextAnalysis.qualityScore(col("text")), 4).as("quality"))
        .orderBy("doc_id"),
      Some("""SELECT doc_id, length(text) AS n_chars,
             |  len(string_split_regex(text, '\s+')) AS n_words,
             |  round((
             |    least(len(regexp_extract_all(lower(text), '\b(the|a|of|and|to|is|in)\b')) * 1.0
             |          / len(string_split_regex(text, '\s+')) * 5.0, 1.0)
             |    + greatest(1.0 - len(regexp_extract_all(text, '[^\w\s]')) * 1.0
             |               / length(text) * 10.0, 0.0)
             |    + CASE WHEN length(text) * 1.0 / len(string_split_regex(text, '\s+'))
             |           BETWEEN 3.0 AND 8.0 THEN 1.0 ELSE 0.5 END
             |  ) / 3.0, 4) AS quality
             |FROM documents ORDER BY doc_id""".stripMargin)),

    // Language ID: stopword-marker heuristic, deterministic tie-break
    QueryDef("q_tx_langid",
      (s, d) => t(s, d, "documents").select(
        col("doc_id"),
        TextAnalysis.langId(col("text")).as("pred_lang"),
        col("lang").as("labeled_lang"))
        .orderBy("doc_id"),
      Some(langIdOracle)),

    // Document fingerprinting (rolling min-hash over shingles) — no
    // portable SQL analogue of xxhash64, so rows-only gate; exactness
    // is covered by FingerprintSpec instead.
    QueryDef("q_tx_fingerprint",
      (s, d) => t(s, d, "documents").select(
        col("doc_id"),
        TextAnalysis.fingerprint(col("text")).as("fingerprint"))
        .orderBy("doc_id"),
      None),
  )

  /** DuckDB mirror of [[TextAnalysis.langId]]: same marker lists, same
    * strictly-greater fold order, so predictions agree exactly. */
  private def langIdOracle: String = {
    val scores = TextAnalysis.langMarkers.map { case (l, ws) =>
      l -> s"len(regexp_extract_all(lower(text), '\\b(${ws.mkString("|")})\\b'))"
    }
    // replicate the fold: start at the first language, strict > replaces
    val (l0, s0) = scores.head
    val (predExpr, scoreExpr) = scores.tail.foldLeft((s"'$l0'", s0)) {
      case ((pl, ps), (l, sc)) =>
        (s"CASE WHEN $sc > $ps THEN '$l' ELSE $pl END",
          s"CASE WHEN $sc > $ps THEN $sc ELSE $ps END")
    }
    s"""SELECT doc_id,
       |  CASE WHEN $scoreExpr > 0 THEN $predExpr ELSE 'other' END AS pred_lang,
       |  lang AS labeled_lang
       |FROM documents ORDER BY doc_id""".stripMargin
  }
}
