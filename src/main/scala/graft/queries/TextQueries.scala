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

  /** Fresh scratch dir for the curation parquet checkpoint (per run,
    * so concurrent gate/bench invocations never collide; deleted on
    * JVM exit by [[graft.Scratch]]). */
  private def ckptDir(): String = graft.Scratch.tempDir("graft_ckpt_")

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
      Some(s"""SELECT doc_id, length(text) AS n_chars,
              |  len(string_split_regex(text, '\\s+')) AS n_words,
              |  round($qualitySqlExpr, 4) AS quality
              |FROM documents ORDER BY doc_id""".stripMargin)),

    // Within-language quantile normalization
    // ([[graft.ext.Sampling.quantileNormalize]]): each doc's quality
    // becomes its percent-rank inside its language — the calibration
    // that makes scores comparable across strata before one global
    // threshold applies. Total order via (quality, doc_id);
    // percent_rank's (rank−1)/(n−1) is engine-identical.
    QueryDef("q_tx_quality_norm",
      (s, d) => graft.ext.Sampling.quantileNormalize(
          t(s, d, "documents").select(col("doc_id"), col("lang"),
            round(TextAnalysis.qualityScore(col("text")), 4).as("quality")),
          col("lang"), col("quality"), col("doc_id"))
        .orderBy("doc_id"),
      Some(s"""WITH q AS (
              |  SELECT doc_id, lang, round($qualitySqlExpr, 4) AS quality
              |  FROM documents)
              |SELECT doc_id, lang, quality,
              |  round(percent_rank() OVER (PARTITION BY lang
              |    ORDER BY quality, doc_id), 6) AS pct_rank
              |FROM q ORDER BY doc_id""".stripMargin)),

    // Token frequency spectrum
    // ([[graft.ext.CorpusStats.freqSpectrum]]): count-of-counts over
    // the vocabulary — the hapax share and Zipf-second-law shape.
    // Exact integers + one exact ratio.
    QueryDef("q_tx_freq_spectrum",
      (s, d) => graft.ext.CorpusStats.freqSpectrum(t(s, d, "documents"))
        .orderBy("occurrences"),
      Some("""WITH tok AS (
             |  SELECT t AS token FROM (
             |    SELECT unnest(string_split_regex(lower(text), '\s+')) AS t
             |    FROM documents) WHERE t <> ''),
             |cnt AS (SELECT token, count(*) AS c FROM tok GROUP BY token),
             |spec AS (SELECT c, count(*) AS n_types FROM cnt GROUP BY c),
             |v AS (SELECT CAST(sum(n_types) AS BIGINT) AS v FROM spec)
             |SELECT c AS occurrences, n_types,
             |  round(n_types / CAST(v.v AS DOUBLE), 6) AS vocab_share
             |FROM spec, v ORDER BY occurrences""".stripMargin)),

    // Batch twin of the STREAMING quality monitor, through the very
    // function the stream runs (withWatermark is analyzer-eliminated
    // on a static frame): documents get a deterministic synthetic
    // ingest timestamp (epoch + doc_id%180 minutes → three 1-hour
    // windows), and each window reports its document count and mean
    // quality score. Paired with StreamingSpec's stream-equals-batch
    // assertion this gates the monitor's aggregation end-to-end.
    QueryDef("q_tx_quality_monitor",
      (s, d) => {
        val stamped = t(s, d, "documents").select(
          timestamp_seconds(lit(1704067200L) + pmod(col("doc_id"), lit(180)) * 60)
            .as("ts"),
          col("doc_id"), col("text"))
        graft.streaming.TextStreams.qualityMonitor(stamped, windowLen = "1 hour")
          .orderBy("win_start")
      },
      Some(s"""WITH stamped AS (
              |  SELECT TIMESTAMP '2024-01-01 00:00:00'
              |           + ((doc_id % 180) * 60) * INTERVAL 1 SECOND AS ts,
              |    text
              |  FROM documents)
              |SELECT time_bucket(INTERVAL '1 hour', ts) AS win_start,
              |  count(*) AS n_docs,
              |  round(avg($qualitySqlExpr), 4) AS mean_quality
              |FROM stamped GROUP BY 1 ORDER BY 1""".stripMargin)),

    // Language ID: stopword-marker heuristic, deterministic tie-break
    QueryDef("q_tx_langid",
      (s, d) => t(s, d, "documents").select(
        col("doc_id"),
        TextAnalysis.langId(col("text")).as("pred_lang"),
        col("lang").as("labeled_lang"))
        .orderBy("doc_id"),
      Some(langIdOracle)),

    // End-to-end curation pipeline (flagship for the LLM-data story):
    // score → quality/lang filter → exact dedup → near-dup removal →
    // per-language stats. Oracle composes the same stages in SQL.
    QueryDef("q_curate_pipeline",
      (s, d) => graft.ext.Curation.curate(t(s, d, "documents"),
        checkpointDir = Some(ckptDir())),
      Some(curateOracle), bench = true),

    // Same pipeline under the TRANSITIVE-COLLAPSE near-dup policy:
    // one representative per connected component of the pair graph
    // (the pairwise loser-drop keeps both endpoints of an A~B~C
    // chain's outer pair when A~C never qualified). The oracle runs
    // the shared scored/pairs chain into a recursive-CTE component
    // search and drops every non-representative.
    QueryDef("q_curate_transitive",
      (s, d) => graft.ext.Curation.curateTransitive(t(s, d, "documents"),
        checkpointDir = Some(ckptDir())),
      Some(curateTransitiveOracle)),

    // Corpus heavy hitters: top-20 tokens by document frequency
    QueryDef("q_tx_top_tokens",
      (s, d) => t(s, d, "documents")
        .select(col("doc_id"), explode(array_distinct(
          split(lower(col("text")), "\\s+"))).as("token"))
        .groupBy("token")
        .agg(count(lit(1)).as("doc_freq"))
        .orderBy(desc("doc_freq"), col("token"))
        .limit(20),
      Some("""SELECT token, count(*) AS doc_freq FROM (
             |  SELECT doc_id, unnest(list_distinct(string_split_regex(lower(text), '\s+'))) AS token
             |  FROM documents)
             |GROUP BY 1 ORDER BY doc_freq DESC, token LIMIT 20""".stripMargin)),

    // Corpus vocabulary stats: size, totals, type-token ratio
    QueryDef("q_tx_vocab",
      (s, d) => {
        val toks = t(s, d, "documents")
          .select(explode(split(lower(col("text")), "\\s+")).as("token"))
        toks.agg(
          countDistinct(col("token")).as("vocab_size"),
          count(lit(1)).as("total_tokens"),
          round(countDistinct(col("token")) / count(lit(1)), 6).as("type_token_ratio"))
      },
      Some("""SELECT count(DISTINCT token) AS vocab_size, count(*) AS total_tokens,
             |  round(count(DISTINCT token) * 1.0 / count(*), 6) AS type_token_ratio
             |FROM (SELECT unnest(string_split_regex(lower(text), '\s+')) AS token
             |      FROM documents)""".stripMargin)),

    // Incremental OOV detection ([[graft.ext.CorpusStats.newTokens]]):
    // the day-2 path of vocabulary monitoring — the seen store is the
    // first half's distinct tokens; the delta (second half + injected
    // docs carrying genuinely novel tokens) anti-joins it. The corpus
    // delta contributes nothing (proving no false positives); only
    // the injected novelties surface, with doc/occurrence counts.
    QueryDef("q_tx_vocab_inc",
      (s, d) => {
        import s.implicits._
        val docs = t(s, d, "documents")
        val seen = docs.filter(col("doc_id") < 250)
          .select(explode(split(lower(col("text")), "\\s+")).as("token"))
          .filter(col("token") =!= "").distinct()
        val novel = Seq(
          (1000001L, "zebra quokka zebra"),
          (1000002L, "quokka umbrella table key")
        ).toDF("doc_id", "text")
        val delta = docs.filter(col("doc_id") >= 250)
          .select(col("doc_id"), col("text")).unionAll(novel)
        graft.ext.CorpusStats.newTokens(seen, delta).orderBy("token")
      },
      Some("""WITH seen AS (
             |  SELECT DISTINCT t AS token FROM (
             |    SELECT unnest(string_split_regex(lower(text), '\s+')) AS t
             |    FROM documents WHERE doc_id < 250) WHERE t <> ''),
             |delta AS (
             |  SELECT doc_id, text FROM documents WHERE doc_id >= 250
             |  UNION ALL SELECT * FROM (VALUES
             |    (CAST(1000001 AS BIGINT), 'zebra quokka zebra'),
             |    (CAST(1000002 AS BIGINT), 'quokka umbrella table key')) v(doc_id, text)),
             |dtok AS (
             |  SELECT doc_id, t AS token FROM (
             |    SELECT doc_id, unnest(string_split_regex(lower(text), '\s+')) AS t
             |    FROM delta) WHERE t <> '')
             |SELECT token, count(DISTINCT doc_id) AS n_docs,
             |  count(*) AS n_occurrences
             |FROM dtok WHERE token NOT IN (SELECT token FROM seen)
             |GROUP BY token ORDER BY token""".stripMargin)),

    // Pairwise source-vocabulary overlap
    // ([[graft.ext.CorpusStats.sourceOverlap]]): exact
    // intersection/union/Jaccard of distinct-token sets for every
    // source pair — the redundancy evidence mixture planning reads.
    // One (source, token) distinct + a stratum-bounded token join;
    // the oracle mirrors it directly.
    QueryDef("q_tx_source_overlap",
      (s, d) => graft.ext.CorpusStats.sourceOverlap(t(s, d, "documents"))
        .orderBy("s1", "s2"),
      Some("""WITH st AS (
             |  SELECT DISTINCT source AS s, token FROM (
             |    SELECT source, unnest(string_split_regex(lower(text), '\s+')) AS token
             |    FROM documents) WHERE token <> ''),
             |sizes AS (SELECT s, count(*) AS n FROM st GROUP BY s),
             |inter AS (
             |  SELECT x.s AS s1, y.s AS s2, count(*) AS n_inter
             |  FROM st x JOIN st y ON x.token = y.token AND x.s < y.s
             |  GROUP BY 1, 2)
             |SELECT s1, s2, n_inter,
             |  a.n + b.n - n_inter AS n_union,
             |  round(CAST(n_inter AS DOUBLE) / (a.n + b.n - n_inter), 6) AS jaccard
             |FROM inter JOIN sizes a ON a.s = s1 JOIN sizes b ON b.s = s2
             |ORDER BY s1, s2""".stripMargin), bench = true),

    // Vocabulary growth curve ([[graft.ext.CorpusStats.vocabGrowth]]):
    // never-seen-before tokens per ingestion batch + cumulative vocab
    // size via the first-seen reformulation — ONE token shuffle where
    // the naive per-prefix distinct rescans the corpus once per
    // batch. The oracle re-derives first-seen batches and the prefix
    // sum directly; batch = floor(doc_id/50) → 10 batches at sf0.01.
    QueryDef("q_tx_vocab_growth",
      (s, d) => graft.ext.CorpusStats.vocabGrowth(
        t(s, d, "documents"), "doc_id", "text", batchSize = 50),
      Some("""WITH tok AS (
             |  SELECT CAST(floor(doc_id / 50) AS BIGINT) AS batch,
             |         unnest(string_split_regex(lower(text), '\s+')) AS token
             |  FROM documents),
             |t2 AS (SELECT batch, token FROM tok WHERE token <> ''),
             |fs AS (SELECT token, min(batch) AS batch FROM t2 GROUP BY token),
             |nb AS (SELECT batch, count(*) AS new_tokens FROM fs GROUP BY batch),
             |b AS (SELECT DISTINCT batch FROM t2)
             |SELECT b.batch,
             |  CAST(coalesce(nb.new_tokens, 0) AS BIGINT) AS new_tokens,
             |  CAST(sum(coalesce(nb.new_tokens, 0)) OVER (ORDER BY b.batch
             |    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT) AS vocab_size
             |FROM b LEFT JOIN nb USING (batch) ORDER BY batch""".stripMargin)),

    // TF-IDF: top-3 highest-scoring terms per document (first 50 docs)
    QueryDef("q_tx_tfidf",
      (s, d) => {
        import org.apache.spark.sql.expressions.Window
        val toks = t(s, d, "documents")
          .select(col("doc_id"), explode(split(lower(col("text")), "\\s+")).as("token"))
        val tf = toks.groupBy("doc_id", "token").agg(count(lit(1)).as("tf"))
        val df_ = toks.select("doc_id", "token").distinct()
          .groupBy("token").agg(count(lit(1)).as("df"))
        val nDocs = t(s, d, "documents").agg(count(lit(1)).as("n_docs"))
        val scored = tf.join(df_, "token").crossJoin(broadcast(nDocs))
          .withColumn("tfidf",
            col("tf") * (log((col("n_docs") + 1) / (col("df") + 1)) + 1))
        val w = Window.partitionBy("doc_id").orderBy(desc("tfidf"), col("token"))
        scored.withColumn("rn", row_number().over(w))
          .filter(col("rn") <= 3 && col("doc_id") < 50)
          .select(col("doc_id"), col("rn").cast("long").as("rn"), col("token"),
            round(col("tfidf"), 6).as("tfidf"))
          .orderBy("doc_id", "rn")
      },
      Some("""WITH toks AS (
             |  SELECT doc_id, unnest(string_split_regex(lower(text), '\s+')) AS token
             |  FROM documents),
             |tf AS (SELECT doc_id, token, count(*) AS tf FROM toks GROUP BY 1, 2),
             |df AS (SELECT token, count(*) AS df FROM (
             |         SELECT DISTINCT doc_id, token FROM toks) GROUP BY 1),
             |n AS (SELECT count(*) AS n_docs FROM documents),
             |scored AS (
             |  SELECT tf.doc_id, tf.token,
             |    tf.tf * (ln((n.n_docs + 1) * 1.0 / (df.df + 1)) + 1) AS tfidf
             |  FROM tf JOIN df USING (token), n)
             |SELECT doc_id,
             |  row_number() OVER (PARTITION BY doc_id ORDER BY tfidf DESC, token) AS rn,
             |  token, round(tfidf, 6) AS tfidf
             |FROM scored
             |QUALIFY rn <= 3 AND doc_id < 50
             |ORDER BY doc_id, rn""".stripMargin)),

    // Context-window chunking: 64-token chunks, 16-token overlap
    QueryDef("q_chunk_docs",
      (s, d) => t(s, d, "documents")
        .select(col("doc_id"),
          explode(TextAnalysis.chunkTokens(col("text"), 64, 16)).as("c"))
        .select(col("doc_id"), col("c.chunk_id"),
          md5(col("c.chunk")).as("chunk_md5"),
          size(split(col("c.chunk"), "\\s+")).cast("long").as("n_tokens"))
        .orderBy("doc_id", "chunk_id"),
      Some("""WITH toks AS (
             |  SELECT doc_id, string_split_regex(text, '\s+') AS t FROM documents),
             |chunks AS (
             |  SELECT doc_id, CAST(i AS INT) AS chunk_id,
             |    array_to_string(t[i*48+1:i*48+64], ' ') AS chunk
             |  FROM toks, range(0, 4096) r(i)
             |  WHERE i < CAST(ceil(greatest(len(t) - 16, 1) / 48.0) AS BIGINT))
             |SELECT doc_id, chunk_id, md5(chunk) AS chunk_md5,
             |  len(string_split_regex(chunk, '\s+')) AS n_tokens
             |FROM chunks ORDER BY doc_id, chunk_id""".stripMargin)),

    // Content-defined chunking ([[graft.functions.CdcBoundaries]]):
    // cuts anchored to the text (trailing-16-codepoint hash ≡ 0 mod
    // 64), so edits re-synchronize within a chunk — the rsync/LBFS
    // construction that makes chunk-hash dedup robust to insertions.
    // Spark maintains the windowed hash incrementally in one O(len)
    // pass; the oracle recomputes EVERY position's window from
    // scratch, so the subtract-the-outgoing-term arithmetic is
    // value-checked at every boundary of every document.
    QueryDef("q_tx_cdc",
      (s, d) => {
        import org.apache.spark.sql.expressions.Window
        val b = t(s, d, "documents").select(col("doc_id"), col("text"),
          posexplode(graft.functions.TextExpressions
            .cdcBoundaries(col("text"), 16, 6)))
        val w = Window.partitionBy("doc_id").orderBy("pos")
        b.withColumn("prev", coalesce(lag(col("col"), 1).over(w), lit(0)))
          .select(col("doc_id"), col("pos").as("chunk_id"),
            (col("prev") + 1).as("c_start"),
            (col("col") - col("prev")).cast("long").as("n_chars"),
            md5(col("text").substr(col("prev") + 1, col("col") - col("prev")))
              .as("chunk_md5"))
          .orderBy("doc_id", "chunk_id")
      },
      Some("""WITH cps AS (SELECT doc_id, text, length(text) AS n FROM documents),
             |h AS (
             |  SELECT doc_id, i,
             |    list_reduce(list_prepend(0::BIGINT,
             |      list_transform(range(i - 15, i + 1),
             |        k -> unicode(substr(text, CAST(k AS INT), 1))::BIGINT)),
             |      (h, c) -> (h * 31 + c) % 1000000007) AS hv
             |  FROM cps, range(1, 100000) r(i) WHERE i >= 16 AND i <= n),
             |raw AS (SELECT doc_id, i FROM h WHERE hv % 64 = 0),
             |cut AS (
             |  SELECT doc_id, i FROM (
             |    SELECT doc_id, i, lag(i) OVER (PARTITION BY doc_id ORDER BY i) AS pr
             |    FROM raw)
             |  WHERE pr IS NULL OR i - pr >= 16),
             |b AS (
             |  SELECT doc_id, CAST(i AS INT) AS pos FROM cut
             |  UNION
             |  SELECT doc_id, CAST(n AS INT) FROM cps WHERE n > 0),
             |ch AS (
             |  SELECT doc_id, pos,
             |    CAST(row_number() OVER w - 1 AS INT) AS chunk_id,
             |    lag(pos, 1, 0) OVER w AS prev
             |  FROM b WINDOW w AS (PARTITION BY doc_id ORDER BY pos))
             |SELECT c.doc_id, c.chunk_id, c.prev + 1 AS c_start,
             |  CAST(c.pos - c.prev AS BIGINT) AS n_chars,
             |  md5(substr(d.text, c.prev + 1, c.pos - c.prev)) AS chunk_md5
             |FROM ch c JOIN documents d ON c.doc_id = d.doc_id
             |ORDER BY c.doc_id, c.chunk_id""".stripMargin)),

    // Winnowing document fingerprints (MOSS, Schleimer et al. 2003;
    // [[graft.functions.WinnowFingerprints]]): per-window minimum of
    // 8-gram 31-polynomial hashes over a window of 8, ties →
    // rightmost. The oracle replays every step in SQL: per-position
    // k-gram hashes (list_reduce), per-doc hash lists, window slices,
    // and the rightmost-min via list_position over the reversed
    // slice. Value-checks positions AND hashes for the full corpus
    // (~65 fingerprints/doc at density 2/(w+1)).
    QueryDef("q_tx_winnow",
      (s, d) => t(s, d, "documents")
        .select(col("doc_id"),
          explode(graft.functions.TextExpressions
            .winnowFingerprints(col("text"), 8, 8)).as("f"))
        .select(col("doc_id"), col("f.pos").as("pos"), col("f.h").as("h"))
        .orderBy("doc_id", "pos"),
      Some("""WITH cps AS (SELECT doc_id, text, length(text) AS n FROM documents),
             |kg AS (
             |  SELECT doc_id, i,
             |    list_reduce(list_prepend(0::BIGINT,
             |      list_transform(range(i, i + 8),
             |        x -> unicode(substr(text, CAST(x AS INT), 1))::BIGINT)),
             |      (h, c) -> (h * 31 + c) % 1000000007) AS hv
             |  FROM cps, range(1, 100000) r(i) WHERE i <= n - 7),
             |hl AS (SELECT doc_id, list(hv ORDER BY i) AS hs, count(*) AS m
             |       FROM kg GROUP BY doc_id),
             |wins AS (
             |  SELECT doc_id, j,
             |    list_slice(hs, CAST(j AS INT), CAST(least(j + 7, m) AS INT)) AS win
             |  FROM hl, range(1, 100000) r(j) WHERE j <= greatest(m - 7, 1)),
             |sel AS (
             |  SELECT DISTINCT doc_id,
             |    CAST(j + len(win) -
             |      list_position(list_reverse(win), list_min(win)) AS INT) AS pos,
             |    list_min(win) AS h
             |  FROM wins)
             |SELECT doc_id, pos, h FROM sel ORDER BY doc_id, pos""".stripMargin)),

    // The curated corpus itself, per document (same stages as
    // q_curate_pipeline before the final rollup)
    QueryDef("q_curate_docs",
      (s, d) => graft.ext.Curation.curatedDocs(t(s, d, "documents"),
        checkpointDir = Some(ckptDir()))
        .select(col("doc_id"), col("pred_lang"), col("n_tokens"),
          round(col("quality"), 4).as("quality"))
        .orderBy("doc_id"),
      Some(curateDocsOracle)),

    // PII scrub: count email/URL matches and hash the redacted text —
    // identical regexes run in DuckDB, so redaction is value-checked
    QueryDef("q_tx_redact",
      (s, d) => t(s, d, "documents")
        .select(col("doc_id"),
          TextAnalysis.piiCount(col("text")).cast("long").as("n_pii"),
          md5(TextAnalysis.redactPii(col("text"))).as("red_md5"))
        .orderBy("doc_id"),
      Some("""SELECT doc_id,
             |  CAST(len(regexp_extract_all(text, '[\w.+-]+@[\w-]+(\.[\w-]+)+'))
             |       + len(regexp_extract_all(text, 'https?://[^\s]+')) AS BIGINT) AS n_pii,
             |  md5(regexp_replace(
             |        regexp_replace(text, 'https?://[^\s]+', '<URL>', 'g'),
             |        '[\w.+-]+@[\w-]+(\.[\w-]+)+', '<EMAIL>', 'g')) AS red_md5
             |FROM documents ORDER BY doc_id""".stripMargin)),

    // Aho–Corasick blocklist matcher
    // ([[graft.functions.MultiPatternCount]]): ALL substring
    // occurrences of six patterns — including overlapping matches
    // ('aa' in 'aaaa' → 3) and a multi-word phrase — in ONE automaton
    // pass per row, where the regex battery would need one scan per
    // pattern. The oracle probes every text position with substr
    // equality, the brute-force ground truth.
    QueryDef("q_tx_blocklist",
      (s, d) => {
        import s.implicits._
        val tricky = Seq(
          (1000001L, "AAaa zqx TABLE tablet"),
          (1000002L, "key agg key agg"),
          (1000003L, "aaaa")
        ).toDF("doc_id", "text")
        val pats = Seq("table", "key agg", "windo", "aa", "spark", "zqx")
        val c = graft.functions.TextExpressions
          .multiPatternCount(lower(col("text")), pats)
        t(s, d, "documents").select(col("doc_id"), col("text"))
          .unionAll(tricky)
          .select(col("doc_id"), c.as("cc"))
          .select(col("doc_id") +: pats.indices.map(i =>
            col("cc").getItem(i).as(s"c$i")): _*)
          .orderBy("doc_id")
      },
      Some("""WITH u AS (
             |  SELECT doc_id, lower(text) AS text FROM documents
             |  UNION ALL SELECT doc_id, lower(text) FROM (VALUES
             |    (CAST(1000001 AS BIGINT), 'AAaa zqx TABLE tablet'),
             |    (CAST(1000002 AS BIGINT), 'key agg key agg'),
             |    (CAST(1000003 AS BIGINT), 'aaaa')) v(doc_id, text)),
             |pos AS (SELECT doc_id, text, CAST(i AS INT) AS i
             |        FROM u, range(1, 100000) r(i) WHERE i <= len(text))
             |SELECT u.doc_id,
             |  CAST(coalesce(sum(CASE WHEN substr(p.text, p.i, 5) = 'table' THEN 1 ELSE 0 END), 0) AS BIGINT) AS c0,
             |  CAST(coalesce(sum(CASE WHEN substr(p.text, p.i, 7) = 'key agg' THEN 1 ELSE 0 END), 0) AS BIGINT) AS c1,
             |  CAST(coalesce(sum(CASE WHEN substr(p.text, p.i, 5) = 'windo' THEN 1 ELSE 0 END), 0) AS BIGINT) AS c2,
             |  CAST(coalesce(sum(CASE WHEN substr(p.text, p.i, 2) = 'aa' THEN 1 ELSE 0 END), 0) AS BIGINT) AS c3,
             |  CAST(coalesce(sum(CASE WHEN substr(p.text, p.i, 5) = 'spark' THEN 1 ELSE 0 END), 0) AS BIGINT) AS c4,
             |  CAST(coalesce(sum(CASE WHEN substr(p.text, p.i, 3) = 'zqx' THEN 1 ELSE 0 END), 0) AS BIGINT) AS c5
             |FROM u LEFT JOIN pos p USING (doc_id)
             |GROUP BY u.doc_id ORDER BY u.doc_id""".stripMargin), bench = true),

    // Luhn card-number census ([[graft.functions.LuhnCounts]]):
    // candidates = maximal 13–19-digit runs; valid = those passing
    // the mod-10 check. The corpus has no digits (all zeros — the
    // common path); injected rows carry every edge: valid 13/16/19
    // digit numbers, an off-by-one invalid, a too-short and a
    // too-long run, and a separator-broken number (strictly NOT a
    // candidate). The oracle replays run extraction
    // (string_split_regex on non-digits) and the checksum in list
    // arithmetic.
    QueryDef("q_tx_luhn",
      (s, d) => {
        import s.implicits._
        val tricky = Seq(
          (1000001L, "pay 4532015112830366 now"),            // valid 16
          (1000002L, "pay 4532015112830367 now"),            // invalid 16
          (1000003L, "v13 4123456789011 v19 4123456789012345677"),
          (1000004L, "short 123456789012 long 45320151128303661234"),
          (1000005L, "broken 4532-0151-1283-0366 ok")
        ).toDF("doc_id", "text")
        t(s, d, "documents").select(col("doc_id"), col("text"))
          .unionAll(tricky)
          .select(col("doc_id"), TextAnalysis.luhnSignals(col("text")).as("r"))
          .select(col("doc_id"), col("r.cc_candidates"), col("r.cc_valid"))
          .orderBy("doc_id")
      },
      Some("""WITH u AS (
             |  SELECT doc_id, text FROM documents
             |  UNION ALL SELECT * FROM (VALUES
             |    (CAST(1000001 AS BIGINT), 'pay 4532015112830366 now'),
             |    (CAST(1000002 AS BIGINT), 'pay 4532015112830367 now'),
             |    (CAST(1000003 AS BIGINT), 'v13 4123456789011 v19 4123456789012345677'),
             |    (CAST(1000004 AS BIGINT), 'short 123456789012 long 45320151128303661234'),
             |    (CAST(1000005 AS BIGINT), 'broken 4532-0151-1283-0366 ok')) v(doc_id, text)),
             |runs AS (
             |  SELECT doc_id, unnest(string_split_regex(text, '[^0-9]+')) AS r FROM u),
             |cand AS (SELECT doc_id, r, len(r) AS L FROM runs
             |         WHERE len(r) BETWEEN 13 AND 19),
             |chk AS (
             |  SELECT doc_id,
             |    CASE WHEN list_sum(list_transform(range(1, L + 1), i ->
             |        CASE WHEN i % 2 = 0 THEN
             |          CASE WHEN CAST(substr(r, CAST(L - i + 1 AS INT), 1) AS INT) >= 5
             |            THEN 2 * CAST(substr(r, CAST(L - i + 1 AS INT), 1) AS INT) - 9
             |            ELSE 2 * CAST(substr(r, CAST(L - i + 1 AS INT), 1) AS INT) END
             |        ELSE CAST(substr(r, CAST(L - i + 1 AS INT), 1) AS INT) END)) % 10 = 0
             |    THEN 1 ELSE 0 END AS ok
             |  FROM cand),
             |agg AS (SELECT doc_id, count(*) AS c, sum(ok) AS v FROM chk GROUP BY doc_id)
             |SELECT u.doc_id,
             |  CAST(coalesce(c, 0) AS BIGINT) AS cc_candidates,
             |  CAST(coalesce(v, 0) AS BIGINT) AS cc_valid
             |FROM u LEFT JOIN agg USING (doc_id) ORDER BY doc_id""".stripMargin)),

    // Unicode canonicalization ([[graft.functions.NormalizeText]]):
    // NFC composition, simple per-code-point lowercase, whitespace
    // collapse — the pre-hash normalization that makes composed and
    // decomposed spellings dedup-equal. The corpus (ASCII) rides
    // along to pin the common path; injected rows exercise the
    // Unicode edges: decomposed vs precomposed é must come out
    // byte-identical, İ takes the SIMPLE mapping (→ i, not i+dot),
    // ß is unchanged, and mixed tab/newline runs collapse. Both
    // engines implement UAX #15 NFC and the UnicodeData 1:1
    // lowercase, so the full normalized text is value-checked.
    QueryDef("q_tx_normalize",
      (s, d) => {
        import s.implicits._
        val tricky = Seq(
          (1000001L, "Café au LAIT"),
          (1000002L, "İstanbul STRASSE ß"),
          (1000003L, "  A\tB\n\nC  "),
          (1000004L, "Café au lait")
        ).toDF("doc_id", "text")
        t(s, d, "documents").select(col("doc_id"), col("text"))
          .unionAll(tricky)
          .select(col("doc_id"),
            TextAnalysis.normalize(col("text")).as("norm"))
          .orderBy("doc_id")
      },
      Some("""SELECT doc_id,
             |  trim(regexp_replace(lower(nfc_normalize(text)),
             |    '[ \t\n\x0B\f\r]+', ' ', 'g'), ' ') AS norm
             |FROM (SELECT doc_id, text FROM documents
             |      UNION ALL SELECT * FROM (VALUES
             |  (CAST(1000001 AS BIGINT), 'Cafe' || chr(769) || ' au LAIT'),
             |  (CAST(1000002 AS BIGINT), chr(304) || 'stanbul STRASSE ' || chr(223)),
             |  (CAST(1000003 AS BIGINT), '  A' || chr(9) || 'B' || chr(10) || chr(10) || 'C  '),
             |  (CAST(1000004 AS BIGINT), 'Caf' || chr(233) || ' au lait')) v(doc_id, text))
             |ORDER BY doc_id""".stripMargin)),

    // Gopher-style duplicate-LINE census
    // ([[graft.functions.DupLineStats]]): duplicate-line fraction and
    // duplicate-line character fraction in one per-row pass — the
    // line-granularity repetition signal next to q_tx_repetition's
    // 3-gram ratio. The corpus has no newlines (each doc = 1 line,
    // fractions 0) so injected rows carry the semantics: repeated
    // headers, \r\n endings, indentation-only differences (trimmed
    // away), blank lines (skipped), and an all-duplicate doc. The
    // counters are exact int64s; both engines divide the same ints.
    QueryDef("q_tx_dupline",
      (s, d) => {
        import s.implicits._
        val tricky = Seq(
          (1000001L, "header\nbody one\nheader\nbody two\nheader\n"),
          (1000002L, "  nav  \r\nnav\nunique line\n\n\nnav\r\n"),
          (1000003L, "a\nb\nc"),
          (1000004L, "   \n\t\n"),
          (1000005L, "same\nsame\nsame\nsame")
        ).toDF("doc_id", "text")
        t(s, d, "documents").select(col("doc_id"), col("text"))
          .unionAll(tricky)
          .select(col("doc_id"),
            TextAnalysis.dupLineSignals(col("text")).as("r"))
          .select(col("doc_id"), col("r.n_lines"), col("r.dup_lines"),
            col("r.dup_line_frac"), col("r.dup_char_frac"))
          .orderBy("doc_id")
      },
      Some("""WITH u AS (
             |  SELECT doc_id, text FROM documents
             |  UNION ALL SELECT * FROM (VALUES
             |    (CAST(1000001 AS BIGINT), 'header' || chr(10) || 'body one' || chr(10) || 'header' || chr(10) || 'body two' || chr(10) || 'header' || chr(10)),
             |    (CAST(1000002 AS BIGINT), '  nav  ' || chr(13) || chr(10) || 'nav' || chr(10) || 'unique line' || chr(10) || chr(10) || chr(10) || 'nav' || chr(13) || chr(10)),
             |    (CAST(1000003 AS BIGINT), 'a' || chr(10) || 'b' || chr(10) || 'c'),
             |    (CAST(1000004 AS BIGINT), '   ' || chr(10) || chr(9) || chr(10)),
             |    (CAST(1000005 AS BIGINT), 'same' || chr(10) || 'same' || chr(10) || 'same' || chr(10) || 'same')) v(doc_id, text)),
             |l AS (SELECT doc_id, trim(s, ' ' || chr(9) || chr(13)) AS line
             |      FROM (SELECT doc_id, unnest(string_split(text, chr(10))) AS s FROM u)),
             |ne AS (SELECT doc_id, line FROM l WHERE line <> ''),
             |g AS (SELECT doc_id, line, count(*) AS c, length(line) AS len
             |      FROM ne GROUP BY doc_id, line),
             |agg AS (SELECT doc_id, CAST(sum(c) AS BIGINT) AS n_lines,
             |          CAST(sum(c - 1) AS BIGINT) AS dup_lines,
             |          CAST(sum((c - 1) * len) AS BIGINT) AS dup_chars,
             |          CAST(sum(c * len) AS BIGINT) AS tot_chars
             |        FROM g GROUP BY doc_id)
             |SELECT u.doc_id,
             |  coalesce(n_lines, 0) AS n_lines,
             |  coalesce(dup_lines, 0) AS dup_lines,
             |  CASE WHEN coalesce(n_lines, 0) > 0
             |    THEN CAST(dup_lines AS DOUBLE) / n_lines ELSE 0.0 END AS dup_line_frac,
             |  CASE WHEN coalesce(tot_chars, 0) > 0
             |    THEN CAST(dup_chars AS DOUBLE) / tot_chars ELSE 0.0 END AS dup_char_frac
             |FROM u LEFT JOIN agg USING (doc_id) ORDER BY doc_id""".stripMargin)),

    // Duplicate-line REMOVAL ([[graft.functions.DedupLines]]) — the
    // rewrite paired with q_tx_dupline's census: first occurrence of
    // each trimmed non-empty line survives in original order. The
    // oracle rebuilds each document with min-position first
    // occurrences and an ordered string_agg — the full cleaned text
    // is hash-checked.
    QueryDef("q_tx_dedup_lines",
      (s, d) => {
        import s.implicits._
        val tricky = Seq(
          (1000001L, "header\nbody one\nheader\nbody two\nheader\n"),
          (1000002L, "  nav  \r\nnav\nunique line\n\n\nnav\r\n"),
          (1000003L, "a\nb\nc"),
          (1000004L, "   \n\t\n"),
          (1000005L, "same\nsame\nsame\nsame")
        ).toDF("doc_id", "text")
        t(s, d, "documents").select(col("doc_id"), col("text"))
          .unionAll(tricky)
          .select(col("doc_id"),
            graft.functions.TextExpressions.dedupLines(col("text")).as("cleaned"))
          .orderBy("doc_id")
      },
      Some("""WITH u AS (
             |  SELECT doc_id, text FROM documents
             |  UNION ALL SELECT * FROM (VALUES
             |    (CAST(1000001 AS BIGINT), 'header' || chr(10) || 'body one' || chr(10) || 'header' || chr(10) || 'body two' || chr(10) || 'header' || chr(10)),
             |    (CAST(1000002 AS BIGINT), '  nav  ' || chr(13) || chr(10) || 'nav' || chr(10) || 'unique line' || chr(10) || chr(10) || chr(10) || 'nav' || chr(13) || chr(10)),
             |    (CAST(1000003 AS BIGINT), 'a' || chr(10) || 'b' || chr(10) || 'c'),
             |    (CAST(1000004 AS BIGINT), '   ' || chr(10) || chr(9) || chr(10)),
             |    (CAST(1000005 AS BIGINT), 'same' || chr(10) || 'same' || chr(10) || 'same' || chr(10) || 'same')) v(doc_id, text)),
             |spl AS (SELECT doc_id, string_split(text, chr(10)) AS ls FROM u),
             |pos AS (SELECT doc_id, CAST(j AS INT) AS j,
             |          trim(ls[CAST(j AS INT)], ' ' || chr(9) || chr(13)) AS line
             |        FROM spl, range(1, 100000) r(j) WHERE j <= len(ls)),
             |fo AS (SELECT doc_id, line, min(j) AS fj FROM pos
             |       WHERE line <> '' GROUP BY 1, 2),
             |agg AS (SELECT doc_id, string_agg(line, chr(10) ORDER BY fj) AS cleaned
             |        FROM fo GROUP BY doc_id)
             |SELECT u.doc_id, coalesce(agg.cleaned, '') AS cleaned
             |FROM u LEFT JOIN agg USING (doc_id) ORDER BY doc_id""".stripMargin)),

    // Repetition signal: duplicate word-3-gram ratio per document
    QueryDef("q_tx_repetition",
      (s, d) => {
        val sh = TextAnalysis.wordShingles(col("text"), 3)
        t(s, d, "documents")
          .select(col("doc_id"), size(sh).cast("long").as("n_3grams"),
            round(TextAnalysis.repetitionScore(col("text")), 4).as("rep3"))
          .orderBy("doc_id")
      },
      Some("""WITH sh AS (
             |  SELECT doc_id,
             |    list_transform(range(1, greatest(len(t) - 1, 1)),
             |                   i -> array_to_string(t[i:i+2], ' ')) AS shingles
             |  FROM (SELECT doc_id, string_split_regex(lower(text), '\s+') AS t
             |        FROM documents))
             |SELECT doc_id, CAST(len(shingles) AS BIGINT) AS n_3grams,
             |  round(CASE WHEN len(shingles) > 0
             |             THEN 1 - len(list_distinct(shingles))::DOUBLE / len(shingles)
             |             ELSE 0.0 END, 4) AS rep3
             |FROM sh ORDER BY doc_id""".stripMargin)),

    // Whole-document rolling-hash fingerprint (31-polynomial mod
    // 1e9+7) — unlike the xxhash shingle fingerprint this IS
    // SQL-portable, so it gets a full value oracle
    QueryDef("q_tx_rollhash",
      (s, d) => t(s, d, "documents")
        .select(col("doc_id"), TextAnalysis.rollingHash(col("text")).as("rh"))
        .orderBy("doc_id"),
      Some("""SELECT doc_id,
             |  list_reduce(
             |    list_prepend(0::BIGINT,
             |      list_transform(range(1, length(text) + 1),
             |                     i -> unicode(substr(text, i, 1))::BIGINT)),
             |    (h, c) -> (h * 31 + c) % 1000000007) AS rh
             |FROM documents ORDER BY doc_id""".stripMargin)),

    // Deterministic split via the SQL-portable Lehmer bucket — same
    // stability guarantees as the xxhash split but with a full value
    // oracle (the membership arithmetic re-evaluates in DuckDB)
    QueryDef("q_sample_portable",
      (s, d) => t(s, d, "documents")
        .withColumn("split",
          when(graft.ext.Sampling.minstdBucket(col("doc_id"), 10) < 8, "train")
            .otherwise("eval"))
        .groupBy("split")
        .agg(count(lit(1)).as("n_docs"),
          sum(length(col("text"))).cast("long").as("n_chars"))
        .orderBy("split"),
      Some("""SELECT
             |  CASE WHEN ((doc_id % 2147483647) * 48271) % 2147483647 % 10 < 8
             |       THEN 'train' ELSE 'eval' END AS split,
             |  count(*) AS n_docs,
             |  CAST(sum(length(text)) AS BIGINT) AS n_chars
             |FROM documents GROUP BY 1 ORDER BY 1""".stripMargin)),

    // Epoch-seeded deterministic shuffle manifest
    // ([[graft.ext.Sampling.epochShuffle]]): every document gets a
    // (shard, pos) training-order slot; shard assignment is a pure
    // per-row MINSTD chain (epoch as additive salt), positions a
    // window PER SHARD — never a global sort. Two epochs are emitted
    // so the gate also proves distinct epochs give distinct
    // permutations via distinct arithmetic, not a rotation.
    QueryDef("q_sample_shuffle",
      (s, d) => {
        val docs = t(s, d, "documents").select(col("doc_id"))
        graft.ext.Sampling.epochShuffle(docs, col("doc_id"), epoch = 0, shards = 8)
          .withColumn("epoch", lit(0))
          .unionByName(graft.ext.Sampling
            .epochShuffle(docs, col("doc_id"), epoch = 1, shards = 8)
            .withColumn("epoch", lit(1)))
          .select(col("epoch"), col("shard"), col("pos"), col("doc_id"))
          .orderBy("epoch", "shard", "pos")
      },
      Some("""WITH h AS (
             |  SELECT e.epoch, doc_id,
             |    ((((doc_id + e.epoch * 999983) % 2147483647) * 48271)
             |      % 2147483647 * 48271) % 2147483647 AS hv
             |  FROM documents, (VALUES (0), (1)) e(epoch)),
             |m AS (
             |  SELECT epoch, CAST(hv % 8 AS INT) AS shard,
             |    row_number() OVER (PARTITION BY epoch, hv % 8
             |                       ORDER BY hv, doc_id) - 1 AS pos,
             |    doc_id
             |  FROM h)
             |SELECT epoch, shard, CAST(pos AS BIGINT) AS pos, doc_id
             |FROM m ORDER BY epoch, shard, pos""".stripMargin)),

    // Per-source corpus scorecard ([[graft.ext.Quality
    // .corpusScorecard]]): the one-page ingestion report per feed —
    // volumes, corpus-wide duplicate exposure (per-hash counts ride a
    // 16-byte md5 shuffle, never text), mean quality. A composition
    // gate: every metric is a primitive the suite gates individually;
    // this hash-checks them ASSEMBLED.
    QueryDef("q_quality_scorecard",
      (s, d) => graft.ext.Quality.corpusScorecard(
          t(s, d, "documents"), "source", "text")
        .orderBy("source"),
      Some(s"""WITH h AS (SELECT source, text, md5(text) AS hh FROM documents),
              |d AS (SELECT hh, count(*) AS n FROM h GROUP BY 1)
              |SELECT source, count(*) AS n_docs,
              |  CAST(sum(length(text)) AS BIGINT) AS n_chars,
              |  CAST(sum(CASE WHEN d.n > 1 THEN 1 ELSE 0 END) AS BIGINT) AS n_dup,
              |  round(avg($qualitySqlExpr), 4) AS mean_quality
              |FROM h JOIN d USING (hh)
              |GROUP BY 1 ORDER BY source""".stripMargin)),

    // Deterministic train/eval split + per-split stats, through the
    // full Sampling.split weights→cuts→CASE machinery in portable
    // (MINSTD-bucket) mode — the oracle re-derives the membership
    // arithmetic, so the cut-point bookkeeping is value-checked (the
    // xxhash64 default path shares everything but the bucket hash).
    QueryDef("q_sample_split",
      (s, d) => graft.ext.Sampling.split(
        t(s, d, "documents"), col("doc_id"), Seq("train" -> 0.9, "eval" -> 0.1),
        portable = true)
        .groupBy("split")
        .agg(count(lit(1)).as("n_docs"), sum("n_chars").as("sum_chars"))
        .orderBy("split"),
      Some("""SELECT
             |  CASE WHEN ((doc_id % 2147483647) * 48271) % 2147483647 % 1000000 < 900000
             |       THEN 'train' ELSE 'eval' END AS split,
             |  count(*) AS n_docs,
             |  CAST(sum(n_chars) AS BIGINT) AS sum_chars
             |FROM documents GROUP BY 1 ORDER BY 1""".stripMargin)),

    // Stratified sampling composed with language-ID: downsample the
    // dominant language to 50%, keep the rest — the standard mixture
    // rebalancing step before training. Portable MINSTD membership +
    // the shared langId oracle expression give a full value check of
    // the per-stratum fraction arithmetic.
    QueryDef("q_sample_stratified",
      (s, d) => {
        val docs = t(s, d, "documents")
          .withColumn("pred_lang", TextAnalysis.langId(col("text")))
        graft.ext.Sampling.stratifiedSample(docs, col("doc_id"), col("pred_lang"),
          Map("en" -> 0.5), defaultFraction = 1.0, portable = true)
          .groupBy("pred_lang").agg(count(lit(1)).as("n_docs"))
          .orderBy("pred_lang")
      },
      Some(s"""WITH langs AS (SELECT doc_id, $langIdSqlExpr AS pred_lang FROM documents)
              |SELECT pred_lang, count(*) AS n_docs FROM langs
              |WHERE ((doc_id % 2147483647) * 48271) % 2147483647 % 1000000 <
              |      CAST((CASE WHEN pred_lang = 'en' THEN 0.5 ELSE 1.0 END) * 1000000 AS BIGINT)
              |GROUP BY 1 ORDER BY 1""".stripMargin),
      bench = true),

    // Temperature-scaled domain mixing (alpha = 0.5, target 25%):
    // per-language keep fractions follow p(s) ∝ sqrt(n_s); the oracle
    // re-derives the 2^-20-grid weights, the fraction formula, and
    // every row's MINSTD membership test.
    QueryDef("q_sample_temperature",
      (s, d) => graft.ext.Sampling.temperatureSample(
        t(s, d, "documents").select("doc_id", "lang"),
        col("doc_id"), col("lang"), alpha = 0.5, targetFraction = 0.25,
        portable = true)
        .orderBy("doc_id"),
      Some("""WITH c AS (SELECT lang, count(*) AS n FROM documents GROUP BY lang),
             |w AS (SELECT lang, n,
             |  CAST(floor(sqrt(CAST(n AS DOUBLE)) * 1048576 + 0.5) AS BIGINT) AS wq
             |  FROM c),
             |tot AS (SELECT CAST(sum(n) AS BIGINT) AS totn, CAST(sum(wq) AS BIGINT) AS totw FROM w),
             |fr AS (SELECT lang, least(1.0, 0.25 * totn * (wq / totw) / n) AS f
             |       FROM w CROSS JOIN tot)
             |SELECT d.doc_id, d.lang FROM documents d JOIN fr USING (lang)
             |WHERE ((doc_id % 2147483647) * 48271) % 2147483647 % 1000000 <
             |      CAST(floor(f * 1000000) AS BIGINT)
             |ORDER BY doc_id""".stripMargin)),

    // Per-source frequency cap: at most 10 docs per source, chosen by
    // portable hash order — bounded-state top-k per group (size-10
    // heaps, map-side combine), NOT a window sort; the oracle replays
    // the same selection with row_number().
    QueryDef("q_sample_cap",
      (s, d) => graft.ext.Sampling.capPerGroup(
        t(s, d, "documents"), col("source"), col("doc_id"), cap = 10)
        .orderBy("source", "doc_id"),
      Some("""WITH ranked AS (
             |  SELECT source, doc_id,
             |    ((doc_id % 2147483647) * 48271) % 2147483647 % 1000000 AS hb,
             |    row_number() OVER (PARTITION BY source
             |      ORDER BY ((doc_id % 2147483647) * 48271) % 2147483647 % 1000000,
             |               doc_id) AS rn
             |  FROM documents)
             |SELECT source, hb, doc_id FROM ranked WHERE rn <= 10
             |ORDER BY source, doc_id""".stripMargin)),

    // Per-source top-p (nucleus) selection
    // ([[graft.ext.Sampling.topPSelect]]): keep each source's best
    // docs (by n_chars, ties to smaller id) until they cover 60% of
    // the source's total character mass — the budget dual of the
    // fixed-count cap above; a skewed source keeps few docs, a flat
    // one keeps many. Keep predicate is all-int64
    // ((cum−score)·5 < 3·tot), so the oracle replays it exactly.
    QueryDef("q_sample_topp",
      (s, d) => graft.ext.Sampling.topPSelect(
          t(s, d, "documents").select("doc_id", "source", "n_chars"),
          col("source"), col("doc_id"), col("n_chars"), pNum = 3, pDen = 5)
        .orderBy("doc_id"),
      Some("""WITH r AS (
             |  SELECT doc_id, source, n_chars,
             |    sum(n_chars) OVER (PARTITION BY source
             |      ORDER BY n_chars DESC, doc_id
             |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cum,
             |    sum(n_chars) OVER (PARTITION BY source) AS tot
             |  FROM documents)
             |SELECT doc_id, source, n_chars FROM r
             |WHERE (cum - n_chars) * 5 < 3 * tot ORDER BY doc_id""".stripMargin)),

    // Weighted sampling without replacement (DLT priority sampling):
    // 200 docs with inclusion odds ∝ n_chars — integer priority
    // u·10¹² div w from the MINSTD bucket, k smallest kept, so the
    // oracle re-derives the exact member set. The top-k is a
    // TakeOrderedAndProject (per-partition heaps), not a full sort.
    QueryDef("q_sample_weighted",
      (s, d) => graft.ext.Sampling.prioritySample(
        t(s, d, "documents").select("doc_id", "n_chars"),
        col("doc_id"), col("n_chars"), k = 200)
        .orderBy("priority", "doc_id"),
      Some("""SELECT doc_id, n_chars,
             |  (((doc_id % 2147483647) * 48271) % 2147483647 % 1000000 + 1)
             |    * 1000000000000 // GREATEST(n_chars, 1) AS priority
             |FROM documents
             |ORDER BY priority, doc_id LIMIT 200""".stripMargin)),

    // Token-budget waterfill: spend 140k chars across the 20 sources
    // as uniformly as caps allow — small sources are taken whole, the
    // rest cut to the integer water level (remainder to the first few
    // uncapped in capacity order). The oracle replays rank, prefix,
    // cap flags, and remainder placement with window functions.
    QueryDef("q_sample_waterfill",
      (s, d) => graft.ext.Sampling.budgetWaterfill(
        t(s, d, "documents"), col("source"), col("n_chars"), budget = 140000L)
        .orderBy("source"),
      Some("""WITH caps AS (
             |  SELECT source, CAST(sum(n_chars) AS BIGINT) AS cap
             |  FROM documents GROUP BY 1),
             |ord AS (
             |  SELECT source, cap,
             |    row_number() OVER (ORDER BY cap, source) AS k,
             |    CAST(coalesce(sum(cap) OVER (ORDER BY cap, source
             |      ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0)
             |      AS BIGINT) AS pb,
             |    count(*) OVER () AS n
             |  FROM caps),
             |flag AS (
             |  SELECT *, (pb + cap * (n - k + 1) <= 140000) AS capped FROM ord),
             |st AS (
             |  SELECT CAST(coalesce(sum(CASE WHEN capped THEN cap END), 0)
             |           AS BIGINT) AS pm,
             |         CAST(coalesce(sum(CASE WHEN capped THEN 1 END), 0)
             |           AS BIGINT) AS m
             |  FROM flag)
             |SELECT f.source, f.cap,
             |  CASE WHEN f.capped THEN f.cap
             |       ELSE (140000 - st.pm) // GREATEST(f.n - st.m, 1)
             |          + (CASE WHEN f.k - st.m <=
             |               (140000 - st.pm) % GREATEST(f.n - st.m, 1)
             |             THEN 1 ELSE 0 END)
             |  END AS alloc
             |FROM flag f, st ORDER BY f.source""".stripMargin)),

    // Per-doc unigram entropy (lexical diversity): ln n − (Σ c·ln c)/n
    // with each token-type term quantized to the 2^-20 grid before
    // the integer per-doc sum — the oracle replays type counts,
    // quantization, and the rollup exactly.
    QueryDef("q_tx_entropy",
      (s, d) => graft.ext.CorpusStats.lexicalEntropy(t(s, d, "documents"))
        .orderBy("doc_id"),
      Some("""WITH toks AS (
             |  SELECT doc_id, unnest(string_split_regex(lower(text), '\s+')) AS token
             |  FROM documents),
             |ct AS (SELECT doc_id, token, count(*) AS c FROM toks GROUP BY 1, 2),
             |q AS (
             |  SELECT doc_id, c,
             |    CAST(floor(ln(c) * c * 1048576.0 + 0.5) AS BIGINT) AS q
             |  FROM ct),
             |per AS (
             |  SELECT doc_id, CAST(sum(c) AS BIGINT) AS n_tokens,
             |    CAST(sum(q) AS BIGINT) AS sq
             |  FROM q GROUP BY 1)
             |SELECT doc_id, n_tokens,
             |  round(ln(n_tokens) - CAST(sq AS DOUBLE) / (n_tokens * 1048576.0), 6)
             |    AS entropy
             |FROM per ORDER BY doc_id""".stripMargin)),

    // Per-code-point character-class census (mojibake battery): one
    // native sweep per document, ASCII-pinned classes so both engines
    // count identically; the oracle strips each class's complement
    // with RE2 and counts code points with length(). Per-doc rows so
    // any single misclassified character fails the hash.
    QueryDef("q_tx_charclass",
      (s, d) => t(s, d, "documents")
        .select(col("doc_id"),
          graft.ext.TextAnalysis.charClassCounts(col("text")).as("c"))
        .select(col("doc_id"),
          col("c").getItem(0).cast("long").as("n_letter"),
          col("c").getItem(1).cast("long").as("n_digit"),
          col("c").getItem(2).cast("long").as("n_ws"),
          col("c").getItem(3).cast("long").as("n_punct"),
          col("c").getItem(4).cast("long").as("n_ctrl"),
          col("c").getItem(5).cast("long").as("n_replacement"),
          col("c").getItem(6).cast("long").as("n_other"))
        .orderBy("doc_id"),
      Some("""SELECT doc_id,
             |  CAST(length(regexp_replace(text, '[^A-Za-z]', '', 'g')) AS BIGINT) AS n_letter,
             |  CAST(length(regexp_replace(text, '[^0-9]', '', 'g')) AS BIGINT) AS n_digit,
             |  CAST(length(regexp_replace(text, '[^ \t\n\x0B\f\r]', '', 'g')) AS BIGINT) AS n_ws,
             |  CAST(length(regexp_replace(text, '[^\x21-\x2f\x3a-\x40\x5b-\x60\x7b-\x7e]', '', 'g')) AS BIGINT) AS n_punct,
             |  CAST(length(regexp_replace(text, '[^\x00-\x08\x0e-\x1f\x7f]', '', 'g')) AS BIGINT) AS n_ctrl,
             |  CAST(length(regexp_replace(text, '[^\x{FFFD}]', '', 'g')) AS BIGINT) AS n_replacement,
             |  CAST(length(text)
             |       - length(regexp_replace(text, '[^A-Za-z0-9]', '', 'g'))
             |       - length(regexp_replace(text, '[^ \t\n\x0B\f\r]', '', 'g'))
             |       - length(regexp_replace(text, '[^\x21-\x2f\x3a-\x40\x5b-\x60\x7b-\x7e]', '', 'g'))
             |       - length(regexp_replace(text, '[^\x00-\x08\x0e-\x1f\x7f]', '', 'g'))
             |       - length(regexp_replace(text, '[^\x{FFFD}]', '', 'g')) AS BIGINT) AS n_other
             |FROM documents ORDER BY doc_id""".stripMargin)),

    // Waterfill materialized: the actual ≤100k-char training subset —
    // per source, whole docs in MINSTD order until the allocation
    // would overrun. Oracle replays the waterfill AND the per-source
    // greedy prefix.
    QueryDef("q_sample_waterfill_docs",
      (s, d) => graft.ext.Sampling.waterfillSample(
        t(s, d, "documents"), col("source"), col("doc_id"), col("n_chars"),
        budget = 100000L)
        .orderBy("source", "id"),
      Some("""WITH caps AS (
             |  SELECT source, CAST(sum(n_chars) AS BIGINT) AS cap
             |  FROM documents GROUP BY 1),
             |ord AS (
             |  SELECT source, cap,
             |    row_number() OVER (ORDER BY cap, source) AS k,
             |    CAST(coalesce(sum(cap) OVER (ORDER BY cap, source
             |      ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0)
             |      AS BIGINT) AS pb,
             |    count(*) OVER () AS n
             |  FROM caps),
             |flag AS (
             |  SELECT *, (pb + cap * (n - k + 1) <= 100000) AS capped FROM ord),
             |st AS (
             |  SELECT CAST(coalesce(sum(CASE WHEN capped THEN cap END), 0)
             |           AS BIGINT) AS pm,
             |         CAST(coalesce(sum(CASE WHEN capped THEN 1 END), 0)
             |           AS BIGINT) AS m
             |  FROM flag),
             |alloc AS (
             |  SELECT f.source,
             |    CASE WHEN f.capped THEN f.cap
             |         ELSE (100000 - st.pm) // GREATEST(f.n - st.m, 1)
             |            + (CASE WHEN f.k - st.m <=
             |                 (100000 - st.pm) % GREATEST(f.n - st.m, 1)
             |               THEN 1 ELSE 0 END)
             |    END AS alloc
             |  FROM flag f, st),
             |cum AS (
             |  SELECT source, doc_id AS id, CAST(n_chars AS BIGINT) AS w,
             |    CAST(sum(n_chars) OVER (PARTITION BY source
             |      ORDER BY ((doc_id % 2147483647) * 48271) % 2147483647 % 1000000,
             |               doc_id
             |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
             |      AS BIGINT) AS cum_w
             |  FROM documents)
             |SELECT c.source, c.id, c.w, c.cum_w
             |FROM cum c JOIN alloc a USING (source)
             |WHERE c.cum_w <= a.alloc ORDER BY source, id""".stripMargin)),

    // DSIR importance resampling (Xie et al. 2023): pick the 100 raw
    // docs (18 sources) whose hashed-unigram profile best matches the
    // src0/src1 target domain. The oracle replays the full derivation
    // — per-token rolling-hash bucket, both smoothed histograms, the
    // 2^-20-quantized log-ratio table, and the integer-score top-k —
    // so a drift anywhere in the chain hash-fails.
    QueryDef("q_sample_dsir",
      (s, d) => {
        val docs = t(s, d, "documents")
        graft.ext.CorpusStats.dsirSelect(
          docs.where(!col("source").isin("src0", "src1")),
          docs.where(col("source").isin("src0", "src1")),
          k = 100, buckets = 1024)
      },
      Some("""WITH rtok AS (
             |  SELECT doc_id,
             |    (list_reduce(
             |       list_prepend(0::BIGINT,
             |         list_transform(range(1, length(token) + 1),
             |                        i -> unicode(substr(token, i, 1))::BIGINT)),
             |       (h, c) -> (h * 31 + c) % 1000000007) % 1024) AS bucket
             |  FROM (SELECT doc_id,
             |          unnest(string_split_regex(lower(text), '\s+')) AS token
             |        FROM documents WHERE source NOT IN ('src0', 'src1'))),
             |ttok AS (
             |  SELECT (list_reduce(
             |       list_prepend(0::BIGINT,
             |         list_transform(range(1, length(token) + 1),
             |                        i -> unicode(substr(token, i, 1))::BIGINT)),
             |       (h, c) -> (h * 31 + c) % 1000000007) % 1024) AS bucket
             |  FROM (SELECT unnest(string_split_regex(lower(text), '\s+')) AS token
             |        FROM documents WHERE source IN ('src0', 'src1'))),
             |db AS (SELECT doc_id, bucket, count(*) AS cnt FROM rtok GROUP BY 1, 2),
             |rb AS (SELECT bucket, CAST(sum(cnt) AS BIGINT) AS cr FROM db GROUP BY 1),
             |tb AS (SELECT bucket, count(*) AS ct FROM ttok GROUP BY 1),
             |nt AS (SELECT CAST(coalesce(sum(ct), 0) AS BIGINT) AS nt FROM tb),
             |nr AS (SELECT CAST(coalesce(sum(cr), 0) AS BIGINT) AS nr FROM rb),
             |lam AS (
             |  SELECT rb.bucket,
             |    CAST(floor(ln((coalesce(tb.ct, 0) + 1) * 1.0 / (nt.nt + 1024))
             |      * 1048576.0 + 0.5) AS BIGINT)
             |  - CAST(floor(ln((rb.cr + 1) * 1.0 / (nr.nr + 1024))
             |      * 1048576.0 + 0.5) AS BIGINT) AS lam
             |  FROM rb LEFT JOIN tb USING (bucket) CROSS JOIN nt CROSS JOIN nr),
             |sc AS (
             |  SELECT doc_id, CAST(sum(cnt) AS BIGINT) AS n_tokens,
             |    CAST(sum(cnt * lam) AS BIGINT) AS sq
             |  FROM db JOIN lam USING (bucket) GROUP BY 1)
             |SELECT doc_id, n_tokens,
             |  round(CAST(sq AS DOUBLE) / 1048576.0, 6) AS score
             |FROM sc ORDER BY sq DESC, doc_id LIMIT 100""".stripMargin),
      bench = true),

    // Contrastive negative mining: 4 deterministic negatives per
    // query doc (doc_id < 50) drawn over the prefix-sum-numbered
    // corpus — ONE equi-join, no cross join, MINSTD draws the oracle
    // replays exactly (its row_number numbering matches the
    // two-phase prefix sum by construction: both order by doc_id).
    QueryDef("q_sample_negatives",
      (s, d) => {
        val docs = t(s, d, "documents").select("doc_id")
        graft.ext.Sampling.negativePairs(
          docs.filter(col("doc_id") < 50), col("doc_id"), docs, col("doc_id"), k = 4)
          .orderBy("q_key", "slot")
      },
      Some("""WITH numbered AS (
             |  SELECT doc_id, row_number() OVER (ORDER BY doc_id) - 1 AS idx
             |  FROM documents),
             |n AS (SELECT count(*) AS cnt FROM documents),
             |slots AS (
             |  SELECT d.doc_id AS q_key, s.j AS slot
             |  FROM documents d CROSS JOIN range(0, 4) s(j) WHERE d.doc_id < 50),
             |draws AS (
             |  SELECT q_key, slot,
             |    ((((q_key % 2147483647) * 1000003 + slot * 7919) % 2147483647)
             |      * 48271) % 2147483647 % cnt AS idx
             |  FROM slots CROSS JOIN n)
             |SELECT q_key, slot, nu.doc_id AS neg_key
             |FROM draws JOIN numbered nu USING (idx)
             |WHERE nu.doc_id <> q_key
             |ORDER BY q_key, slot""".stripMargin)),

    // Collocation detection: top bigrams by integer-scaled PMI
    // (c_xy·N·10^6 div c_x·c_y — exact integer arithmetic, so the
    // score and ORDER are engine-portable with no log/float). BOTH
    // sides of the divide are widened to DECIMAL(38,0) (HUGEINT in
    // the oracle) before their multiplies: c_xy·N·10^6 wraps a
    // BIGINT once c_xy·N > ~9.2·10^12, and the denominator c_x·c_y
    // wraps once two stopwords each exceed ~3·10^9 occurrences —
    // both reachable on a real corpus. The integral quotient itself
    // is ≤ 10^6·N / max(c_x,c_y), back in BIGINT range until
    // N ~ 10^13 tokens. Bigrams come shuffle-free from
    // zipping the token array against itself shifted by one
    // ([[TextAnalysis.bigrams]]) — no self-join, no per-doc window
    // sort.
    QueryDef("q_tx_colloc",
      (s, d) => {
        val docs = t(s, d, "documents")
        val uni = docs.select(explode(split(lower(col("text")), "\\s+")).as("w"))
          .groupBy("w").agg(count(lit(1)).as("c"))
        val nTok = uni.agg(sum(col("c")).as("n"))
        val bi = docs.select(explode(TextAnalysis.bigrams(col("text"))).as("b"))
          .select(col("b.w1").as("w1"), col("b.w2").as("w2"))
          .groupBy("w1", "w2").agg(count(lit(1)).as("c_xy"))
          .filter(col("c_xy") >= 5)
        bi.join(uni.select(col("w").as("w1"), col("c").as("c_x")), "w1")
          .join(uni.select(col("w").as("w2"), col("c").as("c_y")), "w2")
          .crossJoin(broadcast(nTok))
          .select(col("w1"), col("w2"), col("c_xy"),
            call_function("div",
              col("c_xy").cast("decimal(38,0)") * col("n") * 1000000L,
              col("c_x").cast("decimal(38,0)") * col("c_y")).as("pmi_score"))
          .orderBy(desc("pmi_score"), col("w1"), col("w2"))
          .limit(20)
      },
      Some("""WITH toks AS (
             |  SELECT string_split_regex(lower(text), '\s+') AS t FROM documents),
             |uni AS (
             |  SELECT w, count(*) AS c
             |  FROM (SELECT unnest(t) AS w FROM toks) GROUP BY w),
             |ntok AS (SELECT sum(c)::BIGINT AS n FROM uni),
             |bi0 AS (
             |  SELECT unnest(list_transform(range(1, len(t)),
             |    i -> struct_pack(w1 := t[i], w2 := t[i+1]))) AS p
             |  FROM toks),
             |bi AS (
             |  SELECT p.w1 AS w1, p.w2 AS w2, count(*) AS c_xy
             |  FROM bi0 GROUP BY 1, 2 HAVING count(*) >= 5)
             |SELECT w1, w2, c_xy,
             |  ((c_xy::HUGEINT * n * 1000000) // (cx.c::HUGEINT * cy.c))::BIGINT AS pmi_score
             |FROM bi
             |JOIN uni cx ON bi.w1 = cx.w
             |JOIN uni cy ON bi.w2 = cy.w
             |CROSS JOIN ntok
             |ORDER BY pmi_score DESC, w1, w2 LIMIT 20""".stripMargin),
      bench = true),

    // Corpus-statistics quality: per-doc mean unigram log-probability
    // under the corpus's own distribution (rare-token-heavy docs score
    // low). Per-token log-probs are quantized to 2^-20 before the
    // mean, so Spark's partial-agg order and DuckDB's join order
    // cannot diverge — the oracle re-derives every value exactly.
    QueryDef("q_tx_logprob",
      (s, d) => graft.ext.CorpusStats.unigramLogProb(t(s, d, "documents"))
        .orderBy("doc_id"),
      Some("""WITH toks AS (
             |  SELECT doc_id, unnest(string_split_regex(lower(text), '\s+')) AS token
             |  FROM documents),
             |freq AS (SELECT token, count(*) AS tf FROM toks GROUP BY 1),
             |tot AS (SELECT CAST(sum(tf) AS BIGINT) AS t FROM freq),
             |ql AS (
             |  SELECT doc_id,
             |    CAST(floor(ln(tf * 1.0 / t) * 1048576.0 + 0.5) AS BIGINT) AS qlp
             |  FROM toks JOIN freq USING (token) CROSS JOIN tot)
             |SELECT doc_id, count(*) AS n_tokens,
             |  round(CAST(sum(qlp) AS DOUBLE) / (count(*) * 1048576.0), 6) AS avg_logprob
             |FROM ql GROUP BY doc_id ORDER BY doc_id""".stripMargin)),

    // Bigram-LM cross-entropy: -mean ln p(w2|w1) per doc under the
    // corpus's own add-one-smoothed bigram model — the sequence-aware
    // fluency score (scrambled text scores high even when its
    // unigrams are common). Same 2^-20 quantized-sum determinism as
    // q_tx_logprob; the oracle rebuilds the bigram stream, both count
    // tables, the vocabulary and the identical smoothed terms.
    QueryDef("q_tx_bigram_ce",
      (s, d) => graft.ext.CorpusStats.bigramCrossEntropy(t(s, d, "documents"))
        .orderBy("doc_id"),
      Some("""WITH tokd AS (
             |  SELECT doc_id, string_split_regex(lower(text), '\s+') AS t
             |  FROM documents),
             |bi AS (
             |  SELECT doc_id, t[r.i] AS w1, t[r.i + 1] AS w2
             |  FROM tokd, LATERAL (SELECT unnest(range(1, len(t)))) AS r(i)),
             |d12 AS (SELECT doc_id, w1, w2, count(*) AS cd FROM bi GROUP BY 1, 2, 3),
             |c12 AS (SELECT w1, w2, count(*) AS c12 FROM bi GROUP BY 1, 2),
             |c1 AS (SELECT w1, count(*) AS c1 FROM bi GROUP BY 1),
             |v AS (SELECT count(DISTINCT tok) AS v FROM (
             |        SELECT unnest(t) AS tok FROM tokd)),
             |scored AS (
             |  SELECT d.doc_id, d.cd,
             |    CAST(floor(ln((c12.c12 + 1) * 1.0 / (c1.c1 + v.v)) * 1048576.0 + 0.5)
             |      AS BIGINT) AS qlp
             |  FROM d12 d JOIN c12 USING (w1, w2) JOIN c1 USING (w1), v),
             |per_doc AS (
             |  SELECT doc_id, CAST(sum(cd) AS BIGINT) AS n_bigrams,
             |    round(-CAST(sum(qlp * cd) AS DOUBLE)
             |      / (CAST(sum(cd) AS BIGINT) * 1048576.0), 6) AS cross_entropy
             |  FROM scored GROUP BY doc_id)
             |SELECT d.doc_id, p.n_bigrams, p.cross_entropy
             |FROM documents d LEFT JOIN per_doc p USING (doc_id)
             |ORDER BY doc_id""".stripMargin), bench = true),

    // Distribution drift: add-one-smoothed unigram KL(train || eval)
    // across the portable 90/10 split — the monitor a pipeline runs
    // between corpus snapshots. Per-vocab-term quantization (2^-30)
    // makes the sum order-independent; the oracle rebuilds the split,
    // both frequency tables, the union vocabulary and the same
    // smoothed terms.
    QueryDef("q_tx_kl",
      (s, d) => {
        val split = graft.ext.Sampling.split(t(s, d, "documents"), col("doc_id"),
          Seq("train" -> 0.9, "eval" -> 0.1), portable = true)
        graft.ext.CorpusStats.tokenKl(
          split.filter(col("split") === "train"),
          split.filter(col("split") === "eval"))
      },
      Some("""WITH lab AS (
             |  SELECT doc_id, text,
             |    CASE WHEN ((doc_id % 2147483647) * 48271) % 2147483647 % 1000000 < 900000
             |         THEN 'train' ELSE 'eval' END AS split
             |  FROM documents),
             |fa AS (
             |  SELECT token, count(*) AS tfa FROM (
             |    SELECT unnest(string_split_regex(lower(text), '\s+')) AS token
             |    FROM lab WHERE split = 'train') GROUP BY 1),
             |fb AS (
             |  SELECT token, count(*) AS tfb FROM (
             |    SELECT unnest(string_split_regex(lower(text), '\s+')) AS token
             |    FROM lab WHERE split = 'eval') GROUP BY 1),
             |j AS (
             |  SELECT COALESCE(tfa, 0) AS tfa, COALESCE(tfb, 0) AS tfb
             |  FROM fa FULL OUTER JOIN fb USING (token)),
             |tot AS (
             |  SELECT CAST(sum(tfa) AS BIGINT) AS ta, CAST(sum(tfb) AS BIGINT) AS tb,
             |         count(*) AS v
             |  FROM j),
             |terms AS (
             |  SELECT CAST(floor(
             |    ((tfa + 1) * 1.0 / (ta + v))
             |      * ln(((tfa + 1) * 1.0 / (ta + v)) / ((tfb + 1) * 1.0 / (tb + v)))
             |      * 1073741824.0 + 0.5) AS BIGINT) AS qt
             |  FROM j CROSS JOIN tot)
             |SELECT count(*) AS vocab,
             |  round(CAST(sum(qt) AS DOUBLE) / 1073741824.0, 6) AS kl
             |FROM terms""".stripMargin)),

    // Sequence packing ("concat-and-chunk"): every document's context
    // window assignment, offset and span under 2048-token windows,
    // derived from ONE scalable exclusive prefix sum (per-bucket
    // cumsum + broadcast prefix offsets — the q_window_running
    // machinery, never a single-task global window). The oracle
    // recomputes the prefix sum with a plain window and the same
    // integer arithmetic.
    QueryDef("q_pack_docs",
      (s, d) => {
        val docs = t(s, d, "documents").select(col("doc_id"),
          TextAnalysis.tokenCountWs(col("text")).cast("long").as("n_tokens"))
        graft.ext.Packing.packPlan(docs, col("doc_id"),
          floor(col("doc_id") / 100), col("n_tokens"), contextLen = 2048)
          .select(col("doc_id"), col("n_tokens"), col("bin_id"),
            col("bin_offset"), col("n_bins_spanned"))
          .orderBy("doc_id")
      },
      Some("""WITH tc AS (
             |  SELECT doc_id, len(string_split_regex(text, '\s+')) AS n
             |  FROM documents),
             |cum AS (
             |  SELECT doc_id, n,
             |    CAST(COALESCE(sum(n) OVER (ORDER BY doc_id
             |      ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS BIGINT) AS cb
             |  FROM tc)
             |SELECT doc_id, CAST(n AS BIGINT) AS n_tokens,
             |  cb // 2048 AS bin_id, cb % 2048 AS bin_offset,
             |  ((cb + n - 1) // 2048) - (cb // 2048) + 1 AS n_bins_spanned
             |FROM cum ORDER BY doc_id""".stripMargin)),

    // Token frequency spectrum (count-of-counts): how many distinct
    // tokens occur exactly tf times — the Zipf diagnostic tokenizer
    // design reads. Two exact-integer aggregations.
    QueryDef("q_tx_zipf",
      (s, d) => t(s, d, "documents")
        .select(explode(split(lower(col("text")), "\\s+")).as("token"))
        .groupBy("token").agg(count(lit(1)).as("tf"))
        .groupBy("tf").agg(count(lit(1)).as("n_tokens"))
        .orderBy("tf"),
      Some("""WITH tok AS (
             |  SELECT unnest(string_split_regex(lower(text), '\s+')) AS token
             |  FROM documents),
             |tf AS (SELECT token, count(*) AS tf FROM tok GROUP BY token)
             |SELECT tf, count(*) AS n_tokens FROM tf GROUP BY tf ORDER BY tf""".stripMargin)),

    // Deterministic shuffle + shard assignment: shard and within-shard
    // position are pure MINSTD functions of doc_id; the oracle
    // re-derives both hashes and ranks with a per-shard row_number.
    QueryDef("q_pack_shards",
      (s, d) => graft.ext.Packing.shardAssign(
        t(s, d, "documents").select("doc_id"), col("doc_id"), nShards = 8)
        .select("doc_id", "shard", "pos")
        .orderBy("shard", "pos"),
      Some("""WITH h AS (
             |  SELECT doc_id,
             |    ((doc_id % 2147483647) * 48271) % 2147483647 AS h1
             |  FROM documents),
             |s AS (
             |  SELECT doc_id, h1 % 8 AS shard,
             |    ((h1 * 48271) % 2147483647) % 1000000 AS oh
             |  FROM h)
             |SELECT doc_id, shard,
             |  row_number() OVER (PARTITION BY shard ORDER BY oh, doc_id) - 1 AS pos
             |FROM s ORDER BY shard, pos""".stripMargin)),

    // Length-bucketed inference batching: 16-token-wide length
    // buckets, 8-doc batches in (length, id) order, per-batch padding
    // waste (n*max - sum len). The within-bucket rank comes from the
    // two-phase running total over the fine (bucket, length) order
    // bucket — the oracle re-ranks with a plain window, which is
    // exactly the equivalence worth pinning.
    QueryDef("q_pack_batches",
      (s, d) => graft.ext.Packing.lengthBucketedBatches(
        t(s, d, "documents"), "doc_id", "text", bucketWidth = 16, batchSize = 8)
        .orderBy("bucket", "batch_id"),
      Some("""WITH lens AS (
             |  SELECT doc_id, len(string_split_regex(text, '\s+')) AS dl
             |  FROM documents),
             |r AS (
             |  SELECT doc_id, dl, CAST(floor(dl / 16.0) AS BIGINT) AS bucket,
             |    row_number() OVER (PARTITION BY CAST(floor(dl / 16.0) AS BIGINT)
             |                       ORDER BY dl, doc_id) - 1 AS rk
             |  FROM lens)
             |SELECT bucket, CAST(floor(rk / 8.0) AS BIGINT) AS batch_id,
             |  count(*) AS n_docs, max(dl) AS max_dl,
             |  CAST(count(*) * max(dl) - sum(dl) AS BIGINT) AS waste
             |FROM r GROUP BY 1, 2 ORDER BY 1, 2""".stripMargin)),

    // FLAGSHIP composition — the whole training-data pipeline in one
    // oracle-checked gate: eval-set decontamination → leakage-free
    // train/eval split (near-dup clusters atomic) → pack the train
    // split into 1024-token windows. Every stage's arithmetic is one
    // of the already-gated fragments; this proves they COMPOSE
    // (wrong dedup → wrong split membership → different payload
    // bytes → hash fail).
    QueryDef("q_pipeline_e2e",
      (s, d) => {
        val docs = t(s, d, "documents").select("doc_id", "text")
        val scratch = graft.Scratch.tempDir("graft_e2e_")
        // Shingle the WHOLE corpus exactly once and materialize: every
        // downstream stage (eval shingle set, decontamination hits,
        // near-dup pairing — which references the frame four times) is
        // a narrow scan of this parquet, never a re-explode of text.
        // At 100 TB the text pass dominates; this composition pays it
        // once where the naive stage-by-stage form paid it twice plus
        // re-derivations inside the pair join.
        graft.ext.Dedup.shingleTable(docs, "doc_id", "text", n = 5)
          .write.parquet(s"$scratch/shingles")
        val sh = s.read.parquet(s"$scratch/shingles")
        val evalSh = sh.filter(col("id") % 89 === 0).select("sh").distinct()
        val corpusSh = sh.filter(col("id") % 89 =!= 0)
        val corpus = docs.filter(col("doc_id") % 89 =!= 0)
        // Materialize the decontaminated corpus AND its shingle slice
        // too (opt r17): the pair join references cleanSh four times
        // and the split references clean twice, so left lazy each
        // reference re-ran the decontamination join against the
        // shingle parquet — measured −1.3 s wall / −38% shuffle on
        // the gate with byte-identical output. Same shared-frame
        // contract as the shingle materialization above.
        graft.ext.Dedup.decontaminateFromShingles(
            corpus.select("doc_id"), "doc_id", corpusSh, evalSh)
          .filter(!col("contaminated")).select("doc_id")
          .join(corpus, "doc_id")
          .write.parquet(s"$scratch/clean")
        val clean = s.read.parquet(s"$scratch/clean")
        corpusSh.join(clean.select(col("doc_id").as("id")), "id")
          .write.parquet(s"$scratch/clean_shingles")
        val cleanSh = s.read.parquet(s"$scratch/clean_shingles")
        val pairs = graft.ext.Dedup.jaccardPairsFromShingles(cleanSh, threshold = 0.6)
        val train = graft.ext.Sampling.leakFreeSplitFromPairs(clean, "doc_id",
            pairs, Seq("train" -> 0.9, "eval" -> 0.1), scratchDir = Some(scratch))
          .filter(col("split") === "train").select("doc_id", "text")
        graft.ext.Packing.packWindows(train, floor(col("doc_id") / 100),
          contextLen = 1024).orderBy("bin_id")
      },
      Some("""WITH RECURSIVE toks0 AS (
             |  SELECT doc_id, string_split_regex(lower(text), '\s+') AS t
             |  FROM documents),
             |sh0 AS (
             |  SELECT DISTINCT doc_id, s FROM (
             |    SELECT doc_id,
             |      unnest(list_transform(range(1, greatest(len(t) - 3, 1)),
             |                            i -> array_to_string(t[i:i+4], ' '))) AS s
             |    FROM toks0)),
             |eval_sh AS (SELECT DISTINCT s FROM sh0 WHERE doc_id % 89 = 0),
             |contam AS (
             |  SELECT DISTINCT doc_id FROM sh0 JOIN eval_sh USING (s)
             |  WHERE doc_id % 89 <> 0),
             |clean AS (
             |  SELECT doc_id, text FROM documents
             |  WHERE doc_id % 89 <> 0
             |    AND doc_id NOT IN (SELECT doc_id FROM contam)),
             |sh AS (SELECT doc_id, s FROM sh0
             |       WHERE doc_id IN (SELECT doc_id FROM clean)),
             |sz AS (SELECT doc_id, count(*) AS n_sh FROM sh GROUP BY doc_id),
             |inter AS (
             |  SELECT a.doc_id AS d1, b.doc_id AS d2, count(*) AS n_inter
             |  FROM sh a JOIN sh b ON a.s = b.s AND a.doc_id < b.doc_id
             |  GROUP BY 1, 2),
             |jpairs AS (
             |  SELECT d1, d2 FROM inter
             |  JOIN sz s1 ON d1 = s1.doc_id
             |  JOIN sz s2 ON d2 = s2.doc_id
             |  WHERE n_inter / (s1.n_sh + s2.n_sh - n_inter) >= 0.6),
             |edges AS (
             |  SELECT d1 AS a, d2 AS b FROM jpairs
             |  UNION SELECT d2, d1 FROM jpairs),
             |nodes AS (SELECT DISTINCT a AS id FROM edges),
             |reach(id, r) AS (
             |  SELECT id, id FROM nodes
             |  UNION
             |  SELECT e.b, reach.r FROM reach JOIN edges e ON e.a = reach.id),
             |lab AS (SELECT id, min(r) AS rep FROM reach GROUP BY id),
             |train AS (
             |  SELECT c.doc_id, c.text FROM clean c
             |  LEFT JOIN lab l ON c.doc_id = l.id
             |  WHERE ((COALESCE(l.rep, c.doc_id) % 2147483647) * 48271)
             |        % 2147483647 % 1000000 < 900000),
             |tc AS (
             |  SELECT doc_id, string_split_regex(text, '\s+') AS t,
             |    len(string_split_regex(text, '\s+')) AS n
             |  FROM train),
             |cum AS (
             |  SELECT doc_id, t, n,
             |    CAST(COALESCE(sum(n) OVER (ORDER BY doc_id
             |      ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS BIGINT) AS cb
             |  FROM tc),
             |plan AS (
             |  SELECT doc_id, t, CAST(n AS BIGINT) AS n,
             |    cb // 1024 AS bin0, cb % 1024 AS off,
             |    ((cb + n - 1) // 1024) - (cb // 1024) + 1 AS spans
             |  FROM cum),
             |mani AS (
             |  SELECT bin0 + k AS bin_id, doc_id, t,
             |    greatest(0, k * 1024 - off) AS tok_from,
             |    least(n, (k + 1) * 1024 - off) AS tok_to
             |  FROM (SELECT doc_id, t, n, bin0, off, unnest(range(0, spans)) AS k FROM plan)),
             |pieces AS (
             |  SELECT bin_id, doc_id, t[(tok_from + 1):(tok_to)] AS piece FROM mani)
             |SELECT bin_id,
             |  CAST(len(flatten(list(piece ORDER BY doc_id))) AS BIGINT) AS n_tokens,
             |  array_to_string(flatten(list(piece ORDER BY doc_id)), ' ') AS payload
             |FROM pieces GROUP BY bin_id ORDER BY bin_id""".stripMargin), bench = true),

    // Materialized packed windows: the end-to-end concat-and-chunk
    // output — every window's payload re-derived token-for-token by
    // the oracle (prefix sums → manifest → slices → ordered reassembly)
    QueryDef("q_pack_windows",
      (s, d) => graft.ext.Packing.packWindows(
        t(s, d, "documents"), floor(col("doc_id") / 100), contextLen = 2048)
        .orderBy("bin_id"),
      Some("""WITH tc AS (
             |  SELECT doc_id, string_split_regex(text, '\s+') AS t,
             |    len(string_split_regex(text, '\s+')) AS n
             |  FROM documents),
             |cum AS (
             |  SELECT doc_id, t, n,
             |    CAST(COALESCE(sum(n) OVER (ORDER BY doc_id
             |      ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS BIGINT) AS cb
             |  FROM tc),
             |plan AS (
             |  SELECT doc_id, t, CAST(n AS BIGINT) AS n,
             |    cb // 2048 AS bin0, cb % 2048 AS off,
             |    ((cb + n - 1) // 2048) - (cb // 2048) + 1 AS spans
             |  FROM cum),
             |mani AS (
             |  SELECT bin0 + k AS bin_id, doc_id, t,
             |    greatest(0, k * 2048 - off) AS tok_from,
             |    least(n, (k + 1) * 2048 - off) AS tok_to
             |  FROM (SELECT doc_id, t, n, bin0, off, unnest(range(0, spans)) AS k FROM plan)),
             |pieces AS (
             |  SELECT bin_id, doc_id, t[(tok_from + 1):(tok_to)] AS piece FROM mani)
             |SELECT bin_id,
             |  CAST(len(flatten(list(piece ORDER BY doc_id))) AS BIGINT) AS n_tokens,
             |  array_to_string(flatten(list(piece ORDER BY doc_id)), ' ') AS payload
             |FROM pieces GROUP BY bin_id ORDER BY bin_id""".stripMargin), bench = true),

    // Packing shard manifest: each (window, document) intersection
    // with the doc-local token range that lands in the window — the
    // shard writer's input. The oracle re-derives the prefix sums and
    // the same per-window range arithmetic.
    QueryDef("q_pack_manifest",
      (s, d) => {
        val docs = t(s, d, "documents").select(col("doc_id"),
          TextAnalysis.tokenCountWs(col("text")).cast("long").as("n_tokens"))
        val plan = graft.ext.Packing.packPlan(docs, col("doc_id"),
          floor(col("doc_id") / 100), col("n_tokens"), contextLen = 2048)
        graft.ext.Packing.binManifest(plan, contextLen = 2048)
          .orderBy("bin_id", "doc_id")
      },
      Some("""WITH tc AS (
             |  SELECT doc_id, len(string_split_regex(text, '\s+')) AS n
             |  FROM documents),
             |cum AS (
             |  SELECT doc_id, n,
             |    CAST(COALESCE(sum(n) OVER (ORDER BY doc_id
             |      ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS BIGINT) AS cb
             |  FROM tc),
             |plan AS (
             |  SELECT doc_id, CAST(n AS BIGINT) AS n,
             |    cb // 2048 AS bin0, cb % 2048 AS off,
             |    ((cb + n - 1) // 2048) - (cb // 2048) + 1 AS spans
             |  FROM cum)
             |SELECT bin0 + k AS bin_id, doc_id,
             |  CAST(greatest(0, k * 2048 - off) AS BIGINT) AS tok_from,
             |  CAST(least(n, (k + 1) * 2048 - off) AS BIGINT) AS tok_to
             |FROM (SELECT doc_id, n, bin0, off, unnest(range(0, spans)) AS k FROM plan)
             |ORDER BY bin_id, doc_id""".stripMargin)),

    // Per-language quality-percentile gating: keep docs at or above
    // their own language's median quality — mixture-aware pruning
    // (a global cutoff over-prunes low-resource strata). Exact
    // percentile cutoffs, broadcast back; quantile_cont is the DuckDB
    // twin of Spark's percentile (interpolation agrees exactly at
    // data points and midpoints of equal neighbours, and strictly
    // interior cutoffs make the >= comparison ulp-insensitive).
    QueryDef("q_curate_cutoff",
      (s, d) => graft.ext.Curation.qualityCutoff(t(s, d, "documents"), 0.5)
        .groupBy("pred_lang")
        .agg(count(lit(1)).as("n_kept"), round(min("quality"), 4).as("min_quality"))
        .orderBy("pred_lang"),
      Some(s"""WITH scored AS (
              |  SELECT doc_id, $langIdSqlExpr AS pred_lang, $qualitySqlExpr AS quality
              |  FROM documents),
              |cuts AS (
              |  SELECT pred_lang, quantile_cont(quality, 0.5) AS cut
              |  FROM scored GROUP BY 1)
              |SELECT s.pred_lang, count(*) AS n_kept,
              |  round(min(s.quality), 4) AS min_quality
              |FROM scored s JOIN cuts c ON s.pred_lang = c.pred_lang
              |WHERE s.quality >= c.cut
              |GROUP BY 1 ORDER BY 1""".stripMargin)),

    // Document fingerprinting (min-hash over 5-token shingles),
    // portable variant: min over the shingles' 31-polynomial rolling
    // hashes mod 1e9+7 — the oracle recomputes every shingle hash, so
    // the sketch itself is value-checked. The xxhash64 form
    // (TextAnalysis.fingerprint) is exactness-covered by
    // FingerprintSpec.
    QueryDef("q_tx_fingerprint",
      (s, d) => t(s, d, "documents").select(
        col("doc_id"),
        TextAnalysis.fingerprintPortable(col("text")).as("fingerprint"))
        .orderBy("doc_id"),
      Some("""WITH toks AS (
             |  SELECT doc_id, string_split_regex(lower(text), '\s+') AS t FROM documents),
             |sh AS (
             |  SELECT doc_id, list_transform(range(1, greatest(len(t) - 3, 1)),
             |                 i -> array_to_string(t[i:i+4], ' ')) AS shingles
             |  FROM toks)
             |SELECT doc_id,
             |  list_min(list_transform(shingles, s ->
             |    list_reduce(list_prepend(0::BIGINT, list_transform(range(1, length(s) + 1),
             |                             i -> unicode(substr(s, i, 1))::BIGINT)),
             |                (h, c) -> (h * 31 + c) % 1000000007))) AS fingerprint
             |FROM sh ORDER BY doc_id""".stripMargin)),

    // BPE merge training ([[graft.ext.Bpe.trainMerges]]): 6 merge
    // rounds over the 128 most frequent alphabetic words, frequency-
    // weighted — the tokenizer-bootstrap stage. The oracle replays
    // the ENTIRE training loop in one recursive CTE: a single row
    // carries the bracketed-token word list; each step finds the
    // argmax pair with pure list lambdas (list_reduce — the same
    // (count desc, pair asc) tie-break) and rewrites via the same
    // self-delimiting "[l][r]" → "[lr]" literal replace Spark
    // executes, so every round's winning pair AND weighted count must
    // agree exactly, merge after merge. The 128-word cap is oracle
    // tractability (the CTE recounts pairs O(vocab²) per round);
    // trainMerges itself takes the full word frame — pair counting is
    // a distributed explode + groupBy, one single-row collect per
    // round.
    QueryDef("q_tx_bpe",
      (s, d) => {
        val words = t(s, d, "documents")
          .select(explode(split(lower(col("text")), "[^a-z]+")).as("w"))
          .filter(length(col("w")) > 0)
          .groupBy("w").agg(count(lit(1)).as("n"))
          .orderBy(desc("n"), col("w")).limit(128)
        graft.ext.Bpe.trainMerges(words, col("w"), col("n"), rounds = 6)
          .orderBy("round")
      },
      Some(bpeCte(k = 128, rounds = 6) +
        """
          |SELECT m.r AS round, m.l AS lhs, m.rt AS rhs, m.c AS n
          |FROM (SELECT unnest(ms) AS m FROM (SELECT ms FROM st ORDER BY iter DESC LIMIT 1))
          |ORDER BY round""".stripMargin),
      bench = true),

    // Incremental-pair-count BPE training
    // ([[graft.ext.Bpe.trainMergesIncremental]]): per round, only
    // words CONTAINING the merged pair are rewritten and re-counted
    // (exact delta patch of the maintained pair frame) instead of
    // re-exploding the whole vocabulary. Same merge table as
    // q_tx_bpe, bit-for-bit — the oracle is the identical recursive
    // replay, so the gate proves the delta maintenance exact.
    QueryDef("q_tx_bpe_incr",
      (s, d) => {
        val words = t(s, d, "documents")
          .select(explode(split(lower(col("text")), "[^a-z]+")).as("w"))
          .filter(length(col("w")) > 0)
          .groupBy("w").agg(count(lit(1)).as("n"))
          .orderBy(desc("n"), col("w")).limit(128)
        graft.ext.Bpe.trainMergesIncremental(words, col("w"), col("n"), rounds = 6)
          .orderBy("round")
      },
      Some(bpeCte(k = 128, rounds = 6) +
        """
          |SELECT m.r AS round, m.l AS lhs, m.rt AS rhs, m.c AS n
          |FROM (SELECT unnest(ms) AS m FROM (SELECT ms FROM st ORDER BY iter DESC LIMIT 1))
          |ORDER BY round""".stripMargin), bench = true),

    // Hybrid deep-vocabulary BPE training
    // ([[graft.ext.Bpe.trainMergesDriver]]): Spark collapses the
    // corpus to the weighted word list, the merge loop runs on the
    // driver with indexed incremental pair counts (the SentencePiece
    // shape — at 30k merges the distributed loop is scheduler-bound,
    // not data-bound). Same table as q_tx_bpe bit-for-bit against the
    // identical recursive-replay oracle.
    QueryDef("q_tx_bpe_driver",
      (s, d) => {
        val words = t(s, d, "documents")
          .select(explode(split(lower(col("text")), "[^a-z]+")).as("w"))
          .filter(length(col("w")) > 0)
          .groupBy("w").agg(count(lit(1)).as("n"))
          .orderBy(desc("n"), col("w")).limit(128)
        graft.ext.Bpe.trainMergesDriver(words, col("w"), col("n"), rounds = 6)
          .orderBy("round")
      },
      Some(bpeCte(k = 128, rounds = 6) +
        """
          |SELECT m.r AS round, m.l AS lhs, m.rt AS rhs, m.c AS n
          |FROM (SELECT unnest(ms) AS m FROM (SELECT ms FROM st ORDER BY iter DESC LIMIT 1))
          |ORDER BY round""".stripMargin), bench = true),

    // BPE apply ([[graft.ext.Bpe.applyMerges]]): the trained merge
    // table unrolled into a replace chain re-tokenizes the same word
    // set; the oracle reads the recursive replay's FINAL word state —
    // training and applying are the same rewrite, so per-word token
    // counts and the token sequences themselves must agree exactly.
    QueryDef("q_tx_bpe_tokenize",
      (s, d) => {
        val words = t(s, d, "documents")
          .select(explode(split(lower(col("text")), "[^a-z]+")).as("w"))
          .filter(length(col("w")) > 0)
          .groupBy("w").agg(count(lit(1)).as("n"))
          .orderBy(desc("n"), col("w")).limit(128)
        val merges = graft.ext.Bpe.trainMerges(words, col("w"), col("n"), rounds = 6)
        graft.ext.Bpe.applyMerges(words, col("w"), merges)
          .select(col("w"), col("n"),
            size(col("tokens")).cast("long").as("n_tokens"),
            array_join(col("tokens"), " ").as("toks"))
          .orderBy("w")
      },
      Some(bpeCte(k = 128, rounds = 6) +
        """
          |SELECT fw.w, fw.n,
          |  len(string_split(substring(fw.s, 2, length(fw.s) - 2), '][')) AS n_tokens,
          |  array_to_string(string_split(substring(fw.s, 2, length(fw.s) - 2), ']['), ' ') AS toks
          |FROM (SELECT unnest(ws) AS fw FROM (SELECT ws FROM st ORDER BY iter DESC LIMIT 1))
          |ORDER BY fw.w""".stripMargin)),
  )

  /** DuckDB replay of [[graft.ext.Bpe.trainMerges]] over the top-`k`
    * corpus words for `rounds` merges: recursive CTE `st` whose final
    * row carries the merge list `ms` AND the end-state word list `ws`
    * (each `{w, s, n}` — original word, bracketed tokens, weight).
    * The argmax-pair expression is interpolated at each use site
    * (computed on the PRIOR round's word state) because a recursive
    * CTE cannot alias a subexpression and DuckDB 1.0 lambdas do not
    * bind across LATERAL; pairs travel as "l|r" strings since
    * list_distinct cannot histogram structs. */
  private def bpeCte(k: Int, rounds: Int): String = {
    def toks(w: String) =
      s"string_split(substring($w.s, 2, length($w.s) - 2), '][')"
    def pairs(w: String) =
      s"list_transform(range(1, len(${toks(w)})), i -> ${toks(w)}[i] || '|' || ${toks(w)}[i+1])"
    val best =
      s"""list_reduce(
         |  list_transform(
         |    list_distinct(flatten(list_transform(ws, w -> ${pairs("w")}))),
         |    p -> {l: string_split(p, '|')[1], rt: string_split(p, '|')[2],
         |          c: list_sum(list_transform(ws, w2 -> w2.n * len(list_filter(${pairs("w2")}, q -> q = p))))}),
         |  (a, b) -> CASE WHEN b.c > a.c OR (b.c = a.c AND (b.l < a.l OR (b.l = a.l AND b.rt < a.rt)))
         |            THEN b ELSE a END)""".stripMargin
    s"""WITH RECURSIVE w0 AS (
       |  SELECT w, count(*)::BIGINT AS n FROM (
       |    SELECT unnest(string_split_regex(lower(text), '[^a-z]+')) AS w FROM documents)
       |  WHERE w <> '' GROUP BY 1 ORDER BY n DESC, w LIMIT $k),
       |init AS (
       |  SELECT list({w: w, s: '[' || array_to_string(string_split(w, ''), '][') || ']', n: n}) AS ws
       |  FROM w0),
       |st AS (
       |  SELECT 0 AS iter, ws,
       |         CAST([] AS STRUCT(r INTEGER, l VARCHAR, rt VARCHAR, c BIGINT)[]) AS ms
       |  FROM init
       |  UNION ALL
       |  SELECT iter + 1,
       |    list_transform(ws, w -> {w: w.w, s: replace(w.s,
       |        '[' || ($best).l || '][' || ($best).rt || ']',
       |        '[' || ($best).l || ($best).rt || ']'), n: w.n}),
       |    list_append(ms, {r: CAST(iter + 1 AS INTEGER), l: ($best).l, rt: ($best).rt, c: ($best).c})
       |  FROM st WHERE iter < $rounds AND ($best).c >= 2
       |)""".stripMargin
  }

  /** DuckDB scalar expression mirroring [[TextAnalysis.langId]]: same
    * marker lists, same strictly-greater fold order, so predictions
    * agree exactly. */
  private[queries] def langIdSqlExpr: String = {
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
    s"CASE WHEN $scoreExpr > 0 THEN $predExpr ELSE 'other' END"
  }

  /** DuckDB scalar expression mirroring [[TextAnalysis.qualityScore]]
    * (unrounded — identical expression tree, identical doubles). */
  private[queries] def qualitySqlExpr: String =
    """(
      |    least(len(regexp_extract_all(lower(text), '\b(the|a|of|and|to|is|in)\b')) * 1.0
      |          / len(string_split_regex(text, '\s+')) * 5.0, 1.0)
      |    + greatest(1.0 - len(regexp_extract_all(text, '[^\w\s]')) * 1.0
      |               / length(text) * 10.0, 0.0)
      |    + CASE WHEN length(text) * 1.0 / len(string_split_regex(text, '\s+'))
      |           BETWEEN 3.0 AND 8.0 THEN 1.0 ELSE 0.5 END
      |  ) / 3.0""".stripMargin

  private def langIdOracle: String =
    s"""SELECT doc_id,
       |  $langIdSqlExpr AS pred_lang,
       |  lang AS labeled_lang
       |FROM documents ORDER BY doc_id""".stripMargin

  /** DuckDB mirror of [[graft.ext.Curation.curate]] stage by stage. */
  private def curateOracle: String =
    s"""$curateKeptCte
       |SELECT pred_lang, count(*) AS n_docs,
       |  CAST(sum(n_tokens) AS BIGINT) AS sum_tokens,
       |  round(avg(quality), 4) AS avg_quality
       |FROM kept GROUP BY 1 ORDER BY 1""".stripMargin

  /** DuckDB mirror of [[graft.ext.Curation.curatedDocs]]. */
  private def curateDocsOracle: String =
    s"""$curateKeptCte
       |SELECT doc_id, pred_lang, n_tokens, round(quality, 4) AS quality
       |FROM kept ORDER BY doc_id""".stripMargin

  /** Shared CTE chain: score → filter → exact dedup → qualifying
    * near-dup pair list (`qpairs(d1, d2)`). Both near-dup policies
    * (pairwise loser drop, transitive collapse) build on it. */
  private def curateScoredCte: String =
    s"""scored AS (
       |  SELECT doc_id, text,
       |    $langIdSqlExpr AS pred_lang,
       |    $qualitySqlExpr AS quality,
       |    len(string_split_regex(text, '\\s+')) AS n_tokens
       |  FROM documents),
       |filtered AS (
       |  SELECT * FROM scored WHERE quality >= 0.5 AND pred_lang <> 'other'),
       |exact_kept AS (
       |  SELECT * FROM filtered
       |  QUALIFY row_number() OVER (PARTITION BY text ORDER BY doc_id) = 1),
       |toks AS (
       |  SELECT doc_id, string_split_regex(lower(text), '\\s+') AS tokens
       |  FROM exact_kept),
       |sh AS (
       |  SELECT DISTINCT doc_id, s FROM (
       |    SELECT doc_id,
       |      unnest(list_transform(range(1, greatest(len(tokens) - 3, 1)),
       |                            i -> array_to_string(tokens[i:i+4], ' '))) AS s
       |    FROM toks)),
       |sz AS (SELECT doc_id, count(*) AS n_sh FROM sh GROUP BY doc_id),
       |qpairs AS (
       |  SELECT d1, d2 FROM (
       |    SELECT a.doc_id AS d1, b.doc_id AS d2, count(*) AS n_inter
       |    FROM sh a JOIN sh b ON a.s = b.s AND a.doc_id < b.doc_id
       |    GROUP BY 1, 2) i
       |  JOIN sz s1 ON d1 = s1.doc_id
       |  JOIN sz s2 ON d2 = s2.doc_id
       |  WHERE n_inter / (s1.n_sh + s2.n_sh - n_inter) >= 0.6)""".stripMargin

  /** Pairwise-loser-drop policy tail over [[curateScoredCte]]. */
  private def curateKeptCte: String =
    s"""WITH $curateScoredCte,
       |kept AS (
       |  SELECT * FROM exact_kept
       |  WHERE doc_id NOT IN (SELECT DISTINCT d2 FROM qpairs))""".stripMargin

  /** Transitive-collapse policy: connected components of the pair
    * graph via a recursive CTE, drop every non-representative. */
  private[queries] def curateTransitiveOracle: String =
    s"""WITH RECURSIVE $curateScoredCte,
       |edges AS (
       |  SELECT d1 AS a, d2 AS b FROM qpairs
       |  UNION SELECT d2, d1 FROM qpairs),
       |nodes AS (SELECT DISTINCT a AS id FROM edges),
       |reach(id, r) AS (
       |  SELECT id, id FROM nodes
       |  UNION
       |  SELECT e.b, reach.r FROM reach JOIN edges e ON e.a = reach.id),
       |lab AS (SELECT id, min(r) AS rep FROM reach GROUP BY id),
       |kept AS (
       |  SELECT * FROM exact_kept
       |  WHERE doc_id NOT IN (SELECT id FROM lab WHERE id <> rep))
       |SELECT pred_lang, count(*) AS n_docs,
       |  CAST(sum(n_tokens) AS BIGINT) AS sum_tokens,
       |  round(avg(quality), 4) AS avg_quality
       |FROM kept GROUP BY 1 ORDER BY 1""".stripMargin
}
