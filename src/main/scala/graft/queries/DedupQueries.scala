package graft.queries

import graft.QueryDef
import graft.ext.Dedup
import graft.sources.Tables
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Deduplication gate queries over the `documents` table — every one
  * carries a full DuckDB oracle. The sketch methods (MinHash-LSH,
  * SimHash) run their `portable = true` variants here: the universal
  * hash family `(A_i·rh + B_i) mod 1e9+7` over 31-polynomial rolling
  * hashes with MINSTD-derived constants re-derives bit-for-bit in
  * plain SQL, so the gate value-checks the full shingle → signature →
  * band/chunk → bucket-join → verify pipeline, not just row counts.
  * The xxhash64 default variants get exact golden tests in DedupSpec
  * (engineered near-duplicate corpora) instead.
  */
object DedupQueries {

  private def t(s: SparkSession, dir: String, n: String): DataFrame =
    Tables(s, dir).table(n)

  /** Shared oracle CTE chain deriving the exact 5-gram Jaccard ≥ 0.6
    * pair list (`jpairs(d1, d2, jaccard)`) — the DuckDB twin of
    * [[Dedup.jaccardPairs]], reused by the pair and cluster gates. */
  private val jaccardPairsCte: String =
    """toks AS (
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
      |  GROUP BY 1, 2),
      |jpairs AS (
      |  SELECT d1, d2,
      |    round(n_inter / (s1.n_sh + s2.n_sh - n_inter), 4) AS jaccard
      |  FROM inter
      |  JOIN sz s1 ON d1 = s1.doc_id
      |  JOIN sz s2 ON d2 = s2.doc_id
      |  WHERE n_inter / (s1.n_sh + s2.n_sh - n_inter) >= 0.6)""".stripMargin

  /** Shared oracle CTE chain re-deriving the portable 32-hash MinHash
    * signatures and their 8×4 band buckets for every document
    * (`sig(doc_id, sig)`, `banded(doc_id, b, bh)`) — the DuckDB twin
    * of [[Dedup.minhashSignatures]] + banding, reused by the pair and
    * incremental gates. */
  private val minhashBandedCte: String =
    """toks AS (
      |  SELECT doc_id, string_split_regex(lower(text), '\s+') AS t FROM documents),
      |sh AS (
      |  SELECT DISTINCT doc_id, s FROM (
      |    SELECT doc_id, unnest(list_transform(range(1, greatest(len(t) - 3, 1)),
      |                          i -> array_to_string(t[i:i+4], ' '))) AS s
      |    FROM toks)),
      |rh AS (
      |  SELECT doc_id, list_reduce(
      |    list_prepend(0::BIGINT, list_transform(range(1, length(s) + 1),
      |                            i -> unicode(substr(s, i, 1))::BIGINT)),
      |    (h, c) -> (h * 31 + c) % 1000000007) AS rh
      |  FROM sh),
      |consts AS (
      |  SELECT i,
      |    (16807 * ((16807 * (2*i + 1)) % 2147483647)) % 2147483647 AS a,
      |    (16807 * ((16807 * (2*i + 2)) % 2147483647)) % 2147483647 AS b
      |  FROM range(0, 32) t(i)),
      |sig AS (
      |  SELECT doc_id, list(h ORDER BY i) AS sig FROM (
      |    SELECT doc_id, i, min((a * rh + b) % 1000000007) AS h
      |    FROM rh CROSS JOIN consts GROUP BY doc_id, i)
      |  GROUP BY doc_id),
      |banded AS (
      |  SELECT doc_id, b,
      |    list_reduce(list_prepend(0::BIGINT, sig[(4*b+1):(4*b+4)]),
      |                (h, v) -> (h * 31 + v) % 1000000007) AS bh
      |  FROM sig, range(0, 8) tb(b))""".stripMargin

  def defs: Seq[QueryDef] = Seq(

    // Exact dedup: one shuffle on md5(text), lowest-id representative
    QueryDef("q_dd_exact",
      (s, d) => Dedup.exact(t(s, d, "documents"), "doc_id", "text")
        .orderBy("keep_id"),
      Some("""SELECT md5(text) AS text_hash, min(doc_id) AS keep_id, count(*) AS n_copies
             |FROM documents GROUP BY text ORDER BY keep_id""".stripMargin), bench = true),

    // Exact dedup over the CANONICAL text form
    // ([[graft.ext.TextAnalysis.normalize]]: NFC + simple lowercase +
    // whitespace collapse) — the normalize-then-hash composition every
    // curation pipeline runs so `Café`/`Cafe´`/`CAFÉ` land in one
    // group. Injected rows prove the Unicode merge: a decomposed and
    // a precomposed spelling of the same phrase (1000001/1000004)
    // must collapse to n_copies=2 under keep_id 1000001. Same
    // one-shuffle plan as q_dd_exact; normalization is a narrow map.
    QueryDef("q_dd_exact_norm",
      (s, d) => {
        import s.implicits._
        val tricky = Seq(
          (1000001L, "Café au LAIT"),   // precomposed é, upper
          (1000004L, "Café au lait"),   // precomposed é, lower
          (1000005L, "  A\tB\n\nC  ")
        ).toDF("doc_id", "text")
        Dedup.exact(
          t(s, d, "documents").select(col("doc_id"), col("text"))
            .unionAll(tricky)
            .withColumn("text", graft.ext.TextAnalysis.normalize(col("text"))),
          "doc_id", "text").orderBy("keep_id")
      },
      Some("""WITH u AS (
             |  SELECT doc_id, text FROM documents
             |  UNION ALL SELECT * FROM (VALUES
             |    (CAST(1000001 AS BIGINT), 'Cafe' || chr(769) || ' au LAIT'),
             |    (CAST(1000004 AS BIGINT), 'Caf' || chr(233) || ' au lait'),
             |    (CAST(1000005 AS BIGINT), '  A' || chr(9) || 'B' || chr(10) || chr(10) || 'C  ')) v(doc_id, text)),
             |n AS (
             |  SELECT doc_id,
             |    trim(regexp_replace(lower(nfc_normalize(text)),
             |      '[ \t\n\x0B\f\r]+', ' ', 'g'), ' ') AS text
             |  FROM u)
             |SELECT md5(text) AS text_hash, min(doc_id) AS keep_id, count(*) AS n_copies
             |FROM n GROUP BY text ORDER BY keep_id""".stripMargin)),

    // Exact dedup keeping the BEST copy (argmax priority, ties to the
    // smaller id) — here a portable MINSTD "source score" stands in
    // for provenance metadata; the oracle replays the same argmax.
    QueryDef("q_dd_exact_best",
      (s, d) => Dedup.exactBest(t(s, d, "documents"), "doc_id", "text",
          priority = pmod(pmod(col("doc_id"), lit(2147483647L)) * 48271L,
            lit(2147483647L)) % 1000)
        .orderBy("keep_id"),
      Some("""WITH p AS (
             |  SELECT doc_id, text,
             |    ((doc_id % 2147483647) * 48271) % 2147483647 % 1000 AS prio
             |  FROM documents),
             |r AS (
             |  SELECT md5(text) AS text_hash, doc_id, prio,
             |    row_number() OVER (PARTITION BY text ORDER BY prio DESC, doc_id) AS rn,
             |    count(*) OVER (PARTITION BY text) AS n_copies
             |  FROM p)
             |SELECT text_hash, doc_id AS keep_id, prio AS keep_priority, n_copies
             |FROM r WHERE rn = 1 ORDER BY keep_id""".stripMargin)),

    // N-gram Jaccard near-dup pairs via inverted shingle index
    QueryDef("q_dd_jaccard",
      (s, d) => Dedup.jaccardPairs(t(s, d, "documents"), "doc_id", "text",
        n = 5, threshold = 0.6).orderBy("d1", "d2"),
      Some(s"""WITH $jaccardPairsCte
              |SELECT d1, d2, jaccard FROM jpairs ORDER BY d1, d2""".stripMargin),
      bench = true),

    // Near-dup CLUSTERS: connected components over the Jaccard pair
    // graph (min-label propagation), the transitive-closure step that
    // pairs alone cannot express — A~B and B~C collapse to one
    // representative even without an A~C pair. The oracle re-derives
    // the components with a recursive CTE (min reachable id).
    // The pair graph is materialized to parquet ONCE and the CC loop
    // consumes the persisted frame — the shared-pair-frame contract
    // (at scale the same persisted pairs feed q_dd_jaccard-style
    // audits AND clustering without re-shingling the corpus); the
    // scratch dir also takes the final labels, so the query leaves
    // zero cached RDDs behind (CacheHygieneSpec pins this).
    QueryDef("q_dd_clusters",
      (s, d) => {
        val scratch = graft.Scratch.tempDir("graft_cc_")
        Dedup.jaccardPairs(t(s, d, "documents"), "doc_id", "text",
          n = 5, threshold = 0.6)
          .write.mode("overwrite").parquet(s"$scratch/pairs")
        val pairs = s.read.parquet(s"$scratch/pairs")
        Dedup.clusters(pairs, scratchDir = Some(scratch))
          .groupBy("rep")
          .agg(count(lit(1)).as("n_members"),
            array_join(transform(sort_array(collect_list(col("id"))),
              _.cast("string")), ",").as("members"))
          .orderBy("rep")
      },
      Some(s"""WITH RECURSIVE $jaccardPairsCte,
              |edges AS (
              |  SELECT d1 AS a, d2 AS b FROM jpairs
              |  UNION SELECT d2, d1 FROM jpairs),
              |nodes AS (SELECT DISTINCT a AS id FROM edges),
              |reach(id, r) AS (
              |  SELECT id, id FROM nodes
              |  UNION
              |  SELECT e.b, reach.r FROM reach JOIN edges e ON e.a = reach.id),
              |lab AS (SELECT id, min(r) AS rep FROM reach GROUP BY id)
              |SELECT rep, CAST(count(*) AS BIGINT) AS n_members,
              |  array_to_string(list(id ORDER BY id), ',') AS members
              |FROM lab GROUP BY rep ORDER BY rep""".stripMargin),
      bench = true),

    // MinHash + LSH banding (shingle → signature → band → bucket
    // join), portable-hash variant: the oracle re-derives the 32
    // min-hashes (universal family over rolling-hash shingles), the
    // 31-poly band fold, the (band, hash) bucket self-join and the
    // signature-agreement verify — a full value check of the LSH
    // pipeline. Constants A_i/B_i are minstd2(2i+1)/minstd2(2i+2),
    // inlined as the same two-step MINSTD formula.
    QueryDef("q_dd_minhash_lsh",
      (s, d) => Dedup.minhashLshPairs(t(s, d, "documents"), "doc_id", "text",
        portable = true).orderBy("d1", "d2"),
      Some(s"""WITH $minhashBandedCte,
              |cand AS (
              |  SELECT DISTINCT x.doc_id AS d1, y.doc_id AS d2
              |  FROM banded x JOIN banded y
              |    ON x.b = y.b AND x.bh = y.bh AND x.doc_id < y.doc_id),
              |est AS (
              |  SELECT d1, d2,
              |    round(len(list_filter(range(1, 33), i -> s1.sig[i] = s2.sig[i]))::DOUBLE / 32,
              |          4) AS est_jaccard
              |  FROM cand JOIN sig s1 ON s1.doc_id = d1 JOIN sig s2 ON s2.doc_id = d2)
              |SELECT d1, d2, est_jaccard FROM est
              |WHERE est_jaccard >= 0.7 ORDER BY d1, d2""".stripMargin),
      bench = true),

    // Exact-dup incremental: the new batch hashed per-row and
    // left-joined against the persisted exact-dedup output — the
    // store side is one narrow (text_hash, keep_id) table, no text.
    QueryDef("q_dd_inc_exact",
      (s, d) => {
        val docs = t(s, d, "documents")
        val scratch = graft.Scratch.tempDir("graft_incx_")
        Dedup.exact(docs.filter(col("doc_id") % 5 =!= 0), "doc_id", "text")
          .write.mode("overwrite").parquet(s"$scratch/hashstore")
        val store = s.read.parquet(s"$scratch/hashstore")
        Dedup.incrementalExact(docs.filter(col("doc_id") % 5 === 0), store,
          "doc_id", "text")
          .orderBy("d_new")
      },
      Some("""WITH store AS (
             |  SELECT md5(text) AS text_hash, min(doc_id) AS d_old
             |  FROM documents WHERE doc_id % 5 <> 0 GROUP BY text)
             |SELECT d.doc_id AS d_new, s.d_old,
             |  CASE WHEN s.d_old IS NULL THEN 'new' ELSE 'dup' END AS status
             |FROM documents d LEFT JOIN store s ON md5(d.text) = s.text_hash
             |WHERE d.doc_id % 5 = 0
             |ORDER BY d_new""".stripMargin)),

    // Incremental (delta) dedup: the new batch (doc_id % 5 = 0)
    // checked against a PERSISTED signature store built from the rest
    // of the corpus — the production 100 TB shape where each arriving
    // batch shingles only itself and the corpus side is a narrow
    // (id, sig) parquet scan (IncrementalDedupSpec pins the plan:
    // exactly one shingle subtree). The oracle re-derives both sides'
    // signatures, the delta↔store band-bucket join, the agreement
    // verify, and the left join that surfaces no-match delta docs as
    // 'new' (the store-append candidates).
    QueryDef("q_dd_incremental",
      (s, d) => {
        val docs = t(s, d, "documents")
        val scratch = graft.Scratch.tempDir("graft_inc_")
        Dedup.minhashSignatures(docs.filter(col("doc_id") % 5 =!= 0),
          "doc_id", "text", shingleLen = 5, numHashes = 32, portable = true)
          .write.mode("overwrite").parquet(s"$scratch/sigstore")
        val store = s.read.parquet(s"$scratch/sigstore")
        Dedup.incremental(docs.filter(col("doc_id") % 5 === 0), store,
          "doc_id", "text", portable = true)
          .orderBy("d_new", "d_old")
      },
      Some(s"""WITH $minhashBandedCte,
              |cand AS (
              |  SELECT DISTINCT x.doc_id AS d_new, y.doc_id AS d_old
              |  FROM banded x JOIN banded y ON x.b = y.b AND x.bh = y.bh
              |  WHERE x.doc_id % 5 = 0 AND y.doc_id % 5 <> 0),
              |est AS (
              |  SELECT d_new, d_old,
              |    round(len(list_filter(range(1, 33), i -> s1.sig[i] = s2.sig[i]))::DOUBLE / 32,
              |          4) AS est_jaccard
              |  FROM cand JOIN sig s1 ON s1.doc_id = d_new JOIN sig s2 ON s2.doc_id = d_old),
              |matched AS (SELECT * FROM est WHERE est_jaccard >= 0.7)
              |SELECT d.doc_id AS d_new, m.d_old, m.est_jaccard,
              |  CASE WHEN m.d_old IS NULL THEN 'new' ELSE 'dup' END AS status
              |FROM documents d LEFT JOIN matched m ON m.d_new = d.doc_id
              |WHERE d.doc_id % 5 = 0
              |ORDER BY d_new, d_old""".stripMargin)),

    // SimHash with pigeonhole-chunk candidate generation, portable
    // variant: bit j of the signature is the majority vote over
    // tokens of parity((A_j·rh(token) + B_j) mod 1e9+7). The oracle
    // rebuilds the per-doc bit vector, the 4×16-bit pigeonhole chunks
    // (the equi-join candidate keys) and the Hamming verify — never
    // materializing a signed 64-bit signature, which is the same
    // value the Spark side's shiftright+mask chunking extracts.
    QueryDef("q_dd_simhash",
      (s, d) => Dedup.simhashPairs(t(s, d, "documents"), "doc_id", "text",
        portable = true)
        .select(col("d1"), col("d2"), col("hamming").cast("long").as("hamming"))
        .orderBy("d1", "d2"),
      Some("""WITH tok AS (
             |  SELECT doc_id, unnest(string_split_regex(lower(text), '\s+')) AS tk
             |  FROM documents),
             |rh AS (
             |  SELECT doc_id, list_reduce(
             |    list_prepend(0::BIGINT, list_transform(range(1, length(tk) + 1),
             |                            i -> unicode(substr(tk, i, 1))::BIGINT)),
             |    (h, c) -> (h * 31 + c) % 1000000007) AS h
             |  FROM tok),
             |consts AS (
             |  SELECT j,
             |    (16807 * ((16807 * (2*j + 1)) % 2147483647)) % 2147483647 AS a,
             |    (16807 * ((16807 * (2*j + 2)) % 2147483647)) % 2147483647 AS b
             |  FROM range(0, 64) t(j)),
             |bits AS (
             |  SELECT doc_id, j,
             |    CASE WHEN sum(CASE WHEN ((a * h + b) % 1000000007) % 2 = 1
             |                       THEN 1 ELSE -1 END) > 0
             |         THEN 1 ELSE 0 END AS bit
             |  FROM rh CROSS JOIN consts GROUP BY doc_id, j),
             |chunks AS (
             |  SELECT doc_id, j // 16 AS ci, sum(bit::BIGINT << (j % 16)) AS cv
             |  FROM bits GROUP BY doc_id, ci),
             |cand AS (
             |  SELECT DISTINCT x.doc_id AS d1, y.doc_id AS d2
             |  FROM chunks x JOIN chunks y
             |    ON x.ci = y.ci AND x.cv = y.cv AND x.doc_id < y.doc_id),
             |ham AS (
             |  SELECT d1, d2,
             |    CAST(sum(CASE WHEN p.bit <> q.bit THEN 1 ELSE 0 END) AS BIGINT) AS hamming
             |  FROM cand JOIN bits p ON p.doc_id = d1
             |            JOIN bits q ON q.doc_id = d2 AND q.j = p.j
             |  GROUP BY d1, d2)
             |SELECT d1, d2, hamming FROM ham WHERE hamming <= 3 ORDER BY d1, d2""".stripMargin)),

    // Leakage-free split: near-dup clusters split atomically by their
    // component representative (90/10 train/eval). Oracle re-derives
    // pairs → components → the MINSTD cut on the representative.
    QueryDef("q_sample_leakfree",
      (s, d) => {
        val scratch = graft.Scratch.tempDir("graft_lfs_")
        graft.ext.Sampling.leakFreeSplit(
          t(s, d, "documents").select("doc_id", "text"),
          "doc_id", "text", Seq("train" -> 0.9, "eval" -> 0.1),
          n = 5, threshold = 0.6, scratchDir = Some(scratch))
          .select("doc_id", "rep", "split")
          .orderBy("doc_id")
      },
      Some(s"""WITH RECURSIVE $jaccardPairsCte,
              |edges AS (
              |  SELECT d1 AS a, d2 AS b FROM jpairs
              |  UNION SELECT d2, d1 FROM jpairs),
              |nodes AS (SELECT DISTINCT a AS id FROM edges),
              |reach(id, r) AS (
              |  SELECT id, id FROM nodes
              |  UNION
              |  SELECT e.b, reach.r FROM reach JOIN edges e ON e.a = reach.id),
              |lab AS (SELECT id, min(r) AS rep FROM reach GROUP BY id)
              |SELECT d.doc_id, COALESCE(l.rep, d.doc_id) AS rep,
              |  CASE WHEN ((COALESCE(l.rep, d.doc_id) % 2147483647) * 48271)
              |            % 2147483647 % 1000000 < 900000
              |       THEN 'train' ELSE 'eval' END AS split
              |FROM documents d LEFT JOIN lab l ON d.doc_id = l.id
              |ORDER BY d.doc_id""".stripMargin)),

    // Directed containment pairs C(A→B) = |A∩B|/|A| ≥ 0.8 — quote /
    // subset detection the symmetric Jaccard passes miss. The oracle
    // is the naive all-pairs form; the prefix-filtered plan must
    // reproduce it exactly.
    QueryDef("q_dd_containment",
      (s, d) => Dedup.containmentPairs(t(s, d, "documents"), "doc_id", "text",
        n = 5, threshold = 0.8).orderBy("d1", "d2"),
      Some("""WITH toks AS (
             |  SELECT doc_id, string_split_regex(lower(text), '\s+') AS t
             |  FROM documents),
             |sh AS (
             |  SELECT DISTINCT doc_id, s FROM (
             |    SELECT doc_id,
             |      unnest(list_transform(range(1, greatest(len(t) - 3, 1)),
             |                            i -> array_to_string(t[i:i+4], ' '))) AS s
             |    FROM toks)),
             |sz AS (SELECT doc_id, count(*) AS n_sh FROM sh GROUP BY doc_id),
             |inter AS (
             |  SELECT a.doc_id AS d1, b.doc_id AS d2, count(*) AS n_inter
             |  FROM sh a JOIN sh b ON a.s = b.s AND a.doc_id <> b.doc_id
             |  GROUP BY 1, 2)
             |SELECT d1, d2, round(n_inter / s1.n_sh, 4) AS containment
             |FROM inter JOIN sz s1 ON d1 = s1.doc_id
             |WHERE n_inter / s1.n_sh >= 0.8
             |ORDER BY d1, d2""".stripMargin), bench = true),

    // Per-benchmark contamination attribution: WHICH eval benchmark
    // (eval docs bucketed into 3 by doc_id % 3) leaked into which
    // corpus doc. Oracle re-derives the (benchmark, shingle) sets
    // and every per-(doc, benchmark) hit count.
    QueryDef("q_dd_decontam_by",
      (s, d) => {
        val docs = t(s, d, "documents")
        val evalSet = docs.filter(col("doc_id") % 89 === 0)
          .withColumn("bench_id", col("doc_id") % 3)
        Dedup.decontaminateBy(docs.filter(col("doc_id") % 89 =!= 0), evalSet,
          "doc_id", "text", "bench_id", n = 5)
          .orderBy("doc_id", "bench_id")
      },
      Some("""WITH toks AS (
             |  SELECT doc_id, string_split_regex(lower(text), '\s+') AS t
             |  FROM documents),
             |sh AS (
             |  SELECT DISTINCT doc_id, s FROM (
             |    SELECT doc_id,
             |      unnest(list_transform(range(1, greatest(len(t) - 3, 1)),
             |                            i -> array_to_string(t[i:i+4], ' '))) AS s
             |    FROM toks)),
             |eval_sh AS (
             |  SELECT DISTINCT doc_id % 3 AS bench_id, s FROM sh
             |  WHERE doc_id % 89 = 0)
             |SELECT c.doc_id, e.bench_id, count(*) AS hit_shingles
             |FROM sh c JOIN eval_sh e USING (s)
             |WHERE c.doc_id % 89 <> 0
             |GROUP BY 1, 2 ORDER BY 1, 2""".stripMargin)),

    // Per-doc 5-gram novelty: fraction of a doc's distinct shingles
    // appearing in no other doc. Exact integer counts both sides.
    QueryDef("q_dd_novelty",
      (s, d) => Dedup.shingleNovelty(t(s, d, "documents"), "doc_id", "text", n = 5)
        .orderBy("doc_id"),
      Some("""WITH toks AS (
             |  SELECT doc_id, string_split_regex(lower(text), '\s+') AS t
             |  FROM documents),
             |sh AS (
             |  SELECT DISTINCT doc_id, s FROM (
             |    SELECT doc_id,
             |      unnest(list_transform(range(1, greatest(len(t) - 3, 1)),
             |                            i -> array_to_string(t[i:i+4], ' '))) AS s
             |    FROM toks)),
             |dfreq AS (SELECT s, count(*) AS df_sh FROM sh GROUP BY s),
             |per_doc AS (
             |  SELECT doc_id, count(*) AS n_shingles,
             |    CAST(sum(CASE WHEN df_sh = 1 THEN 1 ELSE 0 END) AS BIGINT) AS n_unique
             |  FROM sh JOIN dfreq USING (s) GROUP BY doc_id)
             |SELECT d.doc_id, p.n_shingles, p.n_unique,
             |  round(CAST(p.n_unique AS DOUBLE) / p.n_shingles, 6) AS novelty
             |FROM documents d LEFT JOIN per_doc p USING (doc_id)
             |ORDER BY d.doc_id""".stripMargin), bench = true),

    // Boilerplate shingles: 5-grams shared by ≥ 3 documents, with
    // their distinct-document counts — the template detector.
    QueryDef("q_dd_boilerplate",
      (s, d) => Dedup.boilerplateShingles(t(s, d, "documents"), "doc_id", "text",
          n = 5, minDocs = 3)
        .orderBy("sh"),
      Some("""WITH toks AS (
             |  SELECT doc_id, string_split_regex(lower(text), '\s+') AS t
             |  FROM documents),
             |sh AS (
             |  SELECT DISTINCT doc_id, s FROM (
             |    SELECT doc_id,
             |      unnest(list_transform(range(1, greatest(len(t) - 3, 1)),
             |                            i -> array_to_string(t[i:i+4], ' '))) AS s
             |    FROM toks))
             |SELECT s AS sh, count(*) AS n_docs FROM sh
             |GROUP BY s HAVING count(*) >= 3 ORDER BY sh""".stripMargin)),

    // Benchmark decontamination: corpus docs sharing any word-5-gram
    // with the held-out "eval" slice (doc_id % 89 == 0). The oracle
    // re-derives both shingle sets and the distinct-hit counts.
    // Curation funnel report: per source, docs in -> surviving exact
    // dedup -> also passing the shingle decontam screen — the
    // dashboard row every pipeline run ships. Pure composition of
    // already-gated stages; the oracle chains their SQL twins, so a
    // drift in ANY stage breaks the funnel hash.
    QueryDef("q_dd_funnel",
      (s, d) => {
        val docs = t(s, d, "documents")
        val evalSet = docs.filter(col("doc_id") % 89 === 0)
        val corpus = docs.filter(col("doc_id") % 89 =!= 0)
        val kept = corpus.join(
          Dedup.exact(corpus, "doc_id", "text")
            .select(col("keep_id").as("doc_id")), "doc_id")
        val clean = Dedup.decontaminate(kept, evalSet, "doc_id", "text", n = 5)
          .filter(!col("contaminated")).select("doc_id")
        corpus.groupBy("source").agg(count(lit(1)).as("n_in"))
          .join(kept.groupBy("source").agg(count(lit(1)).as("n_unique")), "source")
          .join(kept.join(clean, "doc_id").groupBy("source")
            .agg(count(lit(1)).as("n_clean")), "source")
          .orderBy("source")
      },
      Some("""WITH corpus AS (SELECT * FROM documents WHERE doc_id % 89 <> 0),
             |keep AS (SELECT min(doc_id) AS doc_id FROM corpus GROUP BY text),
             |kept AS (SELECT c.* FROM corpus c JOIN keep USING (doc_id)),
             |scope AS (SELECT doc_id, text FROM kept
             |          UNION ALL
             |          SELECT doc_id, text FROM documents WHERE doc_id % 89 = 0),
             |toks AS (SELECT doc_id, string_split_regex(lower(text), '\s+') AS t
             |         FROM scope),
             |sh AS (SELECT DISTINCT doc_id, s FROM (
             |        SELECT doc_id,
             |          unnest(list_transform(range(1, greatest(len(t) - 3, 1)),
             |                                i -> array_to_string(t[i:i+4], ' '))) AS s
             |        FROM toks)),
             |eval_sh AS (SELECT DISTINCT s FROM sh WHERE doc_id % 89 = 0),
             |hits AS (SELECT doc_id, count(*) AS hit_shingles
             |         FROM sh JOIN eval_sh USING (s)
             |         WHERE doc_id % 89 <> 0 GROUP BY 1),
             |clean AS (SELECT k.doc_id FROM kept k LEFT JOIN hits h USING (doc_id)
             |          WHERE COALESCE(h.hit_shingles, 0) = 0)
             |SELECT i.source, i.n_in, u.n_unique, cl.n_clean
             |FROM (SELECT source, count(*) AS n_in FROM corpus GROUP BY 1) i
             |JOIN (SELECT source, count(*) AS n_unique FROM kept GROUP BY 1) u
             |  USING (source)
             |JOIN (SELECT k.source, count(*) AS n_clean
             |      FROM kept k JOIN clean USING (doc_id) GROUP BY 1) cl
             |  USING (source)
             |ORDER BY source""".stripMargin)),

    QueryDef("q_dd_decontam",
      (s, d) => {
        val docs = t(s, d, "documents")
        val evalSet = docs.filter(col("doc_id") % 89 === 0)
        val corpus = docs.filter(col("doc_id") % 89 =!= 0)
        Dedup.decontaminate(corpus, evalSet, "doc_id", "text", n = 5)
          .orderBy("doc_id")
      },
      Some("""WITH toks AS (
             |  SELECT doc_id, string_split_regex(lower(text), '\s+') AS t
             |  FROM documents),
             |sh AS (
             |  SELECT DISTINCT doc_id, s FROM (
             |    SELECT doc_id,
             |      unnest(list_transform(range(1, greatest(len(t) - 3, 1)),
             |                            i -> array_to_string(t[i:i+4], ' '))) AS s
             |    FROM toks)),
             |eval_sh AS (SELECT DISTINCT s FROM sh WHERE doc_id % 89 = 0),
             |hits AS (
             |  SELECT doc_id, count(*) AS hit_shingles
             |  FROM sh JOIN eval_sh USING (s)
             |  WHERE doc_id % 89 <> 0 GROUP BY doc_id)
             |SELECT d.doc_id,
             |  COALESCE(h.hit_shingles, 0) AS hit_shingles,
             |  COALESCE(h.hit_shingles, 0) > 0 AS contaminated
             |FROM documents d LEFT JOIN hits h USING (doc_id)
             |WHERE d.doc_id % 89 <> 0 ORDER BY doc_id""".stripMargin), bench = true),

    // C4-style span-level boilerplate removal: 10-token blocks present
    // in >= 2 distinct docs are cut, documents reassembled in order
    // (empty string when nothing survives).
    QueryDef("q_dd_spans",
      (s, d) => Dedup.stripBoilerplateSpans(t(s, d, "documents"), "doc_id", "text",
        spanWords = 10, minDocs = 2).orderBy("doc_id"),
      Some("""WITH tokd AS (SELECT doc_id, string_split(text, ' ') AS toks FROM documents),
             |spans AS (
             |  SELECT doc_id, r.i AS span_id,
             |         array_to_string(toks[(r.i*10+1):(r.i*10+10)], ' ') AS span
             |  FROM tokd, LATERAL (SELECT unnest(range(0,
             |    CAST(ceil(len(toks)/10.0) AS BIGINT)))) AS r(i)),
             |boiler AS (
             |  SELECT span FROM spans GROUP BY span
             |  HAVING count(DISTINCT doc_id) >= 2),
             |kept AS (
             |  SELECT s.doc_id, string_agg(s.span, ' ' ORDER BY s.span_id) AS cleaned
             |  FROM spans s ANTI JOIN boiler b USING (span)
             |  GROUP BY s.doc_id)
             |SELECT d.doc_id, COALESCE(k.cleaned, '') AS cleaned
             |FROM documents d LEFT JOIN kept k USING (doc_id)
             |ORDER BY doc_id""".stripMargin), bench = true),

    // Edit-distance join (Ed-Join q-gram prefix filter + levenshtein
    // verify) over customer names: typo-tolerant entity matching,
    // the string-key complement of the shingle measures. The oracle
    // is the naive all-pairs levenshtein join (gate-scale only);
    // 19.5k true pairs at tau=1 among 1.5k names.
    QueryDef("q_dd_editdist",
      (s, d) => Dedup.editDistancePairs(t(s, d, "customer"), "c_custkey", "c_name",
        tau = 1).orderBy("d1", "d2"),
      Some("""SELECT a.c_custkey AS d1, b.c_custkey AS d2,
             |  CAST(levenshtein(a.c_name, b.c_name) AS INT) AS dist
             |FROM customer a JOIN customer b
             |  ON a.c_custkey < b.c_custkey
             | AND levenshtein(a.c_name, b.c_name) <= 1
             |ORDER BY 1, 2""".stripMargin)),

    // Chunk-level duplication profile over CONTENT-DEFINED chunks
    // ([[graft.ext.Dedup.cdcDupProfile]]): per document, how many of
    // its CDC chunks recur in another document — the storage-dedup
    // redundancy view, edit-robust because boundaries re-synchronize.
    // No pair join anywhere: one shuffle on the chunk md5, one on the
    // doc. The oracle rebuilds boundaries per-position from scratch
    // and replays the distinct-doc-count join.
    QueryDef("q_dd_cdc",
      (s, d) => graft.ext.Dedup.cdcDupProfile(t(s, d, "documents"),
          "doc_id", "text").orderBy("doc_id"),
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
             |    lag(pos, 1, 0) OVER (PARTITION BY doc_id ORDER BY pos) AS prev
             |  FROM b),
             |chk AS (
             |  SELECT c.doc_id, md5(substr(d.text, c.prev + 1, c.pos - c.prev)) AS m
             |  FROM ch c JOIN documents d USING (doc_id)),
             |dpc AS (SELECT m, count(DISTINCT doc_id) AS nd FROM chk GROUP BY 1)
             |SELECT chk.doc_id, count(*) AS n_chunks,
             |  CAST(sum(CASE WHEN nd > 1 THEN 1 ELSE 0 END) AS BIGINT) AS n_dup_chunks,
             |  round(sum(CASE WHEN nd > 1 THEN 1 ELSE 0 END) * 1.0 / count(*), 6)
             |    AS dup_ratio
             |FROM chk JOIN dpc USING (m)
             |GROUP BY 1 ORDER BY 1""".stripMargin)),

    // Winnowing-fingerprint near-dup candidates
    // ([[graft.ext.Dedup.winnowPairs]]): pairs sharing ≥ 10 distinct
    // winnowed fingerprints after the df ≤ 20 boilerplate cap — the
    // MOSS candidate generator at ~2/(w+1) the shingle-join cost,
    // with the winnowing guarantee that any shared ≥ 15-char run
    // surfaces. The oracle replays fingerprinting (see q_tx_winnow),
    // the df cap, and the pair counting exactly.
    QueryDef("q_dd_winnow",
      (s, d) => graft.ext.Dedup.winnowPairs(t(s, d, "documents"),
          "doc_id", "text", k = 8, w = 8, maxDf = 20, minShared = 10)
        .orderBy("d1", "d2"),
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
             |fpd AS (SELECT DISTINCT doc_id, list_min(win) AS h FROM wins),
             |rare AS (SELECT h FROM fpd GROUP BY h HAVING count(*) <= 20),
             |fr AS (SELECT fpd.* FROM fpd JOIN rare USING (h))
             |SELECT a.doc_id AS d1, b.doc_id AS d2, count(*) AS shared
             |FROM fr a JOIN fr b ON a.h = b.h AND a.doc_id < b.doc_id
             |GROUP BY 1, 2 HAVING count(*) >= 10
             |ORDER BY d1, d2""".stripMargin), bench = true),

    // Exact duplicate-substring REMOVAL (Lee et al. 2022 cleanup over
    // CDC chunks, [[graft.ext.Dedup.stripDuplicateChunks]]): every
    // chunk occurring >1 time corpus-wide survives only at its
    // globally-first (doc_id, chunk_id) occurrence; the rewrite
    // re-cuts surviving chunks from the original text. The decision
    // shuffle carries only 16-byte md5 keys. The oracle replays the
    // boundary derivation per position, ranks occurrences with
    // row_number over (md5 → doc, chunk), and rebuilds each document
    // with an ordered string_agg — the full rewritten text is part
    // of the hash, so chunk order, keep choice, and substring cuts
    // are all value-checked.
    QueryDef("q_dd_strip",
      (s, d) => graft.ext.Dedup.stripDuplicateChunks(t(s, d, "documents"),
          "doc_id", "text").orderBy("doc_id"),
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
             |  FROM b WINDOW w AS (PARTITION BY doc_id ORDER BY pos)),
             |chk AS (
             |  SELECT c.doc_id, c.chunk_id, c.prev + 1 AS c_start,
             |    c.pos - c.prev AS c_len,
             |    md5(substr(d.text, c.prev + 1, c.pos - c.prev)) AS m
             |  FROM ch c JOIN documents d USING (doc_id)),
             |dec AS (
             |  SELECT chk.*,
             |    row_number() OVER (PARTITION BY m ORDER BY doc_id, chunk_id) = 1
             |      AS keep
             |  FROM chk),
             |agg AS (
             |  SELECT doc_id, CAST(count(*) AS BIGINT) AS n_chunks,
             |    CAST(sum(CASE WHEN keep THEN 0 ELSE 1 END) AS BIGINT)
             |      AS n_dropped,
             |    coalesce(string_agg(CASE WHEN keep
             |        THEN substr(d.text, c_start, c_len) END, ''
             |      ORDER BY chunk_id), '') AS cleaned
             |  FROM dec JOIN documents d USING (doc_id)
             |  GROUP BY doc_id)
             |SELECT d.doc_id, CAST(coalesce(a.n_chunks, 0) AS BIGINT) AS n_chunks,
             |  CAST(coalesce(a.n_dropped, 0) AS BIGINT) AS n_dropped,
             |  coalesce(a.cleaned, '') AS cleaned
             |FROM documents d LEFT JOIN agg a USING (doc_id)
             |ORDER BY doc_id""".stripMargin)),
  )
}
