package graft.queries

import graft.QueryDef
import graft.ext.{Multimodal, Similarity}
import graft.sources.Tables
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Similarity-search gate queries over the `embeddings` table, plus
  * the multimodal metadata query. Cosine is computed as a sequential
  * double fold in index order on both engines, so values agree to
  * ~1e-14 and survive rounding.
  */
object SimilarityQueries {

  private def t(s: SparkSession, dir: String, n: String): DataFrame =
    Tables(s, dir).table(n)

  /** Index-order double-fold cosine between two float-list columns —
    * the DuckDB twin of [[graft.functions.CosineSimilarity]]. */
  private def cosSql(a: String, b: String): String =
    s"list_dot_product(CAST($a AS DOUBLE[]), CAST($b AS DOUBLE[]))" +
      s" / (sqrt(list_dot_product(CAST($a AS DOUBLE[]), CAST($a AS DOUBLE[])))" +
      s" * sqrt(list_dot_product(CAST($b AS DOUBLE[]), CAST($b AS DOUBLE[]))))"

  /** One unrolled Lloyd iteration `i` of the portable IVF oracle:
    * nearest-centroid assignment against cents{i-1} (max-struct
    * tie-break = cosine DESC then cid DESC), then exact
    * integer-quantized member means -> cents{i} float centroids. */
  private def lloydStepSql(i: Int): String = {
    val prev = s"cents${i - 1}"
    s"""a$i AS (
       |  SELECT vec_id, cid,
       |    row_number() OVER (PARTITION BY vec_id ORDER BY sim DESC, cid DESC) AS rk
       |  FROM (SELECT c.vec_id, k.cid, ${cosSql("c.embedding", "k.c_emb")} AS sim
       |        FROM corpus c CROSS JOIN $prev k)),
       |asg$i AS (SELECT vec_id, cid AS cluster FROM a$i WHERE rk = 1),
       |m$i AS (
       |  SELECT cluster AS cid, k AS pos,
       |    CAST(sum(CAST(floor(CAST(embedding[k+1] AS DOUBLE) * 1048576.0 + 0.5) AS BIGINT)) AS DOUBLE)
       |      / (count(*) * 1048576.0) AS mv
       |  FROM corpus JOIN asg$i USING (vec_id), range(0, 64) t(k)
       |  GROUP BY cluster, k),
       |cents$i AS (
       |  SELECT cid, list(CAST(mv AS FLOAT) ORDER BY pos) AS c_emb
       |  FROM m$i GROUP BY cid)""".stripMargin
  }

  /** Shared IVF index-build oracle chain over a parameterized corpus
    * subset: MINSTD-ordered 16-vector seed, two Lloyd steps, final
    * assignment (`asgfin(vec_id, cluster)`, centroids in `cents2`). */
  private def ivfIndexCte(corpusWhere: String): String =
    s"""corpus AS (SELECT vec_id, embedding FROM embeddings WHERE $corpusWhere),
       |cents0 AS (
       |  SELECT vec_id AS cid, embedding AS c_emb,
       |    row_number() OVER (ORDER BY ((vec_id % 2147483647) * 48271) % 2147483647, vec_id) AS rn
       |  FROM corpus QUALIFY rn <= 16),
       |${lloydStepSql(1)},
       |${lloydStepSql(2)},
       |afin AS (
       |  SELECT vec_id, cid,
       |    row_number() OVER (PARTITION BY vec_id ORDER BY sim DESC, cid DESC) AS rk
       |  FROM (SELECT c.vec_id, k.cid, ${cosSql("c.embedding", "k.c_emb")} AS sim
       |        FROM corpus c CROSS JOIN cents2 k)),
       |asgfin AS (SELECT vec_id, cid AS cluster FROM afin WHERE rk = 1)""".stripMargin

  /** Full portable IVF oracle: the shared index build, query probe of
    * the top-2 cells, cosine top-10 over the probed subset. */
  private val ivfOracleSql: String =
    s"""WITH ${ivfIndexCte("vec_id <> 0")},
       |qv AS (SELECT embedding AS q_emb FROM embeddings WHERE vec_id = 0),
       |probes AS (
       |  SELECT cid FROM (
       |    SELECT k.cid, ${cosSql("q.q_emb", "k.c_emb")} AS sim
       |    FROM qv q CROSS JOIN cents2 k)
       |  ORDER BY sim DESC, cid LIMIT 2),
       |scored AS (
       |  SELECT c.vec_id, ${cosSql("c.embedding", "q.q_emb")} AS cos_raw
       |  FROM corpus c JOIN asgfin USING (vec_id) CROSS JOIN qv q
       |  WHERE asgfin.cluster IN (SELECT cid FROM probes))
       |SELECT vec_id, round(cos_raw, 6) AS cosine
       |FROM scored ORDER BY cos_raw DESC, vec_id LIMIT 10""".stripMargin

  /** Batch IVF oracle: same index build over the batch corpus cut,
    * then per-query probe top-2 + cosine top-3 windows. */
  private val ivfBatchOracleSql: String =
    s"""WITH ${ivfIndexCte("vec_id >= 10")},
       |qs AS (SELECT vec_id AS q_id, embedding AS q_emb FROM embeddings WHERE vec_id < 10),
       |qprobes AS (
       |  SELECT q_id, cid FROM (
       |    SELECT q_id, cid,
       |      row_number() OVER (PARTITION BY q_id ORDER BY sim DESC, cid) AS rk
       |    FROM (SELECT q.q_id, k.cid, ${cosSql("q.q_emb", "k.c_emb")} AS sim
       |          FROM qs q CROSS JOIN cents2 k))
       |  WHERE rk <= 2),
       |scored AS (
       |  SELECT p.q_id, c.vec_id, ${cosSql("c.embedding", "q.q_emb")} AS cos_raw
       |  FROM corpus c
       |  JOIN asgfin USING (vec_id)
       |  JOIN qprobes p ON asgfin.cluster = p.cid
       |  JOIN qs q ON q.q_id = p.q_id),
       |ranked AS (
       |  SELECT q_id, vec_id, cos_raw,
       |    row_number() OVER (PARTITION BY q_id ORDER BY cos_raw DESC, vec_id) AS rn
       |  FROM scored)
       |SELECT q_id, vec_id, round(cos_raw, 6) AS cosine
       |FROM ranked WHERE rn <= 3 ORDER BY q_id, vec_id""".stripMargin

  /** Squared-L2 between two DOUBLE[] lists in index order — the
    * DuckDB twin of [[graft.functions.NearestCentroidL2]]'s metric
    * and the PQ distance-table fold (left fold over nonnegative
    * terms ≡ Spark's 0.0-seeded `aggregate`). */
  private def l2Sql(a: String, b: String, sub: Int): String =
    s"list_reduce(list_transform(range(1, ${sub + 1}), " +
      s"i -> ($a[i] - $b[i]) * ($a[i] - $b[i])), (x, y) -> x + y)"

  /** Shared portable PQ index chain (through `enc(vec_id, s, cid)` +
    * codebook `c1`): MINSTD 16-seed per subspace, one integer-grid
    * Lloyd round, per-subspace encode. Mirrors
    * Similarity.pqCodebook/pqEncode (dim 64, m = 4 subspaces of 16,
    * kPerSub = 16, lloydIters = 1) over a parameterized corpus cut. */
  private def pqIndexCte(corpusWhere: String): String =
    s"corpus AS (SELECT vec_id, embedding FROM embeddings WHERE $corpusWhere),\n" +
      pqIndexBody

  /** The PQ index body alone (expects a `corpus` CTE in scope; all
    * names pq-prefixed so it composes with the IVF chain in the
    * IVF-PQ oracle). */
  private val pqIndexBody: String =
    s"""pqseeds AS (
       |  SELECT vec_id AS cid, embedding,
       |    row_number() OVER (ORDER BY ((vec_id % 2147483647) * 48271) % 2147483647, vec_id) AS rn
       |  FROM corpus QUALIFY rn <= 16),
       |pqsvl AS (
       |  SELECT vec_id, s, CAST(embedding[(s*16+1):(s*16+16)] AS DOUBLE[]) AS sv
       |  FROM corpus, range(0, 4) ts(s)),
       |pqc0 AS (
       |  SELECT s, cid, CAST(embedding[(s*16+1):(s*16+16)] AS DOUBLE[]) AS cv
       |  FROM pqseeds, range(0, 4) ts(s)),
       |pqa1 AS (
       |  SELECT vec_id, s, cid,
       |    row_number() OVER (PARTITION BY vec_id, s ORDER BY d, cid) AS rk
       |  FROM (SELECT v.vec_id, v.s, c.cid, ${l2Sql("v.sv", "c.cv", 16)} AS d
       |        FROM pqsvl v JOIN pqc0 c ON v.s = c.s)),
       |pqm1 AS (
       |  SELECT a.s, a.cid, k,
       |    CAST(sum(CAST(floor(v.sv[k+1] * 1048576.0 + 0.5) AS BIGINT)) AS DOUBLE)
       |      / (count(*) * 1048576.0) AS mv
       |  FROM pqa1 a JOIN pqsvl v ON v.vec_id = a.vec_id AND v.s = a.s, range(0, 16) t(k)
       |  WHERE a.rk = 1
       |  GROUP BY a.s, a.cid, k),
       |pqc1 AS (
       |  SELECT s, cid, list(CAST(CAST(mv AS FLOAT) AS DOUBLE) ORDER BY k) AS cv
       |  FROM pqm1 GROUP BY s, cid),
       |pqaf AS (
       |  SELECT vec_id, s, cid,
       |    row_number() OVER (PARTITION BY vec_id, s ORDER BY d, cid) AS rk
       |  FROM (SELECT v.vec_id, v.s, c.cid, ${l2Sql("v.sv", "c.cv", 16)} AS d
       |        FROM pqsvl v JOIN pqc1 c ON v.s = c.s)),
       |pqenc AS (SELECT vec_id, s, cid FROM pqaf WHERE rk = 1)""".stripMargin

  /** Single-query ADC tail (query = vec_id 0) through
    * `scored(vec_id, adq)`. */
  private val pqScoredCte: String =
    s"""qsv AS (
       |  SELECT s, CAST(embedding[(s*16+1):(s*16+16)] AS DOUBLE[]) AS qv
       |  FROM embeddings, range(0, 4) ts(s) WHERE vec_id = 0),
       |dt AS (
       |  SELECT c.s, c.cid,
       |    CAST(floor(${l2Sql("q.qv", "c.cv", 16)} * 1048576.0 + 0.5) AS BIGINT) AS dq
       |  FROM pqc1 c JOIN qsv q ON c.s = q.s),
       |scored AS (
       |  SELECT e.vec_id, CAST(sum(d.dq) AS BIGINT) AS adq
       |  FROM pqenc e JOIN dt d ON d.s = e.s AND d.cid = e.cid
       |  GROUP BY e.vec_id)""".stripMargin

  private val pqChainCte: String =
    s"${pqIndexCte("vec_id <> 0")},\n$pqScoredCte"

  private val pqOracleSql: String =
    s"""WITH $pqChainCte
       |SELECT vec_id, round(CAST(adq AS DOUBLE) / 1048576.0, 6) AS adist
       |FROM scored ORDER BY adq, vec_id LIMIT 10""".stripMargin

  /** IVF-PQ oracle: the IVF chain (2 Lloyd rounds, final assignment)
    * prunes to the query's top-2 cells; the PQ body ranks only those
    * candidates by exact integer ADC — mirrors Similarity.pqIvfTopK. */
  private val pqIvfOracleSql: String =
    s"""WITH ${ivfIndexCte("vec_id <> 0")},
       |$pqIndexBody,
       |qv AS (SELECT embedding AS q_emb FROM embeddings WHERE vec_id = 0),
       |probes AS (
       |  SELECT cid FROM (
       |    SELECT k.cid, ${cosSql("q.q_emb", "k.c_emb")} AS sim
       |    FROM qv q CROSS JOIN cents2 k)
       |  ORDER BY sim DESC, cid LIMIT 2),
       |qsv AS (
       |  SELECT s, CAST(embedding[(s*16+1):(s*16+16)] AS DOUBLE[]) AS qv2
       |  FROM embeddings, range(0, 4) ts(s) WHERE vec_id = 0),
       |dt AS (
       |  SELECT c.s, c.cid,
       |    CAST(floor(${l2Sql("q.qv2", "c.cv", 16)} * 1048576.0 + 0.5) AS BIGINT) AS dq
       |  FROM pqc1 c JOIN qsv q ON c.s = q.s),
       |cand AS (
       |  SELECT e.vec_id, e.s, e.cid FROM pqenc e
       |  JOIN asgfin g ON g.vec_id = e.vec_id
       |  WHERE g.cluster IN (SELECT cid FROM probes)),
       |scored AS (
       |  SELECT c.vec_id, CAST(sum(d.dq) AS BIGINT) AS adq
       |  FROM cand c JOIN dt d ON d.s = c.s AND d.cid = c.cid
       |  GROUP BY c.vec_id)
       |SELECT vec_id, round(CAST(adq AS DOUBLE) / 1048576.0, 6) AS adist
       |FROM scored ORDER BY adq, vec_id LIMIT 10""".stripMargin

  /** Batch PQ oracle: index over the batch corpus cut, per-query
    * distance tables, exact integer ADC sums, per-query top-3 —
    * mirrors Similarity.pqTopKBatch. */
  private val pqBatchOracleSql: String =
    s"""WITH ${pqIndexCte("vec_id >= 10")},
       |qsvb AS (
       |  SELECT vec_id AS q_id, s,
       |    CAST(embedding[(s*16+1):(s*16+16)] AS DOUBLE[]) AS qv
       |  FROM embeddings, range(0, 4) ts(s) WHERE vec_id < 10),
       |dtb AS (
       |  SELECT q.q_id, c.s, c.cid,
       |    CAST(floor(${l2Sql("q.qv", "c.cv", 16)} * 1048576.0 + 0.5) AS BIGINT) AS dq
       |  FROM pqc1 c JOIN qsvb q ON c.s = q.s),
       |scoredb AS (
       |  SELECT d.q_id, e.vec_id, CAST(sum(d.dq) AS BIGINT) AS adq
       |  FROM pqenc e JOIN dtb d ON d.s = e.s AND d.cid = e.cid
       |  GROUP BY d.q_id, e.vec_id),
       |ranked AS (
       |  SELECT q_id, vec_id, adq,
       |    row_number() OVER (PARTITION BY q_id ORDER BY adq, vec_id) AS rn
       |  FROM scoredb)
       |SELECT q_id, vec_id, round(CAST(adq AS DOUBLE) / 1048576.0, 6) AS adist
       |FROM ranked WHERE rn <= 3 ORDER BY q_id, vec_id""".stripMargin

  /** PQ + exact re-rank oracle: ADC top-50 shortlist from the shared
    * chain, then exact full-vector squared L2 (index-order fold) for
    * the final top-10 — mirrors Similarity.pqTopKRerank. */
  private val pqRerankOracleSql: String =
    s"""WITH $pqChainCte,
       |short AS (SELECT vec_id FROM scored ORDER BY adq, vec_id LIMIT 50),
       |qfull AS (SELECT CAST(embedding AS DOUBLE[]) AS qe FROM embeddings WHERE vec_id = 0),
       |rer AS (
       |  SELECT c.vec_id,
       |    ${l2Sql("c.ce", "q.qe", 64)} AS d2
       |  FROM (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS ce
       |        FROM corpus JOIN short USING (vec_id)) c
       |  CROSS JOIN qfull q)
       |SELECT vec_id, round(d2, 6) AS dist
       |FROM rer ORDER BY d2, vec_id LIMIT 10""".stripMargin

  /** DuckDB replay of [[graft.ext.Similarity.dimPrincipal]]: the
    * q_emb_cov moment CTEs feed a 4096-cell integer matrix (descaled
    * by 2^23, sign·floor-on-magnitude), then a recursive CTE runs the
    * 12 power-iteration rounds — matvec via nested list lambdas, L∞
    * renormalization through HUGEINT (the BigInt twin), m = 0 guard
    * identical. The matvec expression is interpolated at each use
    * site (recursive CTEs cannot alias subexpressions). */
  private val pcaOracleSql: String = {
    val u = "list_transform(range(0, 64), i -> list_sum(" +
      "list_transform(range(0, 64), j -> cm[i*64 + j + 1] * v[j + 1])))"
    val m = s"list_max(list_transform($u, x -> abs(x)))"
    val vp = s"list_transform($u, x -> CAST(CASE WHEN x < 0" +
      s" THEN -((abs(CAST(x AS HUGEINT)) * 1048576) // $m)" +
      s" ELSE (abs(CAST(x AS HUGEINT)) * 1048576) // $m END AS BIGINT))"
    s"""WITH RECURSIVE q AS (
       |  SELECT list_transform(embedding,
       |    x -> CAST(floor(CAST(x AS DOUBLE) * 1024.0 + 0.5) AS BIGINT)) AS qv
       |  FROM embeddings),
       |dims AS (
       |  SELECT d.i, CAST(sum(qv[d.i + 1]) AS BIGINT) AS s
       |  FROM q, range(0, 64) d(i) GROUP BY 1),
       |prods AS (
       |  SELECT t.k, CAST(sum(qv[t.k // 64 + 1] * qv[t.k % 64 + 1]) AS BIGINT) AS sp
       |  FROM q, range(0, 4096) t(k) GROUP BY 1),
       |n AS (SELECT count(*) AS n FROM q),
       |cells AS (
       |  SELECT p.k, CAST(n.n * p.sp - si.s * sj.s AS BIGINT) AS num
       |  FROM prods p
       |  JOIN dims si ON si.i = p.k // 64
       |  JOIN dims sj ON sj.i = p.k % 64
       |  CROSS JOIN n),
       |cmat AS (
       |  SELECT list(CASE WHEN num < 0 THEN -(abs(num) // 8388608)
       |              ELSE abs(num) // 8388608 END ORDER BY k) AS cm
       |  FROM cells),
       |pw AS (
       |  SELECT 0 AS iter, cm,
       |         list_transform(range(0, 64), i -> CAST(1048576 AS BIGINT)) AS v
       |  FROM cmat
       |  UNION ALL
       |  SELECT iter + 1, cm, CASE WHEN $m = 0 THEN v ELSE $vp END
       |  FROM pw WHERE iter < 12),
       |last AS (SELECT v FROM pw ORDER BY iter DESC LIMIT 1),
       |flip AS (SELECT CASE WHEN list_sum(v) < 0
       |                THEN list_transform(v, x -> -x) ELSE v END AS v FROM last)
       |SELECT CAST(i AS INT) AS pos,
       |  round(CAST(v[CAST(i AS INT) + 1] AS DOUBLE) / 1048576.0, 6) AS loading
       |FROM flip, range(0, 64) r(i) ORDER BY pos""".stripMargin
  }

  /** Two-component extension of [[pcaOracleSql]]: component 1's
    * recursion, exact integer Hotelling deflation (128-bit HUGEINT
    * per-cell adjustment, sign-safe magnitude division), then
    * component 2's recursion on the deflated matrix. */
  private val pca2OracleSql: String = {
    def u(cm: String, v: String) =
      s"list_transform(range(0, 64), i -> list_sum(" +
        s"list_transform(range(0, 64), j -> $cm[i*64 + j + 1] * $v[j + 1])))"
    def m(cm: String, v: String) =
      s"list_max(list_transform(${u(cm, v)}, x -> abs(x)))"
    def vp(cm: String, v: String) =
      s"list_transform(${u(cm, v)}, x -> CAST(CASE WHEN x < 0" +
        s" THEN -((abs(CAST(x AS HUGEINT)) * 1048576) // ${m(cm, v)})" +
        s" ELSE (abs(CAST(x AS HUGEINT)) * 1048576) // ${m(cm, v)} END AS BIGINT))"
    def flip(v: String) =
      s"CASE WHEN list_sum($v) < 0 THEN list_transform($v, x -> -x) ELSE $v END"
    val num = "list_sum(list_transform(range(0, 64), i -> " +
      "CAST(v1[i+1] AS HUGEINT) * list_sum(" +
      "list_transform(range(0, 64), j -> cm[i*64 + j + 1] * v1[j+1]))))"
    val vv = "list_sum(list_transform(v1, x -> CAST(x AS HUGEINT) * x))"
    val t = "CAST(v1[kk//64 + 1] AS HUGEINT) * v1[kk%64 + 1] * nm"
    s"""WITH RECURSIVE q AS (
       |  SELECT list_transform(embedding,
       |    x -> CAST(floor(CAST(x AS DOUBLE) * 1024.0 + 0.5) AS BIGINT)) AS qv
       |  FROM embeddings),
       |dims AS (
       |  SELECT d.i, CAST(sum(qv[d.i + 1]) AS BIGINT) AS s
       |  FROM q, range(0, 64) d(i) GROUP BY 1),
       |prods AS (
       |  SELECT t.k, CAST(sum(qv[t.k // 64 + 1] * qv[t.k % 64 + 1]) AS BIGINT) AS sp
       |  FROM q, range(0, 4096) t(k) GROUP BY 1),
       |n AS (SELECT count(*) AS n FROM q),
       |cells AS (
       |  SELECT p.k, CAST(n.n * p.sp - si.s * sj.s AS BIGINT) AS num
       |  FROM prods p
       |  JOIN dims si ON si.i = p.k // 64
       |  JOIN dims sj ON sj.i = p.k % 64
       |  CROSS JOIN n),
       |cmat AS (
       |  SELECT list(CASE WHEN num < 0 THEN -(abs(num) // 8388608)
       |              ELSE abs(num) // 8388608 END ORDER BY k) AS cm
       |  FROM cells),
       |pw AS (
       |  SELECT 0 AS iter, cm,
       |         list_transform(range(0, 64), i -> CAST(1048576 AS BIGINT)) AS v
       |  FROM cmat
       |  UNION ALL
       |  SELECT iter + 1, cm,
       |    CASE WHEN ${m("cm", "v")} = 0 THEN v ELSE ${vp("cm", "v")} END
       |  FROM pw WHERE iter < 12),
       |l1 AS (SELECT cm, v FROM pw ORDER BY iter DESC LIMIT 1),
       |d1 AS (SELECT cm, ${flip("v")} AS v1 FROM l1),
       |d2 AS (SELECT cm, v1, $num AS nm, ($vv) * ($vv) AS den FROM d1),
       |cm2t AS (
       |  SELECT CASE WHEN den = 0 THEN cm ELSE
       |    list_transform(range(0, 4096), kk -> CAST(cm[kk+1] -
       |      (CASE WHEN $t < 0 THEN -((-($t)) // den)
       |       ELSE ($t) // den END) AS BIGINT))
       |  END AS cm, v1 FROM d2),
       |pw2 AS (
       |  SELECT 0 AS iter, cm, v1,
       |         list_transform(range(0, 64), i -> CAST(1048576 AS BIGINT)) AS v
       |  FROM cm2t
       |  UNION ALL
       |  SELECT iter + 1, cm, v1,
       |    CASE WHEN ${m("cm", "v")} = 0 THEN v ELSE ${vp("cm", "v")} END
       |  FROM pw2 WHERE iter < 12),
       |l2 AS (SELECT v1, v FROM pw2 ORDER BY iter DESC LIMIT 1),
       |d2f AS (SELECT v1, ${flip("v")} AS v2 FROM l2)
       |SELECT 1 AS component, CAST(i AS INT) AS pos,
       |  round(CAST(v1[CAST(i AS INT) + 1] AS DOUBLE) / 1048576.0, 6) AS loading
       |FROM d2f, range(0, 64) r(i)
       |UNION ALL
       |SELECT 2, CAST(i AS INT),
       |  round(CAST(v2[CAST(i AS INT) + 1] AS DOUBLE) / 1048576.0, 6)
       |FROM d2f, range(0, 64) r(i)
       |ORDER BY component, pos""".stripMargin
  }

  /** Projection final for the [[pca2OracleSql]] CTE chain: every
    * embedding's coordinates along v1/v2 via the same left-to-right
    * dot-product fold the cosine gates rely on, scaled 2⁻²⁰ once. */
  private val pcaProjectOracleSql: String = {
    val cte = pca2OracleSql.substring(0,
      pca2OracleSql.indexOf("SELECT 1 AS component"))
    cte + """, nrm AS (
            |  SELECT
            |    sqrt(list_dot_product(list_transform(v1, x -> CAST(x AS DOUBLE)),
            |      list_transform(v1, x -> CAST(x AS DOUBLE)))) AS n1,
            |    sqrt(list_dot_product(list_transform(v2, x -> CAST(x AS DOUBLE)),
            |      list_transform(v2, x -> CAST(x AS DOUBLE)))) AS n2
            |  FROM d2f)
            |SELECT e.vec_id,
            |  round(list_dot_product(CAST(e.embedding AS DOUBLE[]),
            |    list_transform(v1, x -> CAST(x AS DOUBLE)))
            |    / (CASE WHEN n1 = 0 THEN 1.0 ELSE n1 END), 6) AS pc1,
            |  round(list_dot_product(CAST(e.embedding AS DOUBLE[]),
            |    list_transform(v2, x -> CAST(x AS DOUBLE)))
            |    / (CASE WHEN n2 = 0 THEN 1.0 ELSE n2 END), 6) AS pc2
            |FROM embeddings e, d2f, nrm ORDER BY e.vec_id""".stripMargin
  }

  def defs: Seq[QueryDef] = Seq(

    // Brute-force cosine top-10 to vec_id 0 (baseline ANN)
    QueryDef("q_sim_topk",
      (s, d) => {
        val emb = t(s, d, "embeddings")
        Similarity.topK(emb.filter(col("vec_id") =!= 0),
          emb.filter(col("vec_id") === 0), k = 10)
      },
      Some("""WITH q AS (SELECT embedding AS q_emb FROM embeddings WHERE vec_id = 0),
             |scored AS (
             |  SELECT vec_id,
             |    list_dot_product(CAST(embedding AS DOUBLE[]), CAST(q_emb AS DOUBLE[]))
             |      / (sqrt(list_dot_product(CAST(embedding AS DOUBLE[]), CAST(embedding AS DOUBLE[])))
             |         * sqrt(list_dot_product(CAST(q_emb AS DOUBLE[]), CAST(q_emb AS DOUBLE[])))) AS cos_raw
             |  FROM embeddings, q WHERE vec_id <> 0)
             |SELECT vec_id, round(cos_raw, 6) AS cosine
             |FROM scored ORDER BY cos_raw DESC, vec_id LIMIT 10""".stripMargin),
      bench = true),

    // ANN via JL compression + exact re-rank ([[Similarity.annJl]]):
    // the 64→16 ±1 projection ranks candidates in fixed-point integer
    // space (engine-reproducible ordering), a 40-row pool rides
    // through ONE TakeOrdered scan, and the published top-10 cosines
    // are exact full-vector values. The oracle re-derives the
    // projections in plain integer SQL, replays the pool selection
    // and the re-rank.
    QueryDef("q_sim_ann_jl",
      (s, d) => {
        val emb = t(s, d, "embeddings")
        Similarity.annJl(emb.filter(col("vec_id") =!= 0),
          emb.filter(col("vec_id") === 0), k = 10)
      },
      Some(s"""WITH pr AS (
             |  SELECT vec_id, j,
             |    CAST(sum(CASE WHEN ((((j*64 + i) * (j*64 + i)) % 1000003 * 40503
             |                         + (j*64 + i) * 69069 + 1234567) % 1000003) % 2 = 1
             |             THEN qv ELSE -qv END) AS BIGINT) AS fp
             |  FROM (SELECT vec_id, j, i,
             |          CAST(floor(embedding[CAST(i AS INT) + 1]::DOUBLE * 1048576 + 0.5) AS BIGINT) AS qv
             |        FROM embeddings, range(0, 16) rj(j), range(0, 64) ri(i))
             |  GROUP BY 1, 2),
             |d AS (
             |  SELECT a.vec_id,
             |    CAST(sum(a.fp * qb.fp) AS BIGINT) AS dotpq,
             |    CAST(sum(a.fp * a.fp) AS BIGINT) AS na
             |  FROM pr a JOIN (SELECT j, fp FROM pr WHERE vec_id = 0) qb USING (j)
             |  WHERE a.vec_id <> 0 GROUP BY 1),
             |nq AS (SELECT CAST(sum(fp * fp) AS BIGINT) AS nb FROM pr WHERE vec_id = 0),
             |sc AS (
             |  SELECT vec_id, CAST(dotpq AS DOUBLE)
             |    / (sqrt(CAST(na AS DOUBLE)) * sqrt(CAST(nb AS DOUBLE))) AS jl
             |  FROM d CROSS JOIN nq),
             |pool AS (SELECT vec_id FROM sc ORDER BY jl DESC, vec_id LIMIT 40),
             |rer AS (
             |  SELECT e.vec_id, ${cosSql("e.embedding", "q.q_emb")} AS c
             |  FROM embeddings e JOIN pool USING (vec_id)
             |  CROSS JOIN (SELECT embedding AS q_emb FROM embeddings WHERE vec_id = 0) q)
             |SELECT vec_id, round(c, 6) AS cosine
             |FROM rer ORDER BY c DESC, vec_id LIMIT 10""".stripMargin),
      bench = true),

    // ANN via binary sign sketches ([[Similarity.annHamming]]):
    // 64-bit quadratic-hyperplane sign signatures ranked by Hamming
    // distance, 40-row pool re-ranked with exact cosine — the
    // 8-bytes-per-vector index family. Signs and Hamming counts are
    // exact integer comparisons, so the oracle (reusing the JL
    // fixed-point CTE) replays candidate selection bit-for-bit.
    QueryDef("q_sim_ann_hamming",
      (s, d) => {
        val emb = t(s, d, "embeddings")
        Similarity.annHamming(emb.filter(col("vec_id") =!= 0),
          emb.filter(col("vec_id") === 0), k = 10)
      },
      Some(s"""WITH pr AS (
             |  SELECT vec_id, j,
             |    CAST(sum(CASE WHEN ((((j*64 + i) * (j*64 + i)) % 1000003 * 40503
             |                         + (j*64 + i) * 69069 + 1234567) % 1000003) % 2 = 1
             |             THEN qv ELSE -qv END) AS BIGINT) AS fp
             |  FROM (SELECT vec_id, j, i,
             |          CAST(floor(embedding[CAST(i AS INT) + 1]::DOUBLE * 1048576 + 0.5) AS BIGINT) AS qv
             |        FROM embeddings, range(0, 64) rj(j), range(0, 64) ri(i))
             |  GROUP BY 1, 2),
             |d AS (
             |  SELECT a.vec_id,
             |    CAST(sum(CASE WHEN (a.fp > 0) <> (q.fp > 0) THEN 1 ELSE 0 END) AS BIGINT) AS dist
             |  FROM pr a JOIN (SELECT j, fp FROM pr WHERE vec_id = 0) q USING (j)
             |  WHERE a.vec_id <> 0 GROUP BY 1),
             |pool AS (SELECT vec_id FROM d ORDER BY dist, vec_id LIMIT 40),
             |rer AS (
             |  SELECT e.vec_id, ${cosSql("e.embedding", "q.q_emb")} AS c
             |  FROM embeddings e JOIN pool USING (vec_id)
             |  CROSS JOIN (SELECT embedding AS q_emb FROM embeddings WHERE vec_id = 0) q)
             |SELECT vec_id, round(c, 6) AS cosine
             |FROM rer ORDER BY c DESC, vec_id LIMIT 10""".stripMargin)),

    // Embedding-cosine near-dup pairs (brute-force baseline, oracled)
    QueryDef("q_sim_cos_pairs",
      (s, d) => Similarity.cosinePairs(t(s, d, "embeddings"), threshold = 0.8)
        .orderBy("d1", "d2"),
      Some("""SELECT a.vec_id AS d1, b.vec_id AS d2,
             |  round(list_dot_product(CAST(a.embedding AS DOUBLE[]), CAST(b.embedding AS DOUBLE[]))
             |    / (sqrt(list_dot_product(CAST(a.embedding AS DOUBLE[]), CAST(a.embedding AS DOUBLE[])))
             |       * sqrt(list_dot_product(CAST(b.embedding AS DOUBLE[]), CAST(b.embedding AS DOUBLE[])))), 4) AS cosine
             |FROM embeddings a JOIN embeddings b ON a.vec_id < b.vec_id
             |WHERE list_dot_product(CAST(a.embedding AS DOUBLE[]), CAST(b.embedding AS DOUBLE[]))
             |    / (sqrt(list_dot_product(CAST(a.embedding AS DOUBLE[]), CAST(a.embedding AS DOUBLE[])))
             |       * sqrt(list_dot_product(CAST(b.embedding AS DOUBLE[]), CAST(b.embedding AS DOUBLE[])))) >= 0.8
             |ORDER BY d1, d2""".stripMargin)),

    // Near-dup pairs via the SCALE PATH: multi-table LSH-bucketed
    // candidates (equi-join on (table, bucket)) + exact cosine
    // verification. Portable MINSTD hyperplanes let DuckDB re-derive
    // the buckets bit-for-bit, so this hash-checks the bucketed
    // algorithm a 100 TB corpus would actually run — not just the
    // brute-force baseline (q_sim_cos_pairs). Threshold 0.4 because
    // the synthetic embeddings top out at cosine ~0.5: a 0.8 gate
    // would verify the empty set.
    QueryDef("q_sim_lsh_pairs",
      (s, d) => Similarity.lshPairs(t(s, d, "embeddings"), threshold = 0.4,
        bits = 8, tables = 8, portable = true)
        .orderBy("d1", "d2"),
      Some("""WITH elems AS (
             |  SELECT vec_id, k, CAST(embedding[k+1] AS DOUBLE) AS v
             |  FROM embeddings, range(0, 64) t(k)),
             |signs AS (
             |  SELECT l, j, k,
             |    CASE WHEN ((16807 * ((16807 * ((l * 8 + j) * 64 + k + 1)) % 2147483647)) % 2147483647) % 2 = 1
             |         THEN 1.0 ELSE -1.0 END AS s
             |  FROM range(0, 8) tl(l), range(0, 8) tj(j), range(0, 64) tk(k)),
             |projs AS (
             |  SELECT vec_id, l, j, sum(v * s) AS proj
             |  FROM elems JOIN signs USING (k) GROUP BY vec_id, l, j),
             |buckets AS (
             |  SELECT vec_id, l, sum(CASE WHEN proj > 0 THEN (1::BIGINT << j) ELSE 0 END) AS bucket
             |  FROM projs GROUP BY vec_id, l),
             |cand AS (
             |  SELECT DISTINCT a.vec_id AS d1, b.vec_id AS d2
             |  FROM buckets a JOIN buckets b
             |    ON a.l = b.l AND a.bucket = b.bucket AND a.vec_id < b.vec_id),
             |verified AS (
             |  SELECT d1, d2,
             |    list_dot_product(CAST(ea.embedding AS DOUBLE[]), CAST(eb.embedding AS DOUBLE[]))
             |    / (sqrt(list_dot_product(CAST(ea.embedding AS DOUBLE[]), CAST(ea.embedding AS DOUBLE[])))
             |     * sqrt(list_dot_product(CAST(eb.embedding AS DOUBLE[]), CAST(eb.embedding AS DOUBLE[])))) AS c
             |  FROM cand JOIN embeddings ea ON ea.vec_id = d1
             |            JOIN embeddings eb ON eb.vec_id = d2)
             |SELECT d1, d2, round(c, 4) AS cosine FROM verified
             |WHERE c >= 0.4 ORDER BY d1, d2""".stripMargin),
      bench = true),

    // Embedding near-dup CLUSTERS: connected components over the
    // LSH-candidate cosine pair graph — semantically-duplicate groups
    // with one representative, the actionable output of embedding
    // dedup (pairs alone under-delete transitive chains). Same
    // persisted-pair + scratch-label contract as q_dd_clusters; the
    // oracle chains the full LSH pair derivation into a recursive-CTE
    // component search.
    QueryDef("q_sim_clusters",
      (s, d) => {
        val scratch = graft.Scratch.tempDir("graft_simcc_")
        Similarity.lshPairs(t(s, d, "embeddings"), threshold = 0.4,
          bits = 8, tables = 8, portable = true)
          .write.mode("overwrite").parquet(s"$scratch/pairs")
        val pairs = s.read.parquet(s"$scratch/pairs")
        graft.ext.Dedup.clusters(pairs, scratchDir = Some(scratch))
          .groupBy("rep")
          .agg(count(lit(1)).as("n_members"),
            array_join(transform(sort_array(collect_list(col("id"))),
              _.cast("string")), ",").as("members"))
          .orderBy("rep")
      },
      Some("""WITH RECURSIVE elems AS (
             |  SELECT vec_id, k, CAST(embedding[k+1] AS DOUBLE) AS v
             |  FROM embeddings, range(0, 64) t(k)),
             |signs AS (
             |  SELECT l, j, k,
             |    CASE WHEN ((16807 * ((16807 * ((l * 8 + j) * 64 + k + 1)) % 2147483647)) % 2147483647) % 2 = 1
             |         THEN 1.0 ELSE -1.0 END AS s
             |  FROM range(0, 8) tl(l), range(0, 8) tj(j), range(0, 64) tk(k)),
             |projs AS (
             |  SELECT vec_id, l, j, sum(v * s) AS proj
             |  FROM elems JOIN signs USING (k) GROUP BY vec_id, l, j),
             |buckets AS (
             |  SELECT vec_id, l, sum(CASE WHEN proj > 0 THEN (1::BIGINT << j) ELSE 0 END) AS bucket
             |  FROM projs GROUP BY vec_id, l),
             |cand AS (
             |  SELECT DISTINCT a.vec_id AS d1, b.vec_id AS d2
             |  FROM buckets a JOIN buckets b
             |    ON a.l = b.l AND a.bucket = b.bucket AND a.vec_id < b.vec_id),
             |jpairs AS (
             |  SELECT d1, d2 FROM (
             |    SELECT d1, d2,
             |      list_dot_product(CAST(ea.embedding AS DOUBLE[]), CAST(eb.embedding AS DOUBLE[]))
             |      / (sqrt(list_dot_product(CAST(ea.embedding AS DOUBLE[]), CAST(ea.embedding AS DOUBLE[])))
             |       * sqrt(list_dot_product(CAST(eb.embedding AS DOUBLE[]), CAST(eb.embedding AS DOUBLE[])))) AS c
             |    FROM cand JOIN embeddings ea ON ea.vec_id = d1
             |              JOIN embeddings eb ON eb.vec_id = d2)
             |  WHERE c >= 0.4),
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
             |FROM lab GROUP BY rep ORDER BY rep""".stripMargin)),

    // LSH-bucketed ANN (the 100 TB scale path; recall vs brute force
    // is asserted in SimilaritySpec). Portable MINSTD hyperplanes let
    // the oracle re-derive the 4-bit buckets, the query's bucket
    // lookup, and the cosine-ranked top-10 — full value check of the
    // bucketed ANN pipeline (cosine is an index-order double fold on
    // both engines, same as q_sim_topk).
    QueryDef("q_sim_ann_lsh",
      (s, d) => {
        val emb = t(s, d, "embeddings")
        Similarity.annLsh(emb.filter(col("vec_id") =!= 0),
          emb.filter(col("vec_id") === 0), k = 10, bits = 4, portable = true)
      },
      Some("""WITH elems AS (
             |  SELECT vec_id, k, CAST(embedding[k+1] AS DOUBLE) AS v
             |  FROM embeddings, range(0, 64) t(k)),
             |signs AS (
             |  SELECT j, k,
             |    CASE WHEN ((16807 * ((16807 * (j * 64 + k + 1)) % 2147483647)) % 2147483647) % 2 = 1
             |         THEN 1.0 ELSE -1.0 END AS s
             |  FROM range(0, 4) tj(j), range(0, 64) tk(k)),
             |buckets AS (
             |  SELECT vec_id, sum(CASE WHEN proj > 0 THEN (1::BIGINT << j) ELSE 0 END) AS bucket
             |  FROM (SELECT vec_id, j, sum(v * s) AS proj
             |        FROM elems JOIN signs USING (k) GROUP BY vec_id, j)
             |  GROUP BY vec_id),
             |q AS (SELECT b.bucket AS qb, e.embedding AS q_emb
             |      FROM buckets b JOIN embeddings e USING (vec_id) WHERE b.vec_id = 0),
             |scored AS (
             |  SELECT c.vec_id,
             |    list_dot_product(CAST(e.embedding AS DOUBLE[]), CAST(q.q_emb AS DOUBLE[]))
             |      / (sqrt(list_dot_product(CAST(e.embedding AS DOUBLE[]), CAST(e.embedding AS DOUBLE[])))
             |         * sqrt(list_dot_product(CAST(q.q_emb AS DOUBLE[]), CAST(q.q_emb AS DOUBLE[])))) AS cos_raw
             |  FROM buckets c JOIN embeddings e ON e.vec_id = c.vec_id CROSS JOIN q
             |  WHERE c.vec_id <> 0 AND c.bucket = q.qb)
             |SELECT vec_id, round(cos_raw, 6) AS cosine
             |FROM scored ORDER BY cos_raw DESC, vec_id LIMIT 10""".stripMargin),
      bench = true),

    // Multi-probe ANN: also probe every bucket at Hamming distance 1
    // from the query's — the recall story at scale (SimilaritySpec
    // asserts the aggregate recall delta vs single-probe). The oracle
    // re-derives the 8-bit buckets AND the 9-bucket probe set
    // (q_bucket plus each 1-bit flip).
    QueryDef("q_sim_ann_lsh_mp",
      (s, d) => {
        val emb = t(s, d, "embeddings")
        Similarity.annLsh(emb.filter(col("vec_id") =!= 3),
          emb.filter(col("vec_id") === 3), k = 10, bits = 8,
          multiProbe = true, portable = true)
      },
      Some("""WITH elems AS (
             |  SELECT vec_id, k, CAST(embedding[k+1] AS DOUBLE) AS v
             |  FROM embeddings, range(0, 64) t(k)),
             |signs AS (
             |  SELECT j, k,
             |    CASE WHEN ((16807 * ((16807 * (j * 64 + k + 1)) % 2147483647)) % 2147483647) % 2 = 1
             |         THEN 1.0 ELSE -1.0 END AS s
             |  FROM range(0, 8) tj(j), range(0, 64) tk(k)),
             |buckets AS (
             |  SELECT vec_id, sum(CASE WHEN proj > 0 THEN (1::BIGINT << j) ELSE 0 END) AS bucket
             |  FROM (SELECT vec_id, j, sum(v * s) AS proj
             |        FROM elems JOIN signs USING (k) GROUP BY vec_id, j)
             |  GROUP BY vec_id),
             |q AS (SELECT b.bucket AS qb, e.embedding AS q_emb
             |      FROM buckets b JOIN embeddings e USING (vec_id) WHERE b.vec_id = 3),
             |probes AS (
             |  SELECT qb AS probe FROM q
             |  UNION SELECT xor(qb, 1::BIGINT << j) FROM q, range(0, 8) tj(j)),
             |scored AS (
             |  SELECT c.vec_id,
             |    list_dot_product(CAST(e.embedding AS DOUBLE[]), CAST(q.q_emb AS DOUBLE[]))
             |      / (sqrt(list_dot_product(CAST(e.embedding AS DOUBLE[]), CAST(e.embedding AS DOUBLE[])))
             |         * sqrt(list_dot_product(CAST(q.q_emb AS DOUBLE[]), CAST(q.q_emb AS DOUBLE[])))) AS cos_raw
             |  FROM buckets c JOIN embeddings e ON e.vec_id = c.vec_id CROSS JOIN q
             |  WHERE c.vec_id <> 3 AND c.bucket IN (SELECT probe FROM probes))
             |SELECT vec_id, round(cos_raw, 6) AS cosine
             |FROM scored ORDER BY cos_raw DESC, vec_id LIMIT 10""".stripMargin),
      bench = true),

    // IVF ANN (MINSTD-seeded + 2 Lloyd refinement iterations; probes
    // 2 of 16 clusters), with a full DuckDB oracle: the portable path
    // quantizes Lloyd means to a 2^-20 grid so the centroid sums are
    // exact integers in any accumulation order — the one source of
    // engine divergence — and the oracle then unrolls seed ->
    // assign -> re-center -> assign -> re-center -> final assignment
    // -> probe top-2 -> cosine top-10, value-checking the ENTIRE
    // index build, not just the query scan.
    QueryDef("q_sim_ann_ivf",
      (s, d) => {
        val emb = t(s, d, "embeddings")
        Similarity.annIvf(emb.filter(col("vec_id") =!= 0),
          emb.filter(col("vec_id") === 0), k = 10, portable = true,
          lloydIters = 2)
      },
      Some(ivfOracleSql), bench = true),

    // Batch IVF: 10 queries share ONE Lloyd-refined index — the index
    // build and corpus scan amortize over the batch (the annLshBatch
    // rationale applied to IVF). Per-query probe top-2 via a window
    // over broadcast centroids, candidates from the cluster equi-join,
    // per-query cosine top-3. The oracle re-derives the entire index
    // on the batch corpus cut plus both per-query windows.
    QueryDef("q_sim_ann_ivf_batch",
      (s, d) => {
        val emb = t(s, d, "embeddings")
        Similarity.annIvfBatch(emb.filter(col("vec_id") >= 10),
          emb.filter(col("vec_id") < 10), k = 3, portable = true,
          lloydIters = 2)
          .orderBy("q_id", "vec_id")
      },
      Some(ivfBatchOracleSql)),

    // Product quantization ADC top-10: per-subspace k-means codebook
    // (MINSTD seed, one integer-grid Lloyd round), 2-byte codes, and
    // asymmetric-distance scoring from a broadcast query→centroid
    // table. The oracle re-derives the entire pipeline: seeds →
    // per-subspace assignment (L2², tie cid ASC) → grid means →
    // encode → quantized distance table → exact integer ADC sums.
    QueryDef("q_sim_pq",
      (s, d) => {
        val emb = t(s, d, "embeddings")
        Similarity.pqTopK(emb.filter(col("vec_id") =!= 0),
          emb.filter(col("vec_id") === 0), k = 10, dim = 64, m = 4,
          kPerSub = 16, portable = true, lloydIters = 1)
      },
      Some(pqOracleSql), bench = true),

    // Persisted ANN index lifecycle: build the PQ index ONCE to plain
    // parquet (codebook/codes/centroids/assign), then serve the ADC
    // top-10 purely from the on-disk codes + codebook — the
    // production split between the scheduled index job and the
    // interactive query job (which never touches corpus embeddings).
    // The builds are deterministic, so a rebuild is bit-identical to
    // a reload and the oracle is the same full PQ-chain SQL as
    // q_sim_pq: a drift anywhere in save → parquet round-trip → load
    // → score hash-fails the gate.
    QueryDef("q_sim_index_query",
      (s, d) => {
        val emb = t(s, d, "embeddings")
        val dir = graft.Scratch.tempDir("graft_annidx_")
        Similarity.saveIndex(emb.filter(col("vec_id") =!= 0), dir,
          dim = 64, m = 4, kPerSub = 16, portable = true, lloydIters = 1)
        Similarity.queryIndex(s, dir, emb.filter(col("vec_id") === 0),
          k = 10, dim = 64, m = 4)
      },
      Some(pqOracleSql)),

    // PQ + exact re-rank: ADC top-50 shortlist, exact squared-L2
    // top-10 over only the shortlist's float vectors — the
    // production two-stage retrieval. Oracle extends the PQ chain
    // with the same shortlist cut and full-vector re-rank.
    QueryDef("q_sim_pq_rerank",
      (s, d) => {
        val emb = t(s, d, "embeddings")
        Similarity.pqTopKRerank(emb.filter(col("vec_id") =!= 0),
          emb.filter(col("vec_id") === 0), k = 10, shortlist = 50,
          dim = 64, m = 4, kPerSub = 16, portable = true, lloydIters = 1)
      },
      Some(pqRerankOracleSql)),

    // IVF-PQ composition: coarse cells prune to ~2/16 of the corpus,
    // 2-byte codes rank the survivors — the layout a large vector
    // store actually deploys. Oracle chains the full IVF index build
    // into the PQ body and re-derives every pruned candidate's score.
    QueryDef("q_sim_pq_ivf",
      (s, d) => {
        val emb = t(s, d, "embeddings")
        Similarity.pqIvfTopK(emb.filter(col("vec_id") =!= 0),
          emb.filter(col("vec_id") === 0), k = 10, dim = 64, m = 4,
          kPerSub = 16, nCentroids = 16, nProbe = 2, portable = true,
          lloydIters = 1, ivfLloydIters = 2)
      },
      Some(pqIvfOracleSql), bench = true),

    // Embedding dedup via PQ codes: vectors agreeing in all 4
    // subspace cells form one group — the one-shuffle semantic-hash
    // first pass. Oracle re-derives the codes and the group rollup.
    QueryDef("q_sim_code_dedup",
      (s, d) => Similarity.codeDedupGroups(
        t(s, d, "embeddings").filter(col("vec_id") =!= 0),
        dim = 64, m = 4, kPerSub = 16, portable = true, lloydIters = 1)
        .orderBy("rep"),
      Some(s"""WITH ${pqIndexCte("vec_id <> 0")},
              |keys AS (
              |  SELECT vec_id,
              |    array_to_string(list(cid ORDER BY s), ',') AS code_key
              |  FROM pqenc GROUP BY vec_id)
              |SELECT code_key, min(vec_id) AS rep,
              |  count(*) AS n_members,
              |  array_to_string(list(vec_id ORDER BY vec_id), ',') AS members
              |FROM keys GROUP BY code_key
              |HAVING count(*) >= 2 ORDER BY rep""".stripMargin)),

    // Batch PQ: 10 queries share one codebook; per-query broadcast
    // distance tables, exploded-code map-side join, exact integer ADC
    // sums, per-query top-3. The oracle re-derives the shared index
    // and every per-query score.
    QueryDef("q_sim_pq_batch",
      (s, d) => {
        val emb = t(s, d, "embeddings")
        Similarity.pqTopKBatch(emb.filter(col("vec_id") >= 10),
          emb.filter(col("vec_id") < 10), k = 3, dim = 64, m = 4,
          kPerSub = 16, portable = true, lloydIters = 1)
          .orderBy("q_id", "vec_id")
      },
      Some(pqBatchOracleSql)),

    // Batch ANN: top-3 per query for 10 query vectors in ONE bucketed
    // equi-join + per-query window — the amortized many-queries plan
    // a production search job runs (no broadcast, both sides scale).
    // Portable hyperplanes give the full value oracle.
    QueryDef("q_sim_ann_batch",
      (s, d) => {
        val emb = t(s, d, "embeddings")
        Similarity.annLshBatch(emb.filter(col("vec_id") >= 10),
          emb.filter(col("vec_id") < 10), k = 3, bits = 6, portable = true)
          .orderBy("q_id", "cosine")
      },
      Some("""WITH elems AS (
             |  SELECT vec_id, k, CAST(embedding[k+1] AS DOUBLE) AS v
             |  FROM embeddings, range(0, 64) t(k)),
             |signs AS (
             |  SELECT j, k,
             |    CASE WHEN ((16807 * ((16807 * (j * 64 + k + 1)) % 2147483647)) % 2147483647) % 2 = 1
             |         THEN 1.0 ELSE -1.0 END AS s
             |  FROM range(0, 6) tj(j), range(0, 64) tk(k)),
             |buckets AS (
             |  SELECT vec_id, sum(CASE WHEN proj > 0 THEN (1::BIGINT << j) ELSE 0 END) AS bucket
             |  FROM (SELECT vec_id, j, sum(v * s) AS proj
             |        FROM elems JOIN signs USING (k) GROUP BY vec_id, j)
             |  GROUP BY vec_id),
             |joined AS (
             |  SELECT q.vec_id AS q_id, c.vec_id,
             |    list_dot_product(CAST(ce.embedding AS DOUBLE[]), CAST(qe.embedding AS DOUBLE[]))
             |      / (sqrt(list_dot_product(CAST(ce.embedding AS DOUBLE[]), CAST(ce.embedding AS DOUBLE[])))
             |         * sqrt(list_dot_product(CAST(qe.embedding AS DOUBLE[]), CAST(qe.embedding AS DOUBLE[])))) AS cos_raw
             |  FROM buckets c JOIN buckets q ON c.bucket = q.bucket
             |  JOIN embeddings ce ON ce.vec_id = c.vec_id
             |  JOIN embeddings qe ON qe.vec_id = q.vec_id
             |  WHERE c.vec_id >= 10 AND q.vec_id < 10),
             |ranked AS (
             |  SELECT q_id, vec_id, cos_raw,
             |    row_number() OVER (PARTITION BY q_id ORDER BY cos_raw DESC, vec_id) AS rn
             |  FROM joined)
             |SELECT q_id, vec_id, round(cos_raw, 6) AS cosine
             |FROM ranked WHERE rn <= 3 ORDER BY q_id, cosine""".stripMargin),
      bench = true),

    // Corpus k-NN graph: every vector's 3 nearest same-bucket
    // neighbors, self excluded — annLshBatch with corpus = queries.
    // The oracle re-derives buckets, the bucket self-join, and the
    // per-vector top-3.
    QueryDef("q_sim_knn",
      (s, d) => Similarity.knnGraph(t(s, d, "embeddings"), k = 3, bits = 6,
          portable = true)
        .orderBy("q_id", "cosine"),
      Some("""WITH elems AS (
             |  SELECT vec_id, k, CAST(embedding[k+1] AS DOUBLE) AS v
             |  FROM embeddings, range(0, 64) t(k)),
             |signs AS (
             |  SELECT j, k,
             |    CASE WHEN ((16807 * ((16807 * (j * 64 + k + 1)) % 2147483647)) % 2147483647) % 2 = 1
             |         THEN 1.0 ELSE -1.0 END AS s
             |  FROM range(0, 6) tj(j), range(0, 64) tk(k)),
             |buckets AS (
             |  SELECT vec_id, sum(CASE WHEN proj > 0 THEN (1::BIGINT << j) ELSE 0 END) AS bucket
             |  FROM (SELECT vec_id, j, sum(v * s) AS proj
             |        FROM elems JOIN signs USING (k) GROUP BY vec_id, j)
             |  GROUP BY vec_id),
             |joined AS (
             |  SELECT q.vec_id AS q_id, c.vec_id,
             |    list_dot_product(CAST(ce.embedding AS DOUBLE[]), CAST(qe.embedding AS DOUBLE[]))
             |      / (sqrt(list_dot_product(CAST(ce.embedding AS DOUBLE[]), CAST(ce.embedding AS DOUBLE[])))
             |         * sqrt(list_dot_product(CAST(qe.embedding AS DOUBLE[]), CAST(qe.embedding AS DOUBLE[])))) AS cos_raw
             |  FROM buckets c JOIN buckets q ON c.bucket = q.bucket
             |  JOIN embeddings ce ON ce.vec_id = c.vec_id
             |  JOIN embeddings qe ON qe.vec_id = q.vec_id
             |  WHERE c.vec_id <> q.vec_id),
             |ranked AS (
             |  SELECT q_id, vec_id, cos_raw,
             |    row_number() OVER (PARTITION BY q_id ORDER BY cos_raw DESC, vec_id) AS rn
             |  FROM joined)
             |SELECT q_id, vec_id, round(cos_raw, 6) AS cosine
             |FROM ranked WHERE rn <= 3 ORDER BY q_id, cosine""".stripMargin),
      bench = true),

    // MMR diverse top-4 (λ = 0.5): greedy relevance-minus-redundancy
    // selection against query vector 0. Integer-grid scores make the
    // greedy trajectory exact; the oracle unrolls all four steps
    // (at λ = 0.5 the argmax of (1−λ)qrel − λ·ms is the argmax of
    // qrel − ms).
    QueryDef("q_sim_mmr",
      (s, d) => {
        val emb = t(s, d, "embeddings")
        Similarity.mmrSelect(emb.filter(col("vec_id") =!= 0),
            emb.filter(col("vec_id") === 0), k = 4)
          .orderBy("step")
      },
      Some {
        def cosQ(l: String, r: String) =
          s"""CAST(floor(
             |      list_dot_product(CAST($l AS DOUBLE[]), CAST($r AS DOUBLE[]))
             |      / (sqrt(list_dot_product(CAST($l AS DOUBLE[]), CAST($l AS DOUBLE[])))
             |         * sqrt(list_dot_product(CAST($r AS DOUBLE[]), CAST($r AS DOUBLE[]))))
             |      * 1048576.0 + 0.5) AS BIGINT)""".stripMargin
        def step(i: Int): String = {
          val sel = (1 until i).map(j => s"SELECT vec_id FROM s$j")
            .mkString(" UNION ")
          s"""p$i AS (
             |  SELECT c.vec_id, c.qrel, max(${cosQ("c.embedding", "s.embedding")}) AS ms
             |  FROM sc c JOIN sc s ON s.vec_id IN ($sel)
             |  WHERE c.vec_id NOT IN ($sel)
             |  GROUP BY 1, 2),
             |s$i AS (SELECT vec_id FROM p$i
             |        ORDER BY (qrel - ms) DESC, vec_id LIMIT 1)""".stripMargin
        }
        s"""WITH qv AS (SELECT embedding AS qe FROM embeddings WHERE vec_id = 0),
           |sc AS (
           |  SELECT c.vec_id, c.embedding, ${cosQ("c.embedding", "q.qe")} AS qrel
           |  FROM embeddings c, qv q WHERE c.vec_id <> 0),
           |s1 AS (SELECT vec_id FROM sc ORDER BY qrel DESC, vec_id LIMIT 1),
           |${(2 to 4).map(step).mkString(",\n")}
           |SELECT vec_id, CAST(1 AS BIGINT) AS step FROM s1
           |UNION ALL SELECT vec_id, CAST(2 AS BIGINT) FROM s2
           |UNION ALL SELECT vec_id, CAST(3 AS BIGINT) FROM s3
           |UNION ALL SELECT vec_id, CAST(4 AS BIGINT) FROM s4
           |ORDER BY step""".stripMargin
      }),

    // Pooled MMR (retrieve-then-rerank): relevance top-16 pool in ONE
    // distributed pass, greedy MMR driver-side over the pool. Same
    // unrolled-step oracle as q_sim_mmr, with the candidate CTE
    // LIMITed to the pool — the integer grid makes pool membership
    // and every step's argmax engine-exact.
    QueryDef("q_sim_mmr_pooled",
      (s, d) => {
        val emb = t(s, d, "embeddings")
        Similarity.mmrSelectPooled(emb.filter(col("vec_id") =!= 0),
            emb.filter(col("vec_id") === 0), k = 4, poolFactor = 4)
          .orderBy("step")
      },
      Some {
        def cosQ(l: String, r: String) =
          s"""CAST(floor(
             |      list_dot_product(CAST($l AS DOUBLE[]), CAST($r AS DOUBLE[]))
             |      / (sqrt(list_dot_product(CAST($l AS DOUBLE[]), CAST($l AS DOUBLE[])))
             |         * sqrt(list_dot_product(CAST($r AS DOUBLE[]), CAST($r AS DOUBLE[]))))
             |      * 1048576.0 + 0.5) AS BIGINT)""".stripMargin
        def step(i: Int): String = {
          val sel = (1 until i).map(j => s"SELECT vec_id FROM s$j")
            .mkString(" UNION ")
          s"""p$i AS (
             |  SELECT c.vec_id, c.qrel, max(${cosQ("c.embedding", "s.embedding")}) AS ms
             |  FROM sc c JOIN sc s ON s.vec_id IN ($sel)
             |  WHERE c.vec_id NOT IN ($sel)
             |  GROUP BY 1, 2),
             |s$i AS (SELECT vec_id FROM p$i
             |        ORDER BY (qrel - ms) DESC, vec_id LIMIT 1)""".stripMargin
        }
        s"""WITH qv AS (SELECT embedding AS qe FROM embeddings WHERE vec_id = 0),
           |sc AS (
           |  SELECT c.vec_id, c.embedding, ${cosQ("c.embedding", "q.qe")} AS qrel
           |  FROM embeddings c, qv q WHERE c.vec_id <> 0
           |  ORDER BY qrel DESC, c.vec_id LIMIT 16),
           |s1 AS (SELECT vec_id FROM sc ORDER BY qrel DESC, vec_id LIMIT 1),
           |${(2 to 4).map(step).mkString(",\n")}
           |SELECT vec_id, CAST(1 AS BIGINT) AS step FROM s1
           |UNION ALL SELECT vec_id, CAST(2 AS BIGINT) FROM s2
           |UNION ALL SELECT vec_id, CAST(3 AS BIGINT) FROM s3
           |UNION ALL SELECT vec_id, CAST(4 AS BIGINT) FROM s4
           |ORDER BY step""".stripMargin
      }),

    // Semantic decontamination: corpus vectors (id >= 10) surviving
    // a 0.35-cosine screen against the 10 eval vectors — the
    // embedding-space complement of shingle decontam. The oracle
    // takes the max cosine per corpus vector over the eval set
    // (cosine to the argmax IS the max) and keeps the sub-threshold
    // rows.
    QueryDef("q_sim_decontam",
      (s, d) => {
        val emb = t(s, d, "embeddings")
        Similarity.semanticDecontaminate(emb.filter(col("vec_id") >= 10),
            emb.filter(col("vec_id") < 10), threshold = 0.35)
          .select("vec_id").orderBy("vec_id")
      },
      Some("""WITH mc AS (
             |  SELECT c.vec_id,
             |    max(list_dot_product(CAST(c.embedding AS DOUBLE[]), CAST(e.embedding AS DOUBLE[]))
             |      / (sqrt(list_dot_product(CAST(c.embedding AS DOUBLE[]), CAST(c.embedding AS DOUBLE[])))
             |         * sqrt(list_dot_product(CAST(e.embedding AS DOUBLE[]), CAST(e.embedding AS DOUBLE[]))))) AS m
             |  FROM embeddings c CROSS JOIN embeddings e
             |  WHERE c.vec_id >= 10 AND e.vec_id < 10
             |  GROUP BY 1)
             |SELECT vec_id FROM mc WHERE m < 0.35 ORDER BY vec_id""".stripMargin)),

    // SemDeDup-style semantic prune: drop any vector with a
    // same-bucket neighbor at cosine >= 0.35 and a smaller id — the
    // min-id representative survives. The oracle replays buckets,
    // the ordered pair filter, and the anti join.
    QueryDef("q_sim_semdedup",
      (s, d) => Similarity.semdedupKeep(t(s, d, "embeddings"),
          threshold = 0.35, bits = 6, portable = true)
        .select("vec_id").orderBy("vec_id"),
      Some("""WITH elems AS (
             |  SELECT vec_id, k, CAST(embedding[k+1] AS DOUBLE) AS v
             |  FROM embeddings, range(0, 64) t(k)),
             |signs AS (
             |  SELECT j, k,
             |    CASE WHEN ((16807 * ((16807 * (j * 64 + k + 1)) % 2147483647)) % 2147483647) % 2 = 1
             |         THEN 1.0 ELSE -1.0 END AS s
             |  FROM range(0, 6) tj(j), range(0, 64) tk(k)),
             |buckets AS (
             |  SELECT vec_id, sum(CASE WHEN proj > 0 THEN (1::BIGINT << j) ELSE 0 END) AS bucket
             |  FROM (SELECT vec_id, j, sum(v * s) AS proj
             |        FROM elems JOIN signs USING (k) GROUP BY vec_id, j)
             |  GROUP BY vec_id),
             |drops AS (
             |  SELECT DISTINCT q.vec_id AS qid
             |  FROM buckets c JOIN buckets q
             |    ON c.bucket = q.bucket AND c.vec_id < q.vec_id
             |  JOIN embeddings ce ON ce.vec_id = c.vec_id
             |  JOIN embeddings qe ON qe.vec_id = q.vec_id
             |  WHERE list_dot_product(CAST(ce.embedding AS DOUBLE[]), CAST(qe.embedding AS DOUBLE[]))
             |      / (sqrt(list_dot_product(CAST(ce.embedding AS DOUBLE[]), CAST(ce.embedding AS DOUBLE[])))
             |         * sqrt(list_dot_product(CAST(qe.embedding AS DOUBLE[]), CAST(qe.embedding AS DOUBLE[]))))
             |      >= 0.35)
             |SELECT vec_id FROM embeddings
             |WHERE vec_id NOT IN (SELECT qid FROM drops)
             |ORDER BY vec_id""".stripMargin)),

    // Per-label embedding centroid: elementwise mean via posexplode +
    // (label, pos) aggregation — the scalable vector-aggregate shape
    // (no per-group array materialization); output exploded to
    // scalars so the hash compare is list-free
    QueryDef("q_emb_centroid",
      (s, d) => t(s, d, "embeddings")
        .select(col("label"), posexplode(col("embedding")).as(Seq("pos", "v")))
        .groupBy(col("label"), col("pos").cast("long").as("pos"))
        .agg(round(avg(col("v").cast("double")), 6).as("v"))
        .orderBy("label", "pos"),
      Some("""SELECT label, i - 1 AS pos,
             |  round(avg(CAST(embedding[i] AS DOUBLE)), 6) AS v
             |FROM embeddings, range(1, 65) t(i)
             |GROUP BY 1, 2 ORDER BY 1, 2""".stripMargin)),

    // Symmetric int8 quantization (the standard 4x compression for
    // billion-scale ANN): per-vector scale + quantized components,
    // serialized to CSV text so the value compare is exact
    QueryDef("q_emb_quantize",
      (s, d) => t(s, d, "embeddings")
        .withColumn("scale_raw", Similarity.int8Scale(col("embedding")))
        .select(col("vec_id"),
          round(col("scale_raw"), 6).as("scale"),
          array_join(Similarity.quantizeInt8(col("embedding"), col("scale_raw")), ",")
            .as("q_csv"))
        .orderBy("vec_id"),
      Some("""WITH scaled AS (
             |  SELECT vec_id, embedding,
             |    CASE WHEN list_max(list_transform(embedding, x -> abs(x::DOUBLE))) > 0
             |         THEN 127.0::DOUBLE / list_max(list_transform(embedding, x -> abs(x::DOUBLE)))
             |         ELSE 0.0::DOUBLE END AS scale_raw
             |  FROM embeddings)
             |SELECT vec_id, round(scale_raw, 6) AS scale,
             |  array_to_string(list_transform(embedding,
             |    x -> CAST(floor(x::DOUBLE * scale_raw + 0.5) AS INT)), ',') AS q_csv
             |FROM scaled ORDER BY vec_id""".stripMargin)),

    // Johnson–Lindenstrauss ±1 projection 64 → 16 dims
    // ([[graft.functions.JlProject]]): the pre-ANN compression pass,
    // one fused codegen loop per row. Input quantized once to the
    // 2^-20 grid, each output an exact integer sum of ±grid values
    // (order-proof), signs the parity of a quadratic residue mod
    // 1000003 (plain integer SQL; see JlProject's scaladoc for why a
    // linear-generator parity degenerates at stride dim) — so all 16
    // components of all 500 vectors hash-match exactly.
    QueryDef("q_emb_project",
      (s, d) => t(s, d, "embeddings")
        .select(col("vec_id"),
          posexplode(graft.functions.VectorExpressions
            .jlProjectNative(col("embedding"), 16)))
        .select(col("vec_id"), col("pos"),
          round(col("col") / 1048576.0, 6).as("v"))
        .orderBy("vec_id", "pos"),
      Some("""WITH q AS (
             |  SELECT vec_id, j, i,
             |    CAST(floor(embedding[CAST(i AS INT) + 1]::DOUBLE * 1048576 + 0.5) AS BIGINT) AS qv
             |  FROM embeddings, range(0, 16) rj(j), range(0, 64) ri(i)),
             |s AS (
             |  SELECT vec_id, j,
             |    CAST(sum(CASE WHEN ((((j*64 + i) * (j*64 + i)) % 1000003 * 40503
             |                         + (j*64 + i) * 69069 + 1234567) % 1000003) % 2 = 1
             |             THEN qv ELSE -qv END) AS BIGINT) AS fp
             |  FROM q GROUP BY 1, 2)
             |SELECT vec_id, CAST(j AS INT) AS pos, round(fp / 1048576.0, 6) AS v
             |FROM s ORDER BY vec_id, pos""".stripMargin)),

    // Per-dimension statistics on the 2^-20 integer grid: exact
    // integer sums (aggregation-order-proof), derived mean/std
    // doubles deterministic from exact inputs — the profiling pass
    // before standardization/whitening feeds PQ/IVF.
    QueryDef("q_emb_dimstats",
      (s, d) => Similarity.dimStats(t(s, d, "embeddings")).orderBy("pos"),
      Some("""WITH q AS (
             |  SELECT i - 1 AS pos,
             |    CAST(floor(embedding[i]::DOUBLE * 1048576 + 0.5) AS BIGINT) AS q
             |  FROM embeddings, range(1, 65) r(i)),
             |agg AS (
             |  SELECT pos, count(*)::BIGINT AS n, sum(q)::BIGINT AS sum_q,
             |    sum(q * q)::BIGINT AS sum_q2
             |  FROM q GROUP BY pos)
             |SELECT pos, n, sum_q, sum_q2,
             |  round((sum_q / 1048576.0) / n, 6) AS mean,
             |  round(sqrt((n * sum_q2 - sum_q * sum_q)::DOUBLE)
             |        / (n * 1048576.0), 6) AS std
             |FROM agg ORDER BY pos""".stripMargin)),

    // Full 64×64 covariance matrix (whitening prep): per-row outer
    // products on the 2^-10 grid reduced by the constant-state array
    // sum — exact integer numerators, and the 6-decimal rounding done
    // in exact HUGEINT micro-units (round(double,6) is engine-
    // divergent: tiny negative cells round to -0.0 in DuckDB but
    // +0.0 in Spark's BigDecimal path — the r6 hash-fail). The
    // oracle re-derives every cell from the same quantized elements.
    QueryDef("q_emb_cov",
      (s, d) => Similarity.dimCovariance(t(s, d, "embeddings"))
        .orderBy("i", "j"),
      Some("""WITH q AS (
             |  SELECT list_transform(embedding,
             |    v -> CAST(floor(CAST(v AS DOUBLE) * 1024.0 + 0.5) AS BIGINT)) AS qv
             |  FROM embeddings),
             |dims AS (
             |  SELECT d.i, CAST(sum(qv[d.i + 1]) AS BIGINT) AS s
             |  FROM q, range(0, 64) d(i) GROUP BY 1),
             |prods AS (
             |  SELECT t.k, CAST(sum(qv[t.k // 64 + 1] * qv[t.k % 64 + 1]) AS BIGINT) AS sp
             |  FROM q, range(0, 4096) t(k) GROUP BY 1),
             |n AS (SELECT count(*) AS n FROM q),
             |cells AS (
             |  SELECT p.k, CAST(n.n * p.sp - si.s * sj.s AS HUGEINT) AS num,
             |    CAST(n.n * n.n AS HUGEINT) * 1048576 AS den
             |  FROM prods p
             |  JOIN dims si ON si.i = p.k // 64
             |  JOIN dims sj ON sj.i = p.k % 64
             |  CROSS JOIN n),
             |mic AS (
             |  SELECT k, num, (abs(num) * 2000000 + den) // (2 * den) AS m
             |  FROM cells)
             |SELECT k // 64 AS i, k % 64 AS j,
             |  CAST(CASE WHEN num < 0 THEN -m ELSE m END AS DOUBLE)
             |    / 1000000.0 AS cov
             |FROM mic ORDER BY i, j""".stripMargin)),

    // Dominant principal component ([[Similarity.dimPrincipal]]):
    // fixed-point power iteration over the exact integer covariance —
    // data work is ONE moment pass, the 12 rounds run driver-side on
    // the 64×64 matrix. The oracle replays every round in a recursive
    // CTE (HUGEINT for the ·2^20/maxabs widening), so all 64 loadings
    // hash-match bit-for-bit; on this near-isotropic corpus that
    // makes the gate a determinism check of the iteration itself
    // (convergence speed is spec-pinned on planted data instead).
    QueryDef("q_emb_pca",
      (s, d) => Similarity.dimPrincipal(t(s, d, "embeddings"))
        .select(col("pos"),
          round(col("loading_fp") / 1048576.0, 6).as("loading"))
        .orderBy("pos"),
      Some(pcaOracleSql)),

    // Top-2 principal components ([[Similarity.dimPrincipalK]]):
    // component 1 is q_emb_pca's exactly; component 2 comes from the
    // exactly-deflated matrix (integer Hotelling deflation through
    // 128-bit products). The oracle chains both recursions with the
    // same HUGEINT cell adjustments, so all 128 loadings hash-match.
    QueryDef("q_emb_pca2",
      (s, d) => Similarity.dimPrincipalK(t(s, d, "embeddings"), components = 2)
        .select(col("component"), col("pos"),
          round(col("loading_fp") / 1048576.0, 6).as("loading"))
        .orderBy("component", "pos"),
      Some(pca2OracleSql)),

    // PCA projection ([[Similarity.pcaProject]]): 64→2 compression
    // along the Hotelling components — loadings broadcast as integer
    // literals, projection a narrow per-row fold. The oracle runs
    // the FULL recursive PCA replay and then projects every
    // embedding with the same accumulation order.
    QueryDef("q_emb_pca_proj",
      (s, d) => Similarity.pcaProject(t(s, d, "embeddings"), components = 2)
        .orderBy("vec_id"),
      Some(pcaProjectOracleSql)),

    // Perceptual image hashes ([[Multimodal.imageHashes]]): aHash +
    // dHash over deterministic 16×16 gray fixtures whose pixel values
    // follow integer formulas, so the oracle re-derives BOTH 64-bit
    // hashes from the construction in pure integer SQL (NN sampling
    // arithmetic, integer mean threshold, strict gradient compare —
    // assembled as hi/lo 32-bit halves to dodge the 1<<63 overflow,
    // printed as 16-hex-char strings). The garbage payload takes the
    // ok=false path. Decode itself is gated by q_mm_decode; this
    // gates the hash arithmetic END of the image-dedup pipeline.
    QueryDef("q_mm_phash",
      (s, _) => {
        def png(f: (Int, Int) => Int): Array[Byte] = {
          val img = new java.awt.image.BufferedImage(16, 16,
            java.awt.image.BufferedImage.TYPE_INT_RGB)
          for (y <- 0 until 16; x <- 0 until 16) {
            val v = f(x, y)
            img.setRGB(x, y, (v << 16) | (v << 8) | v)
          }
          val bos = new java.io.ByteArrayOutputStream()
          javax.imageio.ImageIO.write(img, "png", bos)
          bos.toByteArray
        }
        import s.implicits._
        val payloads: Seq[(Long, Array[Byte])] = Seq(
          1L -> png((x, _) => x * 16),
          2L -> png((_, y) => y * 16),
          3L -> png((_, _) => 128),
          4L -> png((x, y) => ((x / 4 + y / 4) % 2) * 255),
          5L -> "not an image at all".getBytes("UTF-8"))
        Multimodal.imageHashes(s, payloads.toDF("media_id", "payload"))
          .toDF()
          .select(col("media_id"), col("ok"),
            lpad(lower(hex(col("ahash"))), 16, "0").as("ahash_hex"),
            lpad(lower(hex(col("dhash"))), 16, "0").as("dhash_hex"))
          .orderBy("media_id")
      },
      Some("""WITH px AS (
             |  SELECT CAST(m.id AS BIGINT) AS media_id, x, y,
             |    CASE m.id WHEN 1 THEN x*16 WHEN 2 THEN y*16 WHEN 3 THEN 128
             |         ELSE ((x//4 + y//4) % 2) * 255 END AS v
             |  FROM (VALUES (1), (2), (3), (4)) m(id),
             |       range(0, 16) rx(x), range(0, 16) ry(y)),
             |g8 AS (
             |  SELECT media_id, gy, gx, v FROM px
             |  JOIN (SELECT gx, gy, (gx*16)//8 AS sx, (gy*16)//8 AS sy
             |        FROM range(0, 8) a(gx), range(0, 8) b(gy)) s
             |    ON px.x = s.sx AND px.y = s.sy),
             |asum AS (SELECT media_id, CAST(sum(v) AS BIGINT) AS s FROM g8 GROUP BY 1),
             |ah AS (
             |  SELECT g8.media_id,
             |    CAST(sum(CASE WHEN v*64 >= s AND gy*8+gx >= 32
             |             THEN (1::BIGINT << CAST(gy*8+gx-32 AS INT)) ELSE 0 END) AS BIGINT) AS hi,
             |    CAST(sum(CASE WHEN v*64 >= s AND gy*8+gx < 32
             |             THEN (1::BIGINT << CAST(gy*8+gx AS INT)) ELSE 0 END) AS BIGINT) AS lo
             |  FROM g8 JOIN asum USING (media_id) GROUP BY 1),
             |g9 AS (
             |  SELECT media_id, gy, gx, v FROM px
             |  JOIN (SELECT gx, gy, (gx*16)//9 AS sx, (gy*16)//8 AS sy
             |        FROM range(0, 9) a(gx), range(0, 8) b(gy)) s
             |    ON px.x = s.sx AND px.y = s.sy),
             |dh AS (
             |  SELECT a.media_id,
             |    CAST(sum(CASE WHEN b.v > a.v AND a.gy*8+a.gx >= 32
             |             THEN (1::BIGINT << CAST(a.gy*8+a.gx-32 AS INT)) ELSE 0 END) AS BIGINT) AS hi,
             |    CAST(sum(CASE WHEN b.v > a.v AND a.gy*8+a.gx < 32
             |             THEN (1::BIGINT << CAST(a.gy*8+a.gx AS INT)) ELSE 0 END) AS BIGINT) AS lo
             |  FROM g9 a JOIN g9 b ON a.media_id = b.media_id AND a.gy = b.gy
             |   AND b.gx = a.gx + 1
             |  WHERE a.gx < 8 GROUP BY 1)
             |SELECT ah.media_id, true AS ok,
             |  printf('%08x%08x', ah.hi, ah.lo) AS ahash_hex,
             |  printf('%08x%08x', dh.hi, dh.lo) AS dhash_hex
             |FROM ah JOIN dh USING (media_id)
             |UNION ALL
             |SELECT CAST(5 AS BIGINT), false,
             |  '0000000000000000', '0000000000000000'
             |ORDER BY media_id""".stripMargin)),

    // Multimodal frame sampling: every 4th 256-char block of "video"
    // media — the sampling arithmetic, per-modality filter and block
    // slicing are value-checked in DuckDB (only codec decode is the
    // stand-in)
    QueryDef("q_mm_frames",
      (s, d) => {
        val media = Multimodal.mediaFromDocuments(t(s, d, "documents"))
          .filter(col("modality") === "video")
        val sampled = Multimodal.sampleFrames(col("text_content"), 256, 4)
        media.join(t(s, d, "documents").select(col("doc_id"), col("text").as("text_content")),
            col("media_id") === col("doc_id"))
          .select(col("media_id"),
            ceil(length(col("text_content")).cast("double") / 256).cast("long").as("n_frames"),
            size(sampled).cast("long").as("n_sampled"),
            md5(concat_ws("", sampled)).as("sample_md5"))
          .orderBy("media_id")
      },
      Some("""SELECT media_id, nf AS n_frames,
             |  CAST(len(sampled) AS BIGINT) AS n_sampled,
             |  md5(array_to_string(sampled, '')) AS sample_md5
             |FROM (
             |  SELECT media_id, nf,
             |    list_transform(
             |      list_filter(range(0, greatest(nf, 1)), i -> i % 4 = 0 AND i < nf),
             |      i -> substr(text, (i * 256 + 1)::INT, 256)) AS sampled
             |  FROM (
             |    SELECT doc_id AS media_id, text,
             |      CAST(ceil(length(text) / 256.0::DOUBLE) AS BIGINT) AS nf
             |    FROM documents WHERE doc_id % 3 = 2))
             |ORDER BY media_id""".stripMargin)),

    // REAL codec decode through the JDK's own ImageIO / AudioSystem
    // inside mapPartitions: solid-color PNGs decode to their exact
    // fill means (lossless sRGB round-trip), alternating-sign square
    // WAVs to their exact amplitude and n-1 zero crossings, and a
    // garbage payload reports unsupported — all closed-form, so the
    // oracle is a VALUES table. Fixture synthesis is bounded and
    // driver-side (8 payloads), the q_src_csv contract.
    QueryDef("q_mm_decode",
      (s, _) => {
        import s.implicits._
        val payloads: Seq[(Long, Array[Byte])] =
          (1 to 4).map { i =>
            val img = new java.awt.image.BufferedImage(16 * i, 9 * i,
              java.awt.image.BufferedImage.TYPE_INT_RGB)
            val g = img.createGraphics()
            g.setColor(new java.awt.Color(30 * i, 20 * i, 5 * i))
            g.fillRect(0, 0, 16 * i, 9 * i); g.dispose()
            val bos = new java.io.ByteArrayOutputStream()
            javax.imageio.ImageIO.write(img, "png", bos)
            (i.toLong, bos.toByteArray)
          } ++ (5 to 7).map { i =>
            val a = 1000 * (i - 4); val n = 800
            val pcm = new Array[Byte](n * 2)
            var j = 0
            while (j < n) {
              val v = if (j % 2 == 0) a else -a
              pcm(2 * j) = (v & 0xff).toByte; pcm(2 * j + 1) = ((v >> 8) & 0xff).toByte
              j += 1
            }
            val fmt = new javax.sound.sampled.AudioFormat(8000f * (i - 4), 16, 1, true, false)
            val ais = new javax.sound.sampled.AudioInputStream(
              new java.io.ByteArrayInputStream(pcm), fmt, n.toLong)
            val bos = new java.io.ByteArrayOutputStream()
            javax.sound.sampled.AudioSystem.write(ais,
              javax.sound.sampled.AudioFileFormat.Type.WAVE, bos)
            (i.toLong, bos.toByteArray)
          } :+ (8L -> "definitely not media".getBytes("UTF-8"))
        val media = payloads.toDF("media_id", "payload")
        Multimodal.decodeMedia(s, media).toDF().orderBy("media_id")
      },
      Some("""SELECT * FROM (VALUES
             |  (CAST(1 AS BIGINT), 'image', true, 16, 9, 3, 30.0, 20.0, 5.0),
             |  (CAST(2 AS BIGINT), 'image', true, 32, 18, 3, 60.0, 40.0, 10.0),
             |  (CAST(3 AS BIGINT), 'image', true, 48, 27, 3, 90.0, 60.0, 15.0),
             |  (CAST(4 AS BIGINT), 'image', true, 64, 36, 3, 120.0, 80.0, 20.0),
             |  (CAST(5 AS BIGINT), 'audio', true, 0, 0, 1, 8000.0, 1000.0, 799.0),
             |  (CAST(6 AS BIGINT), 'audio', true, 0, 0, 1, 16000.0, 2000.0, 799.0),
             |  (CAST(7 AS BIGINT), 'audio', true, 0, 0, 1, 24000.0, 3000.0, 799.0),
             |  (CAST(8 AS BIGINT), 'unsupported', false, 0, 0, 0, 0.0, 0.0, 0.0))
             |t(media_id, kind, ok, width, height, channels, m0, m1, m2)
             |ORDER BY media_id""".stripMargin),
      bench = true),

    // REAL video decode: MJPEG-in-AVI — the RIFF chunk walk finds the
    // 'movi' frames, each a complete JPEG the JDK codec decodes
    // (Multimodal.decodeVideoFrames / decodeOne's video path). Gray
    // fixtures make the lossy codec exact (VideoSpec pins this), so
    // per-frame means are closed-form and the oracle is a VALUES
    // table. Per-frame rows join the clip summary (kind, ok, frame
    // count) so BOTH decode paths are gate-checked; the non-AVI
    // payload flows through as unsupported/-1, nothing silently
    // dropped.
    QueryDef("q_mm_video",
      (s, _) => {
        import s.implicits._
        val avis: Seq[(Long, Array[Byte])] = Seq(
          1L -> Multimodal.aviMjpeg(
            (1 to 3).map(i => Multimodal.grayJpeg(32, 18, 40 * i)), 32, 18, fps = 10),
          2L -> Multimodal.aviMjpeg(
            (1 to 4).map(i => Multimodal.grayJpeg(16, 9, 50 * i)), 16, 9),
          3L -> "definitely not a video".getBytes("UTF-8"))
        val media = avis.toDF("media_id", "payload")
        val frames = Multimodal.decodeVideoFrames(s, media).toDF()
        val summary = Multimodal.decodeMedia(s, media).toDF()
          .select(col("media_id").as("sid"), col("kind"),
            col("ok").as("clip_ok"), col("channels").as("n_frames"))
        frames.join(summary, frames("media_id") === col("sid"))
          .select(col("media_id"), col("kind"), col("clip_ok"), col("n_frames"),
            col("frame_idx"), col("ok").as("frame_ok"),
            col("width"), col("height"), col("m0"), col("m1"), col("m2"))
          .orderBy("media_id", "frame_idx")
      },
      Some("""SELECT * FROM (VALUES
             |  (CAST(1 AS BIGINT), 'video', true, 3, 0, true, 32, 18, 40.0, 40.0, 40.0),
             |  (CAST(1 AS BIGINT), 'video', true, 3, 1, true, 32, 18, 80.0, 80.0, 80.0),
             |  (CAST(1 AS BIGINT), 'video', true, 3, 2, true, 32, 18, 120.0, 120.0, 120.0),
             |  (CAST(2 AS BIGINT), 'video', true, 4, 0, true, 16, 9, 50.0, 50.0, 50.0),
             |  (CAST(2 AS BIGINT), 'video', true, 4, 1, true, 16, 9, 100.0, 100.0, 100.0),
             |  (CAST(2 AS BIGINT), 'video', true, 4, 2, true, 16, 9, 150.0, 150.0, 150.0),
             |  (CAST(2 AS BIGINT), 'video', true, 4, 3, true, 16, 9, 200.0, 200.0, 200.0),
             |  (CAST(3 AS BIGINT), 'unsupported', false, 0, -1, false, 0, 0, 0.0, 0.0, 0.0))
             |t(media_id, kind, clip_ok, n_frames, frame_idx, frame_ok, width, height, m0, m1, m2)
             |ORDER BY media_id, frame_idx""".stripMargin),
      bench = true),

    // REAL resize (decode → nearest-neighbor rescale → PNG re-encode)
    // chained into REAL decode: solid fills survive any resampling
    // exactly, so the resized payloads' decoded features are still
    // closed-form — dims become the 24x24 target, fill means are
    // unchanged, and the non-image payload reports ok=false.
    QueryDef("q_mm_resize",
      (s, _) => {
        import s.implicits._
        val payloads: Seq[(Long, Array[Byte])] =
          (1 to 3).map { i =>
            val img = new java.awt.image.BufferedImage(16 * i, 9 * i,
              java.awt.image.BufferedImage.TYPE_INT_RGB)
            val g = img.createGraphics()
            g.setColor(new java.awt.Color(40 * i, 25 * i, 10 * i))
            g.fillRect(0, 0, 16 * i, 9 * i); g.dispose()
            val bos = new java.io.ByteArrayOutputStream()
            javax.imageio.ImageIO.write(img, "png", bos)
            (i.toLong, bos.toByteArray)
          } :+ (4L -> "not an image".getBytes("UTF-8"))
        val resized = Multimodal.resizeImages(s, payloads.toDF("media_id", "payload"),
          width = 24, height = 24)
        Multimodal.decodeMedia(s,
            resized.toDF().withColumnRenamed("ok", "resize_ok"))
          .toDF()
          .select(col("media_id"), col("kind"), col("width"), col("height"),
            col("m0"), col("m1"), col("m2"))
          .orderBy("media_id")
      },
      Some("""SELECT * FROM (VALUES
             |  (CAST(1 AS BIGINT), 'image', 24, 24, 40.0, 25.0, 10.0),
             |  (CAST(2 AS BIGINT), 'image', 24, 24, 80.0, 50.0, 20.0),
             |  (CAST(3 AS BIGINT), 'image', 24, 24, 120.0, 75.0, 30.0),
             |  (CAST(4 AS BIGINT), 'unsupported', 0, 0, 0.0, 0.0, 0.0))
             |t(media_id, kind, width, height, m0, m1, m2)
             |ORDER BY media_id""".stripMargin)),

    // Multimodal feature extraction through mapPartitions (stub
    // decode, deterministic checksum). The checksum is the 31-poly
    // rolling hash of the payload BYTES mod 1e9+7; the corpus is
    // ASCII so it coincides with the code-point rolling hash the
    // oracle computes — a full value check of the mapPartitions
    // plumbing (row→case-class→iterator→row round trip included).
    QueryDef("q_mm_features",
      (s, d) => Multimodal.extractFeatures(s,
        Multimodal.mediaFromDocuments(t(s, d, "documents")))
        .toDF()
        .select(col("media_id"), col("modality"),
          col("n_bytes").cast("long").as("n_bytes"), col("checksum"))
        .orderBy("media_id"),
      Some("""SELECT doc_id AS media_id,
             |  CASE WHEN doc_id % 3 = 0 THEN 'image'
             |       WHEN doc_id % 3 = 1 THEN 'audio'
             |       ELSE 'video' END AS modality,
             |  octet_length(encode(text)) AS n_bytes,
             |  list_reduce(list_prepend(0::BIGINT, list_transform(range(1, length(text) + 1),
             |                           i -> unicode(substr(text, i, 1))::BIGINT)),
             |              (h, c) -> (h * 31 + c) % 1000000007) AS checksum
             |FROM documents ORDER BY media_id""".stripMargin)),

    // Multimodal declared-vs-parsed metadata validation: payloads
    // carry REAL container headers (spec-conformant PNG IHDR + CRC,
    // canonical RIFF/WAVE fmt), the parse reads dimensions / channel
    // layout back from the BYTES (big/little-endian field extraction
    // + CRC-32 recheck, all codegen'd built-ins), and a deliberately
    // corrupted declared-metadata subset (media_id % 50 = 0: width+1
    // for images, 22050 Hz for audio) must surface as 'mismatch'.
    // The oracle derives the expected parse from the fixture formulas
    // INDEPENDENTLY of the byte plumbing, so a construction/parse bug
    // that round-trips internally still hash-fails the gate.
    // MediaHeaderSpec additionally proves the parsers against
    // payloads written by the JDK's own PNG/WAVE encoders.
    QueryDef("q_mm_validate",
      (s, d) => {
        val media = Multimodal.mediaWithHeaders(t(s, d, "documents"))
        val corrupt = pmod(col("media_id"), lit(50)) === 0
        val declW = (col("width") + when(corrupt, 1).otherwise(0)).cast("long")
        val declSr = when(corrupt, 22050L).otherwise(col("sample_rate").cast("long"))
        val pw = Multimodal.pngWidth(col("payload"))
        val ph = Multimodal.pngHeight(col("payload"))
        val wc = Multimodal.wavChannels(col("payload"))
        val wsr = Multimodal.wavSampleRate(col("payload"))
        media.select(col("media_id"), col("modality"),
          pw.as("parsed_w"), ph.as("parsed_h"),
          wc.as("parsed_channels"), wsr.as("parsed_sr"),
          when(col("modality") === "image",
            when(pw.isNull || ph.isNull, "corrupt")
              .when(pw === declW && ph === col("height").cast("long"), "ok")
              .otherwise("mismatch"))
            .when(col("modality") === "audio",
              when(wc.isNull || wsr.isNull, "corrupt")
                .when(wc === col("channels").cast("long") && wsr === declSr, "ok")
                .otherwise("mismatch"))
            .otherwise("unparsed").as("status"))
          .orderBy("media_id")
      },
      Some("""SELECT doc_id AS media_id,
             |  CASE WHEN doc_id % 3 = 0 THEN 'image'
             |       WHEN doc_id % 3 = 1 THEN 'audio' ELSE 'video' END AS modality,
             |  CASE WHEN doc_id % 3 = 0 THEN (doc_id % 16) * 64 + 256 END AS parsed_w,
             |  CASE WHEN doc_id % 3 = 0 THEN (doc_id % 9) * 64 + 256 END AS parsed_h,
             |  CASE WHEN doc_id % 3 = 1 THEN doc_id % 2 + 1 END AS parsed_channels,
             |  CASE WHEN doc_id % 3 = 1 THEN CAST(16000 AS BIGINT) END AS parsed_sr,
             |  CASE WHEN doc_id % 3 = 2 THEN 'unparsed'
             |       WHEN doc_id % 50 = 0 THEN 'mismatch'
             |       ELSE 'ok' END AS status
             |FROM documents ORDER BY media_id""".stripMargin)),

    // JPEG SOF dimension parsing — the third container of the header
    // trio (PNG fixed-offset IHDR, WAVE fmt chunk, and now JPEG's
    // variable-prefix segment walk). Payloads are conformant JPEG
    // header prefixes (SOI + APP0 + DQT + SOF0, or SOF2 for the
    // doc_id%7 progressive subset); a doc_id%11 subset is not a JPEG
    // at all (parse must null → 'corrupt'), and the doc_id%50
    // declared-width corruption must surface as 'mismatch'. The
    // oracle derives every parsed value from the fixture formulas
    // independently of the byte plumbing; MediaHeaderSpec proves the
    // walk against real ImageIO JPEG bytes.
    QueryDef("q_mm_jpeg",
      (s, d) => {
        val docs = t(s, d, "documents")
        val w = (pmod(col("doc_id"), lit(16)) * 64 + 256).cast("int")
        val h = (pmod(col("doc_id"), lit(9)) * 64 + 256).cast("int")
        val progressive = pmod(col("doc_id"), lit(7)) === 0
        val body = encode(col("text"), "UTF-8")
        val media = docs.select(col("doc_id").as("media_id"),
          when(pmod(col("doc_id"), lit(11)) === 0, body)
            .otherwise(Multimodal.jpegPayload(w, h, body, progressive))
            .as("payload"),
          w.as("width"), h.as("height"))
        val corrupt = pmod(col("media_id"), lit(50)) === 0
        val declW = (col("width") + when(corrupt, 1).otherwise(0)).cast("long")
        val jw = Multimodal.jpegWidth(col("payload"))
        val jh = Multimodal.jpegHeight(col("payload"))
        media.select(col("media_id"),
          jw.as("parsed_w"), jh.as("parsed_h"),
          Multimodal.jpegProgressive(col("payload")).as("progressive"),
          when(jw.isNull || jh.isNull, "corrupt")
            .when(jw === declW && jh === col("height").cast("long"), "ok")
            .otherwise("mismatch").as("status"))
          .orderBy("media_id")
      },
      Some("""SELECT doc_id AS media_id,
             |  CASE WHEN doc_id % 11 <> 0 THEN (doc_id % 16) * 64 + 256 END AS parsed_w,
             |  CASE WHEN doc_id % 11 <> 0 THEN (doc_id % 9) * 64 + 256 END AS parsed_h,
             |  CASE WHEN doc_id % 11 <> 0 THEN doc_id % 7 = 0 END AS progressive,
             |  CASE WHEN doc_id % 11 = 0 THEN 'corrupt'
             |       WHEN doc_id % 50 = 0 THEN 'mismatch'
             |       ELSE 'ok' END AS status
             |FROM documents ORDER BY media_id""".stripMargin)),

    // MP4/ISO-BMFF box walk — the FOURTH container (PNG fixed-offset,
    // WAVE chunk scan, JPEG segment walk, now nested length-prefixed
    // boxes): ftyp check, moov→mvhd descent, timescale/duration
    // parse, integer-ms derivation. doc_id%11 payloads are not MP4
    // (→ 'corrupt'); the doc_id%50 declared-duration corruption must
    // surface as 'mismatch'. The oracle re-derives every parsed
    // value from the fixture formulas independently of the byte
    // plumbing; MediaHeaderSpec proves the walk against bytes built
    // from the ISO 14496-12 layout by hand.
    QueryDef("q_mm_mp4",
      (s, d) => {
        val docs = t(s, d, "documents")
        val timescale = (pmod(col("doc_id"), lit(5)) * 2500L + 1000L)
        val ticks = (pmod(col("doc_id"), lit(1000)) + 1L) * 37L
        val body = encode(col("text"), "UTF-8")
        val media = docs.select(col("doc_id").as("media_id"),
          when(pmod(col("doc_id"), lit(11)) === 0, body)
            .otherwise(Multimodal.mp4Payload(timescale, ticks, body))
            .as("payload"),
          timescale.as("decl_timescale"), ticks.as("decl_ticks"))
        val corrupt = pmod(col("media_id"), lit(50)) === 0
        val declTicks = col("decl_ticks") + when(corrupt, 1L).otherwise(0L)
        val ts = Multimodal.mp4Timescale(col("payload"))
        val dur = Multimodal.mp4Duration(col("payload"))
        media.select(col("media_id"),
          ts.as("parsed_timescale"), dur.as("parsed_ticks"),
          Multimodal.mp4DurationMs(col("payload")).as("parsed_ms"),
          when(ts.isNull || dur.isNull, "corrupt")
            .when(ts === col("decl_timescale") && dur === declTicks, "ok")
            .otherwise("mismatch").as("status"))
          .orderBy("media_id")
      },
      Some("""SELECT doc_id AS media_id,
             |  CASE WHEN doc_id % 11 <> 0 THEN (doc_id % 5) * 2500 + 1000 END AS parsed_timescale,
             |  CASE WHEN doc_id % 11 <> 0 THEN (doc_id % 1000 + 1) * 37 END AS parsed_ticks,
             |  CASE WHEN doc_id % 11 <> 0
             |       THEN ((doc_id % 1000 + 1) * 37 * 1000) // ((doc_id % 5) * 2500 + 1000) END AS parsed_ms,
             |  CASE WHEN doc_id % 11 = 0 THEN 'corrupt'
             |       WHEN doc_id % 50 = 0 THEN 'mismatch'
             |       ELSE 'ok' END AS status
             |FROM documents ORDER BY media_id""".stripMargin)),

    // AVI/RIFF chunk walk — the FIFTH container (little-endian
    // chunks, LIST hdrl → avih descent): frame count / per-frame µs /
    // dimensions parsed back from the bytes. doc_id%11 payloads are
    // not AVI (→ 'corrupt'); the doc_id%50 declared-frame-count
    // corruption must surface as 'mismatch'. Oracle re-derives every
    // parsed value from the fixture formulas independently of the
    // byte plumbing; VideoSpec additionally proves the column parser
    // against files written by the JVM-side aviMjpeg writer (which
    // the REAL q_mm_video decode consumes).
    QueryDef("q_mm_avi",
      (s, d) => {
        val docs = t(s, d, "documents")
        val w = (pmod(col("doc_id"), lit(16)) * 64 + 256)
        val h = (pmod(col("doc_id"), lit(9)) * 64 + 256)
        val nf = (pmod(col("doc_id"), lit(500)) + 1L)
        val body = encode(col("text"), "UTF-8")
        val media = docs.select(col("doc_id").as("media_id"),
          when(pmod(col("doc_id"), lit(11)) === 0, body)
            .otherwise(Multimodal.aviPayload(w, h, nf, body))
            .as("payload"),
          w.cast("long").as("decl_w"), nf.as("decl_frames"))
        val corrupt = pmod(col("media_id"), lit(50)) === 0
        val declFrames = col("decl_frames") + when(corrupt, 1L).otherwise(0L)
        // ONE chunk walk per row: materialize the aviInfo struct in
        // its own projection, then read fields as cheap attributes
        val parsed = media.withColumn("__i", Multimodal.aviInfo(col("payload")))
        val pw = col("__i.w"); val pf = col("__i.frames")
        parsed.select(col("media_id"),
          pw.as("parsed_w"), col("__i.h").as("parsed_h"), pf.as("parsed_frames"),
          col("__i.uspf").as("parsed_uspf"),
          when(pw.isNull || pf.isNull, "corrupt")
            .when(pw === col("decl_w") && pf === declFrames, "ok")
            .otherwise("mismatch").as("status"))
          .orderBy("media_id")
      },
      Some("""SELECT doc_id AS media_id,
             |  CASE WHEN doc_id % 11 <> 0 THEN (doc_id % 16) * 64 + 256 END AS parsed_w,
             |  CASE WHEN doc_id % 11 <> 0 THEN (doc_id % 9) * 64 + 256 END AS parsed_h,
             |  CASE WHEN doc_id % 11 <> 0 THEN doc_id % 500 + 1 END AS parsed_frames,
             |  CASE WHEN doc_id % 11 <> 0 THEN 40000 END AS parsed_uspf,
             |  CASE WHEN doc_id % 11 = 0 THEN 'corrupt'
             |       WHEN doc_id % 50 = 0 THEN 'mismatch'
             |       ELSE 'ok' END AS status
             |FROM documents ORDER BY media_id""".stripMargin)),

    // Multimodal: binary payload + metadata plumbing (decode stubbed)
    QueryDef("q_mm_meta",
      (s, d) => Multimodal.mediaFromDocuments(t(s, d, "documents"))
        .select(col("media_id"), col("modality"),
          octet_length(col("payload")).cast("long").as("n_bytes"),
          sha2(col("payload"), 256).as("sha"))
        .orderBy("media_id"),
      Some("""SELECT doc_id AS media_id,
             |  CASE WHEN doc_id % 3 = 0 THEN 'image'
             |       WHEN doc_id % 3 = 1 THEN 'audio'
             |       ELSE 'video' END AS modality,
             |  octet_length(encode(text)) AS n_bytes,
             |  sha256(text) AS sha
             |FROM documents ORDER BY media_id""".stripMargin)),
  )
}
