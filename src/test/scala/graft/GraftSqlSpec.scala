package graft

import graft.ext.Layout
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** The GRAFT SQL command dialect ([[graft.plans.GraftSqlParser]],
  * installed by [[GraftExtensions]] `injectParser`): a SQL-only
  * session must manage a layout's lifecycle end to end — history,
  * detail, optimize, restore, vacuum — with every statement a thin
  * shell over the Scala verb, standard SQL delegating untouched, and
  * unknown GRAFT statements refused with the dialect spelled out. */
class GraftSqlSpec extends AnyFunSuite with SharedSpark {
  import spark.implicits._

  test("GRAFT SQL statements drive the lifecycle verbs end to end") {
    withTempDir("graft_sql_") { dir =>
      val d = s"$dir/t"
      (0L to 99L).map(k => (k, k % 5, k)).toDF("k", "g", "v")
        .repartitionByRange(4, col("k")).sortWithinPartitions("k")
        .write.parquet(d)
      Layout.buildFileManifest(spark, d, Seq("k"))
        .write.mode("overwrite").parquet(s"$d/_graft_manifest")
      Layout.enableGenerations(spark, d)
      Layout.deleteWhere(spark, d, Seq(Layout.KeyBox("k", 0L, 19L)))
      // a session WITH the extensions, over the same SparkContext —
      // getOrCreate only applies extensions to a NEW session, so the
      // suite's shared default steps aside for the duration
      val prevDefault = SparkSession.getDefaultSession
      val prevActive = SparkSession.getActiveSession
      SparkSession.clearDefaultSession()
      SparkSession.clearActiveSession()
      val sqlS = GraftSession.tuned(
        SparkSession.builder().master("local[8]")
          .withExtensions(new GraftExtensions),
        shufflePartitions = 8).getOrCreate()
      try {
        // DESCRIBE HISTORY: the verb's own frame, via pure SQL
        val hist = sqlS.sql(s"GRAFT DESCRIBE HISTORY '$d'")
        assert(hist.columns.contains("operation"))
        assert(hist.select("gen", "operation").collect()
          .map(r => (r.getLong(0), r.getString(1))).toSeq ===
          Seq((1L, "deleteWhere")))
        // DESCRIBE DETAIL
        val det = sqlS.sql(s"GRAFT DESCRIBE DETAIL '$d'").collect()(0)
        assert(det.getAs[Boolean]("generations_enabled"))
        assert(det.getAs[Long]("n_rows") === 80L)
        // RESTORE VERSION AS OF: the undo verb, committed as gen 2
        val rest = sqlS.sql(s"GRAFT RESTORE '$d' VERSION AS OF 0")
          .collect()(0)
        assert(rest.getAs[Boolean]("committed"))
        assert(spark.read.parquet(d).count() === 100L)
        assert(Layout.currentGeneration(spark, d) === 2L)
        // OPTIMIZE: selective — nothing deep yet, a declined no-op…
        val noop = sqlS.sql(s"GRAFT OPTIMIZE '$d' TARGET 100000 ROWS")
          .collect()(0)
        assert(!noop.getAs[Boolean]("reclustered"))
        // …then 4 stacked appends over one band make it fire, and the
        // kept files stay verbatim (the file-subset contract)
        val churn = (0L to 20L).map(k => (k, k % 5, k)).toDF("k", "g", "v")
          .repartition(1)
        for (_ <- 1 to 4) Layout.appendWithManifest(churn, d, Seq("k"))
        val fired = sqlS.sql(s"GRAFT OPTIMIZE '$d' TARGET 100000 ROWS")
          .collect()(0)
        assert(fired.getAs[Boolean]("reclustered") &&
          fired.getAs[Int]("files_kept") > 0)
        assert(spark.read.parquet(d).count() === 184L)
        // VACUUM refuses below a registered pin, by consumer name;
        // FORCE is the explicit override — and SHOW PINS surfaces
        // what would block, before anyone trips on it
        Layout.registerSnapshotPin(spark, d, "nightly-report", 1L)
        val pins = sqlS.sql(s"GRAFT SHOW PINS '$d'").collect()
        assert(pins.length === 1 &&
          pins(0).getString(0) === "nightly-report" &&
          pins(0).getLong(1) === 1L)
        val blocked = intercept[Exception] {
          sqlS.sql(s"GRAFT VACUUM '$d' RETAIN 1")
        }
        assert(blocked.getMessage.contains("nightly-report"))
        val vac = sqlS.sql(s"GRAFT VACUUM '$d' RETAIN 1 FORCE").collect()(0)
        assert(vac.getAs[Int]("manifests_dropped") >= 3)
        // an unknown GRAFT statement fails with the dialect, never a
        // generic syntax error
        val bad = intercept[Exception] {
          sqlS.sql(s"GRAFT FROBNICATE '$d'")
        }
        assert(bad.getMessage.contains("supported forms"))
        // standard SQL delegates verbatim — the extension shadows
        // nothing
        assert(sqlS.sql("SELECT 1 + 1 AS v").collect()(0).getInt(0) === 2)
        // and the injected native functions are SQL-reachable in the
        // same session (the other half of GraftExtensions)
        assert(sqlS.sql("SELECT ws_token_count('a b  c') AS n")
          .collect()(0).getInt(0) === 3)
        // ── the WRITE statements: CTAS → APPEND → UPSERT → DELETE ──
        val d2 = s"$dir/t2"
        // CTAS: the AS-tail is arbitrary Spark SQL (here: a range)
        val created = sqlS.sql(
          s"GRAFT CREATE '$d2' KEYS (id) GENERATIONS AS " +
            "SELECT id, id % 3 AS g, id * 10 AS v FROM range(0, 50)")
          .collect()(0)
        assert(created.getAs[Long]("rows") === 50L)
        assert(Layout.currentGeneration(spark, d2) === 0L)
        // CTAS refuses to land on an existing directory
        val taken = intercept[Exception] {
          sqlS.sql(s"GRAFT CREATE '$d2' KEYS (id) AS SELECT 1 AS id")
        }
        assert(taken.getMessage.contains("refuses to overwrite"))
        // APPEND follows the layout's STORED keys (never re-stated)
        val app = sqlS.sql(s"GRAFT APPEND INTO '$d2' AS " +
          "SELECT id + 100 AS id, id % 3 AS g, id AS v FROM range(0, 10)")
          .collect()(0)
        assert(app.getAs[Long]("rows_appended") === 10L)
        assert(spark.read.parquet(d2).count() === 60L)
        // UPSERT: delete-and-insert by key through plain SQL
        val ups = sqlS.sql(s"GRAFT UPSERT INTO '$d2' KEYS (id) AS " +
          "SELECT id, CAST(9 AS BIGINT) AS g, CAST(999 AS BIGINT) AS v " +
          "FROM range(5, 8)").collect()(0)
        assert(ups.getAs[Long]("rows_upserted") === 3L &&
          ups.getAs[Long]("rows_replaced") === 3L)
        assert(spark.read.parquet(d2)
          .filter(col("id") === 6L).select("v").as[Long].head() === 999L)
        // DELETE with a numeric key box — manifest-proved drops
        val del = sqlS.sql(
          s"GRAFT DELETE FROM '$d2' WHERE id BETWEEN 100 AND 200")
          .collect()(0)
        assert(del.getAs[Long]("rows_deleted") === 10L)
        assert(spark.read.parquet(d2).count() === 50L)
        // the whole SQL-driven lifecycle is generation-tracked: the
        // pre-append snapshot still reads
        assert(spark.read.format("graft").option("versionAsOf", "0")
          .load(d2).count() === 50L)
        assert(sqlS.sql(s"GRAFT DESCRIBE HISTORY '$d2'").count() === 3L)
        // DELETE … USING VECTORS: the same statement shape dispatches
        // merge-on-read — files keep their names, positions recorded
        val beforeDv = spark.read.parquet(d2).inputFiles.toSet
        val dv = sqlS.sql(
          s"GRAFT DELETE FROM '$d2' WHERE id BETWEEN 5 AND 7 USING VECTORS")
          .collect()(0)
        assert(dv.getAs[Long]("rows_deleted") === 3L)
        // merge-on-read: covered files may still DROP whole (here the
        // upsert's single-key insert files), but nothing REWRITES —
        // every surviving file keeps its exact name
        assert(spark.read.parquet(d2).inputFiles.toSet.subsetOf(beforeDv),
          "USING VECTORS must not rewrite files")
        assert(Layout.readLayout(spark, d2).count() === 47L)
        // APPEND … MERGE SCHEMA: ADD COLUMN evolution through SQL —
        // refused without the flag, sidecar-committed with it (and it
        // composes with the vectorized layout: old rows surface null
        // for the new column, deleted rows stay deleted)
        val evoSelect = "SELECT CAST(900 AS BIGINT) AS id, " +
          "CAST(1 AS BIGINT) AS g, CAST(1 AS BIGINT) AS v, 'x' AS tag"
        val noEvo = intercept[Exception] {
          sqlS.sql(s"GRAFT APPEND INTO '$d2' AS $evoSelect").collect()
        }
        assert(noEvo.getMessage.contains("tag"))
        sqlS.sql(s"GRAFT APPEND INTO '$d2' MERGE SCHEMA AS $evoSelect")
          .collect()
        val evolved = Layout.readLayout(spark, d2)
        assert(evolved.count() === 48L)
        assert(evolved.filter(col("tag").isNull).count() === 47L)
      } finally {
        SparkSession.clearDefaultSession()
        SparkSession.clearActiveSession()
        prevDefault.foreach(SparkSession.setDefaultSession)
        prevActive.foreach(SparkSession.setActiveSession)
      }
    }
  }

  test("DELETE conjunctions, IN sets, DV RATIO, and the health DETAIL") {
    withTempDir("graft_sql_dml_") { dir =>
      val d = s"$dir/t"
      (0L to 999L).map(k => (k, k % 5, k)).toDF("k", "g", "v")
        .repartitionByRange(8, col("k")).sortWithinPartitions("k")
        .write.parquet(d)
      Layout.buildFileManifest(spark, d, Seq("k", "g"))
        .write.mode("overwrite").parquet(s"$d/_graft_manifest")
      Layout.enableGenerations(spark, d)
      val prevDefault = SparkSession.getDefaultSession
      val prevActive = SparkSession.getActiveSession
      SparkSession.clearDefaultSession()
      SparkSession.clearActiveSession()
      val sqlS = GraftSession.tuned(
        SparkSession.builder().master("local[8]")
          .withExtensions(new GraftExtensions),
        shufflePartitions = 8).getOrCreate()
      try {
        // IN-set delete → KeySetBox (bloom-prunable point deletes)
        val r1 = sqlS.sql(
          s"GRAFT DELETE FROM '$d' WHERE k IN (5, 17, 800)").collect()(0)
        assert(r1.getAs[Long]("rows_deleted") === 3L)
        // conjunction of two BETWEEN boxes — intersection semantics,
        // exactly Seq(KeyBox, KeyBox): k ∈ [0,99] with g = k%5 ∈
        // {1,2} is 40 keys, minus 17 (g=2) already gone
        val r2 = sqlS.sql(s"GRAFT DELETE FROM '$d' WHERE " +
          "k BETWEEN 0 AND 99 AND g BETWEEN 1 AND 2").collect()(0)
        assert(r2.getAs[Long]("rows_deleted") === 39L, s"$r2")
        // mixed conjunction with IN, vectorized — and the output
        // schema SAYS vectorized (files_vectorized, not
        // files_rewritten): {200, 201, 210} with g = 0 keeps 200, 210
        val r3 = sqlS.sql(s"GRAFT DELETE FROM '$d' WHERE " +
          "k IN (200, 201, 210) AND g BETWEEN 0 AND 0 USING VECTORS")
          .collect()(0)
        assert(r3.schema.fieldNames.contains("files_vectorized") &&
          !r3.schema.fieldNames.contains("files_rewritten"),
          s"vectorized DELETE must report files_vectorized: ${r3.schema}")
        assert(r3.getAs[Long]("rows_deleted") === 2L, s"$r3")
        // the health DETAIL row: outstanding DV tax, streams, pins,
        // constraints — one row, no data files opened
        sqlS.sql(s"GRAFT ALTER '$d' ADD CONSTRAINT v_nonneg CHECK (v >= 0)")
          .collect()
        val det = sqlS.sql(s"GRAFT DESCRIBE DETAIL '$d'").collect()(0)
        assert(det.getAs[Long]("dv_files") >= 1L)
        assert(det.getAs[Long]("dv_rows") === 2L)
        assert(det.getAs[Int]("n_constraints") === 1)
        assert(det.getAs[Int]("n_streams") === 0)
        assert(det.getAs[Int]("n_pins") === 0)
        // OPTIMIZE … DV RATIO on a clustered single-key layout (the
        // (k, g) manifest above is deep on g by construction, which
        // would trip the depth trigger instead): 0.9 leaves the tiny
        // vector in place, the bare form (ratio 0) purges it
        val d2 = s"$dir/t2"
        (0L to 999L).map(k => (k, k)).toDF("k", "v")
          .repartitionByRange(8, col("k")).sortWithinPartitions("k")
          .write.parquet(d2)
        Layout.buildFileManifest(spark, d2, Seq("k"))
          .write.mode("overwrite").parquet(s"$d2/_graft_manifest")
        sqlS.sql(s"GRAFT DELETE FROM '$d2' WHERE k IN (300, 301) " +
          "USING VECTORS").collect()
        val keep = sqlS.sql(
          s"GRAFT OPTIMIZE '$d2' TARGET 100000 ROWS DV RATIO 0.9")
          .collect()(0)
        assert(!keep.getAs[Boolean]("reclustered"),
          s"a 2-row vector is no hotspot at ratio 0.9: $keep")
        val purge = sqlS.sql(s"GRAFT OPTIMIZE '$d2' TARGET 100000 ROWS")
          .collect()(0)
        assert(purge.getAs[Boolean]("reclustered"))
        assert(sqlS.sql(s"GRAFT DESCRIBE DETAIL '$d2'").collect()(0)
          .getAs[Long]("dv_rows") === 0L)
        assert(Layout.readLayout(spark, d2).count() === 998L)
        // GRAFT UPDATE: in-place transform of the matching rows,
        // simultaneous assignment, file-subset rewrite
        val up = sqlS.sql(s"GRAFT UPDATE '$d2' SET v = v * 10 " +
          "WHERE k BETWEEN 10 AND 19").collect()(0)
        assert(up.getAs[Long]("rows_updated") === 10L, s"$up")
        assert(Layout.readLayout(spark, d2)
          .filter(col("k").between(10, 19) && col("v") === col("k") * 10)
          .count() === 10L)
        assert(Layout.readLayout(spark, d2)
          .filter(col("k") === 20L && col("v") === 20L).count() === 1L,
          "rows outside the box stay untouched")
        // refusals, by name: type change, nondeterminism, bad grammar
        val badType = intercept[IllegalArgumentException] {
          sqlS.sql(s"GRAFT UPDATE '$d2' SET v = 'x' WHERE k BETWEEN 0 AND 5")
        }
        assert(badType.getMessage.contains("type"), badType.getMessage)
        val badRand = intercept[IllegalArgumentException] {
          sqlS.sql(s"GRAFT UPDATE '$d2' SET v = rand() " +
            "WHERE k BETWEEN 0 AND 5")
        }
        assert(badRand.getMessage.contains("nondeterministic"),
          badRand.getMessage)
        val bad = intercept[IllegalArgumentException] {
          sqlS.sql(s"GRAFT DELETE FROM '$d' WHERE k LIKE 'x'")
        }
        assert(bad.getMessage.contains("BETWEEN"))
        assert(Layout.readLayout(spark, d).count() ===
          1000L - 3L - 39L - 2L)
      } finally {
        SparkSession.clearDefaultSession()
        SparkSession.clearActiveSession()
        prevDefault.foreach(SparkSession.setDefaultSession)
        prevActive.foreach(SparkSession.setActiveSession)
      }
    }
  }

  test("MERGE INTO desugars onto upsert/deleteMatching; = and typed IN prune as predicates") {
    withTempDir("graft_sql_merge_") { dir =>
      val d = s"$dir/t"
      (0L to 499L).map(k => (k, Seq("ar", "de", "en", "fr", "zh")((k % 5).toInt), k))
        .toDF("k", "lang", "v")
        .repartitionByRange(4, col("k")).sortWithinPartitions("k")
        .write.parquet(d)
      Layout.buildFileManifest(spark, d, Seq("k", "lang"))
        .write.mode("overwrite").parquet(s"$d/_graft_manifest")
      Layout.enableGenerations(spark, d)
      val prevDefault = SparkSession.getDefaultSession
      val prevActive = SparkSession.getActiveSession
      SparkSession.clearDefaultSession()
      SparkSession.clearActiveSession()
      val sqlS = GraftSession.tuned(
        SparkSession.builder().master("local[8]")
          .withExtensions(new GraftExtensions),
        shufflePartitions = 8).getOrCreate()
      try {
        // upsert arm: matched rows [10,19] replaced (v bumped), two
        // fresh keys inserted; untouched files stay byte-identical
        val st1 = sqlS.sql(s"GRAFT MERGE INTO '$d' USING (" +
          "SELECT id AS k, 'xx' AS lang, id * 100 AS v " +
          "FROM range(10, 20) UNION ALL " +
          "SELECT id AS k, 'xx' AS lang, id AS v FROM range(900, 902)" +
          ") ON (k) WHEN MATCHED THEN UPDATE WHEN NOT MATCHED THEN INSERT")
          .collect()(0)
        assert(st1.getAs[Long]("rows_upserted") === 12L, s"$st1")
        assert(st1.getAs[Long]("rows_replaced") === 10L, s"$st1")
        assert(st1.getAs[Int]("files_untouched") >= 2, s"$st1")
        assert(Layout.readLayout(spark, d).count() === 502L)
        assert(Layout.readLayout(spark, d)
          .filter(col("k").between(10, 19) && col("v") === col("k") * 100)
          .count() === 10L)
        // delete arm: a COMPOUND key match (k, lang) — only the
        // exact tuples drop, not every row of the matched k
        val st2 = sqlS.sql(s"GRAFT MERGE INTO '$d' USING (" +
          "SELECT id AS k, 'de' AS lang FROM range(0, 500)" +
          ") ON (k, lang) WHEN MATCHED THEN DELETE").collect()(0)
        // lang='de' ⇔ k%5==1 → 100 rows, minus [11,16] (now 'xx')
        assert(st2.getAs[Long]("rows_deleted") === 98L, s"$st2")
        assert(Layout.readLayout(spark, d).filter(col("lang") === "de")
          .count() === 0L)
        // deleteMatching is idempotent: nothing left to match
        val st3 = sqlS.sql(s"GRAFT MERGE INTO '$d' USING (" +
          "SELECT id AS k, 'de' AS lang FROM range(0, 500)" +
          ") ON (k, lang) WHEN MATCHED THEN DELETE").collect()(0)
        assert(st3.getAs[Long]("rows_deleted") === 0L)
        // unsupported WHEN combinations refuse with the forms named
        val badWhen = intercept[IllegalArgumentException] {
          sqlS.sql(s"GRAFT MERGE INTO '$d' USING (SELECT 1 AS k) " +
            "ON (k) WHEN NOT MATCHED THEN INSERT")
        }
        assert(badWhen.getMessage.contains("WHEN MATCHED THEN UPDATE"),
          badWhen.getMessage)
        // = and quoted IN as DELETE predicates: point lookup + typed set
        val e1 = sqlS.sql(s"GRAFT DELETE FROM '$d' WHERE k = 250")
          .collect()(0)
        assert(e1.getAs[Long]("rows_deleted") === 1L, s"$e1")
        val e2 = sqlS.sql(
          s"GRAFT DELETE FROM '$d' WHERE lang IN ('zh', 'nope')")
          .collect()(0)
        // zh ⇔ k%5==4 → 100 rows, minus 14/19 (merged to 'xx'), minus
        // 249? no — 249%5=4 and k=250 was %5==0… recount: zh keys
        // k%5==4 → 100; [10,19] rewrote 14 and 19 to 'xx' → 98
        assert(e2.getAs[Long]("rows_deleted") === 98L, s"$e2")
        // typed = on the string key
        val e3 = sqlS.sql(s"GRAFT DELETE FROM '$d' WHERE lang = 'xx'")
          .collect()(0)
        assert(e3.getAs[Long]("rows_deleted") === 12L, s"$e3")
      } finally {
        SparkSession.clearDefaultSession()
        SparkSession.clearActiveSession()
        prevDefault.foreach(SparkSession.setDefaultSession)
        prevActive.foreach(SparkSession.setActiveSession)
      }
    }
  }

  test("GRAFT REPLACE INTO: delete + insert as ONE generation through SQL") {
    withTempDir("graft_sql_repl_") { dir =>
      val d = s"$dir/t"
      (0L to 49L).map(k => (k, k)).toDF("k", "v")
        .repartitionByRange(2, col("k")).sortWithinPartitions("k")
        .write.parquet(d)
      Layout.buildFileManifest(spark, d, Seq("k"))
        .write.mode("overwrite").parquet(s"$d/_graft_manifest")
      Layout.enableGenerations(spark, d)
      // the backfill replaces band [10, 19] with TWO corrected rows
      Seq((10L, 100L), (11L, 110L)).toDF("k", "v")
        .createOrReplaceTempView("sql_repl_src")
      try {
        val row = spark.sql(s"GRAFT REPLACE INTO '$d' WHERE k " +
          "BETWEEN 10 AND 19 AS SELECT * FROM sql_repl_src").collect()(0)
        assert(row.getAs[Long]("rows_deleted") === 10L)
        assert(row.getAs[Long]("rows_inserted") === 2L)
        assert(Layout.currentGeneration(spark, d) === 1L,
          "REPLACE INTO must be one commit")
        val out = spark.read.parquet(d)
        assert(out.count() === 42L)
        assert(out.where(col("k") === 10L).select("v").as[Long]
          .head() === 100L)
        // containment refusal surfaces through the SQL shell too
        Seq((99L, 0L)).toDF("k", "v")
          .createOrReplaceTempView("sql_repl_bad")
        val e = intercept[IllegalArgumentException] {
          spark.sql(s"GRAFT REPLACE INTO '$d' WHERE k BETWEEN 10 " +
            "AND 19 AS SELECT * FROM sql_repl_bad").collect()
        }
        assert(e.getMessage.contains("OUTSIDE"))
        assert(Layout.currentGeneration(spark, d) === 1L)
      } finally {
        spark.catalog.dropTempView("sql_repl_src")
        spark.catalog.dropTempView("sql_repl_bad")
      }
    }
  }

  test("COUNT(*) over the graft reader answers from the manifest — no scan node") {
    withTempDir("graft_cnt_") { dir =>
      val d = s"$dir/t"
      (0L to 499L).map(k => (k, k % 5, k)).toDF("k", "g", "v")
        .repartitionByRange(4, col("k")).sortWithinPartitions("k")
        .write.parquet(d)
      Layout.buildFileManifest(spark, d, Seq("k"))
        .write.mode("overwrite").parquet(s"$d/_graft_manifest")
      Layout.enableGenerations(spark, d)
      Layout.deleteWhere(spark, d, Seq(Layout.KeyBox("k", 0L, 99L)))
      val prevDefault = SparkSession.getDefaultSession
      val prevActive = SparkSession.getActiveSession
      SparkSession.clearDefaultSession()
      SparkSession.clearActiveSession()
      val sqlS = GraftSession.tuned(
        SparkSession.builder().master("local[8]")
          .withExtensions(new GraftExtensions),
        shufflePartitions = 8).getOrCreate()
      try {
        // count every V2 relation form: the optimizer's scan pushdown
        // rewrites DataSourceV2Relation → DataSourceV2ScanRelation, so
        // probing only the pre-pushdown form reads 0 vacuously
        def scans(df: org.apache.spark.sql.DataFrame): Int =
          df.queryExecution.optimizedPlan.collect {
            case r: org.apache.spark.sql.execution.datasources.v2.DataSourceV2Relation => r
            case r: org.apache.spark.sql.execution.datasources.v2.DataSourceV2ScanRelation => r
          }.size
        // bare COUNT(*): rewritten to the manifest's live row count —
        // the optimized plan holds NO relation at all
        val live = sqlS.read.format("graft").load(d)
          .agg(count(lit(1)).as("n"))
        assert(scans(live) === 0, "count(*) must not plan a scan")
        assert(live.as[Long].head() === 400L)
        // time travel counts the GENERATION's manifest
        val snap = sqlS.read.format("graft").option("versionAsOf", "0")
          .load(d).agg(count(lit(1)).as("n"))
        assert(scans(snap) === 0)
        assert(snap.as[Long].head() === 500L)
        // and through plain SQL over a USING graft view
        sqlS.sql(s"CREATE OR REPLACE TEMPORARY VIEW cnt_t " +
          s"USING graft OPTIONS (path '$d')")
        val viaSql = sqlS.sql("SELECT count(*) AS n FROM cnt_t")
        assert(scans(viaSql) === 0)
        assert(viaSql.as[Long].head() === 400L)
        // a FILTER blocks the rewrite — the scan stays and the value
        // stays exact (the narrow-match contract)
        val filtered = sqlS.sql(
          "SELECT count(*) AS n FROM cnt_t WHERE k >= 300")
        assert(scans(filtered) === 1, "a filtered count must scan")
        assert(filtered.as[Long].head() === 200L)
        // count(DISTINCT) blocks too
        val distinct = sqlS.sql("SELECT count(DISTINCT g) AS n FROM cnt_t")
        assert(scans(distinct) === 1)
        assert(distinct.as[Long].head() === 5L)
      } finally {
        SparkSession.clearDefaultSession()
        SparkSession.clearActiveSession()
        prevDefault.foreach(SparkSession.setDefaultSession)
        prevActive.foreach(SparkSession.setActiveSession)
      }
    }
  }
}
