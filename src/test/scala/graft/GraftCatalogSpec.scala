package graft

import graft.ext.Layout
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Session-catalog integration for the `graft` provider:
  * `CREATE TABLE t USING graft OPTIONS (path …)` registers a layout
  * as a catalog table, after which plain `SELECT … FROM t` (no
  * TEMPORARY VIEW boilerplate) resolves through the provider —
  * manifest-covered reads, count-from-manifest, merge-on-read, and
  * the V1-fallback write all riding the same relation the DSL
  * surfaces use. The catalog's stored schema is a COPY, never the
  * authority: the layout re-resolves per query, so schema evolution
  * after CREATE serves the evolved schema. */
class GraftCatalogSpec extends AnyFunSuite with SharedSpark {
  import spark.implicits._

  private def mkTracked(dir: String): Unit = {
    (0L to 49L).map(k => (k, k % 4, k)).toDF("k", "g", "v")
      .repartitionByRange(2, col("k")).sortWithinPartitions("k")
      .write.mode("overwrite").parquet(dir)
    Layout.buildFileManifest(spark, dir, Seq("k"))
      .write.mode("overwrite").parquet(s"$dir/_graft_manifest")
    Layout.enableGenerations(spark, dir)
  }

  test("CREATE TABLE USING graft: catalog reads, writes, evolution, and merge-on-read with no view boilerplate") {
    withTempDir("graft_cat_") { dir =>
      val d = s"$dir/t"
      mkTracked(d)
      spark.sql(s"CREATE TABLE graft_cat_t USING graft OPTIONS (path '$d')")
      try {
        // reads resolve through the provider: covered file list,
        // correct rows, filters exact
        assert(spark.table("graft_cat_t").count() === 50L)
        assert(spark.sql(
            "SELECT count(*) AS n FROM graft_cat_t WHERE k < 10")
          .as[Long].head() === 10L)
        // INSERT INTO is the layout append verb: committed,
        // manifest-covered, generation bumped
        spark.sql(
          "INSERT INTO graft_cat_t SELECT 500L AS k, 0L AS g, 500L AS v")
        assert(Layout.currentGeneration(spark, d) === 1L)
        assert(spark.table("graft_cat_t").count() === 51L)
        assert(Layout.readLayout(spark, d).count() === 51L)
        // schema evolution AFTER create: the catalog's stored schema
        // is stale, the layout is the authority — the catalog table
        // serves the evolved column
        Seq((600L, 1L, 600L, "en")).toDF("k", "g", "v", "lang")
          .write.format("graft").mode("append")
          .option("mergeSchema", "true").save(d)
        val evolved = spark.table("graft_cat_t")
        assert(evolved.columns.contains("lang"))
        assert(evolved.where(col("lang") === "en").count() === 1L)
        // a vectorized delete keeps the catalog table readable
        // (merge-on-read substitution rides catalog resolution too)
        Layout.deleteWhereDv(spark, d, Seq(Layout.KeyBox("k", 0L, 9L)))
        assert(spark.table("graft_cat_t").count() === 42L)
        assert(spark.sql(
            "SELECT count(*) AS n FROM graft_cat_t WHERE k BETWEEN 10 AND 20")
          .as[Long].head() === 11L)
      } finally spark.sql("DROP TABLE IF EXISTS graft_cat_t")
      // DROP TABLE removes the catalog entry, never the layout
      assert(Layout.readLayout(spark, d).count() === 42L)
    }
  }

  test("time travel SQL: VERSION AS OF / TIMESTAMP AS OF resolve graft catalog tables") {
    withTempDir("graft_cat_tt_") { dir =>
      val d = s"$dir/t"
      mkTracked(d) // gen 0: 50 rows
      Thread.sleep(2)
      val ts0 = System.currentTimeMillis() // after the gen-0 stamp
      Thread.sleep(2)
      spark.sql(s"CREATE TABLE graft_tt_t USING graft OPTIONS (path '$d')")
      try {
        Layout.deleteWhere(spark, d, Seq(Layout.KeyBox("k", 0L, 9L)))
        // live vs VERSION AS OF 0 through plain SQL, same table name
        assert(spark.table("graft_tt_t").count() === 40L)
        assert(spark.sql(
            "SELECT count(*) AS n FROM graft_tt_t VERSION AS OF 0")
          .as[Long].head() === 50L)
        // the traveled relation keeps its alias: qualified refs and
        // self-joins of two different versions resolve
        assert(spark.sql(
            """SELECT count(*) AS n FROM graft_tt_t VERSION AS OF 0
              |WHERE graft_tt_t.k < 10""".stripMargin)
          .as[Long].head() === 10L)
        assert(spark.sql(
            """SELECT count(*) AS n
              |FROM graft_tt_t VERSION AS OF 0 v0
              |LEFT ANTI JOIN graft_tt_t live ON v0.k = live.k""".stripMargin)
          .as[Long].head() === 10L)
        // TIMESTAMP AS OF: an instant between the gen-0 and gen-1
        // commits resolves to gen 0 — epoch-millis and wall-clock
        // string spellings both ride the reader's own parseTs
        assert(spark.sql(
            s"SELECT count(*) AS n FROM graft_tt_t TIMESTAMP AS OF '$ts0'")
          .as[Long].head() === 50L)
        val wallClock = java.time.Instant.ofEpochMilli(ts0)
          .atZone(java.time.ZoneOffset.UTC).toLocalDateTime
          .format(java.time.format.DateTimeFormatter
            .ofPattern("yyyy-MM-dd HH:mm:ss.SSS"))
        assert(spark.sql("SELECT count(*) AS n FROM graft_tt_t " +
            s"TIMESTAMP AS OF '$wallClock'")
          .as[Long].head() === 50L)
        // a typed timestamp literal in the far future resolves live
        assert(spark.sql(
            """SELECT count(*) AS n FROM graft_tt_t
              |TIMESTAMP AS OF TIMESTAMP '2100-01-01 00:00:00'"""
            .stripMargin)
          .as[Long].head() === 40L)
        // merge-on-read time travel: a DV generation's snapshot
        // substitutes through the same SQL spelling
        Layout.deleteWhereDv(spark, d, Seq(Layout.KeyBox("k", 10L, 14L)))
        assert(spark.table("graft_tt_t").count() === 35L)
        assert(spark.sql(
            "SELECT count(*) AS n FROM graft_tt_t VERSION AS OF 1")
          .as[Long].head() === 40L)
        // a non-literal instant refuses loudly at parse
        val nf = intercept[IllegalArgumentException] {
          spark.sql("SELECT * FROM graft_tt_t TIMESTAMP AS OF rand()")
        }
        assert(nf.getMessage.contains("literal instant"))
        // a non-graft relation is untouched: Spark's own refusal
        spark.range(3).createOrReplaceTempView("graft_tt_view")
        try intercept[Exception] {
          spark.sql("SELECT * FROM graft_tt_view VERSION AS OF 0")
            .collect()
        } finally spark.catalog.dropTempView("graft_tt_view")
      } finally spark.sql("DROP TABLE IF EXISTS graft_tt_t")
    }
  }

  test("ANSI DELETE FROM resolves through SupportsDelete onto the layout verb") {
    withTempDir("graft_cat_del_") { dir =>
      val d = s"$dir/t"
      mkTracked(d) // gen 0: 50 rows, keys (k)
      spark.sql(s"CREATE TABLE graft_del_t USING graft OPTIONS (path '$d')")
      try {
        // plain SQL BETWEEN → two range boxes, one committed
        // generation, pay-for-the-touch classification underneath
        spark.sql("DELETE FROM graft_del_t WHERE k BETWEEN 0 AND 9")
        assert(spark.table("graft_del_t").count() === 40L)
        assert(Layout.currentGeneration(spark, d) === 1L)
        // IN-list and strict bounds translate exactly
        spark.sql("DELETE FROM graft_del_t WHERE k IN (10, 11, 12)")
        assert(spark.table("graft_del_t").count() === 37L)
        spark.sql("DELETE FROM graft_del_t WHERE k > 47")
        assert(spark.table("graft_del_t").count() === 35L)
        assert(spark.table("graft_del_t").where(col("k") > 45)
          .select("k").as[Long].collect().sorted.toSeq ===
          Seq(46L, 47L))
        // a non-key predicate refuses — never a partial delete
        intercept[Exception] {
          spark.sql("DELETE FROM graft_del_t WHERE v = 20")
        }
        // DELETE without WHERE refuses (truncate has no box form)
        intercept[Exception] {
          spark.sql("DELETE FROM graft_del_t")
        }
        assert(spark.table("graft_del_t").count() === 35L)
        assert(Layout.currentGeneration(spark, d) === 3L)
      } finally spark.sql("DROP TABLE IF EXISTS graft_del_t")
    }
  }

  test("ANSI UPDATE and MERGE INTO desugar onto the layout verbs") {
    withTempDir("graft_cat_dml_") { dir =>
      val d = s"$dir/t"
      mkTracked(d) // gen 0: 50 rows (k, g, v = k), keys (k)
      spark.sql(s"CREATE TABLE graft_dml_t USING graft OPTIONS (path '$d')")
      try {
        // UPDATE with BETWEEN — exact boxes, one committed generation
        val up = spark.sql(
          "UPDATE graft_dml_t SET v = v + 1000 WHERE k BETWEEN 0 AND 9")
          .collect()(0)
        assert(up.getAs[Long]("rows_updated") === 10L)
        assert(Layout.currentGeneration(spark, d) === 1L)
        assert(spark.table("graft_dml_t")
          .where(col("v") >= 1000L).count() === 10L)
        // qualified spellings in assignment and condition both strip
        spark.sql("UPDATE graft_dml_t SET v = graft_dml_t.v + 1 " +
          "WHERE graft_dml_t.k IN (20, 21)")
        assert(spark.table("graft_dml_t").where(col("k").isin(20L, 21L))
          .agg(sum("v")).as[Long].head() === 43L) // (20+1) + (21+1)
        // refusals: no WHERE, and a non-key condition
        intercept[IllegalArgumentException] {
          spark.sql("UPDATE graft_dml_t SET v = 0")
        }
        intercept[IllegalArgumentException] {
          spark.sql("UPDATE graft_dml_t SET v = 0 WHERE g = 1")
        }
        // MERGE upsert: matched row replaced, unmatched inserted
        Seq((5L, 9L, 500L), (100L, 0L, 100L)).toDF("k", "g", "v")
          .createOrReplaceTempView("dml_src")
        val mg = spark.sql(
          """MERGE INTO graft_dml_t t USING dml_src s ON t.k = s.k
            |WHEN MATCHED THEN UPDATE SET *
            |WHEN NOT MATCHED THEN INSERT *""".stripMargin).collect()(0)
        assert(mg.getAs[Long]("rows_replaced") === 1L)
        // rows_upserted is the FULL batch (replacements + inserts)
        assert(mg.getAs[Long]("rows_upserted") === 2L)
        assert(spark.table("graft_dml_t").count() === 51L)
        assert(spark.table("graft_dml_t").where(col("k") === 5L)
          .select("v").as[Long].head() === 500L)
        // MERGE delete: source-matched rows removed
        Seq(Tuple1(100L)).toDF("k").createOrReplaceTempView("dml_del")
        spark.sql(
          """MERGE INTO graft_dml_t t USING dml_del s ON t.k = s.k
            |WHEN MATCHED THEN DELETE""".stripMargin).collect()
        assert(spark.table("graft_dml_t").count() === 50L)
        // unsupported combinations refuse with the shapes named
        val bad = intercept[IllegalArgumentException] {
          spark.sql(
            """MERGE INTO graft_dml_t t USING dml_del s ON t.k = s.k
              |WHEN MATCHED THEN UPDATE SET *""".stripMargin)
        }
        assert(bad.getMessage.contains("supported"))
        // ambiguous unqualified key refuses
        intercept[IllegalArgumentException] {
          spark.sql(
            """MERGE INTO graft_dml_t t USING dml_del s ON k = s.k
              |WHEN MATCHED THEN DELETE""".stripMargin)
        }
      } finally {
        spark.sql("DROP TABLE IF EXISTS graft_dml_t")
        spark.catalog.dropTempView("dml_src")
        spark.catalog.dropTempView("dml_del")
      }
    }
  }

  test("REPLACE WHERE routes writeTo().overwrite onto replaceWhere; whole-table overwrite refuses") {
    withTempDir("graft_cat_rw_") { dir =>
      val d = s"$dir/t"
      mkTracked(d) // gen 0: 50 rows (k, g, v = k), keys (k)
      spark.sql(s"CREATE TABLE graft_rw_t USING graft OPTIONS (path '$d')")
      try {
        // the idempotent backfill through the V2 write surface: one
        // committed generation, band replaced by the fresh batch
        val fresh = (10L to 19L).map(k => (k, 0L, k * 100)).toDF("k", "g", "v")
        fresh.writeTo("graft_rw_t").overwrite(col("k").between(10L, 19L))
        assert(spark.table("graft_rw_t").count() === 50L)
        assert(Layout.currentGeneration(spark, d) === 1L)
        assert(spark.table("graft_rw_t")
          .where(col("k").between(10L, 19L) &&
            col("v") =!= col("k") * 100L).count() === 0L)
        assert(spark.table("graft_rw_t")
          .where(!col("k").between(10L, 19L) &&
            col("v") =!= col("k")).count() === 0L)
        // the SQL spelling plans the same OverwriteByExpression
        spark.sql(
          """INSERT INTO graft_rw_t REPLACE WHERE k BETWEEN 20 AND 24
            |SELECT k, 0L AS g, k * 7 AS v
            |FROM VALUES (20L), (21L), (22L), (23L), (24L) AS src(k)"""
            .stripMargin)
        assert(spark.table("graft_rw_t").count() === 50L)
        assert(spark.table("graft_rw_t")
          .where(col("k").between(20L, 24L) &&
            col("v") =!= col("k") * 7L).count() === 0L)
        assert(Layout.currentGeneration(spark, d) === 2L)
        // strict containment holds through this surface too
        intercept[Exception] {
          Seq((99L, 0L, 1L)).toDF("k", "g", "v")
            .writeTo("graft_rw_t")
            .overwrite(col("k").between(10L, 19L))
        }
        // whole-table overwrite refuses: TRUNCATE capability is
        // deliberately absent
        intercept[Exception] {
          spark.sql("INSERT OVERWRITE graft_rw_t VALUES (1L, 1L, 1L)")
        }
        assert(spark.table("graft_rw_t").count() === 50L)
      } finally spark.sql("DROP TABLE IF EXISTS graft_rw_t")
    }
  }

  test("writeStream.toTable streams into a catalog graft table through the verb's sink") {
    withTempDir("graft_cat_stream_") { dir =>
      val d = s"$dir/t"
      mkTracked(d) // gen 0: 50 rows (k, g, v), keys (k)
      spark.sql(s"CREATE TABLE graft_st_t USING graft OPTIONS (path '$d')")
      try {
        val srcDir = s"$dir/in"
        (600L to 604L).map(k => (k, 0L, k)).toDF("k", "g", "v")
          .coalesce(1).write.parquet(srcDir)
        val schema = org.apache.spark.sql.types.StructType.fromDDL(
          "k BIGINT, g BIGINT, v BIGINT")
        // the V1-fallback contract: the writer's format must name the
        // table's provider (Spark refuses a mismatched default)
        val q = spark.readStream.schema(schema).parquet(srcDir)
          .writeStream.format("graft")
          .option("checkpointLocation", s"$dir/ckpt")
          .toTable("graft_st_t")
        try q.processAllAvailable() finally q.stop()
        assert(spark.table("graft_st_t").count() === 55L)
        // the TABLE-NAME spelling rides the same exactly-once sink:
        // the verb's ledger exists (queryId defaulted from the
        // qualified checkpoint path)
        assert(Layout.streamLedgers(spark, d).nonEmpty,
          "toTable must land on the graft sink's ledger discipline")
      } finally spark.sql("DROP TABLE IF EXISTS graft_st_t")
    }
  }

  test("GRAFT verbs take catalog table names; CLONE exports a snapshot by name") {
    withTempDir("graft_cat_verb_") { dir =>
      val d = s"$dir/t"
      mkTracked(d) // gen 0: 50 rows
      Thread.sleep(2)
      val ts0 = System.currentTimeMillis() // after the gen-0 stamp
      Thread.sleep(2)
      spark.sql(s"CREATE TABLE graft_verb_t USING graft OPTIONS (path '$d')")
      try {
        // lifecycle reads resolve the name through the catalog
        val det = spark.sql("GRAFT DESCRIBE DETAIL graft_verb_t")
          .collect()(0)
        assert(det.getAs[Long]("n_rows") === 50L)
        // a db-qualified spelling resolves too
        assert(spark.sql("GRAFT DESCRIBE DETAIL default.graft_verb_t")
          .collect()(0).getAs[Long]("n_rows") === 50L)
        // mutations through the name are the same layout verbs
        val del = spark.sql(
          "GRAFT DELETE FROM graft_verb_t WHERE k BETWEEN 0 AND 9")
          .collect()(0)
        assert(del.getAs[Long]("rows_deleted") === 10L)
        assert(spark.table("graft_verb_t").count() === 40L)
        // CLONE by name: gen 0 exported as a standalone layout
        val c = s"$dir/clone"
        val cl = spark.sql(
          s"GRAFT CLONE graft_verb_t VERSION AS OF 0 TO '$c'")
          .collect()(0)
        assert(cl.getAs[Long]("generation") === 0L)
        assert(cl.getAs[Long]("files_copied") > 0L)
        assert(spark.read.parquet(c).count() === 50L)
        // CLONE defaulting to the live generation
        val c2 = s"$dir/clone_live"
        assert(spark.sql(s"GRAFT CLONE graft_verb_t TO '$c2'")
          .collect()(0).getAs[Long]("generation") === 1L)
        assert(spark.read.parquet(c2).count() === 40L)
        // RESTORE TIMESTAMP AS OF: the instant between the gen-0 and
        // gen-1 commits undoes the delete through the same commit
        // records the reader resolves
        val rest = spark.sql(
          s"GRAFT RESTORE graft_verb_t TIMESTAMP AS OF '$ts0'")
          .collect()(0)
        assert(rest.getAs[Boolean]("committed"))
        assert(spark.table("graft_verb_t").count() === 50L)
        // a name that is not a graft table refuses loudly …
        val unknown = intercept[IllegalArgumentException] {
          spark.sql("GRAFT DESCRIBE DETAIL graft_no_such_table")
        }
        assert(unknown.getMessage.contains("not a registered graft"))
        // … and a TEMP VIEW is never silently treated as a layout
        spark.range(3).createOrReplaceTempView("graft_verb_view")
        try {
          val tv = intercept[IllegalArgumentException] {
            spark.sql("GRAFT DESCRIBE DETAIL graft_verb_view")
          }
          assert(tv.getMessage.contains("TEMPORARY VIEW"))
        } finally spark.catalog.dropTempView("graft_verb_view")
      } finally spark.sql("DROP TABLE IF EXISTS graft_verb_t")
    }
  }
}
