package graft

import graft.ext.Layout
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** CHECK constraints ([[Layout.addCheckConstraint]]): named boolean
  * SQL expressions every row-ADDING writer validates the incoming
  * batch against before any mutation — SQL CHECK semantics (NULL
  * passes, only FALSE violates), add-time resolution + existing-row
  * validation, batch-sized enforcement in append/upsert/streamAppend,
  * and the GRAFT SQL surface. */
class ConstraintSpec extends AnyFunSuite with SharedSpark {
  import spark.implicits._

  private def mk(dir: String): Unit = {
    (0L to 49L).map(k => (k, k % 4, k * 2)).toDF("k", "g", "v")
      .repartition(2)
      .write.mode("overwrite").parquet(dir)
    Layout.buildFileManifest(spark, dir, Seq("k"))
      .write.mode("overwrite").parquet(s"$dir/_graft_manifest")
  }

  test("append and upsert enforce; violating batches refuse by constraint name") {
    withTempDir("graft_ck_") { dir =>
      val base = s"$dir/t"
      mk(base)
      Layout.addCheckConstraint(spark, base, "v_nonneg", "v >= 0")
      Layout.addCheckConstraint(spark, base, "g_small", "g < 100")
      // valid rows land
      Layout.appendWithManifest(
        Seq((100L, 5L, 7L)).toDF("k", "g", "v"), base, Seq("k"))
      assert(spark.read.parquet(base).count() === 51L)
      // violating append refused BEFORE any mutation, naming the
      // constraint and its expression
      val e = intercept[IllegalArgumentException] {
        Layout.appendWithManifest(
          Seq((101L, 5L, -7L)).toDF("k", "g", "v"), base, Seq("k"))
      }
      assert(e.getMessage.contains("v_nonneg") &&
        e.getMessage.contains("v >= 0"))
      assert(spark.read.parquet(base).count() === 51L, "nothing landed")
      // upsert: the updates batch is what the verb ADDS
      val e2 = intercept[IllegalArgumentException] {
        Layout.upsertByKeys(spark, base,
          Seq((10L, 500L, 1L)).toDF("k", "g", "v"), Seq("k"))
      }
      assert(e2.getMessage.contains("g_small"))
      val st = Layout.upsertByKeys(spark, base,
        Seq((10L, 3L, 999L)).toDF("k", "g", "v"), Seq("k"))
      assert(st.rowsUpserted === 1L)
    }
  }

  test("SQL CHECK semantics: NULL passes, only FALSE violates") {
    withTempDir("graft_ck_null_") { dir =>
      val base = s"$dir/t"
      mk(base)
      Layout.addCheckConstraint(spark, base, "v_pos", "v >= 0")
      // a null v evaluates the predicate to NULL — not a violation
      Layout.appendWithManifest(
        Seq((200L, 1L)).toDF("k", "g")
          .withColumn("v", lit(null).cast("long")),
        base, Seq("k"))
      assert(spark.read.parquet(base)
        .filter(col("k") === 200L).count() === 1L)
      // NOT NULL is spelled explicitly, as in SQL
      Layout.addCheckConstraint(spark, base, "v_notnull", "v IS NOT NULL",
        validateExisting = false)
      val e = intercept[IllegalArgumentException] {
        Layout.appendWithManifest(
          Seq((201L, 1L)).toDF("k", "g")
            .withColumn("v", lit(null).cast("long")),
          base, Seq("k"))
      }
      assert(e.getMessage.contains("v_notnull"))
    }
  }

  test("add-time contracts: resolution, boolean typing, existing-row validation, duplicates") {
    withTempDir("graft_ck_add_") { dir =>
      val base = s"$dir/t"
      mk(base)
      val e1 = intercept[IllegalArgumentException] {
        Layout.addCheckConstraint(spark, base, "bad_col", "zz > 0")
      }
      assert(e1.getMessage.contains("does not resolve"))
      val e2 = intercept[IllegalArgumentException] {
        Layout.addCheckConstraint(spark, base, "not_bool", "v + 1")
      }
      assert(e2.getMessage.contains("not boolean"))
      val eNd = intercept[IllegalArgumentException] {
        Layout.addCheckConstraint(spark, base, "coin", "rand() < 0.9")
      }
      assert(eNd.getMessage.contains("nondeterministic"))
      // existing rows (v up to 98) violate v < 50 — refused at ADD
      // time, where the one table-sized scan belongs
      val e3 = intercept[IllegalArgumentException] {
        Layout.addCheckConstraint(spark, base, "v_small", "v < 50")
      }
      assert(e3.getMessage.contains("existing rows"))
      // with external proof the caller may skip the scan
      Layout.addCheckConstraint(spark, base, "v_small", "v < 50",
        validateExisting = false)
      val e4 = intercept[IllegalArgumentException] {
        Layout.addCheckConstraint(spark, base, "v_small", "v < 60")
      }
      assert(e4.getMessage.contains("already exists"))
      Layout.dropCheckConstraint(spark, base, "v_small")
      val e5 = intercept[IllegalArgumentException] {
        Layout.dropCheckConstraint(spark, base, "v_small")
      }
      assert(e5.getMessage.contains("no constraint named"))
    }
  }

  test("streamAppend inherits enforcement; constraints survive the GRAFT SQL surface") {
    withTempDir("graft_ck_sql_") { dir =>
      val base = s"$dir/t"
      mk(base)
      Layout.enableGenerations(spark, base)
      Layout.addCheckConstraint(spark, base, "v_nonneg", "v >= 0")
      // the streaming sink validates each micro-batch (via the append
      // funnel); the batch refuses and nothing commits
      val g = Layout.currentGeneration(spark, base)
      intercept[IllegalArgumentException] {
        Layout.streamAppend(base, Seq("k"), "ck-stream")(
          Seq((300L, 1L, -1L)).toDF("k", "g", "v"), 0L)
      }
      assert(Layout.currentGeneration(spark, base) === g)
      // GRAFT SQL: add/show/drop + enforcement through APPEND INTO
      val prevDefault = SparkSession.getDefaultSession
      val prevActive = SparkSession.getActiveSession
      SparkSession.clearDefaultSession()
      SparkSession.clearActiveSession()
      val sqlS = GraftSession.tuned(
        SparkSession.builder().master("local[8]")
          .withExtensions(new GraftExtensions),
        shufflePartitions = 8).getOrCreate()
      try {
        sqlS.sql(
          s"GRAFT ALTER '$base' ADD CONSTRAINT g_bound CHECK (g < 10)")
        val shown = sqlS.sql(s"GRAFT SHOW CONSTRAINTS '$base'")
          .collect().map(r => (r.getString(0), r.getString(1))).toSeq
        assert(shown === Seq(("g_bound", "g < 10"),
          ("v_nonneg", "v >= 0")))
        val e = intercept[Exception] {
          sqlS.sql(
            s"GRAFT APPEND INTO '$base' AS SELECT CAST(400 AS BIGINT) " +
              "AS k, CAST(99 AS BIGINT) AS g, CAST(1 AS BIGINT) AS v")
            .collect()
        }
        assert(e.getMessage.contains("g_bound"))
        sqlS.sql(
          s"GRAFT APPEND INTO '$base' AS SELECT CAST(400 AS BIGINT) AS k, " +
            "CAST(5 AS BIGINT) AS g, CAST(1 AS BIGINT) AS v")
          .collect()
        assert(sqlS.read.parquet(base).filter(col("k") === 400).count() === 1L)
        sqlS.sql(s"GRAFT ALTER '$base' DROP CONSTRAINT g_bound")
        assert(sqlS.sql(s"GRAFT SHOW CONSTRAINTS '$base'").count() === 1L)
      } finally {
        // never sqlS.stop(): it shares the suite's SparkContext
        SparkSession.clearDefaultSession()
        SparkSession.clearActiveSession()
        prevDefault.foreach(SparkSession.setDefaultSession)
        prevActive.foreach(SparkSession.setActiveSession)
      }
    }
  }
}
