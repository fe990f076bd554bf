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
}
