package graft

import graft.ext.Layout
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** The V2 BATCH WRITE surface ([[graft.sources.GraftTable]]):
  * `df.write.format("graft").mode("append").save(dir)` IS
  * [[Layout.appendWithManifest]] — same manifest coverage, same
  * generation commit, same CHECK-constraint and schema-drift
  * discipline as the Scala verb and GRAFT APPEND. The contract under
  * test: appends land manifest-covered and committed; constraints
  * and drift refuse loudly; mergeSchema evolves through the DSL;
  * unmappable modes and time-traveled targets refuse by name. */
class GraftWriteSpec extends AnyFunSuite with SharedSpark {
  import spark.implicits._

  private def mkTracked(dir: String): Unit = {
    (0L to 49L).map(k => (k, k % 4, k)).toDF("k", "g", "v")
      .repartition(2)
      .write.mode("overwrite").parquet(dir)
    Layout.buildFileManifest(spark, dir, Seq("k"))
      .write.mode("overwrite").parquet(s"$dir/_graft_manifest")
    Layout.enableGenerations(spark, dir)
  }

  test("format(graft) append IS appendWithManifest: manifest-covered, generation-committed, constraint-checked, evolvable") {
    withTempDir("graft_write_") { dir =>
      val d = s"$dir/t"
      mkTracked(d)
      Layout.addCheckConstraint(spark, d, "v_nonneg", "v >= 0")
      (100L to 109L).map(k => (k, k % 4, k)).toDF("k", "g", "v")
        .write.format("graft").mode("append").save(d)
      // covered read sees the rows; the generation committed
      assert(Layout.readLayout(spark, d).count() === 60L)
      assert(Layout.currentGeneration(spark, d) === 1L)
      // the new files carry manifest stats: a pruned scan over the
      // appended band opens a strict file subset
      assert(Layout.scanPruned(spark, d,
        Seq(Layout.KeyBox("k", 100L, 109L))).count() === 10L)
      // the V2 reader round-trips what the V2 writer landed
      assert(spark.read.format("graft").load(d).count() === 60L)
      // the operation label names the DSL surface in history
      val hist = Layout.describeHistory(spark, d)
        .filter(col("gen") === 1L)
        .select("operation").as[String].collect()
      assert(hist.length === 1 && hist(0).contains("append"), hist.toSeq)
      // CHECK constraints enforce on the DSL batch, by name
      val bad = intercept[Exception] {
        Seq((200L, 1L, -5L)).toDF("k", "g", "v")
          .write.format("graft").mode("append").save(d)
      }
      assert(bad.getMessage.contains("v_nonneg"), bad.getMessage)
      assert(Layout.readLayout(spark, d).count() === 60L)
      // schema drift (missing column) refuses loudly
      intercept[Exception] {
        Seq((201L, 1L)).toDF("k", "g")
          .write.format("graft").mode("append").save(d)
      }
      // ADD-COLUMN evolution through the DSL option — the sidecar
      // commits, old files surface null
      (300L to 304L).map(k => (k, k % 4, k, "en"))
        .toDF("k", "g", "v", "lang")
        .write.format("graft").mode("append")
        .option("mergeSchema", "true").save(d)
      val evolved = Layout.readLayout(spark, d)
      assert(evolved.columns.contains("lang"))
      assert(evolved.where(col("lang").isNull).count() === 60L)
      assert(evolved.where(col("lang") === "en").count() === 5L)
    }
  }

  test("write refusals: overwrite has no verb; a time-traveled table is a snapshot, not a write target") {
    withTempDir("graft_write_ref_") { dir =>
      val d = s"$dir/t"
      mkTracked(d)
      val batch = Seq((500L, 0L, 500L)).toDF("k", "g", "v")
      // overwrite: no layout verb maps to it (truncate-and-replace
      // would orphan the generation history) — refused in analysis
      // (no TRUNCATE capability) or by the V1 bridge, either way loud
      intercept[Exception] {
        batch.write.format("graft").mode("overwrite").save(d)
      }
      assert(Layout.readLayout(spark, d).count() === 50L,
        "a refused overwrite must not touch the table")
      // a versionAsOf table is a historical snapshot
      Layout.deleteWhere(spark, d, Seq(Layout.KeyBox("k", 0L, 9L)))
      val tt = intercept[Exception] {
        batch.write.format("graft").mode("append")
          .option("versionAsOf", "0").save(d)
      }
      assert(tt.getMessage.contains("time-traveled"), tt.getMessage)
      assert(Layout.readLayout(spark, d).count() === 40L)
    }
  }
}
