package graft

import graft.ext.Layout
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Z-order layout: bit-exactness of the interleave and the locality
  * property that makes it worth doing — files clustered by z cover
  * compact rectangles in BOTH key dimensions, so min-max pruning
  * works for filters on either.
  */
class LayoutSpec extends AnyFunSuite with SharedSpark {
  import spark.implicits._

  private def mortonRef(x: Long, y: Long): Long = {
    var z = 0L
    for (i <- 0 until 16) {
      z |= ((x >> i) & 1L) << (2 * i)
      z |= ((y >> i) & 1L) << (2 * i + 1)
    }
    z
  }

  test("zorder2 matches a bit-by-bit Morton reference") {
    val pairs = Seq((0L, 0L), (1L, 0L), (0L, 1L), (65535L, 65535L),
      (12345L, 54321L), (40000L, 70000L)) // >16-bit inputs: low bits only
    val got = pairs.toDF("x", "y")
      .select(Layout.zorder2(col("x"), col("y"))).as[Long].collect()
    val want = pairs.map { case (x, y) => mortonRef(x & 0xFFFF, y & 0xFFFF) }
    assert(got.toSeq == want, s"got ${got.toSeq} want $want")
  }

  test("writeZOrdered: per-file ranges are compact in BOTH dimensions") {
    val li = spark.read.parquet(s"$sf0001/lineitem.parquet")
      .select("l_partkey", "l_suppkey")
    val dir = java.nio.file.Files.createTempDirectory("graft_zorder_").toString
    try {
      Layout.writeZOrdered(li, col("l_partkey"), col("l_suppkey"), dir, files = 16)
      val back = spark.read.parquet(dir)
      assert(back.count() == li.count())
      // per-file bounding boxes: with a z-layout each of the 16 files
      // should span a small fraction of each key's global range; a
      // single-column sort would give ~1/16 on one dim and ~1.0 on
      // the other
      val stats = back.withColumn("f", input_file_name())
        .groupBy("f")
        .agg((max("l_partkey") - min("l_partkey")).as("xr"),
             (max("l_suppkey") - min("l_suppkey")).as("yr"))
        .agg(avg("xr"), avg("yr")).as[(Double, Double)].head()
      val (gx, gy) = li.agg(max("l_partkey") - min("l_partkey"),
        max("l_suppkey") - min("l_suppkey")).as[(Long, Long)].head()
      // 16 files ≈ a 4x4 grid over the normalized square: both
      // fractions should sit near 1/4; a single-column sort reads
      // ~1/16 on one dim and ~1.0 on the other
      val (fx, fy) = (stats._1 / gx, stats._2 / gy)
      assert(fx < 0.6 && fy < 0.6,
        f"per-file range fractions x=$fx%.2f y=$fy%.2f — no locality")
      assert(fx + fy < 1.0,
        f"combined $fx%.2f + $fy%.2f not better than single-dim sort")
    } finally {
      org.apache.commons.io.FileUtils.deleteDirectory(new java.io.File(dir))
    }
  }

  test("compact rewrites small files toward the byte target and preserves rows") {
    val dir = java.nio.file.Files.createTempDirectory("graft_compact_spec_").toString
    try {
      val docs = spark.read.parquet(s"$sf0001/documents.parquet")
      docs.repartition(16).write.mode("overwrite").parquet(s"$dir/small")
      val fs = new java.io.File(s"$dir/small")
      val smallBytes = fs.listFiles.filter(f => f.isFile && !f.getName.startsWith("_"))
        .map(_.length).sum
      // target = half the total → expect exactly 2 output files
      val (nIn, nOut) = Layout.compact(spark, s"$dir/small", s"$dir/big",
        targetBytes = smallBytes / 2 + 1)
      assert(nIn === 16)
      assert(nOut === 2, s"expected ceil(total/target)=2 files, got $nOut")
      val back = spark.read.parquet(s"$dir/big")
      assert(back.count() === docs.count())
      // content identical: same doc_id multiset
      assert(back.agg(sum("doc_id")).head.getLong(0) ===
        docs.agg(sum("doc_id")).head.getLong(0))
      intercept[IllegalArgumentException] {
        Layout.compact(spark, s"$dir/big", s"$dir/big")
      }
    } finally {
      org.apache.commons.io.FileUtils.deleteDirectory(new java.io.File(dir))
    }
  }

  test("scanPruned: equals the full-scan filter while reading strictly fewer files") {
    withTempDir("graft_pruned_") { dir =>
      val li = spark.read.parquet(s"$sf0001/lineitem.parquet")
        .select("l_orderkey", "l_partkey", "l_suppkey", "l_extendedprice")
      Layout.writeZOrdered(li, col("l_partkey"), col("l_suppkey"),
        s"$dir/li", files = 16)
      val mf = Layout.buildFileManifest(spark, s"$dir/li",
        Seq("l_partkey", "l_suppkey"))
      // one manifest row per data file, each with both key intervals
      val files = spark.read.parquet(s"$dir/li").inputFiles
      assert(mf.count() === files.length.toLong)
      val boxes = Seq(Layout.KeyBox("l_partkey", 20L, 60L),
        Layout.KeyBox("l_suppkey", 2L, 5L))
      val pruned = Layout.scanPruned(spark, s"$dir/li", mf, boxes)
      // the point of the manifest: the pruned plan opens strictly
      // fewer files than the full scan (z-locality guarantees some
      // file's rectangle misses this narrow box)
      assert(pruned.inputFiles.length < files.length,
        s"pruned read opened all ${files.length} files — no skipping")
      // and exactness: pruned read ≡ full scan + filter
      val full = spark.read.parquet(s"$dir/li")
        .filter(col("l_partkey").between(20, 60) && col("l_suppkey").between(2, 5))
      val key = (r: org.apache.spark.sql.Row) =>
        (r.getLong(0), r.getLong(1), r.getLong(2))
      assert(pruned.count() > 0, "degenerate spec: box selected nothing")
      assert(pruned.collect().map(key).sorted.toSeq ===
        full.collect().map(key).sorted.toSeq)
      // the residual must reach the surviving files' parquet scan —
      // otherwise survivors are fully decoded and filtered in Spark
      val plan = pruned.queryExecution.executedPlan.toString
      assert(plan.contains("PushedFilters: [") &&
        !plan.matches("(?s).*PushedFilters: \\[\\].*"),
        s"residual box not pushed to the pruned scan:\n$plan")
    }
  }

  test("writeZOrderedWithManifest: stored stats serve a cold reader; data read unchanged") {
    withTempDir("graft_pruned_durable_") { dir =>
      val li = spark.read.parquet(s"$sf0001/lineitem.parquet")
        .select("l_orderkey", "l_partkey", "l_suppkey")
      Layout.writeZOrderedWithManifest(li, col("l_partkey"), col("l_suppkey"),
        s"$dir/li", files = 16, keyCols = Seq("l_partkey", "l_suppkey"))
      // the _graft_manifest subdir is invisible to plain data reads
      // (underscore convention) — row count and schema unchanged
      val back = spark.read.parquet(s"$dir/li")
      assert(back.count() === li.count())
      assert(back.columns.toSeq === li.columns.toSeq)
      // cold-reader path: prune straight off the stored manifest
      val boxes = Seq(Layout.KeyBox("l_partkey", 20L, 60L),
        Layout.KeyBox("l_suppkey", 2L, 5L))
      val pruned = Layout.scanPruned(spark, s"$dir/li", boxes)
      assert(pruned.inputFiles.length < back.inputFiles.length,
        "stored manifest pruned nothing")
      val full = back.filter(
        col("l_partkey").between(20, 60) && col("l_suppkey").between(2, 5))
      val key = (r: org.apache.spark.sql.Row) =>
        (r.getLong(0), r.getLong(1), r.getLong(2))
      assert(pruned.collect().map(key).sorted.toSeq ===
        full.collect().map(key).sorted.toSeq)
    }
  }

  test("appendWithManifest: delta-only stats patch keeps pruning exact after ingest") {
    withTempDir("graft_pruned_append_") { dir =>
      val li = spark.read.parquet(s"$sf0001/lineitem.parquet")
        .select("l_orderkey", "l_partkey", "l_suppkey")
      val (histBase, tail) = (li.filter(col("l_orderkey") % 10 =!= 0),
        li.filter(col("l_orderkey") % 10 === 0))
      Layout.writeZOrderedWithManifest(histBase, col("l_partkey"), col("l_suppkey"),
        s"$dir/li", files = 8, keyCols = Seq("l_partkey", "l_suppkey"))
      val filesBefore = spark.read.parquet(s"$dir/li").inputFiles.length
      Layout.appendWithManifest(tail.repartition(2), s"$dir/li",
        Seq("l_partkey", "l_suppkey"))
      val back = spark.read.parquet(s"$dir/li")
      assert(back.count() === li.count(), "append lost rows")
      // the manifest covers every data file, old and new
      val mf = Layout.loadManifest(spark, s"$dir/li")
      assert(mf.count() === back.inputFiles.length.toLong)
      assert(back.inputFiles.length > filesBefore)
      // pruning stays EXACT: appended (unclustered) files always
      // survive, z-files still skip, residual restores equality
      val boxes = Seq(Layout.KeyBox("l_partkey", 20L, 60L),
        Layout.KeyBox("l_suppkey", 2L, 5L))
      val pruned = Layout.scanPruned(spark, s"$dir/li", boxes)
      assert(pruned.inputFiles.length < back.inputFiles.length)
      val full = back.filter(
        col("l_partkey").between(20, 60) && col("l_suppkey").between(2, 5))
      val key = (r: org.apache.spark.sql.Row) =>
        (r.getLong(0), r.getLong(1), r.getLong(2))
      assert(pruned.collect().map(key).sorted.toSeq ===
        full.collect().map(key).sorted.toSeq)
    }
  }

  test("needsRecluster: appends degrade depth until the trigger fires; rewrite resets it") {
    withTempDir("graft_recluster_") { dir =>
      val li = spark.read.parquet(s"$sf0001/lineitem.parquet")
        .select("l_orderkey", "l_partkey", "l_suppkey")
      val keyCols = Seq("l_partkey", "l_suppkey")
      Layout.writeZOrderedWithManifest(li, col("l_partkey"), col("l_suppkey"),
        s"$dir/li", files = 8, keyCols = keyCols)
      def depth() = Layout.clusteringDepth(
        Layout.loadManifest(spark, s"$dir/li"), "l_partkey")
        .agg(max("depth")).head().getLong(0)
      val base = depth()
      assert(!Layout.needsRecluster(Layout.loadManifest(spark, s"$dir/li"),
        "l_partkey", maxDepth = base + 3))
      // each appended (unclustered) single file spans the WHOLE key
      // range, so every point lookup must read it too: depth grows by
      // exactly 1 per appended file, at every key position
      for (_ <- 1 to 3)
        Layout.appendWithManifest(li.coalesce(1), s"$dir/li", keyCols)
      val degraded = depth()
      assert(degraded >= base + 3, s"depth $base -> $degraded after 3 appends")
      assert(Layout.needsRecluster(Layout.loadManifest(spark, s"$dir/li"),
        "l_partkey", maxDepth = base + 3), "trigger should fire")
      // OPTIMIZE: rewrite everything z-clustered; depth returns to a
      // clustered profile and the trigger clears
      val all = spark.read.parquet(s"$dir/li").localCheckpoint(true)
      Layout.writeZOrderedWithManifest(all, col("l_partkey"), col("l_suppkey"),
        s"$dir/li2", files = 8, keyCols = keyCols)
      val after = Layout.clusteringDepth(
        Layout.loadManifest(spark, s"$dir/li2"), "l_partkey")
        .agg(max("depth")).head().getLong(0)
      assert(after <= base + 1, s"rewrite did not re-tighten: $after vs base $base")
      assert(!Layout.needsRecluster(Layout.loadManifest(spark, s"$dir/li2"),
        "l_partkey", maxDepth = base + 3))
    }
  }

  test("scanPruned: z-locality prunes >= 87.5% of a 64-file grid for a 1/64 box") {
    import spark.implicits._
    withTempDir("graft_pruned_grid_") { dir =>
      // full 256x256 integer grid — the uniform worst case where
      // locality comes ONLY from the layout, not data skew
      val grid = (0 until 65536)
        .map(i => (i.toLong, (i % 256).toLong, (i / 256).toLong))
        .toDF("id", "x", "y")
      Layout.writeZOrderedWithManifest(grid, col("x"), col("y"),
        s"$dir/g", files = 64, keyCols = Seq("x", "y"))
      val total = spark.read.parquet(s"$dir/g").inputFiles.length
      // a 32x32 box = 1/64 of the area; a perfect 8x8 z-tiling reads
      // 1-4 files, a single-column sort ~8, a random layout all 64 —
      // the bound pins the layout actually paying off
      val pruned = Layout.scanPruned(spark, s"$dir/g",
        Seq(Layout.KeyBox("x", 0L, 31L), Layout.KeyBox("y", 0L, 31L)))
      assert(pruned.inputFiles.length * 8 <= total,
        s"read ${pruned.inputFiles.length} of $total files — z-locality lost")
      assert(pruned.count() === 32L * 32L)
    }
  }

  test("scanPruned detects out-of-band appends; failed appends leave the dir untouched") {
    withTempDir("graft_pruned_oob_") { dir =>
      val li = spark.read.parquet(s"$sf0001/lineitem.parquet")
        .select("l_partkey", "l_suppkey")
      Layout.writeZOrderedWithManifest(li, col("l_partkey"), col("l_suppkey"),
        s"$dir/li", files = 4, keyCols = Seq("l_partkey", "l_suppkey"))
      val boxes = Seq(Layout.KeyBox("l_partkey", 20L, 60L))
      // a failed appendWithManifest (bad key) must validate BEFORE
      // writing: otherwise the dir gains files the manifest misses
      val before = spark.read.parquet(s"$dir/li").count()
      intercept[IllegalArgumentException] {
        Layout.appendWithManifest(
          li.withColumn("l_partkey", col("l_partkey").cast("string")),
          s"$dir/li", Seq("l_partkey"))
      }
      assert(spark.read.parquet(s"$dir/li").count() === before,
        "failed append mutated the directory")
      assert(Layout.scanPruned(spark, s"$dir/li", boxes).count() ===
        li.filter(col("l_partkey").between(20, 60)).count())
      // an OUT-OF-BAND append (any writer that is not
      // appendWithManifest) leaves files without stats; the pruned
      // read must fail loudly, not silently drop their rows
      li.limit(100).coalesce(1).write.mode("append").parquet(s"$dir/li")
      val ex = intercept[IllegalArgumentException] {
        Layout.scanPruned(spark, s"$dir/li", boxes).count()
      }
      assert(ex.getMessage.contains("does not cover"))
    }
  }

  test("manifest lifecycle edges: empty input scans clean; bad paths/keys fail fast") {
    withTempDir("graft_pruned_edges_") { dir =>
      val li = spark.read.parquet(s"$sf0001/lineitem.parquet")
        .select("l_partkey", "l_suppkey")
      // empty-input write leaves a zero-row part file with no stats
      // row; the coverage check must tolerate it (zero rows cannot
      // be dropped) and the pruned read must return empty, not throw
      Layout.writeZOrderedWithManifest(li.filter(lit(false)),
        col("l_partkey"), col("l_suppkey"), s"$dir/empty", files = 4,
        keyCols = Seq("l_partkey", "l_suppkey"))
      val pruned = Layout.scanPruned(spark, s"$dir/empty",
        Seq(Layout.KeyBox("l_partkey", 0L, 100L)))
      assert(pruned.count() === 0L)
      // a path that URI-encodes would corrupt file-name tracking —
      // rejected at the entrance, before anything is written
      intercept[IllegalArgumentException] {
        Layout.writeZOrderedWithManifest(li, col("l_partkey"), col("l_suppkey"),
          s"$dir/has space/li", files = 4, keyCols = Seq("l_partkey"))
      }
      // duplicate key columns would build an ambiguous manifest
      intercept[IllegalArgumentException] {
        Layout.buildFileManifest(spark, s"$dir/empty",
          Seq("l_partkey", "l_partkey"))
      }
    }
  }

  test("buildFileManifest rejects non-integral keys loudly") {
    // a string key would cast its stats to null — i.e. "every file
    // skippable" — so the misuse must fail fast, not return empty
    val ex = intercept[IllegalArgumentException] {
      Layout.buildFileManifest(spark, s"$sf0001/lineitem.parquet",
        Seq("l_returnflag"))
    }
    assert(ex.getMessage.contains("integral"))
  }

  test("scanPruned: empty survivor set returns an empty, schema-correct frame") {
    withTempDir("graft_pruned_none_") { dir =>
      val li = spark.read.parquet(s"$sf0001/lineitem.parquet")
        .select("l_partkey", "l_suppkey")
      Layout.writeZOrdered(li, col("l_partkey"), col("l_suppkey"),
        s"$dir/li", files = 4)
      val mf = Layout.buildFileManifest(spark, s"$dir/li",
        Seq("l_partkey", "l_suppkey"))
      // box entirely outside the key domain: every file skips
      val pruned = Layout.scanPruned(spark, s"$dir/li", mf,
        Seq(Layout.KeyBox("l_partkey", 1000000L, 2000000L)))
      assert(pruned.count() === 0L)
      assert(pruned.columns.toSeq === Seq("l_partkey", "l_suppkey"))
    }
  }

  test("writeZOrdered on an empty frame still writes a readable parquet dir") {
    val empty = spark.read.parquet(s"$sf0001/lineitem.parquet")
      .select("l_partkey", "l_suppkey").filter(lit(false))
    val dir = java.nio.file.Files.createTempDirectory("graft_zorder_empty_").toString
    try {
      // min/max bounds are null on zero rows — must not NPE; the
      // write contract (overwritten dir, same schema) still holds
      Layout.writeZOrdered(empty, col("l_partkey"), col("l_suppkey"), dir, files = 4)
      val back = spark.read.parquet(dir)
      assert(back.count() == 0)
      assert(back.columns.toSeq == Seq("l_partkey", "l_suppkey"))
    } finally {
      org.apache.commons.io.FileUtils.deleteDirectory(new java.io.File(dir))
    }
  }
}
