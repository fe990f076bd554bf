package graft

import graft.ext.Layout
import org.apache.spark.sql.functions._
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.scalatest.funsuite.AnyFunSuite

/** EXACTLY-ONCE streaming ingest ([[Layout.streamAppend]]): the
  * foreachBatch writer that closes the streaming loop the CDC source
  * opens. The contract under test: batches land exactly once through
  * restarts and replays; the idempotence token rides the COMMIT (the
  * generation's record), so a crash between the commit and the
  * ledger write heals instead of duplicating; empty batches advance
  * without committing; the undecidable window refuses loudly. */
class StreamingSinkSpec extends AnyFunSuite with SharedSpark {
  import spark.implicits._

  private def mkTracked(dir: String): Unit = {
    (0L to 49L).map(k => (k, k % 4, k)).toDF("k", "g", "v")
      .repartition(2)
      .write.mode("overwrite").parquet(dir)
    Layout.buildFileManifest(spark, dir, Seq("k"))
      .write.mode("overwrite").parquet(s"$dir/_graft_manifest")
    Layout.enableGenerations(spark, dir)
  }

  test("a real stream lands each batch once; restart replays are skipped") {
    withTempDir("graft_sink_") { dir =>
      val base = s"$dir/t"
      mkTracked(base)
      // file-source stream (restart-capable: processed files live in
      // the checkpoint, and a restart RE-DELIVERS the last batch —
      // exactly the replay the ledger must absorb)
      val srcDir = s"$dir/in"
      val schema = org.apache.spark.sql.types.StructType.fromDDL(
        "k BIGINT, g BIGINT, v BIGINT")
      def feed(rows: Seq[(Long, Long, Long)], n: Int): Unit =
        rows.toDF("k", "g", "v").coalesce(1)
          .write.mode("append").parquet(srcDir)
      def run(): org.apache.spark.sql.streaming.StreamingQuery =
        spark.readStream.schema(schema)
          .option("maxFilesPerTrigger", "1").parquet(srcDir)
          .writeStream
          .option("checkpointLocation", s"$dir/ckpt")
          .foreachBatch(Layout.streamAppend(base, Seq("k"), "sink-spec") _)
          .start()
      feed(Seq((100L, 1L, 100L), (101L, 2L, 101L)), 1)
      val q = run()
      try {
        q.processAllAvailable()
        feed(Seq((102L, 3L, 102L)), 2)
        q.processAllAvailable()
        assert(spark.read.parquet(base).count() === 53L)
        // each non-empty batch committed ONE generation with its
        // token in the commit record
        val hist = Layout.describeHistory(spark, base)
          .filter(col("operation").startsWith("streamAppend:"))
        assert(hist.count() === 2L, "one commit per non-empty batch")
      } finally q.stop()
      // restart from the checkpoint: new data arrives while stopped;
      // the resumed query must land it exactly once
      feed(Seq((103L, 0L, 103L)), 3)
      val q2 = run()
      try {
        q2.processAllAvailable()
        val back = spark.read.parquet(base)
        assert(back.count() === 54L, "replay must not duplicate")
        assert(back.filter(col("k") === 103L).count() === 1L)
        // the layout stays a first-class citizen: manifest covers
        // everything, pruning stays exact
        assert(Layout.countWhere(spark, base,
          Seq(Layout.KeyBox("k", 100L, 200L))) === 4L)
      } finally q2.stop()
    }
  }

  test("direct replay of a committed batch is a no-op; out-of-order too") {
    withTempDir("graft_sink_replay_") { dir =>
      val base = s"$dir/t"
      mkTracked(base)
      val sink = Layout.streamAppend(base, Seq("k"), "replay-spec") _
      val b0 = Seq((200L, 0L, 1L)).toDF("k", "g", "v")
      sink(b0, 0L)
      sink(Seq((201L, 0L, 2L)).toDF("k", "g", "v"), 1L)
      assert(spark.read.parquet(base).count() === 52L)
      val genAfter = Layout.currentGeneration(spark, base)
      // exact replay of the last batch
      sink(Seq((201L, 0L, 2L)).toDF("k", "g", "v"), 1L)
      // stale replay of an older batch
      sink(b0, 0L)
      assert(spark.read.parquet(base).count() === 52L, "no duplicates")
      assert(Layout.currentGeneration(spark, base) === genAfter,
        "a skipped replay must not commit a generation")
    }
  }

  test("torn-ledger crash heals from the commit record; empty batches advance") {
    withTempDir("graft_sink_torn_") { dir =>
      val base = s"$dir/t"
      mkTracked(base)
      val sink = Layout.streamAppend(base, Seq("k"), "torn-spec") _
      sink(Seq((300L, 0L, 1L)).toDF("k", "g", "v"), 0L)
      sink(Seq((301L, 0L, 2L)).toDF("k", "g", "v"), 1L)
      // simulate the crash window: the batch-1 COMMIT landed but the
      // ledger write did not — rewind the ledger by hand
      val fs = new org.apache.hadoop.fs.Path(base)
        .getFileSystem(spark.sparkContext.hadoopConfiguration)
      val ledgers = fs.listStatus(
        new org.apache.hadoop.fs.Path(s"$base/_graft_stream"))
      assert(ledgers.length === 1)
      val lp = ledgers.head.getPath
      val out = fs.create(lp, true)
      try out.write("""{"queryId":"torn-spec","batchId":0}"""
        .getBytes("UTF-8"))
      finally out.close()
      // the replay finds batch 1's token in the LIVE generation's
      // commit record: skip + heal, never a duplicate
      sink(Seq((301L, 0L, 2L)).toDF("k", "g", "v"), 1L)
      assert(spark.read.parquet(base)
        .filter(col("k") === 301L).count() === 1L)
      // and the ledger healed: batch 2 proceeds normally
      sink(Seq((302L, 0L, 3L)).toDF("k", "g", "v"), 2L)
      assert(spark.read.parquet(base).count() === 53L)
      // empty batch: ledger advances, no generation commits
      val g = Layout.currentGeneration(spark, base)
      sink(Seq.empty[(Long, Long, Long)].toDF("k", "g", "v"), 3L)
      assert(Layout.currentGeneration(spark, base) === g)
      sink(Seq.empty[(Long, Long, Long)].toDF("k", "g", "v"), 3L) // replay
      assert(Layout.currentGeneration(spark, base) === g)
      // observability: the ledger listing names the stream and where
      // a restart resumes
      assert(Layout.streamLedgers(spark, base) ===
        Seq(("torn-spec", 3L, None, None)))
    }
  }

  test("writeStream.format(\"graft\") is the DSL-native exactly-once sink") {
    withTempDir("graft_sink_dsl_") { dir =>
      val base = s"$dir/t"
      mkTracked(base)
      val srcDir = s"$dir/in"
      val schema = org.apache.spark.sql.types.StructType.fromDDL(
        "k BIGINT, g BIGINT, v BIGINT")
      def feed(rows: Seq[(Long, Long, Long)]): Unit =
        rows.toDF("k", "g", "v").coalesce(1)
          .write.mode("append").parquet(srcDir)
      def run(): org.apache.spark.sql.streaming.StreamingQuery =
        spark.readStream.schema(schema)
          .option("maxFilesPerTrigger", "1").parquet(srcDir)
          .writeStream.format("graft")
          .option("checkpointLocation", s"$dir/ckpt")
          .option("queryId", "dsl-spec")
          .start(base)
      feed(Seq((600L, 1L, 1L), (601L, 2L, 2L)))
      val q = run()
      try q.processAllAvailable() finally q.stop()
      assert(spark.read.parquet(base).count() === 52L)
      // restart from the checkpoint: the replay of the last batch is
      // absorbed by the SAME ledger/token discipline as the verb
      feed(Seq((602L, 3L, 3L)))
      val q2 = run()
      try q2.processAllAvailable() finally q2.stop()
      val back = spark.read.parquet(base)
      assert(back.count() === 53L, "replay must not duplicate")
      assert(back.filter(col("k") >= 600L).count() === 3L)
      assert(Layout.streamLedgers(spark, base).map(_._1) ===
        Seq("dsl-spec"), "the sink writes the verb's own ledger")
      assert(Layout.describeHistory(spark, base)
        .filter(col("operation").startsWith("streamAppend:"))
        .count() === 2L, "one token-stamped commit per non-empty batch")
      // refusals arrive at start(), by name
      val e1 = intercept[IllegalArgumentException] {
        spark.readStream.schema(schema).parquet(srcDir)
          .groupBy("g").count()
          .writeStream.format("graft").outputMode("complete")
          .option("checkpointLocation", s"$dir/ckpt2")
          .option("queryId", "x").start(base)
      }
      assert(e1.getMessage.contains("append-only"), e1.getMessage)
      val e2 = intercept[IllegalArgumentException] {
        spark.readStream.schema(schema).parquet(srcDir)
          .writeStream.format("graft").partitionBy("g")
          .option("checkpointLocation", s"$dir/ckpt3")
          .option("queryId", "x").start(base)
      }
      assert(e2.getMessage.contains("partitionBy"), e2.getMessage)
    }
  }

  test("the write-ahead intent closes the first-batch and interleaved-commit windows") {
    withTempDir("graft_sink_intent_") { dir =>
      val base = s"$dir/t"
      mkTracked(base)
      val sink = Layout.streamAppend(base, Seq("k"), "intent-spec") _
      val fs = new org.apache.hadoop.fs.Path(base)
        .getFileSystem(spark.sparkContext.hadoopConfiguration)
      val lp = () => fs.listStatus(
        new org.apache.hadoop.fs.Path(s"$base/_graft_stream")).head.getPath
      def rewind(json: String): Unit = {
        val out = fs.create(lp(), true)
        try out.write(json.getBytes("UTF-8")) finally out.close()
      }
      // (a) FIRST-batch crash between commit and ledger finalize:
      // commit batch 0, then rewind the ledger to the INTENT state
      // the crashed attempt would have left (no completed batch yet).
      // The pre-intent probe could never decide this (nothing to
      // anchor recorded.contains(batchId-1) on) — the intent span can
      val g0 = Layout.currentGeneration(spark, base)
      sink(Seq((500L, 0L, 1L)).toDF("k", "g", "v"), 0L)
      rewind(s"""{"queryId":"intent-spec","batchId":-1,""" +
        s""""intentBatch":0,"intentGen":$g0}""")
      // the pending intent is VISIBLE (what SHOW STREAMS surfaces —
      // the state the refusal messages tell the operator to inspect)
      assert(Layout.streamLedgers(spark, base) ===
        Seq(("intent-spec", -1L, Some(0L), Some(g0))))
      sink(Seq((500L, 0L, 1L)).toDF("k", "g", "v"), 0L) // replay
      assert(spark.read.parquet(base).filter(col("k") === 500L)
        .count() === 1L, "first-batch replay must not duplicate")
      assert(Layout.streamLedgers(spark, base) ===
        Seq(("intent-spec", 0L, None, None)),
        "the heal must finalize the ledger (intent cleared)")
      // (b) crash BEFORE the commit: intent present, nothing
      // committed since — the replay appends exactly once
      val g1 = Layout.currentGeneration(spark, base)
      rewind(s"""{"queryId":"intent-spec","batchId":0,""" +
        s""""intentBatch":1,"intentGen":$g1}""")
      sink(Seq((501L, 0L, 2L)).toDF("k", "g", "v"), 1L)
      assert(spark.read.parquet(base).filter(col("k") === 501L)
        .count() === 1L)
      // (c) interleaved foreign commit HIDES the crashed batch from
      // the live record: batch 2 commits, a deleteWhere commits on
      // top, ledger rewound to batch 2's intent — the live-only probe
      // would re-append; the intent span scan finds the token below
      val g2 = Layout.currentGeneration(spark, base)
      sink(Seq((502L, 0L, 3L)).toDF("k", "g", "v"), 2L)
      Layout.deleteWhere(spark, base, Seq(Layout.KeyBox("k", 0L, 0L)))
      rewind(s"""{"queryId":"intent-spec","batchId":1,""" +
        s""""intentBatch":2,"intentGen":$g2}""")
      sink(Seq((502L, 0L, 3L)).toDF("k", "g", "v"), 2L) // replay
      assert(spark.read.parquet(base).filter(col("k") === 502L)
        .count() === 1L, "an interleaved commit must not cause a re-append")
      assert(Layout.streamLedgers(spark, base) ===
        Seq(("intent-spec", 2L, None, None)))
      // (d) recordless generation INSIDE the intent span: batch 3
      // commits, its record vanishes (rename→record crash), a foreign
      // commit lands on top — undecidable, refused by name
      val g3 = Layout.currentGeneration(spark, base)
      sink(Seq((503L, 0L, 4L)).toDF("k", "g", "v"), 3L)
      assert(fs.delete(new org.apache.hadoop.fs.Path(
        s"$base/_graft_history/commits/gen=${g3 + 1L}.json"), false))
      Layout.deleteWhere(spark, base, Seq(Layout.KeyBox("k", 1L, 1L)))
      rewind(s"""{"queryId":"intent-spec","batchId":2,""" +
        s""""intentBatch":3,"intentGen":$g3}""")
      val e = intercept[IllegalStateException] {
        sink(Seq((503L, 0L, 4L)).toDF("k", "g", "v"), 3L)
      }
      assert(e.getMessage.contains("no commit record"), e.getMessage)
      // (e) an intent for a different batch than the replay delivers
      // is foreign meddling — refused by name
      rewind(s"""{"queryId":"intent-spec","batchId":2,""" +
        s""""intentBatch":7,"intentGen":$g3}""")
      val e2 = intercept[IllegalStateException] {
        sink(Seq((504L, 0L, 5L)).toDF("k", "g", "v"), 5L)
      }
      assert(e2.getMessage.contains("intent for"), e2.getMessage)
    }
  }

  test("the undecidable window refuses loudly; untracked layouts refuse") {
    withTempDir("graft_sink_refuse_") { dir =>
      val base = s"$dir/t"
      mkTracked(base)
      val sink = Layout.streamAppend(base, Seq("k"), "refuse-spec") _
      sink(Seq((400L, 0L, 1L)).toDF("k", "g", "v"), 0L)
      sink(Seq((401L, 0L, 2L)).toDF("k", "g", "v"), 1L)
      val fs = new org.apache.hadoop.fs.Path(base)
        .getFileSystem(spark.sparkContext.hadoopConfiguration)
      // rewind the ledger AND delete the live generation's commit
      // record: the replay of batch 1 is now genuinely undecidable
      val lp = fs.listStatus(
        new org.apache.hadoop.fs.Path(s"$base/_graft_stream")).head.getPath
      val out = fs.create(lp, true)
      try out.write("""{"queryId":"refuse-spec","batchId":0}"""
        .getBytes("UTF-8"))
      finally out.close()
      val g = Layout.currentGeneration(spark, base)
      assert(fs.delete(new org.apache.hadoop.fs.Path(
        s"$base/_graft_history/commits/gen=$g.json"), false))
      val e = intercept[IllegalStateException] {
        sink(Seq((401L, 0L, 2L)).toDF("k", "g", "v"), 1L)
      }
      assert(e.getMessage.contains("no commit record"))
      // untracked layout: refused at entry, by name
      val flat = s"$dir/flat"
      (0L to 9L).map(k => (k, k, k)).toDF("k", "g", "v")
        .write.parquet(flat)
      Layout.buildFileManifest(spark, flat, Seq("k"))
        .write.mode("overwrite").parquet(s"$flat/_graft_manifest")
      val e2 = intercept[IllegalArgumentException] {
        Layout.streamAppend(flat, Seq("k"), "x")(
          Seq((1L, 1L, 1L)).toDF("k", "g", "v"), 0L)
      }
      assert(e2.getMessage.contains("generation-tracked"))
    }
  }

  test("end-to-end loop: stream INTO a layout, CDC stream OUT maintains a view") {
    withTempDir("graft_sink_loop_") { dir =>
      val base = s"$dir/t"
      mkTracked(base)
      var state = graft.ext.Ivm.aggregateOf(
        spark.read.parquet(base).select("g", "v"), Seq("g"), Seq("v"))
        .localCheckpoint(true)
      val cdc = spark.readStream.format("graft")
        .load(base)
        .writeStream.outputMode("append")
        .option("checkpointLocation", s"$dir/ckpt_out")
        .foreachBatch { (batch: org.apache.spark.sql.DataFrame, _: Long) =>
          state = graft.ext.Ivm.maintainAgg(state,
            batch.select("g", "v", "op"), Seq("g"), Seq("v"))
          ()
        }.start()
      try {
        val sink = Layout.streamAppend(base, Seq("k"), "loop-spec") _
        sink((500L to 509L).map(k => (k, k % 4, k)).toDF("k", "g", "v"), 0L)
        sink((510L to 519L).map(k => (k, k % 4, k)).toDF("k", "g", "v"), 1L)
        cdc.processAllAvailable()
        val want = graft.ext.Ivm.aggregateOf(
            spark.read.parquet(base).select("g", "v"), Seq("g"), Seq("v"))
          .select("g", "cnt", "sum_v").as[(Long, Long, Long)]
          .collect().sortBy(_._1).toSeq
        val got = state.select("g", "cnt", "sum_v")
          .as[(Long, Long, Long)].collect().sortBy(_._1).toSeq
        assert(got === want, "ingest → CDC → view loop diverged")
      } finally cdc.stop()
    }
  }
}
