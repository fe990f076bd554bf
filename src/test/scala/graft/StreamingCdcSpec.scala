package graft

import graft.ext.{Ivm, Layout}
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** The generation store as a STREAMING CDC source
  * (`spark.readStream.format("graft")` — [[graft.sources.GraftSource]]):
  * each micro-batch must be the exact signed feed of the generations
  * committed since the last batch, so a foreachBatch maintenance loop
  * tracks the live recompute with zero manual generation bookkeeping;
  * offsets checkpoint and resume; the source's snapshot pin follows
  * its committed offset so vacuum cannot silently strand it. */
class StreamingCdcSpec extends AnyFunSuite with SharedSpark {
  import spark.implicits._

  private def gcanon(df: org.apache.spark.sql.DataFrame): Seq[(Long, Long, Long)] =
    df.select("g", "cnt", "sum_v").as[(Long, Long, Long)]
      .collect().sortBy(_._1).toSeq

  test("readStream.format(graft): per-commit micro-batches maintain a view ≡ recompute; deletes arrive as -1 rows") {
    withTempDir("graft_cdcstream_") { dir =>
      val base = s"$dir/t"
      (0L to 99L).map(k => (k, k % 4, k)).toDF("k", "g", "v")
        .repartitionByRange(4, col("k")).sortWithinPartitions("k")
        .write.parquet(base)
      Layout.buildFileManifest(spark, base, Seq("k"))
        .write.mode("overwrite").parquet(s"$base/_graft_manifest")
      Layout.enableGenerations(spark, base)
      // state maintained purely from the stream's batches — the
      // stream IS the generation bookkeeping
      var state = Ivm.aggregateOf(
        spark.read.parquet(base).select("g", "v"), Seq("g"), Seq("v"))
        .localCheckpoint(true)
      var batches = 0
      val q = spark.readStream.format("graft")
        .option("startingVersion", "0").load(base)
        .writeStream.outputMode("append")
        .option("checkpointLocation", s"$dir/ckpt")
        .foreachBatch { (batch: org.apache.spark.sql.DataFrame, _: Long) =>
          state = Ivm.maintainAgg(state,
            batch.select("g", "v", "op"), Seq("g"), Seq("v"))
          batches += 1
          ()
        }.start()
      def recomputeLive(): Seq[(Long, Long, Long)] =
        gcanon(Ivm.aggregateOf(
          spark.read.parquet(base).select("g", "v"), Seq("g"), Seq("v")))
      try {
        // commit 1: a delete — the batch must carry -1 rows
        Layout.deleteWhere(spark, base, Seq(Layout.KeyBox("k", 0L, 19L)))
        q.processAllAvailable()
        assert(gcanon(state) === recomputeLive(),
          "state diverged after the delete commit")
        // commit 2+3 land within ONE batch window: an upsert that
        // moves rows across groups, then an append with a group birth
        Layout.upsertByKey(spark, base,
          Seq((50L, 9L, 500L), (200L, 9L, 7L)).toDF("k", "g", "v"), "k")
        Layout.appendWithManifest(
          (300L to 309L).map(k => (k, k % 4, k)).toDF("k", "g", "v")
            .repartition(1), base, Seq("k"))
        q.processAllAvailable()
        assert(gcanon(state) === recomputeLive(),
          "state diverged after the upsert+append span")
        assert(batches >= 2, s"expected at least two micro-batches, got $batches")
        // the source's pin trails its ENGINE-COMMITTED offset (the
        // engine acknowledges batch N only when constructing N+1,
        // because a restart REPLAYS the last unacknowledged batch —
        // the pin must keep that history alive)
        val cur = Layout.currentGeneration(spark, base)
        val pin = Layout.snapshotPins(spark, base)
        assert(pin.size === 1 && pin.values.head <= cur &&
          pin.values.head >= 0L, s"pin $pin vs live $cur")
        Layout.deleteWhere(spark, base, Seq(Layout.KeyBox("k", 90L, 99L)))
        q.processAllAvailable()
        assert(gcanon(state) === recomputeLive())
      } finally q.stop()
      // restart from the checkpoint: commits made WHILE STOPPED arrive
      // in the first batch after resume — no gap, no replay
      Layout.deleteWhere(spark, base, Seq(Layout.KeyBox("k", 40L, 44L)))
      Layout.appendWithManifest(
        Seq((400L, 2L, 42L)).toDF("k", "g", "v").repartition(1),
        base, Seq("k"))
      val q2 = spark.readStream.format("graft")
        .option("startingVersion", "0").load(base)
        .writeStream.outputMode("append")
        .option("checkpointLocation", s"$dir/ckpt")
        .foreachBatch { (batch: org.apache.spark.sql.DataFrame, _: Long) =>
          state = Ivm.maintainAgg(state,
            batch.select("g", "v", "op"), Seq("g"), Seq("v"))
          ()
        }.start()
      try {
        q2.processAllAvailable()
        assert(gcanon(state) === recomputeLive(),
          "state diverged across the restart")
      } finally q2.stop()
    }
  }

  test("changeTypes stream: each micro-batch arrives typed — updates paired, rewrite noise netted") {
    withTempDir("graft_cdctyped_") { dir =>
      val base = s"$dir/t"
      (0L to 49L).map(k => (k, s"s$k", k)).toDF("k", "s", "v")
        .repartitionByRange(2, col("k")).sortWithinPartitions("k")
        .write.parquet(base)
      Layout.buildFileManifest(spark, base, Seq("k"))
        .write.mode("overwrite").parquet(s"$base/_graft_manifest")
      Layout.enableGenerations(spark, base)
      val batches = scala.collection.mutable.ArrayBuffer
        .empty[Seq[(Long, Int, String)]]
      val q = spark.readStream.format("graft")
        .option("changeTypes", "true").option("keys", "k").load(base)
        .writeStream.outputMode("append")
        .option("checkpointLocation", s"$dir/ckpt")
        .foreachBatch { (batch: org.apache.spark.sql.DataFrame, _: Long) =>
          batches += batch.select("k", "op", "_change_type").collect()
            .map(r => (r.getLong(0), r.getInt(1), r.getString(2)))
            .sortBy(t => (t._1, t._2)).toSeq
          ()
        }.start()
      try {
        // one span: a delete (its file-rewrite survivors must NET OUT
        // of the typed feed), an upsert (must pair pre/postimage), and
        // an append (plain inserts)
        Layout.deleteWhere(spark, base, Seq(Layout.KeyBox("k", 0L, 4L)))
        Layout.upsertByKey(spark, base,
          Seq((10L, "S10", 999L)).toDF("k", "s", "v"), "k")
        Layout.appendWithManifest(
          Seq((100L, "new", 1L)).toDF("k", "s", "v").repartition(1),
          base, Seq("k"))
        q.processAllAvailable()
        val all = batches.flatten.toSeq.sortBy(t => (t._1, t._2))
        assert(all === (
          (0L to 4L).map(k => (k, -1, "delete")) ++
            Seq((10L, -1, "update_preimage"), (10L, 1, "update_postimage"),
              (100L, 1, "insert"))).sortBy(t => (t._1, t._2)),
          s"typed stream mismatch: $all")
      } finally q.stop()
    }
  }

  test("startingTimestamp backfills from the commit the instant resolves to") {
    withTempDir("graft_cdcts_") { dir =>
      val base = s"$dir/t"
      (0L to 49L).map(k => (k, k % 3, k)).toDF("k", "g", "v")
        .repartitionByRange(2, col("k")).sortWithinPartitions("k")
        .write.parquet(base)
      Layout.buildFileManifest(spark, base, Seq("k"))
        .write.mode("overwrite").parquet(s"$base/_graft_manifest")
      Layout.enableGenerations(spark, base)
      // gen 1: a delete; pin an instant strictly between its commit
      // and the next (commit timestamps are clamped monotone)
      Layout.deleteWhere(spark, base, Seq(Layout.KeyBox("k", 0L, 9L)))
      Thread.sleep(2)
      val between = System.currentTimeMillis()
      Thread.sleep(2)
      // gen 2: an append — the only change AFTER the pinned instant
      Layout.appendWithManifest(
        Seq((100L, 1L, 5L)).toDF("k", "g", "v").repartition(1),
        base, Seq("k"))
      var seen = 0L
      val q = spark.readStream.format("graft")
        .option("startingTimestamp", between.toString).load(base)
        .writeStream.outputMode("append")
        .option("checkpointLocation", s"$dir/ckpt")
        .foreachBatch { (batch: org.apache.spark.sql.DataFrame, _: Long) =>
          seen += batch.agg(coalesce(sum(col("op").cast("long")), lit(0L)))
            .head().getLong(0)
          ()
        }.start()
      try {
        q.processAllAvailable()
        // the instant resolves to gen 1, so the backfill is exactly
        // gen 1→2: the +1 append, never the delete before the instant
        assert(seen === 1L,
          s"backfill must start at the instant's generation, got $seen")
      } finally q.stop()
      // both start options together refuse (the V1 source constructs
      // on the stream thread, so the refusal surfaces at the first
      // pump, wrapped in StreamingQueryException)
      val q2 = spark.readStream.format("graft")
        .option("startingVersion", "0")
        .option("startingTimestamp", between.toString).load(base)
        .writeStream.option("checkpointLocation", s"$dir/ckpt2")
        .foreachBatch { (_: org.apache.spark.sql.DataFrame, _: Long) => () }
        .start()
      try {
        val e = intercept[org.apache.spark.sql.streaming.StreamingQueryException] {
          q2.processAllAvailable()
        }
        assert(e.getMessage.contains("not both"), e.getMessage)
      } finally q2.stop()
      // INCLUSIVE at-instant: a stream starting exactly AT gen 2's
      // recorded commit instant must serve gen 2's changes (the
      // reference CDC contract) — the offset resolves to the
      // generation BEFORE that commit, never to the commit itself
      val ts2 = Layout.describeHistory(spark, base)
        .filter(col("gen") === 2L).select(col("ts"))
        .head().getTimestamp(0).getTime
      var seenAt = 0L
      val q3 = spark.readStream.format("graft")
        .option("startingTimestamp", ts2.toString).load(base)
        .writeStream.outputMode("append")
        .option("checkpointLocation", s"$dir/ckpt3")
        .foreachBatch { (batch: org.apache.spark.sql.DataFrame, _: Long) =>
          seenAt += batch.agg(coalesce(sum(col("op").cast("long")), lit(0L)))
            .head().getLong(0)
          ()
        }.start()
      try {
        q3.processAllAvailable()
        assert(seenAt === 1L,
          s"a commit landing exactly at the instant must be included, got $seenAt")
      } finally q3.stop()
      // an instant predating the retained history refuses loudly (the
      // feed below the oldest retained generation cannot be served)
      val q4 = spark.readStream.format("graft")
        .option("startingTimestamp", "100").load(base)
        .writeStream.option("checkpointLocation", s"$dir/ckpt4")
        .foreachBatch { (_: org.apache.spark.sql.DataFrame, _: Long) => () }
        .start()
      try {
        val e = intercept[org.apache.spark.sql.streaming.StreamingQueryException] {
          q4.processAllAvailable()
        }
        assert(e.getMessage.contains("predates the retained history"),
          e.getMessage)
      } finally q4.stop()
    }
  }

  test("graft CDC source: vacuum coordination and loud boundaries") {
    withTempDir("graft_cdcvac_") { dir =>
      val base = s"$dir/t"
      (0L to 49L).map(k => (k, k % 3, k)).toDF("k", "g", "v")
        .repartitionByRange(2, col("k")).sortWithinPartitions("k")
        .write.parquet(base)
      Layout.buildFileManifest(spark, base, Seq("k"))
        .write.mode("overwrite").parquet(s"$base/_graft_manifest")
      Layout.enableGenerations(spark, base)
      // NET of ops, not gross rows: a partial-file delete's feed
      // carries the whole rewritten file as matched ±1 pairs (file-
      // level CDF), so only the signed sum is commit-invariant
      var seen = 0L
      val q = spark.readStream.format("graft").load(base) // default: new changes only
        .writeStream.outputMode("append")
        .option("checkpointLocation", s"$dir/ckpt")
        .foreachBatch { (batch: org.apache.spark.sql.DataFrame, _: Long) =>
          seen += batch.agg(coalesce(sum(col("op").cast("long")), lit(0L)))
            .head().getLong(0)
          ()
        }.start()
      try {
        q.processAllAvailable()
        assert(seen === 0L, "default start must not backfill history")
        Layout.appendWithManifest(
          Seq((100L, 1L, 5L)).toDF("k", "g", "v").repartition(1),
          base, Seq("k"))
        q.processAllAvailable()
        assert(seen === 1L)
        // two commits behind the pin → vacuum refuses by stream name
        Layout.deleteWhere(spark, base, Seq(Layout.KeyBox("k", 0L, 4L)))
        q.processAllAvailable()
        Layout.deleteWhere(spark, base, Seq(Layout.KeyBox("k", 5L, 9L)))
        // (not yet processed — the pin sits at the last COMMITTED offset)
        val pinned = Layout.snapshotPins(spark, base)
        assert(pinned.size === 1 && pinned.keys.head.startsWith("stream:"))
        val blocked = intercept[IllegalArgumentException] {
          Layout.vacuumGenerations(spark, base, retainLast = 1)
        }
        assert(blocked.getMessage.contains("stream:"))
        q.processAllAvailable()
        assert(seen === 1L - 5L - 5L,
          "the stream missed rows a refused vacuum should have protected")
      } finally q.stop()
      // a forced vacuum past the pin: the next span fails loudly in
      // changesBetween rather than serving a torn feed
      Layout.deleteWhere(spark, base, Seq(Layout.KeyBox("k", 10L, 14L)))
      Layout.vacuumGenerations(spark, base, retainLast = 1, force = true)
      Layout.deleteWhere(spark, base, Seq(Layout.KeyBox("k", 15L, 19L)))
      val q3 = spark.readStream.format("graft").load(base)
        .writeStream.outputMode("append")
        .option("checkpointLocation", s"$dir/ckpt")
        .foreachBatch { (_: org.apache.spark.sql.DataFrame, _: Long) => () }
        .start()
      val dead = intercept[org.apache.spark.sql.streaming.StreamingQueryException] {
        q3.processAllAvailable()
        q3.awaitTermination(10000)
      }
      assert(dead.getMessage.contains("generation") ||
        Option(dead.getCause).exists(_.getMessage.contains("generation")))
      q3.stop()
    }
  }
}
