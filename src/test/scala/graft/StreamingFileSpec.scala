package graft

import graft.streaming.EventStreams
import graft.streaming.EventStreams.Event
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.Trigger
import org.scalatest.funsuite.AnyFunSuite

class StreamingFileSpec extends AnyFunSuite with SharedSpark {

  test("file-source stream (AvailableNow) reproduces the batch hourly aggregation") {
    val stream = EventStreams.streamFromParquet(spark, sf0001)
    val q = EventStreams.hourlyCounts(stream)
      .writeStream.outputMode("append").format("memory").queryName("file_hourly")
      .trigger(Trigger.AvailableNow()).start()
    q.awaitTermination(120000)
    val streamed = spark.table("file_hourly")
      .select("hour", "event_type", "n", "total").collect()
      .map(r => (r.getTimestamp(0), r.getString(1), r.getLong(2), r.getDouble(3))).toSet
    val batch = SparkEntry.queries("q_ev_hourly")(spark, sf0001).collect()
      .map(r => (r.getTimestamp(0), r.getString(1), r.getLong(2), r.getDouble(3))).toSet
    // append mode emits only watermark-closed windows: a subset of the
    // batch result, equal on every emitted window, and non-trivial
    assert(streamed.nonEmpty)
    assert(streamed.subsetOf(batch),
      s"streamed windows must match batch exactly; diff=${streamed.diff(batch).take(3)}")
    assert(streamed.size >= batch.size - 50, "only the tail windows may be unclosed")
  }

  test("streaming sessionize agrees with the batch sessionization on real events") {
    val stream = EventStreams.streamFromParquet(spark, sf0001)
    val q = EventStreams.sessionize(spark, stream, gapMs = 30 * 60 * 1000L,
      watermarkDelay = "1 minute")
      .writeStream.outputMode("append").format("memory").queryName("file_sessions")
      .trigger(Trigger.AvailableNow()).start()
    q.awaitTermination(180000)
    val streamed = spark.table("file_sessions").collect()
      .map(r => (r.getLong(0), r.getTimestamp(1).getTime, r.getLong(2))).toSet
    // batch twin: (user_id, sess_start, n_events)
    val batch = SparkEntry.queries("q_ev_sessions")(spark, sf0001).collect()
      .map(r => (r.getLong(0), r.getTimestamp(3).getTime, r.getLong(2))).toSet
    assert(streamed.nonEmpty, "AvailableNow + event-time timeout must close past sessions")
    val unmatched = streamed.diff(batch)
    assert(unmatched.isEmpty,
      s"every closed streaming session must appear in the batch result; diff=${unmatched.take(3)}")
  }

  test("streaming clickAttribution agrees with the batch interval join on real events") {
    val stream = EventStreams.streamFromParquet(spark, sf0001)
    val q = EventStreams.clickAttribution(
      clicks = stream.filter(col("event_type") === "click"),
      purchases = stream.filter(col("event_type") === "purchase"),
      watermarkDelay = "1 minute")
      .writeStream.outputMode("append").format("memory").queryName("file_attrib")
      .trigger(Trigger.AvailableNow()).start()
    q.awaitTermination(180000)
    val streamed = spark.table("file_attrib").collect()
      .map(r => (r.getLong(0), r.getLong(3))).toSet // (purchase_id, click_id)
    // batch twin is the SAME builder run on batch frames (the gate
    // query q_ev_attribution, DuckDB-hash-checked)
    val batch = SparkEntry.queries("q_ev_attribution")(spark, sf0001).collect()
      .map(r => (r.getLong(0), r.getLong(3))).toSet
    assert(streamed.nonEmpty, "attribution stream must emit pairs on real events")
    // append mode may hold back pairs near the final watermark; every
    // emitted pair must be a batch pair, and nearly all must be emitted
    assert(streamed.subsetOf(batch),
      s"streaming must not invent pairs; diff=${streamed.diff(batch).take(3)}")
    assert(streamed.size >= (batch.size * 9) / 10,
      s"only tail pairs may be unemitted: ${streamed.size}/${batch.size}")
  }

  test("streaming dedup within watermark drops duplicate keys, keeps state bounded") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    def ts(m: Long) = new java.sql.Timestamp(1700000000000L + m * 60000L)
    val mem = MemoryStream[Event]
    val q = EventStreams.dedupStream(mem.toDF(), Seq("event_id"), "5 minutes")
      .writeStream.outputMode("append").format("memory").queryName("dedup_stream").start()
    try {
      mem.addData(Event(1, ts(0), 1, "a", 1.0), Event(1, ts(1), 1, "a", 1.0),
        Event(2, ts(2), 1, "b", 2.0))
      q.processAllAvailable()
      mem.addData(Event(1, ts(3), 1, "a", 1.0))   // dup within watermark
      q.processAllAvailable()
      val ids = spark.table("dedup_stream").collect().map(_.getLong(0)).toSeq
      assert(ids.sorted === Seq(1L, 2L), s"got $ids")
    } finally q.stop()
  }
}
