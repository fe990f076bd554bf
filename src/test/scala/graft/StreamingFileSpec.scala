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

  test("attribution lateness is a derivation: exactly the sub-watermark pairs are withheld") {
    // Pins WHICH pairs append mode may withhold, so the file-stream
    // test's >= 90% floor is a tolerance for a mechanism demonstrated
    // exactly here: an inner interval join emits every pair whose two
    // sides are live at match time; it loses a pair iff one side
    // arrives below the global watermark (late-row drop) or its
    // partner's state was already purged by that watermark.
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    def ts(min: Long) = new java.sql.Timestamp(1700000000000L + min * 60000L)
    val clicks = MemoryStream[Event]
    val purchases = MemoryStream[Event]
    val q = EventStreams.clickAttribution(clicks.toDF(), purchases.toDF(),
      attributionWindow = "1 hour", watermarkDelay = "1 minute")
      .writeStream.outputMode("append").format("memory").queryName("late_attrib").start()
    def emitted(): Set[(Long, Long)] = spark.table("late_attrib").collect()
      .map(r => (r.getLong(0), r.getLong(3))).toSet // (purchase_id, click_id)
    try {
      // batch 1: C1(9:50) + P1(10:00) — both live, pair emits NOW
      // (inner-join emission does not wait for window closure)
      clicks.addData(Event(101, ts(590), 1, "click", 0.0))
      purchases.addData(Event(201, ts(600), 1, "purchase", 5.0))
      q.processAllAvailable()
      assert(emitted() === Set((201L, 101L)),
        "matched pair must emit in its own micro-batch, before any watermark closes")
      // batch 2: advance both sources to ~11:30 — the global watermark
      // (min over sources of max-event-time minus delay) moves past
      // P1 and C1, purging their join state. CA/PA pair on arrival.
      clicks.addData(Event(102, ts(690), 1, "click", 0.0))
      purchases.addData(Event(202, ts(695), 1, "purchase", 7.0))
      q.processAllAvailable()
      // batch 3: two sub-watermark stragglers — C2(9:55) matches P1's
      // interval but P1's state is purged AND C2 is a late-row drop;
      // P2(10:05) matches C1's interval but C1 is purged and P2 is
      // late. One on-time pair C3(11:34)+P3(11:36) still emits.
      clicks.addData(Event(103, ts(595), 1, "click", 0.0),
        Event(104, ts(694), 1, "click", 0.0))
      purchases.addData(Event(203, ts(605), 1, "purchase", 9.0),
        Event(204, ts(696), 1, "purchase", 11.0))
      q.processAllAvailable()
      val expected = Set(
        (201L, 101L),           // batch-1 on-time pair
        (202L, 102L),           // batch-2 advance pair
        (204L, 104L), (204L, 102L), // batch-3 purchase x both live clicks
        (202L, 104L))           // batch-3 click x still-live batch-2 purchase
      assert(emitted() === expected,
        s"emitted set must be exactly the live-at-match pairs; got ${emitted()}")
      // the withheld pairs are exactly the sub-watermark ones
      assert(!emitted().contains((201L, 103L)), "late click against purged purchase")
      assert(!emitted().contains((203L, 101L)), "late purchase against purged click")
    } finally q.stop()
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
