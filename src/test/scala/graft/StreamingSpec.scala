package graft

import graft.streaming.EventStreams
import graft.streaming.EventStreams.Event
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

class StreamingSpec extends AnyFunSuite with SharedSpark {

  private def ts(minutes: Long) = new java.sql.Timestamp(1700000000000L + minutes * 60000L)

  test("hourlyCounts: watermarked tumbling window emits closed windows") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val mem = MemoryStream[Event]
    val q = EventStreams.hourlyCounts(mem.toDF())
      .writeStream.outputMode("append").format("memory").queryName("hourly").start()
    try {
      mem.addData(
        Event(1, ts(0), 10, "click", 1.0),
        Event(2, ts(10), 10, "click", 2.0),
        Event(3, ts(5), 11, "view", 3.0))
      q.processAllAvailable()
      // advance event time beyond window end + 10-min watermark
      mem.addData(Event(4, ts(75), 10, "click", 4.0))
      q.processAllAvailable()
      mem.addData(Event(5, ts(200), 10, "click", 0.5))
      q.processAllAvailable()
      val out = spark.table("hourly").collect()
        .map(r => (r.getString(1), r.getLong(2), r.getDouble(3)))
      assert(out.contains(("click", 2L, 3.0)), s"first-hour click window, got ${out.toSeq}")
      assert(out.contains(("view", 1L, 3.0)))
    } finally q.stop()
  }

  test("qualityMonitor: closed windows emit the batch-identical mean quality") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val docs = Seq(
      (ts(0), 1L, "the cat and the dog of a to is in good text"),
      (ts(0), 2L, "zz zz zz zz zz zz zz zz zz zz zz zz"),
      (ts(0), 3L, "the a of and to is in fine words here now"))
    val mem = MemoryStream[(java.sql.Timestamp, Long, String)]
    val q = graft.streaming.TextStreams.qualityMonitor(
        mem.toDF().toDF("ts", "doc_id", "text"))
      .writeStream.outputMode("append").format("memory").queryName("txq").start()
    try {
      mem.addData(docs: _*)
      q.processAllAvailable()
      // push the watermark past the first window's end
      mem.addData((ts(10), 99L, "flush row far in the future"))
      q.processAllAvailable()
      val got = spark.table("txq").collect()
        .map(r => (r.getLong(1), r.getDouble(2))).toSeq
      val want = docs.toDF("ts", "doc_id", "text")
        .agg(count(lit(1)), round(avg(graft.ext.TextAnalysis.qualityScore(col("text"))), 4))
        .collect().map(r => (r.getLong(0), r.getDouble(1))).head
      assert(got === Seq(want), s"stream $got vs batch $want")
    } finally q.stop()
  }

  test("blocklistMonitor: closed windows emit batch-identical pattern hits") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val pats = Seq("aa", "bad word", "zz")
    val docs = Seq(
      (ts(0), 1L, "AAaa something bad word here"),
      (ts(0), 2L, "aaaa and zz and ZZ"),
      (ts(0), 3L, "clean text only"))
    val mem = MemoryStream[(java.sql.Timestamp, Long, String)]
    val q = graft.streaming.TextStreams.blocklistMonitor(
        mem.toDF().toDF("ts", "doc_id", "text"), pats)
      .writeStream.outputMode("append").format("memory").queryName("txb").start()
    try {
      mem.addData(docs: _*)
      q.processAllAvailable()
      mem.addData((ts(10), 99L, "flush row far in the future"))
      q.processAllAvailable()
      val got = spark.table("txb").collect()
        .map(r => (r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4))).toSeq
      // batch twin over the same rows: aa→3+3 (overlaps in 'aaaa'),
      // bad word→1, zz→2 (lowercased)
      assert(got === Seq((3L, 6L, 1L, 2L)), got.toString)
    } finally q.stop()
  }

  test("driftMonitor: every micro-batch's PSI report equals the batch driftReport") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val reference = Seq.fill(6)("click").++(Seq.fill(2)("view")).++(Seq.fill(2)("buy"))
      .toDF("event_type").localCheckpoint(true)
    val mem = MemoryStream[String]
    val seen = scala.collection.mutable.ArrayBuffer.empty[(Long, Map[String, Double])]
    val q = graft.streaming.TextStreams.driftMonitor(
        mem.toDF().toDF("event_type"), reference, "event_type") { rep =>
      val rows = rep.collect()
      if (rows.nonEmpty)
        seen += rows.head.getLong(6) -> rows.map(r => r.getString(0) -> r.getDouble(5)).toMap
    }
    try {
      val batch1 = Seq.fill(5)("click") ++ Seq.fill(5)("view") // mix shift
      val batch2 = Seq.fill(8)("scroll")                       // unseen bucket
      mem.addData(batch1: _*); q.processAllAvailable()
      mem.addData(batch2: _*); q.processAllAvailable()
      def want(batch: Seq[String]): Map[String, Double] = {
        val u = reference.select(col("event_type")).withColumn("__cur", lit(false))
          .unionByName(batch.toDF("event_type").select(col("event_type"))
            .withColumn("__cur", lit(true)))
        graft.ext.Quality.driftReport(u, col("__cur"), "event_type")
          .collect().map(r => r.getString(0) -> r.getDouble(5)).toMap
      }
      val byId = seen.toMap
      assert(byId.keySet === Set(0L, 1L))
      assert(byId(0L) === want(batch1))
      assert(byId(1L) === want(batch2))
      // the unseen-bucket batch must scream louder than the mix shift
      assert(byId(1L).values.sum > byId(0L).values.sum)
    } finally q.stop()
  }

  test("distinctMonitor: streaming HLL estimate equals the batch sketch exactly") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    // 120 events, 40 distinct users in the first hour window — the
    // streaming estimate must equal the batch estimate bit-for-bit
    // (same register set; micro-batch merge = register max), proving
    // sketch state survives the state store serde across batches
    val firstHour = (0 until 120).map(i =>
      Event(i.toLong, ts(i % 50), (i % 40).toLong, "click", 1.0))
    val mem = MemoryStream[Event]
    val q = graft.streaming.TextStreams.distinctMonitor(mem.toDF(), "user_id",
        windowLen = "1 hour", watermarkDelay = "10 minutes", p = 12)
      .writeStream.outputMode("append").format("memory").queryName("hll").start()
    try {
      // two chunks → at least two micro-batches update the same window
      mem.addData(firstHour.take(60): _*)
      q.processAllAvailable()
      mem.addData(firstHour.drop(60): _*)
      q.processAllAvailable()
      mem.addData(Event(999, ts(200), 1, "click", 1.0)) // flush watermark
      q.processAllAvailable()
      val got = spark.table("hll").collect()
        .map(r => (r.getTimestamp(0), r.getLong(1), r.getDouble(2))).toSet
      // the base timestamp is not hour-aligned, so the 50 minutes of
      // event time straddle two hour windows — compare the full
      // per-window set against the batch sketch over the same rows
      val want = firstHour.toDF()
        .groupBy(window(col("ts"), "1 hour"))
        .agg(count(lit(1)), round(graft.ext.Sketches.hllDistinct(col("user_id"), 12), 4))
        .collect().map(r => (r.getStruct(0).getTimestamp(0), r.getLong(1), r.getDouble(2)))
        .toSet
      assert(got === want, s"stream $got vs batch $want")
      // and the big window's estimate is close to the true 40
      val est = got.maxBy(_._2)._3
      assert(math.abs(est - 40.0) / 40.0 < 0.05, s"estimate $est for 40 distinct")
    } finally q.stop()
  }

  test("sessionize: 30-min gap splits sessions; totals and durations correct") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val mem = MemoryStream[Event]
    val q = EventStreams.sessionize(spark, mem.toDF(), gapMs = 30 * 60 * 1000L,
      watermarkDelay = "1 minute")
      .writeStream.outputMode("append").format("memory").queryName("sessions").start()
    try {
      // user 1: two bursts 90 minutes apart → 2 sessions
      mem.addData(
        Event(1, ts(0), 1, "click", 1.0),
        Event(2, ts(10), 1, "click", 2.0),
        Event(3, ts(100), 1, "click", 5.0))
      q.processAllAvailable()
      // push watermark far ahead so the second session times out too
      mem.addData(Event(9, ts(1000), 2, "view", 0.0))
      q.processAllAvailable()
      mem.addData(Event(10, ts(2000), 2, "view", 0.0))
      q.processAllAvailable()
      val out = spark.table("sessions").collect()
        .map(r => (r.getLong(0), r.getTimestamp(1).getTime, r.getLong(2), r.getDouble(3), r.getDouble(4)))
      val user1 = out.filter(_._1 == 1L).sortBy(_._2)
      assert(user1.length === 2, s"two sessions for user 1, got ${out.toSeq}")
      assert(user1.head === ((1L, ts(0).getTime, 2L, 600.0, 3.0)), "burst 1: 2 events, 10 min, value 3")
      assert(user1.last === ((1L, ts(100).getTime, 1L, 0.0, 5.0)), "burst 2: single event")
    } finally q.stop()
  }

  test("clickAttribution: stream-stream interval join within the window only") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val clicks = MemoryStream[Event]
    val purchases = MemoryStream[Event]
    val q = EventStreams.clickAttribution(clicks.toDF(), purchases.toDF(),
      attributionWindow = "1 hour", watermarkDelay = "1 minute")
      .writeStream.outputMode("append").format("memory").queryName("attrib").start()
    try {
      clicks.addData(
        Event(1, ts(0), 1, "click", 0.0),    // 30 min before purchase → attributed
        Event(2, ts(25), 1, "click", 0.0),   // 5 min before → attributed
        Event(3, ts(35), 1, "click", 0.0),   // AFTER the purchase → not attributed
        Event(4, ts(0), 2, "click", 0.0))    // other user → not attributed
      purchases.addData(Event(100, ts(30), 1, "purchase", 9.99))
      q.processAllAvailable()
      // advance both watermarks so the joined rows are emitted
      clicks.addData(Event(5, ts(500), 3, "click", 0.0))
      purchases.addData(Event(101, ts(500), 3, "purchase", 1.0))
      q.processAllAvailable()
      val out = spark.table("attrib").collect()
        .filter(_.getLong(0) == 100L)
        .map(r => (r.getLong(3), r.getDouble(5)))
      assert(out.toSet === Set((1L, 9.99), (2L, 9.99)),
        s"purchase 100 attributes to clicks 1 and 2 only, got ${out.toSeq}")
      // a purchase 90 minutes after the user's only click → outside window
      clicks.addData(Event(6, ts(600), 4, "click", 0.0))
      purchases.addData(Event(102, ts(690), 4, "purchase", 5.0))
      q.processAllAvailable()
      clicks.addData(Event(7, ts(2000), 5, "click", 0.0))
      purchases.addData(Event(103, ts(2000), 5, "purchase", 0.0))
      q.processAllAvailable()
      assert(!spark.table("attrib").collect().exists(_.getLong(0) == 102L),
        "purchase outside the attribution window must not join")
    } finally q.stop()
  }
}
