package graft

import graft.ext.Dedup
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** The incremental-dedup operators in streaming form — the production
  * deployment where new documents ARRIVE rather than sit in a batch:
  *
  *  - [[Dedup.incrementalExact]] is stateless DataFrame algebra
  *    (hash + stream-static left join), so the SAME function runs
  *    unchanged on a streaming frame: the static store keeps no
  *    stream state, bounded at any arrival rate.
  *  - [[Dedup.incremental]] (near-dup) aggregates (shingle →
  *    signature min-aggs), which continuous mode cannot express
  *    incrementally against a static side — the deployment shape is
  *    `foreachBatch`, running the batch operator per micro-batch
  *    delta. The spec pins exactly that pattern.
  */
class StreamingIncrementalSpec extends AnyFunSuite with SharedSpark {

  test("incrementalExact runs unchanged as a stream-static left join") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val store = Dedup.exact(
      Seq((1L, "aa bb cc"), (2L, "dd ee ff"), (3L, "aa bb cc")).toDF("doc_id", "text"),
      "doc_id", "text")
    val mem = MemoryStream[(Long, String)]
    val q = Dedup.incrementalExact(mem.toDF().toDF("doc_id", "text"), store,
        "doc_id", "text")
      .writeStream.outputMode("append").format("memory").queryName("inc_exact").start()
    try {
      mem.addData((10L, "aa bb cc"), (11L, "zz yy xx"))
      q.processAllAvailable()
      mem.addData((12L, "dd ee ff"))
      q.processAllAvailable()
      val out = spark.table("inc_exact").collect()
        .map(r => (r.getLong(0), if (r.isNullAt(1)) -1L else r.getLong(1), r.getString(2)))
        .sortBy(_._1)
      assert(out === Array(
        (10L, 1L, "dup"),   // matches the store's min-id representative
        (11L, -1L, "new"),
        (12L, 2L, "dup")))
    } finally q.stop()
  }

  private val words =
    "alpha bravo charlie delta echo foxtrot golf hotel india juliet kilo lima".split(" ")
  private def doc(seed: Int): String =
    (0 until 120).map { i =>
      val h = scala.util.hashing.MurmurHash3.productHash((seed, i))
      words(math.floorMod(h, words.length))
    }.mkString(" ")
  // one word changed in 120 → true 5-gram Jaccard ~0.92, comfortably
  // above the 0.7 gate even under 32-hash MinHash estimation noise
  private def nearDup(seed: Int): String = {
    val t = doc(seed).split(" "); t(60) = "zulu"; t.mkString(" ")
  }

  test("near-dup incremental runs per micro-batch via foreachBatch") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val storeDocs = (0 until 10).map(i => (i.toLong, doc(i))).toDF("doc_id", "text")
    val store = Dedup.minhashSignatures(storeDocs, "doc_id", "text",
      shingleLen = 5, numHashes = 32)
    val results = scala.collection.mutable.ArrayBuffer.empty[(Long, Long, String)]
    val mem = MemoryStream[(Long, String)]
    val q = mem.toDF().toDF("doc_id", "text").writeStream
      .foreachBatch { (batch: org.apache.spark.sql.DataFrame, _: Long) =>
        val out = Dedup.incremental(batch, store, "doc_id", "text").collect()
        results.synchronized {
          results ++= out.map(r =>
            (r.getLong(0), if (r.isNullAt(1)) -1L else r.getLong(1), r.getString(3)))
        }
        ()
      }
      .start()
    try {
      mem.addData((100L, nearDup(2)), (101L, doc(55)))
      q.processAllAvailable()
      mem.addData((102L, nearDup(7)))
      q.processAllAvailable()
      val out = results.synchronized(results.sortBy(_._1).toSeq)
      assert(out === Seq(
        (100L, 2L, "dup"),
        (101L, -1L, "new"),
        (102L, 7L, "dup")), s"got $out")
    } finally q.stop()
  }

  test("SCD2 history maintains per micro-batch via scd2Apply; equals batch rebuild") {
    // the streaming form of the warehouse daily-merge: each
    // micro-batch of changes folds into the running history with
    // Scd.scd2Apply, and after any sequence of batches the
    // maintained history must be EXACTLY what one scd2 over the
    // whole log would build — so a restart/backfill can always
    // reconcile against the batch twin.
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val full = Seq(
      ("k1", 10L, 1L, "bronze"), ("k1", 30L, 2L, "silver"),
      ("k2", 15L, 3L, "gold"),
      // batch 2: k1 no-op then change; k3 brand-new
      ("k1", 50L, 4L, "silver"), ("k1", 60L, 5L, "gold"),
      ("k3", 55L, 6L, "iron"),
      // batch 3: all no-ops
      ("k1", 70L, 7L, "gold"), ("k2", 75L, 8L, "gold"))
    val batches = Seq(full.take(3), full.slice(3, 6), full.drop(6))
    var history = graft.ext.Scd.scd2(
      batches.head.toDF("k", "ts", "seq", "status"),
      Seq("k"), "ts", Seq("status"), Seq("seq")).localCheckpoint(true)
    val mem = MemoryStream[(String, Long, Long, String)]
    val q = mem.toDF().toDF("k", "ts", "seq", "status").writeStream
      .foreachBatch { (batch: org.apache.spark.sql.DataFrame, _: Long) =>
        history = graft.ext.Scd.scd2Apply(history, batch,
          Seq("k"), "ts", Seq("status"), Seq("seq")).localCheckpoint(true)
        ()
      }
      .start()
    try {
      mem.addData(batches(1): _*)
      q.processAllAvailable()
      mem.addData(batches(2): _*)
      q.processAllAvailable()
      val rebuilt = graft.ext.Scd.scd2(full.toDF("k", "ts", "seq", "status"),
        Seq("k"), "ts", Seq("status"), Seq("seq"))
      def canon(df: org.apache.spark.sql.DataFrame) =
        df.orderBy("k", "version").collect().map(_.toSeq).toSeq
      assert(canon(history) === canon(rebuilt))
    } finally q.stop()
  }

  test("PQ ADC serves streaming query vectors per micro-batch via foreachBatch") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val emb = graft.sources.Tables(spark, sf0001).table("embeddings")
    val corpus = emb.filter(col("vec_id") >= 10)
    val results = scala.collection.mutable.ArrayBuffer.empty[(Long, Long, Double)]
    val mem = MemoryStream[Long]
    val q = mem.toDF().toDF("qid").writeStream
      .foreachBatch { (batch: org.apache.spark.sql.DataFrame, _: Long) =>
        // each micro-batch of query ids is resolved to vectors and
        // answered by the batch ADC operator against the static corpus
        val queries = batch.join(emb, batch("qid") === emb("vec_id"))
          .select("vec_id", "embedding")
        val out = graft.ext.Similarity.pqTopKBatch(corpus, queries, k = 3,
          dim = 64, m = 4, kPerSub = 16, portable = true, lloydIters = 1).collect()
        results.synchronized {
          results ++= out.map(r => (r.getLong(0), r.getLong(1), r.getDouble(2)))
        }
        ()
      }
      .start()
    try {
      mem.addData(0L, 1L)
      q.processAllAvailable()
      mem.addData(2L)
      q.processAllAvailable()
      val got = results.synchronized(results.sortBy(r => (r._1, r._2)).toSeq)
      // streamed answers must equal the one-shot batch answers
      val want = graft.ext.Similarity.pqTopKBatch(corpus,
          emb.filter(col("vec_id") < 3), k = 3,
          dim = 64, m = 4, kPerSub = 16, portable = true, lloydIters = 1)
        .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2)))
        .sortBy(r => (r._1, r._2)).toSeq
      assert(got === want, s"stream $got vs batch $want")
    } finally q.stop()
  }
}
