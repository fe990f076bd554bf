package graft

import graft.ext.{Packing, TextAnalysis}
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Sequence packing: the distributed prefix-sum plan must equal a
  * local reference concatenation exactly — every token accounted for,
  * no window overflow, spans consistent with offsets. (The underlying
  * two-phase running total's plan shape is pinned by q_window_running;
  * this spec owns the packing arithmetic.)
  */
class PackingSpec extends AnyFunSuite with SharedSpark {

  test("pack plan equals the local reference concatenation") {
    val C = 512
    val docs = graft.sources.Tables(spark, sf0001).table("documents")
      .select(col("doc_id"), TextAnalysis.tokenCountWs(col("text")).cast("long").as("n"))
    val got = Packing.packPlan(docs, col("doc_id"), floor(col("doc_id") / 50),
        col("n"), C)
      .select("doc_id", "n", "bin_id", "bin_offset", "n_bins_spanned")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4)))
      .sortBy(_._1)
    assert(got.nonEmpty)
    // local reference: exclusive running sum in doc_id order
    var cum = 0L
    got.foreach { case (id, n, bin, off, spans) =>
      assert(bin === cum / C, s"doc $id bin")
      assert(off === cum % C, s"doc $id offset")
      assert(spans === (cum % C + n - 1) / C + 1, s"doc $id span")
      assert(off >= 0 && off < C)
      cum += n
    }
    // conservation: last doc's end == total token count
    val total = got.map(_._2).sum
    assert(cum === total)
  }

  test("bin manifest: every window fills to C and every doc is fully covered") {
    val C = 512
    val docs = graft.sources.Tables(spark, sf0001).table("documents")
      .select(col("doc_id"),
        TextAnalysis.tokenCountWs(col("text")).cast("long").as("n_tokens"))
    val plan = Packing.packPlan(docs, col("doc_id"), floor(col("doc_id") / 50),
      col("n_tokens"), C)
    val rows = Packing.binManifest(plan, C)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3)))
    // per-document coverage: ranges tile [0, n) without gap or overlap
    val n = docs.collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    rows.groupBy(_._2).foreach { case (doc, spans) =>
      val sorted = spans.sortBy(_._1)
      assert(sorted.head._3 === 0L, s"doc $doc starts at 0")
      assert(sorted.last._4 === n(doc), s"doc $doc ends at n")
      sorted.sliding(2).foreach {
        case Array(a, b) => assert(a._4 === b._3, s"doc $doc gap between windows")
        case _ =>
      }
    }
    // per-window fill: exactly C tokens per window except the last
    val fills = rows.groupBy(_._1).view.mapValues(_.map(s => s._4 - s._3).sum).toMap
    val lastBin = fills.keys.max
    fills.foreach { case (bin, fill) =>
      if (bin != lastBin) assert(fill === C.toLong, s"window $bin fill $fill")
      else assert(fill > 0 && fill <= C, s"final window $bin fill $fill")
    }
  }

  test("packWindows: full windows, and concatenating windows reproduces the corpus stream") {
    val C = 512
    val docs = graft.sources.Tables(spark, sf0001).table("documents")
    val wins = Packing.packWindows(docs, floor(col("doc_id") / 50), C)
      .orderBy("bin_id")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getString(2)))
    wins.init.foreach { case (bin, n, p) =>
      assert(n === C.toLong && p.split(" ").length === C, s"window $bin")
    }
    assert(wins.last._2 > 0 && wins.last._2 <= C)
    // lossless: the packed stream IS the doc_id-ordered corpus stream
    val packed = wins.map(_._3).mkString(" ")
    val original = docs.orderBy("doc_id").collect()
      .map(_.getAs[String]("text").split("\\s+").mkString(" ")).mkString(" ")
    assert(packed === original)
  }

  test("shardAssign: contiguous per-shard positions, partition-order independent") {
    import spark.implicits._
    val df = (0L until 1000L).toDF("id")
    val out = Packing.shardAssign(df, col("id"), nShards = 8)
      .select("id", "shard", "pos")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    assert(out.map(_._1).toSet.size === 1000, "every key assigned exactly once")
    out.groupBy(_._2).foreach { case (shard, rows) =>
      val ps = rows.map(_._3).sorted
      assert(ps.toSeq === (0L until rows.length).toSeq,
        s"shard $shard positions must be 0..${rows.length - 1}")
    }
    // no shard hogs the corpus (MINSTD spreads uniformly)
    val sizes = out.groupBy(_._2).view.mapValues(_.length)
    assert(sizes.values.max < 2 * sizes.values.min + 16, s"balanced: ${sizes.toMap}")
    // same assignment after a repartition
    val again = Packing.shardAssign(df.repartition(13), col("id"), nShards = 8)
      .select("id", "shard", "pos")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).sortBy(_._1)
    assert(again.toSeq === out.sortBy(_._1).toSeq)
  }

  test("lengthBucketedBatches: batches bounded, docs conserved, waste bounded by bucket width") {
    val docs = graft.sources.Tables(spark, sf0001).table("documents")
    val W = 16; val B = 8
    val out = Packing.lengthBucketedBatches(docs, "doc_id", "text", W, B)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4)))
    val nDocs = docs.count()
    assert(out.map(_._3).sum === nDocs, "every doc lands in exactly one batch")
    assert(out.forall(_._3 <= B), "no batch exceeds batchSize")
    // batches fill in order: within a bucket only the LAST batch may be partial
    out.groupBy(_._1).foreach { case (bucket, batches) =>
      val partial = batches.filter(_._3 < B).map(_._2)
      assert(partial.length <= 1 &&
        partial.forall(_ == batches.map(_._2).max),
        s"bucket $bucket: non-terminal partial batch")
    }
    // the whole point: padding waste inside a batch is bounded by the
    // bucket width (all members share the same floor(dl/W))
    assert(out.forall { case (_, _, n, _, waste) => waste <= n * (W - 1) },
      "waste exceeds the bucket-width bound")
    // determinism under repartition
    val again = Packing.lengthBucketedBatches(docs.repartition(13), "doc_id", "text", W, B)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4)))
    assert(again.sortBy(t => (t._1, t._2)).toSeq === out.sortBy(t => (t._1, t._2)).toSeq)
  }
}
