package graft

import graft.ext.Ivm
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Incremental view maintenance: the maintained aggregate must equal
  * a from-scratch recompute after any correct delete/insert feed —
  * including group birth, group death, and update-as-delete+insert —
  * and the feed contracts must fail loudly, never corrupt.
  */
class IvmSpec extends AnyFunSuite with SharedSpark {
  import spark.implicits._

  private def canon(df: org.apache.spark.sql.DataFrame): Seq[(String, Long, Long)] =
    df.select("k", "cnt", "sum_v").as[(String, Long, Long)]
      .collect().sortBy(_._1).toSeq

  test("maintain ≡ recompute across group birth, death, and updates") {
    val base = Seq(("a", 1L), ("a", 2L), ("b", 10L), ("b", 20L), ("c", 5L))
      .toDF("k", "v")
    val state0 = Ivm.aggregateOf(base, Seq("k"), Seq("v"))
    assert(canon(state0) === Seq(("a", 2L, 3L), ("b", 2L, 30L), ("c", 1L, 5L)))
    // one feed: kill group c entirely, update one b row (delete+insert
    // pair), birth group d
    val feed = Seq(
      ("c", 5L, -1),            // death: count reaches 0, row vanishes
      ("b", 10L, -1), ("b", 11L, 1), // update as delete+insert
      ("d", 7L, 1), ("d", 8L, 1)     // birth
    ).toDF("k", "v", "op")
    val state1 = Ivm.maintainAgg(state0, feed, Seq("k"), Seq("v"))
    val applied = base
      .except(Seq(("c", 5L), ("b", 10L)).toDF("k", "v"))
      .unionByName(Seq(("b", 11L), ("d", 7L), ("d", 8L)).toDF("k", "v"))
    assert(canon(state1) ===
      canon(Ivm.aggregateOf(applied, Seq("k"), Seq("v"))))
    assert(!canon(state1).exists(_._1 == "c"), "dead group survived")
    // maintenance composes: a second feed over the maintained state
    // still equals the recompute over both feeds applied
    val feed2 = Seq(("d", 7L, -1), ("a", 100L, 1)).toDF("k", "v", "op")
    val state2 = Ivm.maintainAgg(state1, feed2, Seq("k"), Seq("v"))
    val applied2 = applied.except(Seq(("d", 7L)).toDF("k", "v"))
      .unionByName(Seq(("a", 100L)).toDF("k", "v"))
    assert(canon(state2) ===
      canon(Ivm.aggregateOf(applied2, Seq("k"), Seq("v"))))
    // loud contracts: a non-±1 op, and a delete the view never saw
    val badOp = intercept[IllegalArgumentException] {
      Ivm.maintainAgg(state2, Seq(("a", 1L, 2)).toDF("k", "v", "op"),
        Seq("k"), Seq("v"))
    }
    assert(badOp.getMessage.contains("+1"))
    val phantom = intercept[IllegalArgumentException] {
      Ivm.maintainAgg(state2,
        Seq(("zz", 1L, -1), ("zz", 2L, -1)).toDF("k", "v", "op"),
        Seq("k"), Seq("v"))
    }
    assert(phantom.getMessage.contains("negative"))
    // a NULL op is refused too — sum(op) would silently drop the row,
    // diverging the view from its log with no error
    val nullOp = intercept[IllegalArgumentException] {
      Ivm.maintainAgg(state2,
        Seq(("a", 1L, Option.empty[Int])).toDF("k", "v", "op"),
        Seq("k"), Seq("v"))
    }
    assert(nullOp.getMessage.contains("null"))
    // a malformed state frame is refused by name
    intercept[IllegalArgumentException] {
      Ivm.maintainAgg(base, Seq(("a", 1L, 1)).toDF("k", "v", "op"),
        Seq("k"), Seq("v"))
    }
    // maintaining with a SUBSET of the view's sum columns would
    // silently drop the others from the state — refused instead
    val two = Ivm.aggregateOf(
      Seq(("a", 1L, 2L)).toDF("k", "v", "w"), Seq("k"), Seq("v", "w"))
    intercept[IllegalArgumentException] {
      Ivm.maintainAgg(two, Seq(("a", 1L, 1)).toDF("k", "v", "op"),
        Seq("k"), Seq("v"))
    }
  }

  test("streaming CDC feed: foreachBatch maintenance tracks the replayed log after every micro-batch") {
    withTempDir("graft_ivm_") { dir =>
      val stateDir = s"$dir/state"
      Ivm.aggregateOf(Seq(("a", 1L), ("b", 2L)).toDF("k", "v"),
          Seq("k"), Seq("v"))
        .write.mode("overwrite").parquet(stateDir)
      import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
      implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
      val in = MemoryStream[(String, Long, Int)]
      val q = in.toDF().toDF("k", "v", "op")
        .writeStream.outputMode("append")
        .foreachBatch { (batch: org.apache.spark.sql.DataFrame, _: Long) =>
          // read → maintain → eager pin → overwrite: the state dir is
          // both source and sink, so the new state must materialize
          // (localCheckpoint) before the overwrite destroys its input
          Ivm.maintainAgg(spark.read.parquet(stateDir),
              batch, Seq("k"), Seq("v"))
            .localCheckpoint(true)
            .write.mode("overwrite").parquet(stateDir)
          ()
        }.start()
      try {
        val log = scala.collection.mutable.ArrayBuffer[(String, Long, Int)]()
        val batches = Seq(
          Seq(("a", 3L, 1), ("c", 9L, 1)),
          Seq(("b", 2L, -1), ("c", 1L, 1)),   // group b dies
          Seq(("b", 5L, 1), ("a", 1L, -1)))   // b reborn, a shrinks
        for ((rows, i) <- batches.zipWithIndex) {
          in.addData(rows)
          q.processAllAvailable()
          log ++= rows
          val replayed = Seq(("a", 1L), ("b", 2L)).toDF("k", "v")
            .unionByName(log.filter(_._3 == 1).map(r => (r._1, r._2))
              .toSeq.toDF("k", "v"))
            .except(log.filter(_._3 == -1).map(r => (r._1, r._2))
              .toSeq.toDF("k", "v"))
          assert(canon(spark.read.parquet(stateDir)) ===
            canon(Ivm.aggregateOf(replayed, Seq("k"), Seq("v"))),
            s"state diverged after batch $i")
        }
      } finally q.stop()
    }
  }
}
