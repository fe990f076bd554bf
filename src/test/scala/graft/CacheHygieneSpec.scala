package graft

import graft.ext.Dedup
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Cache hygiene of the iterative operators: `Dedup.clusters` eagerly
  * localCheckpoints every propagation round (load-bearing — see its
  * Scaladoc), and `Dataset.unpersist()` is a silent no-op for a
  * checkpoint's underlying RDD, so without RDD-level cleanup each
  * invocation would leak ~rounds cached frames into the session —
  * fatal for a long-lived service running the dedup path per batch.
  * These specs pin the zero-leak contract through
  * `sparkContext.getPersistentRDDs` (the session is shared across
  * suites, so assertions are on the DELTA, not emptiness).
  */
class CacheHygieneSpec extends AnyFunSuite with SharedSpark {

  test("q_dd_clusters leaves zero cached RDDs behind after full consumption") {
    val before = spark.sparkContext.getPersistentRDDs.keySet
    val df = QueryDef.all.find(_.name == "q_dd_clusters")
      .getOrElse(fail("no gate query named q_dd_clusters")).fn(spark, sf0001)
    df.write.format("noop").mode("overwrite").save()
    val leaked = spark.sparkContext.getPersistentRDDs.keySet -- before
    assert(leaked.isEmpty, s"q_dd_clusters leaked cached RDDs: $leaked")
  }

  test("clusters(scratchDir) output survives the checkpoint cleanup and is re-readable") {
    import spark.implicits._
    val pairs = Seq((1L, 2L), (2L, 3L), (10L, 11L)).toDF("d1", "d2")
    val before = spark.sparkContext.getPersistentRDDs.keySet
    val labels = Dedup.clusters(pairs, scratchDir = Some(Scratch.tempDir("graft_cc_spec_")))
    // parquet-backed: consuming twice works even though every
    // in-memory label checkpoint has been dropped
    assert(labels.count() === 5)
    val reps = labels.orderBy("id").collect().map(r => (r.getLong(0), r.getLong(1)))
    assert(reps === Array((1L, 1L), (2L, 1L), (3L, 1L), (10L, 10L), (11L, 10L)))
    val leaked = spark.sparkContext.getPersistentRDDs.keySet -- before
    assert(leaked.isEmpty, s"clusters(scratchDir) leaked cached RDDs: $leaked")
  }

  test("pointer jumping converges in O(log diameter) rounds (64-node path in <= 8)") {
    import spark.implicits._
    val path64 = (0L until 63L).map(i => (i, i + 1)).toDF("d1", "d2")
    val (labels, rounds) = Dedup.clustersWithRounds(path64,
      scratchDir = Some(Scratch.tempDir("graft_cc_spec_")))
    assert(labels.select("rep").distinct().count() === 1)
    assert(rounds <= 8, s"64-node path took $rounds rounds — pointer jumping regressed")
  }
}
