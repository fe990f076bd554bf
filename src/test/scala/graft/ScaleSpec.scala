package graft

import graft.ext.Similarity
import graft.ops.RelationalOps
import graft.sources.Tables
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Scale-posture checks: plan shapes that must hold for the 100 TB
  * deployment — bucketed co-located joins (no exchange), broadcast
  * dim joins, pushdown/pruning at the scan, IVF probe pruning,
  * sketch-based distinct. */
class ScaleSpec extends AnyFunSuite with SharedSpark {

  private lazy val t = Tables(spark, sf0001)

  test("bucketed tables join with zero shuffle (co-located sort-merge)") {
    import java.nio.file.{Files, Paths}
    spark.sql("DROP TABLE IF EXISTS li_bucketed")
    spark.sql("DROP TABLE IF EXISTS o_bucketed")
    t.lineitem.select("l_orderkey", "l_quantity").write
      .bucketBy(8, "l_orderkey").sortBy("l_orderkey").saveAsTable("li_bucketed")
    t.orders.select("o_orderkey", "o_totalprice").write
      .bucketBy(8, "o_orderkey").sortBy("o_orderkey").saveAsTable("o_bucketed")
    val prev = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    try {
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
      val joined = spark.table("li_bucketed")
        .join(spark.table("o_bucketed"), col("l_orderkey") === col("o_orderkey"))
      val plan = joined.queryExecution.executedPlan.toString
      assert(!plan.contains("Exchange"), s"bucketed join must not shuffle:\n$plan")
      assert(joined.count() > 0)
    } finally {
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prev)
      spark.sql("DROP TABLE IF EXISTS li_bucketed")
      spark.sql("DROP TABLE IF EXISTS o_bucketed")
    }
  }

  test("filter and projection reach the parquet scan (pushdown + pruning)") {
    val q = t.lineitem.filter(col("l_quantity") > 40).select("l_orderkey", "l_quantity")
    val scan = q.queryExecution.executedPlan.toString
    assert(scan.contains("PushedFilters: [IsNotNull(l_quantity), GreaterThan(l_quantity,40.0)]"), scan)
    assert(scan.contains("ReadSchema: struct<l_orderkey:bigint,l_quantity:double>"), scan)
  }

  test("dim joins broadcast; fact side is not exchanged before partial agg") {
    val q = SparkEntry.queries("q_multiway_revenue")(spark, sf0001)
    val plan = q.queryExecution.executedPlan.toString
    assert(plan.contains("BroadcastHashJoin"), plan)
    // first Exchange must appear only after the partial HashAggregate
    val firstExchange = plan.indexOf("Exchange hashpartitioning")
    val firstAgg = plan.indexOf("HashAggregate")
    assert(firstAgg >= 0 && (firstExchange == -1 || firstAgg < firstExchange ||
      plan.indexOf("BroadcastExchange") < firstExchange), plan)
  }

  test("IVF ANN: probes a cluster subset, results ordered, recall > 0") {
    val emb = t.embeddings
    val q = emb.filter(col("vec_id") === 0)
    val corpus = emb.filter(col("vec_id") =!= 0)
    val ivf = Similarity.annIvf(corpus, q, k = 10, nCentroids = 8, nProbe = 2).collect()
    assert(ivf.nonEmpty)
    val cos = ivf.map(_.getDouble(1)).toSeq
    assert(cos === cos.sorted.reverse)
    val brute = Similarity.topK(corpus, q, k = 10).collect().map(_.getLong(0)).toSet
    assert(ivf.map(_.getLong(0)).exists(brute), "IVF with 2/8 probes should recover some true top-10")
  }

  test("IVF assignment is shuffle-free: broadcast centroid row, zero corpus exchange") {
    val emb = t.embeddings
    val cents = emb.select(col("vec_id").as("cid"), col("embedding").as("c_emb")).limit(8)
    val assigned = Similarity.ivfAssign(emb, cents)
    assigned.collect() // finalize under AQE so codegen stages are visible
    val plan = assigned.queryExecution.executedPlan.toString
    // centroid set rides in as one broadcast row; the corpus side is
    // scan → project, never hash-exchanged (the naive crossJoin +
    // groupBy(id) argmax paid 2 full-corpus shuffles per assignment)
    assert(plan.contains("BroadcastNestedLoopJoin"), plan)
    assert(!plan.contains("Exchange hashpartitioning"),
      s"IVF assignment must not exchange the corpus:\n$plan")
    // and the argmax runs inside whole-stage codegen
    assert(plan.matches("(?s).*\\*\\(\\d+\\) Project \\[.*nearestcentroid.*"), plan)
  }

  test("PQ encode + ADC never exchange the corpus: codes ride a broadcast codebook") {
    val emb = t.embeddings
    val corpus = emb.filter(col("vec_id") =!= 0)
    val cb = Similarity.pqCodebook(corpus, dim = 64, m = 4, kPerSub = 16)
    val codes = Similarity.pqEncode(corpus, cb, dim = 64, m = 4)
    codes.collect() // finalize under AQE so codegen stages are visible
    val plan = codes.queryExecution.executedPlan.toString
    // the codebook folds to one broadcast row (BNLJ). Exchanges exist
    // only in the broadcast (codebook-build) subtree — the STREAMED
    // corpus branch, printed between the join node and its build-side
    // `BroadcastQueryStage`/`BroadcastExchange`, must be scan → filter
    // with no exchange of any kind
    val joinAt = plan.indexOf("BroadcastNestedLoopJoin")
    assert(joinAt >= 0, plan)
    val buildAt = plan.indexOf("Broadcast", joinAt + 1)
    val corpusBranch = plan.substring(joinAt, buildAt)
    assert(!corpusBranch.contains("Exchange"),
      s"corpus side must not exchange:\n$corpusBranch")
    assert(corpusBranch.contains("FileScan parquet"), corpusBranch)
    // the per-subspace argmin runs inside whole-stage codegen
    assert(plan.matches("(?s).*\\*\\(\\d+\\) Project \\[.*nearestcentroidl2.*"), plan)
  }

  test("no gate query plans a CartesianProduct (brute-force pair baselines excepted)") {
    // these are documented O(n²) baselines (broadcast-nested-loop by design)
    val allowed = Set("q_sim_cos_pairs", "q_sim_topk", "q_sim_ann_lsh", "q_sim_ann_ivf")
    QueryDef.all.filterNot(q => allowed(q.name)).foreach { q =>
      val plan = q.fn(spark, sf0001).queryExecution.executedPlan.toString
      assert(!plan.contains("CartesianProduct"),
        s"${q.name} plans a cartesian product:\n${plan.take(800)}")
    }
  }

  test("GraftExtensions installs without error") {
    new GraftExtensions().apply(new org.apache.spark.sql.SparkSessionExtensions)
  }

  test("HLL sketch distinct approximates exact distinct within 5%") {
    val exact = t.lineitem.select(countDistinct(col("l_orderkey"))).head().getLong(0)
    val est = t.lineitem
      .select(expr("hll_sketch_estimate(hll_sketch_agg(l_orderkey))")).head().getLong(0)
    assert(math.abs(est - exact).toDouble / exact < 0.05, s"est=$est exact=$exact")
  }

  test("saltedJoin spreads a hot key across reducers (plan sanity at the API level)") {
    import spark.implicits._
    val fact = (1 to 1000).map(i => ("hot", i)).toDF("k", "v")
    val dim = Seq(("hot", "d")).toDF("k", "d")
    val out = RelationalOps.saltedJoin(fact, dim, "k", salt = 4)
    assert(out.count() === 1000)
    assert(out.columns.toSeq === Seq("k", "v", "d"))
  }
}
