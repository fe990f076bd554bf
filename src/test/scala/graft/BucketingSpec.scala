package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Proof of the co-located-join story: bucketing both sides of a
  * fact-fact join on the join key lets Spark plan the join with ZERO
  * shuffle exchanges — each bucket pair joins in place. At 100 TB
  * this converts the recurring cost of re-shuffling a fact table on
  * every join into a one-time cost paid at write time, which is the
  * standard layout decision for tables that are repeatedly joined on
  * a stable key (orders ⋈ lineitem here).
  */
class BucketingSpec extends AnyFunSuite with SharedSpark {

  private val sfDir = "/root/testdata/sf0.001"

  test("bucketed fact-fact join plans with no shuffle exchange") {
    val orders = graft.sources.Tables(spark, sfDir).table("orders")
    val lineitem = graft.sources.Tables(spark, sfDir).table("lineitem")

    graft.ext.Layout.writeBucketed(orders, "orders_bkt", "o_orderkey", nBuckets = 8)
    graft.ext.Layout.writeBucketed(lineitem, "lineitem_bkt", "l_orderkey", nBuckets = 8)

    val joined = spark.table("orders_bkt")
      .join(spark.table("lineitem_bkt"),
        col("o_orderkey") === col("l_orderkey"))
      .groupBy("o_orderstatus")
      .agg(count(lit(1)).as("n"))
    joined.write.format("noop").mode("overwrite").save()
    val plan = joined.queryExecution.executedPlan.toString

    // the only exchange allowed is the one for the final groupBy —
    // the join itself must consume bucket-partitioned scans directly
    val joinSection = plan.split("HashAggregate").last
    assert(!joinSection.contains("Exchange hashpartitioning"),
      s"bucketed join still shuffles:\n$plan")
    assert(plan.contains("SelectedBucketsCount"), plan)

    // same join result as the unbucketed plan
    val expected = orders.join(lineitem, col("o_orderkey") === col("l_orderkey"))
      .groupBy("o_orderstatus").agg(count(lit(1)).as("n"))
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    val got = joined.collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(got === expected)

    spark.sql("DROP TABLE IF EXISTS orders_bkt")
    spark.sql("DROP TABLE IF EXISTS lineitem_bkt")
  }
}
