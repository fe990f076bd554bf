package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Point-in-interval (range) join: every (point, interval) pair with
  * `lo <= pt < hi`, as an EQUI-join Spark can shuffle-partition —
  * the DataFrame API has no range-join primitive, and writing the
  * predicate directly produces a BroadcastNestedLoopJoin that
  * evaluates |points| x |intervals| pairs.
  *
  * Technique (the standard interval-binning decomposition): quantize
  * the domain into fixed-width buckets; an interval registers in
  * every bucket it overlaps (`sequence(lo div w, (hi-1) div w)`), a
  * point lands in exactly one (`pt div w`). The join becomes
  * `point.bucket = interval.bucket AND lo <= pt < hi` — hash
  * partitionable on the bucket, and duplicate-free by construction
  * (a pair can only meet in the point's single bucket).
  *
  * Scale contract (the reason this shape survives 100 TB):
  *  - cost = one shuffle of |points| + |intervals| x avg-buckets-per-
  *    interval rows, plus the true output. Pick `bucketWidth` near
  *    the p95 interval length: replication stays ~1-2x while each
  *    bucket pairs a point only with intervals that START within one
  *    bucket of it.
  *  - a pathological long interval replicates len/w times — cap it
  *    upstream (split into sub-intervals, or route the few giants
  *    through a broadcast side-channel) rather than growing w for
  *    everyone.
  *  - hot buckets (burst of points + overlapping intervals in one
  *    window) are ordinary join skew: AQE's skew-join split applies,
  *    unlike the nested-loop form where the skew is invisible.
  *
  * Both frames' columns pass through unchanged, so their names must
  * be disjoint. `ptCol`/`loCol`/`hiCol` are integer columns (epoch
  * micros, epoch days, byte offsets — any monotone integer
  * encoding); intervals are half-open `[lo, hi)`.
  */
object IntervalJoin {

  def joinPointsToIntervals(points: DataFrame, ptCol: Column,
                            intervals: DataFrame, loCol: Column, hiCol: Column,
                            bucketWidth: Long): DataFrame = {
    require(bucketWidth > 0, "bucketWidth must be positive")
    val w = lit(bucketWidth)
    val ip = intervals
      .withColumn("__iv_lo", loCol.cast("long"))
      .withColumn("__iv_hi", hiCol.cast("long"))
      .filter(col("__iv_hi") > col("__iv_lo")) // empty intervals match nothing
      .withColumn("__bucket",
        explode(sequence(
          call_function("div", col("__iv_lo"), w),
          call_function("div", col("__iv_hi") - 1, w))))
    val pp = points
      .withColumn("__pt", ptCol.cast("long"))
      .withColumn("__bucket", call_function("div", col("__pt"), w))
    pp.join(ip, Seq("__bucket"))
      .filter(col("__pt") >= col("__iv_lo") && col("__pt") < col("__iv_hi"))
      .drop("__bucket", "__pt", "__iv_lo", "__iv_hi")
  }
}
