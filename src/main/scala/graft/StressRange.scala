package graft

import graft.ops.IntervalJoin
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Scale-stress harness for [[IntervalJoin]]: synthetic points and
  * intervals over a 10⁹ integer domain (deterministic xxhash64
  * positions, interval lengths ~U[1, 2000], bucket width 2048 ≈ the
  * p100 length), timing
  *
  *   - the naive predicate join (BroadcastNestedLoopJoin evaluating
  *     |P|·|I| pairs) on a 1/20-size corpus — the quadratic baseline,
  *   - the binned equi-join at 1× and `--rep`× (points AND intervals
  *     scaled together, so the naive cost grows rep² while the
  *     binned cost grows ~rep).
  *
  * Both forms aggregate to a count so the output never materializes.
  * One line per measurement, same format as [[StressDedup]].
  */
object StressRange {

  private val Domain = 1000000000L
  private val MaxLen = 2000L
  private val Bucket = 2048L

  private def points(spark: SparkSession, n: Long): DataFrame =
    spark.range(n).select(col("id").as("pid"),
      pmod(xxhash64(col("id")), lit(Domain)).as("x"))

  private def intervals(spark: SparkSession, m: Long): DataFrame =
    spark.range(m).select(col("id").as("iid"),
      pmod(xxhash64(col("id") * 31 + 7), lit(Domain)).as("lo"))
      .withColumn("hi", col("lo") + 1L + pmod(xxhash64(col("iid") * 17 + 3), lit(MaxLen)))

  private def time(label: String)(f: => Long): Unit = {
    val t0 = System.nanoTime()
    val rows = f
    println(f"STRESS $label%-28s ${(System.nanoTime() - t0) / 1e9}%8.2f s  ($rows rows)")
  }

  def main(args: Array[String]): Unit = {
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val rep = sys.env.getOrElse("SPARK_GRAFT_STRESS_REP", "10").toInt
    val spark = GraftSession.tuned(
      SparkSession.builder().master(s"local[$cpus]").appName("graft-stress-range"),
      shufflePartitions = cpus.toInt).getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    val (n1, m1) = (2000000L, 200000L)
    println(s"STRESS range domain=$Domain maxLen=$MaxLen bucket=$Bucket " +
      s"1x=($n1 pts, $m1 ivs) ${rep}x=(${n1 * rep} pts, ${m1 * rep} ivs)")

    time("range-naive-1/20x") {
      // n1/20 x m1/20: 1/400 of the 1x pair count, still 10^9 pairs
      points(spark, n1 / 20).join(intervals(spark, m1 / 20),
        col("x") >= col("lo") && col("x") < col("hi")).count()
    }
    time("range-binned-1x") {
      IntervalJoin.joinPointsToIntervals(points(spark, n1), col("x"),
        intervals(spark, m1), col("lo"), col("hi"), Bucket).count()
    }
    time(s"range-binned-${rep}x") {
      IntervalJoin.joinPointsToIntervals(points(spark, n1 * rep), col("x"),
        intervals(spark, m1 * rep), col("lo"), col("hi"), Bucket).count()
    }
    spark.stop()
  }
}
