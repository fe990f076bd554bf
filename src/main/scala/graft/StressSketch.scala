package graft

import graft.ext.Sketches
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Scale-stress harness for the sketch aggregates: the claim under
  * test is "state is constant and wall is linear in the stream size,
  * because the shuffle carries one sketch per partition instead of
  * the key stream". The testdata documents' vocabulary is ~30 tokens
  * — useless for a distinct-count stress — so the stream is
  * synthetic and controlled: `r·3M` items over `r·300k` distinct
  * keys, pushed through the SAME portable universal hash the gates
  * use (sketches need mixed input; raw small integers concentrate
  * the register split). Measured:
  *
  *   - exact COUNT(DISTINCT) + exact groupBy counts (the baselines
  *     whose shuffle grows with the key space),
  *   - [[Sketches.hllDistinct]] (p=14) and the portable m=64 HLL
  *     (expected ~13% error, and biased when n ≫ its regime — the
  *     point of printing it is honesty about which tool fits where),
  *   - [[Sketches.cmsSketch]] 4×512 and Misra–Gries k=64.
  *
  * One line per measurement; corpus construction excluded from
  * timings (materialized to a scratch parquet first).
  */
object StressSketch {

  def main(args: Array[String]): Unit = {
    val rep = args.headOption.map(_.toInt).getOrElse(10)
    val spark = GraftSession.local("graft-stress-sketch")
    import spark.implicits._

    def corpus(r: Int): String = {
      val dir = Scratch.tempDir(s"graft_sk_${r}x_")
      spark.range(r * 3000000L)
        .select(Sketches.uhash(col("id") % (r * 300000L), 100).as("x"))
        .write.mode("overwrite").parquet(dir)
      dir
    }

    def time(label: String)(f: => Any): Unit = {
      val t0 = System.nanoTime()
      val res = f
      println(f"[stress-sketch] $label%-34s ${(System.nanoTime() - t0) / 1e9}%7.2f s  ($res)")
    }

    for (r <- Seq(1, rep)) {
      val dir = corpus(r)
      val toks = spark.read.parquet(dir)
      val n = toks.count()
      println(s"[stress-sketch] corpus ${r}x: $n tokens")
      time(s"${r}x exact count(distinct)") {
        toks.agg(countDistinct(col("x"))).as[Long].head()
      }
      time(s"${r}x exact groupBy counts") {
        toks.groupBy("x").count().count()
      }
      time(s"${r}x HLL p=14") {
        f"${toks.agg(Sketches.hllDistinct(col("x"), 14)).as[Double].head()}%.0f"
      }
      time(s"${r}x HLL portable m=64") {
        f"${toks.agg(Sketches.hllDistinctPortable(col("x"))).as[Double].head()}%.0f"
      }
      time(s"${r}x CMS 4x512") {
        toks.agg(Sketches.cmsSketch(col("x"))).as[Seq[Long]].head().sum / 4
      }
      time(s"${r}x Misra-Gries k=64") {
        toks.agg(Sketches.heavyHitters(col("x"), 64))
          .as[Seq[(Long, Long)]].head().size
      }
    }
    spark.stop()
  }
}
