package graft

import graft.ext.{CorpusStats, Sampling}
import org.apache.spark.sql.functions._

/** Scale-stress harness for the mixture/selection operators: the
  * claims under test are
  *
  *   - [[CorpusStats.dsirSelect]]: wall scales with the corpus scan
  *     (one explode + bucket histograms), never with the selection
  *     size — the log-ratio table is ≤buckets rows and broadcast,
  *     the top-k a TakeOrderedAndProject;
  *   - [[Sampling.budgetWaterfill]] / [[Sampling.waterfillSample]]:
  *     wall is flat in the GROUP count (1 000 sources here) because
  *     rank/prefix ride the two-phase running total, and scales with
  *     the corpus only through the one capacity aggregation and the
  *     prefix-sum scan.
  *
  * Synthetic corpus: `r·100k` docs of 20 tokens over a 5 000-token
  * vocabulary, 1 000 sources — group counts far above the testdata's
  * 20, so a per-group window regression would show as a wall cliff.
  * Corpus construction is excluded from timings (materialized to a
  * scratch parquet first).
  */
object StressMix {

  def main(args: Array[String]): Unit = {
    val rep = args.headOption.map(_.toInt).getOrElse(10)
    val spark = GraftSession.local("graft-stress-mix")
    import spark.implicits._

    def corpus(r: Int): String = {
      val dir = Scratch.tempDir(s"graft_mix_${r}x_")
      spark.range(r * 100000L)
        .select(col("id").as("doc_id"),
          concat(lit("s"), pmod(col("id"), lit(1000L))).as("source"),
          array_join(transform(sequence(lit(0), lit(19)),
            i => concat(lit("w"), pmod(col("id") * 31 + i * 7, lit(5000)))),
            " ").as("text"))
        .withColumn("n_chars", length(col("text")).cast("long"))
        .write.mode("overwrite").parquet(dir)
      dir
    }

    def time(label: String)(f: => Any): Unit = {
      val t0 = System.nanoTime()
      val res = f
      println(f"[stress-mix] $label%-34s ${(System.nanoTime() - t0) / 1e9}%7.2f s  ($res)")
    }

    for (r <- Seq(1, rep)) {
      val dir = corpus(r)
      val docs = spark.read.parquet(dir)
      println(s"[stress-mix] corpus ${r}x: ${docs.count()} docs, 1000 sources")
      val target = docs.filter(col("doc_id") % 50 === 0)
      time(s"${r}x dsirSelect k=1000") {
        CorpusStats.dsirSelect(docs, target, k = 1000).count()
      }
      val budget = r * 100000L * 50L // about half the corpus chars
      time(s"${r}x budgetWaterfill 1000 groups") {
        Sampling.budgetWaterfill(docs, col("source"), col("n_chars"), budget)
          .agg(sum("alloc")).as[Long].head()
      }
      time(s"${r}x waterfillSample 1000 groups") {
        Sampling.waterfillSample(docs, col("source"), col("doc_id"),
          col("n_chars"), budget).count()
      }
    }
    spark.stop()
  }
}
