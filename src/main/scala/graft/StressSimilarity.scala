package graft

import graft.ext.Similarity
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Scale-stress harness for the similarity near-dup operators: the
  * lshPairs-vs-cosinePairs crossover at 1× and `--rep`× the sf
  * embeddings corpus, with planted near-duplicates.
  *
  * Corpus: replica r of each vector is its embedding circularly
  * shifted by r positions (norm-preserving, misaligns any cluster
  * structure so cross-replica cosines stay low), and every vector
  * gets one planted near-dup — a deterministic ±2% per-dimension
  * multiplicative jitter (cosine ≈ 0.999, comfortably above the 0.95
  * threshold). True pairs therefore scale LINEARLY with corpus size
  * while candidate pairs of the brute-force form scale quadratically:
  * exactly the regime separating the two plans.
  *
  *   - [[Similarity.cosinePairs]] (brute all-pairs baseline) at 1×;
  *     at rep× it is reported as OMITTED (quadratic — the point),
  *   - [[Similarity.lshPairs]] (12-bit × 8-table bucketed candidates
  *     + exact verify) at 1× and rep×.
  *
  * Corpus construction is excluded from timings (parquet scratch).
  */
object StressSimilarity {

  /** Circular shift by r (norm-preserving decorrelation). */
  private def shifted(emb: DataFrame, r: Int, dim: Int): DataFrame =
    emb.select(
      (col("vec_id") + lit(r.toLong * 10000000L)).as("vec_id"),
      (if (r == 0) col("embedding")
       else concat(slice(col("embedding"), r + 1, dim - r),
         slice(col("embedding"), 1, r))).as("embedding"))

  /** Planted near-dup: deterministic ±2% multiplicative jitter keyed
    * on (vec_id, dimension) — pure column arithmetic, no RNG. */
  private def jittered(rows: DataFrame): DataFrame =
    rows.select((col("vec_id") + lit(5000000L)).as("vec_id"),
      zip_with(col("embedding"),
        sequence(lit(0), size(col("embedding")) - 1),
        (x, i) => when(pmod(col("vec_id") + i, lit(7)) < 3,
          x * lit(1.02f)).otherwise(x * lit(0.98f))).as("embedding"))

  private def corpus(emb: DataFrame, rep: Int, dim: Int): DataFrame = {
    val replicas = (0 until rep).map(shifted(emb, _, dim)).reduce(_.unionAll(_))
    replicas.unionAll(jittered(replicas))
  }

  private def time(label: String)(f: => Long): Unit = {
    val t0 = System.nanoTime()
    val rows = f
    println(f"STRESS $label%-28s ${(System.nanoTime() - t0) / 1e9}%8.2f s  ($rows rows)")
  }

  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val rep = sys.env.getOrElse("SPARK_GRAFT_STRESS_REP", "10").toInt
    val spark = GraftSession.tuned(
      SparkSession.builder().master(s"local[$cpus]").appName("graft-stress-sim"),
      shufflePartitions = cpus.toInt).getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    val scratch = Scratch.tempDir("graft_stress_sim_")
    val emb = graft.sources.Tables(spark, sfDir).table("embeddings")
      .select("vec_id", "embedding")
    val dim = emb.select(size(col("embedding"))).head().getInt(0)
    corpus(emb, 1, dim).write.mode("overwrite").parquet(s"$scratch/x1")
    corpus(emb, rep, dim).write.mode("overwrite").parquet(s"$scratch/x$rep")
    val x1 = spark.read.parquet(s"$scratch/x1")
    val xN = spark.read.parquet(s"$scratch/x$rep")
    println(s"STRESS corpus 1x=${x1.count()} vectors, ${rep}x=${xN.count()} vectors " +
      "(one planted near-dup per vector)")

    val threshold = 0.95
    time("cosine-brute-1x") {
      Similarity.cosinePairs(x1, threshold).count()
    }
    time("lsh-pairs-1x") {
      Similarity.lshPairs(x1, threshold, bits = 12, tables = 8).count()
    }
    println(s"STRESS ${s"cosine-brute-${rep}x".padTo(28, ' ')} OMITTED " +
      s"(quadratic: ${rep * rep}x the 1x join rows)")
    time(s"lsh-pairs-${rep}x") {
      Similarity.lshPairs(xN, threshold, bits = 12, tables = 8).count()
    }

    // PQ: codebook train + full-corpus encode is one broadcast-join
    // scan — wall must scale near-linearly in vectors; the ADC query
    // over pre-encoded codes touches only 2-byte codes
    val query = emb.filter(col("vec_id") === 0)
    time("pq-train+encode-1x") {
      Similarity.pqEncode(x1,
        Similarity.pqCodebook(x1, dim, m = 8, kPerSub = 16), dim, m = 8).count()
    }
    time(s"pq-train+encode-${rep}x") {
      Similarity.pqEncode(xN,
        Similarity.pqCodebook(xN, dim, m = 8, kPerSub = 16), dim, m = 8).count()
    }
    time(s"pq-adc-top10-${rep}x") {
      Similarity.pqTopK(xN, query, k = 10, dim, m = 8, kPerSub = 16).count()
    }
    spark.stop()
  }
}
