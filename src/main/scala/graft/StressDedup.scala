package graft

import graft.ext.{Curation, Dedup}
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Scale-stress harness for the near-dup operators: builds an
  * adversarial corpus where EVERY document shares a 24-token
  * boilerplate preamble (the hot-shingle worst case: a naive inverted
  * shingle index emits |corpus|²/2 candidates from the preamble's
  * shingles alone) at 1× and `--rep`× the sf corpus size, then times
  *
  *   - the naive all-pairs inverted-index Jaccard join (the shape the
  *     prefix filter replaced) on the 1× corpus,
  *   - prefix-filtered [[Dedup.jaccardPairs]] on 1× and rep×,
  *   - [[Dedup.minhashLshPairs]] and [[Curation.curate]] on rep×,
  *
  * printing one line per measurement. Replicas are deterministic word
  * subsamples (drop ~30% of tokens by a per-replica hash), so
  * replicas of one document sit well below the 0.6 Jaccard threshold
  * and the pair count stays output-bounded while the shingle volume
  * scales 10×. Corpus construction is excluded from every timing
  * (written to a parquet scratch dir first).
  */
object StressDedup {

  private val boiler = (1 to 24).map(i => s"boiler$i").mkString(" ")

  /** rep deterministic word-subsampled replicas of each document,
    * each prefixed with the shared boilerplate. */
  private def corpus(docs: DataFrame, rep: Int): DataFrame =
    (0 until rep).map { r =>
      val toks = split(col("text"), "\\s+")
      val kept = filter(
        zip_with(toks, sequence(lit(0), size(toks) - 1),
          (t, i) => struct(t.as("t"), i.as("i"))),
        s => pmod(s.getField("i") * 31 + lit(r * 17), lit(101)) > 30)
      docs.select(
        (col("doc_id") + lit(r.toLong * 10000000L)).as("doc_id"),
        concat_ws(" ", lit(boiler),
          array_join(transform(kept, _.getField("t")), " ")).as("text"))
    }.reduce(_.unionAll(_))

  /** The pre-prefix-filter formulation kept as the stress baseline:
    * every co-shingle pair is a candidate, so a shingle shared by d
    * documents costs d²/2 join rows. */
  private def naiveJaccardPairs(df: DataFrame, threshold: Double): DataFrame = {
    val sh = Dedup.shingleTable(df, "doc_id", "text", 5)
    val sizes = sh.groupBy("id").agg(count(lit(1)).as("n_sh"))
    val inter = sh.as("a").join(sh.as("b"),
        col("a.sh") === col("b.sh") && col("a.id") < col("b.id"))
      .groupBy(col("a.id").as("d1"), col("b.id").as("d2"))
      .agg(count(lit(1)).as("n_inter"))
    val jac = col("n_inter") / (col("s1.n_sh") + col("s2.n_sh") - col("n_inter"))
    inter
      .join(sizes.as("s1"), col("d1") === col("s1.id"))
      .join(sizes.as("s2"), col("d2") === col("s2.id"))
      .filter(jac >= threshold)
      .select(col("d1"), col("d2"), round(jac, 4).as("jaccard"))
  }

  /** All-pairs containment baseline: the containing side indexes all
    * shingles AND nothing prunes the match loop, so the shared
    * preamble alone costs |corpus|² join rows. */
  private def naiveContainmentPairs(df: DataFrame, threshold: Double): DataFrame = {
    val sh = Dedup.shingleTable(df, "doc_id", "text", 5)
    val sizes = sh.groupBy("id").agg(count(lit(1)).as("n_sh"))
    val inter = sh.as("a").join(sh.as("b"),
        col("a.sh") === col("b.sh") && col("a.id") =!= col("b.id"))
      .groupBy(col("a.id").as("d1"), col("b.id").as("d2"))
      .agg(count(lit(1)).as("n_inter"))
    inter.join(sizes.as("s1"), col("d1") === col("s1.id"))
      .filter(col("n_inter") / col("s1.n_sh") >= threshold)
      .select(col("d1"), col("d2"))
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
      SparkSession.builder().master(s"local[$cpus]").appName("graft-stress"),
      shufflePartitions = cpus.toInt).getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    val scratch = Scratch.tempDir("graft_stress_")
    val docs = graft.sources.Tables(spark, sfDir).table("documents")
      .select("doc_id", "text")
    corpus(docs, 1).write.mode("overwrite").parquet(s"$scratch/x1")
    corpus(docs, rep).write.mode("overwrite").parquet(s"$scratch/x$rep")
    val x1 = spark.read.parquet(s"$scratch/x1")
    val xN = spark.read.parquet(s"$scratch/x$rep")
    println(s"STRESS corpus 1x=${x1.count()} docs, ${rep}x=${xN.count()} docs (boilerplate preamble on every doc)")

    time("jaccard-prefix-1x") {
      Dedup.jaccardPairs(x1, "doc_id", "text", 5, 0.6).count()
    }
    time("jaccard-naive-1x") {
      naiveJaccardPairs(x1, 0.6).count()
    }
    time(s"jaccard-prefix-${rep}x") {
      Dedup.jaccardPairs(xN, "doc_id", "text", 5, 0.6).count()
    }
    // Directed containment on the same adversarial corpus: the
    // preamble shingles are held by EVERY document, the exact shape
    // whose full-side fanout the positional+length join bounds exist
    // to cap. Sub-quadratic growth shows as rep×'s wall scaling
    // ~linearly with the corpus (vs the naive baseline's quadratic
    // 1× cost).
    time("containment-naive-1x") {
      naiveContainmentPairs(x1, 0.9).count()
    }
    time("containment-prefix-1x") {
      Dedup.containmentPairs(x1, "doc_id", "text", 5, 0.9).count()
    }
    time(s"containment-prefix-${rep}x") {
      Dedup.containmentPairs(xN, "doc_id", "text", 5, 0.9).count()
    }
    time(s"minhash-lsh-${rep}x") {
      Dedup.minhashLshPairs(xN, "doc_id", "text").count()
    }
    time(s"curate-${rep}x") {
      Curation.curate(xN, checkpointDir = Some(s"$scratch/ckpt")).count()
    }

    // decontamination: a fixed small eval set cut from the 1x corpus
    // against the growing corpus — the shared boilerplate preamble
    // makes every doc flag (the realistic mass-contamination shape);
    // the eval shingle set broadcasts, so wall must scale
    // near-linearly with corpus size
    val evalSet = x1.filter(col("doc_id") % 89 === 0)
    time("decontam-1x") {
      Dedup.decontaminate(x1, evalSet, "doc_id", "text", n = 5)
        .filter(col("contaminated")).count()
    }
    time(s"decontam-${rep}x") {
      Dedup.decontaminate(xN, evalSet, "doc_id", "text", n = 5)
        .filter(col("contaminated")).count()
    }

    // Connected-components stress: disjoint chain graphs where the
    // component diameter (pathLen) and edge volume scale
    // independently. Expected shape: rounds stay ~log2(diameter)
    // (identical 1x vs 10x at the same diameter — pointer jumping is
    // data-size-independent), wall near-linear in edges; the deep
    // graph at 1x volume shows rounds growing only logarithmically
    // with a 100x diameter.
    def ccStress(label: String, nChains: Int, pathLen: Int): Unit = {
      val path = s"$scratch/cc_$label"
      chainPairs(spark, nChains, pathLen).write.mode("overwrite").parquet(path)
      val pairs = spark.read.parquet(path)
      val t0 = System.nanoTime()
      val (labels, rounds) = Dedup.clustersWithRounds(pairs,
        scratchDir = Some(s"$path/out"))
      val comps = labels.select("rep").distinct().count()
      println(f"STRESS cc-$label%-26s ${(System.nanoTime() - t0) / 1e9}%8.2f s  " +
        f"($nChains components found $comps, $rounds rounds)")
    }
    ccStress("1x-diam10", 20000, 10)
    ccStress(s"${rep}x-diam10", 20000 * rep, 10)
    ccStress("1x-diam1000", 200, 1000)
    spark.stop()
  }

  /** nChains disjoint paths of pathLen nodes each: edge k connects
    * consecutive nodes of chain k/(pathLen−1). */
  private def chainPairs(spark: SparkSession, nChains: Int, pathLen: Int): DataFrame = {
    val perChain = pathLen - 1
    spark.range(nChains.toLong * perChain)
      .select((floor(col("id") / perChain) * pathLen + col("id") % perChain).as("d1"))
      .withColumn("d2", col("d1") + 1)
  }
}
