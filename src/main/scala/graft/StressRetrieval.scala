package graft

import graft.ext.Retrieval
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Scale-stress harness for the BM25/inverted-index stack: the claim
  * under test is that SERVING cost scales with the matched posting
  * lists, not the corpus — the property that makes a lexical index
  * useful at 100 TB.
  *
  * Build: the sf corpus replicated 1× and `--rep`× (ids offset), with
  * a rare marker token appended to ~1/997 of documents. The postings
  * are persisted TERM-SORTED (`repartitionByRange(term)` +
  * `sortWithinPartitions`), the layout a production index would use:
  * the literal IN(term) pushed filter then prunes whole row groups by
  * min/max stats.
  *
  * Expected shape: the index BUILD scales ~linearly with the corpus
  * (it must — every token is read once); the RARE-term query stays
  * ~flat from 1× to rep× (its posting list grows with the needle
  * count, and row-group pruning skips the rest of the index); the
  * HOT-term query grows with its posting list — linear, and says so.
  * Corpus/index construction is excluded from query timings.
  */
object StressRetrieval {

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
      SparkSession.builder().master(s"local[$cpus]").appName("graft-stress-ir"),
      shufflePartitions = cpus.toInt).getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    val scratch = Scratch.tempDir("graft_stress_ir_")
    val docs = graft.sources.Tables(spark, sfDir).table("documents")
      .select("doc_id", "text")

    def corpus(r: Int) = (0 until r).map { i =>
      docs.select((col("doc_id") + lit(i.toLong * 10000000L)).as("doc_id"),
        when(pmod(col("doc_id"), lit(997)) === 0,
          concat(col("text"), lit(" needlerare"))).otherwise(col("text")).as("text"))
    }.reduce(_ unionAll _)

    def buildIndex(r: Int, name: String): String = {
      val dir = s"$scratch/$name"
      corpus(r).write.mode("overwrite").parquet(s"$dir.corpus")
      val c = spark.read.parquet(s"$dir.corpus")
      time(s"postings-build-${r}x") {
        Retrieval.postings(c, "doc_id", "text")
          .repartitionByRange(cpus.toInt, col("term"))
          .sortWithinPartitions("term")
          .write.mode("overwrite").parquet(dir)
        spark.read.parquet(dir).count()
      }
      // stats once, outside query timings (a deployment caches them)
      Retrieval.postingsStats(spark.read.parquet(dir))
        .write.mode("overwrite").parquet(s"$dir.stats")
      dir
    }

    // untimed warmup: absorb codegen/JIT for the build and query
    // plans so the 1x row (measured first) isn't warmup-inflated
    corpus(1).limit(200).write.mode("overwrite").parquet(s"$scratch/warm.corpus")
    val warmPost = Retrieval.postings(
      spark.read.parquet(s"$scratch/warm.corpus"), "doc_id", "text")
    warmPost.repartitionByRange(2, col("term")).sortWithinPartitions("term")
      .write.mode("overwrite").parquet(s"$scratch/warm")
    Retrieval.bm25TopKFromPostings(spark.read.parquet(s"$scratch/warm"),
      Retrieval.postingsStats(warmPost), "table needlerare", k = 10).count()

    val i1 = buildIndex(1, "idx1")
    val iN = buildIndex(rep, s"idx$rep")

    def query(dir: String, q: String, label: String): Unit = {
      val post = spark.read.parquet(dir)
      val stats = spark.read.parquet(s"$dir.stats")
      time(label) {
        Retrieval.bm25TopKFromPostings(post, stats, q, k = 10).count()
      }
    }

    // rare term: posting list ~ corpus/997 — row-group pruning on the
    // term-sorted layout should keep this ~flat across scales
    query(i1, "needlerare", "query-rare-1x")
    query(iN, "needlerare", s"query-rare-${rep}x")
    // hot terms: posting lists are a constant fraction of the corpus —
    // cost tracks the matched lists (linear), which is the honest bound
    query(i1, "table value data", "query-hot-1x")
    query(iN, "table value data", s"query-hot-${rep}x")
    // batch mining: 32 queries over the rep× index in one pass
    val queries32 = spark.range(32).select(col("id").as("qid"),
      concat(lit("table needlerare q"), col("id")).as("qtext"))
    time(s"batch-32q-${rep}x") {
      Retrieval.bm25BatchFromPostings(spark.read.parquet(iN),
        spark.read.parquet(s"$iN.stats"), queries32, "qid", "qtext", k = 10).count()
    }
    spark.stop()
  }
}
