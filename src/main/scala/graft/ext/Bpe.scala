package graft.ext

import org.apache.spark.sql.{Column, DataFrame, Row, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{IntegerType, LongType, StringType, StructField, StructType}

/** Distributed byte-pair-encoding merge training — the tokenizer-
  * bootstrap stage of a training-data pipeline (Sennrich et al. 2016,
  * the construction behind GPT-2/SentencePiece vocabularies).
  *
  * Input: a weighted word list `(word, n)` — typically the output of
  * a corpus word count, which is where the 100 TB of text collapses
  * to something iterable. Each round:
  *  1. count adjacent token pairs across all words, weighted by word
  *     frequency — ONE distributed explode + groupBy(pair) shuffle
  *     of O(corpus tokens) rows with map-side partial aggregation;
  *  2. take the argmax pair (count desc, then lexicographic — the
  *     deterministic tie-break) via `TakeOrderedAndProject`: ONE
  *     single-row collect to the driver per round, the same loop
  *     discipline as [[GraphRank.pageRankUntilConverged]];
  *  3. rewrite every word, merging that pair greedily left-to-right.
  *
  * Token state rides in a bracketed string (`"[l][o][w]"`) so the
  * merge rewrite is ONE codegen'd literal `replace` per word —
  * `replace(s, "[l][o]", "[lo]")` — instead of an interpreted
  * array-fold lambda. The wrapping makes occurrences self-delimiting:
  * a pattern can neither straddle token boundaries (`[ab][c]` never
  * contains `[b][c]`) nor overlap a prior replacement (replace scans
  * forward past each substitution), which is exactly the greedy
  * non-overlapping semantics of the classic algorithm; a token just
  * merged does NOT re-merge within the same round.
  *
  * The word frame is localCheckpoint'ed each round and the
  * superseded checkpoint's RDD blocks released ([[Checkpoints]]), so
  * `rounds` can be large (real vocabularies run tens of thousands of
  * merges) without lineage growth or storage accumulation.
  *
  * Words must not contain `[` or `]` (enforced); train on the output
  * of an alphabetic word split. Training stops early when the best
  * pair's weighted count drops below `minCount`.
  *
  * Returns the merge table `(round, lhs, rhs, n)` — rounds 1-based in
  * merge order, `n` the weighted pair count that won the round.
  */
object Bpe {

  def trainMerges(words: DataFrame, wordCol: Column, weightCol: Column,
                  rounds: Int, minCount: Long = 2L): DataFrame = {
    require(rounds >= 0, "rounds must be >= 0")
    val spark = words.sparkSession
    val base = words.select(wordCol.as("w"), weightCol.cast("long").as("n"))
      .filter(col("w").isNotNull && length(col("w")) > 0 &&
        !col("w").contains("[") && !col("w").contains("]"))
    // "[c][h][a][r]" initial state: one bracketed token per character
    var state = base.select(
        concat(lit("["),
          array_join(filter(split(col("w"), ""), c => length(c) > 0), "]["),
          lit("]")).as("s"),
        col("n"))
      .localCheckpoint(true)
    val merges = scala.collection.mutable.ArrayBuffer.empty[(Int, String, String, Long)]
    var round = 1
    var go = rounds > 0
    while (go) {
      val toks = split(expr("substring(s, 2, length(s) - 2)"), "\\]\\[")
      val best = state
        .select(explode(zip_with(
          slice(toks, lit(1), size(toks) - 1), slice(toks, lit(2), size(toks) - 1),
          (a, b) => struct(a.as("lhs"), b.as("rhs")))).as("p"), col("n"))
        .groupBy(col("p.lhs"), col("p.rhs")).agg(sum("n").as("cnt"))
        .orderBy(desc("cnt"), col("lhs"), col("rhs"))
        .limit(1).collect()
      best match {
        case Array(r) if r.getLong(2) >= minCount =>
          val l = r.getString(0)
          val rt = r.getString(1)
          val c = r.getLong(2)
          merges += ((round, l, rt, c))
          val next = state.select(
              replace(col("s"), lit(s"[$l][$rt]"), lit(s"[$l$rt]")).as("s"),
              col("n"))
            .localCheckpoint(true)
          Checkpoints.unpersist(state)
          state = next
          round += 1
          go = round <= rounds
        case _ => go = false
      }
    }
    Checkpoints.unpersist(state)
    toMergeFrame(spark, merges.toSeq)
  }

  /** Re-tokenize words with an already-trained merge list (the apply
    * side of BPE): replays each merge in training order over the
    * bracketed-string state — same greedy semantics as training, so
    * `applyMerges(corpus, trainMerges(corpus, …))` reproduces the
    * training tokenization exactly. The merge table is tiny (vocab
    * size); it is collected once and unrolled into a chain of
    * codegen'd `replace` calls — per-row work only, NO shuffle and no
    * per-merge pass over the corpus. Returns the input plus a
    * `tokens` array column. */
  def applyMerges(words: DataFrame, wordCol: Column, merges: DataFrame): DataFrame = {
    val ordered = merges.select(col("round").cast("int"),
        col("lhs").cast("string"), col("rhs").cast("string"))
      .collect().sortBy(_.getInt(0))
    val init = concat(lit("["),
      array_join(filter(split(wordCol, ""), c => length(c) > 0), "]["),
      lit("]"))
    val merged = ordered.foldLeft(init: Column) { (s, m) =>
      val (l, rt) = (m.getString(1), m.getString(2))
      replace(s, lit(s"[$l][$rt]"), lit(s"[$l$rt]"))
    }
    words.withColumn("tokens",
      split(merged.substr(lit(2), length(merged) - 2), "\\]\\["))
  }

  private def toMergeFrame(spark: SparkSession,
                           ms: Seq[(Int, String, String, Long)]): DataFrame = {
    val schema = StructType(Seq(
      StructField("round", IntegerType, nullable = false),
      StructField("lhs", StringType, nullable = false),
      StructField("rhs", StringType, nullable = false),
      StructField("n", LongType, nullable = false)))
    spark.createDataFrame(
      spark.sparkContext.parallelize(ms.map(m => Row(m._1, m._2, m._3, m._4)), 1),
      schema)
  }
}
