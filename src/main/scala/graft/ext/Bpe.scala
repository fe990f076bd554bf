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

  /** [[trainMerges]] with INCREMENTAL pair-count maintenance — the
    * same merge table, bit-for-bit (BpeSpec proves it), at a
    * per-round cost of O(words containing the merged pair) instead of
    * O(corpus tokens).
    *
    * The observation: merging pair p only changes the pair multiset
    * of words that CONTAIN p — on a natural-language vocabulary
    * that's a shrinking sliver of the word list after the first few
    * hundred merges. So the weighted pair-count frame is kept as loop
    * state alongside the word frame, and each round:
    *  1. argmax straight off the maintained pair counts — a
    *     pair-vocabulary-sized `TakeOrderedAndProject`, no re-explode
    *     of the corpus (the ONE-row collect is the same driver
    *     round-trip as [[trainMerges]]);
    *  2. affected words found by a codegen'd `contains` on the
    *     bracketed state (`"[l][r]"` occurs in `s` iff the pair is
    *     adjacent — the self-delimiting property again); only those
    *     words are rewritten and re-exploded;
    *  3. the pair frame is patched with the exact delta (rewritten
    *     pairs minus previous pairs of the SAME words, one small
    *     union + groupBy), counts ≤ 0 dropped.
    * Both loop frames are checkpoint-per-round with superseded RDDs
    * released. Same contract and stopping rule as [[trainMerges]]. */
  def trainMergesIncremental(words: DataFrame, wordCol: Column, weightCol: Column,
                             rounds: Int, minCount: Long = 2L): DataFrame = {
    require(rounds >= 0, "rounds must be >= 0")
    val spark = words.sparkSession
    val base = words.select(wordCol.as("w"), weightCol.cast("long").as("n"))
      .filter(col("w").isNotNull && length(col("w")) > 0 &&
        !col("w").contains("[") && !col("w").contains("]"))
    var state = base.select(
        concat(lit("["),
          array_join(filter(split(col("w"), ""), c => length(c) > 0), "]["),
          lit("]")).as("s"),
        col("n"))
      .localCheckpoint(true)
    def pairsOf(df: DataFrame, weight: Column): DataFrame = {
      val toks = split(expr("substring(s, 2, length(s) - 2)"), "\\]\\[")
      df.select(explode(zip_with(
          slice(toks, lit(1), size(toks) - 1), slice(toks, lit(2), size(toks) - 1),
          (a, b) => struct(a.as("lhs"), b.as("rhs")))).as("p"), weight.as("n"))
        .select(col("p.lhs").as("lhs"), col("p.rhs").as("rhs"), col("n"))
    }
    var pairs = pairsOf(state, col("n"))
      .groupBy("lhs", "rhs").agg(sum("n").as("cnt"))
      .localCheckpoint(true)
    val merges = scala.collection.mutable.ArrayBuffer.empty[(Int, String, String, Long)]
    var round = 1
    var go = rounds > 0
    while (go) {
      val best = pairs.orderBy(desc("cnt"), col("lhs"), col("rhs"))
        .limit(1).collect()
      best match {
        case Array(r) if r.getLong(2) >= minCount =>
          val l = r.getString(0)
          val rt = r.getString(1)
          merges += ((round, l, rt, r.getLong(2)))
          val pat = s"[$l][$rt]"
          val affected = state.filter(col("s").contains(pat))
          val rewritten = affected
            .select(replace(col("s"), lit(pat), lit(s"[$l$rt]")).as("s"), col("n"))
          val delta = pairsOf(rewritten, col("n"))
            .unionAll(pairsOf(affected, negate(col("n"))))
            .groupBy("lhs", "rhs").agg(sum("n").as("d"))
          val nextPairs = pairs.join(delta, Seq("lhs", "rhs"), "full_outer")
            .select(col("lhs"), col("rhs"),
              (coalesce(col("cnt"), lit(0L)) + coalesce(col("d"), lit(0L))).as("cnt"))
            .filter(col("cnt") > 0)
            .localCheckpoint(true)
          val nextState = state.filter(!col("s").contains(pat))
            .unionAll(rewritten)
            .localCheckpoint(true)
          Checkpoints.unpersist(pairs); Checkpoints.unpersist(state)
          pairs = nextPairs
          state = nextState
          round += 1
          go = round <= rounds
        case _ => go = false
      }
    }
    Checkpoints.unpersist(pairs); Checkpoints.unpersist(state)
    toMergeFrame(spark, merges.toSeq)
  }

  /** The deep-vocabulary trainer: [[trainMerges]]' exact algorithm
    * (same argmax, same tie-break, same greedy rewrite — BpeSpec
    * proves bit-identical tables) run ON THE DRIVER over the
    * collected word list.
    *
    * Why this exists: every distributed round is one Spark job, so a
    * real 30k-merge vocabulary costs 30k sequential jobs in
    * [[trainMerges]]/[[trainMergesIncremental]] — at that depth
    * scheduler latency, not data, dominates, because the DATA stopped
    * being big the moment the corpus collapsed to weighted distinct
    * words. This is the hybrid every production tokenizer pipeline
    * uses (SentencePiece/HF train on a word-count file): Spark does
    * the 100 TB → word-count collapse (the caller's explode +
    * groupBy), the merge loop runs where a vocab-sized list is
    * cheapest. The collect is bounded by contract — `maxWords`
    * (default 10M ≈ hundreds of MB) is enforced with a count before
    * anything is fetched.
    *
    * The driver loop is the INDEXED incremental algorithm (the
    * in-memory twin of [[trainMergesIncremental]]): a pair→count map,
    * a (count desc, lhs, rhs) ordered set for O(log P) argmax, and a
    * pair→words-containing-it index so each round touches only
    * affected words. Total work is O(corpus tokens + Σ affected),
    * independent of round count — 30k merges finish in seconds. */
  def trainMergesDriver(words: DataFrame, wordCol: Column, weightCol: Column,
                        rounds: Int, minCount: Long = 2L,
                        maxWords: Long = 10000000L): DataFrame = {
    require(rounds >= 0, "rounds must be >= 0")
    val spark = words.sparkSession
    // identical word-admission rule to trainMerges (bracket exclusion
    // included) so the tables stay bit-identical on any input
    val base = words.select(wordCol.as("w"), weightCol.cast("long").as("n"))
      .filter(col("w").isNotNull && length(col("w")) > 0 &&
        !col("w").contains("[") && !col("w").contains("]"))
    val nWords = base.count()
    require(nWords <= maxWords,
      s"trainMergesDriver: $nWords words exceeds maxWords=$maxWords — " +
        "collapse further (or use trainMergesIncremental)")
    val state: Array[(Array[String], Long)] = base.collect()
      .map { r =>
        val cps = r.getString(0).codePoints().toArray
          .map(cp => new String(Character.toChars(cp)))
        (cps, r.getLong(1))
      }

    type Pair = (String, String)
    val counts = scala.collection.mutable.HashMap.empty[Pair, Long]
    val occ = scala.collection.mutable.HashMap
      .empty[Pair, scala.collection.mutable.Set[Int]]
    // ordered by (count desc, lhs asc, rhs asc) — the trainMerges
    // argmax ordering, head() is the round winner. String order must
    // be UTF-8 BINARY compare (what Spark's orderBy on strings uses),
    // NOT Java's UTF-16 code-unit compare: the two disagree on
    // supplementary characters vs [U+E000, U+FFFF], and a tie broken
    // differently would fork the merge tables from that round on.
    // UTF-8 byte order == code-point order, so compare code points
    // directly — no per-comparison byte-array allocation inside the
    // TreeSet's O(log P) comparator hot loop
    val utf8Ord: Ordering[String] = (a: String, b: String) => {
      var i = 0
      var j = 0
      var r = 0
      while (r == 0 && i < a.length && j < b.length) {
        val ca = a.codePointAt(i)
        val cb = b.codePointAt(j)
        r = java.lang.Integer.compare(ca, cb)
        i += Character.charCount(ca)
        j += Character.charCount(cb)
      }
      if (r != 0) r
      else java.lang.Integer.compare(a.length - i, b.length - j)
    }
    implicit val ord: Ordering[(Long, String, String)] =
      Ordering.Tuple3(Ordering.Long.reverse, utf8Ord, utf8Ord)
    val sorted = scala.collection.mutable.TreeSet.empty[(Long, String, String)]

    def pairBag(toks: Array[String]): scala.collection.mutable.HashMap[Pair, Long] = {
      val m = scala.collection.mutable.HashMap.empty[Pair, Long]
      var i = 0
      while (i < toks.length - 1) {
        m.updateWith((toks(i), toks(i + 1)))(c => Some(c.getOrElse(0L) + 1L))
        i += 1
      }
      m
    }
    def bump(p: Pair, delta: Long): Unit = {
      val old = counts.getOrElse(p, 0L)
      if (old > 0L) sorted.remove((old, p._1, p._2))
      val nw = old + delta
      if (nw > 0L) { counts(p) = nw; sorted.add((nw, p._1, p._2)) }
      else counts.remove(p)
    }
    // greedy left-to-right non-overlapping single-pair merge — the
    // refMerge/`replace` semantics (a just-merged token does not
    // re-merge within the round)
    def rewrite(toks: Array[String], l: String, r: String): Array[String] = {
      val out = Array.newBuilder[String]
      var i = 0
      while (i < toks.length) {
        if (i + 1 < toks.length && toks(i) == l && toks(i + 1) == r) {
          out += (l + r); i += 2
        } else { out += toks(i); i += 1 }
      }
      out.result()
    }

    for (((toks, n), idx) <- state.zipWithIndex; (p, c) <- pairBag(toks)) {
      bump(p, c * n)
      occ.getOrElseUpdate(p, scala.collection.mutable.Set.empty) += idx
    }
    val merges = scala.collection.mutable.ArrayBuffer.empty[(Int, String, String, Long)]
    var round = 1
    var go = rounds > 0
    while (go && sorted.nonEmpty && sorted.head._1 >= minCount) {
      val (c, l, r) = sorted.head
      merges += ((round, l, r, c))
      val touched = occ.getOrElse((l, r), scala.collection.mutable.Set.empty)
        .toArray
      for (idx <- touched) {
        val (toks, n) = state(idx)
        val before = pairBag(toks)
        val newToks = rewrite(toks, l, r)
        val after = pairBag(newToks)
        state(idx) = (newToks, n)
        for ((p, bc) <- before) {
          val ac = after.getOrElse(p, 0L)
          if (ac != bc) bump(p, (ac - bc) * n)
          if (ac == 0L) occ.get(p).foreach(_ -= idx)
        }
        for ((p, ac) <- after if !before.contains(p)) {
          bump(p, ac * n)
          occ.getOrElseUpdate(p, scala.collection.mutable.Set.empty) += idx
        }
      }
      round += 1
      go = round <= rounds
    }
    toMergeFrame(spark, merges.toSeq)
  }

  /** Re-tokenize words with an already-trained merge list (the apply
    * side of BPE): replays each merge in training order over the
    * bracketed-string state — same greedy semantics as training, so
    * `applyMerges(corpus, trainMerges(corpus, …))` reproduces the
    * training tokenization exactly. The merge table is tiny (vocab
    * size); it is collected once and unrolled into chains of
    * codegen'd `replace` calls — per-row work only, NO shuffle and no
    * per-merge pass over the corpus.
    *
    * Real vocabularies run tens of thousands of merges, and a single
    * projection of 30k nested `replace`s blows past Janino method
    * limits and analyzer tree depth. So the replay is BATCHED:
    * `batchSize` merges fold into one codegen'd projection, the
    * frame is materialized (eager localCheckpoint, superseded blocks
    * released — the [[trainMerges]] loop discipline), and the next
    * batch starts from a flat plan. Every projection stays
    * codegen-sized no matter how long the merge table is, at the
    * cost of one corpus materialization per `batchSize` merges —
    * the sequential-replay semantics are bit-identical to the
    * unbatched chain by construction (BpeSpec proves 1000+ merges
    * against a driver-side replay with codegen fallback disabled).
    * Returns the input plus a `tokens` array column.
    *
    * NOTE on the long-table path (merges > `batchSize`): unlike the
    * fully-lazy short path, it eagerly runs one Spark job per batch
    * AT CALL TIME, and the returned frame is itself an eager
    * checkpoint — every superseded intermediate is released as the
    * replay advances, and the final corpus-sized result stays pinned
    * in executor storage until the caller drops it with [[release]]
    * (the kCore epilogue discipline: without its own checkpoint, the
    * last intermediate could never be freed for the session). */
  def applyMerges(words: DataFrame, wordCol: Column, merges: DataFrame,
                  batchSize: Int = 64): DataFrame = {
    require(batchSize >= 1, "batchSize must be >= 1")
    require(!words.columns.contains("__bpe_s"),
      "applyMerges uses __bpe_s as scratch; rename that input column")
    val ordered = merges.select(col("round").cast("int"),
        col("lhs").cast("string"), col("rhs").cast("string"))
      .collect().sortBy(_.getInt(0))
    val init = concat(lit("["),
      array_join(filter(split(wordCol, ""), c => length(c) > 0), "]["),
      lit("]"))
    def fold(from: Column, ms: Array[Row]): Column =
      ms.foldLeft(from) { (s, m) =>
        val (l, rt) = (m.getString(1), m.getString(2))
        replace(s, lit(s"[$l][$rt]"), lit(s"[$l$rt]"))
      }
    def toTokens(df: DataFrame, s: Column): DataFrame = df
      .withColumn("tokens", split(s.substr(lit(2), length(s) - 2), "\\]\\["))
      .drop("__bpe_s")
    if (ordered.length <= batchSize)
      // short table: one projection, no materialization — the
      // original single-chain path (q_tx_bpe's gate shape)
      toTokens(words, fold(init, ordered))
    else {
      val batches = ordered.grouped(batchSize).toSeq
      var cur = words.withColumn("__bpe_s", fold(init, batches.head))
        .localCheckpoint(true)
      for (b <- batches.tail.dropRight(1)) {
        val next = cur.withColumn("__bpe_s", fold(col("__bpe_s"), b))
          .localCheckpoint(true)
        Checkpoints.unpersist(cur)
        cur = next
      }
      // the final tokens projection materializes into ITS OWN
      // checkpoint so the last intermediate can be released here —
      // returning a Project over `cur` would leave `cur`'s blocks
      // pinned behind a frame no unpersist call can reach (its plan
      // root is the Project, not the LogicalRDD)
      val out = toTokens(cur, fold(col("__bpe_s"), batches.last))
        .localCheckpoint(true)
      Checkpoints.unpersist(cur)
      out
    }
  }

  /** Release the executor storage pinned by [[applyMerges]]' long-
    * table result (a no-op for the short single-projection path, or
    * any other plan shape). Call when the tokens frame — and anything
    * lazily derived from it — is no longer needed. */
  def release(df: DataFrame): Unit = Checkpoints.unpersist(df)

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
