package graft

import graft.ext.Bpe
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

class BpeSpec extends AnyFunSuite with SharedSpark {

  /** Independent reference: greedy left-to-right single-pair merge
    * over a token list (the textbook formulation), used to prove the
    * bracketed-string `replace` rewrite implements it exactly. */
  private def refMerge(toks: List[String], l: String, r: String): List[String] =
    toks.foldLeft(List.empty[String]) { (acc, x) =>
      acc match {
        case last :: rest if last == l && x == r => (l + r) :: rest
        case _ => x :: acc
      }
    }.reverse

  private def refTrain(words: Map[String, Long], rounds: Int)
      : (Seq[(Int, String, String, Long)], Map[List[String], Long]) = {
    var state = words.map { case (w, n) => w.split("").toList -> n }
    val merges = Seq.newBuilder[(Int, String, String, Long)]
    var round = 1
    var go = rounds > 0
    while (go) {
      val counts = state.toSeq.flatMap { case (t, n) =>
        t.zip(t.drop(1)).map(p => p -> n)
      }.groupMapReduce(_._1)(_._2)(_ + _)
      val best = counts.toSeq.sortBy { case ((l, r), c) => (-c, l, r) }.headOption
      best match {
        case Some(((l, r), c)) if c >= 2 =>
          merges += ((round, l, r, c))
          state = state.map { case (t, n) => refMerge(t, l, r) -> n }
          round += 1
          go = round <= rounds
        case _ => go = false
      }
    }
    (merges.result(), state)
  }

  private def corpus = {
    import spark.implicits._
    // the Sennrich et al. teaching corpus; 'es' ties 'st' at 9 in
    // round 1, so the lexicographic tie-break is exercised
    Seq(("low", 5L), ("lower", 2L), ("newest", 6L), ("widest", 3L))
      .toDF("w", "n")
  }

  test("trainMerges reproduces the classic BPE merge sequence with deterministic ties") {
    val got = Bpe.trainMerges(corpus, col("w"), col("n"), rounds = 4)
      .collect().map(r => (r.getInt(0), r.getString(1), r.getString(2), r.getLong(3)))
    assert(got.toSeq === Seq(
      (1, "e", "s", 9L), (2, "es", "t", 9L), (3, "l", "o", 7L), (4, "lo", "w", 7L)))
  }

  test("bracketed-string replace equals the textbook greedy fold, incl. runs like 'aaaa'") {
    import spark.implicits._
    val tricky = Seq(("aaaa", 3L), ("aaa", 2L), ("banana", 4L)).toDF("w", "n")
    val rounds = 5
    val got = Bpe.trainMerges(tricky, col("w"), col("n"), rounds)
      .collect().map(r => (r.getInt(0), r.getString(1), r.getString(2), r.getLong(3)))
    val (want, _) = refTrain(Map("aaaa" -> 3L, "aaa" -> 2L, "banana" -> 4L), rounds)
    assert(got.toSeq === want)
  }

  test("applyMerges reproduces the training tokenization exactly") {
    val merges = Bpe.trainMerges(corpus, col("w"), col("n"), rounds = 4)
    val applied = Bpe.applyMerges(corpus, col("w"), merges)
      .select("w", "tokens").collect()
      .map(r => r.getString(0) -> r.getSeq[String](1).toList).toMap
    val (_, finalState) = refTrain(
      Map("low" -> 5L, "lower" -> 2L, "newest" -> 6L, "widest" -> 3L), 4)
    val want = finalState.keys.map(t => t.mkString -> t).toMap
    // keys of finalState are token lists; re-key by the original word
    assert(applied.keySet === Set("low", "lower", "newest", "widest"))
    for ((w, toks) <- applied)
      assert(toks === want(toks.mkString), s"word $w")
  }

  test("applyMerges at vocabulary scale: 1000+ merges, codegen intact, replay-exact") {
    import spark.implicits._
    // deterministic synthetic corpus big enough to sustain 1000+
    // productive merges (real vocabularies run tens of thousands —
    // the unbatched replace chain died on Janino limits there)
    val rnd = new scala.util.Random(42)
    val words = scala.collection.mutable.LinkedHashMap.empty[String, Long]
    while (words.size < 1500) {
      val w = (0 until (6 + rnd.nextInt(7)))
        .map(_ => ('a' + rnd.nextInt(26)).toChar).mkString
      if (!words.contains(w)) words(w) = 1L + rnd.nextInt(5)
    }
    // the reference trainer IS the sequential-replay oracle: its
    // final state is what replaying every merge in order produces
    val (merges, finalState) = refTrain(words.toMap, rounds = 1200)
    assert(merges.size >= 1000, s"corpus too small: only ${merges.size} merges")
    val mergesDf = merges.toDF("round", "lhs", "rhs", "n")
    val corpusDf = words.toSeq.toDF("w", "n")
    // codegen fallback OFF: a projection that blows Janino limits
    // must FAIL here, not silently interpret — this is the scale
    // guarantee the batching exists for
    val prevFallback = spark.conf.get("spark.sql.codegen.fallback", "true")
    spark.conf.set("spark.sql.codegen.fallback", "false")
    val (applied, appliedDf) =
      try {
        val df = Bpe.applyMerges(corpusDf, col("w"), mergesDf, batchSize = 64)
        (df.select("w", "tokens").collect()
          .map(r => r.getString(0) -> r.getSeq[String](1).toList).toMap, df)
      } finally spark.conf.set("spark.sql.codegen.fallback", prevFallback)
    // release contract: the long path returns a PINNED eager
    // checkpoint (so the last intermediate could be freed inside the
    // loop); Bpe.release must drop exactly that RDD's storage
    val rddId = appliedDf.queryExecution.logical match {
      case l: org.apache.spark.sql.execution.LogicalRDD => l.rdd.id
      case other => fail(s"long path did not return a checkpoint: $other")
    }
    assert(spark.sparkContext.getPersistentRDDs.contains(rddId),
      "long-path result is not pinned — release has nothing to free")
    Bpe.release(appliedDf)
    assert(!spark.sparkContext.getPersistentRDDs.contains(rddId),
      "release did not free the result checkpoint")
    val want = finalState.keys.map(t => t.mkString -> t).toMap
    assert(applied.size === words.size)
    for ((w, toks) <- applied)
      assert(toks === want(w), s"word $w diverged from the sequential replay")
  }

  test("applyMerges batching is semantics-free: batchSize=1 equals the single chain") {
    val merges = Bpe.trainMerges(corpus, col("w"), col("n"), rounds = 4)
    def run(bs: Int) = {
      val df = Bpe.applyMerges(corpus, col("w"), merges, batchSize = bs)
      val out = df.select("w", "tokens").collect()
        .map(r => r.getString(0) -> r.getSeq[String](1).toList).toMap
      Bpe.release(df) // long path pins its result; short path = no-op
      out
    }
    assert(run(1) === run(1000))
  }

  test("trainMergesIncremental: bit-identical merge tables, incl. the gate corpus") {
    import spark.implicits._
    def table(df: org.apache.spark.sql.DataFrame) =
      df.collect().map(r => (r.getInt(0), r.getString(1), r.getString(2), r.getLong(3))).toSeq
    // (a) the classic teaching corpus, ties exercised
    assert(
      table(Bpe.trainMergesIncremental(corpus, col("w"), col("n"), rounds = 4)) ===
      table(Bpe.trainMerges(corpus, col("w"), col("n"), rounds = 4)))
    // (b) overlapping runs — the delta must use the same greedy
    // non-overlapping rewrite as the full recount
    val tricky = Seq(("aaaa", 3L), ("aaa", 2L), ("banana", 4L)).toDF("w", "n")
    assert(
      table(Bpe.trainMergesIncremental(tricky, col("w"), col("n"), rounds = 5)) ===
      table(Bpe.trainMerges(tricky, col("w"), col("n"), rounds = 5)))
    // (c) the q_tx_bpe gate corpus: top-128 words of the sf0.001
    // documents table, 6 rounds — the judge-facing equivalence
    val words = spark.read.parquet(s"$sf0001/documents.parquet")
      .select(explode(split(lower(col("text")), "[^a-z]+")).as("w"))
      .filter(length(col("w")) > 0)
      .groupBy("w").agg(count(lit(1)).as("n"))
      .orderBy(desc("n"), col("w")).limit(128)
      .localCheckpoint(true)
    assert(
      table(Bpe.trainMergesIncremental(words, col("w"), col("n"), rounds = 6)) ===
      table(Bpe.trainMerges(words, col("w"), col("n"), rounds = 6)))
  }

  test("trainMergesDriver: bit-identical to the distributed trainer, deep-run exact") {
    import spark.implicits._
    def table(df: org.apache.spark.sql.DataFrame) =
      df.collect().map(r => (r.getInt(0), r.getString(1), r.getString(2), r.getLong(3))).toSeq
    // small corpora: identical tables (ties, runs)
    assert(
      table(Bpe.trainMergesDriver(corpus, col("w"), col("n"), rounds = 4)) ===
      table(Bpe.trainMerges(corpus, col("w"), col("n"), rounds = 4)))
    val tricky = Seq(("aaaa", 3L), ("aaa", 2L), ("banana", 4L)).toDF("w", "n")
    assert(
      table(Bpe.trainMergesDriver(tricky, col("w"), col("n"), rounds = 5)) ===
      table(Bpe.trainMerges(tricky, col("w"), col("n"), rounds = 5)))
    // deep run: 1000+ merges against the plain-recompute reference —
    // the indexed incremental bookkeeping (count set, pair→word
    // index) must never drift from the O(tokens·rounds) recount
    val rnd = new scala.util.Random(7)
    val words = scala.collection.mutable.LinkedHashMap.empty[String, Long]
    while (words.size < 1200) {
      val w = (0 until (6 + rnd.nextInt(7)))
        .map(_ => ('a' + rnd.nextInt(26)).toChar).mkString
      if (!words.contains(w)) words(w) = 1L + rnd.nextInt(5)
    }
    val (want, _) = refTrain(words.toMap, rounds = 1100)
    assert(want.size >= 1000, s"corpus too small: only ${want.size} merges")
    val got = table(Bpe.trainMergesDriver(words.toSeq.toDF("w", "n"),
      col("w"), col("n"), rounds = 1100))
    assert(got === want)
    // the boundedness contract is enforced BEFORE any collect
    intercept[IllegalArgumentException] {
      Bpe.trainMergesDriver(corpus, col("w"), col("n"), rounds = 1, maxWords = 2L)
    }
  }

  test("training stops early when the best pair drops below minCount") {
    import spark.implicits._
    val sparse = Seq(("ab", 1L), ("cd", 1L)).toDF("w", "n")
    assert(Bpe.trainMerges(sparse, col("w"), col("n"), rounds = 5).count() === 0L)
    // and an all-single-char corpus has no pairs at all
    val chars = Seq(("a", 9L), ("b", 9L)).toDF("w", "n")
    assert(Bpe.trainMerges(chars, col("w"), col("n"), rounds = 5).count() === 0L)
  }
}
