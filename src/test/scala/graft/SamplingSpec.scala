package graft

import graft.ext.Sampling
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

class SamplingSpec extends AnyFunSuite with SharedSpark {

  private lazy val docs = graft.sources.Tables(spark, sf0001).table("documents")

  test("hashSample: deterministic across runs and partitionings, fraction ≈ target") {
    val a = Sampling.hashSample(docs, col("doc_id"), 0.3).collect().map(_.getLong(0)).toSet
    val b = Sampling.hashSample(docs.repartition(7), col("doc_id"), 0.3)
      .collect().map(_.getLong(0)).toSet
    assert(a === b)
    val frac = a.size.toDouble / docs.count()
    assert(math.abs(frac - 0.3) < 0.1, s"got $frac")
    // different salt → different (deterministic) subset
    val c = Sampling.hashSample(docs, col("doc_id"), 0.3, salt = 1)
      .collect().map(_.getLong(0)).toSet
    assert(c !== a)
  }

  test("split: disjoint, exhaustive, weight-proportional") {
    val out = Sampling.split(docs, col("doc_id"), Seq("train" -> 0.8, "eval" -> 0.2))
    val counts = out.groupBy("split").count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(counts.keySet === Set("train", "eval"))
    assert(counts.values.sum === docs.count())
    val evalFrac = counts("eval").toDouble / docs.count()
    assert(math.abs(evalFrac - 0.2) < 0.08, s"got $evalFrac")
    // stability: same row → same split, regardless of partitioning
    val m1 = out.select("doc_id", "split").collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    val m2 = Sampling.split(docs.repartition(5), col("doc_id"), Seq("train" -> 0.8, "eval" -> 0.2))
      .select("doc_id", "split").collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    assert(m1 === m2)
  }

  test("stratifiedSample downsamples listed strata only") {
    val before = docs.groupBy("lang").count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    val sampled = Sampling.stratifiedSample(docs, col("doc_id"), col("lang"),
      Map("en" -> 0.2))
    val after = sampled.groupBy("lang").count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(after("en") < before("en") * 0.5, s"en should shrink: ${after("en")}/${before("en")}")
    (before.keySet - "en").foreach { l =>
      assert(after.getOrElse(l, 0L) === before(l), s"stratum $l must be untouched")
    }
  }

  test("leakFreeSplit: no near-dup pair ever straddles the train/eval cut") {
    val corpus = docs.select("doc_id", "text")
    val out = Sampling.leakFreeSplit(corpus, "doc_id", "text",
      Seq("train" -> 0.9, "eval" -> 0.1), n = 5, threshold = 0.6)
      .select("doc_id", "split")
      .collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    assert(out.size === corpus.count())
    val pairs = graft.ext.Dedup.jaccardPairs(corpus, "doc_id", "text",
      n = 5, threshold = 0.6).collect().map(r => (r.getLong(0), r.getLong(1)))
    assert(pairs.nonEmpty, "fixture must contain near-dups for this to test anything")
    pairs.foreach { case (a, b) =>
      assert(out(a) === out(b), s"pair ($a, $b) straddles the split")
    }
    assert(out.values.toSet === Set("train", "eval"), "both splits populated")
  }

  test("temperatureSample: alpha=1 keeps natural proportions; alpha=0.5 flattens toward rare strata") {
    import spark.implicits._
    // 800 "big" docs vs 50 "rare" docs, unique integer keys
    val df = ((0 until 800).map(i => (i.toLong, "big")) ++
      (800 until 850).map(i => (i.toLong, "rare"))).toDF("id", "s")
    // alpha = 1: p(s) ∝ n_s, so every stratum keeps ~targetFraction
    val nat = Sampling.temperatureSample(df, col("id"), col("s"),
      alpha = 1.0, targetFraction = 0.5)
      .groupBy("s").count().collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(nat("big") > 300 && nat("big") < 500, s"~50% of big: $nat")
    assert(nat("rare") > 10 && nat("rare") < 40, s"~50% of rare: $nat")
    // alpha = 0.5: rare stratum's keep fraction rises (here to the
    // cap f=1: 0.5·850·(sqrt50/(sqrt800+sqrt50))/50 ≈ 1.7 → capped),
    // the big stratum funds it by dropping below 50%
    val flat = Sampling.temperatureSample(df, col("id"), col("s"),
      alpha = 0.5, targetFraction = 0.5)
      .groupBy("s").count().collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(flat("rare") === 50L, s"capped rare stratum keeps everything: $flat")
    assert(flat("big") < nat("big"), s"big stratum shrinks under flattening: $flat vs $nat")
    // determinism: same inputs → identical membership across runs
    val again = Sampling.temperatureSample(df.repartition(7), col("id"), col("s"),
      alpha = 0.5, targetFraction = 0.5).select("id").collect().map(_.getLong(0)).toSet
    val first = Sampling.temperatureSample(df, col("id"), col("s"),
      alpha = 0.5, targetFraction = 0.5).select("id").collect().map(_.getLong(0)).toSet
    assert(again === first, "membership is partition-order independent")
  }

  test("prioritySample: inclusion odds track weights; deterministic; top-k plan") {
    import spark.implicits._
    // 10k keys, weight 9 for even ids and 1 for odd: a 9:1 odds ratio
    // means k=1000 picks ~900 heavy rows (DLT inclusion ∝ w)
    val df = (0L until 10000L).map(id => (id * 7919L + 13L, if (id % 2 == 0) 9L else 1L))
      .toDF("id", "w")
    val got = Sampling.prioritySample(df, col("id"), col("w"), k = 1000)
    val heavy = got.filter(col("w") === 9L).count()
    assert(heavy > 820 && heavy < 960, s"heavy rows in sample: $heavy (expect ~900)")
    // doubled weight exactly halves the priority
    val p = Sampling.prioritySample(df.withColumn("w", lit(4L)), col("id"), col("w"), 10)
      .select("id", "priority").collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    val p2 = Sampling.prioritySample(df.withColumn("w", lit(8L)), col("id"), col("w"), 10)
      .select("id", "priority").collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(p.keySet === p2.keySet, "membership is weight-scale invariant")
    p.foreach { case (id, pri) => assert(p2(id) === pri / 2, s"id $id") }
    // partition-order independence
    val again = Sampling.prioritySample(df.repartition(7), col("id"), col("w"), 1000)
      .select("id").collect().map(_.getLong(0)).toSet
    assert(again === got.select("id").collect().map(_.getLong(0)).toSet)
    // bounded-state top-k, not a full sort
    val q = Sampling.prioritySample(df, col("id"), col("w"), 1000)
    q.write.format("noop").mode("overwrite").save()
    assert(q.queryExecution.executedPlan.toString.contains("TakeOrderedAndProject"),
      q.queryExecution.executedPlan.toString)
  }

  test("negativePairs: k or k-1 per query, corpus-covering, deterministic, no cross join") {
    import spark.implicits._
    val corpus = (0L until 500L).map(i => i * 3L).toDF("id") // sparse ids
    val queries = (0L until 100L).map(i => i * 3L).toDF("id")
    val pairs = Sampling.negativePairs(queries, col("id"), corpus, col("id"), k = 5)
    val rows = pairs.collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    // every query yields 5 negatives, minus any dropped self-pair
    val perQ = rows.groupBy(_._1).view.mapValues(_.length).toMap
    assert(perQ.size === 100)
    assert(perQ.values.forall(n => n == 5 || n == 4), perQ.filter(_._2 < 4).toString)
    // negatives are real corpus members and never the query itself
    val corpusIds = (0L until 500L).map(_ * 3L).toSet
    assert(rows.forall { case (q, _, n) => corpusIds(n) && n != q })
    // draws spread over the corpus, not a corner of it
    assert(rows.map(_._3).distinct.length > 200, "draws cover the corpus")
    // deterministic across partitionings
    val again = Sampling.negativePairs(queries.repartition(7), col("id"),
      corpus.repartition(5), col("id"), k = 5)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    assert(again === rows.toSet)
    // one equi-join on the index; the only nested-loop is the 1-row count broadcast
    pairs.write.format("noop").mode("overwrite").save()
    val plan = pairs.queryExecution.executedPlan.toString
    assert(!plan.contains("CartesianProduct"), plan)
  }

  test("dsirSelect ranks target-domain-like docs first, deterministically") {
    import spark.implicits._
    // target domain speaks one vocabulary; the raw pool mixes docs in
    // that vocabulary with docs in a disjoint one
    val target = (0L until 20L)
      .map(i => (i, s"alpha beta gamma delta epsilon zeta eta theta iota v$i"))
      .toDF("doc_id", "text")
    val inDomain = (100L until 110L)
      .map(i => (i, "alpha beta gamma delta epsilon zeta"))
    val offDomain = (200L until 230L)
      .map(i => (i, "uno dos tres cuatro cinco seis siete ocho"))
    val raw = (inDomain ++ offDomain).toDF("doc_id", "text")
    val picked = graft.ext.CorpusStats.dsirSelect(raw, target, k = 10)
      .collect().map(_.getLong(0)).toSet
    assert(picked === inDomain.map(_._1).toSet,
      s"selection leaked off-domain docs: $picked")
    // scores are partition-order independent (integer-grid sums)
    val again = graft.ext.CorpusStats
      .dsirSelect(raw.repartition(7), target.repartition(3), k = 10)
      .collect().map(_.getLong(0)).toSet
    assert(again === picked)
  }

  test("budgetWaterfill: spends the budget exactly, respects caps, levels the rest") {
    import spark.implicits._
    def run(caps: Seq[(String, Long)], budget: Long): Map[String, (Long, Long)] =
      Sampling.budgetWaterfill(
          caps.toDF("src", "w").repartition(3), col("src"), col("w"), budget)
        .collect().map(r => r.getString(0) -> (r.getLong(1), r.getLong(2))).toMap
    // mixed capped/uncapped with a remainder
    val out = run(Seq("a" -> 10L, "b" -> 100L, "c" -> 100L, "d" -> 3L), 60L)
    assert(out.forall { case (_, (cap, alloc)) => alloc >= 0 && alloc <= cap })
    assert(out.values.map(_._2).sum === 60L)
    assert(out("d")._2 === 3L && out("a")._2 === 10L, "small sources taken whole")
    // remainder goes to the first uncapped in (cap, source) order: level
    // is (60-13)/2 = 23 rem 1 -> b gets 24, c gets 23
    assert(out("b")._2 === 24L && out("c")._2 === 23L)
    // budget above total capacity: everything capped, nothing invented
    val all = run(Seq("a" -> 5L, "b" -> 7L), 100L)
    assert(all("a")._2 === 5L && all("b")._2 === 7L)
    // equal caps, indivisible budget: remainder is deterministic by name
    val eq = run(Seq("x" -> 9L, "y" -> 9L, "z" -> 9L), 7L)
    assert(eq.values.map(_._2).sum === 7L)
    assert(eq("x")._2 === 3L && eq("y")._2 === 2L && eq("z")._2 === 2L)
  }

  test("waterfillSample: per-source prefixes never overrun, stable under repartition") {
    val budget = 100000L
    val out = Sampling.waterfillSample(docs, col("source"), col("doc_id"),
      col("n_chars"), budget)
    val rows = out.collect().map(r =>
      (r.getString(0), r.getLong(1), r.getLong(2), r.getLong(3)))
    assert(rows.nonEmpty && rows.map(_._3).sum <= budget)
    // within each source, taken docs form a contiguous cum prefix
    for ((_, grp) <- rows.groupBy(_._1)) {
      val sorted = grp.sortBy(_._4)
      assert(sorted.zip(sorted.scanLeft(0L)(_ + _._3).tail)
        .forall { case ((_, _, _, cum), expect) => cum == expect },
        "cum_w is not a dense prefix sum of the taken docs")
    }
    val again = Sampling.waterfillSample(docs.repartition(7), col("source"),
        col("doc_id"), col("n_chars"), budget)
      .collect().map(r => (r.getString(0), r.getLong(1))).toSet
    assert(again === rows.map(r => (r._1, r._2)).toSet)
  }

  test("epochShuffle: exact permutation, dense per-shard positions, layout-proof, epoch-distinct") {
    import spark.implicits._
    val ids = (0L until 500L).toDF("id")
    def manifest(epoch: Int, df: org.apache.spark.sql.DataFrame) =
      Sampling.epochShuffle(df, col("id"), epoch, shards = 8)
        .select("id", "shard", "pos")
        .collect().map(r => (r.getLong(0), r.getInt(1), r.getLong(2)))
    val e0 = manifest(0, ids)
    // a permutation: every key exactly once, (shard, pos) slots unique
    assert(e0.map(_._1).toSet === (0L until 500L).toSet)
    assert(e0.map(t => (t._2, t._3)).distinct.length === 500)
    // dense per-shard positions 0..n_s-1
    e0.groupBy(_._2).foreach { case (_, rows) =>
      assert(rows.map(_._3).sorted.toSeq === (0L until rows.length).toSeq)
    }
    // physical layout must not matter
    assert(manifest(0, ids.repartition(13)).toSet === e0.toSet)
    // a different epoch is a genuinely different permutation
    val e1 = manifest(1, ids)
    val moved = e0.toSet.diff(e1.toSet).size
    assert(moved > 400, s"epoch 1 should reshuffle nearly everything, moved $moved")
  }

  test("topPSelect: per-group quality mass, crossing row kept, exact replay") {
    import spark.implicits._
    // group A total 100: scores 50,30,15,5 → p=0.6: 50 (cum 50) kept,
    // 30 kept (cum_prev 50 < 60), 15 dropped (cum_prev 80 ≥ 60).
    // group B flat 10×4 → p=0.6: cum_prev 0,10,20 < 24 keep 3 rows.
    val df = Seq(
      ("A", 1L, 50L), ("A", 2L, 30L), ("A", 3L, 15L), ("A", 4L, 5L),
      ("B", 5L, 10L), ("B", 6L, 10L), ("B", 7L, 10L), ("B", 8L, 10L)
    ).toDF("g", "id", "score")
    def kept(d: org.apache.spark.sql.DataFrame): Seq[Long] =
      Sampling.topPSelect(d, col("g"), col("id"), col("score"), 3, 5)
        .select("id").collect().map(_.getLong(0)).toSeq.sorted
    assert(kept(df) === Seq(1L, 2L, 5L, 6L, 7L))
    // partition-order independent
    assert(kept(df.repartition(7)) === Seq(1L, 2L, 5L, 6L, 7L))
    // ties break to the smaller id: equal top scores, tiny p keeps
    // exactly the first-ranked row — which must be id 1
    val tie = Seq(("C", 1L, 10L), ("C", 2L, 10L)).toDF("g", "id", "score")
    assert(Sampling.topPSelect(tie, col("g"), col("id"), col("score"), 1, 100)
      .select("id").collect().map(_.getLong(0)).toSeq === Seq(1L))
    // p = 1 keeps everything; every non-empty group keeps ≥ 1 row
    assert(Sampling.topPSelect(df, col("g"), col("id"), col("score"), 1, 1)
      .count() === 8)
    val skew = Seq(("D", 1L, 1000L), ("D", 2L, 1L)).toDF("g", "id", "score")
    assert(Sampling.topPSelect(skew, col("g"), col("id"), col("score"), 1, 100)
      .select("id").collect().map(_.getLong(0)).toSeq === Seq(1L))
  }
}
