package graft

import graft.ext.Dedup
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions.{col, levenshtein}
import org.scalatest.funsuite.AnyFunSuite

/** Dedup operators on an engineered corpus: exact duplicates, a
  * near-duplicate pair (one word changed), and unrelated documents.
  * All methods must find the planted pairs and no cross-topic pairs. */
class DedupSpec extends AnyFunSuite with SharedSpark {

  private def mk(words: Seq[String]): String = words.mkString(" ")

  private lazy val corpus: DataFrame = {
    import spark.implicits._
    val base = (1 to 40).map(i => s"w$i")            // 40-word doc
    val near = base.updated(20, "CHANGED")           // 1-word edit
    val other = (1 to 40).map(i => s"z$i")           // disjoint vocab
    Seq(
      (0L, mk(base)),
      (1L, mk(base)),            // exact dup of 0
      (2L, mk(near)),            // near dup of 0/1
      (3L, mk(other)),           // unrelated
      (4L, "tiny doc")           // < 5 words → no shingles
    ).toDF("doc_id", "text")
  }

  test("exact dedup groups identical texts, keeps lowest id") {
    val out = Dedup.exact(corpus, "doc_id", "text").collect()
      .map(r => r.getLong(1) -> r.getLong(2)).toMap  // keep_id -> n_copies
    assert(out(0L) === 2)                            // docs 0,1 merged
    assert(out.values.sum === 5)
    assert(!out.contains(1L), "representative is min(doc_id)")
  }

  test("jaccard pairs: finds exact and near dup, not unrelated") {
    val pairs = Dedup.jaccardPairs(corpus, "doc_id", "text", n = 5, threshold = 0.5)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2)))
    val keys = pairs.map(p => (p._1, p._2)).toSet
    assert(keys.contains((0L, 1L)), "exact dup pair")
    val exact = pairs.find(p => (p._1, p._2) == ((0L, 1L))).get
    assert(exact._3 === 1.0)
    // near-dup: 1-word edit in 40 words kills 5 of 36 shingles →
    // jaccard = 31/41 ≈ 0.756
    assert(keys.contains((0L, 2L)) && keys.contains((1L, 2L)))
    assert(pairs.forall(p => p._2 != 3L && p._1 != 3L), "unrelated doc never pairs")
  }

  test("minhash-LSH pairs find the same planted dups") {
    val pairs = Dedup.minhashLshPairs(corpus, "doc_id", "text", threshold = 0.5)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2)))
    val keys = pairs.map(p => (p._1, p._2)).toSet
    assert(keys.contains((0L, 1L)))
    val exact = pairs.find(p => (p._1, p._2) == ((0L, 1L))).get
    assert(exact._3 === 1.0, "identical docs have identical signatures")
    assert(keys.contains((0L, 2L)), "near dup caught by LSH banding")
    assert(pairs.forall(p => p._2 != 3L && p._1 != 3L))
  }

  test("minhash estimate approximates true jaccard") {
    val est = Dedup.minhashLshPairs(corpus, "doc_id", "text", threshold = 0.3)
      .collect().map(r => ((r.getLong(0), r.getLong(1)), r.getDouble(2))).toMap
    val truth = 31.0 / 41.0
    est.get((0L, 2L)).foreach(e => assert(math.abs(e - truth) < 0.3))
  }

  test("simhash: identical docs → distance 0; near dup within threshold; unrelated apart") {
    val sigs = Dedup.simhashSignatures(corpus, "doc_id", "text")
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(sigs(0L) === sigs(1L))
    def ham(a: Long, b: Long) = java.lang.Long.bitCount(a ^ b)
    assert(ham(sigs(0L), sigs(2L)) <= 16, "1-word edit moves few bits")
    assert(ham(sigs(0L), sigs(3L)) > 16, "disjoint vocab far apart")

    val pairs = Dedup.simhashPairs(corpus, "doc_id", "text", maxHamming = 16)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(pairs.contains((0L, 1L)))
  }

  test("randomized cross-check: inverted-index jaccard equals brute-force jaccard") {
    import spark.implicits._
    val rnd = new scala.util.Random(7)
    val vocab = (1 to 30).map(i => s"w$i")
    // overlapping random docs (drawn from a small vocab → real overlaps)
    val docs = (0 until 40).map { i =>
      (i.toLong, (1 to 20).map(_ => vocab(rnd.nextInt(vocab.length))).mkString(" "))
    }
    val df = docs.toDF("doc_id", "text")
    val got = Dedup.jaccardPairs(df, "doc_id", "text", n = 3, threshold = 0.2)
      .collect().map(r => (r.getLong(0), r.getLong(1)) -> r.getDouble(2)).toMap
    // driver-side reference
    def shingles(t: String): Set[String] =
      t.toLowerCase.split("\\s+").sliding(3).map(_.mkString(" ")).toSet
    val ref = for {
      (i, ti) <- docs; (j, tj) <- docs if i < j
      si = shingles(ti); sj = shingles(tj)
      inter = (si & sj).size if inter > 0
      jac = inter.toDouble / (si | sj).size if jac >= 0.2
    } yield (i, j) -> math.rint(jac * 10000) / 10000
    assert(got === ref.toMap)
  }

  test("signatures are deterministic across runs and partitioning") {
    val a = Dedup.minhashSignatures(corpus, "doc_id", "text", 5, 32)
      .collect().map(r => r.getLong(0) -> r.getSeq[Long](1)).toMap
    val b = Dedup.minhashSignatures(corpus.repartition(7), "doc_id", "text", 5, 32)
      .collect().map(r => r.getLong(0) -> r.getSeq[Long](1)).toMap
    assert(a === b)
  }

  test("clusters: transitive closure merges chained pairs, separates components") {
    import spark.implicits._
    // A~B, B~C but no A~C pair: must still be ONE cluster — the case
    // a pairs-only dedup under-deletes
    val pairs = Seq((1L, 2L), (2L, 3L), (10L, 11L)).toDF("d1", "d2")
    val got = Dedup.clusters(pairs).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(got === Map(1L -> 1L, 2L -> 1L, 3L -> 1L, 10L -> 10L, 11L -> 10L))
  }

  test("clusters: converges on a long path graph (multi-round propagation)") {
    import spark.implicits._
    // path 0-1-2-...-19 forces label 0 to travel the full diameter;
    // hash-to-min halves the frontier distance per round, so this
    // also guards the convergence detection (label-sum fixpoint)
    val pairs = (0L until 19L).map(i => (i, i + 1)).toDF("d1", "d2")
    val got = Dedup.clusters(pairs).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(got.size === 20)
    assert(got.values.toSet === Set(0L), s"all labels must reach 0: $got")
  }

  test("containmentPairs: finds the quoted fragment that Jaccard misses, directed") {
    import spark.implicits._
    val big = (1 to 40).map(i => s"w$i")
    val frag = big.slice(10, 24) // 14 words → 10 shingles, all inside big
    val df = Seq(
      (1L, mk(big)),
      (2L, mk(frag)),
      (3L, mk((1 to 12).map(i => s"q$i")))).toDF("doc_id", "text")
    val got = Dedup.containmentPairs(df, "doc_id", "text", n = 5, threshold = 0.8)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSeq
    // only the fragment→container direction qualifies (C = 10/10);
    // the reverse is 10/36 and the unrelated doc never pairs
    assert(got === Seq((2L, 1L, 1.0)), s"got $got")
    assert(Dedup.jaccardPairs(df, "doc_id", "text", n = 5, threshold = 0.6)
      .collect().isEmpty, "symmetric Jaccard pass must miss the quote (J = 10/36)")
  }

  test("shingleNovelty: dups score 0, disjoint docs 1, near-dup the exact shared fraction") {
    val got = Dedup.shingleNovelty(corpus, "doc_id", "text", n = 5)
      .collect().map(r => r.getLong(0) ->
        (if (r.isNullAt(3)) None else Some(r.getDouble(3)))).toMap
    assert(got(0L) === Some(0.0), "exact dup shares every shingle")
    assert(got(1L) === Some(0.0))
    // 1-word edit in 40 words: 5 of 36 shingles are unique to doc 2
    assert(got(2L) === Some(math.round(5.0 / 36.0 * 1e6) / 1e6))
    assert(got(3L) === Some(1.0), "disjoint vocabulary is fully novel")
    assert(got(4L) === None, "sub-5-token doc has no shingles")
  }

  test("boilerplateShingles: finds exactly the shingles shared by the dup trio") {
    val got = Dedup.boilerplateShingles(corpus, "doc_id", "text", n = 5, minDocs = 3)
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    // docs 0, 1, 2 share all shingles except the 5 covering the edit
    assert(got.nonEmpty && got.values.forall(_ === 3L))
    assert(got.size === 36 - 5, s"${got.size} shingles in ≥3 docs")
    assert(got.keys.forall(!_.contains("changed")), "edited window is not boilerplate")
  }

  test("decontaminate: flags exactly the docs sharing an eval n-gram; eval side broadcasts") {
    import spark.implicits._
    val evalSet = Seq((100L, mk((1 to 10).map(i => s"e$i")))).toDF("doc_id", "text")
    val corpus = Seq(
      // shares the eval doc's tokens 3..7 as one 5-gram, rest disjoint
      (0L, mk(Seq("x1", "x2") ++ (3 to 7).map(i => s"e$i") ++ Seq("x3", "x4"))),
      (1L, mk((1 to 12).map(i => s"c$i"))),      // clean
      (2L, mk((1 to 10).map(i => s"e$i"))),      // verbatim eval copy
      (3L, "tiny doc")                           // < 5 words → no shingles
    ).toDF("doc_id", "text")
    val out = Dedup.decontaminate(corpus, evalSet, "doc_id", "text", n = 5)
    val got = out.collect().map(r => r.getLong(0) -> (r.getLong(1), r.getBoolean(2))).toMap
    assert(got(0L) === ((1L, true)), "single shared 5-gram")
    assert(got(1L) === ((0L, false)))
    assert(got(2L) === ((6L, true)), "all 6 shingles of the verbatim copy hit")
    assert(got(3L) === ((0L, false)), "sub-shingle doc is clean by construction")
    // the eval shingle set must reach the corpus as a broadcast join
    val plan = out.queryExecution.executedPlan.toString
    assert(plan.contains("BroadcastHashJoin") || plan.contains("BroadcastExchange"),
      s"eval side should broadcast:\n$plan")
  }

  test("editDistancePairs: equals the naive levenshtein join; engineered edge cases") {
    import spark.implicits._
    val rnd = new scala.util.Random(23)
    val alphabet = "abcdef"
    // random short strings plus planted near-misses
    val strs = (0 until 300).map(i =>
      (i.toLong, (0 until 6 + rnd.nextInt(4)).map(_ => alphabet(rnd.nextInt(6))).mkString)) ++
      Seq((1000L, "abcdefgh"), (1001L, "abcdefgx"),   // substitution: dist 1
          (1002L, "abcdefg"),                          // deletion: dist 1 from 1000
          (1003L, "xbcdefgh"),                         // first-char sub: dist 1
          (1004L, "abxdyfgh"))                         // dist 2 from 1000 — excluded at tau=1
    val df = strs.toDF("id", "s")
    for (tau <- Seq(1, 2)) {
      val fast = Dedup.editDistancePairs(df, "id", "s", tau)
        .collect().map(r => (r.getLong(0), r.getLong(1), r.getInt(2))).toSet
      val naive = df.as("a").join(df.as("b"), col("a.id") < col("b.id"))
        .select(col("a.id"), col("b.id"),
          levenshtein(col("a.s"), col("b.s")).as("dist"))
        .filter(col("dist") <= tau)
        .collect().map(r => (r.getLong(0), r.getLong(1), r.getInt(2))).toSet
      assert(fast === naive, s"tau=$tau")
    }
    val t1 = Dedup.editDistancePairs(df, "id", "s", tau = 1)
      .filter(col("d1") >= 1000L).collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(t1((1000L, 1001L)) && t1((1000L, 1002L)) && t1((1000L, 1003L)))
    assert(!t1((1000L, 1004L)), "distance-2 pair must not appear at tau=1")
    // ultra-short / gram-disjoint keys: the Ed-Join bound guarantees
    // no shared gram when both sides have ≤ q·tau distinct grams, so
    // these pairs come from the short-bucket direct verification —
    // "ab"/"ba" share zero 2-grams yet sit at distance 2
    val tiny = Seq((1L, "ab"), (2L, "ba"), (3L, "a"), (4L, "b"),
      (5L, "zz")).toDF("id", "s")
    val p2 = Dedup.editDistancePairs(tiny, "id", "s", tau = 2)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getInt(2))).toSet
    val naive2 = tiny.as("a").join(tiny.as("b"), col("a.id") < col("b.id"))
      .select(col("a.id"), col("b.id"),
        levenshtein(col("a.s"), col("b.s")).as("dist"))
      .filter(col("dist") <= 2)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getInt(2))).toSet
    assert(p2 === naive2, "short-key pairs missing")
    assert(p2.contains((1L, 2L, 2)), "gram-disjoint pair ab/ba not found")
  }

  test("clustersWithRounds converges on STRING ids and full-range long ids") {
    import spark.implicits._
    // string-keyed pairs (md5/url-style ids): the convergence scalar
    // must not depend on summing the rep column
    val sp = Seq(("urlA", "urlB"), ("urlB", "urlC"), ("urlX", "urlY"))
      .toDF("d1", "d2")
    val (labS, rS) = Dedup.clustersWithRounds(sp)
    val comps = labS.collect().map(r => r.getString(1)).distinct.sorted
    assert(comps.toSeq === Seq("urlA", "urlX"), comps.mkString(","))
    assert(rS >= 1)
    // near-Long.Max ids: a sum-based scalar would overflow under ANSI
    val big = Long.MaxValue
    val lp = Seq((big - 5L, big - 4L), (big - 4L, big - 3L),
      (big - 1L, big)).toDF("d1", "d2")
    val (labL, _) = Dedup.clustersWithRounds(lp)
    val repsL = labL.collect().map(r => r.getLong(1)).distinct.sorted
    assert(repsL.toSeq === Seq(big - 5L, big - 1L))
  }

  test("cdcDupProfile: planted shared passage found despite an offset edit; unique docs clean") {
    import spark.implicits._
    val rnd = new scala.util.Random(11)
    def rand(n: Int) = (1 to n).map(_ => ('a' + rnd.nextInt(26)).toChar).mkString
    val passage = rand(400)
    // doc 2 carries the SAME passage shifted by a 3-char insertion —
    // fixed-size chunking would miss it, CDC re-synchronizes
    val docs = Seq(
      (1L, rand(200) + passage + rand(150)),
      (2L, "zq!" + rand(180) + passage + rand(90)),
      (3L, rand(500))
    ).toDF("doc_id", "text")
    val prof = Dedup.cdcDupProfile(docs, "doc_id", "text", window = 8, maskBits = 4)
      .collect().map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2))).toMap
    assert(prof(1L)._2 > 0 && prof(2L)._2 > 0,
      s"shared passage must surface as duplicate chunks, got $prof")
    assert(prof(3L)._2 === 0L, "the unique doc carries no duplicate chunks")
    // most of the passage's chunks (≈ 400/16 per doc) are shared
    assert(prof(1L)._2 >= 10, s"expected ≥10 shared chunks, got ${prof(1L)._2}")
  }

  test("stripDuplicateChunks: pasted passage survives only at its first occurrence") {
    import spark.implicits._
    val rnd = new scala.util.Random(23)
    def rand(n: Int) = (1 to n).map(_ => ('a' + rnd.nextInt(26)).toChar).mkString
    val passage = rand(400)
    val (pre1, post1) = (rand(200), rand(150))
    val (pre2, post2) = (rand(180), rand(90))
    val solo = rand(500)
    val docs = Seq(
      (1L, pre1 + passage + post1),
      (2L, "zq!" + pre2 + passage + post2), // same passage, shifted offset
      (3L, solo),
      (4L, "")                              // empty text: passes through
    ).toDF("doc_id", "text")
    val out = Dedup.stripDuplicateChunks(docs, "doc_id", "text",
        window = 8, maskBits = 4)
      .collect().map(r => r.getLong(0) ->
        ((r.getLong(1), r.getLong(2), r.getString(3)))).toMap

    // doc 1 is the first occurrence of every shared chunk → untouched
    assert(out(1L)._2 === 0L, s"first occurrence must keep all chunks: ${out(1L)}")
    assert(out(1L)._3 === pre1 + passage + post1)
    // doc 2 loses the passage's interior chunks: strictly shorter,
    // still carries its unique prefix start and suffix end
    assert(out(2L)._2 >= 10, s"expected ≥10 dropped chunks, got ${out(2L)}")
    assert(out(2L)._3.length < ("zq!" + pre2 + passage + post2).length)
    assert(out(2L)._3.startsWith("zq!"))
    assert(out(2L)._3.endsWith(post2.takeRight(8)))
    // removed content is exactly the dropped chunks' total length:
    // cleaned is a subsequence of the original built from whole chunks
    assert(!out(2L)._3.contains(passage.substring(50, 350)),
      "the interior of the pasted passage must be gone")
    // unique and empty docs pass through unchanged
    assert(out(3L) === ((out(3L)._1, 0L, solo)))
    assert(out(4L) === ((0L, 0L, "")))
  }
}
