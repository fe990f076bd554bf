package graft

import graft.ext.{Dedup, Retrieval}
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Behavioral checks for the inverted-index/BM25 stack and the
  * span-level boilerplate stripper on hand-built corpora where the
  * right answer is obvious by construction.
  */
class RetrievalSpec extends AnyFunSuite with SharedSpark {

  private lazy val corpus: DataFrame = {
    import spark.implicits._
    Seq(
      (0L, "spark shuffle join spark spark"), // tf-heavy on "spark"
      (1L, "spark join"),                     // short doc, both terms
      (2L, "join join join join join join"),  // one term only
      (3L, "window sort order by"),           // no query terms
      (4L, "spark")                           // single term, shortest
    ).toDF("doc_id", "text")
  }

  test("postings carry tf and in-row doc length") {
    val p = Retrieval.postings(corpus, "doc_id", "text").collect()
      .map(r => (r.getString(0), r.getLong(1)) -> (r.getLong(2), r.getLong(3))).toMap
    assert(p(("spark", 0L)) === (5L, 3L)) // dl=5, tf=3
    assert(p(("join", 2L)) === (6L, 6L))
    assert(!p.contains(("window", 0L)))
  }

  test("bm25 ranks docs matching more query terms above single-term docs") {
    val top = Retrieval.bm25TopK(corpus, "doc_id", "text", "spark join", k = 5)
      .collect().map(r => r.getLong(0) -> r.getDouble(1))
    val ids = top.map(_._1)
    assert(!ids.contains(3L), "doc without any query term must not score")
    assert(top.forall(_._2 > 0), "BM25 with the +1 idf is strictly positive")
    // doc 1 has both terms at minimal length; doc 3 has neither
    assert(ids.head === 1L, s"expected the short both-term doc first, got ${ids.toSeq}")
    assert(ids.length === 4)
  }

  test("dirichlet query likelihood: tf raises, length normalizes, no-term docs excluded") {
    import spark.implicits._
    val got = Retrieval.qlTopK(corpus, "doc_id", "text", "spark join", k = 10)
      .select("doc_id", "score").as[(Long, Double)].collect().toMap
    // candidates: docs with ≥1 query term — doc 3 never appears
    assert(!got.contains(3L))
    // doc 0 (spark×3 + join) beats doc 1 (spark + join, shorter but
    // far fewer matches): tf dominates at these lengths
    assert(got(0L) > got(1L), got.toString)
    // independent hand computation of doc 4's score from the model:
    // cf(spark)=5, cf(join)=8, |C| = n_docs·avgdl = 5·(18/5) = 18
    val mu = 2000.0
    val c = 18.0
    val s4 = BigDecimal(math.log(1.0 + 1.0 / (mu * (5.0 / c))))
      .setScale(9, BigDecimal.RoundingMode.HALF_UP).toDouble +
      2.0 * math.log(mu / (1.0 + mu))
    assert(math.abs(got(4L) -
      BigDecimal(s4).setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble)
      < 1e-9, s"doc4 ${got(4L)} vs hand $s4")
    // duplicate query terms weight by query frequency and |q| counts
    // TOKENS — the faithful Zhai–Lafferty likelihood, not the
    // distinct-term approximation: "spark spark join" on doc 4 is
    // 2·log(1 + tf/(μ·cf_spark/|C|)) + 3·log(μ/(dl+μ))
    val got2 = Retrieval
      .qlTopK(corpus, "doc_id", "text", "spark spark join", k = 10)
      .select("doc_id", "score").as[(Long, Double)].collect().toMap
    val s4dup = BigDecimal(2.0 * math.log(1.0 + 1.0 / (mu * (5.0 / c))))
      .setScale(9, BigDecimal.RoundingMode.HALF_UP).toDouble +
      3.0 * math.log(mu / (1.0 + mu))
    assert(math.abs(got2(4L) -
      BigDecimal(s4dup).setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble)
      < 1e-9, s"doc4 dup ${got2(4L)} vs hand $s4dup")
  }

  test("batch bm25 matches the single-query path per query") {
    import spark.implicits._
    val queries = Seq((10L, "spark join"), (11L, "window")).toDF("qid", "qtext")
    val batch = Retrieval.bm25Batch(corpus, "doc_id", "text", queries, "qid", "qtext", k = 5)
      .collect().map(r => (r.getLong(0), r.getLong(1)) -> (r.getDouble(2), r.getLong(3))).toMap
    for ((q, text) <- Seq(10L -> "spark join", 11L -> "window")) {
      val single = Retrieval.bm25TopK(corpus, "doc_id", "text", text, k = 5)
        .collect().map(r => (r.getLong(0), r.getDouble(1), r.getLong(2)))
      for ((doc, score, rank) <- single)
        assert(batch((q, doc)) === ((score, rank)),
          s"query $q doc $doc: batch ${batch.get((q, doc))} vs single ($score, $rank)")
      assert(batch.keys.count(_._1 == q) === single.length)
    }
  }

  test("phrase search: adjacency only, occurrence counts, repeated-term phrases") {
    import spark.implicits._
    val docs = Seq(
      (0L, "big data spark big data tools"),  // "big data" twice
      (1L, "data big spark"),                 // reversed: no match
      (2L, "big red data"),                   // gap: no match
      (3L, "go go go stop")                   // repeated-term phrase target
    ).toDF("doc_id", "text")
    val out = Retrieval.phraseSearch(docs, "doc_id", "text", "big data")
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(out === Map(0L -> 2L), s"adjacent-only with counts, got $out")
    val rep = Retrieval.phraseSearch(docs, "doc_id", "text", "go go")
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(rep === Map(3L -> 2L), s"'go go' occurs at positions 0 and 1, got $rep")
    val tri = Retrieval.phraseSearch(docs, "doc_id", "text", "big data spark")
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(tri === Map(0L -> 1L), s"3-term phrase, got $tri")
    // ordered proximity: slop=1 admits one intervening token ("big
    // red data"), but never the reversed order of doc 1
    val prox = Retrieval.proximitySearch(docs, "doc_id", "text", "big data", slop = 1)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(prox === Map(0L -> 2L, 2L -> 1L), s"slop=1, got $prox")
  }

  test("pseudo-relevance feedback pulls in docs matching only expansion terms") {
    import spark.implicits._
    val docs = Seq(
      (0L, "alpha beta beta beta"),  // matches the query; rich in "beta"
      (1L, "beta beta gamma"),       // no query term — only reachable via expansion
      (2L, "gamma delta epsilon")    // unrelated
    ).toDF("doc_id", "text")
    val post = Retrieval.postings(docs, "doc_id", "text")
    val stats = Retrieval.postingsStats(post)
    val q = Seq((7L, "alpha")).toDF("query_id", "qtext")
    val base = Retrieval.bm25BatchFromPostings(post, stats, q, "query_id", "qtext", k = 5)
      .collect().map(_.getLong(1)).toSet
    assert(base === Set(0L), "without feedback only the literal match scores")
    val prf = Retrieval.bm25Prf(post, stats, q, "query_id", "qtext", k = 5,
        fbDocs = 1, fbTerms = 1)
      .collect().map(r => r.getLong(1) -> r.getLong(3)).toMap
    assert(prf.contains(1L), s"expansion term 'beta' must reach doc 1: $prf")
    assert(prf(0L) === 1L, "the literal match still ranks first")
  }

  test("streaming index maintenance: foreachBatch appends; merged index equals batch rebuild") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val dir = graft.Scratch.tempDir("graft_iridx_stream_")
    val seed = Seq((0L, "spark shuffle join spark"), (1L, "window sort order"))
      .toDF("doc_id", "text")
    Retrieval.postings(seed, "doc_id", "text").write.mode("overwrite").parquet(dir)
    val arriving = Seq((2L, "spark join window"), (3L, "join join join"), (4L, "spark window"))
    val mem = MemoryStream[(Long, String)]
    val q = mem.toDF().toDF("doc_id", "text").writeStream
      .foreachBatch { (batch: DataFrame, _: Long) =>
        Retrieval.postings(batch, "doc_id", "text").write.mode("append").parquet(dir)
      }.start()
    try {
      mem.addData(arriving.take(2): _*); q.processAllAvailable()
      mem.addData(arriving.drop(2): _*); q.processAllAvailable()
    } finally q.stop()
    val post = spark.read.parquet(dir)
    val got = Retrieval.bm25TopKFromPostings(post, Retrieval.postingsStats(post),
        "spark join", k = 10)
      .collect().map(r => (r.getLong(0), r.getDouble(1), r.getLong(2))).toSeq
    val want = Retrieval.bm25TopK(seed.unionAll(arriving.toDF("doc_id", "text")),
        "doc_id", "text", "spark join", k = 10)
      .collect().map(r => (r.getLong(0), r.getDouble(1), r.getLong(2))).toSeq
    assert(got === want, s"streamed-appended index diverges from batch rebuild:\n$got\n$want")
    assert(got.nonEmpty)
  }

  test("span stripper removes cross-doc boilerplate, keeps order, empties full-boiler docs") {
    import spark.implicits._
    val pre = "HEADER LICENSE COPY"                  // 3-token boilerplate block
    val docs = Seq(
      (0L, s"$pre alpha beta gamma"),
      (1L, s"$pre delta epsilon zeta"),
      (2L, "eta theta iota kappa lambda mu"),        // unique throughout
      (3L, pre)                                      // boilerplate only
    ).toDF("doc_id", "text")
    val out = Dedup.stripBoilerplateSpans(docs, "doc_id", "text", spanWords = 3, minDocs = 2)
      .collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    assert(out(0L) === "alpha beta gamma")
    assert(out(1L) === "delta epsilon zeta")
    assert(out(2L) === "eta theta iota kappa lambda mu")
    assert(out(3L) === "", "all-boilerplate doc reduces to empty, not a dropped row")
  }

  test("span stripper reassembles multi-span docs in original span order") {
    import spark.implicits._
    val docs = Seq(
      (0L, "a b c d e f g h"),                       // spans: (a b c)(d e f)(g h)
      (1L, "d e f x y z")                            // shares (d e f)
    ).toDF("doc_id", "text")
    val out = Dedup.stripBoilerplateSpans(docs, "doc_id", "text", spanWords = 3, minDocs = 2)
      .collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    assert(out(0L) === "a b c g h")
    assert(out(1L) === "x y z")
  }

  test("hardNegatives: top-scored non-positives, positive excluded, count honored") {
    import spark.implicits._
    val docs = graft.sources.Tables(spark, sf0001).table("documents")
    val queries = docs.filter(col("doc_id") % 97 === 0)
      .select(col("doc_id").as("query_id"),
        array_join(slice(split(col("text"), " "), 1, 8), " ").as("qtext"),
        col("doc_id").as("pos_id"))
    val negs = Retrieval.hardNegatives(docs, "doc_id", "text",
        queries, "query_id", "qtext", "pos_id", negPerQuery = 3, candK = 10)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3)))
    assert(negs.nonEmpty)
    assert(negs.forall { case (_, pos, neg, _) => neg != pos },
      "a positive leaked into its own negatives")
    val perQ = negs.groupBy(_._1).view.mapValues(_.map(_._4).sorted.toSeq).toMap
    assert(perQ.values.forall(_ == Seq(1L, 2L, 3L)),
      s"per-query neg_rank not dense 1..3: $perQ")
    // negatives are exactly the shortlist's best non-positives
    val shortlist = Retrieval.bm25Batch(docs, "doc_id", "text",
        queries, "query_id", "qtext", k = 10)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(3)))
    val expect = shortlist.groupBy(_._1).view.mapValues(
      _.filter { case (q, d, _) => d != q }.sortBy(_._3).take(3).map(_._2).toSet).toMap
    val got = negs.groupBy(_._1).view.mapValues(_.map(_._3).toSet).toMap
    assert(got === expect.filter(_._2.nonEmpty))
  }

  test("rrfFuse: rank-based fusion, full-outer semantics, deterministic ties") {
    import spark.implicits._
    // query 1: A list ranks d1,d2,d3; B list ranks d3,d4 — d3 fuses
    // two terms, d1/d2/d4 one each; kRrf=2 makes arithmetic visible
    val a = Seq((1L, 1L, 9.0), (1L, 2L, 8.0), (1L, 3L, 7.0)).toDF("query_id", "doc_id", "score")
    val b = Seq((1L, 3L, 0.9), (1L, 4L, 0.8)).toDF("query_id", "doc_id", "score")
    val got = Retrieval.rrfFuse(a, b, kRrf = 2, topN = 10)
      .collect().map(r => r.getLong(1) -> r.getDouble(4)).toMap
    assert(got(3L) === 1.0 / 5 + 1.0 / 3)  // rank 3 in A, rank 1 in B
    assert(got(1L) === 1.0 / 3)            // A only, rank 1
    assert(got(2L) === 1.0 / 4)
    assert(got(4L) === 1.0 / 4)            // B only, rank 2
    // equal scores rank by doc_id: d5 before d6
    val t1 = Seq((1L, 6L, 5.0), (1L, 5L, 5.0)).toDF("query_id", "doc_id", "score")
    val r1 = Retrieval.rrfFuse(t1, t1.limit(0), kRrf = 60, topN = 10)
      .collect().map(r => (r.getLong(1), r.getInt(2))).toMap
    assert(r1 === Map(5L -> 1, 6L -> 2))
    // topN truncates per query by (rrf desc, doc_id)
    assert(Retrieval.rrfFuse(a, b, kRrf = 2, topN = 2)
      .collect().map(_.getLong(1)).toSet === Set(3L, 1L))
    // multi-query isolation: ranks never leak across query_ids
    val a2 = a.union(Seq((2L, 7L, 1.0)).toDF("query_id", "doc_id", "score"))
    val m = Retrieval.rrfFuse(a2, b, kRrf = 2, topN = 10)
      .filter(col("query_id") === 2L).collect()
    assert(m.length === 1 && m(0).getLong(1) === 7L && m(0).getInt(2) === 1)
  }
}
