package graft

import graft.ext.TextAnalysis
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

class TextAnalysisSpec extends AnyFunSuite with SharedSpark {

  private def one(text: String, c: org.apache.spark.sql.Column): Any = {
    import spark.implicits._
    Seq(text).toDF("text").select(c).head().get(0)
  }

  test("charClassCounts: 7-way census over every edge class, surrogate-aware") {
    def counts(s: String): Seq[Int] =
      one(s, TextAnalysis.charClassCounts(col("text")))
        .asInstanceOf[scala.collection.Seq[Int]].toSeq
    // Ab1 2!\t + control(0x01) + U+FFFD + e-acute + CJK + emoji
    // (surrogate pair); non-ASCII letters land in "other" — the
    // non-ASCII RATIO is the signal, not a Unicode letter count
    val s = "Ab1 2!\t\u0001\ufffd\u00e9\u4e16" + new String(Character.toChars(0x1F600))
    //          letter digit ws punct ctrl repl other
    assert(counts(s) === Seq(2, 2, 2, 1, 1, 1, 3))
    // the emoji is ONE code point (surrogate pair advances once)
    assert(counts(new String(Character.toChars(0x1F600))) === Seq(0, 0, 0, 0, 0, 0, 1))
    // ws wins precedence over control for 0x09-0x0D; 0x7f is control
    assert(counts("\t\r\n\u000B\f\u007F") === Seq(0, 0, 5, 0, 1, 0, 0))
    // underscore is punct (ASCII 0x5f), not a letter
    assert(counts("_") === Seq(0, 0, 0, 1, 0, 0, 0))
    assert(counts("") === Seq(0, 0, 0, 0, 0, 0, 0))
  }

  test("normalize: NFC + simple lowercase + whitespace collapse") {
    def norm(s: String): String =
      one(s, TextAnalysis.normalize(col("text"))).asInstanceOf[String]
    // composed and decomposed spellings become byte-identical
    val composed   = "Café au LAIT"          // precomposed é
    val decomposed = "Café au LAIT"         // e + combining acute
    assert(norm(composed) === "café au lait")
    assert(norm(decomposed) === norm(composed))
    // İ (U+0130) takes the SIMPLE 1:1 mapping → plain i (NOT the full
    // mapping i + combining dot that String.toLowerCase would produce)
    assert(norm("İstanbul") === "istanbul")
    assert("İstanbul".toLowerCase(java.util.Locale.ROOT) !== "istanbul",
      "full mapping would diverge — the simple mapping is the point")
    // ß has no simple lowercase change; never expands to ss
    assert(norm("STRASSE ß") === "strasse ß")
    // every ASCII whitespace run collapses; leading/trailing dropped
    assert(norm("  A\tB\n\nC \f\r D  ") === "a b c d")
    assert(norm("") === "")
    assert(norm("   \t\n ") === "")
    // non-ASCII spaces (NBSP) are NOT collapsed — ASCII class only,
    // matching the oracle's [ \t\n\x0B\f\r] exactly
    assert(norm("a b") === "a b")
    // SQL registration agrees
    graft.functions.TextExpressions.register(spark)
    assert(spark.sql("SELECT normalize_text('  Café  X  ') AS n")
      .head().getString(0) === "café x")
  }

  test("dupLineSignals: trimmed-line census, code-point lengths") {
    def sig(s: String): (Long, Long, Double, Double) = {
      val r = one(s, TextAnalysis.dupLineSignals(col("text")))
        .asInstanceOf[org.apache.spark.sql.Row]
      (r.getLong(0), r.getLong(1), r.getDouble(2), r.getDouble(3))
    }
    assert(sig("x\ny\nx") === ((3L, 1L, 1.0 / 3, 1.0 / 3)))
    // indentation and \r\n endings do not defeat the match
    assert(sig("  nav \r\nnav\nbody") === ((3L, 1L, 1.0 / 3, 3.0 / 10)))
    // blank / whitespace-only lines are skipped entirely
    assert(sig("a\n\n   \n\t\na") === ((2L, 1L, 0.5, 0.5)))
    assert(sig("") === ((0L, 0L, 0.0, 0.0)))
    assert(sig("   \n\t") === ((0L, 0L, 0.0, 0.0)))
    // all-duplicate document
    assert(sig("same\nsame\nsame") === ((3L, 2L, 2.0 / 3, 2.0 / 3)))
    // lengths count CODE POINTS: the emoji line is 2 chars, not 3
    val emoji = new String(Character.toChars(0x1F600)) + "a"
    assert(sig(s"$emoji\n$emoji\nbb") === ((3L, 1L, 1.0 / 3, 2.0 / 6)))
    // a doc with no newline is one line, zero duplication
    assert(sig("single line here") === ((1L, 0L, 0.0, 0.0)))
  }

  test("dedupLines: first occurrences in order; census reports zero after") {
    def clean(s: String): String =
      one(s, graft.functions.TextExpressions.dedupLines(col("text")))
        .asInstanceOf[String]
    assert(clean("header\nbody\nheader\ntail") === "header\nbody\ntail")
    assert(clean("  nav  \r\nnav\nbody") === "nav\nbody")
    assert(clean("a\n\n   \n\ta\nb") === "a\nb")
    assert(clean("") === "")
    assert(clean("   \n\t") === "")
    assert(clean("only line") === "only line")
    // the rewrite satisfies its own census: zero duplicates after
    val messy = "x\ny\nx\n x \nz\ny\n\nz"
    val after = one(clean(messy),
      graft.ext.TextAnalysis.dupLineSignals(col("text")))
      .asInstanceOf[org.apache.spark.sql.Row]
    assert(after.getLong(1) === 0L, s"cleaned='${clean(messy)}'")
    assert(clean(messy) === "x\ny\nz")
  }

  test("multiPatternCount: Aho-Corasick equals brute-force substring probing") {
    def brute(s: String, pats: Seq[String]): Seq[Long] =
      pats.map(p => (0 to s.length - p.length)
        .count(i => s.regionMatches(i, p, 0, p.length)).toLong)
    def got(s: String, pats: Seq[String]): Seq[Long] =
      one(s, graft.functions.TextExpressions.multiPatternCount(col("text"), pats))
        .asInstanceOf[scala.collection.Seq[Long]].toSeq
    // overlapping self-matches, pattern-inside-pattern, shared suffixes
    val pats = Seq("aa", "aab", "ab", "b", "abab", "zz")
    assert(got("aaaa", pats) === Seq(3L, 0L, 0L, 0L, 0L, 0L))
    assert(got("aabab", pats) === brute("aabab", pats))
    assert(got("ababab", pats) === brute("ababab", pats))
    assert(got("", pats) === Seq.fill(6)(0L))
    // randomized equivalence on a tie-heavy alphabet
    val rnd = new scala.util.Random(13)
    for (_ <- 1 to 25) {
      val s = (1 to 5 + rnd.nextInt(200)).map(_ => ('a' + rnd.nextInt(3)).toChar).mkString
      assert(got(s, pats) === brute(s, pats), s)
    }
    // a pattern that is a suffix of another still counts independently
    assert(got("xabz", Seq("ab", "xab")) === Seq(1L, 1L))
  }

  test("luhnSignals: strict digit runs, mod-10 check") {
    def sig(s: String): (Long, Long) = {
      val r = one(s, TextAnalysis.luhnSignals(col("text")))
        .asInstanceOf[org.apache.spark.sql.Row]
      (r.getLong(0), r.getLong(1))
    }
    assert(sig("4532015112830366") === ((1L, 1L)))       // valid 16
    assert(sig("4532015112830367") === ((1L, 0L)))       // bad check digit
    assert(sig("4123456789011") === ((1L, 1L)))          // valid 13
    assert(sig("4123456789012345677") === ((1L, 1L)))    // valid 19
    assert(sig("123456789012") === ((0L, 0L)))           // 12: too short
    assert(sig("45320151128303661234") === ((0L, 0L)))   // 20: too long
    assert(sig("4532-0151-1283-0366") === ((0L, 0L)))    // separator-broken
    assert(sig("a 4532015112830366 b 4123456789011 c 1234567890123")
      === ((3L, 2L)))                                    // mixed text
    assert(sig("") === ((0L, 0L)))
    // run at the very end of the string closes correctly
    assert(sig("x4532015112830366") === ((1L, 1L)))
  }

  test("winnowFingerprints: matches a brute-force reference; winnowing guarantee holds") {
    val P = 1000000007L
    def ref(s: String, k: Int, w: Int): Seq[(Int, Long)] = {
      val cps = s.codePoints().toArray
      val m = cps.length - k + 1
      if (m <= 0) return Seq.empty
      val hs = (0 until m).map(p =>
        cps.slice(p, p + k).foldLeft(0L)((h, c) => (h * 31 + c) % P))
      val win = math.min(w, m)
      (0 to m - win).map { j =>
        val slice = hs.slice(j, j + win)
        val mn = slice.min
        val rel = slice.lastIndexOf(mn) // rightmost tie
        (j + rel + 1, mn)
      }.distinct.sortBy(_._1)
    }
    def got(s: String, k: Int, w: Int): Seq[(Int, Long)] =
      one(s, graft.functions.TextExpressions.winnowFingerprints(col("text"), k, w))
        .asInstanceOf[scala.collection.Seq[org.apache.spark.sql.Row]]
        .map(r => (r.getInt(0), r.getLong(1))).toSeq
    val rnd = new scala.util.Random(11)
    for (trial <- 1 to 20) {
      // small alphabet forces hash ties, exercising the rightmost rule
      val s = (1 to 30 + rnd.nextInt(120)).map(_ => ('a' + rnd.nextInt(3)).toChar).mkString
      assert(got(s, 4, 5) === ref(s, 4, 5), s"trial $trial: $s")
    }
    assert(got("", 8, 8) === Seq.empty)
    assert(got("short", 8, 8) === Seq.empty, "below k: no k-grams, no fingerprints")
    // fewer k-grams than w: one whole-range window still fingerprints
    assert(got("abcdefghij", 8, 8) === ref("abcdefghij", 8, 8))
    assert(got("abcdefghij", 8, 8).size === 1)
    // THE winnowing guarantee: any shared substring of length ≥ k+w−1
    // produces at least one shared fingerprint hash
    val shared = (1 to 15).map(_ => ('a' + rnd.nextInt(26)).toChar).mkString // k+w−1 = 15
    val a = "xxxyyzz" + shared + "qqrrss"
    val b = "uuvvww" + shared
    val ha = got(a, 8, 8).map(_._2).toSet
    val hb = got(b, 8, 8).map(_._2).toSet
    assert(ha.intersect(hb).nonEmpty, "guarantee violated")
  }

  test("groupTrend: exact on a perfect line; degenerate groups yield NULLs") {
    import spark.implicits._
    val df = ((0L to 10L).map(x => ("lin", x, 2 * x + 3)) ++
      Seq(("flat", 5L, 7L), ("flat", 5L, 9L))).toDF("g", "x", "y")
    val got = graft.ext.CorpusStats.groupTrend(df, col("g"), col("x"), col("y"))
      .collect().map(r => r.getString(0) ->
        ((r.isNullAt(2), if (r.isNullAt(2)) 0.0 else r.getDouble(2),
          if (r.isNullAt(3)) 0.0 else r.getDouble(3)))).toMap
    assert(got("lin") === ((false, 2.0, 3.0)))
    assert(got("flat")._1 === true, "single distinct x has no slope")
    // layout-proof
    val again = graft.ext.CorpusStats.groupTrend(df.repartition(5),
      col("g"), col("x"), col("y")).collect()
      .map(r => r.getString(0) -> r.toSeq.drop(1)).toMap
    val first = graft.ext.CorpusStats.groupTrend(df, col("g"), col("x"), col("y"))
      .collect().map(r => r.getString(0) -> r.toSeq.drop(1)).toMap
    assert(again === first)
  }

  test("vocabGrowth: first-seen reformulation equals per-prefix distinct") {
    import spark.implicits._
    val docs = Seq(
      (0L, "a b"), (1L, "b  c"), (2L, "c d"), (3L, "a e"),
      (4L, "f f"), (5L, "a b"), (6L, "a b c"), (7L, "e f")
    ).toDF("doc_id", "text")
    val got = graft.ext.CorpusStats.vocabGrowth(docs, batchSize = 2)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSeq
    // b0 {a,b,c} → 3; b1 {c,d,a,e} → +2; b2 {f,a,b} → +1; b3 {a,b,c,e,f} → +0
    assert(got === Seq((0L, 3L, 3L), (1L, 2L, 5L), (2L, 1L, 6L), (3L, 0L, 6L)))
    // exact against the naive per-prefix distinct
    val naive = (0L to 3L).map { b =>
      docs.filter(col("doc_id") < (b + 1) * 2)
        .select(explode(split(lower(col("text")), "\\s+")).as("t"))
        .filter(col("t") =!= "").select("t").distinct().count()
    }
    assert(got.map(_._3) === naive)
    // physical layout must not matter
    assert(graft.ext.CorpusStats.vocabGrowth(docs.repartition(5), batchSize = 2)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSeq === got)
  }

  test("token counts: whitespace vs BPE-ish regex") {
    assert(one("hello world", TextAnalysis.tokenCountWs(col("text"))) === 2)
    assert(one("hello, world!", TextAnalysis.tokenCountWs(col("text"))) === 2)
    // regex splits punctuation: [hello][,][world][!]
    assert(one("hello, world!", TextAnalysis.tokenCountRegex(col("text"))) === 4)
  }

  test("langId picks the language with most markers; ties keep list order") {
    assert(one("le chat et la maison et les arbres", TextAnalysis.langId(col("text"))) === "fr")
    assert(one("the cat and the house of the trees", TextAnalysis.langId(col("text"))) === "en")
    assert(one("der Hund und die Katze und das Haus", TextAnalysis.langId(col("text"))) === "de")
    assert(one("xyzzy plugh qwerty", TextAnalysis.langId(col("text"))) === "other")
  }

  test("redactPii scrubs planted emails/URLs and counts them") {
    val text = "mail a.user+tag@example.co.uk or see https://x.example/path?q=1 now"
    assert(one(text, TextAnalysis.piiCount(col("text"))) === 2)
    assert(one(text, TextAnalysis.redactPii(col("text"))) ===
      "mail <EMAIL> or see <URL> now")
    assert(one("no pii here", TextAnalysis.piiCount(col("text"))) === 0)
  }

  test("repetitionScore flags looped text, 0 for short or unique docs") {
    val looped = Seq.fill(10)("buy now click here").mkString(" ")
    val unique = "every word in this sentence appears exactly once today"
    val rep = one(looped, TextAnalysis.repetitionScore(col("text"))).asInstanceOf[Double]
    assert(rep > 0.8, s"looped text scored $rep")
    assert(one(unique, TextAnalysis.repetitionScore(col("text"))) === 0.0)
    assert(one("two words", TextAnalysis.repetitionScore(col("text"))) === 0.0)
  }

  test("qualityScore stays in [0,1] and ranks clean text above junk") {
    val clean = one("the quick brown fox jumps over the lazy dog and runs to the hills",
      TextAnalysis.qualityScore(col("text"))).asInstanceOf[Double]
    val junk = one("!!! ??? ### $$$ %%% ^^^ &&& *** ((()))",
      TextAnalysis.qualityScore(col("text"))).asInstanceOf[Double]
    assert(clean >= 0.0 && clean <= 1.0 && junk >= 0.0 && junk <= 1.0)
    assert(clean > junk)
  }

  test("wordShingles: n-grams in order; short docs yield empty") {
    import spark.implicits._
    val sh = Seq("a b c d e f").toDF("text")
      .select(TextAnalysis.wordShingles(col("text"), 5)).head().getSeq[String](0)
    assert(sh === Seq("a b c d e", "b c d e f"))
    val short = Seq("a b c").toDF("text")
      .select(TextAnalysis.wordShingles(col("text"), 5)).head().getSeq[String](0)
    assert(short.isEmpty)
  }

  test("chunkTokens: overlapping windows cover every token; final chunk partial") {
    import spark.implicits._
    val text = (1 to 10).map(i => s"t$i").mkString(" ")   // 10 tokens
    val chunks = Seq(text).toDF("text")
      .select(explode(TextAnalysis.chunkTokens(col("text"), 8, 4)).as("c"))
      .select("c.chunk_id", "c.chunk").collect()
      .map(r => r.getInt(0) -> r.getString(1))
    assert(chunks.toSeq === Seq(
      0 -> (1 to 8).map(i => s"t$i").mkString(" "),
      1 -> (5 to 10).map(i => s"t$i").mkString(" ")))
    // short doc → exactly one (partial) chunk
    val one = Seq("a b c").toDF("text")
      .select(explode(TextAnalysis.chunkTokens(col("text"), 8, 4)).as("c"))
      .select("c.chunk").collect().map(_.getString(0))
    assert(one.toSeq === Seq("a b c"))
  }

  test("fingerprint is deterministic and separates different docs") {
    import spark.implicits._
    val df = Seq((1L, "one two three four five six seven"),
      (2L, "one two three four five six seven"),
      (3L, "totally different words here now ok yes")).toDF("doc_id", "text")
    val fps = df.select(col("doc_id"), TextAnalysis.fingerprint(col("text")))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(fps(1L) === fps(2L))
    assert(fps(1L) !== fps(3L))
  }

  test("lexicalEntropy: uniform text maxes out, repeated token zeroes, order-stable") {
    import spark.implicits._
    val df = Seq(
      (1L, "a b c d"),            // 4 distinct of 4 → ln 4
      (2L, "a a a a"),            // 1 distinct     → 0
      (3L, "a a b b"))            // ln 2
      .toDF("doc_id", "text")
    val ent = graft.ext.CorpusStats.lexicalEntropy(df)
      .collect().map(r => r.getLong(0) -> r.getDouble(2)).toMap
    assert(math.abs(ent(1L) - math.log(4)) < 1e-5)
    assert(ent(2L) === 0.0)
    assert(math.abs(ent(3L) - math.log(2)) < 1e-5)
    val again = graft.ext.CorpusStats.lexicalEntropy(df.repartition(5))
      .collect().map(r => r.getLong(0) -> r.getDouble(2)).toMap
    assert(again === ent)
  }

  test("cdcBoundaries: matches a per-position reference; prefix edits re-synchronize") {
    import spark.implicits._
    import org.apache.spark.sql.functions.col
    val P = 1000000007L
    def refBoundaries(s: String, w: Int, maskBits: Int): Seq[Int] = {
      val cps = s.codePoints().toArray
      val mask = (1L << maskBits) - 1
      val raw = (w to cps.length).filter { p =>
        val h = cps.slice(p - w, p).foldLeft(0L)((h, c) => (h * 31 + c) % P)
        (h & mask) == 0L
      }
      // min-gap rule: a raw match within w-1 of the PREVIOUS raw
      // match is suppressed (content-local, matches the lag oracle)
      val cut = raw.zip((-w) +: raw).collect { case (p, pr) if p - pr >= w => p }
      if (cps.isEmpty) Seq.empty
      else if (cut.nonEmpty && cut.last == cps.length) cut else cut :+ cps.length
    }
    def chunks(s: String): Seq[String] = {
      val b = refBoundaries(s, 8, 4)
      val cps = s.codePoints().toArray
      (0 +: b).sliding(2).map { case Seq(a, z) =>
        new String(cps.slice(a, z), 0, z - a) }.toSeq
    }
    val rnd = new scala.util.Random(7)
    val text = (1 to 600).map(_ => ('a' + rnd.nextInt(26)).toChar).mkString
    // incremental Spark scan == from-scratch per-position reference
    val got = Seq(text, "", "short").toDF("text")
      .select(graft.functions.TextExpressions.cdcBoundaries(col("text"), 8, 4))
      .collect().map(_.getSeq[Int](0).toSeq)
    assert(got(0) === refBoundaries(text, 8, 4))
    // and the SQL registration agrees
    graft.functions.TextExpressions.register(spark)
    val viaSql = spark.sql(
      s"SELECT cdc_boundaries('${text.take(100)}', 8L, 4L) AS b")
      .head().getSeq[Int](0).toSeq
    assert(viaSql === refBoundaries(text.take(100), 8, 4))
    assert(got(1) === Seq.empty)
    assert(got(2) === Seq(5), "below-window text is one whole chunk")
    // THE CDC property: a 2-char prefix insertion changes only the
    // leading chunk(s); the chunk multiset re-synchronizes after it
    val orig = chunks(text)
    val edited = chunks("XY" + text)
    val shared = edited.toSet.intersect(orig.toSet).size
    assert(orig.size > 10)
    assert(shared >= orig.size - 2,
      s"expected resync: ${orig.size} original chunks, only $shared survive the edit")
  }
}
