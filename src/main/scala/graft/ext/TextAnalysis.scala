package graft.ext

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Text-analysis operators for training-data pipelines, all expressed
  * as codegen-friendly built-in expressions (no UDFs) so they stay
  * inside WholeStageCodegen and scale linearly with partitions.
  */
object TextAnalysis {

  /** Whitespace token count (`size(split(text, "\\s+"))` semantics,
    * one-pass native sweep — no token array materialized). */
  def tokenCountWs(text: Column): Column =
    graft.functions.TextExpressions.wsTokenCount(text)

  /** BPE-ish regex token count: words + individual punctuation marks
    * (the pre-tokenization split most BPE vocabularies use). */
  def tokenCountRegex(text: Column): Column =
    size(regexp_extract_all(text, lit("\\w+|[^\\w\\s]"), lit(0)))

  /** Occurrences of any of `words` as whole words, case-insensitive.
    * Native one-pass sweep ([[graft.functions.WordSetsCount]]) —
    * equivalent to `\b(w1|w2|...)\b` regex counting for word-char
    * markers, without the per-set regex scan. */
  def markerCount(text: Column, words: Seq[String]): Column =
    graft.functions.TextExpressions.wordSetsCount(lower(text), Seq(words)).getItem(0)

  /** All language marker-set counts in one text sweep. */
  private def langScores(text: Column): Column =
    graft.functions.TextExpressions.wordSetsCount(lower(text), langMarkers.map(_._2))

  /** Language markers: tiny per-language stopword lists. Heuristic
    * n-gram/stopword language ID — deterministic, codegen'd. */
  val langMarkers: Seq[(String, Seq[String])] = Seq(
    "en" -> Seq("the", "and", "of", "to", "in"),
    "fr" -> Seq("le", "la", "les", "et", "des", "une"),
    "de" -> Seq("der", "die", "und", "das", "ein"),
    "es" -> Seq("el", "los", "las", "que", "una"),
  )

  /** Predict language by max marker count; ties resolve in the fixed
    * order of [[langMarkers]] ("other" when all scores are 0). */
  def langId(text: Column): Column = {
    val all = langScores(text)
    val scores = langMarkers.zipWithIndex.map { case ((l, _), i) => l -> all.getItem(i) }
    // fold with when(): start from the first language, replace only on
    // strictly-greater score, so ties keep the earlier language
    val (firstLang, firstScore) = scores.head
    val (predLang, predScore) = scores.tail.foldLeft((lit(firstLang), firstScore)) {
      case ((pl, ps), (l, s)) => (when(s > ps, lit(l)).otherwise(pl), when(s > ps, s).otherwise(ps))
    }
    when(predScore > 0, predLang).otherwise(lit("other"))
  }

  /** Punctuation-character count (`[^\w\s]` matches, one-pass native
    * sweep). */
  def punctCount(text: Column): Column =
    graft.functions.TextExpressions.punctCount(text)

  /** Per-code-point class census `[letter, digit, ws, punct,
    * control, replacement, other]` — one text sweep; the
    * encoding-corruption signals (U+FFFD count, control-char count,
    * non-ASCII "other" ratio) for corpus quality gating. */
  def charClassCounts(text: Column): Column =
    graft.functions.TextExpressions.charClassCounts(text)

  /** Stopword ratio, word-length stats and a combined quality score in
    * [0,1] — the usual cheap pre-filter before expensive pipeline
    * stages. All ratios are plain double arithmetic (deterministic
    * and oracle-reproducible). */
  def qualityScore(text: Column): Column = {
    val chars = length(text).cast("double")
    val words = tokenCountWs(text).cast("double")
    val stop = markerCount(text, Seq("the", "a", "of", "and", "to", "is", "in")).cast("double")
    val punct = punctCount(text).cast("double")
    val avgWordLen = chars / words
    // well-formed text: some stopwords, low punctuation, 3-8 char words
    val stopScore = least(stop / words * lit(5.0), lit(1.0))
    val punctScore = greatest(lit(1.0) - punct / chars * lit(10.0), lit(0.0))
    val lenScore = when(avgWordLen.between(3.0, 8.0), 1.0).otherwise(0.5)
    (stopScore + punctScore + lenScore) / lit(3.0)
  }

  /** Per-shingle polynomial rolling-hash fingerprint of a document:
    * min over word-5-gram hashes (a 1-hash MinHash; cheap dedup key).
    * Uses xxhash64 (codegen'd) rather than a Scala UDF. */
  def fingerprint(text: Column): Column =
    array_min(transform(wordShingles(text, 5), s => xxhash64(s)))

  /** SQL-portable shingle fingerprint: min over 5-token shingles of
    * the 31-polynomial rolling hash mod 1e9+7 — the same MinHash-style
    * sketch as [[fingerprint]] but re-derivable in plain SQL, so the
    * driver gate value-checks it (NULL for docs under 5 tokens, like
    * the xxhash form). */
  def fingerprintPortable(text: Column): Column =
    array_min(transform(wordShingles(text, 5),
      s => graft.functions.TextExpressions.rollingHash(s)))

  /** Whole-document polynomial rolling hash mod 1e9+7
    * ([[graft.functions.RollingHash]]): order-sensitive fingerprint,
    * portably re-derivable in plain SQL — the oracle-checkable
    * complement of the xxhash-based [[fingerprint]]. */
  def rollingHash(text: Column): Column =
    graft.functions.TextExpressions.rollingHash(text)

  /** PII patterns (emails, URLs) — conservative, RE2-compatible, so
    * the DuckDB oracle applies the identical regexes. */
  val emailPattern: String = "[\\w.+-]+@[\\w-]+(\\.[\\w-]+)+"
  val urlPattern: String = "https?://[^\\s]+"

  /** Count of PII matches (emails + URLs) in the text. */
  def piiCount(text: Column): Column =
    size(regexp_extract_all(text, lit(emailPattern), lit(0))) +
      size(regexp_extract_all(text, lit(urlPattern), lit(0)))

  /** Redact PII: URLs first (an email-shaped userinfo inside a URL is
    * then already gone), then emails — the standard pre-training
    * scrub pass; pure per-row map, no shuffle. */
  def redactPii(text: Column): Column =
    regexp_replace(
      regexp_replace(text, urlPattern, "<URL>"),
      emailPattern, "<EMAIL>")

  /** Canonical text form for dedup keys and equality joins: Unicode
    * NFC composition, simple per-code-point lowercase, whitespace-run
    * collapse — composed and decomposed spellings of the same word
    * come out byte-identical
    * ([[graft.functions.NormalizeText]]). Run this BEFORE hashing /
    * shingling so `Café` == `Cafe´` == `CAFÉ`. */
  def normalize(text: Column): Column =
    graft.functions.TextExpressions.normalizeText(text)

  /** Duplicate word-3-gram ratio (a Gopher-style repetition signal):
    * 1 − distinct/total over the doc's 3-gram shingles; 0 for docs
    * shorter than 3 words. High values flag boilerplate/looped text
    * for removal before training. */
  def repetitionScore(text: Column): Column = {
    val sh = wordShingles(text, 3)
    when(size(sh) > 0,
      lit(1.0) - size(array_distinct(sh)).cast("double") / size(sh).cast("double"))
      .otherwise(lit(0.0))
  }

  /** Checksum-validated card-number PII signal
    * ([[graft.functions.LuhnCounts]]): counts of 13–19-digit maximal
    * runs and of those passing the Luhn mod-10 check — the
    * low-false-positive complement to the regex [[piiCount]] battery
    * (a random digit run passes Luhn ~10% of the time, so the valid
    * count is the actionable one). */
  def luhnSignals(text: Column): Column = {
    val a = graft.functions.TextExpressions.luhnCounts(text)
    struct(a.getItem(0).cast("long").as("cc_candidates"),
      a.getItem(1).cast("long").as("cc_valid"))
  }

  /** Gopher-style duplicate-LINE repetition signals: a struct of
    * `n_lines`, `dup_lines`, `dup_line_frac` (occurrences beyond the
    * first occurrence of each distinct non-empty trimmed line, over
    * all non-empty lines) and `dup_char_frac` (same, weighted by
    * line length in code points) — the line-granularity complement
    * to [[repetitionScore]]'s 3-gram view, flagging navigation
    * boilerplate and copy-pasted blocks. One pass per row
    * ([[graft.functions.DupLineStats]]), fractions 0 for docs with
    * no non-empty lines. */
  def dupLineSignals(text: Column): Column = {
    val s = graft.functions.TextExpressions.dupLineStats(text)
    val nl = s.getItem(0)
    val dl = s.getItem(1)
    val dc = s.getItem(2)
    val tc = s.getItem(3)
    struct(
      nl.as("n_lines"), dl.as("dup_lines"),
      when(nl > 0, dl.cast("double") / nl.cast("double")).otherwise(lit(0.0))
        .as("dup_line_frac"),
      when(tc > 0, dc.cast("double") / tc.cast("double")).otherwise(lit(0.0))
        .as("dup_char_frac"))
  }

  /** Token-window chunks for context-length-bounded training: chunk i
    * covers tokens [i·step, i·step + chunkTokens) with
    * step = chunkTokens − overlap; the final chunk may be partial.
    * Returns array<struct<chunk_id, chunk>> — explode downstream.
    * Per-row expression only (no shuffle): chunking 100 TB is a map. */
  def chunkTokens(text: Column, chunkTokens: Int, overlap: Int): Column = {
    require(overlap >= 0 && overlap < chunkTokens, "need 0 <= overlap < chunkTokens")
    val step = chunkTokens - overlap
    val toks = split(text, "\\s+")
    val nChunks = ceil((greatest(size(toks) - overlap, lit(1))).cast("double") / step).cast("int")
    transform(sequence(lit(0), nChunks - 1), i =>
      struct(i.as("chunk_id"),
        concat_ws(" ", slice(toks, i * lit(step) + lit(1), lit(chunkTokens))).as("chunk")))
  }

  /** Adjacent-bigram stream of a document, shuffle-free: zip the
    * token array against itself shifted by one (`slice` +
    * `arrays_zip`), no self-join and no per-doc window sort. Returns
    * array<struct<w1,w2>> ready to explode. */
  def bigrams(text: Column): Column = {
    val toks = split(lower(text), "\\s+")
    val n = size(toks)
    arrays_zip(slice(toks, lit(1), n - 1).as("w1"), slice(toks, lit(2), n - 1).as("w2"))
  }

  /** Word n-gram shingles; empty array when the doc has < n words.
    *
    * Native one-pass expression ([[graft.functions.WordShingles]]):
    * the shingle strings are emitted directly from token spans in a
    * single sweep. Two prior formulations were measured and rejected:
    * `transform(sequence(...), i => concat_ws(slice(toks, i, n)))`
    * re-evaluates the regex split once per index (interpreted lambda
    * bodies have no subtree caching; 7.2s at sf0.1), and the
    * zip-of-shifted-slices form pays 1 + n + 2 intermediate array
    * allocations per row (0.9s). */
  def wordShingles(text: Column, n: Int): Column =
    graft.functions.TextExpressions.wordShingles(lower(text), n)
}
