package graft.functions

import org.apache.spark.sql.{Column, GraftColumnBridge}
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
import org.apache.spark.sql.catalyst.expressions.UnsafeArrayData
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, IntegerType, LongType, StringType, StructField, StructType}
import org.apache.spark.unsafe.types.UTF8String

/** Count, for each of `sets`, how many word-runs of the input are
  * members — all sets in ONE pass over the text.
  *
  * Replaces N `regexp_extract_all(text, '\\b(w1|w2|...)\\b')` scans
  * (one per marker set) with a single character sweep + hash lookup.
  * Exactly equivalent to the regex count when every marker is made of
  * word characters ([A-Za-z0-9_], the ASCII `\w` of both Java and
  * RE2): a `\b`-delimited alternation match is then precisely a
  * maximal word-run equal to a marker. The DuckDB oracles keep the
  * regex formulation — the gate proves the equivalence on real data.
  *
  * Scalar loop is plain JVM code via CodegenFallback (the sweep
  * dominates; fallback costs one virtual call per row — contrast
  * [[CosineSimilarity]] which inlines via doGenCode because its loop
  * body is arithmetic the JIT can vectorize).
  */
case class WordSetsCount(child: Expression, sets: Seq[Seq[String]])
    extends UnaryExpression with CodegenFallback {

  override def dataType: DataType = ArrayType(IntegerType, containsNull = false)

  @transient private lazy val lookup: java.util.HashMap[String, Array[Int]] = {
    val m = new java.util.HashMap[String, Array[Int]]()
    sets.zipWithIndex.foreach { case (ws, i) =>
      ws.foreach { w =>
        val prev = m.get(w)
        m.put(w, if (prev == null) Array(i) else prev :+ i)
      }
    }
    m
  }

  private def isWordChar(c: Char): Boolean =
    (c >= 'a' && c <= 'z') || (c >= 'A' && c <= 'Z') || (c >= '0' && c <= '9') || c == '_'

  override def nullSafeEval(input: Any): Any = {
    val s = input.asInstanceOf[UTF8String].toString
    val counts = new Array[Int](sets.length)
    var i = 0
    val n = s.length
    while (i < n) {
      if (isWordChar(s.charAt(i))) {
        var j = i + 1
        while (j < n && isWordChar(s.charAt(j))) j += 1
        val hit = lookup.get(s.substring(i, j))
        if (hit != null) {
          var k = 0
          while (k < hit.length) { counts(hit(k)) += 1; k += 1 }
        }
        i = j
      } else i += 1
    }
    UnsafeArrayData.fromPrimitiveArray(counts)
  }

  override protected def withNewChildInternal(c: Expression): Expression = copy(child = c)
}

/** `size(split(text, "\\s+"))` as a one-pass counter: the token count
  * of a Java-regex split with limit -1 is (number of maximal
  * whitespace runs) + 1 — leading whitespace contributes an empty
  * first token and trailing whitespace an empty last token, exactly
  * as the regex split does, so the DuckDB `string_split_regex`
  * oracles keep matching. Whitespace is Java's ASCII `\s`
  * ([ \t\n\x0B\f\r]); no token array is materialized. */
case class WsTokenCount(child: Expression)
    extends UnaryExpression with CodegenFallback {

  override def dataType: DataType = IntegerType

  override def nullSafeEval(input: Any): Any = {
    val s = input.asInstanceOf[UTF8String].toString
    var runs = 0
    var i = 0
    val n = s.length
    while (i < n) {
      if (TextScan.isSpace(s.charAt(i))) {
        runs += 1
        while (i < n && TextScan.isSpace(s.charAt(i))) i += 1
      } else i += 1
    }
    runs + 1
  }

  override protected def withNewChildInternal(c: Expression): Expression = copy(child = c)
}

/** `size(regexp_extract_all(text, "[^\\w\\s]"))` as a one-pass
  * counter: code points that are neither ASCII word characters
  * ([A-Za-z0-9_], Java/RE2 `\w`) nor ASCII whitespace. Counted per
  * code point (surrogate pairs advance as one), matching the regex
  * engine's per-match counting. */
case class PunctCount(child: Expression)
    extends UnaryExpression with CodegenFallback {

  override def dataType: DataType = IntegerType

  override def nullSafeEval(input: Any): Any = {
    val s = input.asInstanceOf[UTF8String].toString
    var count = 0
    var i = 0
    val n = s.length
    while (i < n) {
      val cp = s.codePointAt(i)
      if (!TextScan.isWordCp(cp) && !TextScan.isSpaceCp(cp)) count += 1
      i += Character.charCount(cp)
    }
    count
  }

  override protected def withNewChildInternal(c: Expression): Expression = copy(child = c)
}

/** Word n-gram shingles in one pass — the native form of the
  * zip-of-shifted-slices construction in
  * [[graft.ext.TextAnalysis.wordShingles]] (same output: split the
  * input on whitespace runs keeping leading/trailing empty tokens,
  * join each window of `n` consecutive tokens with a single space;
  * empty array when there are fewer than `n` tokens). The composable
  * form allocates 1 + n + 2 intermediate arrays per row through
  * interpreted higher-order lambdas; this emits the shingle strings
  * directly from the token spans. Caller lowercases the child. */
case class WordShingles(child: Expression, n: Int)
    extends UnaryExpression with CodegenFallback {

  override def dataType: DataType = ArrayType(StringType, containsNull = false)

  override def nullSafeEval(input: Any): Any = {
    val s = input.asInstanceOf[UTF8String].toString
    val len = s.length
    // token spans of split("\s+", -1): runs of whitespace separate
    // tokens; a leading run yields an empty first token, a trailing
    // run an empty last token
    val starts = new java.util.ArrayList[Integer]()
    val ends = new java.util.ArrayList[Integer]()
    var i = 0
    var tokenStart = 0
    while (i < len) {
      if (TextScan.isSpace(s.charAt(i))) {
        starts.add(tokenStart); ends.add(i)
        while (i < len && TextScan.isSpace(s.charAt(i))) i += 1
        tokenStart = i
      } else i += 1
    }
    starts.add(tokenStart); ends.add(len)
    val m = starts.size()
    val nShingles = math.max(m - (n - 1), 0)
    val out = new Array[Any](nShingles)
    val sb = new java.lang.StringBuilder()
    var k = 0
    while (k < nShingles) {
      sb.setLength(0)
      var j = 0
      while (j < n) {
        if (j > 0) sb.append(' ')
        sb.append(s, starts.get(k + j), ends.get(k + j))
        j += 1
      }
      out(k) = UTF8String.fromString(sb.toString)
      k += 1
    }
    new org.apache.spark.sql.catalyst.util.GenericArrayData(out)
  }

  override protected def withNewChildInternal(c: Expression): Expression = copy(child = c)
}

/** Polynomial rolling-hash fingerprint of a document:
  * `h = (h·31 + codePoint) mod 1_000_000_007` over the text's code
  * points, h₀ = 0 — the classic 31-polynomial (Java `hashCode`
  * family) reduced mod a prime so every intermediate fits a 64-bit
  * signed integer on ANY engine ((p−1)·31 + 0x10FFFF < 2⁶³). Unlike
  * the xxhash64-based [[graft.ext.TextAnalysis.fingerprint]], this is
  * portably re-derivable in plain SQL (DuckDB: `list_reduce` over
  * `unicode(substr(…))`), so the driver gate can value-check it. */
case class RollingHash(child: Expression)
    extends UnaryExpression with CodegenFallback {

  override def dataType: DataType = LongType

  override def nullSafeEval(input: Any): Any = {
    val s = input.asInstanceOf[UTF8String].toString
    var h = 0L
    var i = 0
    val n = s.length
    while (i < n) {
      val cp = s.codePointAt(i)
      h = (h * 31L + cp) % 1000000007L
      i += Character.charCount(cp)
    }
    h
  }

  override protected def withNewChildInternal(c: Expression): Expression = copy(child = c)
}

/** One-pass per-code-point character-class census — the
  * encoding-corruption (mojibake) signal battery: returns
  * `[letter, digit, whitespace, punct, control, replacement, other]`
  * counts. Classes are pinned to ASCII definitions (plus the literal
  * U+FFFD replacement character) rather than Unicode categories, so
  * they are BYTE-DETERMINISTIC in every engine — Java and RE2
  * Unicode tables can disagree across versions, ASCII ranges cannot:
  *
  *   - letter  [A-Za-z]; digit [0-9]
  *   - whitespace = ASCII `\s` ([ \t\n\x0B\f\r]) — takes precedence
  *     over control for 0x09–0x0D
  *   - punct = remaining printable ASCII ([\x21-\x2f\x3a-\x40
  *     \x5b-\x60\x7b-\x7e])
  *   - control = [\x00-\x08\x0e-\x1f\x7f]
  *   - replacement = U+FFFD (the decoder's substitution marker —
  *     its presence IS the mojibake evidence)
  *   - other = every remaining code point (all non-ASCII): the
  *     non-ASCII ratio that feeds lang/script heuristics
  *
  * Counted per code point (surrogate pairs advance as one, matching
  * DuckDB `length()`); an oracle expresses each class as
  * `length(regexp_replace(text, '[^<class>]', '', 'g'))`. */
case class CharClassCounts(child: Expression)
    extends UnaryExpression with CodegenFallback {

  override def dataType: DataType = ArrayType(IntegerType, containsNull = false)

  override def nullSafeEval(input: Any): Any = {
    val s = input.asInstanceOf[UTF8String].toString
    val counts = new Array[Int](7)
    var i = 0
    val n = s.length
    while (i < n) {
      val cp = s.codePointAt(i)
      val cls =
        if ((cp >= 'A' && cp <= 'Z') || (cp >= 'a' && cp <= 'z')) 0
        else if (cp >= '0' && cp <= '9') 1
        else if (TextScan.isSpaceCp(cp)) 2
        else if ((cp >= 0x21 && cp <= 0x2f) || (cp >= 0x3a && cp <= 0x40) ||
                 (cp >= 0x5b && cp <= 0x60) || (cp >= 0x7b && cp <= 0x7e)) 3
        else if (cp <= 0x1f || cp == 0x7f) 4
        else if (cp == 0xfffd) 5
        else 6
      counts(cls) += 1
      i += Character.charCount(cp)
    }
    UnsafeArrayData.fromPrimitiveArray(counts)
  }

  override protected def withNewChildInternal(c: Expression): Expression = copy(child = c)
}

/** Content-defined chunk boundaries (CDC) — the dedup-friendly
  * alternative to fixed-size chunking: a cut lands wherever the
  * polynomial hash of the LAST `window` code points satisfies
  * `h mod 2^maskBits == 0`, so boundaries are anchored to CONTENT.
  * Insert or delete a character and only the chunks touching the
  * edit change — downstream chunk-hash dedup re-synchronizes within
  * one chunk, where fixed-size chunking would shift every boundary
  * after the edit (the rsync/LBFS construction, Muthitacharoen et
  * al. 2001; expected chunk length ≈ 2^maskBits).
  *
  * Returns the ASCENDING array of 1-based code-point END positions:
  * every p ≥ window whose trailing-window hash matches AND that has
  * no raw match in the preceding `window−1` positions (the
  * minimum-chunk-length rule — without it adjacent hash matches
  * produce 1-char chunks whose hashes collide across unrelated
  * documents; suppression keys off RAW matches, not emitted cuts,
  * which keeps the rule content-LOCAL: an oracle needs only a lag
  * over match positions, no sequential cut state), plus the text
  * length as the final boundary (not duplicated if it already
  * matched); empty text → empty array. The hash is the same
  * `h·31 + cp mod 1e9+7` family as [[RollingHash]], maintained
  * incrementally (subtract the outgoing code point's `31^window`
  * term, normalize positive) — one O(len) pass per row, while an
  * oracle recomputes each position's window independently and must
  * agree exactly. */
case class CdcBoundaries(child: Expression, window: Int, maskBits: Int)
    extends UnaryExpression with CodegenFallback {
  require(window > 0 && maskBits >= 0 && maskBits < 31,
    "need window > 0 and 0 <= maskBits < 31")

  override def dataType: DataType = ArrayType(IntegerType, containsNull = false)

  private val P = 1000000007L
  private val mask = (1L << maskBits) - 1L
  private val powW: Long = {
    var r = 1L
    var i = 0
    while (i < window) { r = r * 31L % P; i += 1 }
    r
  }

  override def nullSafeEval(input: Any): Any = {
    val cps = input.asInstanceOf[UTF8String].toString.codePoints().toArray
    val n = cps.length
    val out = scala.collection.mutable.ArrayBuffer.empty[Int]
    var h = 0L
    var lastRaw = -window // sentinel: first raw match is never suppressed
    var i = 0
    while (i < n) {
      h = (h * 31L + cps(i)) % P
      if (i >= window) h = ((h - cps(i - window) * powW % P) % P + P) % P
      if (i >= window - 1 && (h & mask) == 0L) {
        val p = i + 1
        if (p - lastRaw >= window) out += p
        lastRaw = p
      }
      i += 1
    }
    if (n > 0 && (out.isEmpty || out.last != n)) out += n
    UnsafeArrayData.fromPrimitiveArray(out.toArray)
  }

  override protected def withNewChildInternal(c: Expression): Expression = copy(child = c)
}

/** Canonicalize text for dedup/joining: Unicode NFC composition →
  * per-code-point simple lowercase → ASCII-whitespace run collapse to
  * a single space with leading/trailing runs dropped, all in one
  * post-NFC sweep. Exactly
  * `trim(regexp_replace(lower(nfc_normalize(t)), '[ \t\n\x0B\f\r]+', ' ', 'g'), ' ')`
  * in DuckDB: both engines implement UAX #15 NFC, and
  * `Character.toLowerCase(int)` is the same UnicodeData simple 1:1
  * mapping utf8proc's `lower` applies (İ → i, ß stays ß — NOT the
  * locale/full mappings of `String.toLowerCase`, which would expand
  * İ to i+combining-dot and diverge). Composed and decomposed
  * spellings of the same word normalize to identical bytes, which is
  * what makes downstream hash-dedup see them as equal. */
case class NormalizeText(child: Expression)
    extends UnaryExpression with CodegenFallback {

  override def dataType: DataType = StringType

  override def nullSafeEval(input: Any): Any = {
    val s = java.text.Normalizer.normalize(
      input.asInstanceOf[UTF8String].toString, java.text.Normalizer.Form.NFC)
    val n = s.length
    val sb = new java.lang.StringBuilder(n)
    var i = 0
    var pendingSpace = false
    var started = false
    while (i < n) {
      val cp = s.codePointAt(i)
      if (TextScan.isSpaceCp(cp)) pendingSpace = true
      else {
        if (pendingSpace && started) sb.append(' ')
        pendingSpace = false
        started = true
        sb.appendCodePoint(Character.toLowerCase(cp))
      }
      i += Character.charCount(cp)
    }
    UTF8String.fromString(sb.toString)
  }

  override protected def withNewChildInternal(c: Expression): Expression = copy(child = c)
}

/** Winnowing document fingerprints (Schleimer, Wilkerson & Aiken,
  * "Winnowing: Local Algorithms for Document Fingerprinting",
  * SIGMOD 2003 — the MOSS algorithm): hash every k-gram of code
  * points with the SQL-portable 31-polynomial mod 1e9+7, slide a
  * window of `w` consecutive k-gram hashes, and select each window's
  * MINIMUM hash (ties → rightmost position). Overlapping windows
  * mostly re-select the same k-gram, so the distinct selections are
  * a ~2/(w+1)-density sample of the k-grams with the winnowing
  * guarantee: any shared substring of length ≥ k+w−1 between two
  * documents yields at least one shared fingerprint — the
  * position-robust dedup/plagiarism key that fixed-stride sampling
  * lacks. Documents with fewer than `w` k-grams (but ≥ 1) winnow a
  * single whole-range window so short docs still fingerprint.
  *
  * One pass per row: rolling k-gram hashes + a monotonic deque for
  * the sliding-window minimum (pop-while-`≥` makes the rightmost of
  * equal minima survive, the paper's tie rule). Returns the distinct
  * selections ascending as array<struct<pos:int, h:long>> with `pos`
  * the 1-based code-point start of the k-gram — both replayable in
  * SQL via per-position hash lists + window slicing. */
case class WinnowFingerprints(child: Expression, k: Int, w: Int)
    extends UnaryExpression with CodegenFallback {
  require(k > 0 && w > 0, "need positive k and w")

  override def dataType: DataType = ArrayType(
    StructType(Seq(StructField("pos", IntegerType, nullable = false),
      StructField("h", LongType, nullable = false))), containsNull = false)

  private val P = 1000000007L

  override def nullSafeEval(input: Any): Any = {
    val s = input.asInstanceOf[UTF8String].toString
    val cps = s.codePoints().toArray
    val n = cps.length
    val m = n - k + 1
    if (m <= 0) return new GenericArrayData(Array.empty[Any])
    // rolling k-gram hashes: h(p+1) = (h(p) − cp[p]·31^(k−1))·31 + cp[p+k]
    var pow = 1L
    var i = 1
    while (i < k) { pow = pow * 31 % P; i += 1 }
    val hs = new Array[Long](m)
    var h = 0L
    i = 0
    while (i < k) { h = (h * 31 + cps(i)) % P; i += 1 }
    hs(0) = h
    var p = 1
    while (p < m) {
      h = ((h - cps(p - 1) * pow % P + P) % P * 31 + cps(p + k - 1)) % P
      hs(p) = h
      p += 1
    }
    val win = math.min(w, m)
    // monotonic deque of k-gram indices with increasing hashes; the
    // head is the window minimum, and pop-while-≥ keeps the rightmost
    // of equal minima (the winnowing tie rule)
    val dq = new Array[Int](m)
    var head = 0
    var tail = 0 // exclusive
    val selPos = new scala.collection.mutable.ArrayBuffer[Int]()
    p = 0
    while (p < m) {
      while (tail > head && hs(dq(tail - 1)) >= hs(p)) tail -= 1
      dq(tail) = p; tail += 1
      if (dq(head) <= p - win) head += 1
      if (p >= win - 1 &&
          (selPos.isEmpty || selPos.last != dq(head))) selPos += dq(head)
      p += 1
    }
    new GenericArrayData(selPos.map(q =>
      InternalRow(q + 1, hs(q)): Any).toArray)
  }

  override protected def withNewChildInternal(c: Expression): Expression = copy(child = c)
}

/** One-pass duplicate-line census — the Gopher-style intra-document
  * repetition signals at LINE granularity (duplicate-line fraction
  * and duplicate-line CHARACTER fraction), complementing
  * [[graft.ext.TextAnalysis.repetitionScore]]'s 3-gram view. Lines
  * are split on `\n`; each line is trimmed of ASCII space/tab/CR
  * (so `\r\n` endings and indentation don't defeat the match) and
  * empty lines are skipped. Returns `[n_lines, dup_lines, dup_chars,
  * total_chars]` as int64s — every occurrence of a line beyond its
  * first counts as a duplicate, with its length in CODE POINTS (the
  * unit both engines' `length()` agree on); ratio assembly is left
  * to the caller so the hashed gate compares exact integers. One
  * hash map over the document's lines, no shuffle, no explode. */
case class DupLineStats(child: Expression)
    extends UnaryExpression with CodegenFallback {

  override def dataType: DataType = ArrayType(LongType, containsNull = false)

  override def nullSafeEval(input: Any): Any = {
    val s = input.asInstanceOf[UTF8String].toString
    val counts = new java.util.HashMap[String, Long]()
    val lens = new java.util.HashMap[String, Long]()
    var start = 0
    val n = s.length
    var nLines = 0L
    var totalChars = 0L
    def take(endExcl: Int): Unit = {
      var a = start
      var z = endExcl
      while (a < z && { val c = s.charAt(a); c == ' ' || c == '\t' || c == '\r' }) a += 1
      while (z > a && { val c = s.charAt(z - 1); c == ' ' || c == '\t' || c == '\r' }) z -= 1
      if (z > a) {
        val line = s.substring(a, z)
        val len = line.codePointCount(0, line.length).toLong
        counts.merge(line, 1L, (x, y) => x + y)
        lens.put(line, len)
        nLines += 1
        totalChars += len
      }
    }
    var i = 0
    while (i < n) {
      if (s.charAt(i) == '\n') { take(i); start = i + 1 }
      i += 1
    }
    take(n)
    var dupLines = 0L
    var dupChars = 0L
    val it = counts.entrySet().iterator()
    while (it.hasNext) {
      val e = it.next()
      if (e.getValue > 1) {
        dupLines += e.getValue - 1
        dupChars += (e.getValue - 1) * lens.get(e.getKey)
      }
    }
    UnsafeArrayData.fromPrimitiveArray(Array(nLines, dupLines, dupChars, totalChars))
  }

  override protected def withNewChildInternal(c: Expression): Expression = copy(child = c)
}

/** Multi-pattern SUBSTRING occurrence counter via an Aho–Corasick
  * automaton (Aho & Corasick, CACM 1975) — the blocklist matcher
  * ([[WordSetsCount]] is word-BOUNDED; banned domains, slurs-inside-
  * words, and code signatures need substring semantics). Counts ALL
  * occurrences of every pattern, including overlapping ones and
  * matches sharing positions across patterns, in ONE text pass:
  * the automaton (goto + failure links with precomputed output
  * closures) is built once per operator instance and reused for
  * every row, so P patterns cost O(len + matches) per row instead
  * of P separate scans. Matching is over UTF-16 code units —
  * exactly equal to code-point matching for BMP patterns (an
  * astral-plane pattern would need surrogate-aware positions; none
  * of the blocklist use cases do). Returns counts as array<long>
  * aligned with `patterns`. */
case class MultiPatternCount(child: Expression, patterns: Seq[String])
    extends UnaryExpression with CodegenFallback {
  require(patterns.nonEmpty && patterns.forall(_.nonEmpty),
    "need non-empty patterns")

  override def dataType: DataType = ArrayType(LongType, containsNull = false)

  // goto/fail/output-closure automaton, built once per instance and
  // shared by every row this (serialized) expression evaluates
  @transient private lazy val automaton: (Array[java.util.HashMap[Character, Integer]], Array[Int], Array[Array[Int]]) = {
    val goto = scala.collection.mutable.ArrayBuffer(
      new java.util.HashMap[Character, Integer]())
    val out = scala.collection.mutable.ArrayBuffer(List.empty[Int])
    patterns.zipWithIndex.foreach { case (p, pi) =>
      var s = 0
      p.foreach { c =>
        val nxt = goto(s).get(c)
        if (nxt == null) {
          goto += new java.util.HashMap[Character, Integer]()
          out += Nil
          goto(s).put(c, goto.size - 1)
          s = goto.size - 1
        } else s = nxt
      }
      out(s) = pi :: out(s)
    }
    val n = goto.size
    val fail = new Array[Int](n)
    val queue = new java.util.ArrayDeque[Integer]()
    goto(0).forEach { (_: Character, v: Integer) =>
      fail(v.intValue) = 0; queue.add(v); ()
    }
    while (!queue.isEmpty) {
      val u = queue.poll().intValue
      goto(u).forEach { (c: Character, vv: Integer) =>
        val v = vv.intValue
        queue.add(vv)
        var f = fail(u)
        while (f != 0 && goto(f).get(c) == null) f = fail(f)
        val t = goto(f).get(c)
        fail(v) = if (t != null && t.intValue != v) t.intValue else 0
        out(v) = out(v) ++ out(fail(v)) // output closure via fail link
        ()
      }
    }
    (goto.toArray, fail, out.map(_.toArray).toArray)
  }

  override def nullSafeEval(input: Any): Any = {
    val s = input.asInstanceOf[UTF8String].toString
    val (goto, fail, out) = automaton
    val counts = new Array[Long](patterns.size)
    var st = 0
    var i = 0
    val n = s.length
    while (i < n) {
      val c = s.charAt(i)
      var t = goto(st).get(c)
      while (t == null && st != 0) { st = fail(st); t = goto(st).get(c) }
      st = if (t != null) t.intValue() else 0
      val o = out(st)
      var j = 0
      while (j < o.length) { counts(o(j)) += 1; j += 1 }
      i += 1
    }
    UnsafeArrayData.fromPrimitiveArray(counts)
  }

  override protected def withNewChildInternal(c: Expression): Expression = copy(child = c)
}

/** Luhn-checked card-number census — the checksum-validated PII
  * signal the regex battery ([[graft.ext.TextAnalysis.piiCount]])
  * can't give: a 16-digit run is only a plausible card number if it
  * passes the Luhn mod-10 check (ISO/IEC 7812), which screens out
  * ~90% of random digit runs. Semantics are strict MAXIMAL
  * ASCII-digit runs: a run of 13–19 digits is a candidate (shorter
  * runs, longer runs, and separator-broken numbers are not — the
  * cross-engine-exact contract; separator-tolerant matching would
  * need a normalization pass first). Returns
  * `[n_candidates, n_luhn_valid]`. One pass per row, no allocation
  * beyond the run scan. */
case class LuhnCounts(child: Expression)
    extends UnaryExpression with CodegenFallback {

  override def dataType: DataType = ArrayType(IntegerType, containsNull = false)

  override def nullSafeEval(input: Any): Any = {
    val s = input.asInstanceOf[UTF8String].toString
    val n = s.length
    var candidates = 0
    var valid = 0
    var i = 0
    while (i < n) {
      if (s.charAt(i) >= '0' && s.charAt(i) <= '9') {
        var j = i
        while (j < n && s.charAt(j) >= '0' && s.charAt(j) <= '9') j += 1
        val len = j - i
        if (len >= 13 && len <= 19) {
          candidates += 1
          var tot = 0
          var p = 0 // 0-based position from the RIGHT
          var q = j - 1
          while (q >= i) {
            var d = s.charAt(q) - '0'
            if (p % 2 == 1) { d *= 2; if (d > 9) d -= 9 }
            tot += d
            p += 1
            q -= 1
          }
          if (tot % 10 == 0) valid += 1
        }
        i = j
      } else i += 1
    }
    UnsafeArrayData.fromPrimitiveArray(Array(candidates, valid))
  }

  override protected def withNewChildInternal(c: Expression): Expression = copy(child = c)
}

/** Duplicate-line REMOVAL — the rewrite whose need [[DupLineStats]]
  * only measures: every distinct trimmed non-empty line survives at
  * its FIRST occurrence only, in original order, re-joined with
  * `\n`. Navigation chrome and copy-pasted blocks collapse to one
  * copy while the prose between them is untouched. Same line
  * semantics as the census (split on `\n`, trim ASCII
  * space/tab/CR, skip blanks) so `dupLineStats(dedupLines(t))`
  * reports zero duplicates by construction. One pass, one hash set
  * per row. */
case class DedupLines(child: Expression)
    extends UnaryExpression with CodegenFallback {

  override def dataType: DataType = StringType

  override def nullSafeEval(input: Any): Any = {
    val s = input.asInstanceOf[UTF8String].toString
    val seen = new java.util.HashSet[String]()
    val sb = new java.lang.StringBuilder(s.length)
    val n = s.length
    var start = 0
    def take(endExcl: Int): Unit = {
      var a = start
      var z = endExcl
      while (a < z && { val c = s.charAt(a); c == ' ' || c == '\t' || c == '\r' }) a += 1
      while (z > a && { val c = s.charAt(z - 1); c == ' ' || c == '\t' || c == '\r' }) z -= 1
      if (z > a) {
        val line = s.substring(a, z)
        if (seen.add(line)) {
          if (sb.length > 0) sb.append('\n')
          sb.append(line)
        }
      }
    }
    var i = 0
    while (i < n) {
      if (s.charAt(i) == '\n') { take(i); start = i + 1 }
      i += 1
    }
    take(n)
    UTF8String.fromString(sb.toString)
  }

  override protected def withNewChildInternal(c: Expression): Expression = copy(child = c)
}

/** Shared character-class predicates (Java regex ASCII semantics). */
object TextScan {
  def isSpace(c: Char): Boolean =
    c == ' ' || c == '\t' || c == '\n' || c == '\u000B' || c == '\f' || c == '\r'
  def isSpaceCp(cp: Int): Boolean = cp < 128 && isSpace(cp.toChar)
  def isWordCp(cp: Int): Boolean =
    (cp >= 'a' && cp <= 'z') || (cp >= 'A' && cp <= 'Z') ||
      (cp >= '0' && cp <= '9') || cp == '_'
}

object TextExpressions {
  import GraftColumnBridge.{column, expression}
  /** One-pass membership counts of word-runs for several word sets. */
  def wordSetsCount(text: Column, sets: Seq[Seq[String]]): Column =
    column(WordSetsCount(expression(text), sets))

  /** One-pass whitespace token count (== size(split(text, "\\s+"))). */
  def wsTokenCount(text: Column): Column =
    column(WsTokenCount(expression(text)))

  /** One-pass punctuation count (== size of all [^\w\s] matches). */
  def punctCount(text: Column): Column =
    column(PunctCount(expression(text)))

  /** One-pass 7-way character-class census (see [[CharClassCounts]]). */
  def charClassCounts(text: Column): Column =
    column(CharClassCounts(expression(text)))

  /** One-pass word n-gram shingles (caller lowercases). */
  def wordShingles(text: Column, n: Int): Column =
    column(WordShingles(expression(text), n))

  /** Polynomial rolling hash mod 1e9+7 (SQL-portable fingerprint). */
  def rollingHash(text: Column): Column =
    column(RollingHash(expression(text)))

  /** Content-defined chunk boundary positions ([[CdcBoundaries]]). */
  def cdcBoundaries(text: Column, window: Int, maskBits: Int): Column =
    column(CdcBoundaries(expression(text), window, maskBits))

  /** Canonical text form: NFC → simple lowercase → whitespace
    * collapse ([[NormalizeText]]). */
  def normalizeText(text: Column): Column =
    column(NormalizeText(expression(text)))

  /** One-pass duplicate-line census `[n_lines, dup_lines, dup_chars,
    * total_chars]` ([[DupLineStats]]). */
  def dupLineStats(text: Column): Column =
    column(DupLineStats(expression(text)))

  /** Duplicate-line removal rewrite ([[DedupLines]]). */
  def dedupLines(text: Column): Column =
    column(DedupLines(expression(text)))

  /** Winnowing fingerprints array<struct<pos,h>>
    * ([[WinnowFingerprints]]). */
  def winnowFingerprints(text: Column, k: Int, w: Int): Column =
    column(WinnowFingerprints(expression(text), k, w))

  /** Luhn card-number census `[n_candidates, n_luhn_valid]`
    * ([[LuhnCounts]]). */
  def luhnCounts(text: Column): Column =
    column(LuhnCounts(expression(text)))

  /** Aho–Corasick substring occurrence counts, aligned with
    * `patterns` ([[MultiPatternCount]]). */
  def multiPatternCount(text: Column, patterns: Seq[String]): Column =
    column(MultiPatternCount(expression(text), patterns))

  /** Make the text expressions available to `spark.sql` as
    * `ws_token_count(t)`, `punct_count(t)`, `word_shingles(t, n)`,
    * `rolling_hash(t)` (builder-time path: [[graft.GraftExtensions]]). */
  def register(spark: org.apache.spark.sql.SparkSession): Unit = {
    GraftColumnBridge.registerFunction(spark, "ws_token_count",
      exprs => WsTokenCount(exprs(0)))
    GraftColumnBridge.registerFunction(spark, "punct_count",
      exprs => PunctCount(exprs(0)))
    GraftColumnBridge.registerFunction(spark, "word_shingles",
      exprs => WordShingles(exprs(0),
        FunctionArgs.foldableInt("word_shingles", "n", exprs(1))))
    GraftColumnBridge.registerFunction(spark, "rolling_hash",
      exprs => RollingHash(exprs(0)))
    GraftColumnBridge.registerFunction(spark, "cdc_boundaries",
      exprs => CdcBoundaries(exprs(0),
        FunctionArgs.foldableInt("cdc_boundaries", "window", exprs(1)),
        FunctionArgs.foldableInt("cdc_boundaries", "mask_bits", exprs(2))))
    GraftColumnBridge.registerFunction(spark, "normalize_text",
      exprs => NormalizeText(exprs(0)))
  }
}
