package graft.functions

import java.nio.ByteBuffer

import org.apache.spark.sql.{Column, GraftColumnBridge}
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{Expression, ImplicitCastInputTypes}
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, DoubleType, IntegerType, LongType}

/** HyperLogLog distinct-count sketch (Flajolet et al. 2007, public
  * algorithm) as a [[TypedImperativeAggregate]].
  *
  * Why not `approx_count_distinct`: Spark's built-in HLL++ hashes with
  * a fixed internal scheme, so its estimate cannot be re-derived by
  * another engine — unacceptable when the cardinality feeds an
  * audited data-retention or dedup-budget decision. This sketch takes
  * an ALREADY-HASHED non-negative long column (caller picks the hash)
  * and uses only integer splits + exact power-of-two arithmetic, so
  * the identical estimate re-derives in plain SQL (the driver gate
  * value-checks it against DuckDB bit-for-bit; every term
  * `2^-register` is an exact double and all partial sums are exact,
  * so even summation order cannot perturb the result).
  *
  * 100 TB posture: the buffer is `m = 2^p` bytes per group regardless
  * of input size, merges by register-max (commutative, associative →
  * partial aggregation map-side), and the shuffle carries one m-byte
  * sketch per (partition, group) instead of the distinct keys —
  * exactly the shape `COUNT(DISTINCT)` cannot achieve.
  *
  * Register split of a hash `h < 2^hashBits`: index `j = h mod m`,
  * remainder `w = h div m < 2^(hashBits-p)`, register value
  * `rho = (hashBits-p) - floor(log2 w)` (i.e. leading-zero count of
  * `w` in a `hashBits-p`-wide window, plus one; `w = 0` →
  * `hashBits-p+1`). Estimate: `alpha_m * m^2 / sum_j 2^-M_j`, with
  * the published linear-counting correction `m·ln(m/V)` (V = zero
  * registers) when the raw estimate ≤ 2.5m — WITHOUT it the raw
  * estimator saturates near `alpha_m·m` for n ≪ m and is useless.
  * `correct = false` disables it for the SQL-portable variant:
  * `ln`'s libm rounding is not identical across engines, so the
  * portable contract instead requires n ≳ 2.5m (pick m small enough
  * for the cardinalities being audited) and accepts the raw
  * estimator's published bias below that.
  */
case class HllSketch(child: Expression, p: Int, hashBits: Int, correct: Boolean = true,
                     emitRegisters: Boolean = false,
                     mutableAggBufferOffset: Int = 0, inputAggBufferOffset: Int = 0)
    extends TypedImperativeAggregate[Array[Byte]] with ImplicitCastInputTypes {

  require(p >= 4 && p <= 16, "precision p must be in [4, 16]")
  require(hashBits > p && hashBits <= 63, "hashBits must be in (p, 63]")

  private val m = 1 << p
  private val capBits = hashBits - p

  // SQL-registered (`hll_distinct`) as well as column-API constructed:
  // the analyzer coerces integral inputs up to LONG and rejects
  // non-numeric ones at analysis time instead of a ClassCastException
  // mid-execution
  override def inputTypes: Seq[DataType] = Seq(LongType)

  override def createAggregationBuffer(): Array[Byte] = new Array[Byte](m)

  override def update(buf: Array[Byte], input: InternalRow): Array[Byte] = {
    val v = child.eval(input)
    if (v != null) {
      val h = v.asInstanceOf[Long]
      // the contract is an ALREADY-HASHED value in [0, 2^hashBits): a
      // negative or oversized input would index out of bounds (or
      // silently never update a register) — fail with the contract,
      // not an array index
      if (h < 0 || (hashBits < 63 && (h >>> hashBits) != 0))
        throw new IllegalArgumentException(
          s"hll_distinct expects a non-negative pre-hashed long < 2^$hashBits, got $h")
      val j = (h % m).toInt
      val w = h / m
      val rho =
        if (w == 0L) capBits + 1
        else capBits - (63 - java.lang.Long.numberOfLeadingZeros(w))
      if (rho > buf(j)) buf(j) = rho.toByte
    }
    buf
  }

  override def merge(buf: Array[Byte], other: Array[Byte]): Array[Byte] = {
    var j = 0
    while (j < m) { if (other(j) > buf(j)) buf(j) = other(j); j += 1 }
    buf
  }

  override def eval(buf: Array[Byte]): Any =
    if (emitRegisters) new GenericArrayData(buf.map(_.toInt))
    else HllSketch.estimate(buf, m, correct)

  override def serialize(buf: Array[Byte]): Array[Byte] = buf.clone()
  override def deserialize(bytes: Array[Byte]): Array[Byte] = bytes.clone()

  override def dataType: DataType =
    if (emitRegisters) ArrayType(IntegerType, containsNull = false) else DoubleType
  override def nullable: Boolean = false
  override def children: Seq[Expression] = Seq(child)
  override def withNewMutableAggBufferOffset(o: Int): HllSketch = copy(mutableAggBufferOffset = o)
  override def withNewInputAggBufferOffset(o: Int): HllSketch = copy(inputAggBufferOffset = o)
  override protected def withNewChildrenInternal(c: IndexedSeq[Expression]): Expression =
    copy(child = c.head)
}

object HllSketch {
  /** Raw / linear-counting HLL estimate from a register array —
    * shared by the aggregate's eval and the register-frame scalar
    * path ([[graft.ext.Sketches.hllEstimateFromRegisters]] is the
    * column-expression twin of this). */
  def estimate(regs: Array[Byte], m: Int, correct: Boolean): Double = {
    val alpha = m match {
      case 16 => 0.673
      case 32 => 0.697
      case 64 => 0.709
      case _  => 0.7213 / (1.0 + 1.079 / m)
    }
    var sum = 0.0
    var zeros = 0
    var j = 0
    while (j < m) {
      sum += 1.0 / (1L << regs(j))
      if (regs(j) == 0) zeros += 1
      j += 1
    }
    val raw = alpha * m * m / sum
    if (correct && raw <= 2.5 * m && zeros > 0) m * math.log(m.toDouble / zeros)
    else raw
  }
}

/** Merge of MATERIALIZED HLL register arrays: elementwise max. This
  * is the sketch lifecycle's second half — persist per-batch/per-day
  * register arrays (cheap: m ints), then combine arbitrary subsets
  * later without touching raw data. Union semantics hold exactly:
  * merge(regs(A), regs(B)) = regs(A ∪ B) because register max
  * commutes with the per-key max that built each side.
  */
case class HllMergeAgg(child: Expression,
                       mutableAggBufferOffset: Int = 0, inputAggBufferOffset: Int = 0)
    extends TypedImperativeAggregate[Array[Int]] with ImplicitCastInputTypes {

  override def inputTypes: Seq[DataType] = Seq(ArrayType(IntegerType))

  override def createAggregationBuffer(): Array[Int] = Array.empty

  override def update(buf: Array[Int], input: InternalRow): Array[Int] = {
    val v = child.eval(input)
    if (v == null) buf
    else {
      val arr = v.asInstanceOf[org.apache.spark.sql.catalyst.util.ArrayData].toIntArray()
      mergeArrays(buf, arr)
    }
  }

  private def mergeArrays(a: Array[Int], b: Array[Int]): Array[Int] =
    if (a.isEmpty) b.clone()
    else {
      require(a.length == b.length,
        s"cannot merge HLL sketches of different sizes: ${a.length} vs ${b.length}")
      var j = 0
      while (j < a.length) { if (b(j) > a(j)) a(j) = b(j); j += 1 }
      a
    }

  override def merge(buf: Array[Int], other: Array[Int]): Array[Int] =
    if (other.isEmpty) buf else mergeArrays(buf, other)

  override def eval(buf: Array[Int]): Any = new GenericArrayData(buf)

  override def serialize(buf: Array[Int]): Array[Byte] = {
    val bb = ByteBuffer.allocate(buf.length * 4)
    bb.asIntBuffer().put(buf)
    bb.array()
  }

  override def deserialize(bytes: Array[Byte]): Array[Int] = {
    val out = new Array[Int](bytes.length / 4)
    ByteBuffer.wrap(bytes).asIntBuffer().get(out)
    out
  }

  override def dataType: DataType = ArrayType(IntegerType, containsNull = false)
  override def nullable: Boolean = false
  override def children: Seq[Expression] = Seq(child)
  override def withNewMutableAggBufferOffset(o: Int): HllMergeAgg = copy(mutableAggBufferOffset = o)
  override def withNewInputAggBufferOffset(o: Int): HllMergeAgg = copy(inputAggBufferOffset = o)
  override protected def withNewChildrenInternal(c: IndexedSeq[Expression]): Expression =
    copy(child = c.head)
}

/** Count–min sketch (Cormode & Muthukrishnan 2005, public algorithm)
  * as a [[TypedImperativeAggregate]]: `d` hash rows × `w` counters
  * over an already-hashed non-negative long key, row hashes from the
  * portable universal family `(A_i·x + B_i) mod (1e9+7) mod w` with
  * MINSTD-derived constants (same family as the portable MinHash —
  * see [[graft.ext.Sampling.minstd2]]), so counters and estimates
  * re-derive in plain SQL.
  *
  * 100 TB posture: fixed `d·w·8` bytes of state however many items
  * stream in, merge = elementwise add (partial aggregation map-side;
  * the shuffle carries one sketch per partition, not the item
  * stream). Point estimate = min over rows — always ≥ the true count,
  * over by at most ε·N with prob 1−δ for `w = e/ε`, `d = ln(1/δ)`.
  *
  * `eval` returns the raw `d·w` counter matrix (row-major) so
  * estimation composes as a plain column expression over the array —
  * see [[graft.ext.Sketches.cmsEstimate]].
  */
case class CountMinSketchAgg(child: Expression, d: Int, w: Int,
                             constIndexBase: Int = 150,
                             mutableAggBufferOffset: Int = 0, inputAggBufferOffset: Int = 0)
    extends TypedImperativeAggregate[Array[Long]] with ImplicitCastInputTypes {

  require(d >= 1 && d <= 16, "depth d must be in [1, 16]")
  require(w >= 2 && w <= (1 << 20), "width w must be in [2, 2^20]")

  override def inputTypes: Seq[DataType] = Seq(LongType)

  private val P = 1000000007L
  // (A_i, B_i) for row i — twice-iterated MINSTD of small odd/even
  // indexes, identical to the SQL twin's `consts` CTE
  @transient private lazy val consts: Array[(Long, Long)] =
    Array.tabulate(d) { i =>
      val idx = constIndexBase + i
      (graft.ext.Sampling.minstd2(2 * idx + 1), graft.ext.Sampling.minstd2(2 * idx + 2))
    }

  override def createAggregationBuffer(): Array[Long] = new Array[Long](d * w)

  override def update(buf: Array[Long], input: InternalRow): Array[Long] = {
    val v = child.eval(input)
    if (v != null) {
      val x = v.asInstanceOf[Long]
      // negative input makes Java's % negative → negative counter
      // index, and a key ≥ P overflows a·x+b — the contract is a
      // pre-hashed key in [0, P) (graft.ext.Sketches.keyHash pmods
      // any long into range)
      if (x < 0 || x >= P)
        throw new IllegalArgumentException(
          s"cms_sketch expects a pre-hashed long key in [0, ${P}), got $x")
      var i = 0
      while (i < d) {
        val (a, b) = consts(i)
        val bkt = (((a * x + b) % P) % w).toInt
        buf(i * w + bkt) += 1L
        i += 1
      }
    }
    buf
  }

  override def merge(buf: Array[Long], other: Array[Long]): Array[Long] = {
    var i = 0
    while (i < buf.length) { buf(i) += other(i); i += 1 }
    buf
  }

  override def eval(buf: Array[Long]): Any = new GenericArrayData(buf.clone())

  override def serialize(buf: Array[Long]): Array[Byte] = {
    val bb = ByteBuffer.allocate(buf.length * 8)
    bb.asLongBuffer().put(buf)
    bb.array()
  }

  override def deserialize(bytes: Array[Byte]): Array[Long] = {
    val out = new Array[Long](bytes.length / 8)
    ByteBuffer.wrap(bytes).asLongBuffer().get(out)
    out
  }

  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def nullable: Boolean = false
  override def children: Seq[Expression] = Seq(child)
  override def withNewMutableAggBufferOffset(o: Int): CountMinSketchAgg = copy(mutableAggBufferOffset = o)
  override def withNewInputAggBufferOffset(o: Int): CountMinSketchAgg = copy(inputAggBufferOffset = o)
  override protected def withNewChildrenInternal(c: IndexedSeq[Expression]): Expression =
    copy(child = c.head)
}

/** Misra–Gries heavy-hitters summary (Misra & Gries 1982; merge rule
  * from Agarwal et al. 2013 — both public algorithms): at most `k`
  * (key, count) counters however many items stream in.
  *
  *   - update: increment a tracked key; start an untracked key at 1
  *     if a slot is free; otherwise decrement EVERY counter (dropping
  *     zeros) — the classic majority-vote generalization.
  *   - merge: add counts keywise, then subtract the (k+1)-largest
  *     count from all and keep positives — state stays ≤ k and the
  *     error bound composes across partitions.
  *
  * Guarantees (what the spec asserts; the summary itself is
  * processing-order-dependent WITHIN these bounds, so this is a
  * property-tested operator, not an oracle-gated one):
  *   - every key with true frequency > N/(k+1) is present;
  *   - stored count ≤ true count ≤ stored count + N/(k+1).
  *
  * The 100 TB story: heavy hitters over a token/URL/domain stream
  * with `k·16` bytes of state per group and map-side partial merge —
  * `groupBy(token)` at that scale shuffles the full vocabulary;
  * this shuffles ≤ k counters per partition.
  */
case class MisraGriesAgg(child: Expression, k: Int,
                         mutableAggBufferOffset: Int = 0, inputAggBufferOffset: Int = 0)
    extends TypedImperativeAggregate[java.util.HashMap[Long, Long]] {

  require(k >= 1 && k <= 4096, "k must be in [1, 4096]")

  override def createAggregationBuffer(): java.util.HashMap[Long, Long] =
    new java.util.HashMap[Long, Long](k * 2)

  override def update(buf: java.util.HashMap[Long, Long],
                      input: InternalRow): java.util.HashMap[Long, Long] = {
    val v = child.eval(input)
    if (v != null) {
      val x = v.asInstanceOf[Long]
      val cur = buf.get(x)
      if (cur != 0L || buf.containsKey(x)) buf.put(x, cur + 1L)
      else if (buf.size < k) buf.put(x, 1L)
      else {
        val it = buf.entrySet().iterator()
        while (it.hasNext) {
          val e = it.next()
          if (e.getValue == 1L) it.remove() else e.setValue(e.getValue - 1L)
        }
      }
    }
    buf
  }

  override def merge(buf: java.util.HashMap[Long, Long],
                     other: java.util.HashMap[Long, Long]): java.util.HashMap[Long, Long] = {
    val oit = other.entrySet().iterator()
    while (oit.hasNext) {
      val e = oit.next()
      buf.merge(e.getKey, e.getValue, (a, b) => a + b)
    }
    if (buf.size > k) {
      // subtract the (k+1)-largest count, keep positives
      val counts = new Array[Long](buf.size)
      var i = 0
      val cit = buf.values().iterator()
      while (cit.hasNext) { counts(i) = cit.next(); i += 1 }
      java.util.Arrays.sort(counts)
      val sub = counts(buf.size - k - 1)
      val it = buf.entrySet().iterator()
      while (it.hasNext) {
        val e = it.next()
        if (e.getValue <= sub) it.remove() else e.setValue(e.getValue - sub)
      }
    }
    buf
  }

  override def eval(buf: java.util.HashMap[Long, Long]): Any = {
    val entries = new Array[(Long, Long)](buf.size)
    var i = 0
    val it = buf.entrySet().iterator()
    while (it.hasNext) { val e = it.next(); entries(i) = (e.getKey, e.getValue); i += 1 }
    // deterministic OUTPUT order for a given summary: count desc, key asc
    val sorted = entries.sortBy { case (key, cnt) => (-cnt, key) }
    new GenericArrayData(sorted.map { case (key, cnt) =>
      InternalRow(key, cnt)
    }.asInstanceOf[Array[Any]])
  }

  override def serialize(buf: java.util.HashMap[Long, Long]): Array[Byte] = {
    val bb = ByteBuffer.allocate(4 + buf.size * 16)
    bb.putInt(buf.size)
    val it = buf.entrySet().iterator()
    while (it.hasNext) { val e = it.next(); bb.putLong(e.getKey); bb.putLong(e.getValue) }
    bb.array()
  }

  override def deserialize(bytes: Array[Byte]): java.util.HashMap[Long, Long] = {
    val bb = ByteBuffer.wrap(bytes)
    val n = bb.getInt
    val buf = createAggregationBuffer()
    var i = 0
    while (i < n) { buf.put(bb.getLong, bb.getLong); i += 1 }
    buf
  }

  override def dataType: DataType = ArrayType(
    org.apache.spark.sql.types.StructType(Seq(
      org.apache.spark.sql.types.StructField("key", LongType, nullable = false),
      org.apache.spark.sql.types.StructField("cnt", LongType, nullable = false))),
    containsNull = false)
  override def nullable: Boolean = false
  override def children: Seq[Expression] = Seq(child)
  override def withNewMutableAggBufferOffset(o: Int): MisraGriesAgg = copy(mutableAggBufferOffset = o)
  override def withNewInputAggBufferOffset(o: Int): MisraGriesAgg = copy(inputAggBufferOffset = o)
  override protected def withNewChildrenInternal(c: IndexedSeq[Expression]): Expression =
    copy(child = c.head)
}

/** Elementwise sum of long-array columns — the merge half of the CMS
  * lifecycle (counter matrices combine by addition, by linearity of
  * counting: `sum(cms(A), cms(B)) = cms(A ⊎ B)` over the multiset
  * union), and a general mergeable vector accumulator. Arrays must
  * agree in length; empty buffer adopts the first input's shape.
  */
case class ArraySumAgg(child: Expression,
                       mutableAggBufferOffset: Int = 0, inputAggBufferOffset: Int = 0)
    extends TypedImperativeAggregate[Array[Long]] {

  override def createAggregationBuffer(): Array[Long] = Array.empty

  private def add(a: Array[Long], b: Array[Long]): Array[Long] =
    if (a.isEmpty) b.clone()
    else {
      require(a.length == b.length,
        s"cannot sum arrays of different lengths: ${a.length} vs ${b.length}")
      var i = 0
      while (i < a.length) { a(i) += b(i); i += 1 }
      a
    }

  override def update(buf: Array[Long], input: InternalRow): Array[Long] = {
    val v = child.eval(input)
    if (v == null) buf
    else add(buf, v.asInstanceOf[org.apache.spark.sql.catalyst.util.ArrayData].toLongArray())
  }

  override def merge(buf: Array[Long], other: Array[Long]): Array[Long] =
    if (other.isEmpty) buf else add(buf, other)

  override def eval(buf: Array[Long]): Any = new GenericArrayData(buf)

  override def serialize(buf: Array[Long]): Array[Byte] = {
    val bb = ByteBuffer.allocate(buf.length * 8)
    bb.asLongBuffer().put(buf)
    bb.array()
  }

  override def deserialize(bytes: Array[Byte]): Array[Long] = {
    val out = new Array[Long](bytes.length / 8)
    ByteBuffer.wrap(bytes).asLongBuffer().get(out)
    out
  }

  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def nullable: Boolean = false
  override def children: Seq[Expression] = Seq(child)
  override def withNewMutableAggBufferOffset(o: Int): ArraySumAgg = copy(mutableAggBufferOffset = o)
  override def withNewInputAggBufferOffset(o: Int): ArraySumAgg = copy(inputAggBufferOffset = o)
  override protected def withNewChildrenInternal(c: IndexedSeq[Expression]): Expression =
    copy(child = c.head)
}

/** Bloom filter as a [[TypedImperativeAggregate]]: `mBits` bits, `k`
  * set positions per key from the same portable universal family as
  * [[CountMinSketchAgg]] (constant indexes `constIndexBase+i`), over
  * an already-hashed non-negative long < 2^30.
  *
  * The 100 TB use is semi-join reduction: aggregate the (filtered)
  * build side's keys into one `mBits/8`-byte bitset — partial
  * aggregation ORs per-partition bitsets map-side, so the shuffle
  * carries one bitset per partition, not the key stream — broadcast
  * the 1-row result, and prefilter the probe side with
  * [[graft.ext.Sketches.bloomContains]] BEFORE its shuffle. False
  * positives are culled by the exact join that follows; false
  * negatives are impossible, so the composition is exact (the gate
  * checks it against a plain semi-join oracle).
  */
case class BloomFilterAgg(child: Expression, mBits: Int, k: Int,
                          constIndexBase: Int = 180,
                          mutableAggBufferOffset: Int = 0, inputAggBufferOffset: Int = 0)
    extends TypedImperativeAggregate[Array[Long]] with ImplicitCastInputTypes {

  require(mBits >= 64 && mBits % 64 == 0, "mBits must be a positive multiple of 64")
  require(k >= 1 && k <= 16, "k must be in [1, 16]")

  override def inputTypes: Seq[DataType] = Seq(LongType)

  private val P = 1000000007L
  @transient private lazy val consts: Array[(Long, Long)] =
    Array.tabulate(k) { i =>
      val idx = constIndexBase + i
      (graft.ext.Sampling.minstd2(2 * idx + 1), graft.ext.Sampling.minstd2(2 * idx + 2))
    }

  override def createAggregationBuffer(): Array[Long] = new Array[Long](mBits / 64)

  override def update(buf: Array[Long], input: InternalRow): Array[Long] = {
    val v = child.eval(input)
    if (v != null) {
      val x = v.asInstanceOf[Long]
      // same [0, P) contract as cms_sketch: negatives index out of
      // bounds, keys ≥ P overflow the universal-hash arithmetic
      if (x < 0 || x >= P)
        throw new IllegalArgumentException(
          s"bloom_sketch expects a pre-hashed long key in [0, ${P}), got $x")
      var i = 0
      while (i < k) {
        val (a, b) = consts(i)
        val pos = (((a * x + b) % P) % mBits).toInt
        buf(pos >> 6) |= 1L << (pos & 63)
        i += 1
      }
    }
    buf
  }

  override def merge(buf: Array[Long], other: Array[Long]): Array[Long] = {
    var i = 0
    while (i < buf.length) { buf(i) |= other(i); i += 1 }
    buf
  }

  override def eval(buf: Array[Long]): Any = new GenericArrayData(buf.clone())

  override def serialize(buf: Array[Long]): Array[Byte] = {
    val bb = ByteBuffer.allocate(buf.length * 8)
    bb.asLongBuffer().put(buf)
    bb.array()
  }

  override def deserialize(bytes: Array[Byte]): Array[Long] = {
    val out = new Array[Long](bytes.length / 8)
    ByteBuffer.wrap(bytes).asLongBuffer().get(out)
    out
  }

  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def nullable: Boolean = false
  override def children: Seq[Expression] = Seq(child)
  override def withNewMutableAggBufferOffset(o: Int): BloomFilterAgg = copy(mutableAggBufferOffset = o)
  override def withNewInputAggBufferOffset(o: Int): BloomFilterAgg = copy(inputAggBufferOffset = o)
  override protected def withNewChildrenInternal(c: IndexedSeq[Expression]): Expression =
    copy(child = c.head)
}

/** K-minimum-values distinct sketch (Bar-Yossef et al. 2002): keep
  * the `k` SMALLEST distinct hash values seen; with hashes uniform on
  * `[0, P)`, the k-th smallest θ estimates density, so
  * `n̂ = (k−1)·P/θ` (below k distinct values the sketch IS the
  * distinct set and the count is exact). The HLL complement with a
  * different trade: ~1/√(k−2) relative error needs more state per
  * unit accuracy than HLL registers, but every intermediate is an
  * EXACT INTEGER — a plain-SQL oracle re-derives the k-th smallest
  * distinct hash and the estimate bit-for-bit, no register/rho
  * arithmetic — and the state doubles as a uniform distinct SAMPLE.
  * Mergeable: union the value sets, re-take the bottom k (bounded
  * state, map-side partial merge, same TypedImperativeAggregate
  * contract as [[HllSketch]]).
  *
  * Input contract: an ALREADY-HASHED non-negative long (the portable
  * universal family's `[0, 1e9+7)` domain — [[graft.ext.Sketches
  * .uhash]]); `emitValues = true` yields the ascending value array
  * (the materializable sketch state) instead of the estimate. */
case class KmvSketch(child: Expression, k: Int, domain: Long = 1000000007L,
                     emitValues: Boolean = false,
                     mutableAggBufferOffset: Int = 0, inputAggBufferOffset: Int = 0)
    extends TypedImperativeAggregate[java.util.TreeSet[java.lang.Long]]
    with ImplicitCastInputTypes {

  require(k >= 2, "k must be >= 2")
  require(domain > 1, "domain must be > 1")

  override def inputTypes: Seq[DataType] = Seq(LongType)

  override def createAggregationBuffer(): java.util.TreeSet[java.lang.Long] =
    new java.util.TreeSet[java.lang.Long]()

  private def insert(buf: java.util.TreeSet[java.lang.Long], v: Long): Unit = {
    if (v < 0 || v >= domain)
      throw new IllegalArgumentException(
        s"kmv_distinct expects a pre-hashed long in [0, $domain), got $v")
    if (buf.size < k) { buf.add(v); () }
    else if (v < buf.last) { if (buf.add(v)) { buf.pollLast(); () } }
  }

  override def update(buf: java.util.TreeSet[java.lang.Long],
                      input: InternalRow): java.util.TreeSet[java.lang.Long] = {
    val v = child.eval(input)
    if (v != null) insert(buf, v.asInstanceOf[Long])
    buf
  }

  override def merge(buf: java.util.TreeSet[java.lang.Long],
                     other: java.util.TreeSet[java.lang.Long]): java.util.TreeSet[java.lang.Long] = {
    val it = other.iterator()
    var go = true
    while (go && it.hasNext) {
      val v = it.next().longValue()
      // other is ascending: once v can no longer displace, stop
      if (buf.size == k && v >= buf.last) go = false else insert(buf, v)
    }
    buf
  }

  override def eval(buf: java.util.TreeSet[java.lang.Long]): Any =
    if (emitValues) {
      val arr = new Array[Long](buf.size)
      val it = buf.iterator()
      var i = 0
      while (it.hasNext) { arr(i) = it.next().longValue(); i += 1 }
      new GenericArrayData(arr)
    } else KmvSketch.estimate(buf, k, domain)

  override def serialize(buf: java.util.TreeSet[java.lang.Long]): Array[Byte] = {
    val bb = ByteBuffer.allocate(4 + 8 * buf.size)
    bb.putInt(buf.size)
    val it = buf.iterator()
    while (it.hasNext) bb.putLong(it.next().longValue())
    bb.array()
  }

  override def deserialize(bytes: Array[Byte]): java.util.TreeSet[java.lang.Long] = {
    val bb = ByteBuffer.wrap(bytes)
    val n = bb.getInt
    val set = new java.util.TreeSet[java.lang.Long]()
    var i = 0
    while (i < n) { set.add(bb.getLong); i += 1 }
    set
  }

  override def dataType: DataType =
    if (emitValues) ArrayType(LongType, containsNull = false) else DoubleType
  override def nullable: Boolean = false
  override def children: Seq[Expression] = Seq(child)
  override def withNewMutableAggBufferOffset(o: Int): KmvSketch = copy(mutableAggBufferOffset = o)
  override def withNewInputAggBufferOffset(o: Int): KmvSketch = copy(inputAggBufferOffset = o)
  override protected def withNewChildrenInternal(c: IndexedSeq[Expression]): Expression =
    copy(child = c.head)
}

object KmvSketch {
  /** `(k−1)·P/θ` when the sketch is full, the exact size below k. */
  def estimate(buf: java.util.TreeSet[java.lang.Long], k: Int, domain: Long): Double =
    if (buf.size < k) buf.size.toDouble
    else (k - 1).toDouble * domain.toDouble / buf.last.toDouble
}

object SketchAggregates {
  import GraftColumnBridge._

  /** HLL over an already-hashed long column in `[0, 2^hashBits)`. */
  def hllSketch(hashCol: Column, p: Int, hashBits: Int, correct: Boolean = true): Column =
    column(HllSketch(expression(hashCol), p, hashBits, correct).toAggregateExpression())

  /** HLL register-array aggregate (materializable sketch state). */
  def hllRegisters(hashCol: Column, p: Int, hashBits: Int): Column =
    column(HllSketch(expression(hashCol), p, hashBits,
      emitRegisters = true).toAggregateExpression())

  /** Merge aggregate over materialized register arrays. */
  def hllMerge(regsCol: Column): Column =
    column(HllMergeAgg(expression(regsCol)).toAggregateExpression())

  /** KMV distinct estimate over an already-hashed long column. */
  def kmvSketch(hashCol: Column, k: Int, domain: Long = 1000000007L): Column =
    column(KmvSketch(expression(hashCol), k, domain).toAggregateExpression())

  /** KMV bottom-k value array (materializable sketch state). */
  def kmvValues(hashCol: Column, k: Int, domain: Long = 1000000007L): Column =
    column(KmvSketch(expression(hashCol), k, domain,
      emitValues = true).toAggregateExpression())

  /** Elementwise-sum aggregate over long arrays — the CMS combine
    * rule (counters add; HLL registers max, Bloom bitsets OR). */
  def arraySum(arrCol: Column): Column =
    column(ArraySumAgg(expression(arrCol)).toAggregateExpression())

  /** CMS counter matrix over an already-hashed long column. */
  def cmsSketch(hashCol: Column, d: Int, w: Int, constIndexBase: Int = 150): Column =
    column(CountMinSketchAgg(expression(hashCol), d, w, constIndexBase).toAggregateExpression())

  /** Bloom bitset (array of mBits/64 longs) over an already-hashed
    * long column. */
  def bloomSketch(hashCol: Column, mBits: Int, k: Int, constIndexBase: Int = 180): Column =
    column(BloomFilterAgg(expression(hashCol), mBits, k, constIndexBase).toAggregateExpression())

  /** Make the sketch aggregates available to `spark.sql` as
    * `hll_distinct(hash, p, hashBits)`, `cms_sketch(hash, d, w)` and
    * `bloom_sketch(hash, mBits, k)` — the analyzer wraps a registered
    * AggregateFunction in its AggregateExpression, so these compose
    * with SQL GROUP BY like any built-in aggregate. Size parameters
    * must be foldable literals (plan-time sketch shapes). */
  def register(spark: org.apache.spark.sql.SparkSession): Unit = {
    GraftColumnBridge.registerFunction(spark, "hll_distinct",
      exprs => HllSketch(exprs(0),
        FunctionArgs.foldableInt("hll_distinct", "p", exprs(1)),
        FunctionArgs.foldableInt("hll_distinct", "hashBits", exprs(2))))
    GraftColumnBridge.registerFunction(spark, "cms_sketch",
      exprs => CountMinSketchAgg(exprs(0),
        FunctionArgs.foldableInt("cms_sketch", "d", exprs(1)),
        FunctionArgs.foldableInt("cms_sketch", "w", exprs(2))))
    GraftColumnBridge.registerFunction(spark, "bloom_sketch",
      exprs => BloomFilterAgg(exprs(0),
        FunctionArgs.foldableInt("bloom_sketch", "mBits", exprs(1)),
        FunctionArgs.foldableInt("bloom_sketch", "k", exprs(2))))
  }
}
