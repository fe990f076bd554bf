package graft.functions

import org.apache.spark.sql.{Column, GraftColumnBridge}
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression, UnaryExpression, XXH64}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types.{DataType, DoubleType, LongType}

/** Native cosine similarity over two `array<float>` columns.
  *
  * The composable form (`zip_with` + `aggregate`, see
  * [[graft.ext.Similarity.cosine]]) is evaluated by interpreted
  * higher-order lambdas — one closure dispatch per element. This
  * expression is a single fused loop with full Janino codegen
  * (`doGenCode`), accumulating dot product and both norms in one
  * pass; on the brute-force ANN scan it removes the per-element
  * overhead entirely. Null if either array is null or lengths differ.
  *
  * Semantics match Similarity.cosine exactly: elementwise products in
  * index order, double accumulation — so oracle comparisons agree.
  */
case class CosineSimilarity(left: Expression, right: Expression)
    extends BinaryExpression {

  override def dataType: DataType = DoubleType
  override def nullable: Boolean = true

  override def nullSafeEval(a: Any, b: Any): Any = {
    val x = a.asInstanceOf[ArrayData]
    val y = b.asInstanceOf[ArrayData]
    if (x.numElements() != y.numElements()) null
    else {
      var dot = 0.0; var nx = 0.0; var ny = 0.0
      var i = 0
      val n = x.numElements()
      while (i < n) {
        val xi = x.getFloat(i).toDouble
        val yi = y.getFloat(i).toDouble
        dot += xi * yi; nx += xi * xi; ny += yi * yi
        i += 1
      }
      if (nx == 0.0 || ny == 0.0) null
      else dot / (math.sqrt(nx) * math.sqrt(ny))
    }
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    nullSafeCodeGen(ctx, ev, (x, y) => {
      val i = ctx.freshName("i")
      val n = ctx.freshName("n")
      val dot = ctx.freshName("dot")
      val nx = ctx.freshName("nx")
      val ny = ctx.freshName("ny")
      val xi = ctx.freshName("xi")
      val yi = ctx.freshName("yi")
      s"""
         |int $n = $x.numElements();
         |if ($n != $y.numElements()) {
         |  ${ev.isNull} = true;
         |} else {
         |  double $dot = 0.0; double $nx = 0.0; double $ny = 0.0;
         |  for (int $i = 0; $i < $n; $i++) {
         |    double $xi = (double) $x.getFloat($i);
         |    double $yi = (double) $y.getFloat($i);
         |    $dot += $xi * $yi; $nx += $xi * $xi; $ny += $yi * $yi;
         |  }
         |  if ($nx == 0.0 || $ny == 0.0) {
         |    ${ev.isNull} = true;
         |  } else {
         |    ${ev.value} = $dot / (java.lang.Math.sqrt($nx) * java.lang.Math.sqrt($ny));
         |  }
         |}
       """.stripMargin
    })
  }

  override protected def withNewChildrenInternal(l: Expression, r: Expression): Expression =
    copy(left = l, right = r)
}

/** `bits`-bit random-hyperplane LSH bucket of an `array<float>`
  * vector, in one fused loop — the native form of
  * [[graft.ext.Similarity.lshBucket]]'s nested-HOF fold. Semantics
  * are identical: bit j is set iff the projection
  * `Σ_k vec(k) · sign(j,k)` (index-order double accumulation) is
  * positive, where `sign(j,k) = (xxhash64(j,k) & 1) · 2 − 1` chains
  * Spark's XxHash64 over the two int arguments from its fixed seed
  * 42 — deterministic across runs, engines and implementations, no
  * stored model. The HOF form re-enters an interpreted lambda per
  * (plane, dim) pair; here the whole signature is one tight loop of
  * two `XXH64.hashInt` calls and a multiply-add per pair. A null
  * vector yields null; a null element makes every projection null,
  * which the fold maps to bucket 0 — reproduced exactly.
  *
  * `planeOffset` shifts the plane index (plane j of this bucket is
  * global plane `planeOffset + j`), so L independent hash tables are
  * just L instances with offsets 0, bits, 2·bits, … — the standard
  * multi-table LSH construction for recall amplification.
  *
  * `portable = true` swaps XXH64 for a twice-iterated MINSTD parity
  * (`x₁ = 16807·(idx+1) mod 2³¹−1; x₂ = 16807·x₁ mod 2³¹−1;
  * sign = ±1 by x₂ parity`, where `idx = planeIdx·dim + k`) — exact
  * integer arithmetic any engine reproduces in plain SQL, which is
  * what lets the scale-path LSH pair query be value-checked against
  * a DuckDB oracle (xxhash64 has no DuckDB twin). One MINSTD step is
  * NOT enough: 16807·(idx+1) stays below the modulus for all
  * realistic idx, so its parity is just idx's parity and every
  * hyperplane would alternate signs identically; the second
  * multiplication wraps and mixes. */
case class HyperplaneLshBucket(child: Expression, bits: Int,
                               planeOffset: Int = 0, portable: Boolean = false)
    extends UnaryExpression {

  override def dataType: DataType = LongType
  override def nullable: Boolean = true

  override def nullSafeEval(input: Any): Any = {
    val vec = input.asInstanceOf[ArrayData]
    val dim = vec.numElements()
    var k = 0
    while (k < dim) {
      if (vec.isNullAt(k)) return 0L
      k += 1
    }
    var acc = 0L
    var j = 0
    while (j < bits) {
      var proj = 0.0
      var i = 0
      if (portable) {
        val base = (planeOffset + j).toLong * dim
        while (i < dim) {
          val x1 = (16807L * (base + i + 1)) % 2147483647L
          val x2 = (16807L * x1) % 2147483647L
          val sign = if ((x2 & 1L) == 1L) 1.0 else -1.0
          proj += vec.getFloat(i).toDouble * sign
          i += 1
        }
      } else {
        val planeSeed = XXH64.hashInt(planeOffset + j, 42L) // per-plane, not per-dimension
        while (i < dim) {
          val h = XXH64.hashInt(i, planeSeed)
          val sign = (h & 1L) * 2L - 1L
          proj += vec.getFloat(i).toDouble * sign.toDouble
          i += 1
        }
      }
      if (proj > 0) acc += 1L << j
      j += 1
    }
    acc
  }

  /** Full codegen (this expression scans the WHOLE corpus in every
    * LSH query — CodegenFallback's per-row boxing/dispatch is exactly
    * the overhead worth removing on the hot path): the same two
    * loops as [[nullSafeEval]], emitted as straight-line Java with
    * `bits`/`planeOffset`/`portable` baked in as constants. */
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    nullSafeCodeGen(ctx, ev, vec => {
      val dim = ctx.freshName("dim")
      val hasNull = ctx.freshName("hasNull")
      val acc = ctx.freshName("acc")
      val i = ctx.freshName("i")
      val j = ctx.freshName("j")
      val proj = ctx.freshName("proj")
      val inner =
        if (portable) {
          val base = ctx.freshName("base")
          val x1 = ctx.freshName("x1")
          val x2 = ctx.freshName("x2")
          s"""
             |long $base = ((long) ($planeOffset + $j)) * $dim;
             |for (int $i = 0; $i < $dim; $i++) {
             |  long $x1 = (16807L * ($base + $i + 1)) % 2147483647L;
             |  long $x2 = (16807L * $x1) % 2147483647L;
             |  $proj += ((double) $vec.getFloat($i)) * ((($x2 & 1L) == 1L) ? 1.0 : -1.0);
             |}
           """.stripMargin
        } else {
          val seed = ctx.freshName("planeSeed")
          val h = ctx.freshName("h")
          val xxh = "org.apache.spark.sql.catalyst.expressions.XXH64"
          s"""
             |long $seed = $xxh.hashInt($planeOffset + $j, 42L);
             |for (int $i = 0; $i < $dim; $i++) {
             |  long $h = $xxh.hashInt($i, $seed);
             |  $proj += ((double) $vec.getFloat($i)) * (double) (($h & 1L) * 2L - 1L);
             |}
           """.stripMargin
        }
      s"""
         |int $dim = $vec.numElements();
         |boolean $hasNull = false;
         |for (int $i = 0; $i < $dim; $i++) {
         |  if ($vec.isNullAt($i)) { $hasNull = true; break; }
         |}
         |long $acc = 0L;
         |if (!$hasNull) {
         |  for (int $j = 0; $j < $bits; $j++) {
         |    double $proj = 0.0;
         |    $inner
         |    if ($proj > 0) $acc += 1L << $j;
         |  }
         |}
         |${ev.value} = $acc;
       """.stripMargin
    })
  }

  override protected def withNewChildInternal(c: Expression): Expression = copy(child = c)
}

/** Per-row nearest centroid by cosine: argmax over an
  * `array<struct<cid: bigint, c_emb: array<float>>>` centroid set,
  * returning the winning `cid` (ties broken toward the LARGER cid —
  * exactly `max(struct(cos, cid))` / `row_number() OVER (ORDER BY sim
  * DESC, cid DESC) = 1` semantics, so the IVF oracle's unrolled
  * assignment reproduces it bit-for-bit).
  *
  * This is the shuffle-free form of IVF cluster assignment: the
  * centroid set rides in as a single broadcast row (a
  * `collect_list(struct(...))` over ≤nCentroids rows), so assigning
  * the whole corpus is a per-row fused loop — no crossJoin row
  * explosion, no `groupBy(id)` argmax re-shuffling the corpus once
  * per Lloyd iteration. Cosine semantics match [[CosineSimilarity]]
  * exactly (index-order double accumulation; a centroid with
  * mismatched length or zero norm — or a zero-norm input vector — is
  * skipped). Null if either input is null or no centroid qualifies.
  */
case class NearestCentroid(left: Expression, right: Expression)
    extends BinaryExpression {

  override def dataType: DataType = LongType
  override def nullable: Boolean = true

  override def nullSafeEval(a: Any, b: Any): Any = {
    val vec = a.asInstanceOf[ArrayData]
    val cents = b.asInstanceOf[ArrayData]
    val n = vec.numElements()
    var nx = 0.0
    var i = 0
    while (i < n) { val xi = vec.getFloat(i).toDouble; nx += xi * xi; i += 1 }
    var bestSim = 0.0
    var bestCid = 0L
    var found = false
    var c = 0
    val m = cents.numElements()
    while (c < m) {
      if (!cents.isNullAt(c)) {
        val st = cents.getStruct(c, 2)
        if (!st.isNullAt(0) && !st.isNullAt(1)) {
          val cid = st.getLong(0)
          val ce = st.getArray(1)
          if (ce.numElements() == n && nx != 0.0) {
            var dot = 0.0
            var ny = 0.0
            var k = 0
            while (k < n) {
              val xk = vec.getFloat(k).toDouble
              val yk = ce.getFloat(k).toDouble
              dot += xk * yk; ny += yk * yk
              k += 1
            }
            if (ny != 0.0) {
              val sim = dot / (math.sqrt(nx) * math.sqrt(ny))
              if (!found || sim > bestSim || (sim == bestSim && cid > bestCid)) {
                found = true; bestSim = sim; bestCid = cid
              }
            }
          }
        }
      }
      c += 1
    }
    if (found) bestCid else null
  }

  /** Full codegen — this expression replaces a corpus-wide shuffle,
    * so it IS the hot path of every IVF build/assignment scan. */
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    nullSafeCodeGen(ctx, ev, (vec, cents) => {
      val n = ctx.freshName("n")
      val m = ctx.freshName("m")
      val nx = ctx.freshName("nx")
      val xi = ctx.freshName("xi")
      val i = ctx.freshName("i")
      val c = ctx.freshName("c")
      val k = ctx.freshName("k")
      val st = ctx.freshName("st")
      val cid = ctx.freshName("cid")
      val ce = ctx.freshName("ce")
      val dot = ctx.freshName("dot")
      val ny = ctx.freshName("ny")
      val xk = ctx.freshName("xk")
      val yk = ctx.freshName("yk")
      val sim = ctx.freshName("sim")
      val bestSim = ctx.freshName("bestSim")
      val bestCid = ctx.freshName("bestCid")
      val found = ctx.freshName("found")
      val rowCls = "org.apache.spark.sql.catalyst.InternalRow"
      val arrCls = "org.apache.spark.sql.catalyst.util.ArrayData"
      s"""
         |int $n = $vec.numElements();
         |double $nx = 0.0;
         |for (int $i = 0; $i < $n; $i++) {
         |  double $xi = (double) $vec.getFloat($i);
         |  $nx += $xi * $xi;
         |}
         |double $bestSim = 0.0;
         |long $bestCid = 0L;
         |boolean $found = false;
         |int $m = $cents.numElements();
         |for (int $c = 0; $c < $m; $c++) {
         |  if ($cents.isNullAt($c)) continue;
         |  $rowCls $st = $cents.getStruct($c, 2);
         |  if ($st.isNullAt(0) || $st.isNullAt(1)) continue;
         |  long $cid = $st.getLong(0);
         |  $arrCls $ce = $st.getArray(1);
         |  if ($ce.numElements() != $n || $nx == 0.0) continue;
         |  double $dot = 0.0;
         |  double $ny = 0.0;
         |  for (int $k = 0; $k < $n; $k++) {
         |    double $xk = (double) $vec.getFloat($k);
         |    double $yk = (double) $ce.getFloat($k);
         |    $dot += $xk * $yk; $ny += $yk * $yk;
         |  }
         |  if ($ny == 0.0) continue;
         |  double $sim = $dot / (java.lang.Math.sqrt($nx) * java.lang.Math.sqrt($ny));
         |  if (!$found || $sim > $bestSim || ($sim == $bestSim && $cid > $bestCid)) {
         |    $found = true; $bestSim = $sim; $bestCid = $cid;
         |  }
         |}
         |if ($found) { ${ev.value} = $bestCid; } else { ${ev.isNull} = true; }
       """.stripMargin
    })
  }

  override protected def withNewChildrenInternal(l: Expression, r: Expression): Expression =
    copy(left = l, right = r)
}

/** Nearest centroid by SQUARED L2 distance — the product-quantization
  * assignment kernel ([[graft.ext.Similarity]] PQ operators). Same
  * shape as [[NearestCentroid]] (broadcast
  * `array<struct<cid, c_emb>>`, per-row fused argmin, full codegen)
  * but metric `Σ_k (x_k − y_k)²` in index order and ties to the
  * SMALLER cid — `min(struct(dist, cid))` semantics, so an oracle's
  * `ORDER BY dist ASC, cid ASC` twin reproduces it. Null when the
  * vector is null or no centroid matches the vector's length. */
case class NearestCentroidL2(left: Expression, right: Expression)
    extends BinaryExpression {

  override def dataType: DataType = LongType
  override def nullable: Boolean = true

  override def nullSafeEval(a: Any, b: Any): Any = {
    val vec = a.asInstanceOf[ArrayData]
    val cents = b.asInstanceOf[ArrayData]
    val n = vec.numElements()
    var bestD = 0.0
    var bestCid = 0L
    var found = false
    var c = 0
    val m = cents.numElements()
    while (c < m) {
      if (!cents.isNullAt(c)) {
        val st = cents.getStruct(c, 2)
        if (!st.isNullAt(0) && !st.isNullAt(1)) {
          val cid = st.getLong(0)
          val ce = st.getArray(1)
          if (ce.numElements() == n) {
            var d = 0.0
            var k = 0
            while (k < n) {
              val diff = vec.getFloat(k).toDouble - ce.getFloat(k).toDouble
              d += diff * diff
              k += 1
            }
            if (!found || d < bestD || (d == bestD && cid < bestCid)) {
              found = true; bestD = d; bestCid = cid
            }
          }
        }
      }
      c += 1
    }
    if (found) bestCid else null
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    nullSafeCodeGen(ctx, ev, (vec, cents) => {
      val n = ctx.freshName("n")
      val m = ctx.freshName("m")
      val c = ctx.freshName("c")
      val k = ctx.freshName("k")
      val st = ctx.freshName("st")
      val cid = ctx.freshName("cid")
      val ce = ctx.freshName("ce")
      val d = ctx.freshName("d")
      val diff = ctx.freshName("diff")
      val bestD = ctx.freshName("bestD")
      val bestCid = ctx.freshName("bestCid")
      val found = ctx.freshName("found")
      val rowCls = "org.apache.spark.sql.catalyst.InternalRow"
      val arrCls = "org.apache.spark.sql.catalyst.util.ArrayData"
      s"""
         |int $n = $vec.numElements();
         |double $bestD = 0.0;
         |long $bestCid = 0L;
         |boolean $found = false;
         |int $m = $cents.numElements();
         |for (int $c = 0; $c < $m; $c++) {
         |  if ($cents.isNullAt($c)) continue;
         |  $rowCls $st = $cents.getStruct($c, 2);
         |  if ($st.isNullAt(0) || $st.isNullAt(1)) continue;
         |  long $cid = $st.getLong(0);
         |  $arrCls $ce = $st.getArray(1);
         |  if ($ce.numElements() != $n) continue;
         |  double $d = 0.0;
         |  for (int $k = 0; $k < $n; $k++) {
         |    double $diff = (double) $vec.getFloat($k) - (double) $ce.getFloat($k);
         |    $d += $diff * $diff;
         |  }
         |  if (!$found || $d < $bestD || ($d == $bestD && $cid < $bestCid)) {
         |    $found = true; $bestD = $d; $bestCid = $cid;
         |  }
         |}
         |if ($found) { ${ev.value} = $bestCid; } else { ${ev.isNull} = true; }
       """.stripMargin
    })
  }

  override protected def withNewChildrenInternal(l: Expression, r: Expression): Expression =
    copy(left = l, right = r)
}

/** Johnson–Lindenstrauss random projection of an `array<float>`
  * vector onto `outDim` ±1 hyperplanes — the dimensionality-reduction
  * pass that shrinks embeddings before ANN indexing or pairwise work
  * (a dense sign matrix preserves pairwise distances within
  * 1±ε for outDim = O(log n / ε²), Achlioptas 2003).
  *
  * Determinism contract (what lets a SQL oracle value-check it):
  * the input is quantized ONCE to the 2^-20 integer grid
  * (`floor(x·2^20 + 0.5)` — the [[graft.ext.Similarity.dimStats]]
  * idiom) and each output component is an exact INTEGER sum of
  * ±grid values, so accumulation order cannot perturb the result.
  * Signs are the parity of a QUADRATIC residue:
  * `((m·m mod p)·40503 + m·69069 + 1234567) mod p` with
  * `p = 1000003`, `m = j·dim + i` — plain integer SQL any engine
  * reproduces. A LINEAR generator parity (the portable-LSH MINSTD
  * chain) is NOT usable here: along the stride-`dim` index
  * progressions that successive planes read, its parity is itself
  * near-linear, and measured plane rows came out almost identical
  * (|row·row| up to 62 of 64 — one projection repeated 16 times,
  * no distance preservation). The quadratic term breaks the
  * progression (measured max |row·row| 18, mean ≈ 5 ≈ the √dim of
  * true random signs); the inner mod-before-multiply keeps every
  * intermediate below 2^36 for any realistic dim. Output:
  * `array<long>` of the outDim fixed-point sums (divide by 2^20
  * for the real-valued projection). Null vector → null; a vector
  * with a null element → null (the projection is undefined).
  *
  * Fused single codegen loop per row: outDim·dim multiply-adds, no
  * shuffle, no interpreted lambda dispatch — the per-row cost a
  * nested-HOF formulation pays ~50× more for.
  */
case class JlProject(child: Expression, outDim: Int)
    extends UnaryExpression {

  override def dataType: DataType =
    org.apache.spark.sql.types.ArrayType(LongType, containsNull = false)
  override def nullable: Boolean = true

  override def nullSafeEval(input: Any): Any = {
    val vec = input.asInstanceOf[ArrayData]
    val dim = vec.numElements()
    var i = 0
    while (i < dim) {
      if (vec.isNullAt(i)) return null
      i += 1
    }
    val q = new Array[Long](dim)
    i = 0
    while (i < dim) {
      q(i) = math.floor(vec.getFloat(i).toDouble * 1048576.0 + 0.5).toLong
      i += 1
    }
    val out = new Array[Long](outDim)
    var j = 0
    while (j < outDim) {
      var acc = 0L
      var k = 0
      val base = j.toLong * dim
      while (k < dim) {
        val m = base + k
        val v = ((m * m % 1000003L) * 40503L + m * 69069L + 1234567L) % 1000003L
        acc += (if ((v & 1L) == 1L) q(k) else -q(k))
        k += 1
      }
      out(j) = acc
      j += 1
    }
    new org.apache.spark.sql.catalyst.util.GenericArrayData(out)
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    nullSafeCodeGen(ctx, ev, vec => {
      val dim = ctx.freshName("dim")
      val hasNull = ctx.freshName("hasNull")
      val q = ctx.freshName("q")
      val out = ctx.freshName("out")
      val i = ctx.freshName("i")
      val j = ctx.freshName("j")
      val k = ctx.freshName("k")
      val acc = ctx.freshName("acc")
      val base = ctx.freshName("base")
      val m = ctx.freshName("m")
      val v = ctx.freshName("v")
      val gad = "org.apache.spark.sql.catalyst.util.GenericArrayData"
      s"""
         |int $dim = $vec.numElements();
         |boolean $hasNull = false;
         |for (int $i = 0; $i < $dim; $i++) {
         |  if ($vec.isNullAt($i)) { $hasNull = true; break; }
         |}
         |if ($hasNull) {
         |  ${ev.isNull} = true;
         |} else {
         |  long[] $q = new long[$dim];
         |  for (int $i = 0; $i < $dim; $i++) {
         |    $q[$i] = (long) java.lang.Math.floor(((double) $vec.getFloat($i)) * 1048576.0 + 0.5);
         |  }
         |  long[] $out = new long[$outDim];
         |  for (int $j = 0; $j < $outDim; $j++) {
         |    long $acc = 0L;
         |    long $base = ((long) $j) * $dim;
         |    for (int $k = 0; $k < $dim; $k++) {
         |      long $m = $base + $k;
         |      long $v = (($m * $m % 1000003L) * 40503L + $m * 69069L + 1234567L) % 1000003L;
         |      $acc += ((($v & 1L) == 1L) ? $q[$k] : -$q[$k]);
         |    }
         |    $out[$j] = $acc;
         |  }
         |  ${ev.value} = new $gad($out);
         |}
       """.stripMargin
    })
  }

  override protected def withNewChildInternal(c: Expression): Expression = copy(child = c)
}

object VectorExpressions {
  import GraftColumnBridge.{column, expression}
  /** Column API for [[CosineSimilarity]] (inputs: two array<float>). */
  def cosineNative(a: Column, b: Column): Column =
    column(CosineSimilarity(expression(a), expression(b)))

  /** Column API for [[HyperplaneLshBucket]] (input: array<float>). */
  def lshBucketNative(vec: Column, bits: Int, planeOffset: Int = 0,
                      portable: Boolean = false): Column =
    column(HyperplaneLshBucket(expression(vec), bits, planeOffset, portable))

  /** Column API for [[JlProject]] (input: array<float>; output:
    * array<long> fixed-point sums on the 2^-20 grid). */
  def jlProjectNative(vec: Column, outDim: Int): Column =
    column(JlProject(expression(vec), outDim))

  /** Column API for [[NearestCentroid]] (inputs: array<float>,
    * array<struct<cid: bigint, c_emb: array<float>>>). */
  def nearestCentroidNative(vec: Column, cents: Column): Column =
    column(NearestCentroid(expression(vec), expression(cents)))

  /** Column API for [[NearestCentroidL2]] (same input shapes). */
  def nearestCentroidL2Native(vec: Column, cents: Column): Column =
    column(NearestCentroidL2(expression(vec), expression(cents)))

  /** Make the expressions available to `spark.sql` as
    * `cosine_native(a, b)`, `lsh_bucket(vec, bits)` and
    * `nearest_centroid(vec, cents)`. */
  def register(spark: org.apache.spark.sql.SparkSession): Unit = {
    GraftColumnBridge.registerFunction(spark, "cosine_native",
      exprs => CosineSimilarity(exprs(0), exprs(1)))
    GraftColumnBridge.registerFunction(spark, "lsh_bucket",
      exprs => HyperplaneLshBucket(exprs(0),
        FunctionArgs.foldableInt("lsh_bucket", "bits", exprs(1))))
    GraftColumnBridge.registerFunction(spark, "jl_project",
      exprs => JlProject(exprs(0),
        FunctionArgs.foldableInt("jl_project", "out_dim", exprs(1))))
    GraftColumnBridge.registerFunction(spark, "nearest_centroid",
      exprs => NearestCentroid(exprs(0), exprs(1)))
    GraftColumnBridge.registerFunction(spark, "nearest_centroid_l2",
      exprs => NearestCentroidL2(exprs(0), exprs(1)))
  }
}
