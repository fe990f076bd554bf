package graft.functions

import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression, ImplicitCastInputTypes}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types.{DataType, LongType}

/** Hilbert-curve index of two 16-bit keys (order-16 curve, output in
  * `[0, 2^32)`).
  *
  * The Morton/Z-order interleave ([[graft.ext.Layout.zorder2]]) is
  * pure bit arithmetic but its curve JUMPS: at every power-of-two
  * boundary the next z-value teleports across the square, so a file
  * holding a z-range around such a seam covers two distant rectangles
  * and its min/max box inflates. The Hilbert curve visits every cell
  * of the grid moving ONE unit step at a time — no discontinuities —
  * which tightens the worst-case per-file bounding box and is why
  * Databricks added Hilbert clustering alongside Z-order (liquid
  * clustering) and why spatial indexes (S2, Uber H3) prefer it.
  *
  * The classic xy2d walk (Wikipedia "Hilbert curve", converting
  * coordinates to the curve distance: quadrant accumulate + rotate,
  * one iteration per bit) is inherently a LOOP carrying rotation
  * state, which built-in `Column` arithmetic cannot express without
  * exponential expression blow-up (each rotation references the
  * previous x/y twice). So this is a native codegen'd Catalyst
  * expression — the preference-(b) escape hatch — emitting the
  * 16-iteration loop as straight-line Java inside whole-stage
  * codegen, with an identical interpreted mirror in [[HilbertIndex2
  * .xy2d]] (LayoutSpec pins codegen ≡ interpreted ≡ an independent
  * d2xy inverse). Inputs are masked to their low 16 bits, like
  * [[graft.ext.Layout.zorder2]]'s spread — normalize first. */
case class HilbertIndex2(left: Expression, right: Expression)
    extends BinaryExpression with ImplicitCastInputTypes {

  override def inputTypes: Seq[DataType] = Seq(LongType, LongType)
  override def dataType: DataType = LongType

  override def nullSafeEval(a: Any, b: Any): Any =
    HilbertIndex2.xy2d(a.asInstanceOf[Long], b.asInstanceOf[Long])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (x, y) => {
      val hx = ctx.freshName("hx")
      val hy = ctx.freshName("hy")
      val d = ctx.freshName("d")
      val s = ctx.freshName("s")
      val rx = ctx.freshName("rx")
      val ry = ctx.freshName("ry")
      val t = ctx.freshName("t")
      s"""
         |long $hx = ($x) & 0xFFFFL;
         |long $hy = ($y) & 0xFFFFL;
         |long $d = 0L;
         |for (long $s = 32768L; $s > 0L; $s >>= 1) {
         |  long $rx = (($hx & $s) > 0L) ? 1L : 0L;
         |  long $ry = (($hy & $s) > 0L) ? 1L : 0L;
         |  $d += $s * $s * ((3L * $rx) ^ $ry);
         |  if ($ry == 0L) {
         |    if ($rx == 1L) { $hx = $s - 1L - $hx; $hy = $s - 1L - $hy; }
         |    long $t = $hx; $hx = $hy; $hy = $t;
         |  }
         |}
         |${ev.value} = $d;
       """.stripMargin
    })

  override protected def withNewChildrenInternal(l: Expression, r: Expression): Expression =
    copy(left = l, right = r)
}

object HilbertIndex2 {
  /** Interpreted mirror of the generated loop — same masking, same
    * quadrant/rotation walk, bit-for-bit. */
  def xy2d(x0: Long, y0: Long): Long = {
    var x = x0 & 0xFFFFL
    var y = y0 & 0xFFFFL
    var d = 0L
    var s = 32768L
    while (s > 0L) {
      val rx = if ((x & s) > 0L) 1L else 0L
      val ry = if ((y & s) > 0L) 1L else 0L
      d += s * s * ((3L * rx) ^ ry)
      if (ry == 0L) {
        if (rx == 1L) { x = s - 1L - x; y = s - 1L - y }
        val t = x; x = y; y = t
      }
      s >>= 1
    }
    d
  }
}
