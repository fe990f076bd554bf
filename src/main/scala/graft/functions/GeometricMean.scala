package graft.functions

import org.apache.spark.sql.{Column, Encoder, Encoders}
import org.apache.spark.sql.expressions.Aggregator
import org.apache.spark.sql.functions.udaf

/** Typed UDAF example — the `Aggregator[IN, BUF, OUT]` tier of the
  * extension ladder (below native `DeclarativeAggregate`, above RDD
  * code). Numerically stable geometric mean via log-sum; buffer is
  * (Σ ln x, n), fully mergeable so partial aggregation works and the
  * shuffle carries 16 bytes per group.
  *
  * Note: for anything expressible as built-ins prefer the expression
  * form `exp(avg(ln(x)))` (codegen'd, see the q_geomean oracle);
  * this class exists to exercise and document the UDAF path.
  */
object GeometricMean extends Aggregator[Double, (Double, Long), Double] {
  override def zero: (Double, Long) = (0.0, 0L)
  override def reduce(b: (Double, Long), x: Double): (Double, Long) =
    if (x > 0) (b._1 + math.log(x), b._2 + 1) else b  // ignore non-positive, like avg ignores NULL
  override def merge(a: (Double, Long), b: (Double, Long)): (Double, Long) =
    (a._1 + b._1, a._2 + b._2)
  override def finish(r: (Double, Long)): Double =
    if (r._2 == 0) Double.NaN else math.exp(r._1 / r._2)
  override def bufferEncoder: Encoder[(Double, Long)] =
    Encoders.tuple(Encoders.scalaDouble, Encoders.scalaLong)
  override def outputEncoder: Encoder[Double] = Encoders.scalaDouble

  /** Untyped Column form for DataFrame `.agg`. */
  def asColumn(c: Column): Column = udaf(GeometricMean).apply(c)
}
