package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.StructType

/** Backward as-of join: for each left row, the latest right row with
  * `rightTime <= leftTime` within the same key (NULLs when none) —
  * the standard time-series point-in-time join, which Spark's
  * DataFrame API lacks as a primitive.
  *
  * Composed from built-ins (preference (a) over a custom SparkPlan):
  * tag both sides, union, and carry the last non-null right payload
  * forward over a (key, time)-ordered window. Cost: ONE shuffle of
  * |L|+|R| rows on the key — the same exchange a custom physical
  * operator would need — versus a naive range-join's |L|·|R| blowup.
  * Right rows sort before left rows at equal timestamps, making the
  * match inclusive (`>=`), like DuckDB/kdb ASOF semantics.
  *
  * At equal right timestamps within a key the carried row is the
  * union-order last; pre-aggregate the right side to unique
  * (key, time) when that ambiguity matters.
  */
object AsofJoin {

  /** @param valueCols right-side columns to attach, each emitted as
    *                  `asof_<name>`; `asof_<rightTime>` is always
    *                  attached (the matched row's timestamp).
    * @param within    optional staleness bound — a predicate over
    *                  (left row's time, matched right time); a match
    *                  that fails it is nulled out, exactly as if no
    *                  right row existed. This is the feature-SLA
    *                  variant ("use the latest click, but only if it
    *                  is under an hour old"): evaluated per-row AFTER
    *                  the as-of pick, so the plan is unchanged — same
    *                  single key-shuffle, no range join. */
  def asofJoin(left: DataFrame, right: DataFrame, key: String,
               leftTime: String, rightTime: String,
               valueCols: Seq[String],
               within: Option[(Column, Column) => Column] = None): DataFrame = {
    val rightKept = (rightTime +: valueCols).distinct
    val lStruct = StructType(left.schema.fields)
    val rStruct = StructType(right.select(rightKept.map(col): _*).schema.fields)

    val lp = left.select(
      col(key).as("__k"), col(leftTime).as("__t"), lit(1).as("__side"),
      struct(left.columns.toIndexedSeq.map(col): _*).as("__l"),
      lit(null).cast(rStruct).as("__r"))
    val rp = right.select(
      col(key).as("__k"), col(rightTime).as("__t"), lit(0).as("__side"),
      lit(null).cast(lStruct).as("__l"),
      struct(rightKept.map(col): _*).as("__r"))

    val w = Window.partitionBy(col("__k")).orderBy(col("__t"), col("__side"))
      .rowsBetween(Window.unboundedPreceding, 0)
    val picked = lp.unionByName(rp)
      .withColumn("__m", last(col("__r"), ignoreNulls = true).over(w))
      .filter(col("__side") === 1)
    val matched = within match {
      case Some(pred) => picked.withColumn("__m",
        when(col("__m").isNotNull &&
          pred(col("__t"), col(s"__m.$rightTime")), col("__m")))
      case None => picked
    }

    val out = left.columns.map(c => col(s"__l.$c").as(c)) ++
      rightKept.map(c => col(s"__m.$c").as(s"asof_$c"))
    matched.select(out.toSeq: _*)
  }
}
