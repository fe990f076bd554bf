package graft.ext

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Declarative data-quality constraint checking — the ingestion gate
  * a training-data pipeline fronts every new corpus drop with
  * (completeness, uniqueness, domain membership, bounds, volume)
  * before anything downstream sees the batch.
  *
  * All ratio metrics evaluate in ONE aggregation pass over the
  * input: each constraint contributes an exact integer `sum(CASE)`
  * counter, and the ratios derive from those integers with one
  * `round(x, 6)` at the end — integer counters are exact in any
  * aggregation order and any engine, so the report is
  * oracle-reproducible bit-for-bit. Uniqueness adds
  * `count(distinct …)` columns to the same aggregate (Spark plans
  * the multi-distinct via Expand — fine for a report; at 100 TB
  * swap in [[Sketches]]' HLL for a one-pass approximate uniqueness
  * and keep the exact form for audits).
  *
  * Output: one row per constraint — `(constraint, metric, threshold,
  * pass)` — produced by exploding a literal-built struct array from
  * the single aggregate row, so the whole report stays one job.
  */
object Quality {

  sealed trait Constraint { def name: String }
  /** Non-null ratio of `column` must reach `minRatio`. */
  final case class Complete(column: String, minRatio: Double) extends Constraint {
    def name = s"complete($column)"
  }
  /** Distinct/total ratio over `columns` must reach `minRatio`
    * (1.0 = a true candidate key). */
  final case class Unique(columns: Seq[String], minRatio: Double = 1.0) extends Constraint {
    def name = s"unique(${columns.mkString(",")})"
  }
  /** Ratio of rows whose `column` is one of `values` (nulls fail)
    * must reach `minRatio`. */
  final case class InSet(column: String, values: Seq[String], minRatio: Double)
      extends Constraint {
    def name = s"in_set($column)"
  }
  /** Ratio of rows with `lo <= column <= hi` (nulls fail) must reach
    * `minRatio`. */
  final case class Between(column: String, lo: Double, hi: Double, minRatio: Double)
      extends Constraint {
    def name = s"between($column)"
  }
  /** Total row count must land in `[lo, hi]`. Metric is the count
    * itself; threshold reported as `lo`. */
  final case class RowCountBetween(lo: Long, hi: Long) extends Constraint {
    def name = "row_count"
  }

  def checkConstraints(df: DataFrame, constraints: Seq[Constraint]): DataFrame = {
    require(constraints.nonEmpty, "need at least one constraint")
    val n = count(lit(1)).as("__n")
    // one exact integer counter (or distinct count) per constraint
    val aggs: Seq[Column] = constraints.zipWithIndex.map {
      case (Complete(c, _), i) =>
        sum(when(col(c).isNotNull, 1L).otherwise(0L)).as(s"__m$i")
      case (Unique(cs, _), i) =>
        countDistinct(cs.head, cs.tail: _*).as(s"__m$i")
      case (InSet(c, vs, _), i) =>
        sum(when(col(c).isin(vs: _*), 1L).otherwise(0L)).as(s"__m$i")
      case (Between(c, lo, hi, _), i) =>
        sum(when(col(c) >= lo && col(c) <= hi, 1L).otherwise(0L)).as(s"__m$i")
      case (RowCountBetween(_, _), i) => count(lit(1)).as(s"__m$i")
    }
    val one = df.agg(n, aggs: _*)
    val reports: Seq[Column] = constraints.zipWithIndex.map { case (c, i) =>
      val m = col(s"__m$i")
      val (metric, threshold, pass) = c match {
        case Complete(_, r)   => (round(m / col("__n"), 6), lit(r), round(m / col("__n"), 6) >= r)
        case Unique(_, r)     => (round(m / col("__n"), 6), lit(r), round(m / col("__n"), 6) >= r)
        case InSet(_, _, r)   => (round(m / col("__n"), 6), lit(r), round(m / col("__n"), 6) >= r)
        case Between(_, _, _, r) => (round(m / col("__n"), 6), lit(r), round(m / col("__n"), 6) >= r)
        case RowCountBetween(lo, hi) =>
          (m.cast("double"), lit(lo.toDouble), m >= lo && m <= hi)
      }
      struct(lit(c.name).as("constraint"), metric.cast("double").as("metric"),
        threshold.cast("double").as("threshold"), pass.as("pass"))
    }
    one.select(explode(array(reports: _*)).as("r"))
      .select(col("r.constraint"), col("r.metric"), col("r.threshold"), col("r.pass"))
  }
}
