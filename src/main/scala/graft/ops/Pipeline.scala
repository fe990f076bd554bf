package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Mongo-aggregation-style pipeline builder (SURVEY §3.3): each stage
  * desugars 1:1 to a lazy DataFrame transformation, so Catalyst sees
  * one logical plan for the whole pipeline and applies its own
  * versions of mongod's pipeline rewrites ($match pushdown →
  * PushDownPredicates; $sort+$limit → TakeOrderedAndProject).
  *
  * Stage mapping (reference usage at NoSQLQueries.js:8-12, 28-51):
  *   $match  → matchStage   $group → group     $project → project
  *   $sort   → sort         $limit → limit     $unwind  → unwind
  */
final case class Pipeline(df: DataFrame) {

  /** `$match` — predicate over (possibly nested) fields. */
  def matchStage(cond: Column): Pipeline = Pipeline(df.filter(cond))

  /** `$group` — `id` becomes the `_id` column; accumulators are named
    * aggregate Columns (e.g. `avg($"MarketData.Price").as("average")`).
    * With no accumulators this is Mongo's distinct-ids idiom
    * (`$group: {_id: ...}` alone) → dropDuplicates. */
  def group(id: Column, accumulators: Column*): Pipeline =
    if (accumulators.isEmpty) Pipeline(df.select(id.as("_id")).dropDuplicates())
    else Pipeline(df.groupBy(id.as("_id")).agg(accumulators.head, accumulators.tail: _*))

  /** `$project` — keep / compute the given columns. */
  def project(cols: Column*): Pipeline = Pipeline(df.select(cols: _*))

  /** `$addFields` — add computed columns, keep the rest. */
  def addFields(fields: (String, Column)*): Pipeline =
    Pipeline(fields.foldLeft(df) { case (d, (n, c)) => d.withColumn(n, c) })

  /** `$sort`. NOTE: an intermediate sort feeding `$first` must NOT be
    * relied on in Spark (order is lost at the next shuffle, SURVEY
    * §7.4 Q3) — use [[firstBy]] instead, which is order-explicit. */
  def sort(order: Column*): Pipeline = Pipeline(df.orderBy(order: _*))

  /** `$limit`. */
  def limit(n: Int): Pipeline = Pipeline(df.limit(n))

  /** `$unwind` — explode an array field into one row per element. */
  def unwind(field: String): Pipeline =
    Pipeline(df.withColumn(field, explode(col(field))))

  /** `$sort` + `$group`/`$first` fused into the deterministic Spark
    * form (window argmin) — replaces the unstable sort-then-first
    * idiom of NoSQLQueries.js:49-50. */
  def firstBy(id: Column, order: Seq[Column], keep: Seq[Column]): Pipeline = {
    val named = df.withColumn("_id", id)
    Pipeline(RelationalOps.argminBy(named, Seq(col("_id")), order)
      .select((col("_id") +: keep): _*))
  }

  def result: DataFrame = df
}
