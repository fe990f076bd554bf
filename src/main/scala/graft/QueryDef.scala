package graft

import org.apache.spark.sql.{DataFrame, SparkSession}

/** One gate-checkable query: a Spark program plus (when the semantics
  * are ANSI-SQL-expressible) a DuckDB oracle over the same parquet
  * tables. Column names and types must match the oracle exactly —
  * the driver's compare sorts columns by name and hashes values.
  *
  * `bench = true` marks headline queries timed by [[Bench]].
  */
final case class QueryDef(
    name: String,
    fn: (SparkSession, String) => DataFrame,
    oracle: Option[String],
    bench: Boolean = false)

object QueryDef {
  /** Registry assembled from every query group in the library. */
  def all: Seq[QueryDef] =
    graft.queries.RelationalQueries.defs ++
      graft.queries.ScalarQueries.defs ++
      graft.queries.SourceQueries.defs ++
      graft.queries.TextQueries.defs ++
      graft.queries.RetrievalQueries.defs ++
      graft.queries.DedupQueries.defs ++
      graft.queries.SimilarityQueries.defs ++
      graft.queries.EventQueries.defs ++
      graft.queries.GraphQueries.defs ++
      graft.queries.SketchQueries.defs ++
      graft.cashequity.CashEquityQueries.defs
}
