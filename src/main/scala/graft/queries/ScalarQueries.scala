package graft.queries

import graft.QueryDef
import graft.sources.Tables
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Scalar-function battery: JSON extraction, string functions, date
  * arithmetic — each expression mirrored exactly in the DuckDB oracle
  * (flags matter: DuckDB regexp_replace needs 'g' to match Spark's
  * replace-all; datediff argument order differs).
  */
object ScalarQueries {

  private def t(s: SparkSession, dir: String, n: String): DataFrame =
    Tables(s, dir).table(n)

  def defs: Seq[QueryDef] = Seq(

    // JSON extraction from the events.props payload column
    QueryDef("q_json_extract",
      (s, d) => t(s, d, "events")
        .withColumn("k", get_json_object(col("props"), "$.k").cast("long"))
        .groupBy("event_type")
        .agg(count(when(col("k") > 50, 1)).as("n_high"),
          sum("k").as("sum_k"))
        .orderBy("event_type"),
      Some("""SELECT event_type,
             |  count(CASE WHEN CAST(json_extract_string(props, '$.k') AS BIGINT) > 50
             |             THEN 1 END) AS n_high,
             |  CAST(sum(CAST(json_extract_string(props, '$.k') AS BIGINT)) AS BIGINT) AS sum_k
             |FROM events GROUP BY 1 ORDER BY 1""".stripMargin), bench = true),

    // String functions battery over customer names
    QueryDef("q_string_funcs",
      (s, d) => t(s, d, "customer").select(
        col("c_custkey"),
        upper(col("c_name")).as("upper_name"),
        length(col("c_name")).cast("long").as("name_len"),
        substring(col("c_name"), 1, 5).as("prefix"),
        regexp_replace(col("c_name"), "[0-9]+", "#").as("digits_masked"),
        concat_ws("|", col("c_mktsegment"), col("c_name")).as("tagged"),
        lpad(col("c_custkey").cast("string"), 8, "0").as("padded"))
        .orderBy("c_custkey"),
      Some("""SELECT c_custkey,
             |  upper(c_name) AS upper_name,
             |  length(c_name) AS name_len,
             |  substring(c_name, 1, 5) AS prefix,
             |  regexp_replace(c_name, '[0-9]+', '#', 'g') AS digits_masked,
             |  concat_ws('|', c_mktsegment, c_name) AS tagged,
             |  lpad(CAST(c_custkey AS VARCHAR), 8, '0') AS padded
             |FROM customer ORDER BY c_custkey""".stripMargin)),

    // Date arithmetic battery over orders
    QueryDef("q_date_funcs",
      (s, d) => t(s, d, "orders").select(
        col("o_orderkey"),
        year(col("o_orderdate")).cast("long").as("y"),
        month(col("o_orderdate")).cast("long").as("m"),
        dayofmonth(col("o_orderdate")).cast("long").as("dom"),
        date_trunc("month", col("o_orderdate")).as("month_start"),
        datediff(col("o_orderdate").cast("date"), lit("1995-01-01").cast("date"))
          .cast("long").as("days_since_epoch_start"),
        date_add(col("o_orderdate").cast("date"), 30).as("due_date"))
        .orderBy("o_orderkey"),
      Some("""SELECT o_orderkey,
             |  year(o_orderdate) AS y,
             |  month(o_orderdate) AS m,
             |  day(o_orderdate) AS dom,
             |  date_trunc('month', o_orderdate) AS month_start,
             |  datediff('day', DATE '1995-01-01', CAST(o_orderdate AS DATE))
             |    AS days_since_epoch_start,
             |  CAST(o_orderdate AS DATE) + 30 AS due_date
             |FROM orders ORDER BY o_orderkey""".stripMargin)),
  )
}
