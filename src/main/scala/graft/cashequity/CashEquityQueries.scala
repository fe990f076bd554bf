package graft.cashequity

import graft.QueryDef
import graft.ops.{Pipeline, RelationalOps}
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** The reference's four queries re-expressed Spark-first, each in a
  * DataFrame form (primary) and a SQL-text form (tests prove the two
  * produce identical results). Citations are to
  * `/root/reference/Student_23098644/1.CourseworkOne/`
  * {SQLQueries.sql (SQL), NoSQLQueries.js (NOSQL)}.
  *
  * These run on the deterministic [[Fixtures]] (the driver testdata
  * has no cash_equity tables), so the driver gate records rows-only
  * checks; exact-semantics coverage lives in CashEquitySpec.
  */
object CashEquityQueries {

  /** SQL Query 1 (SQL:10-31): US vs FR mean daily return per sector,
    * conditional-aggregation pivot, HAVING count(distinct)>1. */
  def sql1(spark: SparkSession): DataFrame = {
    val prices = spark.table("equity_prices")
    val static = spark.table("equity_static")
    // CTE sector_return (SQL:10-16)
    val dailyRet = ((col("close_price") - col("open_price")) / col("open_price")) * 100
    val sectorReturn = static
      .join(prices, static("symbol") === prices("symbol_id"), "left")
      .filter(col("country").isin("US", "FR"))
      .groupBy("gics_sector", "country")
      .agg(round(avg(dailyRet), 4).as("daily_return"))
    // outer pivot (SQL:18-31)
    val usAvg = RelationalOps.avgIf(col("country") === "US", col("daily_return"))
    val frAvg = RelationalOps.avgIf(col("country") === "FR", col("daily_return"))
    sectorReturn.groupBy("gics_sector")
      .agg(
        round(usAvg, 4).as("us_return"),
        round(frAvg, 4).as("fr_return"),
        when(usAvg > frAvg, "US").when(usAvg < frAvg, "FR").otherwise("N/A").as("comparison"),
        countDistinct(col("country")).as("n_country"))
      .filter(col("n_country") > 1)
      .drop("n_country")
      .orderBy("gics_sector")
  }

  /** SQL Query 1, SQL-text form (Spark SQL runs the original shape). */
  val sql1Text: String = """
    WITH sector_return AS (
      SELECT gics_sector, country,
             round(avg(((close_price - open_price) / open_price) * 100), 4) AS daily_return
      FROM equity_static
      LEFT JOIN equity_prices ON equity_static.symbol = equity_prices.symbol_id
      WHERE country IN ('US', 'FR')
      GROUP BY gics_sector, country)
    SELECT gics_sector,
      round(avg(CASE WHEN country = 'US' THEN daily_return END), 4) AS us_return,
      round(avg(CASE WHEN country = 'FR' THEN daily_return END), 4) AS fr_return,
      CASE
        WHEN avg(CASE WHEN country = 'US' THEN daily_return END) >
             avg(CASE WHEN country = 'FR' THEN daily_return END) THEN 'US'
        WHEN avg(CASE WHEN country = 'US' THEN daily_return END) <
             avg(CASE WHEN country = 'FR' THEN daily_return END) THEN 'FR'
        ELSE 'N/A'
      END AS comparison
    FROM sector_return
    GROUP BY gics_sector
    HAVING count(DISTINCT country) > 1
    ORDER BY gics_sector"""

  /** SQL Query 2 (SQL:35-57): per-fund mean % net-amount change over
    * the BETWEEN window. The intermediate ORDER BYs (SQL:43,52) are
    * no-ops in standard SQL and omitted (SURVEY §7.4 Q5); the GROUP
    * BYs with bare select lists are dedups (§7.4 Q7). */
  def sql2(spark: SparkSession): DataFrame = {
    val prices = spark.table("equity_prices")
    val positions = spark.table("portfolio_positions")
    val traders = spark.table("trader_static")

    // CTE portfolio_equity (SQL:37-43): left join + window + dedup
    val portfolioEquity = RelationalOps.dedupRows(
      prices.join(positions, prices("symbol_id") === positions("symbol"), "left")
        .filter(col("cob_date").between("2023-10-28", "2023-11-24")),
      Seq("cob_date", "currency", "trader", "symbol", "net_amount", "net_quantity"))

    // CTE trader_performance (SQL:44-52): right join on compound key,
    // trader dim join, 'null'-sentinel filter, dedup, amount change
    val pe = portfolioEquity.as("pe")
    val ep = prices.as("ep")
    val joined = pe.join(ep,
        col("pe.cob_date") === col("ep.cob_date") && col("pe.symbol") === col("ep.symbol_id"),
        "right")
      .join(traders, col("pe.trader") === col("trader_id"), "left")
      .filter(col("pe.trader") =!= "null")
    val deduped = RelationalOps.dedupRows(
      joined.select(col("pe.cob_date").as("cob_date"), col("pe.currency").as("currency"),
        col("pe.trader").as("trader"), col("fund_name"), col("fund_focus"), col("trader_name"),
        col("pe.symbol").as("symbol"), col("net_amount"), col("net_quantity"), col("close_price")),
      Seq("cob_date", "currency", "trader", "fund_name", "fund_focus", "trader_name",
        "symbol", "net_amount", "net_quantity", "close_price"))
    val traderPerformance = deduped.withColumn("new_net_amount",
        col("close_price") * col("net_quantity"))
      .withColumn("amount_change",
        round(((col("close_price") * col("net_quantity") - col("net_amount"))
          / col("net_amount")) * 100, 4))

    // final rollup (SQL:54-57)
    traderPerformance.groupBy("trader_name", "fund_name", "fund_focus")
      .agg(avg("amount_change").as("average_change"))
      .orderBy(desc("average_change"))
  }

  val sql2Text: String = """
    WITH trader_performance AS (
      WITH portfolio_equity AS (
        SELECT equity_prices.cob_date, equity_prices.currency,
               portfolio_positions.trader, portfolio_positions.symbol,
               portfolio_positions.net_amount, portfolio_positions.net_quantity
        FROM equity_prices
        LEFT JOIN portfolio_positions ON equity_prices.symbol_id = portfolio_positions.symbol
        WHERE equity_prices.cob_date BETWEEN '2023-10-28' AND '2023-11-24'
        GROUP BY equity_prices.cob_date, equity_prices.currency, trader, symbol,
                 net_amount, net_quantity)
      SELECT portfolio_equity.cob_date, portfolio_equity.currency, trader, fund_name,
             fund_focus, trader_name, symbol, net_amount, net_quantity, close_price,
             close_price * net_quantity AS new_net_amount,
             round((((close_price * net_quantity) - net_amount) / net_amount) * 100, 4)
               AS amount_change
      FROM portfolio_equity
      RIGHT JOIN equity_prices ON portfolio_equity.cob_date = equity_prices.cob_date
                              AND portfolio_equity.symbol = equity_prices.symbol_id
      LEFT JOIN trader_static ON portfolio_equity.trader = trader_static.trader_id
      WHERE portfolio_equity.trader <> 'null'
      GROUP BY portfolio_equity.cob_date, portfolio_equity.currency, trader, fund_name,
               fund_focus, trader_name, symbol, net_amount, net_quantity, close_price)
    SELECT trader_name, fund_name, fund_focus, avg(amount_change) AS average_change
    FROM trader_performance
    GROUP BY trader_name, fund_name, fund_focus
    ORDER BY average_change DESC"""

  /** NoSQL Query 1 (NOSQL:8-12): $match MarketCap>100000 → $group
    * avg(Price) per sector → $sort desc → $limit 1. Dirty numerics are
    * cast-with-null so avg skips them, matching Mongo's $avg (SURVEY
    * §7.4 Q2); $gt never matches the "NA" strings (Mongo type
    * bracketing), which try_cast→NULL reproduces. */
  def nosql1(spark: SparkSession): DataFrame = {
    val docs = spark.table("securities")
    val mcap = RelationalOps.numericOrNull(col("MarketData.MarketCap"))
    val price = RelationalOps.numericOrNull(col("MarketData.Price"))
    Pipeline(docs)
      .matchStage(mcap > 100000)
      .group(col("StaticData.GICSSector"), avg(price).as("average"))
      .sort(desc("average"), col("_id"))
      .limit(1)
      .result
  }

  /** NoSQL Query 2 (NOSQL:28-51): clean dirty numerics → per-sector
    * averages + $push → $filter above-average on all three ratios →
    * $arrayElemAt 0 of the beta-sorted qualifiers → argmin-by-Beta per
    * sector (the deterministic form of $sort+$first, SURVEY §7.4 Q3)
    * → project symbol + Beta ($min on a scalar is identity, §7.4 Q4). */
  def nosql2(spark: SparkSession): DataFrame = {
    val docs = spark.table("securities")
    val numeric = Seq("MarketData.MarketCap", "MarketData.Beta",
      "FinancialRatios.DividendYield", "FinancialRatios.PERatio")
    // $match $nin ["NA", null] on all four fields (NOSQL:29-33)
    val cleaned = numeric.foldLeft(docs) { (d, f) =>
      d.filter(col(f).isNotNull && col(f) =!= "NA")
    }
    val grouped = Pipeline(cleaned)
      .group(col("StaticData.GICSSector"),
        avg(col("FinancialRatios.PERatio").cast("double")).as("avgPE"),
        avg(col("FinancialRatios.DividendYield").cast("double")).as("avgDY"),
        avg(col("MarketData.MarketCap").cast("double")).as("avgMCap"),
        collect_list(struct(
          col("Symbol").as("symbol"),
          col("MarketData.MarketCap").cast("double").as("MarketCap"),
          col("FinancialRatios.PERatio").cast("double").as("PE"),
          col("FinancialRatios.DividendYield").cast("double").as("DividendYield"),
          col("MarketData.Beta").cast("double").as("Beta"))).as("securities"))
      .result
    // $project + $filter + $arrayElemAt (NOSQL:42-47): qualifiers
    // sorted by (Beta, symbol) so element 1 is the beta-argmin —
    // fuses the reference's $sort + $group/$first deterministically
    val qualifies = filter(col("securities"), s =>
      s.getField("MarketCap") > col("avgMCap") &&
        s.getField("PE") > col("avgPE") &&
        s.getField("DividendYield") > col("avgDY"))
    val betaSorted = sort_array(transform(qualifies, s =>
      struct(s.getField("Beta").as("Beta"), s.getField("symbol").as("symbol"))))
    grouped
      // try_element_at: NULL on empty array, matching Mongo's missing
      // field for sectors with no qualifying security (RDME:239)
      .withColumn("chosensecurity", try_element_at(betaSorted, lit(1)))
      .select(col("_id"),
        col("chosensecurity.symbol").as("symbol"),
        col("chosensecurity.Beta").as("beta"))
      .orderBy("_id")
  }

  /** Driver-gate entries: run on the deterministic fixtures (sfDir is
    * ignored — the testdata has no cash_equity tables). */
  def defs: Seq[QueryDef] = Seq(
    QueryDef("cw_sql1", (s, _) => { Fixtures.registerAll(s); sql1(s) }, None),
    QueryDef("cw_sql2", (s, _) => { Fixtures.registerAll(s); sql2(s) }, None),
    QueryDef("cw_nosql1", (s, _) => { Fixtures.registerAll(s); nosql1(s) }, None),
    QueryDef("cw_nosql2", (s, _) => { Fixtures.registerAll(s); nosql2(s) }, None),
  )
}
