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
    val traderPerformance = sql2TraderPerformance(spark)

    // final rollup (SQL:54-57). The average is rounded to 6 dp: the
    // true value has exactly 5 decimals (a sum of 4-decimal changes
    // over 10 rows), so round(·,6) projects away cross-engine
    // float-summation-order ulps without touching the real value.
    // CashEquitySpec asserts the 10-rows-per-group invariant this
    // exactness argument depends on, so a fixture change that breaks
    // it fails loudly instead of silently becoming lossy rounding.
    traderPerformance.groupBy("trader_name", "fund_name", "fund_focus")
      .agg(round(avg("amount_change"), 6).as("average_change"))
      .orderBy(desc("average_change"))
  }

  /** The trader_performance CTE of [[sql2]] (SQL:44-52), exposed so
    * the spec can assert the rounding-exactness invariant. */
  private[graft] def sql2TraderPerformance(spark: SparkSession): DataFrame = {
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
    deduped.withColumn("new_net_amount",
        col("close_price") * col("net_quantity"))
      .withColumn("amount_change",
        round(((col("close_price") * col("net_quantity") - col("net_amount"))
          / col("net_amount")) * 100, 4))
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
    SELECT trader_name, fund_name, fund_focus,
           round(avg(amount_change), 6) AS average_change
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

  /** DuckDB re-derivation of the [[Fixtures]] equity tables: the same
    * closed-form arithmetic (index-join + CASE returns) expressed as
    * CTEs, so the driver's oracle can hash-check the four parity
    * queries end to end. Every float literal is cast `::DOUBLE`
    * (DuckDB parses bare decimals as DECIMAL, whose arithmetic
    * diverges from Spark's double) and every expression mirrors the
    * Scala evaluation order, keeping results bit-identical. */
  private[graft] val equityFixtureSql: String = """
    dual_sectors(i, sec) AS (VALUES
      (0, 'Communication Services'), (1, 'Consumer Discretionary'),
      (2, 'Consumer Staples'), (3, 'Energy'), (4, 'Financials'),
      (5, 'Health Care'), (6, 'Industrials'), (7, 'Materials'),
      (8, 'Real Estate'), (9, 'Utilities')),
    statics(symbol, sec, ctry, si) AS (
      SELECT 'US' || i, sec, 'US', 2 * i FROM dual_sectors
      UNION ALL
      SELECT 'FR' || i, sec, 'FR', 2 * i + 1 FROM dual_sectors
      UNION ALL
      SELECT * FROM (VALUES ('UX0', 'Information Technology', 'US', 20),
                            ('UX1', 'Technology', 'US', 21))),
    dates(dt, di) AS (VALUES
      (DATE '2021-05-10', 0), (DATE '2023-10-27', 1), (DATE '2023-10-28', 2),
      (DATE '2023-11-03', 3), (DATE '2023-11-10', 4), (DATE '2023-11-17', 5),
      (DATE '2023-11-24', 6)),
    equity_static AS (
      SELECT symbol, sec AS gics_sector, ctry AS country FROM statics),
    equity_prices AS (
      SELECT symbol AS symbol_id, dt AS cob_date,
        100.0::DOUBLE + si * 5 + di AS open_price,
        (100.0::DOUBLE + si * 5 + di) *
          (1.0::DOUBLE +
            (CASE WHEN ctry = 'FR' THEN 0.4::DOUBLE + di * 0.01::DOUBLE
                  WHEN sec IN ('Energy', 'Financials') THEN 0.8::DOUBLE + di * 0.01::DOUBLE
                  ELSE 0.1::DOUBLE + di * 0.01::DOUBLE END) / 100.0::DOUBLE) AS close_price,
        CASE WHEN ctry = 'FR' THEN 'EUR' ELSE 'USD' END AS currency
      FROM statics CROSS JOIN dates)"""

  private val sql1Oracle: String = s"""
    WITH $equityFixtureSql,
    sector_return AS (
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

  private val sql2Oracle: String = s"""
    WITH $equityFixtureSql,
    positions(trader, symbol, net_quantity, net_amount) AS (VALUES
      ('T1', 'US3', 100.0::DOUBLE, 9000.0::DOUBLE),
      ('T1', 'US4', 50.0::DOUBLE, 4800.0::DOUBLE),
      ('T2', 'US0', 80.0::DOUBLE, 8800.0::DOUBLE),
      ('T2', 'FR1', 40.0::DOUBLE, 4450.0::DOUBLE),
      ('T3', 'FR2', 60.0::DOUBLE, 6900.0::DOUBLE),
      ('T3', 'US5', 30.0::DOUBLE, 3500.0::DOUBLE),
      ('T4', 'FR6', 20.0::DOUBLE, 2400.0::DOUBLE),
      ('T4', 'US7', 90.0::DOUBLE, 11000.0::DOUBLE),
      ('T5', 'FR8', 70.0::DOUBLE, 16000.0::DOUBLE),
      ('T5', 'FR9', 25.0::DOUBLE, 6200.0::DOUBLE),
      ('null', 'US1', 10.0::DOUBLE, 1000.0::DOUBLE)),
    traders(trader_id, trader_name, fund_name, fund_focus) AS (VALUES
      ('T1', 'Dan Green', 'Global Tech', 'Hedge'),
      ('T2', 'Ann Blue', 'Blue Harbor', 'Mutual'),
      ('T3', 'Joe Black', 'Black Rock Lite', 'Hedge'),
      ('T4', 'Sue White', 'White Alpha', 'Mutual'),
      ('T5', 'Matt Red', 'European High Momentum', 'Hedge')),
    portfolio_equity AS (
      SELECT equity_prices.cob_date, equity_prices.currency,
             trader, symbol, net_amount, net_quantity
      FROM equity_prices
      LEFT JOIN positions ON equity_prices.symbol_id = positions.symbol
      WHERE equity_prices.cob_date BETWEEN DATE '2023-10-28' AND DATE '2023-11-24'
      GROUP BY equity_prices.cob_date, equity_prices.currency, trader, symbol,
               net_amount, net_quantity),
    trader_performance AS (
      SELECT portfolio_equity.cob_date, portfolio_equity.currency, trader, fund_name,
             fund_focus, trader_name, portfolio_equity.symbol AS symbol,
             net_amount, net_quantity, close_price,
             round((((close_price * net_quantity) - net_amount) / net_amount) * 100, 4)
               AS amount_change
      FROM portfolio_equity
      RIGHT JOIN equity_prices ON portfolio_equity.cob_date = equity_prices.cob_date
                              AND portfolio_equity.symbol = equity_prices.symbol_id
      LEFT JOIN traders ON portfolio_equity.trader = traders.trader_id
      WHERE trader <> 'null'
      GROUP BY portfolio_equity.cob_date, portfolio_equity.currency, trader, fund_name,
               fund_focus, trader_name, portfolio_equity.symbol, net_amount,
               net_quantity, close_price)
    SELECT trader_name, fund_name, fund_focus,
           CASE WHEN count(*) = 10 THEN round(avg(amount_change), 6)
                ELSE error('cw_sql2 fixture drift: a trader group no longer has exactly '
                           || '10 four-decimal rows, so round(avg, 6) stops being exact')
             END AS average_change
    FROM trader_performance
    GROUP BY trader_name, fund_name, fund_focus
    ORDER BY average_change DESC"""

  /** DuckDB re-derivation of [[Fixtures.securities]]: the dirty-string
    * wrapper collapses to "numeric, NULL when either mod-condition
    * fires" because the oracle only ever consumes the try_cast'd
    * numeric view of each field. */
  private val securitiesFixtureSql: String = """
    securities_n AS (
      SELECT range AS id, 'SEC' || range AS symbol,
        (['Communication Services', 'Consumer Discretionary', 'Consumer Staples',
          'Energy', 'Financials', 'Health Care', 'Industrials', 'Materials',
          'Real Estate', 'Utilities', 'Information Technology'])[(range % 11)::INT + 1]
          AS sector,
        CASE WHEN range % 97 = 3 OR range % 89 = 7 THEN NULL
             ELSE 50.0::DOUBLE + (range * 37) % 900 + (range % 4) * 0.25::DOUBLE
          END AS price,
        CASE WHEN range % 31 = 3 OR range % 41 = 7 THEN NULL
             ELSE 40000.0::DOUBLE + (range * 131) % 200000 END AS mcap,
        CASE WHEN range % 37 = 3 OR range % 43 = 7 THEN NULL
             ELSE ((range * 17) % 300 - 100.0::DOUBLE) / 100.0::DOUBLE END AS beta,
        CASE WHEN range % 29 = 3 OR range % 47 = 7 THEN NULL
             ELSE ((range * 13) % 80) / 10.0::DOUBLE END AS dy,
        CASE WHEN range % 53 = 3 OR range % 59 = 7 THEN NULL
             ELSE 5.0::DOUBLE + ((range * 11) % 400) / 10.0::DOUBLE END AS pe
      FROM range(505))"""

  private val nosql1Oracle: String = s"""
    WITH $securitiesFixtureSql
    SELECT sector AS _id, avg(price) AS average
    FROM securities_n
    WHERE mcap > 100000
    GROUP BY sector
    ORDER BY average DESC, _id
    LIMIT 1"""

  private val nosql2Oracle: String = s"""
    WITH $securitiesFixtureSql,
    cleaned AS (
      SELECT * FROM securities_n
      WHERE mcap IS NOT NULL AND beta IS NOT NULL AND dy IS NOT NULL AND pe IS NOT NULL),
    stats AS (
      SELECT sector, avg(pe) AS avgpe, avg(dy) AS avgdy, avg(mcap) AS avgmcap
      FROM cleaned GROUP BY sector),
    quals AS (
      SELECT c.sector, c.symbol, c.beta,
             row_number() OVER (PARTITION BY c.sector ORDER BY c.beta, c.symbol) AS rn
      FROM cleaned c JOIN stats s USING (sector)
      WHERE c.mcap > s.avgmcap AND c.pe > s.avgpe AND c.dy > s.avgdy)
    SELECT s.sector AS _id, q.symbol AS symbol, q.beta AS beta
    FROM stats s
    LEFT JOIN (SELECT * FROM quals WHERE rn = 1) q ON s.sector = q.sector
    ORDER BY _id"""

  /** FX conversion: EUR close prices → USD via the `exchange_rates`
    * dim (modeled by the reference, RDME:32, but never queried there
    * — this completes the 6-table model). The rate table is tiny and
    * broadcast; the equi-join on (currency, date) is how a real
    * price-conversion pipeline keys its FX lookups. */
  def fxConvert(spark: SparkSession): DataFrame = {
    val prices = spark.table("equity_prices")
    val fx = spark.table("exchange_rates")
    prices.join(broadcast(fx),
        prices("currency") === fx("from_currency") &&
          prices("cob_date") === fx("cob_date"))
      .select(col("symbol_id"), prices("cob_date").as("cob_date"),
        col("close_price"), col("to_currency"),
        round(col("close_price") * col("rate"), 4).as("close_converted"))
      .orderBy("symbol_id")
  }

  private val fxOracle: String = s"""
    WITH $equityFixtureSql,
    exchange_rates(from_currency, to_currency, fx_date, rate) AS (VALUES
      ('EUR', 'USD', DATE '2023-11-24', 1.09::DOUBLE))
    SELECT symbol_id, cob_date, close_price, to_currency,
           round(close_price * rate, 4) AS close_converted
    FROM equity_prices
    JOIN exchange_rates ON currency = from_currency AND cob_date = fx_date
    ORDER BY symbol_id"""

  /** Driver-gate entries: run on the deterministic fixtures (sfDir is
    * ignored — the testdata has no cash_equity tables); the oracles
    * re-derive those fixtures inside DuckDB, so all four parity
    * queries are hash-checked end to end. */
  def defs: Seq[QueryDef] = Seq(
    QueryDef("cw_sql1", (s, _) => { Fixtures.registerAll(s); sql1(s) }, Some(sql1Oracle)),
    QueryDef("cw_sql2", (s, _) => { Fixtures.registerAll(s); sql2(s) }, Some(sql2Oracle)),
    QueryDef("cw_nosql1", (s, _) => { Fixtures.registerAll(s); nosql1(s) }, Some(nosql1Oracle)),
    QueryDef("cw_nosql2", (s, _) => { Fixtures.registerAll(s); nosql2(s) }, Some(nosql2Oracle)),
    QueryDef("cw_fx_convert", (s, _) => { Fixtures.registerAll(s); fxConvert(s) }, Some(fxOracle)),
  )
}
