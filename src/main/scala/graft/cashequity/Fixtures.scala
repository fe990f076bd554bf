package graft.cashequity

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Deterministic synthetic `cash_equity` + securities-document
  * fixtures reproducing the reference's data model (FIXTURES.md;
  * RDME:28-42). Engineered to the golden shapes:
  *  - two sectors exist only in one country → excluded by SQL1's
  *    `HAVING count(distinct country) > 1` (RDME:92);
  *  - US beats FR only in Energy and Financials (RDME:93);
  *  - fund "Global Tech" (Dan Green) is best and "European High
  *    Momentum" (Matt Red) worst (RDME:147);
  *  - securities documents carry "NA"/null dirt in numeric fields
  *    (NOSQL:29-33) and span 11 GICS sectors (RDME:182).
  */
object Fixtures {

  /** Sectors present in both US and FR (pass SQL1's HAVING). */
  val dualSectors: Seq[String] = Seq(
    "Communication Services", "Consumer Discretionary", "Consumer Staples",
    "Energy", "Financials", "Health Care", "Industrials", "Materials",
    "Real Estate", "Utilities")
  /** US-only sectors (excluded by the HAVING filter, RDME:92). */
  val usOnlySectors: Seq[String] = Seq("Information Technology", "Technology")
  /** Sectors where the US return must beat FR (RDME:93). */
  val usWinners: Set[String] = Set("Energy", "Financials")

  /** In-window price dates (SQL2's BETWEEN window, SQL:41). */
  val windowDates: Seq[String] = Seq(
    "2023-10-28", "2023-11-03", "2023-11-10", "2023-11-17", "2023-11-24")
  val outOfWindowDates: Seq[String] = Seq("2021-05-10", "2023-10-27")

  def equityStatic(spark: SparkSession): DataFrame = {
    import spark.implicits._
    val dual = dualSectors.zipWithIndex.flatMap { case (sec, i) =>
      Seq(
        (s"US$i", s"US Corp $i", sec, s"$sec Industry", "US", "AMER"),
        (s"FR$i", s"FR Corp $i", sec, s"$sec Industry", "FR", "EMEA"))
    }
    val usOnly = usOnlySectors.zipWithIndex.map { case (sec, i) =>
      (s"UX$i", s"US Tech $i", sec, s"$sec Industry", "US", "AMER")
    }
    (dual ++ usOnly)
      .toDF("symbol", "security_name", "gics_sector", "gics_industry", "country", "region")
  }

  /** Daily bars: deterministic returns per (sector, country):
    * US return = +0.8%/sector-rank in usWinners sectors else +0.1%;
    * FR return fixed +0.4%. Prices vary by date index so averages are
    * non-trivial but exactly reproducible. */
  def equityPrices(spark: SparkSession): DataFrame = {
    import spark.implicits._
    val statics = Seq(
      dualSectors.zipWithIndex.flatMap { case (sec, i) =>
        Seq((s"US$i", sec, "US"), (s"FR$i", sec, "FR"))
      },
      usOnlySectors.zipWithIndex.map { case (sec, i) => (s"UX$i", sec, "US") }
    ).flatten
    val dates = (windowDates ++ outOfWindowDates).sorted
    val rows = for {
      ((sym, sec, ctry), si) <- statics.zipWithIndex
      (dt, di) <- dates.zipWithIndex
    } yield {
      val open = 100.0 + si * 5 + di
      val retPct =
        if (ctry == "FR") 0.4 + di * 0.01
        else if (usWinners(sec)) 0.8 + di * 0.01
        else 0.1 + di * 0.01
      val close = open * (1.0 + retPct / 100.0)
      val currency = if (ctry == "FR") "EUR" else "USD"
      (sym, java.sql.Date.valueOf(dt), open, close, currency, 1000L + si * 10 + di)
    }
    rows.toDF("symbol_id", "cob_date", "open_price", "close_price", "currency", "volume")
  }

  /** 5 traders / 5 funds + one literal-'null' trader row (SQL:50).
    * Dan Green's symbols rise hardest (Energy, usWinners) and Matt
    * Red's positions are priced to lose. */
  def traderStatic(spark: SparkSession): DataFrame = {
    import spark.implicits._
    Seq(
      ("T1", "Dan Green", "Global Tech", "Hedge", "Tech"),
      ("T2", "Ann Blue", "Blue Harbor", "Mutual", "Value"),
      ("T3", "Joe Black", "Black Rock Lite", "Hedge", "Macro"),
      ("T4", "Sue White", "White Alpha", "Mutual", "Growth"),
      ("T5", "Matt Red", "European High Momentum", "Hedge", "Momentum"))
      .toDF("trader_id", "trader_name", "fund_name", "fund_focus", "fund_type")
      .withColumn("desk", concat(lit("Desk-"), col("trader_id")))
      .withColumn("city", lit("London"))
      .withColumn("email", concat(col("trader_id"), lit("@fund.example")))
      .withColumn("start_date", lit(java.sql.Date.valueOf("2020-01-01")))
      .withColumn("status", lit("active"))
  }

  /** Positions on 2023-10-27 only (RDME:33,101). net_amount is set so
    * Dan Green (T1, cheap entry → big % gain) ranks first and Matt
    * Red (T5, expensive entry → % loss) last. */
  def portfolioPositions(spark: SparkSession): DataFrame = {
    import spark.implicits._
    val posDate = java.sql.Date.valueOf("2023-10-27")
    Seq(
      // trader, symbol, net_quantity, net_amount
      ("T1", "US3", 100.0, 9000.0),   // Energy US: strong rise, cheap entry
      ("T1", "US4", 50.0, 4800.0),    // Financials US
      ("T2", "US0", 80.0, 8800.0),
      ("T2", "FR1", 40.0, 4450.0),
      ("T3", "FR2", 60.0, 6900.0),
      ("T3", "US5", 30.0, 3500.0),
      ("T4", "FR6", 20.0, 2400.0),
      ("T4", "US7", 90.0, 11000.0),
      ("T5", "FR8", 70.0, 16000.0),   // entry above market value → % loss
      ("T5", "FR9", 25.0, 6200.0),
      ("null", "US1", 10.0, 1000.0))  // literal 'null' string (SQL:50)
      .map { case (t, sym, q, a) => (t, sym, q, a, posDate) }
      .toDF("trader", "symbol", "net_quantity", "net_amount", "position_date")
  }

  def exchangeRates(spark: SparkSession): DataFrame = {
    import spark.implicits._
    Seq(("EUR", "USD", java.sql.Date.valueOf("2023-11-24"), 1.09))
      .toDF("from_currency", "to_currency", "cob_date", "rate")
  }

  def traderLimits(spark: SparkSession): DataFrame = {
    import spark.implicits._
    Seq(("T1", "exposure", "gross", 1e6,
      java.sql.Date.valueOf("2023-01-01"), java.sql.Date.valueOf("2023-12-31")))
      .toDF("trader", "limit_type", "limit_category", "limit_amount", "limit_start", "limit_end")
  }

  /** 505 securities documents (RDME:40) with the reference's 3-level
    * nesting and dirty numerics: ~3% of MarketCap/Beta/PERatio/
    * DividendYield are "NA" or null (NOSQL:29-33). Generated from
    * spark.range with integer arithmetic — deterministic, and the
    * same pattern scales to any corpus size. */
  def securities(spark: SparkSession): DataFrame = {
    val sectors = array((dualSectors :+ "Information Technology").map(lit): _*)
    val id = col("id")
    def dirty(expr: org.apache.spark.sql.Column, naMod: Int, nullMod: Int) =
      when(pmod(id, lit(naMod)) === 3, lit("NA"))
        .when(pmod(id, lit(nullMod)) === 7, lit(null))
        .otherwise(expr.cast("string"))
    spark.range(505).select(
      concat(lit("SEC"), id).as("Symbol"),
      struct(
        concat(lit("Security "), id).as("SecurityName"),
        concat(lit("10-K/"), pmod(id, lit(30))).as("SECFilings"),
        element_at(sectors, (pmod(id, lit(11)) + 1).cast("int")).as("GICSSector"),
        concat(lit("SubIndustry "), pmod(id, lit(23))).as("GICSSubIndustry")
      ).as("StaticData"),
      struct(
        dirty(lit(50.0) + pmod(id * 37, lit(900)) + pmod(id, lit(4)) * 0.25, 97, 89).as("Price"),
        dirty(lit(40000.0) + pmod(id * 131, lit(200000)), 31, 41).as("MarketCap"),
        dirty((pmod(id * 17, lit(300)) - lit(100.0)) / 100.0, 37, 43).as("Beta")
      ).as("MarketData"),
      struct(
        dirty(pmod(id * 13, lit(80)) / lit(10.0), 29, 47).as("DividendYield"),
        dirty(lit(5.0) + pmod(id * 11, lit(400)) / 10.0, 53, 59).as("PERatio"),
        dirty(pmod(id * 7, lit(100)) / lit(100.0), 61, 67).as("PayoutRatio")
      ).as("FinancialRatios"))
  }

  /** Register every fixture as a temp view (the `search_path` analogue). */
  def registerAll(spark: SparkSession): Unit = {
    equityStatic(spark).createOrReplaceTempView("equity_static")
    equityPrices(spark).createOrReplaceTempView("equity_prices")
    traderStatic(spark).createOrReplaceTempView("trader_static")
    portfolioPositions(spark).createOrReplaceTempView("portfolio_positions")
    exchangeRates(spark).createOrReplaceTempView("exchange_rates")
    traderLimits(spark).createOrReplaceTempView("trader_limits")
    securities(spark).createOrReplaceTempView("securities")
  }
}
