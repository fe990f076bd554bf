package graft

import graft.cashequity.{CashEquityQueries, Fixtures}
import org.apache.spark.sql.DataFrame
import org.scalatest.funsuite.AnyFunSuite

/** Golden tests for the 4 reference-parity queries against the
  * deterministic fixtures (shapes per RDME:92-93,147,182,239 —
  * reproduced structurally, see Fixtures). Each SQL query is also
  * run in its SQL-text form and must match the DataFrame form row
  * for row — two independent plans, one answer. */
class CashEquitySpec extends AnyFunSuite with SharedSpark {

  private def rows(df: DataFrame): Seq[Seq[Any]] =
    df.collect().toSeq.map(_.toSeq)

  /** Row equality with FP tolerance: the DataFrame and SQL plans may
    * sum partial aggregates in different orders (~1e-15 drift). */
  private def assertSameRows(a: Seq[Seq[Any]], b: Seq[Seq[Any]]): Unit = {
    assert(a.length === b.length)
    a.zip(b).foreach { case (ra, rb) =>
      ra.zip(rb).foreach {
        case (x: Double, y: Double) => assert(math.abs(x - y) < 1e-9, s"$x vs $y")
        case (x, y) => assert(x === y)
      }
    }
  }

  private lazy val registered = { Fixtures.registerAll(spark); true }

  test("SQL1: DataFrame and SQL forms agree exactly") {
    assert(registered)
    assert(rows(CashEquityQueries.sql1(spark)) ===
      rows(spark.sql(CashEquityQueries.sql1Text)))
  }

  test("SQL1 golden shape: 10 dual-country sectors; one-country sectors excluded by HAVING") {
    assert(registered)
    val out = CashEquityQueries.sql1(spark).collect()
    assert(out.length === 10)
    val sectors = out.map(_.getString(0)).toSet
    assert(sectors === Fixtures.dualSectors.toSet)
    assert(!sectors.contains("Information Technology") && !sectors.contains("Technology"))
  }

  test("SQL1 golden direction: US beats FR only in Energy and Financials (RDME:93)") {
    assert(registered)
    val cmp = CashEquityQueries.sql1(spark).collect()
      .map(r => r.getString(0) -> r.getString(3)).toMap
    Fixtures.dualSectors.foreach { sec =>
      val expected = if (Fixtures.usWinners(sec)) "US" else "FR"
      assert(cmp(sec) === expected, s"sector $sec")
    }
  }

  test("SQL2: DataFrame and SQL forms agree exactly") {
    assert(registered)
    assertSameRows(rows(CashEquityQueries.sql2(spark)),
      rows(spark.sql(CashEquityQueries.sql2Text)))
  }

  test("SQL2 golden ranking: 5 funds; Global Tech best, European High Momentum worst (RDME:147)") {
    assert(registered)
    val out = CashEquityQueries.sql2(spark).collect()
    assert(out.length === 5, "the literal-'null' trader must be filtered (SQL:50)")
    assert(out.head.getString(1) === "Global Tech" && out.head.getString(0) === "Dan Green")
    assert(out.last.getString(1) === "European High Momentum" && out.last.getString(0) === "Matt Red")
    // ordering is by average_change DESC
    val changes = out.map(_.getDouble(3)).toSeq
    assert(changes === changes.sorted.reverse)
  }

  test("SQL2 rounding invariant: every fund group averages exactly 10 four-decimal rows") {
    assert(registered)
    // sql2's round(avg(amount_change), 6) is EXACT only because each
    // group's average is a sum of 4-decimal values over 10 rows
    // (→ at most 5 decimals). If a fixture change breaks either half
    // of that invariant, the parity query silently becomes lossy
    // rounding — this test makes it loud instead.
    import org.apache.spark.sql.functions._
    val tp = CashEquityQueries.sql2TraderPerformance(spark)
    val groupSizes = tp.groupBy("trader_name", "fund_name", "fund_focus")
      .count().collect()
    assert(groupSizes.nonEmpty)
    groupSizes.foreach(r => assert(r.getLong(3) === 10L,
      s"group ${r.getString(0)}/${r.getString(1)} has ${r.getLong(3)} rows, not 10"))
    // amount_change really is on the 1e-4 grid
    val offGrid = tp.filter(
      abs(col("amount_change") * 10000 - round(col("amount_change") * 10000, 0)) > lit(1e-6))
      .count()
    assert(offGrid === 0L, "amount_change values must have at most 4 decimals")
  }

  test("NoSQL1: top-1 sector by avg price among MarketCap > 100000 (NOSQL:8-12)") {
    assert(registered)
    val out = CashEquityQueries.nosql1(spark).collect()
    assert(out.length === 1)
    // independent recomputation with plain Spark ops
    val docs = spark.table("securities")
    import org.apache.spark.sql.functions._
    val expected = docs
      .filter(col("MarketData.MarketCap").try_cast("double") > 100000)
      .groupBy(col("StaticData.GICSSector"))
      .agg(avg(col("MarketData.Price").try_cast("double")).as("a"))
      .orderBy(desc("a"), col("GICSSector"))
      .head()
    assert(out.head.getString(0) === expected.getString(0))
    assert(math.abs(out.head.getDouble(1) - expected.getDouble(1)) < 1e-9)
    // 11 sectors exist before the $limit (RDME:182 analogue)
    val nSectors = docs.filter(col("MarketData.MarketCap").try_cast("double") > 100000)
      .select("StaticData.GICSSector").distinct().count()
    assert(nSectors === 11)
  }

  test("NoSQL2: per-sector pick beats all three averages and has min Beta (NOSQL:28-51)") {
    assert(registered)
    import org.apache.spark.sql.functions._
    val out = CashEquityQueries.nosql2(spark)
      .collect().map(r => (r.getString(0), Option(r.getString(1)), Option(r.get(2)))).toSeq
    assert(out.map(_._1).distinct.length === 11, "one row per sector")

    // independent check: for each sector, recompute averages and the
    // qualifying set with vanilla Spark, assert the pick is its beta-argmin
    val docs = spark.table("securities")
    val clean = Seq("MarketData.MarketCap", "MarketData.Beta",
      "FinancialRatios.DividendYield", "FinancialRatios.PERatio")
      .foldLeft(docs)((d, f) => d.filter(col(f).isNotNull && col(f) =!= "NA"))
      .select(col("Symbol"), col("StaticData.GICSSector").as("sector"),
        col("MarketData.MarketCap").cast("double").as("mcap"),
        col("MarketData.Beta").cast("double").as("beta"),
        col("FinancialRatios.PERatio").cast("double").as("pe"),
        col("FinancialRatios.DividendYield").cast("double").as("dy"))
      .collect()
    val bySector = clean.groupBy(_.getString(1))
    out.foreach { case (sector, symbolOpt, betaOpt) =>
      val rows = bySector.getOrElse(sector, Array())
      val (avgM, avgP, avgD) = (
        rows.map(_.getDouble(2)).sum / rows.length,
        rows.map(_.getDouble(4)).sum / rows.length,
        rows.map(_.getDouble(5)).sum / rows.length)
      val qual = rows.filter(r =>
        r.getDouble(2) > avgM && r.getDouble(4) > avgP && r.getDouble(5) > avgD)
      if (qual.isEmpty) {
        assert(symbolOpt.isEmpty, s"sector $sector should have no pick")
      } else {
        val best = qual.minBy(r => (r.getDouble(3), r.getString(0)))
        assert(symbolOpt.contains(best.getString(0)), s"sector $sector pick")
        assert(betaOpt.map(_.asInstanceOf[Double]).contains(best.getDouble(3)))
      }
    }
  }

  test("typed Dataset model binds to the fixtures and agrees with the SQL form") {
    assert(registered)
    import graft.cashequity.Model
    import spark.implicits._
    // typed computation of SQL1's inner CTE: avg daily return for
    // (Energy, US) via case-class methods, vs the SQL value
    val typed = Model.statics(spark)
      .filter(s => s.country == "US" && s.gics_sector == "Energy")
      .joinWith(Model.prices(spark), $"symbol" === $"symbol_id", "inner")
      .map { case (_, p) => p.dailyReturnPct }
    val typedAvg = typed.reduce(_ + _) / typed.count()
    val sqlAvg = spark.sql(
      """SELECT avg(((close_price - open_price) / open_price) * 100)
        |FROM equity_static LEFT JOIN equity_prices ON symbol = symbol_id
        |WHERE country = 'US' AND gics_sector = 'Energy'""".stripMargin)
      .head().getDouble(0)
    assert(math.abs(typedAvg - sqlAvg) < 1e-9)
  }

  test("S1: catalog namespace — CREATE DATABASE cash_equity + USE resolves bare names") {
    assert(registered)
    import org.apache.spark.sql.functions._
    spark.sql("CREATE DATABASE IF NOT EXISTS cash_equity")
    try {
      Fixtures.equityStatic(spark).write.mode("overwrite")
        .saveAsTable("cash_equity.equity_static_t")
      // qualified access
      assert(spark.table("cash_equity.equity_static_t").count() === 22)
      // search_path analogue (SQL:7): USE, then bare-name resolution
      spark.sql("USE cash_equity")
      try {
        val n = spark.sql("SELECT count(*) AS n FROM equity_static_t").head().getLong(0)
        assert(n === 22)
      } finally spark.sql("USE default")
    } finally {
      spark.sql("DROP TABLE IF EXISTS cash_equity.equity_static_t")
      spark.sql("DROP DATABASE IF EXISTS cash_equity")
    }
  }

  test("fixture dirt: securities numerics contain NA and null (NOSQL:29-33)") {
    assert(registered)
    import org.apache.spark.sql.functions._
    val docs = spark.table("securities")
    val nNa = docs.filter(col("MarketData.MarketCap") === "NA").count()
    val nNull = docs.filter(col("MarketData.MarketCap").isNull).count()
    assert(nNa > 0 && nNull > 0)
  }
}
