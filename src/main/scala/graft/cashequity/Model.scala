package graft.cashequity

import org.apache.spark.sql.{Dataset, SparkSession}

/** Typed model of the cash_equity schema (SURVEY §1.3: `Dataset[T]`
  * layered over the DataFrames where compile-time field checks help;
  * `DataFrame` stays the lingua franca for dynamic-schema paths).
  * Field names match the reference columns (RDME:28-36) so `.as[T]`
  * binds by name with no mapping layer. */
object Model {

  case class EquityPrice(symbol_id: String, cob_date: java.sql.Date,
                         open_price: Double, close_price: Double,
                         currency: String, volume: Long) {
    /** Daily return in percent (SQL:12). */
    def dailyReturnPct: Double = (close_price - open_price) / open_price * 100.0
  }

  case class EquityStatic(symbol: String, security_name: String, gics_sector: String,
                          gics_industry: String, country: String, region: String)

  case class PortfolioPosition(trader: String, symbol: String, net_quantity: Double,
                               net_amount: Double, position_date: java.sql.Date)

  case class TraderStatic(trader_id: String, trader_name: String, fund_name: String,
                          fund_focus: String, fund_type: String, desk: String,
                          city: String, email: String, start_date: java.sql.Date,
                          status: String)

  def prices(spark: SparkSession): Dataset[EquityPrice] = {
    import spark.implicits._
    spark.table("equity_prices").as[EquityPrice]
  }
  def statics(spark: SparkSession): Dataset[EquityStatic] = {
    import spark.implicits._
    spark.table("equity_static").as[EquityStatic]
  }
  def positions(spark: SparkSession): Dataset[PortfolioPosition] = {
    import spark.implicits._
    spark.table("portfolio_positions").as[PortfolioPosition]
  }
  def traders(spark: SparkSession): Dataset[TraderStatic] = {
    import spark.implicits._
    spark.table("trader_static").as[TraderStatic]
  }
}
