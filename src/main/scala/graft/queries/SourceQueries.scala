package graft.queries

import graft.QueryDef
import graft.cashequity.{CashEquityQueries, Fixtures}
import graft.ops.RelationalOps
import graft.sources.{DocumentSource, Tables}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Gate queries exercising the SOURCE layer end to end — proving the
  * schema-first dirty-JSON collection scan (SURVEY §2 S3) against the
  * DuckDB oracle rather than only against ScalaTests.
  *
  * `q_src_json` round-trips the deterministic securities fixtures
  * through newline-delimited JSON on disk: write (with two
  * deliberately malformed lines injected), re-read via
  * [[DocumentSource.securitiesJson]] (explicit schema, PERMISSIVE,
  * corrupt-record column), then aggregate per sector with
  * cast-with-null numeric cleaning. The oracle re-derives the same
  * fixture arithmetic in SQL and appends the corrupt-line group —
  * so schema application, null propagation for absent fields, dirty
  * numeric handling AND corrupt-line capture are all value-checked.
  */
object SourceQueries {

  private val corruptLines = Seq("{\"Symbol\": not-json", "[1, 2")

  def defs: Seq[QueryDef] = Seq(
    QueryDef("q_src_json", (s, _) => {
      val dir = java.nio.file.Files.createTempDirectory("graft_json_").toString
      val json = Fixtures.securities(s).select(to_json(struct(
        col("Symbol"), col("StaticData"), col("MarketData"), col("FinancialRatios"))).as("value"))
      import s.implicits._
      json.unionAll(corruptLines.toDF("value"))
        .coalesce(1).write.mode("overwrite").text(dir)
      DocumentSource.securitiesJson(s, dir)
        .groupBy(col("StaticData.GICSSector").as("_id"))
        .agg(count(lit(1)).as("n_docs"),
          round(avg(RelationalOps.numericOrNull(col("FinancialRatios.PERatio"))), 4)
            .as("avg_pe"),
          count(col("_corrupt_record")).as("n_corrupt"))
        .orderBy("_id")
    },
      // same securities re-derivation as the cw_nosql oracles, plus
      // the corrupt-line group (GICSSector null, only _corrupt_record
      // populated on the Spark side)
      Some("""
        WITH securities_n AS (
          SELECT range AS id,
            (['Communication Services', 'Consumer Discretionary', 'Consumer Staples',
              'Energy', 'Financials', 'Health Care', 'Industrials', 'Materials',
              'Real Estate', 'Utilities', 'Information Technology'])[(range % 11)::INT + 1]
              AS sector,
            CASE WHEN range % 53 = 3 OR range % 59 = 7 THEN NULL
                 ELSE 5.0::DOUBLE + ((range * 11) % 400) / 10.0::DOUBLE END AS pe
          FROM range(505))
        SELECT sector AS _id, count(*) AS n_docs,
               round(avg(pe), 4) AS avg_pe, 0::BIGINT AS n_corrupt
        FROM securities_n GROUP BY sector
        UNION ALL
        SELECT NULL, 2::BIGINT, NULL::DOUBLE, 2::BIGINT
        ORDER BY _id""")),

    // Typed CSV round-trip: the deterministic equity-prices fixture is
    // written as headered CSV and re-read through the schema-first CSV
    // reader (dates and doubles round-trip through text), then
    // aggregated with order-independent measures only — open_price
    // sums are exact (integer-valued doubles) and min/max need no
    // ordering, so the value compare is airtight
    QueryDef("q_src_csv", (s, _) => {
      val dir = java.nio.file.Files.createTempDirectory("graft_csv_").toString
      Fixtures.equityPrices(s)
        .write.mode("overwrite").option("header", "true").csv(dir)
      val schema = StructType(Seq(
        StructField("symbol_id", StringType), StructField("cob_date", DateType),
        StructField("open_price", DoubleType), StructField("close_price", DoubleType),
        StructField("currency", StringType), StructField("volume", LongType)))
      DocumentSource.csv(s, dir, schema)
        .groupBy("currency")
        .agg(count(lit(1)).as("n_rows"),
          round(sum("open_price"), 4).as("sum_open"),
          round(min("close_price"), 6).as("min_close"),
          round(max("close_price"), 6).as("max_close"))
        .orderBy("currency")
    },
      Some(s"""
        WITH ${CashEquityQueries.equityFixtureSql}
        SELECT currency, count(*) AS n_rows,
               round(sum(open_price), 4) AS sum_open,
               round(min(close_price), 6) AS min_close,
               round(max(close_price), 6) AS max_close
        FROM equity_prices
        GROUP BY currency ORDER BY currency""")),

    // ORC round-trip: the columnar non-parquet format Spark ships
    // natively. documents → ORC → re-read → per-language token stats;
    // values must survive the format change bit-for-bit, so the
    // oracle runs on the ORIGINAL parquet — any ORC encode/decode
    // drift fails the hash
    QueryDef("q_src_orc", (s, d) => {
      val dir = java.nio.file.Files.createTempDirectory("graft_orc_").toString
      Tables(s, d).table("documents").write.mode("overwrite").orc(dir)
      s.read.orc(dir)
        .groupBy("lang")
        .agg(count(lit(1)).as("n_docs"),
          sum(length(col("text")).cast("long")).as("total_chars"),
          min("doc_id").as("min_id"), max("doc_id").as("max_id"))
        .orderBy("lang")
    },
      Some("""SELECT lang, count(*) AS n_docs,
             |  CAST(sum(length(text)) AS BIGINT) AS total_chars,
             |  min(doc_id) AS min_id, max(doc_id) AS max_id
             |FROM documents GROUP BY lang ORDER BY lang""".stripMargin)),

    // binaryFile ingestion: a media directory (6 real PNGs written by
    // the JDK's ImageIO — an INDEPENDENT encoder) read as one row per
    // file and parsed by the Multimodal header battery. Only the
    // header-derived fields are compared (encoder byte output is not
    // portable, parsed geometry is); the oracle re-derives the
    // closed-form sizes (w = 16·i, h = 9·i). The file write is
    // bounded fixture synthesis (6 files, driver-side), same contract
    // as q_src_csv's fixture dump.
    QueryDef("q_src_binary", (s, _) => {
      val dir = java.nio.file.Files.createTempDirectory("graft_bin_").toFile
      (1 to 6).foreach { i =>
        javax.imageio.ImageIO.write(
          new java.awt.image.BufferedImage(16 * i, 9 * i,
            java.awt.image.BufferedImage.TYPE_INT_ARGB),
          "png", new java.io.File(dir, s"img_$i.png"))
      }
      DocumentSource.binaryFiles(s, dir.getAbsolutePath, glob = Some("*.png"))
        .select(
          graft.ext.Multimodal.pngValid(col("content")).as("ok"),
          graft.ext.Multimodal.pngWidth(col("content")).as("w"),
          graft.ext.Multimodal.pngHeight(col("content")).as("h"))
        .orderBy("w")
    },
      Some("""SELECT true AS ok, 16 * i AS w, 9 * i AS h
             |FROM range(1, 7) r(i) ORDER BY w""".stripMargin)),

    // Small-file compaction: documents deliberately shattered into 64
    // kilobyte files (the debris an incremental writer leaves), then
    // [[graft.ext.Layout.compact]] rewrites toward a byte target
    // derived from the ACTUAL on-disk size. The gate reads the
    // compacted directory back and value-checks content preservation
    // against the ORIGINAL table — any row lost, duplicated, or
    // mangled in the rewrite fails the hash. LayoutSpec asserts the
    // file-count arithmetic itself.
    QueryDef("q_src_compact", (s, d) => {
      val scratch = graft.Scratch.tempDir("graft_compact_")
      Tables(s, d).table("documents").repartition(64)
        .write.mode("overwrite").parquet(s"$scratch/small")
      graft.ext.Layout.compact(s, s"$scratch/small", s"$scratch/big",
        targetBytes = 1L << 20)
      s.read.parquet(s"$scratch/big")
        .groupBy("lang")
        .agg(count(lit(1)).as("n_docs"),
          countDistinct(col("doc_id")).as("n_distinct"),
          sum(col("n_chars")).as("sum_chars"),
          md5(array_join(transform(sort_array(collect_list(col("doc_id"))),
            _.cast("string")), ",")).as("ids_md5"))
        .orderBy("lang")
    },
      Some("""SELECT lang, count(*) AS n_docs,
             |  count(DISTINCT doc_id) AS n_distinct,
             |  CAST(sum(n_chars) AS BIGINT) AS sum_chars,
             |  md5(array_to_string(list(doc_id ORDER BY doc_id), ',')) AS ids_md5
             |FROM documents GROUP BY lang ORDER BY lang""".stripMargin)),

    // Schema-drift-tolerant union ([[graft.ops.RelationalOps
    // .unionTolerant]]): three "feed generations" of orders — an old
    // slice with a narrow INT custkey, a middle slice that dropped
    // the column, a new slice that added a priority column — read
    // back as ONE frame with typed NULLs and int→long widening. The
    // census (counts, null counts, widened sum) hash-checks against
    // DuckDB's native UNION ALL BY NAME, which implements the same
    // drift semantics.
    QueryDef("q_src_union_drift", (s, d) => {
      val o = Tables(s, d).table("orders")
      val oldGen = o.filter(col("o_orderkey") % 3 === 0)
        .select(col("o_orderkey"), col("o_custkey").cast("int").as("o_custkey"),
          col("o_totalprice"))
      val midGen = o.filter(col("o_orderkey") % 3 === 1)
        .select(col("o_orderkey"), col("o_totalprice"))
      val newGen = o.filter(col("o_orderkey") % 3 === 2)
        .select(col("o_orderkey"), col("o_custkey"),
          col("o_totalprice"), col("o_orderpriority"))
      graft.ops.RelationalOps.unionTolerant(Seq(oldGen, midGen, newGen))
        .agg(count(lit(1)).as("n"),
          count(col("o_custkey")).as("n_custkey"),
          count(col("o_orderpriority")).as("n_priority"),
          sum(col("o_custkey")).as("sum_custkey"),
          round(sum(col("o_totalprice")), 2).as("sum_price"))
    },
      Some("""WITH u AS (
             |  SELECT o_orderkey, CAST(o_custkey AS INT) AS o_custkey, o_totalprice
             |  FROM orders WHERE o_orderkey % 3 = 0
             |  UNION ALL BY NAME
             |  SELECT o_orderkey, o_totalprice FROM orders WHERE o_orderkey % 3 = 1
             |  UNION ALL BY NAME
             |  SELECT o_orderkey, o_custkey, o_totalprice, o_orderpriority
             |  FROM orders WHERE o_orderkey % 3 = 2)
             |SELECT count(*) AS n,
             |  count(o_custkey) AS n_custkey,
             |  count(o_orderpriority) AS n_priority,
             |  CAST(sum(o_custkey) AS BIGINT) AS sum_custkey,
             |  round(sum(o_totalprice), 2) AS sum_price
             |FROM u""".stripMargin)),
  )
}
