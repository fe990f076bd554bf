package graft.sources

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.connector.catalog.{Table, TableProvider}
import org.apache.spark.sql.connector.expressions.Transform
import org.apache.spark.sql.sources.DataSourceRegister
import org.apache.spark.sql.types.StructType
import org.apache.spark.sql.util.CaseInsensitiveStringMap

/** The `graft` DataSourceV2 reader — time travel over a
  * generation-tracked [[graft.ext.Layout]] directory reachable from
  * `spark.read` and plain SQL, no Scala API required:
  *
  * {{{
  *   spark.read.format("graft").load(dir)                          // live manifest
  *   spark.read.format("graft").option("versionAsOf", "2").load(dir)
  *   spark.read.format("graft").option("timestampAsOf", "2026-01-01 00:00:00").load(dir)
  *   spark.sql("CREATE TEMPORARY VIEW t USING graft " +
  *     "OPTIONS (path '...', versionAsOf '2')")                    // SQL-first surface
  * }}}
  *
  * A THIN shell over the existing resolution — no second
  * implementation of snapshot semantics: the generation comes from
  * [[graft.ext.Layout.generationAsOf]] (timestamp) or the live
  * counter, the file list from the SAME manifest-resolution path
  * `readSnapshot` uses ([[graft.ext.Layout.snapshotFileAnchors]]:
  * each file live-or-retired at planning time), and the scan is
  * Spark's own V2 parquet table over exactly those files — so
  * predicate pushdown, column pruning, and vectorized reads all apply
  * unchanged. Registered via `META-INF/services`, hence
  * `format("graft")` by short name.
  *
  * Reads with ZERO options serve the CURRENT manifest's file list —
  * a manifest-covered read (out-of-band debris files are invisible,
  * matching [[graft.ext.Layout.readLayout]]), which is already a
  * different contract from `spark.read.parquet(dir)`.
  *
  * One documented boundary: a HIVE-PARTITIONED snapshot whose files
  * resolve under MORE THAN ONE anchor (some live, some under a
  * retirement label) cannot be one V2 relation — partition columns
  * re-derive from a single `basePath`, and those files anchor at
  * different roots. That read is refused loudly with the recovery
  * named (`Layout.readSnapshot`, which unions per-anchor reads);
  * single-anchor partitioned snapshots (the live generation, or a
  * snapshot whose churn is fully retired under one label) work.
  *
  * Snapshot resolution happens at table-creation time (the same
  * moment `readSnapshot` resolves), so a cached DataFrame keeps
  * serving its resolved file list; re-run `load()` to re-resolve.
  * Timestamps accept epoch millis or `yyyy-MM-dd HH:mm:ss[.f]`. */
class GraftSource extends TableProvider with DataSourceRegister {
  import org.apache.spark.sql.execution.datasources.parquet.ParquetFileFormat
  import org.apache.spark.sql.execution.datasources.v2.parquet.ParquetTable

  override def shortName(): String = "graft"

  override def supportsExternalMetadata(): Boolean = false

  private def parseTs(t: String): Long =
    try t.toLong catch {
      case _: NumberFormatException =>
        try java.sql.Timestamp.valueOf(t).getTime catch {
          case _: IllegalArgumentException =>
            throw new IllegalArgumentException(
              s"timestampAsOf must be epoch millis or " +
                s"'yyyy-MM-dd HH:mm:ss[.f]', got '$t'")
        }
    }

  private def tableOf(options: CaseInsensitiveStringMap): Table = {
    val dir = options.get("path")
    require(dir != null && dir.nonEmpty,
      "the graft reader needs a layout path: " +
        "spark.read.format(\"graft\").load(dir), or OPTIONS (path '...')")
    val spark = SparkSession.active
    val version = Option(options.get("versionAsOf"))
    val tstamp = Option(options.get("timestampAsOf"))
    require(version.isEmpty || tstamp.isEmpty,
      "pass versionAsOf OR timestampAsOf, not both")
    val gen = version
      .map(v => try v.toLong catch {
        case _: NumberFormatException => throw new IllegalArgumentException(
          s"versionAsOf must be a generation number, got '$v'")
      })
      .orElse(tstamp.map(t =>
        graft.ext.Layout.generationAsOf(spark, dir, parseTs(t))))
      .getOrElse(graft.ext.Layout.currentGeneration(spark, dir))
    val pairs = graft.ext.Layout.snapshotFileAnchors(spark, dir, gen)
    val stored = graft.ext.Layout.storedSchemaOf(spark, dir)
    require(pairs.nonEmpty || stored.nonEmpty,
      s"generation $gen of $dir holds no files and the layout has no " +
        "schema sidecar to shape an empty relation with — " +
        "Layout.readSnapshot handles this case")
    val passthrough = new java.util.HashMap[String, String]()
    options.entrySet().forEach { e =>
      val k = e.getKey.toLowerCase(java.util.Locale.ROOT)
      if (k != "path" && k != "versionasof" && k != "timestampasof")
        passthrough.put(e.getKey, e.getValue)
    }
    if (graft.ext.Layout.isHivePartitioned(spark, dir)) {
      // partition columns re-derive from ONE basePath; live and
      // retired files anchor at different roots, so a mixed snapshot
      // is not expressible as a single V2 relation
      val anchors = pairs.map(_._1).distinct
      require(anchors.size <= 1,
        s"generation $gen of the partitioned layout $dir spans " +
          s"${anchors.size} anchors (live + retirement labels) — one " +
          "V2 relation cannot re-derive partition columns across " +
          "them; read it with Layout.readSnapshot instead")
      anchors.headOption.foreach(passthrough.put("basePath", _))
    }
    ParquetTable(s"graft $dir gen=$gen", spark,
      new CaseInsensitiveStringMap(passthrough),
      pairs.map(_._2).toIndexedSeq, stored, classOf[ParquetFileFormat])
  }

  override def inferSchema(options: CaseInsensitiveStringMap): StructType =
    tableOf(options).schema()

  override def getTable(schema: StructType, partitioning: Array[Transform],
                        properties: java.util.Map[String, String]): Table =
    tableOf(new CaseInsensitiveStringMap(properties))
}
