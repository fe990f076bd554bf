package graft
import org.apache.spark.sql.SparkSession
import java.nio.file.{Files, Paths}
/** Driver-run correctness dump: each SparkEntry.queries result → parquet,
  * plus oracle_sql.json, for the driver's DuckDB compare.
  *
  * A query that throws must surface as a structured failure, not a
  * silent absence: its exception lands in `_errors.json` (name →
  * message) AND in an `_ERROR.txt` marker inside the query's (empty)
  * result directory, so both the driver and a human diffing the out
  * dir see the failure. (Round 8 proved stderr-only reporting is
  * unauditable: four crashed queries just vanished from the artifact.)
  */
object Verify {
  /** JSON string escape: backslash, quote, and ALL control chars
    * (<0x20) — a tab or CR in builder-authored SQL (or an exception
    * message) would otherwise make the driver's json.load fail and
    * silently zero the round's correctness. */
  def jsonStr(s: String): String = "\"" + s.flatMap {
    case '"'  => "\\\""
    case '\\' => "\\\\"
    case '\n' => "\\n"
    case '\r' => "\\r"
    case '\t' => "\\t"
    case c if c < ' ' => f"\\u${c.toInt}%04x"
    case c => c.toString
  } + "\""

  /** Run every kept query, writing results (or error markers) under
    * outDir; returns name → error message for queries that threw.
    * Factored out of main so a spec can drive it with a broken query. */
  def runQueries(spark: SparkSession, sfDir: String, outDir: String,
                 queries: Map[String, (SparkSession, String) => org.apache.spark.sql.DataFrame],
                 keep: String => Boolean = _ => true): Map[String, String] = {
    new java.io.File(outDir).mkdirs()
    val errors = scala.collection.mutable.LinkedHashMap.empty[String, String]
    queries.foreach { case (name, fn) =>
      if (keep(name)) {
        try fn(spark, sfDir).coalesce(1).write.mode("overwrite")
          .parquet(s"$outDir/$name")
        catch { case e: Throwable =>
          val msg = s"${e.getClass.getName}: ${Option(e.getMessage).getOrElse("")}".take(2000)
          System.err.println(s"[verify] $name failed: $msg")
          errors(name) = msg
          val dir = new java.io.File(s"$outDir/$name")
          dir.mkdirs()
          Files.writeString(Paths.get(s"$outDir/$name/_ERROR.txt"), msg)
        }
      }
    }
    val errJson = errors
      .map { case (k, v) => s"${jsonStr(k)}: ${jsonStr(v)}" }.mkString("{", ",", "}")
    Files.writeString(Paths.get(s"$outDir/_errors.json"), errJson)
    errors.toMap
  }

  def main(args: Array[String]): Unit = {
    val Array(sfDir, outDir) = args
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "4")
    // dev affordance: SPARK_GRAFT_ONLY=q_a,q_b runs (and dumps oracle
    // SQL for) just those queries — fast iteration on a single parity
    val only = sys.env.get("SPARK_GRAFT_ONLY")
      .map(_.split(",").map(_.trim).toSet)
    def keep(name: String): Boolean = only.forall(_.contains(name))
    val spark = GraftSession.tuned(
      SparkSession.builder().master(s"local[$cpus]"),
      shufflePartitions = cpus.toInt).getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val errors = runQueries(spark, sfDir, outDir, SparkEntry.queries, keep)
    val json = SparkEntry.oracleSql.filter(kv => keep(kv._1))
      .map { case (k, v) => s"${jsonStr(k)}: ${jsonStr(v)}" }.mkString("{", ",", "}")
    Files.writeString(Paths.get(s"$outDir/oracle_sql.json"), json)
    if (errors.nonEmpty)
      System.err.println(s"[verify] ${errors.size} queries FAILED: ${errors.keys.mkString(", ")}")
    spark.stop()
  }
}
