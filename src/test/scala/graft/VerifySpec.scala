package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.scalatest.funsuite.AnyFunSuite
import java.nio.file.{Files, Paths}

/** The correctness-dump contract: a query that throws must surface as
  * a structured error in the artifact (`_errors.json` + an
  * `_ERROR.txt` marker), never as a silent absence. Round 8's driver
  * re-encode proved the stderr-only path is unauditable — four
  * crashed queries simply vanished from the correctness artifact. */
class VerifySpec extends AnyFunSuite with SharedSpark {

  test("a throwing query lands in _errors.json and leaves an _ERROR.txt marker") {
    val out = Files.createTempDirectory("graft-verify").toFile.getAbsolutePath
    val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
      "q_good" -> ((s, d) => graft.sources.Tables(s, d).table("region")),
      "q_broken" -> ((s, _) => {
        import s.implicits._
        // analysis-time failure, the same class as the r8 NTZ break
        Seq(1).toDF("x").selectExpr("unix_micros(x)")
      }))
    val errors = Verify.runQueries(spark, sf0001, out, queries)

    assert(errors.keySet === Set("q_broken"))
    assert(errors("q_broken").nonEmpty)
    // good query still wrote parquet
    assert(spark.read.parquet(s"$out/q_good").count() === 5)
    // broken query: marker file, no parquet
    assert(Files.exists(Paths.get(s"$out/q_broken/_ERROR.txt")))
    assert(!new java.io.File(s"$out/q_broken").listFiles()
      .exists(_.getName.endsWith(".parquet")))
    // _errors.json is valid JSON-shaped and names the query + cause
    val errJson = Files.readString(Paths.get(s"$out/_errors.json"))
    assert(errJson.contains("\"q_broken\""))
    assert(errJson.contains("DATATYPE_MISMATCH") || errJson.contains("AnalysisException"))
    assert(!errJson.contains("q_good"))
  }

  test("no failures → _errors.json is an empty object") {
    val out = Files.createTempDirectory("graft-verify-ok").toFile.getAbsolutePath
    val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
      "q_good" -> ((s, d) => graft.sources.Tables(s, d).table("nation")))
    val errors = Verify.runQueries(spark, sf0001, out, queries)
    assert(errors.isEmpty)
    assert(Files.readString(Paths.get(s"$out/_errors.json")) === "{}")
  }
}
