package graft

import org.scalatest.funsuite.AnyFunSuite

/** Smoke: the driver contract — entry() returns rows, and every
  * registered query runs at sf0.001 and matches its declared oracle
  * column names (the driver hash-compares by sorted column name). */
class EntrySmokeSpec extends AnyFunSuite with SharedSpark {

  test("entry() returns rows") {
    assert(SparkEntry.entry(spark).count() > 0)
  }

  test("every query runs at sf0.001 and yields a schema") {
    SparkEntry.queries.foreach { case (name, fn) =>
      val df = fn(spark, sf0001)
      assert(df.schema.fields.nonEmpty, s"$name has empty schema")
      df.count() // forces full execution
    }
  }

  test("oracleSql keys are a subset of queries") {
    assert(SparkEntry.oracleSql.keySet.subsetOf(SparkEntry.queries.keySet))
  }
}
