package graft

import org.scalatest.funsuite.AnyFunSuite

/** The oracle-less (rows-only) gate queries have no DuckDB twin, so
  * their only external check is rows>0 — here we pin down the rest:
  * two executions must produce byte-identical row multisets (catches
  * nondeterminism that the hash gate can't see). */
class DeterminismSpec extends AnyFunSuite with SharedSpark {

  private lazy val rowsOnly: Seq[String] =
    QueryDef.all.filter(_.oracle.isEmpty).map(_.name)

  test("every rows-only query is deterministic across repeated runs") {
    assert(rowsOnly.nonEmpty)
    rowsOnly.foreach { name =>
      val fn = SparkEntry.queries(name)
      val a = fn(spark, sf0001).collect().map(_.toString).sorted.toSeq
      val b = fn(spark, sf0001).collect().map(_.toString).sorted.toSeq
      assert(a === b, s"$name differs across runs")
      assert(a.nonEmpty, s"$name returned no rows at sf0.001")
    }
  }
}
