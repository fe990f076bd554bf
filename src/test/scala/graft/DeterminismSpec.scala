package graft

import org.scalatest.funsuite.AnyFunSuite

/** Oracle-less (rows-only) gate queries would have no external value
  * check beyond rows>0, so any that exist must at least be
  * byte-deterministic across repeated runs (catches nondeterminism
  * the hash gate can't see). As of round 4 every gate entry carries
  * a full DuckDB oracle, so the set is empty and this suite is a
  * tripwire: it re-engages automatically if a future rows-only
  * entry appears.
  */
class DeterminismSpec extends AnyFunSuite with SharedSpark {

  private lazy val rowsOnly: Seq[String] =
    QueryDef.all.filter(_.oracle.isEmpty).map(_.name)

  test("every rows-only query (if any) is deterministic across repeated runs") {
    rowsOnly.foreach { name =>
      val fn = SparkEntry.queries(name)
      val a = fn(spark, sf0001).collect().map(_.toString).sorted.toSeq
      val b = fn(spark, sf0001).collect().map(_.toString).sorted.toSeq
      assert(a === b, s"$name differs across runs")
      assert(a.nonEmpty, s"$name returned no rows at sf0.001")
    }
  }

  test("full oracle coverage: every gate entry has a DuckDB twin") {
    assert(rowsOnly.isEmpty,
      s"new rows-only entries need a determinism check AND a justification: $rowsOnly")
  }
}
