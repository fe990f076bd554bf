package graft

import graft.ext.{Curation, Dedup}
import org.scalatest.funsuite.AnyFunSuite

/** The two near-dup policies must actually differ where transitivity
  * bites: an A~B~C chain whose BRIDGE document carries the highest id.
  * The pairwise loser-drop only removes `d2` of qualifying pairs —
  * here the bridge both times — so both chain ENDS survive even
  * though they are transitive near-duplicates of each other; the
  * connected-component policy keeps exactly one representative.
  */
class CurationPolicySpec extends AnyFunSuite with SharedSpark {

  /** Sliding 40-token segments of one global sequence; every 8th
    * token is an English marker so langId passes the curation filter
    * without disturbing the shingle-overlap structure. */
  private def seg(a: Int, b: Int): String =
    (a to b).map(i => if (i % 8 == 0) "the" else s"w$i").mkString(" ")

  private lazy val docs = {
    import spark.implicits._
    Seq(
      (1L, seg(1, 40)),   // A — chain end, lowest id
      (2L, seg(17, 56)),  // C — chain end: J(A,C) ~0.39, below the 0.6 gate
      (3L, seg(9, 48))    // B — the bridge: J(A,B) = J(B,C) ~0.64, HIGHEST id
    ).toDF("doc_id", "text")
  }

  test("fixture: exactly the two bridge pairs qualify") {
    val pairs = Dedup.jaccardPairs(docs, "doc_id", "text", n = 5, threshold = 0.6)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(pairs === Set((1L, 3L), (2L, 3L)), pairs.toString)
  }

  test("pairwise loser-drop keeps both chain ends; transitive collapse keeps one") {
    val pairwise = Curation.curatedDocs(docs)
      .select("doc_id").collect().map(_.getLong(0)).toSet
    assert(pairwise === Set(1L, 2L),
      s"pairwise policy drops only the bridge (d2 of both pairs), got $pairwise")
    val transitive = Curation.curatedDocsTransitive(docs)
      .select("doc_id").collect().map(_.getLong(0)).toSet
    assert(transitive === Set(1L),
      s"transitive policy keeps one representative per component, got $transitive")
  }
}
