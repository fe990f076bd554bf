package graft

import graft.ext.Dedup
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Incremental (delta-vs-store) dedup: semantic equivalence with the
  * full-corpus pair operator across the delta↔store cut, on an
  * engineered corpus with planted near-duplicates, plus the plan
  * property the operator exists for — the store side is a narrow
  * (id, sig) scan and only the delta is ever shingled.
  */
class IncrementalDedupSpec extends AnyFunSuite with SharedSpark {

  private val words =
    "alpha bravo charlie delta echo foxtrot golf hotel india juliet kilo lima mike november oscar papa quebec romeo sierra tango".split(" ")

  /** Deterministic 80-token document from a seed (hash-mixed word
    * choice — a linear formula here makes every doc a rotation of one
    * cyclic sequence and the whole corpus mutually near-duplicate). */
  private def doc(seed: Int): String =
    (0 until 80).map { i =>
      val h = scala.util.hashing.MurmurHash3.productHash((seed, i))
      words(math.floorMod(h, words.length))
    }.mkString(" ")

  /** Near-duplicate: same token stream with one word changed
    * (true 5-gram Jaccard ~0.88 — well clear of the 0.7 gate even
    * under 32-hash MinHash estimation noise). */
  private def nearDup(seed: Int): String = {
    val t = doc(seed).split(" "); t(40) = "zulu"; t.mkString(" ")
  }

  private lazy val fixture = {
    import spark.implicits._
    // store: ids 0-19, 20 distinct documents
    val store = (0 until 20).map(i => (i.toLong, doc(i)))
    // delta: ids 100-109 — 5 near-dups of store docs 0-4, 5 novel docs
    val delta = (0 until 5).map(i => (100L + i, nearDup(i))) ++
      (5 until 10).map(i => (100L + i, doc(50 + i)))
    (store.toDF("doc_id", "text"), delta.toDF("doc_id", "text"))
  }

  test("incremental == full-corpus minhashLshPairs restricted to the delta-store cut") {
    val (storeDocs, deltaDocs) = fixture
    val store = Dedup.minhashSignatures(storeDocs, "doc_id", "text",
      shingleLen = 5, numHashes = 32)
    val inc = Dedup.incremental(deltaDocs, store, "doc_id", "text")
    val got = inc.filter(col("status") === "dup")
      .select("d_new", "d_old", "est_jaccard").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSet
    // reference: run the batch pair operator over the UNION and keep
    // only cross-cut pairs (delta ids are all > store ids, so d2 is
    // always the delta side)
    val full = Dedup.minhashLshPairs(storeDocs.unionAll(deltaDocs), "doc_id", "text")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2)))
      .filter { case (d1, d2, _) => d1 < 100L && d2 >= 100L }
      .map { case (d1, d2, j) => (d2, d1, j) }.toSet
    assert(got === full)
    // the 5 planted near-dups are found against their originals
    (0 until 5).foreach { i =>
      assert(got.exists { case (dn, dol, _) => dn == 100L + i && dol == i.toLong },
        s"planted near-dup 10${i} not matched")
    }
    // every delta doc appears exactly once unless it matched
    val statuses = inc.groupBy("d_new").agg(count(lit(1)).as("n"),
      max(col("status")).as("st")).collect()
      .map(r => r.getLong(0) -> (r.getLong(1), r.getString(2))).toMap
    assert(statuses.size === 10)
    (5 until 10).foreach { i =>
      assert(statuses(100L + i) === (1L, "new"), s"novel doc 10$i should be 'new'")
    }
  }

  test("store side is never re-shingled: exactly one shingle subtree in the plan") {
    val (storeDocs, deltaDocs) = fixture
    val dir = Scratch.tempDir("graft_inc_spec_")
    Dedup.minhashSignatures(storeDocs, "doc_id", "text",
      shingleLen = 5, numHashes = 32)
      .write.mode("overwrite").parquet(s"$dir/sigstore")
    val store = spark.read.parquet(s"$dir/sigstore")
    val inc = Dedup.incremental(deltaDocs, store, "doc_id", "text")
    val plan = inc.queryExecution.optimizedPlan.toString
    val shingleCount = "wordshingles".r.findAllIn(plan).size
    assert(shingleCount === 1,
      s"expected exactly 1 shingle subtree (delta only), found $shingleCount:\n$plan")
    assert(plan.contains("parquet"), s"store side should be a parquet scan:\n$plan")
  }
}
