package graft

import graft.ops.RelationalOps
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import org.scalacheck.Gen
import org.scalacheck.rng.Seed

class RelationalOpsSpec extends AnyFunSuite with SharedSpark {

  private lazy val people = {
    import spark.implicits._
    Seq(
      ("a", "US", 10.0), ("b", "US", 20.0), ("c", "FR", 30.0),
      ("d", "FR", 40.0), ("e", "DE", 50.0)
    ).toDF("name", "country", "v")
  }

  test("avgIf ignores non-matching rows via NULL (SQL:19-24 semantics)") {
    val row = people.agg(
      RelationalOps.avgIf(col("country") === "US", col("v")).as("us"),
      RelationalOps.avgIf(col("country") === "UK", col("v")).as("uk")).head()
    assert(row.getDouble(0) === 15.0)
    assert(row.isNullAt(1), "no matching rows → NULL, like SQL avg over empty")
  }

  test("dedupRows equals GROUP BY with bare select list (SURVEY §7.4 Q7)") {
    val dup = people.union(people)
    val viaDedup = RelationalOps.dedupRows(dup, Seq("country")).collect().map(_.getString(0)).sorted
    val viaGroup = dup.groupBy("country").agg(lit(1)).select("country")
      .collect().map(_.getString(0)).sorted
    assert(viaDedup.sameElements(viaGroup))
    // idempotence
    val once = RelationalOps.dedupRows(dup, Seq("name", "country"))
    assert(once.count() === RelationalOps.dedupRows(once, Seq("name", "country")).count())
  }

  test("argminBy is deterministic under ties (SURVEY §7.4 Q3)") {
    import spark.implicits._
    // two rows tie on v; unique tiebreak on name must always pick "a"
    val df = Seq(("a", "g1", 1.0), ("b", "g1", 1.0), ("c", "g2", 5.0))
      .toDF("name", "grp", "v").repartition(8)
    (1 to 5).foreach { _ =>
      val got = RelationalOps.argminBy(df, Seq(col("grp")), Seq(col("v"), col("name")))
        .orderBy("grp").collect().map(_.getString(0)).toSeq
      assert(got === Seq("a", "c"))
    }
  }

  test("topK returns the k smallest/largest with stable tiebreak") {
    val top2 = RelationalOps.topK(people, 2, desc("v"), col("name"))
      .collect().map(_.getString(0)).toSeq
    assert(top2 === Seq("e", "d"))
  }

  test("cleanNumeric drops NA/null rows then casts (NOSQL:29-33)") {
    import spark.implicits._
    val dirty = Seq(("x", "1.5"), ("y", "NA"), ("z", null)).toDF("id", "m")
    val cleaned = RelationalOps.cleanNumeric(dirty, Seq("m"))
    assert(cleaned.collect().map(r => (r.getString(0), r.getDouble(1))).toSeq === Seq(("x", 1.5)))
    assert(cleaned.schema("m").dataType.typeName === "double")
  }

  test("numericOrNull reproduces Mongo $avg skip-non-numeric (SURVEY §7.4 Q2)") {
    import spark.implicits._
    val dirty = Seq("10.0", "NA", null, "20.0").toDF("m")
    val avgVal = dirty.agg(avg(RelationalOps.numericOrNull(col("m")))).head().getDouble(0)
    assert(avgVal === 15.0)
  }

  test("sortedList is order-stable regardless of partitioning") {
    val a = people.repartition(8).groupBy(lit(1)).agg(RelationalOps.sortedList(col("name")))
      .head().getString(1)
    assert(a === "a,b,c,d,e")
  }

  test("property: dedupRows output has no duplicate keys (10 random corpora)") {
    import spark.implicits._
    val gen = Gen.listOfN(50, Gen.chooseNum(0, 5))
    (1 to 10).foreach { i =>
      val xs = gen.apply(Gen.Parameters.default, Seed(42L + i)).get
      val out = RelationalOps.dedupRows(xs.toDF("k"), Seq("k")).collect().map(_.getInt(0))
      assert(out.length === out.distinct.length)
      assert(out.sorted.toSeq === xs.distinct.sorted)
    }
  }

  test("two-phase runningTotal equals the single-partition global window") {
    import spark.implicits._
    import org.apache.spark.sql.expressions.Window
    val rows = (1 to 5000).map(i => (i, (i % 12) + 1, (i * 37 % 100) / 4.0))
      .toDF("seq", "bucket", "v")
    val globalW = Window.orderBy("seq").rowsBetween(Window.unboundedPreceding, 0)
    val expected = rows.withColumn("rt", sum("v").over(globalW))
      .select("seq", "rt").collect().map(r => r.getInt(0) -> r.getDouble(1)).toMap
    // bucket = seq prefix (coarse ranges), a valid sort-order prefix
    val got = RelationalOps.runningTotal(rows,
      bucket = (col("seq") / 500).cast("int"), order = Seq(col("seq")),
      value = col("v"), resultName = "rt")
      .select("seq", "rt").collect().map(r => r.getInt(0) -> r.getDouble(1)).toMap
    expected.foreach { case (k, v) => assert(math.abs(got(k) - v) < 1e-6, s"seq $k") }
  }

  test("saltedJoin returns exactly the rows of the plain join on skewed data") {
    import spark.implicits._
    // 10k rows of one hot key + a tail, joined to a small dim
    val fact = ((1 to 10000).map(i => ("hot", i.toDouble)) ++
      (1 to 100).map(i => (s"k$i", i.toDouble))).toDF("k", "v")
    val dim = (Seq("hot") ++ (1 to 100).map(i => s"k$i")).map(k => (k, s"d_$k")).toDF("k", "d")
    val plain = fact.join(dim, Seq("k")).groupBy("k").agg(count(lit(1)).as("n"), sum("v").as("s"))
      .collect().map(r => (r.getString(0), r.getLong(1), r.getDouble(2))).toSet
    val salted = RelationalOps.saltedJoin(fact, dim, "k", salt = 8)
      .groupBy("k").agg(count(lit(1)).as("n"), sum("v").as("s"))
      .collect().map(r => (r.getString(0), r.getLong(1), r.getDouble(2))).toSet
    assert(salted === plain)
  }

  test("round is HALF_UP away from zero, matching PostgreSQL (SURVEY §7.4 Q1)") {
    import spark.implicits._
    val vals = Seq(0.03125, 2.56495, -0.03125, 572.09249).toDF("v")
      .select(round(col("v"), 4).as("r")).collect().map(_.getDouble(0)).toSeq
    assert(vals === Seq(0.0313, 2.565, -0.0313, 572.0925))
  }

  test("upsert: delta wins collisions, new keys append, others pass through") {
    import spark.implicits._
    val store = Seq((1L, "one-v1"), (2L, "two-v1"), (3L, "three-v1"))
      .toDF("k", "v")
    val delta = Seq((2L, "two-v2"), (4L, "four-v1")).toDF("k", "v")
    val got = RelationalOps.upsert(store, delta, Seq("k"))
      .collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    assert(got === Map(1L -> "one-v1", 2L -> "two-v2",
      3L -> "three-v1", 4L -> "four-v1"))
    // empty delta is the identity; empty store is the delta
    assert(RelationalOps.upsert(store, delta.filter(lit(false)), Seq("k")).count() === 3)
    assert(RelationalOps.upsert(store.filter(lit(false)), delta, Seq("k")).count() === 2)
  }

  test("unionTolerant: missing columns null-fill, int widens to long, bad coercions refuse") {
    import spark.implicits._
    val a = Seq((1, 10)).toDF("k", "v")                      // v: int
    val b = Seq((2L, 20L, "x")).toDF("k", "v", "tag")        // k,v: long; extra col
    val c = Seq(3).toDF("k")                                 // v, tag missing
    val u = RelationalOps.unionTolerant(Seq(a, b, c)).orderBy("k")
    assert(u.schema.map(f => f.name -> f.dataType.simpleString) ===
      Seq("k" -> "bigint", "v" -> "bigint", "tag" -> "string"))
    val rows = u.collect().map(r => (r.getLong(0),
      if (r.isNullAt(1)) None else Some(r.getLong(1)),
      Option(r.getString(2))))
    assert(rows.toSeq === Seq(
      (1L, Some(10L), None), (2L, Some(20L), Some("x")), (3L, None, None)))
    // silent data loss refused, with the column named
    val bad = Seq((1L, 1.5)).toDF("k", "v")
    val err = intercept[IllegalArgumentException] {
      RelationalOps.unionTolerant(Seq(a, Seq(("s", 1)).toDF("k", "v")))
    }
    assert(err.getMessage.contains("'k'"))
    // numeric widening int→double is allowed (lossless direction)
    assert(RelationalOps.unionTolerant(Seq(a, bad))
      .schema("v").dataType.simpleString === "double")
  }

  test("sequenceAssembly: rank order survives any collection order; cap binds") {
    import spark.implicits._
    import org.apache.spark.sql.functions._
    val ev = Seq(
      (1L, 3L, 30L, "c"), (1L, 1L, 10L, "a"), (1L, 2L, 20L, "b"),
      (2L, 4L, 5L, "x"), (2L, 5L, 5L, "y") // tied ts → id breaks it
    ).toDF("u", "id", "ts", "act")
    def seqs(d: org.apache.spark.sql.DataFrame, cap: Int): Map[Long, (Long, String)] =
      RelationalOps.sequenceAssembly(d, Seq(col("u")),
          Seq(col("ts"), col("id")), col("act"), maxLen = cap)
        .collect().map(r => r.getLong(0) -> ((r.getLong(1), r.getString(2)))).toMap
    assert(seqs(ev, 10) === Map(1L -> ((3L, "a b c")), 2L -> ((2L, "x y"))))
    assert(seqs(ev.repartition(7), 10) === seqs(ev, 10))
    // the cap keeps the PREFIX in order
    assert(seqs(ev, 2)(1L) === ((2L, "a b")))
  }

  test("modeBy: most frequent wins, ties to smallest, NULLs excluded") {
    import spark.implicits._
    import org.apache.spark.sql.functions._
    val df = Seq(
      ("g1", Some("b")), ("g1", Some("b")), ("g1", Some("a")),
      ("g2", Some("x")), ("g2", Some("y")),          // tie → x
      ("g3", None), ("g3", Some("z"))                // NULL ignored
    ).toDF("g", "v")
    val got = RelationalOps.modeBy(df, col("g"), col("v"))
      .collect().map(r => r.getString(0) -> ((r.getString(1), r.getLong(2)))).toMap
    assert(got === Map("g1" -> (("b", 2L)), "g2" -> (("x", 1L)), "g3" -> (("z", 1L))))
    // an all-NULL group disappears rather than reporting a NULL mode
    assert(RelationalOps.modeBy(
      Seq(("g4", Option.empty[String])).toDF("g", "v"), col("g"), col("v"))
      .count() === 0L)
  }

  test("weightedMedian: exact crossing, tie-safe, partition-order independent") {
    import spark.implicits._
    import org.apache.spark.sql.functions._
    // group A: values 1..4 with weights 1,1,1,7 (total 10): the
    // half-mass crossing lands on value 4 (cum 3 < 5 at value 3).
    // group B: uniform weights → ordinary lower median (value 2 of
    // 1,2,3,4: cum 2 ≥ 2). group C: crossing INSIDE a tie run of
    // equal values → the value is selected whatever the tie order.
    val df = Seq(
      ("A", 1.0, 1L), ("A", 2.0, 1L), ("A", 3.0, 1L), ("A", 4.0, 7L),
      ("B", 1.0, 1L), ("B", 2.0, 1L), ("B", 3.0, 1L), ("B", 4.0, 1L),
      ("C", 1.0, 1L), ("C", 5.0, 3L), ("C", 5.0, 3L), ("C", 9.0, 1L)
    ).toDF("g", "v", "w")
    def med(d: org.apache.spark.sql.DataFrame): Map[String, Double] =
      RelationalOps.weightedMedian(d, col("g"), col("v"), col("w"))
        .collect().map(r => r.getString(0) -> r.getDouble(1)).toMap
    assert(med(df) === Map("A" -> 4.0, "B" -> 2.0, "C" -> 5.0))
    assert(med(df.repartition(7)) === Map("A" -> 4.0, "B" -> 2.0, "C" -> 5.0))
    // zero-weight rows never shift the crossing
    val z = df.union(Seq(("A", 0.5, 0L)).toDF("g", "v", "w"))
    assert(med(z)("A") === 4.0)
    // matches the unweighted median when all weights are 1
    val uw = Seq(("D", 10.0, 1L), ("D", 20.0, 1L), ("D", 30.0, 1L)).toDF("g", "v", "w")
    assert(med(uw)("D") === 20.0)
  }
}
