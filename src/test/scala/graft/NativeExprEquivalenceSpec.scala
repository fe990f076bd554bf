package graft

import graft.functions.{TextExpressions, VectorExpressions}
import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Drop-in equivalence proofs for the native one-pass expressions:
  * each must return exactly what the composable built-in formulation
  * it replaced returns, on randomized text (words, punctuation,
  * messy whitespace, unicode) and on the edge cases Java's
  * `split("\\s+", -1)` is famous for (empty string, leading/trailing
  * whitespace). The DuckDB gate then re-proves the same equivalences
  * against a second engine on the real corpus.
  */
class NativeExprEquivalenceSpec extends AnyFunSuite with SharedSpark {

  private val rng = new scala.util.Random(42)
  private val pieces = Seq("the", "cat", "héllo", "a_b", "x9", "—", "!!", ",", "π",
    " ", "  ", "\t", "\n", "", "\f", "\r", "")
  private def randText(): String =
    (0 until rng.nextInt(40)).map(_ => pieces(rng.nextInt(pieces.length))).mkString
  private val corpus: Seq[String] =
    Seq("", " ", "  ", "a", " a", "a ", " a b  c\t", "a\nb", "one two three four five six") ++
      (0 until 200).map(_ => randText())

  private def compare(label: String, native: Column, reference: Column): Unit = {
    import spark.implicits._
    val rows = corpus.toDF("text")
      .select(native.as("native"), reference.as("reference"))
      .collect()
    rows.zip(corpus).foreach { case (r, text) =>
      assert(r.get(0) === r.get(1), s"$label diverges on ${text.inspect}")
    }
  }

  private implicit class Inspect(s: String) {
    def inspect: String = s.map(c => if (c < ' ') f"\\u${c.toInt}%04x" else c.toString).mkString("\"", "", "\"")
  }

  test("WsTokenCount == size(split(text, \\s+))") {
    compare("WsTokenCount",
      TextExpressions.wsTokenCount(col("text")),
      size(split(col("text"), "\\s+")))
  }

  test("PunctCount == size(regexp_extract_all(text, [^\\w\\s]))") {
    compare("PunctCount",
      TextExpressions.punctCount(col("text")),
      size(regexp_extract_all(col("text"), lit("[^\\w\\s]"), lit(0))))
  }

  test("WordShingles == zip-of-shifted-slices formulation") {
    def referenceShingles(text: Column, n: Int): Column = {
      val toks = split(lower(text), "\\s+")
      val zipped = arrays_zip(
        (0 until n).map(i => slice(toks, lit(i + 1), size(toks)).as(s"t$i")): _*)
      val full = slice(zipped, lit(1), greatest(size(toks) - (n - 1), lit(0)))
      transform(full, s => concat_ws(" ", (0 until n).map(i => s.getField(s"t$i")): _*))
    }
    for (n <- Seq(2, 3, 5))
      compare(s"WordShingles(n=$n)",
        TextExpressions.wordShingles(lower(col("text")), n),
        referenceShingles(col("text"), n))
  }

  test("native expressions are callable from spark.sql after registration") {
    import spark.implicits._
    TextExpressions.register(spark)
    VectorExpressions.register(spark)
    Seq(("the quick brown fox, obviously!", Array(0.5f, -0.25f, 1.0f)))
      .toDF("text", "vec").createOrReplaceTempView("native_fn_test")
    val row = spark.sql(
      """SELECT ws_token_count(text) AS n, punct_count(text) AS p,
        |       size(word_shingles(lower(text), 2)) AS sh,
        |       rolling_hash(text) AS rh,
        |       lsh_bucket(vec, 8) AS b,
        |       cosine_native(vec, vec) AS c
        |FROM native_fn_test""".stripMargin).head()
    assert(row.getInt(0) === 5)
    assert(row.getInt(1) === 2)
    assert(row.getInt(2) === 4)
    assert(row.getLong(3) > 0)
    assert(row.getLong(4) >= 0 && row.getLong(4) < 256)
    assert(math.abs(row.getDouble(5) - 1.0) < 1e-12)
  }

  test("NativeTextRewrites rewrites textbook forms to native expressions") {
    import spark.implicits._
    spark.experimental.extraOptimizations =
      spark.experimental.extraOptimizations :+ graft.plans.NativeTextRewrites
    try {
      // parquet-backed (a local-relation view would be wholly
      // constant-folded by ConvertToLocalRelation before our rule
      // could be observed)
      graft.sources.Tables(spark, "/root/testdata/sf0.001").table("documents")
        .createOrReplaceTempView("rewrite_test")
      val df = spark.sql(
        """SELECT size(split(text, '\\s+')) AS n,
          |       size(regexp_extract_all(text, '[^\\w\\s]', 0)) AS p
          |FROM rewrite_test""".stripMargin)
      val optimized = df.queryExecution.optimizedPlan.toString
      assert(optimized.contains("wstokencount"), optimized)
      assert(optimized.contains("punctcount"), optimized)
      // and a non-matching shape (limit 2) is left alone
      val untouched = spark.sql(
        "SELECT size(split(text, '\\\\s+', 2)) AS n FROM rewrite_test")
        .queryExecution.optimizedPlan.toString
      assert(!untouched.contains("wstokencount"), untouched)
      // results equal the unrewritten formulation
      val got = df.collect().map(r => (r.getInt(0), r.getInt(1)))
      spark.experimental.extraOptimizations = Nil
      val want = spark.sql(
        """SELECT size(split(text, '\\s+')) AS n,
          |       size(regexp_extract_all(text, '[^\\w\\s]', 0)) AS p
          |FROM rewrite_test""".stripMargin)
        .collect().map(r => (r.getInt(0), r.getInt(1)))
      assert(got.sorted.toSeq === want.sorted.toSeq)
    } finally {
      spark.experimental.extraOptimizations = Nil
    }
  }

  test("HyperplaneLshBucket == interpreted HOF fold") {
    import spark.implicits._
    def planeSign(j: Column, k: Column): Column =
      (xxhash64(j, k).bitwiseAND(lit(1L)) * 2 - 1).cast("double")
    def hofBucket(vec: Column, bits: Int): Column =
      aggregate(
        sequence(lit(0), lit(bits - 1)),
        lit(0L),
        (acc, j) => {
          val proj = aggregate(
            zip_with(vec, sequence(lit(0), size(vec) - 1),
              (v, k) => v.cast("double") * planeSign(j, k)),
            lit(0.0), (a, x) => a + x)
          acc + when(proj > 0, call_function("shiftleft", lit(1L), j)).otherwise(lit(0L))
        })
    val vecs = (0 until 50).map(_ => (0 until 16).map(_ => rng.nextFloat() * 2 - 1).toArray)
    val df = vecs.toDF("embedding").select(col("embedding").cast("array<float>").as("embedding"))
    for (bits <- Seq(4, 8, 16)) {
      val rows = df.select(
        VectorExpressions.lshBucketNative(col("embedding"), bits).as("native"),
        hofBucket(col("embedding"), bits).as("hof")).collect()
      rows.foreach(r => assert(r.getLong(0) === r.getLong(1), s"bits=$bits"))
    }
  }

  test("HyperplaneLshBucket codegen == interpreted eval, both hash variants") {
    // the DataFrame path runs the generated Java (doGenCode); calling
    // eval() on the expression directly runs the interpreted loop —
    // the two implementations must agree bit-for-bit on every
    // (variant, planeOffset) combination
    import spark.implicits._
    import org.apache.spark.sql.catalyst.expressions.Literal
    import org.apache.spark.sql.types.{ArrayType, FloatType}
    val vecs = (0 until 40).map(i =>
      i.toLong -> (0 until 24).map(_ => rng.nextFloat() * 2 - 1).toArray)
    val df = vecs.toDF("id", "embedding")
      .select(col("id"), col("embedding").cast("array<float>").as("embedding"))
    for (portable <- Seq(false, true); offset <- Seq(0, 8)) {
      val viaCodegen = df.select(col("id"),
        VectorExpressions.lshBucketNative(col("embedding"), 8, offset, portable))
        .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
      val viaInterp = vecs.map { case (id, v) =>
        id -> graft.functions.HyperplaneLshBucket(
          Literal.create(v, ArrayType(FloatType)), 8, offset, portable)
          .eval(null).asInstanceOf[Long]
      }.toMap
      assert(viaCodegen === viaInterp, s"portable=$portable offset=$offset")
    }
  }

  test("NearestCentroid codegen == interpreted eval == max(struct) argmax") {
    import spark.implicits._
    import org.apache.spark.sql.catalyst.expressions.Literal
    import org.apache.spark.sql.types.{ArrayType, FloatType, LongType, StructField, StructType}
    val dim = 16
    val vecs = (0 until 40).map(i => i.toLong -> Array.fill(dim)(rng.nextFloat() * 2 - 1))
    // a duplicated centroid under a second, larger cid exercises the
    // tie-break (identical arithmetic → bitwise-equal cosine → the
    // larger cid must win, as max(struct(sim, cid)) would pick)
    val cents = (0 until 8).map(c => c.toLong -> Array.fill(dim)(rng.nextFloat() * 2 - 1))
    val centsAll = cents :+ (99L -> cents.head._2.clone())
    val centsDf = centsAll.toDF("cid", "c_emb")
      .select(col("cid"), col("c_emb").cast("array<float>").as("c_emb"))
    val corpus = vecs.toDF("vec_id", "embedding")
      .select(col("vec_id"), col("embedding").cast("array<float>").as("embedding"))
    // codegen path — the plan ivfAssign actually runs
    val got = graft.ext.Similarity.ivfAssign(corpus, centsDf, "vec_id")
      .select("vec_id", "cluster").collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    // reference semantics: the crossJoin + max(struct) argmax it replaced
    val want = corpus.crossJoin(centsDf)
      .groupBy("vec_id")
      .agg(max(struct(
        VectorExpressions.cosineNative(col("embedding"), col("c_emb")).as("sim"),
        col("cid"))).as("best"))
      .select(col("vec_id"), col("best.cid")).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(got === want)
    // cid 0's centroid also exists as cid 99: every tie must resolve
    // to 99, so no vector may ever be assigned to cluster 0
    assert(!got.values.exists(_ == 0L), got.toString)
    // interpreted eval agrees bit-for-bit with the generated Java
    val centsType = ArrayType(StructType(Seq(
      StructField("cid", LongType), StructField("c_emb", ArrayType(FloatType)))))
    val toCatalyst = org.apache.spark.sql.catalyst.CatalystTypeConverters
      .createToCatalystConverter(centsType)
    val centsLit = Literal(
      toCatalyst(centsAll.map { case (c, e) => org.apache.spark.sql.Row(c, e.toSeq) }),
      centsType)
    vecs.foreach { case (id, v) =>
      val interp = graft.functions.NearestCentroid(
        Literal.create(v, ArrayType(FloatType)), centsLit).eval(null)
      assert(interp === got(id), s"vec $id")
    }
    // degenerate inputs: zero-norm vector and empty centroid set → NULL
    val zeroV = Literal.create(Array.fill(dim)(0.0f), ArrayType(FloatType))
    assert(graft.functions.NearestCentroid(zeroV, centsLit).eval(null) == null)
    val emptyCents = Literal(toCatalyst(Seq.empty[org.apache.spark.sql.Row]), centsType)
    assert(graft.functions.NearestCentroid(
      Literal.create(vecs.head._2, ArrayType(FloatType)), emptyCents).eval(null) == null)
  }

  test("NearestCentroidL2 codegen == interpreted eval == min(struct) argmin") {
    import spark.implicits._
    import org.apache.spark.sql.catalyst.expressions.Literal
    import org.apache.spark.sql.types.{ArrayType, FloatType, LongType, StructField, StructType}
    val dim = 16
    val vecs = (0 until 40).map(i => i.toLong -> Array.fill(dim)(rng.nextFloat() * 2 - 1))
    // centroid 0 duplicated under cid 99: bitwise-equal distances, and
    // the SMALLER cid must win (min(struct(dist, cid)) semantics — the
    // opposite tie-break of the cosine argmax)
    val cents = (0 until 8).map(c => c.toLong -> Array.fill(dim)(rng.nextFloat() * 2 - 1))
    val centsAll = cents :+ (99L -> cents.head._2.clone())
    val centsDf = centsAll.toDF("cid", "c_emb")
      .select(col("cid"), col("c_emb").cast("array<float>").as("c_emb"))
    val corpus = vecs.toDF("vec_id", "embedding")
      .select(col("vec_id"), col("embedding").cast("array<float>").as("embedding"))
    val centsRow = broadcast(centsDf.agg(
      collect_list(struct(col("cid"), col("c_emb"))).as("cents")))
    val got = corpus.crossJoin(centsRow)
      .select(col("vec_id"),
        VectorExpressions.nearestCentroidL2Native(col("embedding"), col("cents")).as("cluster"))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    // reference: crossJoin + min(struct(dist, cid)) argmin over the
    // HOF index-order fold of Σ(x−y)²
    val d2 = aggregate(
      zip_with(col("embedding"), col("c_emb"),
        (x, y) => (x.cast("double") - y.cast("double")) * (x.cast("double") - y.cast("double"))),
      lit(0.0), (acc, v) => acc + v)
    val want = corpus.crossJoin(centsDf)
      .groupBy("vec_id")
      .agg(min(struct(d2.as("d"), col("cid"))).as("best"))
      .select(col("vec_id"), col("best.cid")).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(got === want)
    assert(!got.values.exists(_ == 99L), s"ties must pick the smaller cid: $got")
    // interpreted eval agrees bit-for-bit with the generated Java
    val centsType = ArrayType(StructType(Seq(
      StructField("cid", LongType), StructField("c_emb", ArrayType(FloatType)))))
    val toCatalyst = org.apache.spark.sql.catalyst.CatalystTypeConverters
      .createToCatalystConverter(centsType)
    val centsLit = Literal(
      toCatalyst(centsAll.map { case (c, e) => org.apache.spark.sql.Row(c, e.toSeq) }),
      centsType)
    vecs.foreach { case (id, v) =>
      val interp = graft.functions.NearestCentroidL2(
        Literal.create(v, ArrayType(FloatType)), centsLit).eval(null)
      assert(interp === got(id), s"vec $id")
    }
    val emptyCents = Literal(toCatalyst(Seq.empty[org.apache.spark.sql.Row]), centsType)
    assert(graft.functions.NearestCentroidL2(
      Literal.create(vecs.head._2, ArrayType(FloatType)), emptyCents).eval(null) == null)
  }
}
