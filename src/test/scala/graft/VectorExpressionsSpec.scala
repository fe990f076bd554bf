package graft

import graft.ext.Similarity
import graft.functions.VectorExpressions
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

class VectorExpressionsSpec extends AnyFunSuite with SharedSpark {

  private lazy val emb = graft.sources.Tables(spark, sf0001).table("embeddings")

  test("native cosine equals the HOF composition on every real vector pair sample") {
    val pairs = emb.limit(30).select(col("vec_id").as("d1"), col("embedding").as("e1"))
      .crossJoin(emb.limit(30).select(col("vec_id").as("d2"), col("embedding").as("e2")))
      .filter(col("d1") < col("d2"))
      .select(
        VectorExpressions.cosineNative(col("e1"), col("e2")).as("fast"),
        Similarity.cosine(col("e1"), col("e2")).as("slow"))
      .collect()
    assert(pairs.nonEmpty)
    pairs.foreach { r =>
      assert(math.abs(r.getDouble(0) - r.getDouble(1)) < 1e-12)
    }
  }

  test("native cosine: nulls and mismatched lengths yield NULL, zero vector yields NULL") {
    import spark.implicits._
    val df = Seq(
      (Array(1.0f, 2.0f), Array(1.0f, 2.0f, 3.0f)),   // length mismatch
      (Array(0.0f, 0.0f), Array(1.0f, 2.0f))          // zero norm
    ).toDF("a", "b")
    val out = df.select(VectorExpressions.cosineNative(col("a"), col("b"))).collect()
    assert(out.forall(_.isNullAt(0)))
    val withNull = Seq((Option.empty[Array[Float]], Option(Array(1.0f)))).toDF("a", "b")
      .select(VectorExpressions.cosineNative(col("a"), col("b"))).collect()
    assert(withNull.head.isNullAt(0))
  }

  test("cosine_native is callable from spark.sql after registration") {
    VectorExpressions.register(spark)
    emb.limit(20).createOrReplaceTempView("emb_sql_test")
    val viaSql = spark.sql(
      """SELECT a.vec_id, cosine_native(a.embedding, b.embedding) AS c
        |FROM emb_sql_test a JOIN emb_sql_test b ON b.vec_id = a.vec_id + 1
        |ORDER BY a.vec_id""".stripMargin).collect()
    assert(viaSql.length === 19)
    assert(viaSql.forall(r => math.abs(r.getDouble(1)) <= 1.0 + 1e-12))
  }

  test("lsh_bucket/word_shingles raise NON_FOLDABLE_ARGUMENT on bad size args") {
    VectorExpressions.register(spark)
    graft.functions.TextExpressions.register(spark)
    emb.limit(5).createOrReplaceTempView("emb_arg_test")
    // non-foldable column argument → comprehensible analysis error,
    // not a raw ClassCastException/NPE at plan time
    val e1 = intercept[org.apache.spark.sql.AnalysisException] {
      spark.sql("SELECT lsh_bucket(embedding, vec_id) FROM emb_arg_test").collect()
    }
    assert(e1.getMessage.contains("lsh_bucket"))
    val e2 = intercept[org.apache.spark.sql.AnalysisException] {
      spark.sql("SELECT word_shingles('a b c', 'x')").collect()
    }
    assert(e2.getMessage.contains("word_shingles"))
    // in-range bigint literals are accepted (3L ≡ 3)
    assert(spark.sql("SELECT size(word_shingles('a b c d', 3L)) AS n").collect()
      .head.getInt(0) === 2)
    assert(spark.sql("SELECT lsh_bucket(array(1.0f, 2.0f), 4L) AS b").collect()
      .head.getLong(0) >= 0L)
  }

  test("native cosine participates in whole-stage codegen") {
    val plan = emb.select(VectorExpressions.cosineNative(col("embedding"), col("embedding")))
      .queryExecution.executedPlan.toString
    // "*(n)" marks a WholeStageCodegen stage; the project containing
    // the expression must be inside one (no codegen fallback)
    assert(plan.contains("*(1) Project [cosinesimilarity"), plan)
  }

  test("jlProject matches a driver-side reference on real vectors (codegen path)") {
    def sign(j: Int, dim: Int, k: Int): Long = {
      val m = j.toLong * dim + k
      val v = ((m * m % 1000003L) * 40503L + m * 69069L + 1234567L) % 1000003L
      if ((v & 1L) == 1L) 1L else -1L
    }
    val rows = emb.limit(40)
      .select(col("embedding"),
        VectorExpressions.jlProjectNative(col("embedding"), 16).as("p"))
      .collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val e = r.getSeq[Float](0)
      val got = r.getSeq[Long](1)
      assert(got.length === 16)
      val q = e.map(x => math.floor(x.toDouble * 1048576.0 + 0.5).toLong)
      val want = (0 until 16).map(j =>
        q.indices.map(k => sign(j, e.length, k) * q(k)).sum)
      assert(got === want)
    }
  }

  test("jlProject distance preservation: projected cosine tracks true cosine, better with width") {
    // JL is approximate with noise ~1/sqrt(outDim); assert the
    // signature of a WORKING random projection — positive correlation
    // that strictly improves as planes are added (a degenerate sign
    // matrix, like the linear-parity one this replaced, fails both) —
    // not closeness. The exactness claim is the fixed-point
    // arithmetic, covered by the reference test above.
    def corr(outDim: Int): Double = {
      val pairs = emb.limit(20).select(col("vec_id").as("d1"), col("embedding").as("e1"))
        .crossJoin(emb.limit(20).select(col("vec_id").as("d2"), col("embedding").as("e2")))
        .filter(col("d1") < col("d2"))
        .select(
          Similarity.cosine(col("e1"), col("e2")).as("true_cos"),
          VectorExpressions.jlProjectNative(col("e1"), outDim).as("p1"),
          VectorExpressions.jlProjectNative(col("e2"), outDim).as("p2"))
        .collect().map { r =>
          val a = r.getSeq[Long](1).map(_.toDouble)
          val b = r.getSeq[Long](2).map(_.toDouble)
          val dot = a.lazyZip(b).map(_ * _).sum
          val na = math.sqrt(a.map(x => x * x).sum)
          val nb = math.sqrt(b.map(x => x * x).sum)
          (r.getDouble(0), dot / (na * nb))
        }
      val n = pairs.length
      assert(n > 100)
      val (xs, ys) = (pairs.map(_._1), pairs.map(_._2))
      val mx = xs.sum / n; val my = ys.sum / n
      val cov = xs.lazyZip(ys).map((x, y) => (x - mx) * (y - my)).sum
      cov / math.sqrt(xs.map(x => (x - mx) * (x - mx)).sum *
        ys.map(y => (y - my) * (y - my)).sum)
    }
    val (r16, r48) = (corr(16), corr(48))
    assert(r16 > 0.25, s"correlation at 16 planes $r16")
    assert(r48 > r16, s"adding planes must reduce distortion: r48=$r48 r16=$r16")
    assert(r48 > 0.5, s"correlation at 48 planes $r48")
  }

  test("jlProject: null vector and null element yield NULL; empty vector yields zeros") {
    import spark.implicits._
    val df = Seq(Option(Array(1.0f, -2.0f)), None).toDF("v")
    val out = df.select(VectorExpressions.jlProjectNative(col("v"), 4)).collect()
    assert(!out(0).isNullAt(0) && out(1).isNullAt(0))
    val withNullElem = spark.sql(
      "SELECT array(1.0f, CAST(NULL AS FLOAT)) AS v")
      .select(VectorExpressions.jlProjectNative(col("v"), 4)).collect()
    assert(withNullElem.head.isNullAt(0))
    val empty = spark.sql("SELECT array()").select(
      VectorExpressions.jlProjectNative(col("array()").cast("array<float>"), 3)).collect()
    assert(empty.head.getSeq[Long](0) === Seq(0L, 0L, 0L))
  }
}
