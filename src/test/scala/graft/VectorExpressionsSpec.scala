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
}
