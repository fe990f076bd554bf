package graft

import org.apache.spark.sql.SparkSessionExtensions
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.ExpressionInfo

/** Builder-time extension installer: makes the engine's native
  * expressions available to pure-SQL sessions without any Scala call.
  *
  *   spark-submit --conf spark.sql.extensions=graft.GraftExtensions …
  * or
  *   SparkSession.builder().withExtensions(new GraftExtensions) …
  *
  * (For an already-running session, [[graft.functions.VectorExpressions.register]]
  * does the same through the function registry.)
  */
class GraftExtensions extends (SparkSessionExtensions => Unit) {
  override def apply(e: SparkSessionExtensions): Unit = {
    e.injectFunction((
      FunctionIdentifier("cosine_native"),
      new ExpressionInfo(classOf[graft.functions.CosineSimilarity].getName, "cosine_native"),
      (exprs: Seq[org.apache.spark.sql.catalyst.expressions.Expression]) =>
        graft.functions.CosineSimilarity(exprs(0), exprs(1))))
  }
}
