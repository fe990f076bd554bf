package graft.functions

import org.apache.spark.sql.AnalysisException
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.types.{IntegerType, LongType}

/** Argument validation for SQL-registered graft functions.
  *
  * The SQL builders for `word_shingles(text, n)` / `lsh_bucket(vec,
  * bits)` need a plan-time Int. Evaluating an arbitrary expression
  * with `.eval().asInstanceOf[Int]` turns a non-foldable column or a
  * bigint literal into a raw ClassCastException/NPE at plan time;
  * this helper raises the standard `NON_FOLDABLE_ARGUMENT` analysis
  * error instead, naming the function and parameter.
  */
object FunctionArgs {

  /** Extract a plan-time Int from a foldable integral literal, or
    * raise an AnalysisException naming `funcName.paramName`. Accepts
    * INT and in-range BIGINT literals (so `word_shingles(t, 3L)` and
    * DuckDB-style bigint literals both work). */
  def foldableInt(funcName: String, paramName: String, e: Expression): Int = {
    def fail(): Nothing = throw new AnalysisException(
      errorClass = "NON_FOLDABLE_ARGUMENT",
      messageParameters = Map(
        "funcName" -> s"`$funcName`",
        "paramName" -> s"`$paramName`",
        "paramType" -> "\"INT\""))
    if (!e.foldable) fail()
    val v = e.dataType match {
      case IntegerType | LongType => e.eval()
      case _ => fail()
    }
    v match {
      case i: Int => i
      case l: Long if l.isValidInt => l.toInt
      case _ => fail() // null literal or out-of-Int-range bigint
    }
  }
}
