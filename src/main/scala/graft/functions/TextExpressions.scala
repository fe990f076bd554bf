package graft.functions

import org.apache.spark.sql.{Column, GraftColumnBridge}
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
import org.apache.spark.sql.catalyst.expressions.UnsafeArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, IntegerType}
import org.apache.spark.unsafe.types.UTF8String

/** Count, for each of `sets`, how many word-runs of the input are
  * members — all sets in ONE pass over the text.
  *
  * Replaces N `regexp_extract_all(text, '\\b(w1|w2|...)\\b')` scans
  * (one per marker set) with a single character sweep + hash lookup.
  * Exactly equivalent to the regex count when every marker is made of
  * word characters ([A-Za-z0-9_], the ASCII `\w` of both Java and
  * RE2): a `\b`-delimited alternation match is then precisely a
  * maximal word-run equal to a marker. The DuckDB oracles keep the
  * regex formulation — the gate proves the equivalence on real data.
  *
  * Scalar loop is plain JVM code via CodegenFallback (the sweep
  * dominates; fallback costs one virtual call per row — contrast
  * [[CosineSimilarity]] which inlines via doGenCode because its loop
  * body is arithmetic the JIT can vectorize).
  */
case class WordSetsCount(child: Expression, sets: Seq[Seq[String]])
    extends UnaryExpression with CodegenFallback {

  override def dataType: DataType = ArrayType(IntegerType, containsNull = false)

  @transient private lazy val lookup: java.util.HashMap[String, Array[Int]] = {
    val m = new java.util.HashMap[String, Array[Int]]()
    sets.zipWithIndex.foreach { case (ws, i) =>
      ws.foreach { w =>
        val prev = m.get(w)
        m.put(w, if (prev == null) Array(i) else prev :+ i)
      }
    }
    m
  }

  private def isWordChar(c: Char): Boolean =
    (c >= 'a' && c <= 'z') || (c >= 'A' && c <= 'Z') || (c >= '0' && c <= '9') || c == '_'

  override def nullSafeEval(input: Any): Any = {
    val s = input.asInstanceOf[UTF8String].toString
    val counts = new Array[Int](sets.length)
    var i = 0
    val n = s.length
    while (i < n) {
      if (isWordChar(s.charAt(i))) {
        var j = i + 1
        while (j < n && isWordChar(s.charAt(j))) j += 1
        val hit = lookup.get(s.substring(i, j))
        if (hit != null) {
          var k = 0
          while (k < hit.length) { counts(hit(k)) += 1; k += 1 }
        }
        i = j
      } else i += 1
    }
    UnsafeArrayData.fromPrimitiveArray(counts)
  }

  override protected def withNewChildInternal(c: Expression): Expression = copy(child = c)
}

object TextExpressions {
  import GraftColumnBridge.{column, expression}
  /** One-pass membership counts of word-runs for several word sets. */
  def wordSetsCount(text: Column, sets: Seq[Seq[String]]): Column =
    column(WordSetsCount(expression(text), sets))
}
