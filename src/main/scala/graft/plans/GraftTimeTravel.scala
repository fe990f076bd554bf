package graft.plans

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.analysis.{RelationTimeTravel, UnresolvedRelation}
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.plans.logical.{LogicalPlan, SubqueryAlias}
import org.apache.spark.sql.types.{DateType, TimestampType}

/** ANSI time-travel SQL for graft catalog tables:
  *
  * {{{
  *   SELECT … FROM t VERSION AS OF 3
  *   SELECT … FROM t TIMESTAMP AS OF '2026-01-01 00:00:00'
  * }}}
  *
  * Spark's parser produces a [[RelationTimeTravel]] node, which the
  * built-in analyzer only honors for V2 catalogs — a session-catalog
  * `USING graft` table would die with "does not support time travel"
  * before any injected resolution rule ran. So the rewrite happens
  * where the graft dialect already lives: [[GraftSqlParser]] hands
  * every delegate-parsed plan through [[rewrite]], which replaces
  * each time-travel node whose relation names a REGISTERED graft
  * table (never a temp view, never another provider — those keep
  * Spark's own behavior verbatim) with the graft reader resolving
  * the same option: `versionAsOf` IS the generation number,
  * `timestampAsOf` resolves through the per-generation commit
  * records — one snapshot-resolution implementation for the Scala,
  * option, and SQL spellings. The substituted read is wrapped in a
  * [[SubqueryAlias]] of the relation's name, so `t.col` references
  * and qualified stars over the traveled table keep resolving.
  *
  * The timestamp expression must FOLD at parse time (a literal, or
  * literal arithmetic): snapshot resolution pins one generation per
  * statement — a non-deterministic or column-dependent instant has
  * no meaning here and refuses loudly. (Delta resolves its
  * time-travel timestamps under the same restriction.)
  */
object GraftTimeTravel {

  def rewrite(session: SparkSession, plan: LogicalPlan): LogicalPlan =
    if (!plan.exists(_.isInstanceOf[RelationTimeTravel])) plan
    else plan.transformUp {
      case tt @ RelationTimeTravel(u: UnresolvedRelation, ts, ver) =>
        GraftSqlCommands.catalogGraftPath(session, u.multipartIdentifier)
          match {
            case None => tt // not a graft catalog table — Spark's call
            case Some(path) =>
              val reader = session.read.format("graft")
              val df = (ver, ts) match {
                case (Some(v), None) =>
                  reader.option("versionAsOf", v).load(path)
                case (None, Some(e)) =>
                  reader.option("timestampAsOf",
                    instantStringOf(u.multipartIdentifier, e)).load(path)
                case _ => throw new IllegalArgumentException(
                  s"time travel over ${u.multipartIdentifier.mkString(".")}" +
                    " needs exactly one of VERSION AS OF / TIMESTAMP AS OF")
              }
              SubqueryAlias(u.multipartIdentifier.last,
                df.queryExecution.logical)
          }
    }

  /** Render a parsed TIMESTAMP AS OF expression in the form the
    * reader's `timestampAsOf` option takes (epoch millis, or the
    * wall-clock string it parses in the session zone). String
    * literals pass through verbatim; typed timestamp/date literals
    * arrive as Catalyst internal values (micros / days) and convert
    * exactly. */
  private def instantStringOf(ident: Seq[String], e: Expression): String = {
    val name = ident.mkString(".")
    require(e.foldable,
      s"TIMESTAMP AS OF over $name must be a literal instant " +
        s"(got $e) — snapshot resolution pins one generation " +
        "per statement")
    e.eval() match {
      case null => throw new IllegalArgumentException(
        s"TIMESTAMP AS OF NULL over $name — pass an instant")
      case s: org.apache.spark.unsafe.types.UTF8String => s.toString
      case micros: Long if e.dataType == TimestampType ||
          e.dataType == org.apache.spark.sql.types.TimestampNTZType =>
        (micros / 1000L).toString
      case days: Int if e.dataType == DateType =>
        (days.toLong * 86400000L).toString
      case other => throw new IllegalArgumentException(
        s"cannot read '$other' (${e.dataType}) as a TIMESTAMP AS OF " +
          s"instant over $name — pass a string, timestamp, or date " +
          "literal")
    }
  }
}
