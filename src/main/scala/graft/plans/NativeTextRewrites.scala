package graft.plans

import graft.functions.{PunctCount, WsTokenCount}
import org.apache.spark.sql.catalyst.expressions.{Literal, RegExpExtractAll, Size, StringSplit}
import org.apache.spark.sql.catalyst.plans.logical.LogicalPlan
import org.apache.spark.sql.catalyst.rules.Rule
import org.apache.spark.unsafe.types.UTF8String

/** Optimizer rule: rewrite the composable token/punct-count
  * formulations to the engine's native one-pass expressions —
  *
  *   size(split(text, '\s+'))                → [[WsTokenCount]]
  *   size(regexp_extract_all(text, '[^\w\s]')) → [[PunctCount]]
  *
  * so pure-SQL users writing the textbook forms get the scan that
  * never materializes the token/match array. The rewrite fires only
  * on the exact shapes proven bit-equivalent in
  * NativeExprEquivalenceSpec (literal pattern, default split limit,
  * group 0, non-legacy size-of-null — each guard below drops a case
  * whose semantics would differ). Installed builder-time by
  * [[graft.GraftExtensions]] (`injectOptimizerRule`) or at runtime
  * via `spark.experimental.extraOptimizations`.
  */
object NativeTextRewrites extends Rule[LogicalPlan] {

  private val ws = UTF8String.fromString("\\s+")
  private val punct = UTF8String.fromString("[^\\w\\s]")

  override def apply(plan: LogicalPlan): LogicalPlan = plan.transformAllExpressions {
    // split's default limit is -1 (keep trailing empties) — the
    // semantics WsTokenCount replicates; legacySizeOfNull=false keeps
    // null → null (WsTokenCount's null behavior)
    case Size(StringSplit(text, Literal(`ws`, _), Literal(-1, _)), false) =>
      WsTokenCount(text)
    case Size(RegExpExtractAll(text, Literal(`punct`, _), Literal(0, _)), false) =>
      PunctCount(text)
  }
}
