package graft.plans

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.expressions._
import org.apache.spark.sql.catalyst.plans.logical.LogicalPlan
import org.apache.spark.sql.catalyst.rules.Rule
import org.apache.spark.sql.types.{IntegerType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Optimizer rule that rewrites the two ubiquitous REGEX text idioms of
  * data-pipeline code into the engine's native single-pass kernels —
  * so a user porting reference pipelines verbatim gets the kernel
  * speedups without touching their code (the same transparent-planner
  * philosophy as [[BloomJoinRule]]):
  *
  *  1. the dedup-key normalize chain
  *     `lower(trim(regexp_replace(regexp_replace(c, "[^a-zA-Z0-9 ]", ""), " +", " ")))`
  *     → `graft_normtext(c)` — ONE byte pass instead of two
  *     java.util.regex rewrites (measured 820 µs/doc → the single
  *     largest CPU line of the sf100 text scans; bit-identical by
  *     TextExpressionsSpec's property test);
  *  2. the whitespace token count `size(split(c, " "))`
  *     → `length(c) - length(translate(c, " ", "")) + 1` — no regex, no
  *     per-row array (split keeps empty segments, so tokens = spaces+1;
  *     0x20 never occurs inside a UTF-8 multi-byte sequence). Skipped
  *     under `spark.sql.legacy.sizeOfNull` (there `size(null)` = -1 but
  *     the length form yields NULL).
  *
  * Both rewrites are pure expression substitutions — no shape change,
  * null-for-null identical — registered in the post-optimization user
  * batch via [[graft.functions.GraftExtensions]] or
  * [[TextKernelRewrite.ensureRegistered]].
  */
object TextKernelRewriteRule extends Rule[LogicalPlan] {

  private def lit(e: Expression, s: String): Boolean = e match {
    case Literal(u: UTF8String, StringType) => u.toString == s
    case _ => false
  }

  private def litOne(e: Expression): Boolean = e match {
    case Literal(1, IntegerType) => true
    case _ => false
  }

  override def apply(plan: LogicalPlan): LogicalPlan =
    plan.transformAllExpressions {
      case Lower(StringTrim(RegExpReplace(
            RegExpReplace(c, strip, empty, pos1), collapse, single, pos2), None))
          if lit(strip, "[^a-zA-Z0-9 ]") && lit(empty, "") &&
            lit(collapse, " +") && lit(single, " ") &&
            litOne(pos1) && litOne(pos2) =>
        graft.functions.NormText(c)

      case s @ Size(StringSplit(c, sp, Literal(-1, IntegerType)), false)
          if lit(sp, " ") =>
        // Size is Int-typed; keep the arithmetic in Int so the rewrite
        // is type-invisible to everything above it
        Add(Subtract(Length(c),
          Length(StringTranslate(c,
            Literal(UTF8String.fromString(" "), StringType),
            Literal(UTF8String.fromString(""), StringType)))),
          Literal(1, IntegerType))
    }
}

object TextKernelRewrite {
  /** Session-hook registration (the [[BloomJoin.ensureRegistered]]
    * pattern, for sessions not built with the extensions class).
    */
  def ensureRegistered(spark: SparkSession): Unit = {
    val exp = spark.asInstanceOf[org.apache.spark.sql.classic.SparkSession].experimental
    if (!exp.extraOptimizations.contains(TextKernelRewriteRule))
      exp.extraOptimizations = exp.extraOptimizations :+ TextKernelRewriteRule
  }
}
