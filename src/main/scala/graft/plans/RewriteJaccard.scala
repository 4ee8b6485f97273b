package graft.plans

import org.apache.spark.sql.catalyst.expressions.{ArrayIntersect, ArrayUnion, Cast, Divide, Expression, Size}
import org.apache.spark.sql.catalyst.plans.logical.LogicalPlan
import org.apache.spark.sql.catalyst.rules.Rule
import org.apache.spark.sql.types.{ArrayType, DoubleType, StringType}

import graft.functions.JaccardSim

/** Optimizer rule: collapse the textbook Jaccard expression
  *
  *   size(array_intersect(a, b)) / size(array_union(a, b))
  *
  * (double-dividing form, string arrays) into the one-pass
  * [[JaccardSim]] kernel. The two set operations each allocate a result
  * array per row; the kernel computes the same counts — same quotient,
  * including 0/0 → NaN and null-element set semantics — with hash
  * probes only. Anyone writing the naive form against a session carrying
  * `spark.sql.extensions=graft.functions.GraftExtensions` (or
  * `spark.experimental.extraOptimizations`) gets kernel speed for free.
  *
  * Guarded on: identical (a, b) on both sides (semantic equality),
  * string element type, and non-legacy size semantics (size(null) must
  * be null, not -1, to match the kernel's null propagation).
  */
object RewriteJaccard extends Rule[LogicalPlan] {

  private def isStringArray(e: Expression): Boolean = e.dataType match {
    case ArrayType(StringType, _) => true
    case _ => false
  }

  /** Match `size(...)` promoted to double — Divide casts both operands. */
  private object SizeAsDouble {
    def unapply(e: Expression): Option[Expression] = e match {
      case Cast(Size(child, false), DoubleType, _, _) => Some(child)
      case _ => None
    }
  }

  override def apply(plan: LogicalPlan): LogicalPlan =
    plan.transformAllExpressions {
      case Divide(
          SizeAsDouble(ArrayIntersect(a1, b1)),
          SizeAsDouble(ArrayUnion(a2, b2)), _)
          if a1.semanticEquals(a2) && b1.semanticEquals(b2) &&
            isStringArray(a1) && isStringArray(b1) =>
        JaccardSim(a1, b1)
    }
}
