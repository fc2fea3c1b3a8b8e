package graft.functions

import org.apache.spark.sql.SparkSessionExtensions
import org.apache.spark.sql.catalyst.plans.logical.LogicalPlan
import org.apache.spark.sql.catalyst.rules.Rule

/** Catalyst optimizer rule: a self-dot is a squared norm —
  * `vec_dot(x, x)` → `vec_norm2(x)` (one array traversal instead of a
  * zipped pair walk, same sequential fold → bit-identical result).
  *
  * Small by design: SURVEY.md §4 found no rewrite the reference depends
  * on that Catalyst lacks, so the engine needs no mandatory custom rules;
  * this one exists where a real optimization genuinely applies, and
  * demonstrates the full §7.4(c) machinery (Rule[LogicalPlan] +
  * SparkSessionExtensions registration).
  */
object SelfDotToNorm extends Rule[LogicalPlan] {
  override def apply(plan: LogicalPlan): LogicalPlan =
    plan.transformAllExpressions {
      case FloatVectorDot(a, b) if a.semanticEquals(b) => FloatVectorNorm2(a)
    }
}

/** `spark.sql.extensions=graft.functions.GraftExtensions` entry point for
  * externally-configured sessions; [[NativeVectorExpressions.register]]
  * injects the same rule into an already-running session. */
class GraftExtensions extends (SparkSessionExtensions => Unit) {
  override def apply(e: SparkSessionExtensions): Unit =
    e.injectOptimizerRule(_ => SelfDotToNorm)
}
