package graft.plans

import org.apache.spark.sql.catalyst.expressions._
import org.apache.spark.sql.catalyst.plans.logical.LogicalPlan
import org.apache.spark.sql.catalyst.rules.Rule
import org.apache.spark.sql.types.IntegerType

/** Catalyst optimizer rule: rewrite unbounded `levenshtein(a, b) <= d`
  * comparisons into the thresholded form `levenshtein(a, b, d) >= 0`.
  *
  * The thresholded kernel runs the banded DP and EXITS as soon as the
  * band exceeds d — O(d·min(|a|,|b|)) instead of O(|a|·|b|) — and
  * returns −1 past the threshold, so `>= 0` is the exact predicate
  * equivalent. Null propagation is identical (null input → null distance
  * in both forms → null predicate). Users writing plain SQL against the
  * registry (`.sql` files, SURVEY §2 S4) get the fuzzy-join-grade kernel
  * without knowing the 3-arg form exists; on a 100 TB candidate join the
  * DP band is the difference between d·n and n² character work per pair.
  *
  * Handles the four comparison orientations against a non-negative
  * integer literal; leaves every other shape (column thresholds,
  * already-thresholded calls) untouched. Registered via
  * `SparkSessionExtensions.injectOptimizerRule` in [[graft.GraftExtensions]].
  */
object OptimizeLevenshteinThreshold extends Rule[LogicalPlan] {

  private def bounded(a: Expression, b: Expression, d: Int): Expression =
    GreaterThanOrEqual(Levenshtein(a, b, Some(Literal(d))), Literal(0))

  override def apply(plan: LogicalPlan): LogicalPlan =
    plan.transformAllExpressions {
      // lev(a,b) <= d  /  d >= lev(a,b)
      case LessThanOrEqual(Levenshtein(a, b, None), Literal(d: Int, IntegerType))
          if d >= 0 => bounded(a, b, d)
      case GreaterThanOrEqual(Literal(d: Int, IntegerType), Levenshtein(a, b, None))
          if d >= 0 => bounded(a, b, d)
      // lev(a,b) < d  /  d > lev(a,b)   (d > 0 ⇒ ≤ d−1)
      case LessThan(Levenshtein(a, b, None), Literal(d: Int, IntegerType))
          if d > 0 => bounded(a, b, d - 1)
      case GreaterThan(Literal(d: Int, IntegerType), Levenshtein(a, b, None))
          if d > 0 => bounded(a, b, d - 1)
    }
}
