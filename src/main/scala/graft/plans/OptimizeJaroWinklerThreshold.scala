package graft.plans

import org.apache.spark.sql.catalyst.expressions._
import org.apache.spark.sql.catalyst.plans.logical.LogicalPlan
import org.apache.spark.sql.catalyst.rules.Rule
import org.apache.spark.sql.types.{DoubleType, IntegerType}

import graft.expressions.{JaroWinkler, Utf16Length}

/** Catalyst optimizer rule: prefix high-threshold Jaro–Winkler
  * predicates `jaro_winkler(a, b) >= θ` (θ > 0.8) with a PROVABLY SOUND
  * length-ratio prefilter.
  *
  * Derivation: with l₁ ≤ l₂ and m ≤ l₁ matches,
  * jaro ≤ (m/l₁ + m/l₂ + 1)/3 ≤ (2 + l₁/l₂)/3, and the Winkler boost is
  * capped by jw ≤ 0.6·jaro + 0.4 (ℓ ≤ 4, weight 0.1). So jw ≥ θ forces
  * the length ratio r = min/max ≥ 5θ − 4 — for θ = 0.9 the shorter
  * string must be at least half the longer one. The injected conjunct
  * `min + 1 ≥ (5θ−4)·max` (the +1 slack swallows any floating-point
  * rounding of the bound, keeping the filter strictly conservative)
  * costs two length calls and rejects grossly mismatched pairs BEFORE
  * the O(l₁·l₂) kernel runs — on a 100 TB candidate join, the
  * difference between length arithmetic and the DP matrix per pair.
  * Null semantics are preserved: the guard is null exactly when the
  * original predicate is null (same inputs), and null AND null = null.
  *
  * UNITS: the kernel compares UTF-16 code units (`String.length`), so
  * the guard measures with [[Utf16Length]] — NOT Spark's code-point
  * `Length`, which undercounts supplementary-plane strings by up to 2×
  * and would silently reject pairs whose UTF-16 similarity clears θ
  * (e.g. twenty U+1F600 vs the same plus 13 ASCII chars at θ = 0.95).
  *
  * The rule runs in a fixed-point batch, so it detects an
  * already-guarded predicate (`And(guard, pred)` with a semantically
  * equal guard) and leaves it alone — applying the rule twice is a
  * no-op, not a nested guard tower.
  */
object OptimizeJaroWinklerThreshold extends Rule[LogicalPlan] {

  private def guard(a: Expression, b: Expression, theta: Double): Expression = {
    val c = 5.0 * theta - 4.0
    val la = Utf16Length(a)
    val lb = Utf16Length(b)
    GreaterThanOrEqual(
      Cast(Add(Least(Seq(la, lb)), Literal(1, IntegerType)), DoubleType),
      Multiply(Literal(c, DoubleType),
        Cast(Greatest(Seq(la, lb)), DoubleType)))
  }

  private object JwAtLeast {
    /** Extracts (a, b, θ) from any orientation of "jw compared above θ". */
    def unapply(e: Expression): Option[(Expression, Expression, Double)] = e match {
      case GreaterThanOrEqual(JaroWinkler(a, b), Literal(t: Double, DoubleType)) => Some((a, b, t))
      case GreaterThan(JaroWinkler(a, b), Literal(t: Double, DoubleType)) => Some((a, b, t))
      case LessThanOrEqual(Literal(t: Double, DoubleType), JaroWinkler(a, b)) => Some((a, b, t))
      case LessThan(Literal(t: Double, DoubleType), JaroWinkler(a, b)) => Some((a, b, t))
      case _ => None
    }
  }

  private def rewrite(e: Expression): Expression = e match {
    case And(g, JwAtLeast(a, b, t)) if t > 0.8 && g.semanticEquals(guard(a, b, t)) =>
      e // already guarded: fixed point
    case JwAtLeast(a, b, t) if t > 0.8 =>
      And(guard(a, b, t), e)
    case other => other.mapChildren(rewrite)
  }

  override def apply(plan: LogicalPlan): LogicalPlan =
    plan.transform { case p => p.mapExpressions(rewrite) }
}
