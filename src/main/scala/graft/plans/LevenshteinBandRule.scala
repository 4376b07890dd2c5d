package graft.plans

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.expressions.{Abs, And, Expression, GreaterThan, GreaterThanOrEqual, Length, LessThan, LessThanOrEqual, Levenshtein, Literal, Subtract}
import org.apache.spark.sql.catalyst.plans.logical.{Filter, Join, LogicalPlan}
import org.apache.spark.sql.catalyst.rules.Rule
import org.apache.spark.sql.types.IntegerType

/** Optimizer rule — the `Rule[LogicalPlan]` rung of the extension ladder:
  * rewrites bounded edit-distance predicates into their cheap, equivalent
  * fast form.
  *
  *   `levenshtein(a, b) <= k`  becomes
  *   `abs(length(a) - length(b)) <= k AND levenshtein(a, b, k) >= 0`
  *
  * Soundness: every edit changes the length by at most 1, so
  * `|len(a) − len(b)|` lower-bounds the edit distance — the band conjunct
  * rejects non-candidates with two length reads instead of an O(|a|·|b|)
  * DP table, and conjunct order short-circuits inside codegen. The
  * surviving pairs run Spark's THRESHOLDED Levenshtein (early-exit banded
  * DP, returns −1 iff distance > k, hence the `>= 0` spelling) — O(k·n)
  * instead of O(n²) per comparison. Null propagation is identical on both
  * forms (null input → null predicate → row filtered), and the rewrite
  * leaves no bare `levenshtein <= k` behind, so the rule is idempotent
  * under the optimizer's fixed-point batches.
  *
  * Applied to Filter conditions and Join conditions (blocked fuzzy joins
  * spell the cutoff in either position).
  */
object LevenshteinBandRule extends Rule[LogicalPlan] {

  private def banded(a: Expression, b: Expression,
      cut: Literal): Expression =
    And(
      LessThanOrEqual(Abs(Subtract(Length(a), Length(b))), cut),
      GreaterThanOrEqual(Levenshtein(a, b, Some(cut)), Literal(0)))

  // both comparison directions per operator: no optimizer rule
  // canonicalizes `k >= levenshtein(a, b)` into the left-hand spelling,
  // so without the commuted cases those semantically identical
  // predicates silently kept the full O(n²) DP
  private def rewrite(cond: Expression): Expression = cond.transformUp {
    case LessThanOrEqual(Levenshtein(a, b, None), lit @ Literal(k: Int, IntegerType))
        if k >= 0 =>
      banded(a, b, lit)
    case GreaterThanOrEqual(lit @ Literal(k: Int, IntegerType), Levenshtein(a, b, None))
        if k >= 0 =>
      banded(a, b, lit)
    case LessThan(Levenshtein(a, b, None), Literal(k: Int, IntegerType))
        if k >= 1 =>
      banded(a, b, Literal(k - 1))
    case GreaterThan(Literal(k: Int, IntegerType), Levenshtein(a, b, None))
        if k >= 1 =>
      banded(a, b, Literal(k - 1))
  }

  override def apply(plan: LogicalPlan): LogicalPlan = plan.transform {
    case f @ Filter(cond, _) =>
      val next = rewrite(cond)
      if (next fastEquals cond) f else f.copy(condition = next)
    case j @ Join(_, _, _, Some(cond), _) =>
      val next = rewrite(cond)
      if (next fastEquals cond) j else j.copy(condition = Some(next))
  }
}

/** Idempotent registration of graft's optimizer rules on a session (the
  * imperative path; `GraftExtensions` injects the same rule for
  * spark.sql.extensions deployments).
  */
object GraftRules {
  def register(spark: SparkSession): Unit = {
    val cur = spark.experimental.extraOptimizations
    if (!cur.contains(LevenshteinBandRule))
      spark.experimental.extraOptimizations = cur :+ LevenshteinBandRule
  }
}
