package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Mann–Whitney U / Wilcoxon rank-sum test (Mann–Whitney 1947) — the
  * NONPARAMETRIC two-sample location test next to Welch's t (q_q19):
  * the readout that survives the heavy-tailed, outlier-ridden score
  * distributions the Hill audit (q_q21) flags, where a mean-based t is
  * unstable. Used for "did the new scorer shift the distribution"
  * checks where normality is indefensible.
  *
  * Exactness contract (what makes it gateable): ranks never
  * materialize per row — the test reduces to per-DISTINCT-VALUE counts
  * (one hash aggregate), midranks form as exact DECIMALs
  * (cumBelow + (t+1)/2 — halves are exact at scale 1), the rank sum
  * R₁ = Σ t₁(v)·midrank(v) and the tie correction Σ(t³−t) stay exact
  * integers/decimals, and only the final z forms in IEEE (one fixed
  * expression, rounded to 6). Partition-order-proof by construction.
  *
  * Scale shape: one groupBy(value) aggregate (cardinality-bounded for
  * real measurement columns), one window cumsum over the DISTINCT
  * values (tiny frame), one single-row reduce. The corpus never sorts.
  *
  * z uses the tie-corrected normal approximation
  * σ² = n₁n₂/12 · ((N+1) − Σ(t³−t)/(N(N−1))); the continuity
  * correction is omitted (documented — at corpus n it is noise).
  *
  * Exactness bounds: u_a/u_b are exact while n₁·n₂ < 9e15 (double
  * holds the halved integer exactly below 2^53); the tie term Σ(t³−t)
  * is DECIMAL(38,0)-exact up to t ≈ 1e12 rows PER DISTINCT VALUE
  * (t³ ≤ 1e36 < 1e38) — far past the ~2.1e6 where a BIGINT t³ would
  * wrap, which matters precisely for the tie-saturated low-cardinality
  * columns this test is marketed for.
  */
object MannWhitney {

  /** One-row result: `(n_a, n_b, u_a, u_b, z)` for the two-sided test
    * of `valueCol` between `groupVal_a` and `groupVal_b` rows of
    * `groupCol` (other groups ignored). `u_a` is group A's U statistic
    * (DECIMAL-exact, halves possible under ties); z is rounded to 6
    * and NULL when either group is empty or the variance is 0 (all
    * values tied).
    */
  def uTest(
      df: DataFrame,
      groupCol: String,
      valueCol: String,
      groupA: String,
      groupB: String): DataFrame = {
    val tagged = df
      .filter(col(groupCol).isin(groupA, groupB) && col(valueCol).isNotNull)
      .select(
        (col(groupCol) === groupA).as("__isA"),
        col(valueCol).as("__v"))
    val perValue = tagged.groupBy(col("__v")).agg(
      sum(when(col("__isA"), 1L).otherwise(0L)).as("ta"),
      sum(when(!col("__isA"), 1L).otherwise(0L)).as("tb"))
    val w = org.apache.spark.sql.expressions.Window
      .orderBy(col("__v"))
      .rowsBetween(org.apache.spark.sql.expressions.Window.unboundedPreceding, -1)
    val ranked = perValue.select(
      col("ta"), col("tb"),
      (col("ta") + col("tb")).as("t"),
      coalesce(sum(col("ta") + col("tb")).over(w), lit(0L)).as("below"))
    // DOUBLED rank sum keeps everything integral (midranks are halves):
    // r1x2 = Σ tₐ(v)·(2·below + t + 1) — exact BIGINT, no decimal
    // division semantics to match across engines
    val agg = ranked.agg(
      sum(col("ta")).cast("bigint").as("na"),
      sum(col("tb")).cast("bigint").as("nb"),
      sum(col("ta") * (col("below") * 2 + col("t") + 1)).cast("bigint")
        .as("r1x2"),
      // t³ in DECIMAL(38,0): a tie group past ~2.1M rows overflows
      // t³ in BIGINT, and tie-saturated low-cardinality columns (the
      // exact target of this operator) grow t with the corpus. Decimal
      // keeps Σ(t³−t) exact up to t ≈ 1e12 per distinct value.
      sum(col("t").cast("decimal(38,0)") * col("t") * col("t") - col("t"))
        .cast("decimal(38,0)").as("tcorr"))
    val na = col("na").cast("double")
    val nb = col("nb").cast("double")
    val nn = na + nb
    // u_a = (r1x2 − na(na+1)) / 2 — the halved exact integer; double is
    // exact below 2^53 (documented bound: pairs na·nb < 9e15)
    val u1 = (col("r1x2") - col("na") * (col("na") + 1)).cast("double") / lit(2.0)
    val mean = na * nb / lit(2.0)
    val sigma2 = na * nb / lit(12.0) *
      ((nn + lit(1.0)) - col("tcorr").cast("double") / (nn * (nn - lit(1.0))))
    agg.select(
      col("na").as("n_a"),
      col("nb").as("n_b"),
      u1.as("u_a"),
      (na * nb - u1).as("u_b"),
      when(col("na") > 0 && col("nb") > 0 && sigma2 > 0,
        round((u1 - mean) / sqrt(sigma2), 6)).as("z"))
  }
}
