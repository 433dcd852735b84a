package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** A/B experiment readout with CUPED variance reduction (Deng, Xu,
  * Kohavi & Walker, WSDM 2013 — the adjustment every large experiment
  * platform applies before reading a metric): the treatment/control
  * difference in means, re-estimated on the covariate-adjusted metric
  * Y′ = Y − θ·(X − X̄) where X is a pre-experiment covariate (same
  * metric, earlier window) and θ = cov(X, Y)/var(X). Randomization makes
  * the adjustment unbiased; correlation between X and Y shrinks the
  * variance by exactly ρ² — smaller experiments, same answer.
  *
  * Exactness discipline (the [[Agreement]] pattern): the input metric and
  * covariate quantize to DECIMAL(15,4), every moment (Σx, Σy, Σxy, Σx²,
  * Σy², per-variant sums/counts) folds as an exact decimal — partition-
  * order-proof — and θ/means/diffs are a fixed tree of IEEE operations on
  * those exact moments, shipped ROUNDED to 6 decimals. A zero-variance
  * covariate is decided by EXACT decimal equality (never a variance's
  * last ulp) and yields θ = 0 — the adjusted readout degrades to the raw
  * one, loudly visible as var_reduction = 0.
  *
  * Shape at scale: one `head()` to pin the two variant labels (tiny,
  * bounded), then ONE corpus aggregate over the unit frame. The caller
  * reduces raw events to one row per experiment UNIT first (the correct
  * unit of analysis — per-event rows would understate variance via
  * within-user correlation).
  */
object Experiment {

  /** @param units one row per experiment unit
    * @return one row: (n, n_a, n_b, variant_a, variant_b, mean_y_a,
    *         mean_y_b, diff, theta, adj_diff, var_reduction) — variant_a
    *         is the lexicographically smaller label; diff/adj_diff are
    *         a − b; var_reduction is ρ²(X, Y) ∈ [0, 1].
    */
  def cuped(
      units: DataFrame,
      variantCol: String,
      metricCol: String,
      covariateCol: String): DataFrame = {
    // drop dirty rows up front so n = n_a + n_b and every moment folds
    // over the SAME row set — a null variant/metric/covariate would
    // otherwise silently skew theta, rho2 and the group means (nulls
    // vanish from sum() but not count(*))
    val units0 = units.filter(
      col(variantCol).isNotNull && col(metricCol).isNotNull &&
        col(covariateCol).isNotNull)
    val vs = col(variantCol).cast("string")
    val head = units0
      .agg(countDistinct(vs).as("nv"), min(vs).as("va"), max(vs).as("vb"))
      .head()
    require(head.getLong(0) == 2,
      s"CUPED diff-in-means needs exactly 2 variants, got ${head.getLong(0)}")
    val va = head.getString(1)
    val vb = head.getString(2)

    val x = col(covariateCol).cast("double").cast("decimal(15,4)")
    val y = col(metricCol).cast("double").cast("decimal(15,4)")
    val agg = units0.agg(
      count(lit(1)).as("n"),
      sum(when(vs === va, 1L).otherwise(0L)).as("n_a"),
      sum(when(vs === vb, 1L).otherwise(0L)).as("n_b"),
      sum(when(vs === va, x)).as("sxa"),
      sum(when(vs === vb, x)).as("sxb"),
      sum(when(vs === va, y)).as("sya"),
      sum(when(vs === vb, y)).as("syb"),
      sum(x).as("sx"), sum(y).as("sy"),
      sum(x * y).as("sxy"), sum(x * x).as("sxx"), sum(y * y).as("syy"),
      // degeneracy decided by EXACT decimal min=max, never by whether a
      // catastrophically-cancelled double numerator lands on 0.0
      (max(x) > min(x)).as("varx"),
      (max(y) > min(y)).as("vary"))

    // exact decimal moments → ONE cast to double each → a fixed tree of
    // IEEE ops: bit-identical across engines because the inputs are
    // (cross-engine decimal arithmetic is where the traps live — widths
    // past 38 diverge between engines, so no decimal×decimal here)
    val nd = col("n").cast("double")
    val sx = col("sx").cast("double")
    val sy = col("sy").cast("double")
    val covNum = nd * col("sxy").cast("double") - sx * sy
    val vxNum = nd * col("sxx").cast("double") - sx * sx
    val vyNum = nd * col("syy").cast("double") - sy * sy
    val theta = when(col("varx"), covNum / vxNum).otherwise(lit(0.0))
    val meanXa = col("sxa").cast("double") / col("n_a")
    val meanXb = col("sxb").cast("double") / col("n_b")
    val meanYa = col("sya").cast("double") / col("n_a")
    val meanYb = col("syb").cast("double") / col("n_b")
    val rho2 = when(col("varx") && col("vary"),
      (covNum * covNum) / (vxNum * vyNum)).otherwise(lit(0.0))

    agg.select(
      col("n").cast("bigint").as("n"),
      col("n_a").cast("bigint").as("n_a"),
      col("n_b").cast("bigint").as("n_b"),
      lit(va).as("variant_a"),
      lit(vb).as("variant_b"),
      round(meanYa, 6).as("mean_y_a"),
      round(meanYb, 6).as("mean_y_b"),
      round(meanYa - meanYb, 6).as("diff"),
      round(theta, 6).as("theta"),
      round(meanYa - meanYb - theta * (meanXa - meanXb), 6).as("adj_diff"),
      round(rho2, 6).as("var_reduction"))
  }

  /** Randomization (re-randomization) test of the observed diff-in-means
    * — Fisher's permutation logic (1935) in the form that distributes:
    * instead of fixed-margin shuffles (a global coupled sort, not a
    * 100 TB operator), each of `nPerms` replicates re-assigns every unit
    * by a deterministic md5 coin ([[Curation.hashUnit]] on unit⊕replicate
    * — engine-portable, oracle-replayable), the standard scalable
    * variant whose null includes assignment-margin variation.
    *
    *   p = (1 + #{replicates with |diff| ≥ |observed|}) / (valid + 1)
    *
    * — the add-one estimator, never exactly 0. Replicates that land a
    * degenerate assignment (either group empty) are EXCLUDED from
    * `valid` rather than silently counted as extreme.
    *
    * Exactness: per-replicate group sums fold as exact DECIMAL(15,4)
    * moments (partition-order-proof); each diff is two divisions on
    * exact sums; |diff_p| ≥ |obs| compares bit-identical doubles — so
    * the COUNT (and hence p) is exact, no rounding tolerance anywhere.
    *
    * Output one row: (n_units, n_perms, n_valid, observed_diff r6,
    * n_extreme, p_value r6).
    *
    * Shape at scale: the unit frame fans out ×nPerms scan-side
    * (explode over a literal range), one hash aggregate by replicate,
    * one nPerms-row reduction. Cost is nPerms × units rows through one
    * shuffle — nPerms is a knob (100–1000), not data.
    */
  def permutationTest(
      units: DataFrame,
      unitCol: String,
      variantCol: String,
      metricCol: String,
      nPerms: Int = 200,
      seed: String = "perm"): DataFrame = {
    require(nPerms >= 1, "need at least one replicate")
    val vs = col(variantCol).cast("string")
    val head = units
      .agg(countDistinct(vs).as("nv"), min(vs).as("va"), max(vs).as("vb"))
      .head()
    require(head.getLong(0) == 2,
      s"permutation test needs exactly 2 variants, got ${head.getLong(0)}")
    val va = head.getString(1)

    val y = col(metricCol).cast("double").cast("decimal(15,4)")
    val obs = units.agg(
      count(lit(1)).as("n_units"),
      (sum(when(vs === va, y)).cast("double") /
        sum(when(vs === va, 1L).otherwise(0L)) -
        sum(when(vs =!= va, y)).cast("double") /
          sum(when(vs =!= va, 1L).otherwise(0L))).as("obs_diff"))

    // replicate fan-out is scan-side; the coin keys on (UNIT, replicate)
    val exploded = units
      .select(col(unitCol).cast("string").as("__u"), y.as("__y"),
        explode(sequence(lit(0), lit(nPerms - 1))).as("__p"))
    val coin = Curation.hashUnit(
      concat_ws("|", col("__u"), col("__p").cast("string")), seed)
    val perPerm = exploded
      .withColumn("__g", (coin < 0.5).cast("int"))
      .groupBy("__p")
      .agg(
        sum(when(col("__g") === 1, col("__y"))).as("s1"),
        sum(when(col("__g") === 1, 1L).otherwise(0L)).as("n1"),
        sum(when(col("__g") === 0, col("__y"))).as("s0"),
        sum(when(col("__g") === 0, 1L).otherwise(0L)).as("n0"))
    val summary = perPerm
      .crossJoin(broadcast(obs))
      .select(col("n_units"), col("obs_diff"),
        when(col("n1") > 0 && col("n0") > 0, lit(1L)).otherwise(0L).as("valid"),
        when(col("n1") > 0 && col("n0") > 0 &&
          abs(col("s1").cast("double") / col("n1") -
            col("s0").cast("double") / col("n0")) >= abs(col("obs_diff")), 1L)
          .otherwise(0L).as("extreme"))
      .groupBy(col("n_units"), col("obs_diff"))
      .agg(sum(col("valid")).as("n_valid"), sum(col("extreme")).as("n_extreme"))
    summary.select(
      col("n_units").cast("bigint").as("n_units"),
      lit(nPerms.toLong).as("n_perms"),
      col("n_valid").cast("bigint").as("n_valid"),
      round(col("obs_diff"), 6).as("observed_diff"),
      col("n_extreme").cast("bigint").as("n_extreme"),
      round((col("n_extreme") + lit(1L)).cast("double") /
        (col("n_valid") + lit(1L)), 6).as("p_value"))
  }
}
