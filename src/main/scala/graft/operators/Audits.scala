package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Dataset-level audit operators: distributional and referential checks
  * that run as single aggregate passes and emit small, alert-ready
  * frames — the "is this table even plausible" layer under the row-level
  * contract validation ([[SchemaValidation]]).
  */
object Audits {

  /** Sketch-based distinct-set OVERLAP between two slices — "how many
    * distinct customers do these two segments share" answered from
    * MERGEABLE state: per-slice HLL sketches (the q_a11 fixed-register
    * structure) combine by inclusion–exclusion,
    * est(A∩B) = est(A) + est(B) − est(A∪B), where est(A∪B) is the
    * UNION of the two sketches — never a re-scan, so pre-aggregated
    * per-slice sketches answer any pairwise overlap after the fact.
    * One corpus pass builds both sketches and both exact counts; the
    * exact intersection (for the audit bound) is one distinct-key
    * aggregate with per-slice presence flags — also a single pass.
    * Returns one row: exact counts plus `est_ok` (inclusion–exclusion
    * error is bounded relative to the UNION cardinality — each of the
    * three estimates carries the sketch's relative error on its own
    * magnitude, so the bound is `tol · exact_union`, not
    * `tol · exact_intersection`).
    */
  def hllIntersection(
      df: DataFrame,
      sliceCol: String,
      valueCol: String,
      sliceA: String,
      sliceB: String,
      tol: Double = 0.05): DataFrame = {
    // ONE corpus pass: the distinct-value presence frame feeds exact
    // counts AND the per-slice sketches in the same closing aggregate
    // (HLL depends only on the distinct value set, so sketching the
    // vocabulary frame is bit-identical to sketching the raw rows)
    val one = df.filter(col(sliceCol).isin(sliceA, sliceB))
      .groupBy(col(valueCol).as("__v"))
      .agg(
        max(when(col(sliceCol) === sliceA, 1).otherwise(0)).as("__ina"),
        max(when(col(sliceCol) === sliceB, 1).otherwise(0)).as("__inb"))
      .agg(
        sum(col("__ina")).cast("bigint").as("exact_a"),
        sum(col("__inb")).cast("bigint").as("exact_b"),
        count(lit(1)).cast("bigint").as("exact_union"),
        sum(col("__ina") * col("__inb")).cast("bigint").as("exact_intersection"),
        hll_sketch_agg(when(col("__ina") === 1, col("__v"))).as("__ska"),
        hll_sketch_agg(when(col("__inb") === 1, col("__v"))).as("__skb"))
    one.select(
      lit(sliceA).as("slice_a"), lit(sliceB).as("slice_b"),
      col("exact_a"), col("exact_b"), col("exact_union"),
      col("exact_intersection"),
      (abs((hll_sketch_estimate(col("__ska")) +
        hll_sketch_estimate(col("__skb")) -
        hll_sketch_estimate(hll_union(col("__ska"), col("__skb")))) -
        col("exact_intersection")) <= col("exact_union") * tol).as("est_ok"))
  }

  /** Benford first-digit audit: observed vs expected leading-digit
    * distribution of a positive numeric column, with each digit's
    * chi-square contribution `(obs − n·p)² / (n·p)`. Fabricated or
    * truncated financial columns drift from log10(1 + 1/d) in ways
    * summary stats miss. One hash aggregate on the digit; the digit is
    * taken from the DECIMAL's string form so both engines read the same
    * character. Rows with null/≤ 0 values are excluded (no leading
    * digit to audit).
    */
  def benfordFirstDigit(df: DataFrame, valueCol: String): DataFrame = {
    val v = col(valueCol).cast("decimal(18,2)")
    val digit = substring(v.cast("string"), 1, 1).cast("int")
    val counts = df
      .where(v.isNotNull && v > 0)
      .groupBy(digit.as("digit"))
      .agg(count(lit(1)).as("n_obs"))
    val total = counts.agg(sum(col("n_obs")).as("__n"))
    counts.crossJoin(broadcast(total))
      .select(
        col("digit"),
        col("n_obs"),
        (col("n_obs").cast("double") / col("__n")).as("obs_share"),
        log10(lit(1.0) + lit(1.0) / col("digit")).as("exp_share"),
        (pow(col("n_obs").cast("double") - col("__n") * log10(lit(1.0) + lit(1.0) / col("digit")), 2)
          / (col("__n") * log10(lit(1.0) + lit(1.0) / col("digit")))).as("chi2_term"))
  }

  /** Orphan count for one foreign-key edge: (n_child_rows, n_orphans) —
    * child rows whose non-null `fkCol` has no match in `parent.pkCol`.
    * A left-anti join on the key; broadcast when the parent key set is
    * small, shuffle otherwise — Catalyst's call.
    */
  def fkOrphans(
      child: DataFrame, fkCol: String,
      parent: DataFrame, pkCol: String): DataFrame = {
    val keyed = child.where(col(fkCol).isNotNull)
    val orphans = keyed.join(
      parent.select(col(pkCol).as("__pk")).distinct(),
      col(fkCol) === col("__pk"), "left_anti")
    keyed.agg(count(lit(1)).as("n_child"))
      .crossJoin(orphans.agg(count(lit(1)).as("n_orphans")))
  }
}
