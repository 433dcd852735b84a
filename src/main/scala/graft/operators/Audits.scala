package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Dataset-level audit operators: distributional and referential checks
  * that run as single aggregate passes and emit small, alert-ready
  * frames — the "is this table even plausible" layer under the row-level
  * contract validation ([[SchemaValidation]]).
  */
object Audits {

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
