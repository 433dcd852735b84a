package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Incremental maintenance of an aggregate materialized view — the
  * count/sum-family analog of [[Scd2.applyChanges]]: given the
  * materialized `groupBy(key).agg(count, sum)` and a SIGNED delta batch
  * (+1 inserts, −1 deletes/retractions), fold the delta in with work
  * proportional to the DELTA's key set, never a rescan of the base.
  * Count and DECIMAL sum are self-maintainable aggregates (min/max are
  * not — a retracted max needs the base; use the SCD2/rebuild path for
  * those).
  *
  * Shape at scale: the delta reduces to its own keys first (one hash
  * aggregate over the batch), then a full-outer merge on the key with
  * the view — broadcast when the delta is small, shuffle otherwise;
  * groups whose count reaches zero DROP OUT, so a key churning in and
  * out of existence leaves no tombstone row behind. Sums stay DECIMAL
  * end-to-end: a float sum would drift under long insert/delete
  * churn (retraction is exact only in fixed point).
  */
object MvMaintain {

  /** The view shape this module maintains: (key, n_rows, sum_v). */
  def buildMv(df: DataFrame, keyCol: String, valueCol: String): DataFrame =
    df.groupBy(col(keyCol))
      .agg(
        count(lit(1)).as("n_rows"),
        sum(col(valueCol).cast("decimal(18,2)")).cast("decimal(28,2)").as("sum_v"))

  /** Fold a signed delta batch into the view. `signCol` is +1/−1 per
    * delta row; a delete MUST carry the same value the insert did
    * (standard retraction contract).
    */
  def applyDelta(
      mv: DataFrame,
      delta: DataFrame,
      keyCol: String,
      signCol: String,
      valueCol: String): DataFrame = {
    val d = delta.groupBy(col(keyCol)).agg(
      sum(col(signCol).cast("long")).as("__dn"),
      sum(col(signCol) * col(valueCol).cast("decimal(18,2)")).cast("decimal(28,2)").as("__ds"))
    mv.join(d, Seq(keyCol), "full_outer")
      .select(
        col(keyCol),
        (coalesce(col("n_rows"), lit(0L)) + coalesce(col("__dn"), lit(0L))).as("n_rows"),
        (coalesce(col("sum_v"), lit(0).cast("decimal(28,2)")) +
          coalesce(col("__ds"), lit(0).cast("decimal(28,2)")))
          .cast("decimal(28,2)").as("sum_v"))
      .filter(col("n_rows") > 0)
  }
}
