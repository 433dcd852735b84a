package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Kaplan–Meier survival estimation (Kaplan & Meier 1958 — the
  * time-to-event workhorse: "how long until a user converts / a job
  * fails / a doc goes stale", with right-censoring handled correctly
  * instead of dropped):
  *
  *   S(t) = Π_{tᵢ ≤ t} (1 − dᵢ / nᵢ)
  *
  * over distinct event times tᵢ with dᵢ events and nᵢ subjects still at
  * risk. Censored subjects leave the risk set at their censor time but
  * contribute no factor — the estimator's whole point.
  *
  * Exactness discipline: durations are INTEGER time units (the caller
  * quantizes — hours, days; never raw floats), so grouping and the risk
  * ledger are exact integer arithmetic. The running product is
  * exp(Σ ln(factor)) over the t-ordered window — a SEQUENTIAL running
  * sum, so both engines add in the identical order and the result is
  * bit-stable before the final 6-decimal rounding (irrational lns, the
  * q_t30 rule). A time where everyone at risk fails (factor 0) is
  * tracked by an exact integer flag — survival is exactly 0.0 from
  * there on, never exp(−inf) arithmetic.
  *
  * Shape at scale: one hash aggregate reduces subjects to the DISTINCT
  * DURATION frame (bounded by the time quantization, the
  * [[MlEval.binaryMetrics]] discipline — hours over a year is 8.8k
  * rows, whatever the subject count); the cumulative windows run on
  * that tiny frame only.
  */
object Survival {

  /** @param subjects one row per subject
    * @param durationCol integer time-to-event-or-censor (≥ 0; null rows
    *        are excluded — an unknown duration is not a 0 duration)
    * @param eventCol 1 = event observed, anything else = right-censored
    * @return one row per distinct duration, ordered:
    *         (t, n_risk, n_events, n_censored, survival)
    */
  def kaplanMeier(
      subjects: DataFrame,
      durationCol: String,
      eventCol: String): DataFrame = {
    val byTime = subjects
      .filter(col(durationCol).isNotNull && col(durationCol) >= 0)
      .groupBy(col(durationCol).cast("long").as("t"))
      .agg(
        sum(when(col(eventCol).cast("int") === 1, 1L).otherwise(0L)).as("d"),
        sum(when(col(eventCol).cast("int") === 1, 0L).otherwise(1L)).as("c"))
    // single-partition windows over the DISTINCT-DURATION frame only
    val byT = Window.orderBy("t")
    val before = byT.rowsBetween(Window.unboundedPreceding, -1)
    val upTo = byT.rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val all = byT.rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing)
    val withRisk = byTime
      .withColumn("n_risk",
        sum(col("d") + col("c")).over(all) -
          coalesce(sum(col("d") + col("c")).over(before), lit(0L)))
      .withColumn("f",
        (col("n_risk") - col("d")).cast("double") / col("n_risk"))
    withRisk
      .withColumn("__ln",
        sum(when(col("f") > 0, log(col("f"))).otherwise(lit(0.0))).over(upTo))
      .withColumn("__dead",
        sum(when(col("f") === 0, 1L).otherwise(0L)).over(upTo))
      .select(
        col("t"),
        col("n_risk"),
        col("d").as("n_events"),
        col("c").as("n_censored"),
        when(col("__dead") > 0, lit(0.0))
          .otherwise(round(exp(col("__ln")), 6)).as("survival"))
      .orderBy("t")
  }
}
