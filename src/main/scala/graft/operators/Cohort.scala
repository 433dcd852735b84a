package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Cohort RETENTION matrix — the classic product-analytics readout over
  * an event stream: users grouped by their FIRST-activity week (the
  * cohort), then for each later week the fraction of the cohort still
  * active. One row per (cohort_week, week_offset):
  * `(cohort_week, week_offset, n_active, cohort_size, retention_rate)`,
  * offset 0 rows carrying rate 1 by construction (every cohort member
  * is active in their first week — a cheap self-check the gate's oracle
  * also replays).
  *
  * Reference frame: the engine's events feed the same per-run analytics
  * a sync run publishes (reference `banner-connector` emits run counts;
  * a warehouse consumer derives retention downstream) — here it is a
  * first-class operator.
  *
  * Shape at scale: one scan projects (user, week) pairs, ONE distinct
  * (user-week activity), one per-user min aggregate (the cohort
  * assignment — same key as the distinct, so AQE reuses the exchange),
  * one broadcast-size cohort-sizes frame, and the final (cohort,
  * offset) hash aggregate. No windows, no per-user event lists; weeks
  * truncate to Monday in BOTH engines (`date_trunc('week', …)`).
  */
object Cohort {

  def retention(
      events: DataFrame,
      userCol: String,
      tsCol: String): DataFrame = {
    val weeks = events
      .filter(col(userCol).isNotNull && col(tsCol).isNotNull)
      .select(
        col(userCol).as("__u"),
        to_date(date_trunc("week", col(tsCol))).as("__w"))
      .distinct()
    val cohorts = weeks.groupBy(col("__u")).agg(min(col("__w")).as("__c"))
    val sizes = cohorts.groupBy(col("__c")).agg(count(lit(1)).as("__cs"))
    weeks
      .join(cohorts, Seq("__u"))
      .groupBy(
        col("__c").as("cohort_week"),
        (datediff(col("__w"), col("__c")) / 7).cast("int").as("week_offset"))
      .agg(count(lit(1)).cast("bigint").as("n_active"))
      .join(sizes.select(col("__c").as("cohort_week"), col("__cs")), Seq("cohort_week"))
      .select(
        col("cohort_week"),
        col("week_offset"),
        col("n_active"),
        col("__cs").cast("bigint").as("cohort_size"),
        (col("n_active").cast("double") / col("__cs")).as("retention_rate"))
  }
}
