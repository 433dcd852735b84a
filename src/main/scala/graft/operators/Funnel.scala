package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Ordered-stage funnel: how many users performed stage 1, then stage 2
  * strictly after their first stage-1 event, then stage 3 strictly after
  * that, ... The classic product-analytics query over an event stream.
  *
  * Shape: one filtered scan + min-aggregate per stage, each joined to the
  * survivors of the previous stage. Every join and aggregate is keyed on
  * the SAME user column, so at 100 TB the stages reuse one hash
  * partitioning (a single exchange on user, then co-partitioned joins)
  * and the frame shrinks monotonically — stage k only carries users who
  * reached stage k. No window over the full event history, no per-user
  * event list materialized.
  */
object Funnel {

  /** Per-stage reach counts. Output: stage ("stageN_<type>"), n_users. */
  def funnelCounts(
      events: DataFrame,
      userCol: String,
      typeCol: String,
      tsCol: String,
      stages: Seq[String]): DataFrame = {
    require(stages.nonEmpty, "funnel needs at least one stage")
    // reached(k): user -> earliest completion time of the stage prefix
    val first = events
      .filter(col(typeCol) === stages.head)
      .groupBy(col(userCol).as("user"))
      .agg(min(col(tsCol)).as("t"))
    val reached = stages.zipWithIndex.tail.scanLeft(first) {
      case (prev, (stage, _)) =>
        events
          .filter(col(typeCol) === stage)
          .select(col(userCol).as("user"), col(tsCol).as("ts"))
          .join(prev.select(col("user"), col("t").as("t_prev")), "user")
          .where(col("ts") > col("t_prev"))
          .groupBy("user")
          .agg(min(col("ts")).as("t"))
    }
    reached
      .zip(stages)
      .zipWithIndex
      .map { case ((df, stage), i) =>
        df.agg(count(lit(1)).cast("int").as("n_users"))
          .select(lit(s"stage${i + 1}_$stage").as("stage"), col("n_users"))
      }
      .reduce(_.union(_))
  }
}
