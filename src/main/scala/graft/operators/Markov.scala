package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** First-order Markov transition model over per-key event sequences:
  * order each key's events in time, pair every event with its successor,
  * and estimate P(next | current) from corpus transition counts — the
  * standard first model of user/session behavior (what follows a click?
  * where do error states sink?) and the event-stream analogue of the
  * bigram LM ([[BigramLm]]).
  *
  * Shape at scale: successor pairing is ONE window pass partitioned by
  * the sequence key (each key's events land on one task — no
  * corpus-wide sort); transition counts are one hash aggregate on
  * (current, next), whose cardinality is |state|² — tiny next to the
  * event count — so the context totals fold from the already-reduced
  * matrix and broadcast back. Probabilities are plain integer ratios
  * (n / row total), exactly replayable in SQL.
  */
object Markov {

  /** (cur, next, n, p) for every observed transition; `p` is the
    * row-conditional probability (sums to 1 per `cur`). `tieCol` makes
    * the within-key order total when timestamps can collide.
    */
  def transitionMatrix(
      events: DataFrame,
      keyCol: String,
      tsCol: String,
      evCol: String,
      tieCol: String): DataFrame = {
    val w = Window.partitionBy(keyCol).orderBy(col(tsCol), col(tieCol))
    val trans = events
      .select(col(keyCol), col(tsCol), col(tieCol), col(evCol).as("cur"))
      .withColumn("next", lead("cur", 1).over(w))
      .filter(col("next").isNotNull)
      .groupBy("cur", "next")
      .agg(count(lit(1)).as("n"))
    val ctx = trans.groupBy("cur").agg(sum(col("n")).as("__c"))
    trans
      .join(broadcast(ctx), "cur")
      .select(
        col("cur"), col("next"), col("n"),
        (col("n").cast("double") / col("__c")).as("p"))
  }
}
