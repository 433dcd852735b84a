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

  /** Top-k order-3 event paths: each key's ordered event sequence yields
    * its consecutive (e1, e2, e3) trigrams (two `lead`s over the SAME
    * per-key window — one window pass, no self-join), counted corpus-wide
    * and cut with a total tie-break. The path-mining step above the
    * transition matrix: which whole journeys recur, not just which edges.
    */
  def topPaths(
      events: DataFrame,
      keyCol: String,
      tsCol: String,
      evCol: String,
      tieCol: String,
      k: Int): DataFrame = {
    require(k > 0, "k must be positive")
    val w = Window.partitionBy(keyCol).orderBy(col(tsCol), col(tieCol))
    events
      .select(col(keyCol), col(tsCol), col(tieCol), col(evCol).as("e1"))
      .withColumn("e2", lead("e1", 1).over(w))
      .withColumn("e3", lead("e1", 2).over(w))
      .filter(col("e3").isNotNull)
      .groupBy("e1", "e2", "e3")
      .agg(count(lit(1)).as("n"))
      .orderBy(col("n").desc, col("e1"), col("e2"), col("e3"))
      .limit(k)
  }
}
