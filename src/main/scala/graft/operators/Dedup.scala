package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Row-collapse operators from the reference's driver-side Java dataflow,
  * restated as single-shuffle Spark aggregations.
  */
object Dedup {

  /** A3 "last-row-wins": the reference loops over a multi-row result
    * overwriting one POJO, silently keeping the final row
    * (SisConnectorService.java:240-293). Made explicit and deterministic:
    * for each key, take every value column from the row with the maximum
    * `orderCol` (`max_by` is a declarative aggregate — one shuffle, partial
    * aggregation map-side, whole-stage codegen).
    */
  def lastRowWins(df: DataFrame, keyCols: Seq[String], orderCol: String): DataFrame = {
    val valueCols = df.columns.filterNot(c => keyCols.contains(c) || c == orderCol)
    val aggs = valueCols.map(c => max_by(col(c), col(orderCol)).as(c)) :+
      max(col(orderCol)).as(orderCol)
    df.groupBy(keyCols.map(col): _*).agg(aggs.head, aggs.tail: _*)
  }

  /** Last-row-wins under a possibly NON-unique order column: deterministic
    * total order via descending (orderCols ++ remaining value columns), one
    * row kept per key. Costs a sort within each hash partition (window) vs
    * `lastRowWins`'s pure hash aggregate — prefer `lastRowWins` when the
    * order column is unique per key.
    */
  def lastRowWinsTotal(df: DataFrame, keyCols: Seq[String], orderCols: Seq[String]): DataFrame = {
    val tieBreak = df.columns.filterNot(c => keyCols.contains(c) || orderCols.contains(c))
    val w = Window
      .partitionBy(keyCols.map(col): _*)
      .orderBy((orderCols ++ tieBreak).map(c => col(c).desc): _*)
    df.withColumn("__graft_rn", row_number().over(w))
      .filter(col("__graft_rn") === 1)
      .drop("__graft_rn")
  }

  /** Exact whole-row dedup over selected columns (hash aggregate). */
  def distinctRows(df: DataFrame, cols: Seq[String]): DataFrame =
    df.select(cols.map(col): _*).distinct()

  /** Exact dedup keeping one representative row per group: the row with the
    * minimum `tieBreaker`. One shuffle on the dedup key.
    */
  def keepFirstBy(df: DataFrame, dedupCols: Seq[String], tieBreaker: String): DataFrame = {
    val others = df.columns.filterNot(c => dedupCols.contains(c) || c == tieBreaker)
    val aggs = min(col(tieBreaker)).as(tieBreaker) +:
      others.map(c => min_by(col(c), col(tieBreaker)).as(c)).toSeq
    df.groupBy(dedupCols.map(col): _*)
      .agg(aggs.head, aggs.tail: _*)
      .select(df.columns.map(col): _*)
  }
}
