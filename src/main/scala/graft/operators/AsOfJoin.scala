package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.StructType

/** Left as-of join: for each left row, attach the LATEST right row of the
  * same key with `right.ts <= left.ts` (DuckDB `ASOF LEFT JOIN` / kdb `aj`
  * semantics) — the missing Spark operator most event pipelines hand-roll.
  *
  * Built by composition (SURVEY.md §7.2 preference order (a)): no range
  * join, no per-row subquery, no broadcast. Both sides are tagged and
  * UNIONED, then ONE window pass per key ordered by (ts, side) carries the
  * last-seen right payload forward onto each left row:
  *
  *   shuffle = one hash partition on the key (both sides together),
  *   state   = one struct per row in the running window — O(1) memory,
  *   work    = the per-partition sort, O(n log n) — the same cost any
  *             distributed as-of needs, with NO candidate-pair blowup at
  *             any key cardinality or time density. A naive range-join
  *             formulation explodes to O(|L|·|R|) per key before pruning;
  *             this form never materializes a candidate pair at all.
  *
  * Right rows at exactly `left.ts` match (<= semantics, side ordering puts
  * the right row first); ties between right rows at the identical
  * timestamp break deterministically on `tieBreakCol` (largest wins).
  * Left rows with no preceding right row keep NULL payload columns.
  */
object AsOfJoin {

  /** @param carryCols   right columns to attach, emitted as `prefix+name`
    * @param tieBreakCol right column ordering equal-timestamp right rows
    *                    (largest value wins); pass the right row id
    */
  def leftAsOf(
      left: DataFrame,
      right: DataFrame,
      keyCol: String,
      tsCol: String,
      carryCols: Seq[String],
      tieBreakCol: String,
      prefix: String = "asof_"): DataFrame = {
    require(carryCols.nonEmpty, "carryCols must name at least one right column")
    val payloadType = StructType(carryCols.map(c => right.schema(c)))
    val lPart = left
      .withColumn("__side", lit(1))
      .withColumn("__r", lit(null).cast(payloadType))
      .withColumn("__tb", lit(null).cast(right.schema(tieBreakCol).dataType))
    val rPart = right.select(
      left.columns.toSeq.map {
        case c if c == keyCol || c == tsCol => col(c)
        case c => lit(null).cast(left.schema(c).dataType).as(c)
      } ++ Seq(
        lit(0).as("__side"),
        struct(carryCols.map(col): _*).as("__r"),
        col(tieBreakCol).as("__tb")): _*)
    val w = Window
      .partitionBy(col(keyCol))
      .orderBy(col(tsCol).asc, col("__side").asc, col("__tb").asc_nulls_first)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val joined = lPart.unionByName(rPart)
      .withColumn("__last", last(col("__r"), ignoreNulls = true).over(w))
      .filter(col("__side") === 1)
    carryCols
      .foldLeft(joined) { (df, c) =>
        df.withColumn(prefix + c, col("__last").getField(c))
      }
      .drop("__side", "__r", "__tb", "__last")
  }
}
