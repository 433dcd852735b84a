package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Multi-touch conversion attribution: every conversion looks back over
  * the same user's touch events within a window and splits credit —
  * first-touch, last-touch, and linear (1/n to each touch) — the three
  * standard marketing-attribution models, emitted together per touch so
  * downstream ROI queries pick a column instead of re-running a model.
  *
  * The as-of join (q_e3) is the LAST-touch special case; this operator
  * materializes the full touch set per conversion, which is what linear
  * (and any position-weighted) credit needs.
  *
  * Shape at scale: touches and conversions are two filters of one event
  * scan, joined on the USER key with the time bounds as a join-time
  * range predicate — co-partitioned by user, no broadcast of either
  * side needed; per-conversion credit shares come from ONE window over
  * the pair frame partitioned by the conversion id; the final roll-up
  * is a hash aggregate on the touch id. Ties (same timestamp) are
  * totalized by the touch id, so first/last flags are deterministic.
  */
object Attribution {

  /** Per-touch attribution summary over `(touchType → convType)` pairs
    * within `lookbackSec`: (touch id, n_conversions it participated in,
    * linear_credit = Σ 1/n, n_first, n_last). Touches that reach no
    * conversion are absent.
    */
  def multiTouch(
      events: DataFrame,
      userCol: String,
      tsCol: String,
      idCol: String,
      typeCol: String,
      touchType: String,
      convType: String,
      lookbackSec: Long): DataFrame = {
    val touches = events.filter(col(typeCol) === touchType)
      .select(col(userCol).as("__u"), col(idCol).as("touch_id"), col(tsCol).as("__ct"))
    val convs = events.filter(col(typeCol) === convType)
      .select(col(userCol).as("__u"), col(idCol).as("__conv"), col(tsCol).as("__pt"))
    val pairs = convs.join(touches, Seq("__u"))
      .where(col("__ct") <= col("__pt") &&
        col("__ct") >= col("__pt") - expr(s"INTERVAL $lookbackSec SECONDS"))
    val perConv = Window.partitionBy("__conv")
    val byTime = perConv.orderBy(col("__ct"), col("touch_id"))
    val byTimeDesc = perConv.orderBy(col("__ct").desc, col("touch_id").desc)
    pairs
      .withColumn("__n", count(lit(1)).over(perConv))
      .withColumn("__isFirst", row_number().over(byTime) === 1)
      .withColumn("__isLast", row_number().over(byTimeDesc) === 1)
      .groupBy(col("touch_id"))
      .agg(
        count(lit(1)).cast("int").as("n_conversions"),
        sum(lit(1.0) / col("__n")).as("linear_credit"),
        sum(when(col("__isFirst"), 1L).otherwise(0L)).cast("int").as("n_first"),
        sum(when(col("__isLast"), 1L).otherwise(0L)).cast("int").as("n_last"))
  }
}
