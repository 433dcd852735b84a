package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** One-pass column profiling: row count, null count, exact distinct
  * count per column, emitted one row per column — the completeness
  * report a sync run publishes next to its data (the engine's run report
  * S11 counts rows; this profiles them).
  *
  * Shape at scale: a SINGLE aggregate pass computes every metric for
  * every column (count + conditional sums are one shared scan;
  * `count(DISTINCT x)` for multiple columns expands to one aggregate per
  * distinct-set under Spark's expand operator, still map-side partial),
  * then the one-row result is exploded into the per-column layout
  * driver-side. Nothing here scales with row count except the scan.
  */
object DataProfile {

  def profile(df: DataFrame, cols: Seq[String]): DataFrame = {
    require(cols.nonEmpty, "profile at least one column")
    val aggs =
      count(lit(1)).as("__n") +:
        cols.flatMap(c => Seq(
          sum(when(col(c).isNull, 1L).otherwise(0L)).as(s"__null_$c"),
          countDistinct(col(c)).as(s"__dist_$c")))
    val one = df.agg(aggs.head, aggs.tail: _*)
    val entries = array(cols.map(c => struct(
      lit(c).as("col_name"),
      col("__n").cast("bigint").as("n_rows"),
      col(s"__null_$c").cast("bigint").as("n_null"),
      col(s"__dist_$c").cast("bigint").as("n_distinct"))): _*)
    one
      .select(explode(entries).as("p"))
      .select(col("p.col_name"), col("p.n_rows"), col("p.n_null"),
        col("p.n_distinct"))
      .withColumn("null_rate",
        col("n_null").cast("double") / col("n_rows"))
  }
}
