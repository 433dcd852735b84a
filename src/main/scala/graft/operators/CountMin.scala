package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Count-min sketch: fixed-memory approximate frequency counts.
  *
  * The sketch is a depth × width counter matrix; each key increments one
  * counter per depth row (an independent hash), and a point estimate is
  * the MIN over its depth counters — biased high, never low. At 100 TB
  * this is THE frequency structure: the corpus reduces to depth·width
  * counters in one pass regardless of cardinality, the shuffle after
  * map-side partial aggregation is bounded by depth·width rows per task
  * (not by distinct keys), and the resulting sketch is mergeable across
  * shards/days by plain cell-wise addition — the same re-aggregation
  * property the HLL gate (q_a11) proves for distinct counts.
  *
  * Hashes are salted md5 (the [[Curation]] idiom): deterministic and
  * reproducible in any engine, so the DuckDB oracle can replay the
  * EXACT counter matrix — collisions and all — and the gate is
  * value-exact rather than "within epsilon".
  *
  * Reference counterpart: the ingest pipeline's run counters
  * (SisConnectorService.java:410-461) track exact per-entity totals;
  * this is the sublinear-memory generalization for key frequencies.
  */
object CountMin {

  /** One md5-derived hash row per depth index: bucket(j) =
    * h_j(key) mod width, h_j = first 8 md5 hex chars of "key:cm<j>".
    */
  private def bucket(key: String, j: Int, width: Int) =
    conv(substring(md5(concat_ws(":", col(key).cast("string"), lit(s"cm$j"))), 1, 8), 16, 10)
      .cast("long") % width

  /** Build the sketch: one row per NON-EMPTY cell, (depth_j, bucket, cnt).
    * One explode to depth rows per input row, then a single hash
    * aggregate — partial aggregation collapses each task's contribution
    * to ≤ depth·width rows before the exchange, so the shuffle is
    * sketch-sized, not data-sized.
    */
  def sketch(df: DataFrame, keyCol: String, depth: Int, width: Int): DataFrame = {
    val cells = explode(array((0 until depth).map(j =>
      struct(lit(j).as("depth_j"), bucket(keyCol, j, width).as("bucket"))): _*))
    df.where(col(keyCol).isNotNull)
      .select(cells.as("__c"))
      .groupBy(col("__c.depth_j").as("depth_j"), col("__c.bucket").as("bucket"))
      .agg(count(lit(1)).as("cnt"))
  }

  /** Merge two sketches built with the SAME (depth, width): cell-wise
    * addition. This is the shard/day re-aggregation path — estimates
    * from the merged sketch are exactly the estimates the union of the
    * inputs would have produced, because each cell is a plain sum.
    */
  def merge(a: DataFrame, b: DataFrame): DataFrame =
    a.unionByName(b)
      .groupBy("depth_j", "bucket")
      .agg(sum(col("cnt")).as("cnt"))

  /** Point-estimate the frequency of each distinct key in `probes`:
    * min over the key's depth counters. The sketch (≤ depth·width rows)
    * is broadcast; each probe key joins its depth cells and one hash
    * aggregate takes the min. Estimates are exact upper bounds:
    * est ≥ true count always, with equality unless every depth row
    * collides the key with another live key.
    */
  def estimate(
      probes: DataFrame, keyCol: String,
      sketch: DataFrame, depth: Int, width: Int): DataFrame = {
    val cells = explode(array((0 until depth).map(j =>
      struct(lit(j).as("depth_j"), bucket(keyCol, j, width).as("bucket"))): _*))
    probes.select(col(keyCol), cells.as("__c"))
      .select(col(keyCol), col("__c.depth_j").as("depth_j"), col("__c.bucket").as("bucket"))
      .join(broadcast(sketch), Seq("depth_j", "bucket"), "left")
      .na.fill(0L, Seq("cnt"))
      .groupBy(col(keyCol))
      .agg(min(col("cnt")).as("est_cnt"))
  }
}
