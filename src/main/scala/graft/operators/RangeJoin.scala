package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Interval (range) join at scale: pairs within a time tolerance WITHOUT
  * the cartesian product a naive non-equi join plans. Spark turns a pure
  * range predicate into BroadcastNestedLoopJoin (or a full cartesian) —
  * O(|L|·|R|) comparisons and a broadcast bound. Binning converts it to an
  * equi-join: time is bucketed into tolerance-wide bins, the right side
  * replicates into its bin ±1 (3×), the left side keys by its single bin,
  * and the exact predicate filters the residual inside each bin pair.
  *
  *   shuffle     = |L| + 3·|R| rows, hash-partitioned on the bin key,
  *   comparisons = only same-and-adjacent-bin candidates (density-bound,
  *                 not corpus-bound),
  *   correctness = |lt−rt| ≤ tol ⇒ bin(lt) ∈ {bin(rt)−1, bin(rt),
  *                 bin(rt)+1}, and each pair meets at exactly one bin
  *                 value — no dedup pass needed.
  *
  * The same shape handles banded non-equi joins generally (value bands,
  * geo grids); time is the common case.
  */
object RangeJoin {

  /** All (left, right) row pairs with |leftTs − rightTs| ≤ toleranceMicros.
    * Column sets must be disjoint (pre-rename on the caller side).
    */
  def binnedIntervalJoin(
      left: DataFrame,
      right: DataFrame,
      leftTsCol: String,
      rightTsCol: String,
      toleranceMicros: Long): DataFrame = {
    require(toleranceMicros > 0, "tolerance must be positive")
    require(!left.columns.contains("__bin") && !right.columns.contains("__bin"),
      "__bin is reserved by binnedIntervalJoin; rename the input column")
    val lb = left.withColumn("__bin",
      floor(unix_micros(col(leftTsCol)) / toleranceMicros))
    val rb = right.withColumn("__bin",
      explode(array((-1 to 1).map(d =>
        floor(unix_micros(col(rightTsCol)) / toleranceMicros) + d): _*)))
    lb.join(rb, "__bin")
      .filter(abs(unix_micros(col(leftTsCol)) - unix_micros(col(rightTsCol)))
        <= toleranceMicros)
      .drop("__bin")
  }

  /** Nearest-neighbor-in-time join: for each left row, the single right
    * row of the same key minimizing |leftTs − rightTs| within the
    * tolerance — BIDIRECTIONAL, unlike the as-of join's backward-only
    * match ([[AsOfJoin.leftAsOf]] is the "latest prior" special case).
    * Ties break earlier-then-smaller-id, so the pick is total. Left rows
    * with no right row in range are absent (inner semantics).
    *
    * Same binning trick as [[binnedIntervalJoin]], with the key in the
    * join: tolerance-wide time bins keyed by (key, bin), right side
    * exploded to its ±1 bins, so the pure range predicate rides an
    * equi-join — co-partitioned by key, no nested loop. The pick is one
    * `min_by` hash aggregate on the left id (struct ordering carries
    * the tie-break), never a per-key sort.
    */
  def nearestWithin(
      left: DataFrame,
      right: DataFrame,
      keyCol: String,
      leftTsCol: String,
      rightTsCol: String,
      leftIdCol: String,
      rightIdCol: String,
      toleranceMicros: Long): DataFrame = {
    require(toleranceMicros > 0, "tolerance must be positive")
    val lb = left.withColumn("__bin",
      floor(unix_micros(col(leftTsCol)) / toleranceMicros))
    val rb = right.withColumn("__bin",
      explode(array((-1 to 1).map(d =>
        floor(unix_micros(col(rightTsCol)) / toleranceMicros) + d): _*)))
    val pairs = lb.join(rb, Seq(keyCol, "__bin"))
      .withColumn("__d",
        abs(unix_micros(col(leftTsCol)) - unix_micros(col(rightTsCol))))
      .filter(col("__d") <= toleranceMicros)
    pairs
      .groupBy(col(leftIdCol))
      .agg(min_by(
        struct(col(rightIdCol), col("__d")),
        struct(col("__d"), col(rightTsCol), col(rightIdCol))).as("__pick"))
      .select(
        col(leftIdCol),
        col(s"__pick.$rightIdCol").as(rightIdCol),
        col("__pick.__d").as("abs_diff_us"))
  }
}
