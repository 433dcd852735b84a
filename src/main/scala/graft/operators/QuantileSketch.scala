package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

import org.apache.spark.sql.graft.bridge

/** Approximate per-group quantiles from a MERGEABLE bottom-k-by-hash
  * sample ([[graft.expressions.BottomKSample]]) — the sketch path next
  * to the exact percentile profile: at 100 TB an exact per-group
  * quantile needs a full sort (or the driver-heavy approx_percentile);
  * the bottom-k sample keeps O(k) state per group, combines map-side,
  * and its kept set is a pure function of the input multiset, so the
  * estimate is deterministic, partition-order-proof, and — with a
  * portable hash — EXACTLY replayable by another engine ranking by the
  * same hash (the q_q20 oracle does). Estimation error is the standard
  * O(1/√k) sampling bound (spec-measured).
  *
  * Quantile interpolation over the sample reuses the built-in
  * `percentile` (the (n−1)p linear rule, bit-identical to DuckDB's
  * quantile_cont — the round-11 probe), applied to the ≤ k sampled
  * values per group after one explode: the heavy input never sorts,
  * only the bounded sample does.
  */
object QuantileSketch {

  /** Per-group output: `(groupCols…, n_rows, sample_size, q_<pct>…)`,
    * one quantile column per requested fraction (named by percent,
    * e.g. q_25). `hashCol` must be a deterministic BIGINT ranking key —
    * use [[graft.functions.Hashing.md5Hash60]] of the row identity for
    * oracle-replayable runs, or xxhash64 for the fast path.
    */
  def bottomKQuantiles(
      df: DataFrame,
      groupCols: Seq[String],
      hashCol: Column,
      valueCol: Column,
      k: Int,
      quantiles: Seq[Double]): DataFrame = {
    require(quantiles.nonEmpty, "need at least one quantile")
    require(quantiles.forall(q => q >= 0.0 && q <= 1.0), "quantiles in [0,1]")
    val sample = bridge.column(
      graft.expressions.BottomKSample(
        bridge.expression(hashCol),
        bridge.expression(valueCol.cast("double")),
        k).toAggregateExpression())
    val grouped = df.groupBy(groupCols.map(col): _*)
      .agg(sample.as("__sample"), count(lit(1)).cast("bigint").as("n_rows"))
    val qCols = quantiles.map { q =>
      percentile(col("__v"), lit(q))
        .as(s"q_${math.round(q * 100)}")
    }
    grouped
      .select((groupCols.map(col) :+ col("n_rows") :+
        explode(col("__sample")).as("__s")): _*)
      .select((groupCols.map(col) :+ col("n_rows") :+
        col("__s.value").as("__v")): _*)
      .groupBy((groupCols.map(col) :+ col("n_rows")).map(c => c): _*)
      .agg(count(lit(1)).cast("bigint").as("sample_size"), qCols: _*)
      .select((groupCols.map(col) :+ col("n_rows") :+ col("sample_size")) ++
        quantiles.map(q => col(s"q_${math.round(q * 100)}")): _*)
  }
}
