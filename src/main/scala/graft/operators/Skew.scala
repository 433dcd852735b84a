package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Explicit skew mitigation for shuffled equi-joins: salt the skewed
  * (large, hot-keyed) side into `saltFactor` sub-keys and replicate the
  * other side across all salts, so one hot key spreads over `saltFactor`
  * reducers instead of serializing on one.
  *
  * AQE's skew-join splitting (on in [[graft.GraftSession]]) handles most
  * cases at runtime; explicit salting remains the tool when a single key
  * exceeds what one task can hold even after AQE splits (the classic
  * power-law join at 100 TB), or when AQE is unavailable (streaming
  * micro-batch joins).
  */
object Skew {

  /** The skewed side with its `__salt` column attached — the exact frame
    * [[saltedInnerJoin]] builds, exposed so gate queries and specs can
    * assert the spread property (a hot key's rows landing on many distinct
    * salts) against the same salt derivation the join uses.
    */
  def saltLeft(left: DataFrame, saltFactor: Int): DataFrame = {
    require(saltFactor > 0)
    left.withColumn(
      "__salt",
      pmod(xxhash64(struct(left.columns.map(col): _*), monotonically_increasing_id()),
        lit(saltFactor)).cast("int"))
  }

  /** Inner equi-join `left ⋈ right` on `leftKey == rightKey`, with `left`
    * the skewed side. Deterministic salt (no rand() — retries and replays
    * stay stable): hash of the whole left row MIXED WITH the row's position
    * id, so fully duplicate rows — the common degenerate form of key skew —
    * still spread across salts instead of re-colliding on one reducer.
    */
  def saltedInnerJoin(
      left: DataFrame,
      right: DataFrame,
      leftKey: String,
      rightKey: String,
      saltFactor: Int): DataFrame = {
    val saltedLeft = saltLeft(left, saltFactor)
    val replicatedRight = right.withColumn(
      "__salt",
      explode(sequence(lit(0), lit(saltFactor - 1))))
    saltedLeft
      .join(replicatedRight,
        saltedLeft(leftKey) === replicatedRight(rightKey) &&
          saltedLeft("__salt") === replicatedRight("__salt"))
      .drop("__salt")
  }
}
