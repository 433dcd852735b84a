package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Label-noise estimation by CONFIDENT LEARNING (Northcutt–Jiang–Chuang,
  * JAIR 2021 §3, the count form): given per-example predicted
  * posteriors and the ASSERTED labels, estimate the joint distribution
  * of (given label, latent true label) by counting examples whose
  * posterior for a class clears that class's own mean-posterior
  * threshold — the off-diagonal mass is the estimated labeling-error
  * rate, and the flagged cells are the re-audit queue. This is the
  * label-quality gate a training-data pipeline runs between labeling
  * and training.
  *
  * Determinism contract: posteriors are the sigmoid of the scorer's
  * 6-decimal margin, re-rounded to 6 decimals and carried as
  * DECIMAL(9,6); the class thresholds t_j = mean(p_j | label = j) are
  * never materialized as divided doubles — the comparison cross-
  * multiplies (p_j · n_j ≥ Σ p_j), so every count is exact-decimal
  * arithmetic and partition-order-proof end to end (the MlEval
  * quantization discipline).
  *
  * Shape at scale: one aggregate for the two thresholds (a broadcast
  * one-row frame), one map-side confident-label assignment, one hash
  * aggregate for the 2×2 joint — no per-class shuffles, no driver math.
  */
object LabelNoise {

  /** Input: a scored frame with a binary given-label column and the
    * log-odds margin column (the [[NaiveBayes.score]] /
    * [[QualityClassifier]] output shape). Output: one row per confident
    * cell `(given_label, confident_label, n_docs, cell_rate)`; examples
    * confident for NEITHER class are excluded (the CL convention).
    */
  def confidentJoint(
      scored: DataFrame, labelCol: String, marginCol: String): DataFrame = {
    val p1 = round(lit(1.0) / (lit(1.0) + exp(-col(marginCol))), 6)
      .cast("decimal(9,6)")
    val base = scored.select(
        col(labelCol).cast("int").as("y"), p1.as("p1"))
      .withColumn("p0", lit(1.0).cast("decimal(9,6)") - col("p1"))
    val th = base.agg(
      sum(when(col("y") === 1, col("p1"))).as("s1"),
      sum(when(col("y") === 1, 1L).otherwise(0L)).cast("bigint").as("n1"),
      sum(when(col("y") === 0, col("p0"))).as("s0"),
      sum(when(col("y") === 0, 1L).otherwise(0L)).cast("bigint").as("n0"))
    val conf1 = col("p1") * col("n1") >= col("s1")
    val conf0 = col("p0") * col("n0") >= col("s0")
    val confidentLabel =
      when(conf1 && conf0, when(col("p1") >= col("p0"), 1).otherwise(0))
        .when(conf1, 1)
        .when(conf0, 0)
    val cells = base.crossJoin(broadcast(th))
      .select(col("y").as("given_label"), confidentLabel.as("confident_label"))
      .filter(col("confident_label").isNotNull)
      .groupBy("given_label", "confident_label")
      .agg(count(lit(1)).cast("bigint").as("n_docs"))
    val tot = cells.agg(sum(col("n_docs")).cast("bigint").as("tn"))
    cells.crossJoin(broadcast(tot))
      .select(
        col("given_label"), col("confident_label"), col("n_docs"),
        (col("n_docs").cast("double") / col("tn")).as("cell_rate"))
  }
}
