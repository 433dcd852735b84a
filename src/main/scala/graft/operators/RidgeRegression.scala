package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Closed-form ridge (Tikhonov) regression on two features + intercept
  * (Hoerl–Kennard 1970) — the missing LINEAR model next to the
  * logistic-GD classifier (q_c13) and Naive Bayes (q_c22): at 100 TB a
  * regression is one pass of EXACT-DECIMAL moment sums (the q_q19
  * Welch discipline) reduced to a single broadcast row, and the
  * (d+1)×(d+1) normal-equation solve is a FIXED closed-form expression
  * in the projection — no gradient loop, no driver-side linear
  * algebra, no iteration count to tune. d = 2 keeps the adjugate
  * tractable and covers the workhorse "y ~ a + b·x1 + c·x2" audit;
  * wider designs belong to the iterative path.
  *
  * Replayability: inputs quantize to DECIMAL(18,6); every moment
  * (Σx, Σx², Σxy, …) is an exact decimal sum — partition-order-proof —
  * cast to double ONCE; determinant, cofactors, coefficients, and R²
  * then form in one fixed IEEE expression tree both engines write
  * identically. λ penalizes the feature diagonal only (the standard
  * convention: the intercept is not shrunk). A singular system
  * (constant feature, λ = 0) has det = 0 and yields NULL coefficients
  * rather than garbage.
  */
object RidgeRegression {

  /** One-row fit: `(n, b0, b1, b2, r2)` for y ≈ b0 + b1·x1 + b2·x2,
    * coefficients rounded to 6.
    */
  def ridge2(
      df: DataFrame,
      yCol: String,
      x1Col: String,
      x2Col: String,
      lambda: Double = 0.0): DataFrame = {
    require(lambda >= 0.0, "lambda must be >= 0")
    def q(c: String): Column = col(c).cast("decimal(18,6)")
    val (y, x1, x2) = (q(yCol), q(x1Col), q(x2Col))
    val moments = df
      .filter(col(yCol).isNotNull && col(x1Col).isNotNull && col(x2Col).isNotNull)
      .agg(
        count(lit(1)).cast("double").as("n"),
        sum(x1).cast("double").as("s1"),
        sum(x2).cast("double").as("s2"),
        sum(x1 * x1).cast("double").as("s11"),
        sum(x1 * x2).cast("double").as("s12"),
        sum(x2 * x2).cast("double").as("s22"),
        sum(y).cast("double").as("sy"),
        sum(y * y).cast("double").as("syy"),
        sum(x1 * y).cast("double").as("s1y"),
        sum(x2 * y).cast("double").as("s2y"))
    val lam = lit(lambda)
    def c(n: String) = col(n)
    val a11 = c("s11") + lam
    val a22 = c("s22") + lam
    val det = c("n") * (a11 * a22 - c("s12") * c("s12")) -
      c("s1") * (c("s1") * a22 - c("s12") * c("s2")) +
      c("s2") * (c("s1") * c("s12") - a11 * c("s2"))
    val c00 = a11 * a22 - c("s12") * c("s12")
    val c01 = -(c("s1") * a22 - c("s12") * c("s2"))
    val c02 = c("s1") * c("s12") - a11 * c("s2")
    val c11 = c("n") * a22 - c("s2") * c("s2")
    val c12 = -(c("n") * c("s12") - c("s1") * c("s2"))
    val c22 = c("n") * a11 - c("s1") * c("s1")
    val b0 = (c00 * c("sy") + c01 * c("s1y") + c02 * c("s2y")) / det
    val b1 = (c01 * c("sy") + c11 * c("s1y") + c12 * c("s2y")) / det
    val b2 = (c02 * c("sy") + c12 * c("s1y") + c22 * c("s2y")) / det
    val fit = moments.select(
      c("n").cast("bigint").as("n_rows"),
      when(det =!= 0, b0).as("__b0"),
      when(det =!= 0, b1).as("__b1"),
      when(det =!= 0, b2).as("__b2"),
      c("n"), c("s1"), c("s2"), c("s11"), c("s12"), c("s22"),
      c("sy"), c("syy"), c("s1y"), c("s2y"))
    // R² from the same moments: SSE = Σy² − 2·bᵀv + bᵀAb (λ-free A —
    // goodness of fit is measured on the data, not the penalty)
    def b(n: String) = col(n)
    val sse = c("syy") -
      lit(2.0) * (b("__b0") * c("sy") + b("__b1") * c("s1y") + b("__b2") * c("s2y")) +
      (b("__b0") * b("__b0") * c("n") + b("__b1") * b("__b1") * c("s11") +
        b("__b2") * b("__b2") * c("s22") +
        lit(2.0) * b("__b0") * b("__b1") * c("s1") +
        lit(2.0) * b("__b0") * b("__b2") * c("s2") +
        lit(2.0) * b("__b1") * b("__b2") * c("s12"))
    val sst = c("syy") - c("sy") * c("sy") / c("n")
    fit.select(
      col("n_rows"),
      round(col("__b0"), 6).as("b0"),
      round(col("__b1"), 6).as("b1"),
      round(col("__b2"), 6).as("b2"),
      when(col("__b0").isNotNull && sst > 0,
        round(lit(1.0) - sse / sst, 6)).as("r2"))
  }
}
