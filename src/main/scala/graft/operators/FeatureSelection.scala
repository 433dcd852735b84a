package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.functions.TextAnalysis

/** χ² feature selection over token PRESENCE (Yang & Pedersen 1997, "A
  * comparative study on feature selection in text categorization"): rank
  * vocabulary by how strongly a token's presence associates with the
  * class label — the standard pre-training cut that shrinks a
  * classifier's feature space to the discriminative tail before
  * [[NaiveBayes]] / [[QualityClassifier]] ever run.
  *
  * For each token the 2×2 presence contingency (a = class-1 docs
  * containing it, b = class-0 docs containing it, c/d the complements):
  * χ² = N·(ad − bc)² / ((a+b)(c+d)(a+c)(b+d)).
  *
  * Scale shape: one explode + DISTINCT to (doc, token) presence (the
  * distinct is the corpus-sized shuffle, keyed on the pair), then ONE
  * token-keyed hash aggregate to the vocabulary-bounded (a, b) frame;
  * doc totals ride along as a broadcast one-row frame; the χ²
  * arithmetic is scan-side. Top-k under (χ² desc, token asc) via
  * TakeOrdered — no global sort materialization.
  *
  * Determinism: a, b, N₀, N₁ are exact integers in both engines;
  * (ad − bc) stays integer; the single division runs on
  * identically-ordered double products, and the result ships rounded
  * to 6 decimals. Tokens whose contingency denominator is 0 (present
  * in every doc, or label single-class) carry no signal and are
  * excluded rather than emitted as NULL/∞.
  */
object FeatureSelection {

  /** Top-`topK` tokens by χ²: (token, df1, df0, chi2). */
  def chiSquareTokens(
      df: DataFrame,
      idCol: String,
      textCol: String,
      labelCol: String,
      topK: Int = 50): DataFrame = {
    require(topK >= 1, "topK must be >= 1")
    val presence = df
      .select(col(idCol), col(labelCol).cast("int").as("__y"),
        explode(TextAnalysis.tokens(col(textCol))).as("token"))
      .select(col(idCol), col("__y"), col("token"))
      .distinct()
    val counts = presence.groupBy("token").agg(
      sum(when(col("__y") === 1, lit(1L)).otherwise(lit(0L))).as("a"),
      sum(when(col("__y") === 1, lit(0L)).otherwise(lit(1L))).as("b"))
    val totals = df.agg(
      sum(when(col(labelCol).cast("int") === 1, lit(1L)).otherwise(lit(0L))).as("__n1"),
      count(lit(1)).as("__n"))
    val c = col("__n1") - col("a")
    val d = (col("__n") - col("__n1")) - col("b")
    // (ad − bc) exact in BIGINT; the squared term and the marginal
    // product as doubles in ONE fixed multiplication order so both
    // engines compute the identical IEEE result beyond 2^53
    val diff = (col("a") * d - col("b") * c).cast("double")
    val num = col("__n").cast("double") * (diff * diff)
    val den = (col("a") + col("b")).cast("double") *
      (c + d).cast("double") *
      (col("a") + c).cast("double") *
      (col("b") + d).cast("double")
    counts.crossJoin(broadcast(totals))
      .where(den > 0)
      .select(
        col("token"),
        col("a").as("df1"),
        col("b").as("df0"),
        round(num / den, 6).as("chi2"))
      .orderBy(col("chi2").desc, col("token"))
      .limit(topK)
  }
}
