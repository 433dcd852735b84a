package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DecimalType

import graft.functions.{Hashing, TextAnalysis}

/** Trained model-based corpus quality filtering: a deterministic,
  * fixed-iteration logistic-regression classifier over hashed-unigram
  * bucket features plus log document length — the fastText-style
  * learned quality gate that production corpus curation runs where the
  * heuristic filters ([[Curation]], [[UnigramLm]] perplexity, the
  * Gopher-style ratio rules) only approximate. Train on a labeled
  * slice, ship the weights as plan literals, score the full corpus
  * scan-side — the same model-artifact discipline as the DSIR ratio
  * table and the k-means centroids.
  *
  * Beyond-reference surface (the reference ingests rosters and never
  * trains anything); added for the LLM-pipeline side next to
  * [[Dsir]] (classifier-free selection) and [[Curation]] (recipes).
  *
  * Determinism — what makes a TRAINED model oracle-gateable at all
  * (MLlib's LBFGS/SGD is neither fixed-order nor replayable in SQL):
  *   - features are exact: bucket counts are integers, ratios one IEEE
  *     division by the token count, log-length one `ln` over an exact
  *     integer argument — both engines hand the same double to libm;
  *   - full-batch gradient DESCENT steps are fixed-count and unrolled
  *     in the oracle as chained CTEs (the q_v14 Lloyd discipline);
  *   - each per-document gradient term rounds to 9 decimals and sums
  *     as DECIMAL(38,9) — an exact, addition-order-independent sum, so
  *     shuffle order cannot drift the update;
  *   - each new weight rounds to 10 decimals before becoming the next
  *     step's literal, re-synchronizing both engines every step.
  *
  * Scale shape: one tokenize + one (doc, bucket) hash aggregate builds
  * the feature frame (the [[Dsir]] shape); each training step is ONE
  * scan of the feature frame into a single all-reduce aggregate row
  * (B+2 decimal sums — partial map-side aggregation does the heavy
  * lifting, the driver sees one row per step). The fitted model is
  * O(B) doubles — plan-literal material by construction. Scoring is a
  * scan-side projection with zero joins and zero shuffles.
  */
object QualityClassifier {

  /** Fitted model: bucket-ratio weights (length B), the log-length
    * weight, and the intercept. A bounded driver artifact (B+2
    * doubles), embedded as plan literals for scoring.
    */
  final case class LogisticModel(
      bucketWeights: Seq[Double],
      lengthWeight: Double,
      bias: Double) {
    def numBuckets: Int = bucketWeights.size
  }

  /** Feature frame `(idCol, y, x0..x{B-1}, xl)`: per-document hashed-
    * unigram bucket RATIOS (count in md5-bucket j / token count — the
    * engine-portable [[Hashing.md5Hash60]] buckets), log token count
    * `ln(1 + n_tokens)`, and the 0/1 label column evaluated per row.
    * Zero-token documents get all-zero features (the ratio denominator
    * floors at 1, ln(1+0) = 0).
    */
  def features(
      docs: DataFrame,
      idCol: String,
      textCol: String,
      label: Column,
      numBuckets: Int): DataFrame = {
    require(numBuckets >= 1, "numBuckets must be >= 1")
    val base = docs
      .select(
        col(idCol), label.cast("double").as("y"),
        TextAnalysis.tokens(col(textCol)).as("__tk"))
      .select(
        col(idCol), col("y"), size(col("__tk")).cast("double").as("__nt"),
        explode_outer(col("__tk")).as("__tok"))
      .withColumn(
        "__b",
        when(col("__tok").isNotNull,
          pmod(Hashing.md5Hash60(col("__tok")), lit(numBuckets.toLong))))
    val counts = (0 until numBuckets).map { j =>
      coalesce(sum(when(col("__b") === j, lit(1L))), lit(0L)).as(s"__c$j")
    }
    base
      .groupBy(col(idCol), col("y"), col("__nt"))
      .agg(counts.head, counts.tail: _*)
      .select(
        col(idCol) +: col("y") +:
          (0 until numBuckets).map(j =>
            (col(s"__c$j").cast("double") / greatest(col("__nt"), lit(1.0))).as(s"x$j")) :+
          log(lit(1.0) + col("__nt")).as("xl"): _*)
  }

  /** STATELESS scan-side twin of [[features]] (no label column): the
    * bucket counts fold over each row's own token array via HOF
    * `filter`+`size` instead of explode + groupBy — zero shuffles, zero
    * state, so the SAME feature vector (integer counts, identical
    * division and ln) is computable inside a streaming micro-batch in
    * Append mode. Batch keeps the explode + hash-agg form (map-side
    * partials beat B array passes at corpus scale); this is the
    * landing-zone scoring form.
    */
  def featuresScanSide(
      docs: DataFrame,
      idCol: String,
      textCol: String,
      numBuckets: Int): DataFrame = {
    require(numBuckets >= 1, "numBuckets must be >= 1")
    docs
      .select(
        col(idCol), TextAnalysis.tokens(col(textCol)).as("__tk"))
      .withColumn("__nt", size(col("__tk")).cast("double"))
      .select(
        col(idCol) +:
          (0 until numBuckets).map { j =>
            (size(filter(col("__tk"), t =>
              pmod(Hashing.md5Hash60(t), lit(numBuckets.toLong)) === j))
              .cast("double") / greatest(col("__nt"), lit(1.0))).as(s"x$j")
          } :+
          log(lit(1.0) + col("__nt")).as("xl"): _*)
  }

  /** The linear term `b + Σ w_j·x_j + w_l·xl`, built strictly left to
    * right so the float addition order matches the oracle's SQL
    * expression token for token.
    */
  private def linear(m: LogisticModel): Column =
    m.bucketWeights.zipWithIndex
      .foldLeft(lit(m.bias): Column) { case (acc, (w, j)) => acc + lit(w) * col(s"x$j") } +
      lit(m.lengthWeight) * col("xl")

  private def sigmoid(z: Column): Column = lit(1.0) / (lit(1.0) + exp(-z))

  /** Fit by `steps` full-batch gradient-descent steps from the zero
    * model: `w += lr · Xᵀ(y − σ(Xw)) / n`. Each step is one job — the
    * feature scan reduces to a single row of exact DECIMAL(38,9)
    * gradient sums, the new (rounded) weights form IN the engine's
    * projection, and only the B+2 finished weights cross to the driver
    * (the centroid discipline). Feed a re-used `features(...)` frame;
    * persist it across steps if the upstream scan is expensive.
    */
  def fit(
      feats: DataFrame,
      numBuckets: Int,
      steps: Int = 3,
      learningRate: Double = 0.5): LogisticModel = {
    require(steps >= 1, "steps must be >= 1")
    var m = LogisticModel(Seq.fill(numBuckets)(0.0), 0.0, 0.0)
    val gradCols = (0 until numBuckets).map(j => col(s"x$j")) :+ col("xl")
    (1 to steps).foreach { _ =>
      val p = sigmoid(linear(m))
      val sums =
        count(lit(1)).cast("double").as("n") +:
          gradCols.zipWithIndex.map { case (f, i) =>
            sum(round(f * (col("y") - p), 9).cast(DecimalType(38, 9))).as(s"g$i")
          } :+
          sum(round(col("y") - p, 9).cast(DecimalType(38, 9))).as("gb")
      val step = lit(learningRate)
      def upd(w: Double, g: Column): Column =
        round(lit(w) + step * (g.cast("double") / col("n")), 10)
      val row = feats.agg(sums.head, sums.tail: _*)
        .select(
          (0 until numBuckets).map(j => upd(m.bucketWeights(j), col(s"g$j"))) ++
            Seq(upd(m.lengthWeight, col(s"g$numBuckets")), upd(m.bias, col("gb"))): _*)
        .head()
      m = LogisticModel(
        (0 until numBuckets).map(row.getDouble),
        row.getDouble(numBuckets),
        row.getDouble(numBuckets + 1))
    }
    m
  }

  /** Scan-side scoring with the fitted weights as plan literals:
    * `(idCol, score, pred)` — score = σ(b + w·x) rounded to 6 decimals
    * (the harness tolerance), pred = score >= 0.5. Zero joins, zero
    * shuffles beyond the feature aggregate.
    */
  def score(feats: DataFrame, idCol: String, m: LogisticModel): DataFrame =
    feats
      .select(col(idCol), round(sigmoid(linear(m)), 6).as("score"))
      .withColumn("pred", when(col("score") >= 0.5, 1).otherwise(0).cast("int"))
}
