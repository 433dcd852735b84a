package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.functions.TextAnalysis

/** Corpus TF-IDF term weighting — the workhorse featurizer of
  * training-data curation (keyword extraction, topic balance checks,
  * quality filters over term distributions).
  *
  * Shape at scale: one explode + two keyed aggregations.
  *   - term counts per doc: shuffle on (doc_id, term) — high cardinality,
  *     AQE-splittable;
  *   - document frequency per term: shuffle on term, map-side partial
  *     count first;
  *   - corpus size N: a one-row aggregate broadcast into the weight
  *     projection (never a driver-side collect).
  * No cross join of docs × vocabulary is ever materialized — only
  * observed (doc, term) pairs flow.
  *
  * Weights use the smoothed formula `idf = ln((N+1)/(df+1)) + 1`
  * (sklearn's default): strictly positive, defined for every observed
  * term, and exactly reproducible in any SQL engine with `ln`.
  */
object Tfidf {

  /** (doc_id, term, tf, df, tfidf) for every observed (doc, term) pair. */
  def termWeights(docs: DataFrame, idCol: String, textCol: String): DataFrame = {
    val terms = graft.Tables.spread(docs).select(
      col(idCol),
      explode(TextAnalysis.tokens(col(textCol))).as("term"))
    val tf = terms.groupBy(idCol, "term").agg(count(lit(1)).as("tf"))
    // tf already holds exactly one row per observed (doc, term) pair, so
    // document frequency folds from it — no second tokenize/explode pass,
    // no distinct shuffle
    val df = tf.groupBy("term").agg(count(lit(1)).as("df"))
    val n = docs.agg(countDistinct(col(idCol)).as("__n"))
    tf.join(df, "term")
      .crossJoin(broadcast(n))
      .withColumn("tfidf",
        col("tf") * (log((col("__n") + 1).cast("double") / (col("df") + 1)) + 1.0))
      .select(idCol, "term", "tf", "df", "tfidf")
  }

  /** Top-k terms per document by weight (ties broken on the term itself,
    * so output is deterministic under any partitioning).
    */
  def topTerms(docs: DataFrame, idCol: String, textCol: String, k: Int): DataFrame = {
    val w = Window.partitionBy(col(idCol))
      .orderBy(col("tfidf").desc, col("term"))
    termWeights(docs, idCol, textCol)
      .withColumn("rank", row_number().over(w))
      .filter(col("rank") <= k)
  }
}
