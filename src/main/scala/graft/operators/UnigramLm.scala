package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.functions.TextAnalysis

/** Corpus-fit unigram language model + per-document mean token
  * log-probability — the degenerate-but-effective end of perplexity-based
  * quality filtering (the CCNet recipe: score documents against a language
  * model, drop the tail): documents made of globally rare tokens score
  * low, formulaic/common text scores high, and either tail is a filter
  * candidate.
  *
  * Laplace-smoothed: p(t) = (c_t + 1) / (T + V) with c_t the corpus count
  * of token t, T total tokens, V vocabulary size. Exactly reproducible in
  * SQL (ln + integer counts), unlike a real LM — this is the
  * oracle-checkable baseline of the quality-scoring family
  * ([[graft.functions.TextAnalysis.qualityScore]] is the rule-based one).
  *
  * Shape at scale: token counts are one hash aggregate on the term; (T, V)
  * is a one-row aggregate broadcast into the scorer; scoring joins each
  * token occurrence to its corpus count (equi-join on the term,
  * AQE-skew-splittable — stopwords are hot keys) and folds per document.
  */
object UnigramLm {

  /** (doc_id, n_tokens, mean_logprob) per document; empty docs are absent
    * (no tokens to score).
    */
  def meanLogProb(docs: DataFrame, idCol: String, textCol: String): DataFrame = {
    val terms = graft.Tables.spread(docs).select(
      col(idCol),
      explode(TextAnalysis.tokens(col(textCol))).as("term"))
    val counts = terms.groupBy("term").agg(count(lit(1)).as("__c"))
    val totals = counts.agg(
      sum(col("__c")).as("__t"),
      count(lit(1)).as("__v"))
    terms
      .join(counts, "term")
      .crossJoin(broadcast(totals))
      .withColumn("__lp",
        log((col("__c") + 1).cast("double") / (col("__t") + col("__v"))))
      .groupBy(idCol)
      .agg(
        count(lit(1)).cast("int").as("n_tokens"),
        avg(col("__lp")).as("mean_logprob"))
  }
}
