package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.functions.TextAnalysis

/** Per-document token-distribution statistics beyond the scan-side
  * ratios in [[graft.functions.TextAnalysis]]: Shannon entropy of the
  * within-doc unigram distribution, H = Σ (c/n)·ln(n/c) in nats — the
  * standard lexical-diversity signal (low entropy ⇒ repetitive/template
  * text; complements the Gopher top-token-share filter, which only sees
  * the single hottest token).
  *
  * Shape at scale: explode → one (doc, term) hash aggregate → per-doc
  * totals as a window over the already-reduced count frame (partitioned
  * by the doc key — no second shuffle) → one more hash aggregate to a
  * row per doc. Everything keys on the doc id, so one partitioning
  * serves the aggregate, the window, and the final rollup; nothing is
  * corpus-global.
  */
object TokenStats {

  /** (id, n_tokens, n_distinct, token_entropy) per input row; empty/
    * whitespace-only docs keep a row with zeros (a doc with one distinct
    * token also scores 0 — indistinguishable from empty by entropy
    * alone, which is why n_tokens rides along).
    */
  def tokenEntropy(df: DataFrame, idCol: String, textCol: String): DataFrame = {
    val counts = df
      .select(col(idCol), explode(TextAnalysis.tokens(col(textCol))).as("__t"))
      .groupBy(col(idCol), col("__t"))
      .agg(count(lit(1)).as("__c"))
    val withN = counts
      .withColumn("__n", sum("__c").over(Window.partitionBy(idCol)))
    val perDoc = withN
      .groupBy(col(idCol))
      .agg(
        max("__n").cast("int").as("__nt"),
        count(lit(1)).cast("int").as("__nd"),
        sum((col("__c").cast("double") / col("__n")) *
          log(col("__n").cast("double") / col("__c"))).as("__h"))
    df.select(col(idCol))
      .join(perDoc, Seq(idCol), "left")
      .select(
        col(idCol),
        coalesce(col("__nt"), lit(0)).as("n_tokens"),
        coalesce(col("__nd"), lit(0)).as("n_distinct"),
        coalesce(col("__h"), lit(0.0)).as("token_entropy"))
  }
}
