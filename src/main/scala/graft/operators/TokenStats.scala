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

  /** Zipf power-law fit of the corpus term-frequency distribution: OLS of
    * ln(freq) on ln(rank) over the `topN` most frequent terms — the
    * corpus-health fingerprint (natural language sits near slope −1;
    * template/boilerplate corpora flatten, spam steepens). Rank is
    * `row_number` on (freq DESC, term ASC) — the deterministic tie-break
    * every ranked gate here uses. One summary row:
    * `(n_terms, slope, intercept, r2)` via [[TimeSeries.trendSlope]]'s
    * guarded-projection moments (fewer than 2 usable terms → NULLs).
    *
    * Scale shape: explode → one term hash-agg; the rank window is
    * GLOBAL, but over the already-reduced VOCABULARY frame (token types,
    * not tokens — bounded far below row count), and only topN rows
    * survive into the O(topN) moment aggregate.
    */
  def zipfFit(
      df: DataFrame,
      textCol: String,
      topN: Int = 200): DataFrame = {
    require(topN >= 2, "topN must be >= 2")
    val freq = df
      .select(explode(TextAnalysis.tokens(col(textCol))).as("__t"))
      .groupBy(col("__t"))
      .agg(count(lit(1)).as("__f"))
    val ranked = freq
      .select(col("__f"),
        row_number().over(Window.orderBy(col("__f").desc, col("__t"))).as("__r"))
      .where(col("__r") <= topN)
    val pts = ranked.select(
      lit(1).as("__k"),
      log(col("__r").cast("double")).as("__x"),
      log(col("__f").cast("double")).as("__y"))
    TimeSeries.trendSlope(pts, "__k", "__x", "__y")
      .select(
        col("n_points").as("n_terms"),
        col("slope"), col("intercept"), col("r2"))
  }
}
