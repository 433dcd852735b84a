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
  /** Heaps'-law vocabulary-growth fit V(n) ≈ K·n^β (Heaps 1978;
    * natural-language corpora sit near β ≈ 0.4–0.6 — β drifting toward 0
    * means the crawl is re-reading the same material, toward 1 means
    * unbounded junk vocabulary like serial numbers; either way it is the
    * corpus-curation dial Zipf's RANK law ([[zipfFit]]) cannot see).
    *
    * The growth curve needs V at a sequence of corpus prefixes, which
    * naively is `numPrefixes` distinct-counts over growing slices. One
    * aggregate suffices: assign each doc a deterministic prefix bucket
    * (the md5 hash order [[Curation.hashUnit]] — any fixed doc order is
    * as valid as crawl order for the law, and hash order makes prefixes
    * i.i.d. samples), then V(prefix ≤ i) = #{terms whose FIRST-OCCURRENCE
    * bucket ≤ i} — a per-term min() plus a ≤numPrefixes-row cumulation.
    *
    * Shape at scale: explode → one vocabulary-sized (term → min bucket)
    * hash aggregate + one numPrefixes-row token-count aggregate; the
    * cumulation window and the OLS run on ≤numPrefixes rows (bounded by
    * the require, NOT by data). Output one row:
    * (n_prefixes, total_tokens, vocabulary, beta, k, r2) — n_prefixes
    * counts the non-empty prefixes the fit used.
    */
  def heapsFit(
      df: DataFrame,
      idCol: String,
      textCol: String,
      numPrefixes: Int = 10,
      seed: String = "heaps"): DataFrame = {
    require(numPrefixes >= 2 && numPrefixes <= 1000,
      "numPrefixes must be in [2, 1000] (the cumulation window is single-partition)")
    val toks = df
      .select(
        floor(Curation.hashUnit(col(idCol), seed) * numPrefixes).cast("int").as("__b"),
        explode(TextAnalysis.tokens(col(textCol))).as("__t"))
    val perBucket = toks.groupBy(col("__b")).agg(count(lit(1)).as("__nt"))
    val firstSeen = toks.groupBy(col("__t")).agg(min(col("__b")).as("__fb"))
      .groupBy(col("__fb")).agg(count(lit(1)).as("__nv"))
    val w = Window.orderBy(col("__b"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val pts = perBucket
      .join(firstSeen, col("__b") === col("__fb"), "left")
      .select(col("__b"), col("__nt"), coalesce(col("__nv"), lit(0L)).as("__nv"))
      .select(lit(1).as("__k"),
        sum(col("__nt")).over(w).as("__ct"),
        sum(col("__nv")).over(w).as("__cv"))
      .where(col("__ct") > 0 && col("__cv") > 0)
      .select(col("__k"), log(col("__ct").cast("double")).as("__x"),
        log(col("__cv").cast("double")).as("__y"),
        col("__ct"), col("__cv"))
    // the point frame is ≤numPrefixes rows but its lineage is the corpus
    // explode — pin it once so the fit and the totals don't scan twice,
    // checkpoint the 1-row result, then free the internal pin
    val ptsCp = pts.localCheckpoint(true)
    val fit = TimeSeries.trendSlope(ptsCp, "__k", "__x", "__y")
    val totals = ptsCp.agg(
      max(col("__ct")).as("total_tokens"), max(col("__cv")).as("vocabulary"))
    val out = fit.crossJoin(broadcast(totals))
      .select(
        col("n_points").as("n_prefixes"),
        col("total_tokens"), col("vocabulary"),
        col("slope").as("beta"),
        exp(col("intercept")).as("k"),
        col("r2"))
      .localCheckpoint(true)
    org.apache.spark.sql.graft.bridge.freeLocalCheckpoint(ptsCp)
    out
  }

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
