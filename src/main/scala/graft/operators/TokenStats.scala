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
    // OLS from EXACT decimal moment sums rather than covar_samp/var_samp:
    // on a degenerate corpus (constant cumulative vocabulary — a tiny or
    // saturated vocab) the y column is constant and the parallel
    // variance aggregates nondeterministically return exactly-0 or
    // ~1e-16 depending on merge order — in BOTH engines — flipping r2
    // between NULL and pure noise run to run. Quantizing x/y to 9
    // decimals (DECIMAL(12,9) — |ln| ≤ 100 by the domain) makes every
    // sum exact and order-free, and degeneracy is decided by EXACT
    // min=max equality, not by a variance's last ulp.
    val xd = round(col("__x"), 9).cast("decimal(12,9)")
    val yd = round(col("__y"), 9).cast("decimal(12,9)")
    val m = pts.agg(
      count(lit(1)).cast("int").as("n_prefixes"),
      max(col("__ct")).as("total_tokens"),
      max(col("__cv")).as("vocabulary"),
      sum(xd).as("__sx"), sum(yd).as("__sy"),
      sum(xd * yd).as("__sxy"), sum(xd * xd).as("__sxx"),
      sum(yd * yd).as("__syy"),
      (max(xd) > min(xd)).as("__varx"),
      (max(yd) > min(yd)).as("__vary"))
    // slope/r2 from EXACT-decimal scatter numerators — n·Σxy − ΣxΣy is
    // exactly 0 in decimal when y is constant, so a degenerate corpus
    // yields beta = 0.0 and r2 = NULL exactly, never last-ulp noise
    // (the (n−1) normalizers cancel in every ratio)
    val nD = col("n_prefixes").cast("decimal(4,0)")
    val sx = col("__sx").cast("decimal(15,9)")
    val sy = col("__sy").cast("decimal(15,9)")
    val numCov = (nD * col("__sxy").cast("decimal(25,18)") - sx * sy)
      .cast("double")
    val numVx = (nD * col("__sxx").cast("decimal(25,18)") - sx * sx)
      .cast("double")
    val numVy = (nD * col("__syy").cast("decimal(25,18)") - sy * sy)
      .cast("double")
    val n = col("n_prefixes").cast("double")
    val beta = numCov / numVx
    m.select(
      col("n_prefixes"), col("total_tokens"), col("vocabulary"),
      when(col("__varx"), beta).as("beta"),
      when(col("__varx"),
        exp(sy.cast("double") / n - beta * (sx.cast("double") / n))).as("k"),
      when(col("__varx") && col("__vary"),
        numCov * numCov / (numVx * numVy)).as("r2"))
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
