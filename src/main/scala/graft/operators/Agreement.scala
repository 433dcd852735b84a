package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Inter-annotator agreement and rank correlation — the label-quality
  * audits a training-data pipeline runs before trusting its raters or
  * its scorers: did two labelers (or two quality models) agree beyond
  * chance (Cohen 1960), did a rater POOL agree (Fleiss 1971), and do two
  * continuous scorers rank the corpus the same way (Spearman 1904)?
  *
  * Exactness discipline (the [[MannWhitney]] rules): every statistic
  * reduces to EXACT integer/decimal counts — contingency cells,
  * marginals, squared per-item counts, doubled midranks — folded in hash
  * aggregates, with ONE fixed IEEE expression at the end rounded to 6.
  * No per-row floats accumulate, so results are partition-order-proof
  * and the DuckDB oracles replay them bit-for-bit.
  *
  * Scale shape: one (or two) hash aggregates over the corpus plus a
  * broadcast of the label-cardinality-bounded marginal frame. Nothing
  * corpus-sized sorts or collects; Spearman's ranks come from
  * per-DISTINCT-VALUE counts + a window over the distinct frame (tiny),
  * never a full-corpus row_number.
  */
object Agreement {

  /** Cohen's κ between two raters over the same items: one row
    * `(n_items, po, pe, kappa)`. po = Σ diag / n; pe = Σ rowᵢ·colᵢ / n²
    * — both from exact BIGINT cell counts; κ = (po − pe)/(1 − pe),
    * rounded 6, NULL when pe = 1 (both raters constant and equal —
    * agreement is undefined, not perfect). Null labels drop (an item
    * one rater skipped is not evidence either way).
    */
  def cohenKappa(df: DataFrame, raterA: String, raterB: String): DataFrame = {
    val cells = df
      .filter(col(raterA).isNotNull && col(raterB).isNotNull)
      .groupBy(col(raterA).as("__la"), col(raterB).as("__lb"))
      .agg(count(lit(1)).as("__c"))
    // label-cardinality-bounded frame from here on: marginal products
    // stay exact BIGINTs (n² ≤ 8.5e18 holds to ~3e9 items; the corpus
    // sizes above that want the decimal cast documented below)
    val agg = cells.agg(
      sum(col("__c")).cast("bigint").as("n"),
      sum(when(col("__la") === col("__lb"), col("__c")).otherwise(0L))
        .cast("bigint").as("diag"))
    val margA = cells.groupBy("__la").agg(sum("__c").as("__ra"))
    val margB = cells.groupBy("__lb").agg(sum("__c").as("__rb"))
    val peNum = margA
      .join(margB, col("__la") === col("__lb"))
      .agg(coalesce(sum(col("__ra").cast("decimal(38,0)") * col("__rb")),
        lit(0).cast("decimal(38,0)")).as("pe_num"))
    val n = col("n").cast("double")
    val po = col("diag").cast("double") / n
    val pe = col("pe_num").cast("double") / (n * n)
    agg.crossJoin(broadcast(peNum)).select(
      col("n").as("n_items"),
      round(po, 6).as("po"),
      round(pe, 6).as("pe"),
      when(pe < 1.0, round((po - pe) / (lit(1.0) - pe), 6)).as("kappa"))
  }

  /** Fleiss' κ for a rater pool: `ratings` has one row per (item,
    * rater) with a label; every item MUST carry the same number of
    * ratings n ≥ 2 (the statistic is undefined otherwise — REQUIREd
    * loud, not silently reweighted). One row
    * `(n_items, n_raters, p_bar, pe_bar, kappa)`:
    * Pᵢ = (Σⱼ nᵢⱼ² − n) / (n(n−1)), P̄ = mean Pᵢ,
    * pⱼ = Σᵢ nᵢⱼ / (N·n), P̄ₑ = Σ pⱼ², κ = (P̄ − P̄ₑ)/(1 − P̄ₑ).
    * Everything up to the final expression is exact: Σnᵢⱼ², ΣΣnᵢⱼ per
    * label, N — integers from two hash aggregates.
    */
  def fleissKappa(
      df: DataFrame, itemCol: String, raterCol: String, labelCol: String): DataFrame = {
    val clean = df.filter(col(labelCol).isNotNull)
    val cells = clean
      .groupBy(col(itemCol).as("__i"), col(labelCol).as("__l"))
      .agg(count(lit(1)).as("__c"))
    val perItem = cells.groupBy("__i").agg(
      sum(col("__c")).as("__n"),
      sum(col("__c") * col("__c")).as("__sq"))
    val nDistinct = perItem.select(countDistinct(col("__n")).as("k")).head().getLong(0)
    require(nDistinct == 1L,
      s"fleissKappa: every item needs the SAME number of ratings (got $nDistinct distinct counts)")
    val itemAgg = perItem.agg(
      count(lit(1)).cast("bigint").as("n_items"),
      max(col("__n")).cast("bigint").as("n_raters"),
      sum(col("__sq")).cast("decimal(38,0)").as("sq_sum"))
    val labelAgg = cells.groupBy("__l").agg(sum("__c").as("__tot"))
      .agg(coalesce(sum(col("__tot").cast("decimal(38,0)") * col("__tot")),
        lit(0).cast("decimal(38,0)")).as("lbl_sq_sum"))
    val nI = col("n_items").cast("double")
    val nR = col("n_raters").cast("double")
    // P̄ = (Σsq − N·n) / (N·n·(n−1)); P̄ₑ = Σ(Σᵢnᵢⱼ)² / (N·n)²
    val pBar = (col("sq_sum").cast("double") - nI * nR) / (nI * nR * (nR - 1.0))
    val peBar = col("lbl_sq_sum").cast("double") / (nI * nR * nI * nR)
    itemAgg.crossJoin(broadcast(labelAgg)).select(
      col("n_items"),
      col("n_raters"),
      round(pBar, 6).as("p_bar"),
      round(peBar, 6).as("pe_bar"),
      when(col("n_raters") >= 2 && peBar < 1.0,
        round((pBar - peBar) / (lit(1.0) - peBar), 6)).as("kappa"))
  }

  /** Spearman's ρ between two numeric columns, ties by midrank — "do
    * two scorers order the corpus the same way", the rank-robust
    * complement of Pearson. One row `(n_obs, rho)`.
    *
    * Exactness: midranks are halves, so ranks are carried DOUBLED (the
    * [[MannWhitney]] doubled-rank rule) — 2r(v) = 2·cumBelow + t + 1
    * from per-DISTINCT-VALUE counts and a window over the (tiny)
    * distinct frame, one per column; the corpus then folds
    * Σ2rx, Σ2ry, Σ(2rx)², Σ(2ry)², Σ2rx·2ry as DECIMAL(38,0) — exact to
    * ~10¹² rows — and ρ = (nΣxy − ΣxΣy) / √((nΣx² − (Σx)²)(nΣy² −
    * (Σy)²)) is one IEEE expression of exact values, rounded 6 (the
    * doubling cancels). NULL when either column is constant. Rows with
    * a NULL on either side drop.
    */
  def spearmanRho(df: DataFrame, xCol: String, yCol: String): DataFrame = {
    val pts = df
      .filter(col(xCol).isNotNull && col(yCol).isNotNull)
      .select(col(xCol).as("__x"), col(yCol).as("__y"))
    def doubledRanks(c: String): DataFrame = {
      val perValue = pts.groupBy(col(c)).agg(count(lit(1)).as("t"))
      val w = org.apache.spark.sql.expressions.Window
        .orderBy(col(c))
        .rowsBetween(org.apache.spark.sql.expressions.Window.unboundedPreceding, -1)
      perValue.select(
        col(c),
        (coalesce(sum(col("t")).over(w), lit(0L)) * 2 + col("t") + 1)
          .as(s"${c}_r2"))
    }
    val ranked = pts
      .join(doubledRanks("__x"), "__x")
      .join(doubledRanks("__y"), "__y")
    val d = "decimal(38,0)"
    val agg = ranked.agg(
      count(lit(1)).cast("bigint").as("n"),
      sum(col("__x_r2").cast(d)).as("sx"),
      sum(col("__y_r2").cast(d)).as("sy"),
      sum(col("__x_r2").cast(d) * col("__x_r2")).as("sxx"),
      sum(col("__y_r2").cast(d) * col("__y_r2")).as("syy"),
      sum(col("__x_r2").cast(d) * col("__y_r2")).as("sxy"))
    val n = col("n").cast("double")
    def dd(c: String) = col(c).cast("double")
    val covn = n * dd("sxy") - dd("sx") * dd("sy")
    val varx = n * dd("sxx") - dd("sx") * dd("sx")
    val vary = n * dd("syy") - dd("sy") * dd("sy")
    agg.select(
      col("n").as("n_obs"),
      when(varx > 0 && vary > 0,
        round(covn / sqrt(varx * vary), 6)).as("rho"))
  }
}
