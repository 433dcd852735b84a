package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** One-pass column profiling: row count, null count, exact distinct
  * count per column, emitted one row per column — the completeness
  * report a sync run publishes next to its data (the engine's run report
  * S11 counts rows; this profiles them).
  *
  * Shape at scale: a SINGLE aggregate pass computes every metric for
  * every column (count + conditional sums are one shared scan;
  * `count(DISTINCT x)` for multiple columns expands to one aggregate per
  * distinct-set under Spark's expand operator, still map-side partial),
  * then the one-row result is exploded into the per-column layout
  * driver-side. Nothing here scales with row count except the scan.
  */
object DataProfile {

  def profile(df: DataFrame, cols: Seq[String]): DataFrame = {
    require(cols.nonEmpty, "profile at least one column")
    val aggs =
      count(lit(1)).as("__n") +:
        cols.flatMap(c => Seq(
          sum(when(col(c).isNull, 1L).otherwise(0L)).as(s"__null_$c"),
          countDistinct(col(c)).as(s"__dist_$c")))
    val one = df.agg(aggs.head, aggs.tail: _*)
    val entries = array(cols.map(c => struct(
      lit(c).as("col_name"),
      col("__n").cast("bigint").as("n_rows"),
      col(s"__null_$c").cast("bigint").as("n_null"),
      col(s"__dist_$c").cast("bigint").as("n_distinct"))): _*)
    one
      .select(explode(entries).as("p"))
      .select(col("p.col_name"), col("p.n_rows"), col("p.n_null"),
        col("p.n_distinct"))
      .withColumn("null_rate",
        col("n_null").cast("double") / col("n_rows"))
  }

  /** EXACT interpolated percentiles (quantile_cont semantics: linear
    * interpolation at rank p·(n−1)) as a one-row frame, via a value
    * histogram instead of the built-in `percentile` aggregate.
    *
    * The built-in buffers a value→count map per partial and merges them
    * in ONE final task — for a near-unique column (l_extendedprice:
    * 583k distinct of 600k rows at sf0.1) that single merge dominates
    * the query. Here the heavy lifting is a hash aggregate over the
    * VALUE DOMAIN (distinct values), whose size is bounded by the
    * column's resolution (e.g. ~10^7 possible price cents) no matter how
    * many rows — at 100 TB the histogram is the only exact-quantile
    * shape that doesn't move row-count-sized state. The cumulative pass
    * is a single-partition window over distinct values only; if the
    * domain itself is huge, range-partition the cumsum or fall back to
    * approx_percentile (gated by q_a6b).
    *
    * Returns one row with `n` plus one column per requested (name, p).
    */
  def exactPercentiles(
      df: DataFrame,
      valueCol: String,
      ps: Seq[(String, Double)]): DataFrame = {
    require(ps.nonEmpty, "request at least one percentile")
    val hist = df
      .where(col(valueCol).isNotNull)
      .groupBy(col(valueCol).as("__v"))
      .agg(count(lit(1)).as("__c"))
      .withColumn("__cum", sum("__c").over(Window.orderBy("__v")))
    val withN = hist.crossJoin(
      broadcast(hist.agg(sum("__c").cast("bigint").as("__n"))))
    // rank p·(n−1) (0-based): lower = value at floor, upper at ceil,
    // picked with conditional mins over the cumulative counts
    val aggs = ps.flatMap { case (name, p) =>
      val idx = lit(p) * (col("__n") - lit(1)).cast("double")
      Seq(
        min(when(col("__cum") >= floor(idx) + lit(1), col("__v"))).as(s"__lo_$name"),
        min(when(col("__cum") >= ceil(idx) + lit(1), col("__v"))).as(s"__hi_$name"))
    } :+ max(col("__n")).as("n")
    withN
      .agg(aggs.head, aggs.tail: _*)
      .select(
        col("n") +: ps.map { case (name, p) =>
          val idx = lit(p) * (col("n") - lit(1)).cast("double")
          val frac = idx - floor(idx).cast("double")
          (col(s"__lo_$name") +
            (col(s"__hi_$name") - col(s"__lo_$name")) * frac).as(name)
        }: _*)
  }

  /** Per-group exact interpolated percentiles — the grouped form of
    * [[exactPercentiles]]: histogram keyed by (group, value), cumulative
    * counts per group via a window PARTITIONED BY group (distinct values
    * per group, not rows, and partition-parallel — no single-partition
    * bottleneck like the global form's cumsum), conditional-min picks,
    * one interpolation per group. Output: groupCol, n, <percentile cols>.
    */
  def groupedExactPercentiles(
      df: DataFrame,
      groupCol: String,
      valueCol: String,
      ps: Seq[(String, Double)]): DataFrame = {
    require(ps.nonEmpty, "request at least one percentile")
    val g = col(groupCol)
    val hist = df
      .where(col(valueCol).isNotNull)
      .groupBy(g.as("__g"), col(valueCol).as("__v"))
      .agg(count(lit(1)).as("__c"))
    val perGroup = Window.partitionBy("__g")
    val withCum = hist
      .withColumn("__cum", sum("__c").over(perGroup.orderBy("__v")))
      .withColumn("__n", sum("__c").over(perGroup))
    val aggs = ps.flatMap { case (name, p) =>
      val idx = lit(p) * (col("__n") - lit(1)).cast("double")
      Seq(
        min(when(col("__cum") >= floor(idx) + lit(1), col("__v"))).as(s"__lo_$name"),
        min(when(col("__cum") >= ceil(idx) + lit(1), col("__v"))).as(s"__hi_$name"))
    } :+ max(col("__n")).as("n")
    withCum
      .groupBy(col("__g").as(groupCol))
      .agg(aggs.head, aggs.tail: _*)
      .select(
        col(groupCol) +: col("n") +: ps.map { case (name, p) =>
          val idx = lit(p) * (col("n") - lit(1)).cast("double")
          val frac = idx - floor(idx).cast("double")
          (col(s"__lo_$name") +
            (col(s"__hi_$name") - col(s"__lo_$name")) * frac).as(name)
        }: _*)
  }

  /** Equi-DEPTH binning: assign each row the 1-based decile-style bucket
    * of `valueCol` among `nBins` equal-population bins, boundaries taken
    * from [[exactPercentiles]] (interior percentiles i/nBins). The
    * boundary row broadcasts and assignment is a scan-side
    * `size(filter(...))` over the boundary array — a two-pass,
    * shuffle-free alternative to `ntile()`, whose global sort is the
    * thing that does not survive 100×. Ties sit with the LOWER bin
    * (`boundary < value` strictly); null values get a null bin.
    */
  def equiDepthBins(
      df: DataFrame,
      valueCol: String,
      nBins: Int,
      binCol: String = "bin"): DataFrame = {
    require(nBins >= 2, "need at least two bins")
    val ps = (1 until nBins).map(i => s"__b$i" -> i.toDouble / nBins)
    val bounds = exactPercentiles(df, valueCol, ps)
      .select(array((1 until nBins).map(i => col(s"__b$i")): _*).as("__bnds"))
    df.crossJoin(broadcast(bounds))
      .withColumn(binCol,
        when(col(valueCol).isNotNull,
          size(filter(col("__bnds"), b => b < col(valueCol))) + 1).cast("int"))
      .drop("__bnds")
  }

  /** Per-GROUP equi-depth binning: each row's bucket among `nBins`
    * equal-population bins of ITS OWN group — per-stratum normalization
    * (a "long doc" for src0 may be bin 1 for src1). Boundaries from
    * [[groupedExactPercentiles]] (partition-parallel — no global
    * anything), one broadcast join back on the group key, scan-side
    * assignment. Ties to the lower bin, null values null bin, like
    * [[equiDepthBins]].
    */
  def groupedEquiDepthBins(
      df: DataFrame,
      groupCol: String,
      valueCol: String,
      nBins: Int,
      binCol: String = "bin"): DataFrame = {
    require(nBins >= 2, "need at least two bins")
    val ps = (1 until nBins).map(i => s"__b$i" -> i.toDouble / nBins)
    val bounds = groupedExactPercentiles(df, groupCol, valueCol, ps)
      .select(col(groupCol),
        array((1 until nBins).map(i => col(s"__b$i")): _*).as("__bnds"))
    df.join(broadcast(bounds), Seq(groupCol), "left")
      .withColumn(binCol,
        when(col(valueCol).isNotNull,
          size(filter(col("__bnds"), b => b < col(valueCol))) + 1).cast("int"))
      .drop("__bnds")
  }

  /** Percentile-rank (cume_dist) normalization WITHOUT a global sort:
    * rank(v) = (# rows ≤ v) / n from the cumulative VALUE histogram —
    * the same domain-bounded machinery as [[exactPercentiles]] — joined
    * back on the value. `ntile`/`cume_dist` windows ship every row to a
    * single ordering; here the only ordered structure is the distinct-
    * value cumsum, and the join back is a plain equi-join (broadcast
    * when the domain is small). Ranks are exact integer ratios. Null
    * values get a null rank.
    */
  def percentileRank(
      df: DataFrame,
      valueCol: String,
      rankCol: String = "pct_rank"): DataFrame = {
    val hist = df
      .where(col(valueCol).isNotNull)
      .groupBy(col(valueCol).as("__v"))
      .agg(count(lit(1)).as("__c"))
      .withColumn("__cum", sum("__c").over(Window.orderBy("__v")))
    val ranked = hist.crossJoin(
      broadcast(hist.agg(sum(col("__c")).cast("bigint").as("__n"))))
      .select(col("__v"), (col("__cum").cast("double") / col("__n")).as(rankCol))
    df.join(ranked, col(valueCol) === col("__v"), "left").drop("__v")
  }

  /** Contingency-table dependence statistics between two categorical
    * columns: per (x, y) cell the observed count, the
    * independence-expected count `nx·ny/n`, the chi-square term
    * `(obs − e)²/e`, and the mutual-information term
    * `p(x,y)·ln(p(x,y)/(p(x)p(y)))` — the standard first look at whether
    * two labelings (language × source, event type × value band) are
    * independent before using one to stratify the other. Σ chi2_term is
    * the χ² statistic; Σ mi_term the MI in nats.
    *
    * Shape at scale: one hash aggregate reduces the corpus to |X|·|Y|
    * cells; the marginals are windows over THAT tiny frame and the grand
    * total a broadcast one-row aggregate — after the first aggregate,
    * nothing scales with row count. Marginal products go through
    * DECIMAL(38,0) (exact at any count; a BIGINT product overflows past
    * ~3e9 rows per margin) and every downstream term is a fixed
    * left-to-right IEEE expression on exactly-known integers, so results
    * are engine-reproducible (ln follows the q_t8 precedent).
    */
  def contingencyStats(df: DataFrame, xCol: String, yCol: String): DataFrame = {
    val cells = df
      .groupBy(col(xCol).as("x"), col(yCol).as("y"))
      .agg(count(lit(1)).as("obs"))
    val withMargins = cells
      .withColumn("nx", sum("obs").over(Window.partitionBy("x")))
      .withColumn("ny", sum("obs").over(Window.partitionBy("y")))
      .crossJoin(broadcast(cells.agg(sum("obs").cast("bigint").as("n"))))
    val expected =
      (col("nx").cast("decimal(38,0)") * col("ny")).cast("double") / col("n")
    val pxy = col("obs").cast("double") / col("n")
    withMargins.select(
      col("x"), col("y"), col("obs"),
      expected.as("expected"),
      ((col("obs") - expected) * (col("obs") - expected) / expected).as("chi2_term"),
      (pxy * log(
        col("obs").cast("double") * col("n") /
          (col("nx").cast("double") * col("ny")))).as("mi_term"))
  }

  /** Cramér's V — the [0,1]-normalized effect size over
    * [[contingencyStats]]'s χ²: V = √(χ² / (n·min(r−1, c−1))), the
    * scale-free "how dependent are these two categoricals" number that
    * raw χ² (which grows with n) can't give. One summary row:
    * `(n, x_cats, y_cats, dof, chi2, cramers_v)` with
    * dof = (r−1)(c−1).
    *
    * EMPTY cells matter: [[contingencyStats]] emits only observed cells,
    * but an (x, y) combination with obs = 0 still contributes
    * (0 − e)²/e = e to χ² — a perfectly-associated 2×2 table is HALF
    * empty and would otherwise score V = 1/√2, not 1. Rather than
    * materializing the full cross product, the correction uses the
    * identity Σ_all-cells e = n: χ² = Σ_observed term + (n − Σ_observed
    * e). V is NULL for a degenerate table (either dimension constant:
    * min(r−1, c−1) = 0 — division guarded in the projection, the q_e18
    * ANSI discipline). Cost after the first aggregate is O(cells),
    * nothing scales with row count.
    */
  def cramersV(df: DataFrame, xCol: String, yCol: String): DataFrame = {
    val minSide = least(col("x_cats"), col("y_cats")) - 1
    contingencyStats(df, xCol, yCol)
      .agg(
        sum("obs").cast("bigint").as("n"),
        count_distinct(col("x")).cast("bigint").as("x_cats"),
        count_distinct(col("y")).cast("bigint").as("y_cats"),
        sum("chi2_term").as("__chi2_obs"),
        sum("expected").as("__e_obs"))
      .select(
        col("n"), col("x_cats"), col("y_cats"),
        ((col("x_cats") - 1) * (col("y_cats") - 1)).cast("bigint").as("dof"),
        (col("__chi2_obs") + (col("n").cast("double") - col("__e_obs"))).as("chi2"),
        // greatest(0, ·): a fully-covered table's correction is n − Σe ≈ 0
        // and can land at −1e-13 in floats — sqrt must never see it
        when(minSide > 0,
          sqrt(greatest(lit(0.0),
            col("__chi2_obs") + (col("n").cast("double") - col("__e_obs"))) /
            (col("n").cast("double") * minSide))).as("cramers_v"))
  }

  /** Entropy / mutual-information summary between two categorical
    * columns — the information-theoretic companion to [[cramersV]]:
    * one row `(n, x_cats, y_cats, h_x, h_y, h_xy, mi, h_y_given_x,
    * nmi)`, all entropies in nats.
    *
    * Identities used (all from ONE aggregate over the contingency
    * cells, so the corpus is scanned once):
    *   - H(X)   = −Σ_cells p(x,y)·ln(nx/n)   (= −Σ_x p(x)·ln p(x):
    *     summing the marginal log-share weighted by the cell share
    *     avoids a second marginal aggregate);
    *   - H(Y)   symmetric; H(X,Y) = −Σ p(x,y)·ln p(x,y);
    *   - I(X;Y) = H(X) + H(Y) − H(X,Y)  (≥ 0 up to float dust);
    *   - H(Y|X) = H(X,Y) − H(X) — what's left to learn about Y after
    *     seeing X, the number a stratified-split designer reads;
    *   - NMI    = I / √(H(X)·H(Y)) ∈ [0,1], NULL when either column is
    *     constant (its entropy is 0 — the q_q14 degenerate-table
    *     discipline).
    *
    * Shape at scale: identical to [[contingencyStats]] — one hash
    * aggregate reduces the corpus to |X|·|Y| cells, marginals are
    * windows over that tiny frame, and the summary is a one-row
    * aggregate over it. Observed cells suffice exactly (a zero cell's
    * p·ln p term is 0 by limit), unlike χ²'s empty-cell correction.
    */
  def mutualInformation(df: DataFrame, xCol: String, yCol: String): DataFrame = {
    val cells = df
      .groupBy(col(xCol).as("x"), col(yCol).as("y"))
      .agg(count(lit(1)).as("obs"))
    val m = cells
      .withColumn("nx", sum("obs").over(Window.partitionBy("x")))
      .withColumn("ny", sum("obs").over(Window.partitionBy("y")))
      .crossJoin(broadcast(cells.agg(sum("obs").cast("bigint").as("n"))))
    val pxy = col("obs").cast("double") / col("n")
    val one = m.agg(
      max(col("n")).as("n"),
      count_distinct(col("x")).cast("bigint").as("x_cats"),
      count_distinct(col("y")).cast("bigint").as("y_cats"),
      (-sum(pxy * log(col("nx").cast("double") / col("n")))).as("h_x"),
      (-sum(pxy * log(col("ny").cast("double") / col("n")))).as("h_y"),
      (-sum(pxy * log(pxy))).as("h_xy"))
    val mi = col("h_x") + col("h_y") - col("h_xy")
    one.select(
      col("n"), col("x_cats"), col("y_cats"),
      col("h_x"), col("h_y"), col("h_xy"),
      mi.as("mi"),
      (col("h_xy") - col("h_x")).as("h_y_given_x"),
      when(col("h_x") > 0 && col("h_y") > 0,
        mi / sqrt(col("h_x") * col("h_y"))).as("nmi"))
  }

  /** Population Stability Index of `valueCol` between a baseline slice
    * and an actual slice — THE standard drift score for feature/corpus
    * monitoring: bin by the BASELINE's equi-depth boundaries, then
    * PSI = Σ (pa − pe)·ln(pa/pe) over bins. Shares are clamped at
    * `floorShare` (an empty actual bin contributes a large finite term,
    * not ±∞ — the conventional practitioner clamp). Returns one row:
    * (psi, n_bins, n_baseline, n_actual). Both slices reduce to nBins
    * counts before any cross-side math, so the comparison costs two
    * scans + two tiny aggregates at any scale.
    */
  def populationStabilityIndex(
      baseline: DataFrame,
      actual: DataFrame,
      valueCol: String,
      nBins: Int,
      floorShare: Double = 1e-6): DataFrame = {
    val ps = (1 until nBins).map(i => s"__b$i" -> i.toDouble / nBins)
    val bounds = exactPercentiles(baseline, valueCol, ps)
      .select(array((1 until nBins).map(i => col(s"__b$i")): _*).as("__bnds"))
    def binned(df: DataFrame, share: String, total: String): DataFrame = df
      .where(col(valueCol).isNotNull)
      .crossJoin(broadcast(bounds))
      .groupBy((size(filter(col("__bnds"), b => b < col(valueCol))) + 1).as("__bin"))
      .agg(count(lit(1)).as("__c"))
      .crossJoin(broadcast(
        df.where(col(valueCol).isNotNull).agg(count(lit(1)).as(total))))
      .select(col("__bin"), col(total),
        greatest(col("__c").cast("double") / col(total), lit(floorShare)).as(share))
    val e = binned(baseline, "__pe", "n_baseline")
    val a = binned(actual, "__pa", "n_actual")
    // full outer on the bin id: a bin empty on one side keeps its clamp
    e.join(a, Seq("__bin"), "full_outer")
      .select(
        coalesce(col("__pe"), lit(floorShare)).as("__pe"),
        coalesce(col("__pa"), lit(floorShare)).as("__pa"),
        col("n_baseline"), col("n_actual"))
      .agg(
        sum((col("__pa") - col("__pe")) * log(col("__pa") / col("__pe"))).as("psi"),
        count(lit(1)).cast("int").as("n_bins"),
        max(col("n_baseline")).as("n_baseline"),
        max(col("n_actual")).as("n_actual"))
  }

  /** Exact two-sample Kolmogorov–Smirnov statistic between the
    * `valueCol` distributions of two row populations of one frame
    * (tagged by `groupCol`): `D = sup_x |F_a(x) − F_b(x)|`, the
    * distribution-free drift measure that complements
    * [[populationStabilityIndex]] — PSI quantizes into bins and scores
    * mass shift, KS is binless and catches shape drift PSI's bins can
    * hide. Emits one row: sample sizes, `d_stat`, and `d_at_value`, the
    * smallest value attaining the supremum (where the CDFs diverge
    * most — the natural "where did it drift" pointer).
    *
    * Exactness: both empirical CDFs are ratios of EXACT integer
    * cumulative counts to exact totals — per distinct value one
    * division each, one subtraction, `abs` — so `D` is bit-identical in
    * any IEEE engine and needs no tolerance; the argmax ties on the
    * SMALLER value over the raw doubles (already total because exact).
    *
    * Shape at scale: one scan-side hash aggregate reduces the input to
    * the DISTINCT-value frame (cnt_a, cnt_b per value); the cumulative
    * window and the final max run over THAT frame. The unpartitioned
    * cumulative window is a single-task sort — fine for metric/feature
    * columns whose value cardinality is bounded (prices, scores,
    * rounded measurements), the audit's intended target. For
    * continuous unbounded-cardinality columns quantize first (the PSI
    * path) or accept the one-task sort of the distinct frame.
    */
  def ksTwoSample(
      df: DataFrame,
      valueCol: String,
      groupCol: String,
      groupA: String,
      groupB: String): DataFrame = {
    val v = col(valueCol).cast("double")
    val perValue = df
      .where(col(groupCol).isin(groupA, groupB) && v.isNotNull)
      .groupBy(v.as("__v"))
      .agg(
        sum(when(col(groupCol) === groupA, 1L).otherwise(0L)).as("__ca"),
        sum(when(col(groupCol) === groupB, 1L).otherwise(0L)).as("__cb"))
    val w = Window.orderBy(col("__v"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val cdf = perValue
      .select(
        col("__v"),
        sum(col("__ca")).over(w).as("__cuma"),
        sum(col("__cb")).over(w).as("__cumb"))
      .crossJoin(broadcast(perValue.agg(
        sum(col("__ca")).as("__na"), sum(col("__cb")).as("__nb"))))
      .select(
        col("__v"), col("__na"), col("__nb"),
        abs(col("__cuma").cast("double") / col("__na") -
          col("__cumb").cast("double") / col("__nb")).as("__d"))
    cdf.agg(
      max(col("__na")).as("n_a"),
      max(col("__nb")).as("n_b"),
      max(col("__d")).as("d_stat"),
      min_by(col("__v"), struct((-col("__d")).as("d"), col("__v").as("v")))
        .as("d_at_value"))
  }

  /** DELETE-GROUP JACKKNIFE confidence interval for a column mean — an
    * UNCERTAINTY number for corpus profile statistics, fully
    * deterministic (no bootstrap RNG): rows split into `folds`
    * deterministic groups by `foldCol % folds`, the mean is recomputed
    * leaving each group out, and the grouped-jackknife variance
    *
    *   SE² = (g−1)/g · Σ_i (θ₍ᵢ₎ − θ̄·)²
    *
    * yields a 95% interval (±1.96·SE). One row: `(n, mean,
    * jackknife_se, ci_lo, ci_hi)`. All leave-one-out means derive from
    * EXACT integer/decimal sufficient sums per fold — no per-fold
    * rescan, shuffle-order-proof.
    *
    * Shape at scale: ONE hash aggregate to `folds` rows, then arithmetic
    * on that tiny frame. NULL values excluded.
    */
  def jackknifeMeanCI(
      df: DataFrame,
      valueCol: String,
      foldCol: String,
      folds: Int = 10): DataFrame = {
    require(folds >= 2, "jackknife needs at least two folds")
    val perFold = df
      .filter(col(valueCol).isNotNull)
      .groupBy(pmod(col(foldCol), lit(folds.toLong)).as("__g"))
      .agg(
        count(lit(1)).as("__n"),
        sum(col(valueCol).cast("decimal(38,6)")).as("__s"))
    val tot = perFold.agg(
      sum(col("__n")).cast("bigint").as("n"),
      sum(col("__s")).cast("decimal(38,6)").as("__st"),
      count(lit(1)).cast("bigint").as("__g_present"))
    // leave-one-out means are ratios of exact decimals; θ̄ derives from
    // the SAME exact totals, so the only doubles are per-row — and the
    // centered squares go back through a DECIMAL sum, keeping every
    // aggregate shuffle-order-proof (a bare double sum over folds is
    // order-nondeterministic and can flip the rounded output)
    val loo = perFold
      .crossJoin(broadcast(tot))
      .select(
        col("n"), col("__g_present"),
        (col("__st").cast("double") / col("n")).as("mean"),
        ((col("__st") - col("__s")).cast("double") /
          (col("n") - col("__n")).cast("double")).as("__theta"))
    val tbarFrame = loo
      .groupBy(col("n"), col("__g_present"), col("mean"))
      .agg((sum(col("__theta").cast("decimal(38,18)")).cast("double") /
        col("__g_present")).as("__tbar"))
    loo
      .join(broadcast(tbarFrame), Seq("n", "__g_present", "mean"))
      .groupBy(col("n"), col("__g_present"), col("mean"))
      .agg(
        sum(((col("__theta") - col("__tbar")) * (col("__theta") - col("__tbar")))
          .cast("decimal(38,18)")).cast("double").as("__ssq"))
      .select(
        col("n"), col("mean"),
        sqrt((col("__g_present") - 1L).cast("double") / col("__g_present") *
          col("__ssq")).as("jackknife_se"))
      .select(
        col("n"), col("mean"), col("jackknife_se"),
        (col("mean") - lit(1.96) * col("jackknife_se")).as("ci_lo"),
        (col("mean") + lit(1.96) * col("jackknife_se")).as("ci_hi"))
  }

  /** KEY-SKEW diagnostics — the numbers the salting / AQE-skew-join /
    * bucketing decisions read BEFORE the join runs: one row with
    * `(n_rows, n_keys, max_key_rows, top1_share, top10_share, gini)`
    * for the distribution of rows over `keyCol`. `gini` is the exact
    * Gini coefficient of the key-count vector under the deterministic
    * ascending order (count, then key):
    *
    *   G = (2·Σᵢ i·cᵢ) / (k·Σcᵢ) − (k+1)/k
    *
    * 0 = perfectly uniform keys, → 1 = all rows on one key. A join key
    * with top1_share ≫ 1/k is the salting candidate; gini summarizes
    * the whole tail. NULL keys are excluded (they broadcast-null out of
    * equi-joins anyway).
    *
    * Shape at scale: ONE hash aggregate reduces the table to its key
    * counts; the rank window and top-k run over that |keys|-row frame,
    * never the table. All sufficient statistics are exact integers.
    */
  /** EXACT equi-join size prediction from key-count frames — the other
    * number the join planner wants next to [[keySkewReport]]:
    * |A ⋈ B| = Σ_k cA(k)·cB(k), computed from the two per-key count
    * aggregates WITHOUT running the join. One row: `(n_left, n_right,
    * n_common_keys, predicted_rows, max_key_rows, top_key)` where
    * `max_key_rows` is the largest single-key contribution and
    * `top_key` its key (ties broken by key ascending) — the row that
    * tells you whether the join output is dominated by one hot key
    * (the skew-join case) or spread. All exact integers.
    *
    * Shape at scale: two hash aggregates (table → key counts) and one
    * join of the count frames — orders of magnitude smaller than the
    * data join it predicts. NULL keys excluded on both sides (they
    * never match in an equi-join).
    */
  def joinSizeProfile(
      left: DataFrame,
      leftKey: String,
      right: DataFrame,
      rightKey: String): DataFrame = {
    def counts(df: DataFrame, k: String) =
      df.filter(col(k).isNotNull)
        .groupBy(col(k).cast("string").as("__k"))
        .agg(count(lit(1)).as("__c"))
    val ca = counts(left, leftKey)
    val cb = counts(right, rightKey)
    val joined = ca.toDF("__k", "__ca")
      .join(cb.toDF("__k", "__cb"), Seq("__k"))
      .select(col("__k"), (col("__ca") * col("__cb")).as("__prod"))
    joined
      .agg(
        count(lit(1)).cast("bigint").as("n_common_keys"),
        coalesce(sum(col("__prod")), lit(0L)).cast("bigint").as("predicted_rows"),
        coalesce(max(col("__prod")), lit(0L)).cast("bigint").as("max_key_rows"),
        min_by(col("__k"), struct((-col("__prod")).as("p"), col("__k").as("k")))
          .as("top_key"))
      .crossJoin(broadcast(ca.agg(
        coalesce(sum(col("__c")), lit(0L)).cast("bigint").as("n_left"))))
      .crossJoin(broadcast(cb.agg(
        coalesce(sum(col("__c")), lit(0L)).cast("bigint").as("n_right"))))
      .select(
        col("n_left"), col("n_right"), col("n_common_keys"),
        col("predicted_rows"), col("max_key_rows"), col("top_key"))
  }

  def keySkewReport(df: DataFrame, keyCol: String): DataFrame = {
    val counts = df.filter(col(keyCol).isNotNull)
      .groupBy(col(keyCol).cast("string").as("__k"))
      .agg(count(lit(1)).as("__c"))
    val ranked = counts.withColumn(
      "__i", row_number().over(Window.orderBy(col("__c").asc, col("__k").asc)))
    ranked
      .crossJoin(broadcast(counts
        .orderBy(col("__c").desc, col("__k").asc)
        .limit(10)
        .agg(max(col("__c")).as("__max1"), sum(col("__c")).as("__top10"))))
      .agg(
        sum(col("__c")).cast("bigint").as("n_rows"),
        count(lit(1)).cast("bigint").as("n_keys"),
        first(col("__max1")).cast("bigint").as("max_key_rows"),
        first(col("__top10")).cast("bigint").as("__t10"),
        sum(col("__i").cast("bigint") * col("__c")).cast("bigint").as("__iw"))
      .select(
        col("n_rows"), col("n_keys"), col("max_key_rows"),
        (col("max_key_rows").cast("double") / col("n_rows")).as("top1_share"),
        (col("__t10").cast("double") / col("n_rows")).as("top10_share"),
        (lit(2.0) * col("__iw") / (col("n_keys") * col("n_rows")) -
          (col("n_keys") + 1L).cast("double") / col("n_keys")).as("gini"))
  }

  /** Benford's-law first-digit audit (Benford 1938; Nigrini 2012 — the
    * standard forensic screen for fabricated or truncated numeric
    * columns): the distribution of leading significant digits of a
    * naturally-scaled positive measure follows P(d) = log10(1 + 1/d);
    * a column that drifts from it was clipped, binned, defaulted, or
    * invented. One row per digit 1–9: observed count/share, the Benford
    * expectation, and the χ² contribution (n_d − N·p_d)²/(N·p_d).
    *
    * Digit extraction is BOUNDARY-PROOF: e = floor(log10(x)),
    * d = floor(x / 10^e), then the symmetric clamp d ≥ 10 → 1 (log10
    * landed one ulp low at a power of ten) and d = 0 → 9 (one ulp
    * high). Whichever side of the boundary an engine's libm lands on,
    * both clamps resolve to the SAME digit, so the per-digit counts are
    * exact integers in every engine.
    *
    * Shape: scan-side digit arithmetic → ONE 9-row hash aggregate →
    * broadcast total; non-positive and NULL values are excluded (no
    * leading significant digit).
    */
  def benfordReport(df: DataFrame, valueCol: String): DataFrame = {
    val x = col(valueCol).cast("double")
    val e = floor(log10(x))
    val d0 = floor(x / pow(lit(10.0), e)).cast("int")
    val digit = when(d0 >= 10, lit(1)).when(d0 === 0, lit(9)).otherwise(d0)
    // +Infinity must be excluded too: floor(log10(inf)) faults the ANSI
    // double→long cast (it has no leading significant digit any more
    // than NaN does)
    val counts = df
      .where(x.isNotNull && x > 0 && !isnan(x) &&
        x < lit(Double.PositiveInfinity))
      .select(digit.as("digit"))
      .groupBy("digit")
      .agg(count(lit(1)).as("n"))
    val total = counts.agg(sum(col("n")).as("__t"))
    val expected = log(lit(1.0) + lit(1.0) / col("digit").cast("double")) / log(lit(10.0))
    counts.crossJoin(broadcast(total))
      .select(
        col("digit"),
        col("n"),
        round(col("n").cast("double") / col("__t").cast("double"), 6)
          .as("observed_share"),
        round(expected, 6).as("expected_share"),
        round({
          val exp = col("__t").cast("double") * expected
          (col("n").cast("double") - exp) * (col("n").cast("double") - exp) / exp
        }, 6).as("chi2_contrib"))
      .orderBy("digit")
  }

  /** Hill tail-index estimator (Hill 1975 — the extreme-value screen
    * next to [[benfordReport]]: does this column's upper tail look
    * Pareto, and how heavy?): over the top k+1 POSITIVE order
    * statistics x₍₁₎ ≥ … ≥ x₍ₖ₊₁₎ per group,
    * H = (1/k)·Σᵢ₌₁..ₖ ln(x₍ᵢ₎/x₍ₖ₊₁₎) and tail index α = 1/H. Small α
    * (≈ ≤ 2) says the tail is heavy enough that means/variances of the
    * column are unstable — the "is an average even meaningful" audit.
    *
    * Determinism contract: the order statistics come from the
    * bounded-heap [[graft.expressions.TopKScoreId]] under
    * (value DESC, id ASC) — map-side O(log k) updates, ≤ k+1-entry
    * partial buffers, NO per-group sort of the full column; each ln
    * term is rounded to 9 decimals and summed as exact DECIMAL, so H/α
    * are partition-order-proof and engine-replayable (H and α divide
    * the same exact sum — one IEEE op each). Groups with fewer than
    * k+1 positive rows are omitted (no tail to estimate).
    */
  def hillTailIndex(
      df: DataFrame,
      groupCols: Seq[String],
      valueCol: String,
      idCol: Column,
      k: Int): DataFrame = {
    require(k >= 1, "k must be positive")
    import org.apache.spark.sql.graft.bridge
    val pos = df.filter(col(valueCol).isNotNull && col(valueCol) > 0)
    val topAgg = bridge.column(
      graft.expressions.TopKScoreId(
        bridge.expression(col(valueCol).cast("double")),
        bridge.expression(idCol.cast("bigint")),
        k + 1).toAggregateExpression())
    val grouped = pos.groupBy(groupCols.map(col): _*)
      .agg(topAgg.as("__top"), count(lit(1)).cast("bigint").as("n_pos"))
      .filter(size(col("__top")) === k + 1)
    val stats = graft.functions.hof.bind(col("__top")) { t =>
      graft.functions.hof.bind(
        element_at(t, k + 1).getField("score")) { xk1 =>
        val termSum = aggregate(
          transform(slice(t, 1, k), e =>
            round(log(e.getField("score") / xk1), 9).cast("decimal(18,9)")),
          lit(0).cast("decimal(28,9)"),
          (a, b) => (a + b).cast("decimal(28,9)"))
        graft.functions.hof.bind(termSum.cast("double")) { sd =>
          struct(
            xk1.as("x_k1"),
            round(sd / k, 6).as("hill_h"),
            round(lit(k.toDouble) / sd, 6).as("tail_alpha"))
        }
      }
    }
    grouped.select(
      (groupCols.map(col) :+ col("n_pos") :+ stats.as("__s")): _*)
      .select(
        (groupCols.map(col) :+ col("n_pos") :+
          col("__s.x_k1").as("x_k1") :+
          col("__s.hill_h").as("hill_h") :+
          col("__s.tail_alpha").as("tail_alpha")): _*)
  }
}
