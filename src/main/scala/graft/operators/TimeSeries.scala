package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Time-series regularization: densify an irregular event stream onto a
  * fixed grid and fill the gaps by carrying the last observation forward
  * (LOCF) — the standard pre-step before per-entity feature windows or
  * training-curve joins, where a missing hour must mean "same as last
  * seen", not "absent row".
  *
  * Beyond-reference surface (the reference syncs snapshots and never
  * regularizes time; `SisConnectorService.java:142-160` has no notion of
  * a grid), added for the LLM-pipeline side where event/metric feeds are
  * joined to corpora on aligned time buckets.
  *
  * Shape at scale: one hash aggregate to the (key, hour) grain, a
  * per-key min/max span (tiny — one row per key), a scan-side
  * `sequence()` explode bounded by each key's own span, and ONE window
  * pass per key for the carry-forward. Nothing global: the grid is never
  * materialized beyond each key's span, and the window partitions by the
  * key, so a 1000-executor run sees each key's slots on one task. Carried
  * values stay DECIMAL end-to-end (engine-order-independent sums), cast
  * to double only at the edge.
  */
object TimeSeries {

  /** Hourly grid per key over `[min hour, max hour]` of that key, with
    * `n_events` (0 on gap rows) and `sv_filled` — the hourly DECIMAL sum
    * of `valueCol`, last-observation-carried-forward across gaps, as
    * double. The first slot of every key is observed by construction
    * (the span starts at the key's first event), so `sv_filled` is never
    * null.
    */
  def hourlyGapFillLocf(
      events: DataFrame,
      keyCol: String,
      tsCol: String,
      valueCol: String): DataFrame = {
    val hourly = events
      .groupBy(col(keyCol), date_trunc("hour", col(tsCol)).as("h"))
      .agg(
        sum(col(valueCol).cast("decimal(18,2)")).as("__sv"),
        count(lit(1)).as("__n"))
    // The spans frame is tiny (one row per key) and compresses to KBs,
    // so AQE's size-based coalescing folds its exchange reader into ONE
    // partition — and the explode right above it then expands every
    // key's full hour grid on a single task, serializing the fill and
    // both downstream windows (r17 opt: profiled 2× ~4.5 s single-task
    // stages on a ~1M-row grid at sf0.1; the hourly side broadcasts, so
    // no later exchange re-spreads it). Byte-based coalescing misjudges
    // this shape: the grid is byte-light but row-CPU-heavy. Pin an
    // explicit keyed repartition between the aggregate and the
    // expansion — user-specified partition counts are exempt from AQE
    // coalescing, and hash(key) satisfies the (key, h) join clustering
    // and the per-key window distribution, so this is the plan's LAST
    // exchange before the output sort. The count is 2× parallelism, not
    // 1×: an exchange identical to the aggregate's own hash(key, P)
    // would be optimizer-removed as redundant (measured — the pin must
    // differ to survive). Scale-adaptive, not a local constant:
    // defaultParallelism is the executor-core total on a real cluster.
    val slots = hourly
      .groupBy(col(keyCol))
      .agg(min(col("h")).as("__h0"), max(col("h")).as("__h1"))
      .repartition(
        2 * events.sparkSession.sparkContext.defaultParallelism, col(keyCol))
      .select(
        col(keyCol),
        explode(sequence(col("__h0"), col("__h1"), expr("interval 1 hour"))).as("h"))
    val carry = Window
      .partitionBy(keyCol)
      .orderBy("h")
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    slots
      .join(hourly, Seq(keyCol, "h"), "left")
      .select(
        col(keyCol),
        col("h"),
        coalesce(col("__n"), lit(0L)).cast("int").as("n_events"),
        last(col("__sv"), ignoreNulls = true).over(carry).cast("double").as("sv_filled"))
  }

  /** Trailing-window anomaly score over a regular per-key series (run
    * [[hourlyGapFillLocf]] first — z-scores on an IRREGULAR grid
    * silently weight dense hours more): for each slot, the mean and
    * sample stddev of the previous `windowSlots` slots (inclusive), the
    * z-score against that local baseline, and an `is_anomaly` flag at
    * `|z| > threshold`. Flat windows (zero variance, e.g. a long LOCF
    * carry) score null z and never flag — and "zero" is judged against
    * `stdFloor`, not exact 0.0: sliding-window variance recurrences
    * leave ±1-ulp residue (~1e-16) on constant frames in some engines,
    * and dividing by that residue fabricates huge z-scores out of
    * nothing. One window pass per key, like the fill itself; nothing
    * global.
    */
  def rollingZScore(
      series: DataFrame,
      keyCol: String,
      slotCol: String,
      valueCol: String,
      windowSlots: Int,
      threshold: Double,
      stdFloor: Double = 1e-9): DataFrame = {
    require(windowSlots > 1, "need at least two slots for a sample stddev")
    val w = Window.partitionBy(keyCol).orderBy(slotCol)
      .rowsBetween(-(windowSlots - 1), Window.currentRow)
    val mean = avg(col(valueCol)).over(w)
    // guard the 1-row sample: Spark's stddev_samp yields NaN there (SQL
    // engines yield NULL) — neither is a usable baseline
    val sd = when(count(lit(1)).over(w) >= 2, stddev_samp(col(valueCol)).over(w))
    series
      .withColumn("roll_mean", mean)
      .withColumn("roll_std", sd)
      .withColumn("z",
        when(col("roll_std") > stdFloor,
          (col(valueCol) - col("roll_mean")) / col("roll_std")))
      .withColumn("is_anomaly",
        coalesce(abs(col("z")) > threshold, lit(false)))
  }

  /** Cohort retention matrix: users cohorted by the week of their FIRST
    * event; each (cohort, week-offset) cell counts the distinct users of
    * that cohort active in that week — the standard retention triangle.
    * Offsets are exact integer week arithmetic on week-truncated dates
    * (day difference over 7 — no float, no calendar ambiguity).
    *
    * Shape at scale: first-event week is one aggregate on the user key;
    * per-week activity dedups to (user, week) grain BEFORE the join, so
    * the join input is bounded by users × active weeks, not events; the
    * cell count is then a plain hash aggregate (the per-user dedup
    * already guarantees distinctness within a cell). Both aggregates and
    * the join share the user key — one partitioning serves all three.
    */
  def cohortRetention(
      events: DataFrame,
      keyCol: String,
      tsCol: String): DataFrame = {
    val firstWeek = events
      .groupBy(col(keyCol))
      .agg(date_trunc("week", min(col(tsCol))).as("cohort_week"))
    val active = events
      .select(col(keyCol), date_trunc("week", col(tsCol)).as("__w"))
      .distinct()
    active
      .join(firstWeek, Seq(keyCol))
      .groupBy(
        col("cohort_week"),
        (datediff(col("__w").cast("date"), col("cohort_week").cast("date")) / 7)
          .cast("int").as("week_offset"))
      .agg(count(lit(1)).cast("int").as("n_users"))
  }

  /** Gaps-and-islands interval merge: collapse per-key intervals that
    * overlap or touch into maximal "islands". A row opens a new island
    * exactly when its start exceeds the running max end of every earlier
    * interval of its key (ties on start are harmless: equal starts imply
    * the second row starts inside — or exactly at the edge of — the
    * first's interval). Two window passes over ONE (key, start, tie)
    * ordering plus a hash aggregate; nothing global, and a key's rows
    * land on a single task — the same per-key posture as the gap fill.
    *
    * `tieCol` must totalize the (key, start) order (a unique id): the
    * running-max frame ends at `1 PRECEDING`, so an engine-dependent
    * tie order would otherwise change which rows a frame sees.
    *
    * Output: key, island_start, island_end (the merged bounds) and
    * n_rows, one row per island.
    */
  def mergeIntervals(
      intervals: DataFrame,
      keyCol: String,
      startCol: String,
      endCol: String,
      tieCol: String): DataFrame = {
    val order = Window.partitionBy(keyCol).orderBy(col(startCol), col(tieCol))
    val prevMaxEnd = max(col(endCol))
      .over(order.rowsBetween(Window.unboundedPreceding, -1))
    val opens = when(prevMaxEnd.isNull || col(startCol) > prevMaxEnd, 1L)
      .otherwise(0L)
    intervals
      .withColumn("__island",
        sum(opens).over(order.rowsBetween(Window.unboundedPreceding, Window.currentRow)))
      .groupBy(col(keyCol), col("__island"))
      .agg(
        min(col(startCol)).as("island_start"),
        max(col(endCol)).as("island_end"),
        count(lit(1)).cast("int").as("n_rows"))
      .drop("__island")
  }

  /** EWMA with α = 1/2 over the trailing `windowRows` observations of a
    * per-key ordered series: the classic recursive smoother
    * `y = (x + y_prev) / 2`, folded left-to-right over the frame with
    * the oldest frame row as the seed. Dyadic weights are the point —
    * every intermediate is an IEEE add plus an EXACT exponent decrement
    * (division by 2 never rounds outside subnormals), so the score is
    * bit-reproducible across engines and across reruns, where a general
    * α's `pow()` chain is libm-dependent (the q_c6 lesson).
    *
    * The frame is materialized per row as a ≤ `windowRows` array inside
    * the window state (bounded, scan-side); the fold is a codegen HOF.
    * One window pass per key.
    */
  def dyadicEwma(
      series: DataFrame,
      keyCol: String,
      orderCol: String,
      valueCol: String,
      windowRows: Int): DataFrame = {
    require(windowRows >= 1, "windowRows must be >= 1")
    val frame = Window.partitionBy(keyCol).orderBy(orderCol)
      .rowsBetween(-(windowRows - 1L), Window.currentRow)
    val arr = collect_list(col(valueCol).cast("double")).over(frame)
    series.withColumn("ewma",
      aggregate(arr, lit(null).cast("double"), (acc, x) =>
        when(acc.isNull, x).otherwise((acc + x) / lit(2d))))
  }

  /** Holt double-exponential smoothing (level + linear trend) with
    * α = β = 1/2 over the FULL per-key history — the forecasting step up
    * from [[dyadicEwma]]'s level-only smoother: per row the recursion
    *
    *   fit_t = l_{t−1} + b_{t−1}             (1-step-ahead forecast)
    *   l_t   = (x_t + fit_t) / 2             (α = 1/2)
    *   b_t   = ((l_t − l_{t−1}) + b_{t−1})/2 (β = 1/2)
    *
    * seeded l_1 = x_1, b_1 = 0, fit_1 = NULL. Dyadic coefficients for
    * the same reason as [[dyadicEwma]]: every step is IEEE adds plus
    * exact halvings, so the whole recursion is bit-reproducible across
    * engines and reruns. Output adds `level`, `trend`, `fitted`,
    * `residual` (x − fitted, the backtest error stream) and
    * `forecast_next` (= l_t + b_t, the forecast this row issues for the
    * next step) at the input grain.
    *
    * Shape: ONE hash aggregate collects each key's series, sort_array
    * orders it (orderCol must be unique per key — the pre-aggregated
    * daily/hourly grain contract of this family), and a single
    * left-to-right HOF fold emits the full smoothed array, exploded
    * back to rows. Per-key state is the series itself — bounded by the
    * grain, like [[pacf]] — and nothing shuffles except the one
    * key-partitioned aggregate.
    */
  /** Holt–Winters ADDITIVE triple exponential smoothing (Winters 1960;
    * Hyndman & Athanasopoulos FPP §8.3) with dyadic α = β = γ = 1/2 and
    * season length `period` — [[holtLinear]] plus the seasonal
    * component, for the weekly/daily cycles the trend-only recursion
    * reads as noise:
    *
    *   fitted_t = l_{t−1} + b_{t−1} + s_{t−m}
    *   l_t = ((x_t − s_{t−m}) + (l_{t−1} + b_{t−1})) / 2
    *   b_t = ((l_t − l_{t−1}) + b_{t−1}) / 2
    *   s_t = ((x_t − l_t) + s_{t−m}) / 2
    *
    * Init is the classic first-season scheme: l_m = mean(x_1..x_m)
    * (computed as a LEFT-TO-RIGHT fold so both engines add in one
    * order), b_m = 0, s_i = x_i − l_m for i ≤ m; the recursion starts
    * at t = m+1. Level/trend/seasonal/fitted publish from the completed
    * first season onward (NULL before); keys with fewer than `period`
    * points are excluded (no season to initialize from). The halvings
    * are exact IEEE ops, so the whole recursion is bit-reproducible and
    * the oracle replays it with a recursive CTE carrying the last-m
    * seasonal ring as a list column.
    *
    * Shape: identical to [[holtLinear]] — one key-partitioned hash
    * aggregate collects each key's grain-bounded series, one HOF fold
    * emits the smoothed array (the fold reads s_{t−m} straight out of
    * the accumulated array with a negative index — no extra state), one
    * explode returns to rows.
    */
  def holtWinters(
      series: DataFrame,
      keyCol: String,
      orderCol: String,
      valueCol: String,
      period: Int): DataFrame = {
    require(period >= 2, "period must be >= 2")
    val m = period
    val g = series
      .groupBy(col(keyCol))
      .agg(sort_array(collect_list(struct(
        col(orderCol).as("o"),
        col(valueCol).cast("double").as("x")))).as("__s"))
      .where(size(col("__s")) >= m)
      .withColumn("__m0",
        aggregate(slice(col("__s"), 1, m), lit(0.0),
          (a, e) => a + e.getField("x")) / lit(m.toDouble))
    def entry(e: org.apache.spark.sql.Column) = struct(
      e.getField("o").as("o"), e.getField("x").as("x"),
      lit(null).cast("double").as("level"), lit(null).cast("double").as("trend"),
      lit(null).cast("double").as("seasonal"), lit(null).cast("double").as("fitted"))
    val accInit = slice(transform(col("__s"), e => entry(e)), 1, 0)
    val folded = aggregate(col("__s"), accInit, (acc, e) => {
      val x = e.getField("x")
      val init = struct(
        e.getField("o").as("o"), x.as("x"),
        when(size(acc) === m - 1, col("__m0")).cast("double").as("level"),
        when(size(acc) === m - 1, lit(0.0)).cast("double").as("trend"),
        (x - col("__m0")).as("seasonal"),
        lit(null).cast("double").as("fitted"))
      val last = element_at(acc, -1)
      val sPrev = element_at(acc, -m).getField("seasonal")
      val fit = last.getField("level") + last.getField("trend") + sPrev
      val lNew = ((x - sPrev) + (last.getField("level") + last.getField("trend"))) / lit(2.0)
      val bNew = ((lNew - last.getField("level")) + last.getField("trend")) / lit(2.0)
      val sNew = ((x - lNew) + sPrev) / lit(2.0)
      val step = struct(
        e.getField("o").as("o"), x.as("x"),
        lNew.as("level"), bNew.as("trend"), sNew.as("seasonal"), fit.as("fitted"))
      when(size(acc) < m, concat(acc, array(init)))
        .otherwise(concat(acc, array(step)))
    })
    g.select(col(keyCol), explode(folded).as("__r"))
      .select(
        col(keyCol),
        col("__r.o").as(orderCol),
        col("__r.x").as(valueCol),
        col("__r.level").as("level"),
        col("__r.trend").as("trend"),
        // the pre-init seasonals exist inside the fold (the first
        // season's recursion reads them) but publish NULL: the contract
        // is "defined from the completed first season onward"
        when(col("__r.level").isNull, lit(null).cast("double"))
          .otherwise(col("__r.seasonal")).as("seasonal"),
        col("__r.fitted").as("fitted"),
        (col("__r.x") - col("__r.fitted")).as("residual"))
  }

  def holtLinear(
      series: DataFrame,
      keyCol: String,
      orderCol: String,
      valueCol: String): DataFrame = {
    val g = series
      .groupBy(col(keyCol))
      .agg(sort_array(collect_list(struct(
        col(orderCol).as("o"),
        col(valueCol).cast("double").as("x")))).as("__s"))
    def seed(e: org.apache.spark.sql.Column) = struct(
      e.getField("o").as("o"), e.getField("x").as("x"),
      e.getField("x").as("level"), lit(0.0).as("trend"),
      lit(null).cast("double").as("fitted"))
    // zero-length, correctly-typed accumulator derived from the input
    val accInit = slice(transform(col("__s"), e => seed(e)), 1, 0)
    val folded = aggregate(col("__s"), accInit, (acc, e) => {
      val last = element_at(acc, -1)
      val fit = last.getField("level") + last.getField("trend")
      val lNew = (e.getField("x") + fit) / lit(2.0)
      val bNew = ((lNew - last.getField("level")) + last.getField("trend")) / lit(2.0)
      when(size(acc) === 0, array(seed(e)))
        .otherwise(concat(acc, array(struct(
          e.getField("o").as("o"), e.getField("x").as("x"),
          lNew.as("level"), bNew.as("trend"), fit.as("fitted")))))
    })
    g.select(col(keyCol), explode(folded).as("__r"))
      .select(
        col(keyCol),
        col("__r.o").as(orderCol),
        col("__r.x").as(valueCol),
        col("__r.level").as("level"),
        col("__r.trend").as("trend"),
        col("__r.fitted").as("fitted"),
        (col("__r.x") - col("__r.fitted")).as("residual"),
        (col("__r.level") + col("__r.trend")).as("forecast_next"))
  }

  /** Per-key lag-k autocorrelation (Pearson r between the series and its
    * k-step-lagged self, k = 1..maxLag): the seasonality/persistence
    * fingerprint of a metric series. One lag window pass per key emits
    * all maxLag shifted copies, an explode fans them to (key, lag) pairs,
    * and one hash aggregate computes `corr` — the series is assumed
    * PRE-AGGREGATED to its grain (daily/hourly), so at 100 TB the heavy
    * reduction happened upstream in a grouped agg and this operator only
    * touches the small series frame. Zero-variance slices (either side
    * constant) emit NULL rather than engine-dependent NaN: the aggregate
    * computes only the moments (`covar_samp`, `var_samp`) — which are
    * well-defined (0 or NULL) on constant slices — and Pearson r is
    * formed in the PROJECTION under a `when(var > 0)` guard, where the
    * guard actually short-circuits the division. Putting a guarded
    * `corr` inside the aggregate would not work: all aggregate
    * expressions of one hash aggregate evaluate unconditionally, so
    * `corr`'s own final division throws DIVIDE_BY_ZERO under ANSI mode
    * before any `when` projection runs.
    */
  def autocorrelation(
      series: DataFrame,
      keyCol: String,
      orderCol: String,
      valueCol: String,
      maxLag: Int): DataFrame = {
    require(maxLag >= 1, "maxLag must be >= 1")
    val w = Window.partitionBy(keyCol).orderBy(orderCol)
    val x = col(valueCol).cast("double")
    val lagged = series.select(
      col(keyCol) +: x.as("__x") +:
        (1 to maxLag).map(k => lag(x, k).over(w).as(s"__lag$k")): _*)
    val pairs = lagged
      .select(
        col(keyCol),
        explode(array((1 to maxLag).map(k =>
          struct(lit(k).as("lag_k"), col("__x").as("x"), col(s"__lag$k").as("y"))): _*)).as("__p"))
      .select(col(keyCol), col("__p.lag_k").as("lag_k"), col("__p.x").as("x"), col("__p.y").as("y"))
      .where(col("y").isNotNull)
    pairs
      .groupBy(col(keyCol), col("lag_k"))
      .agg(
        count(lit(1)).cast("int").as("n_pairs"),
        covar_samp(col("x"), col("y")).as("__cov"),
        var_samp(col("x")).as("__vx"),
        var_samp(col("y")).as("__vy"))
      .select(
        col(keyCol),
        col("lag_k"),
        col("n_pairs"),
        when(col("__vx") > 0 && col("__vy") > 0,
          col("__cov") / sqrt(col("__vx") * col("__vy"))).as("autocorr"))
  }

  /** Dominant (seasonal) lag per key: the lag in `1..maxLag` whose
    * autocorrelation is highest — the cheap seasonality-period pick over
    * [[autocorrelation]]'s per-lag output. Keys whose every lag is NULL
    * (constant or too-short series) drop out: they HAVE no dominant lag.
    *
    * Portability: the argmax compares autocorrelations ROUNDED to 6
    * decimals (the correctness harness's own float tolerance) with ties
    * broken toward the SMALLER lag, so two engines whose r values differ
    * in the 15th bit still pick the same lag — comparing raw doubles
    * would make the winner depend on libm rounding. One extra hash
    * aggregate over the (key, lag) frame, which is maxLag rows per key —
    * nothing at corpus scale.
    */
  def dominantSeasonalLag(
      series: DataFrame,
      keyCol: String,
      orderCol: String,
      valueCol: String,
      maxLag: Int): DataFrame = {
    val ac = autocorrelation(series, keyCol, orderCol, valueCol, maxLag)
    ac.where(col("autocorr").isNotNull)
      .groupBy(col(keyCol))
      .agg(
        max_by(
          struct(col("lag_k"), col("n_pairs"), col("autocorr")),
          struct(round(col("autocorr"), 6).as("r6"), (-col("lag_k")).as("neg_lag")))
          .as("__best"))
      .select(
        col(keyCol),
        col("__best.lag_k").as("best_lag"),
        col("__best.n_pairs").as("n_pairs"),
        col("__best.autocorr").as("autocorr"))
  }

  /** CUSUM changepoint pick per key: the position where the cumulative
    * sum of mean-deviations attains its maximum absolute value — the
    * classic single-changepoint estimator for a level shift (Page's
    * cumulative-sum statistic at its extremum). Returns one row per key:
    * the changepoint's order value, the |CUSUM| there (normalized by
    * sd·√n so it's comparable across keys), and n.
    *
    * Shape: one window pass computes the running sum; the per-key mean/
    * sd/count ride along as window aggregates over the SAME partition
    * (no second shuffle — every aggregate here partitions by the key),
    * and one `max_by` hash aggregate picks the extremum. Keys with zero
    * variance or a single point drop out (no changepoint is detectable).
    * The argmax compares the statistic rounded to 6 decimals, ties
    * broken toward the EARLIER position — same portability discipline
    * as [[dominantSeasonalLag]].
    */
  def cusumChangepoint(
      series: DataFrame,
      keyCol: String,
      orderCol: String,
      valueCol: String): DataFrame = {
    val part = Window.partitionBy(keyCol)
    val run = part.orderBy(orderCol)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val x = col(valueCol).cast("double")
    val scored = series.select(
      col(keyCol),
      col(orderCol),
      sum(x).over(run).as("__cum"),
      count(lit(1)).over(run).as("__i"),
      avg(x).over(part).as("__mean"),
      stddev_samp(x).over(part).as("__sd"),
      count(lit(1)).over(part).as("__n"))
    scored
      .where(col("__sd").isNotNull && col("__sd") > 0)
      .select(
        col(keyCol),
        col(orderCol),
        col("__n"),
        (abs(col("__cum") - col("__i") * col("__mean")) /
          (col("__sd") * sqrt(col("__n").cast("double")))).as("__stat"))
      .groupBy(col(keyCol))
      .agg(
        max_by(
          struct(col(orderCol), col("__stat"), col("__n")),
          struct(round(col("__stat"), 6).as("s6"), monotonic_desc(col(orderCol))))
          .as("__best"))
      .select(
        col(keyCol),
        col(s"__best.$orderCol").as("changepoint_at"),
        col("__best.__stat").as("cusum_stat"),
        col("__best.__n").cast("int").as("n_points"))
  }

  /** Order-inverting key for earliest-wins ties inside `max_by`: works
    * for any orderable numeric/timestamp column by negating its epoch/
    * numeric form.
    */
  private def monotonic_desc(c: org.apache.spark.sql.Column): org.apache.spark.sql.Column =
    -(c.cast("double"))

  /** Per-key OLS trend line y = slope·x + intercept over (xCol, valueCol)
    * — the is-this-metric-drifting primitive. ONE hash aggregate of the
    * moments; slope = cov/var(x), intercept = ȳ − slope·x̄, and r² =
    * cov²/(vx·vy) all form in the PROJECTION under variance guards (the
    * autocorrelation ANSI discipline). Keys with a single row or a
    * constant x emit NULLs; a constant y emits slope 0 exactly (cov is
    * exactly 0), r² NULL. `xCol` should be an exact numeric (epoch days,
    * row index) so x-moments are integer-derived.
    */
  def trendSlope(
      series: DataFrame,
      keyCol: String,
      xCol: String,
      valueCol: String): DataFrame = {
    val x = col(xCol).cast("double")
    val y = col(valueCol).cast("double")
    series
      .groupBy(col(keyCol))
      .agg(
        count(lit(1)).cast("int").as("n_points"),
        covar_samp(x, y).as("__cov"),
        var_samp(x).as("__vx"),
        var_samp(y).as("__vy"),
        avg(x).as("__mx"),
        avg(y).as("__my"))
      .select(
        col(keyCol),
        col("n_points"),
        when(col("__vx") > 0, col("__cov") / col("__vx")).as("slope"),
        when(col("__vx") > 0, col("__my") - col("__cov") / col("__vx") * col("__mx"))
          .as("intercept"),
        when(col("__vx") > 0 && col("__vy") > 0,
          col("__cov") * col("__cov") / (col("__vx") * col("__vy"))).as("r2"))
  }

  /** Seasonal-naive forecast backtest per key: predict `y_t = y_{t−m}`
    * (m = `seasonLag` ROWS — the series is assumed gridded/pre-
    * aggregated, the [[autocorrelation]] contract) and report MAE
    * against it plus MASE = MAE_seasonal / MAE_naive1 (the scale-free
    * Hyndman & Koehler 2006 error, naive1 = y_{t−1}). One lag window
    * pass per key, one hash aggregate; the MASE ratio forms in the
    * projection guarded on a nonzero denominator — a constant series
    * has MAE_naive1 = 0 exactly and emits NULL, not Inf. Keys with
    * ≤ seasonLag rows have no seasonal error rows and drop out.
    */
  def seasonalNaiveBacktest(
      series: DataFrame,
      keyCol: String,
      orderCol: String,
      valueCol: String,
      seasonLag: Int): DataFrame = {
    require(seasonLag >= 2, "seasonLag must be >= 2 (1 would equal naive1)")
    val w = Window.partitionBy(keyCol).orderBy(orderCol)
    val y = col(valueCol).cast("double")
    val lagged = series.select(
      col(keyCol),
      y.as("__y"),
      lag(y, 1).over(w).as("__y1"),
      lag(y, seasonLag).over(w).as("__ym"))
    lagged
      .groupBy(col(keyCol))
      .agg(
        count(lit(1)).cast("int").as("n_points"),
        count(col("__ym")).cast("int").as("n_forecast"),
        avg(when(col("__ym").isNotNull, abs(col("__y") - col("__ym")))).as("mae_seasonal"),
        avg(when(col("__y1").isNotNull, abs(col("__y") - col("__y1")))).as("mae_naive1"))
      .where(col("n_forecast") > 0)
      .select(
        col(keyCol),
        col("n_points"),
        col("n_forecast"),
        col("mae_seasonal"),
        col("mae_naive1"),
        when(col("mae_naive1") > 0, col("mae_seasonal") / col("mae_naive1")).as("mase"))
  }

  /** Hampel outlier filter per key: flag points whose deviation from the
    * trailing-window EXACT median exceeds `nSigmas` robust standard
    * deviations (MAD · 1.4826) — the standard despiking pass for metric
    * feeds, robust where a mean/stddev z-score is itself dragged by the
    * spike it should flag (Hampel 1974; Pearson 2002 survey).
    *
    * Exactness discipline: `windowSize` must be ODD and full windows are
    * required, so BOTH medians (window values, absolute deviations) are
    * single ELEMENTS of a sorted array — never an average of two middles
    * — selected by `array_sort` + `element_at` over a `collect_list`
    * frame. Every emitted number is therefore either an input value, an
    * IEEE subtraction of two inputs, or one multiplication by the single
    * plan-literal `nSigmas · 1.4826` (pre-multiplied so there is exactly
    * ONE rounding, not an ordering-sensitive chain) — bit-identical in
    * any engine. A zero MAD (majority of the window equal) flags ANY
    * deviation from the median, the standard Hampel degenerate case, and
    * falls out of the same comparison with no special case.
    *
    * Shape at scale: ONE window pass per key ordered by `orderCol` with
    * a `windowSize`-row trailing frame; the collected array is bounded
    * by `windowSize` (a plan constant), so state per row is O(w) and the
    * only exchange is the per-key hash partition — the [[dyadicEwma]]
    * shape. Rows before the window fills emit no verdict (NULL medians,
    * `is_outlier` NULL): a half-filled window's median is a different,
    * noisier statistic, and silently mixing the two poisons the flag's
    * precision at the series head.
    */
  def hampelOutliers(
      series: DataFrame,
      keyCol: String,
      orderCol: String,
      valueCol: String,
      windowSize: Int = 7,
      nSigmas: Double = 3.0): DataFrame = {
    require(windowSize >= 3 && windowSize % 2 == 1, "windowSize must be odd and >= 3")
    require(nSigmas > 0, "nSigmas must be > 0")
    val mid = (windowSize + 1) / 2 // 1-based rank of the median element
    val scale = nSigmas * 1.4826 // one literal, one rounding
    val w = Window.partitionBy(keyCol).orderBy(orderCol)
      .rowsBetween(-(windowSize - 1), Window.currentRow)
    val x = col(valueCol).cast("double")
    series
      .select(col(keyCol), col(orderCol), x.as("x"))
      .withColumn("__win", collect_list(col("x")).over(w))
      .withColumn("__med",
        when(size(col("__win")) === windowSize,
          element_at(array_sort(col("__win")), mid)))
      .withColumn("__mad",
        when(col("__med").isNotNull,
          element_at(
            array_sort(transform(col("__win"), v => abs(v - col("__med")))), mid)))
      .select(
        col(keyCol),
        col(orderCol),
        col("x").as("value"),
        col("__med").as("med"),
        col("__mad").as("mad"),
        when(col("__med").isNotNull,
          abs(col("x") - col("__med")) > lit(scale) * col("__mad")).as("is_outlier"))
  }

  /** Per-key robust trend: Mann–Kendall S statistic + Theil–Sen slope —
    * the outlier-immune companions to [[trendSlope]]'s OLS (one spike
    * drags an OLS slope arbitrarily; it moves the pairwise-median slope
    * by one rank at most).
    *
    *   - S = Σ_{i<j} sign(y_j − y_i): pure INTEGER arithmetic,
    *     bit-identical cross-engine by construction;
    *   - Theil–Sen = the EXACT median of all pairwise slopes
    *     (y_j − y_i)/(x_j − x_i): single ELEMENTS of the sorted slope
    *     array (or one IEEE average of the two middles) — the Hampel
    *     exact-median discipline, no interpolated percentile.
    *
    * Pairs are O(m²) PER KEY — by the family's standing contract the
    * series is pre-aggregated to its grain upstream (daily/hourly), so m
    * is bounded (~10²–10³) and the per-key pair frame stays in one
    * task's memory; the join is key-local, one partitioning family.
    * `xCol` must be numeric with distinct values per key (epoch days —
    * grouped grain guarantees distinctness; keys with < 2 points emit
    * NULL stats).
    */
  def robustTrend(
      series: DataFrame,
      keyCol: String,
      xCol: String,
      valueCol: String): DataFrame = {
    val base = series.select(
      col(keyCol),
      col(xCol).cast("double").as("__x"),
      col(valueCol).cast("double").as("__y"))
    val a = base.select(col(keyCol), col("__x").as("__xa"), col("__y").as("__ya"))
    val b = base.select(col(keyCol), col("__x").as("__xb"), col("__y").as("__yb"))
    val pairs = a.join(b, Seq(keyCol.toString))
      .where(col("__xa") < col("__xb"))
      .select(
        col(keyCol),
        signum(col("__yb") - col("__ya")).cast("long").as("__sgn"),
        ((col("__yb") - col("__ya")) / (col("__xb") - col("__xa"))).as("__slope"))
    val stats = pairs
      .groupBy(col(keyCol))
      .agg(
        // count NON-NULL slopes, not pair rows: collect_list drops NULL
        // slopes (a NULL value in either endpoint), so a raw row count
        // would push the median index past the sorted-slope array.
        count(col("__slope")).cast("int").as("n_pairs"),
        sum(col("__sgn")).cast("bigint").as("s_stat"),
        sort_array(collect_list(col("__slope"))).as("__sl"))
      .select(
        col(keyCol),
        col("n_pairs"),
        col("s_stat"),
        when(col("n_pairs") === 0, lit(null).cast("double"))
          .when(col("n_pairs") % 2 === 1,
            element_at(col("__sl"), ((col("n_pairs") + 1) / 2).cast("int")))
          .otherwise(
            (element_at(col("__sl"), (col("n_pairs") / 2).cast("int")) +
              element_at(col("__sl"), (col("n_pairs") / 2 + 1).cast("int"))) / 2)
          .as("theil_sen"))
    base.groupBy(col(keyCol)).agg(count(lit(1)).cast("int").as("n_points"))
      .join(stats, Seq(keyCol.toString), "left")
      .select(
        col(keyCol),
        col("n_points"),
        coalesce(col("n_pairs"), lit(0)).as("n_pairs"),
        col("s_stat"),
        col("theil_sen"))
  }

  /** Classical additive seasonal decomposition (the moving-average
    * ancestor of STL): x = trend + seasonal + residual at a fixed odd
    * `period` (default 7 = weekly at daily grain).
    *
    *   - trend = CENTERED period-width moving average, emitted only for
    *     FULL windows (edges are NULL by contract — a shrinking-window
    *     average would bend the trend toward the series ends);
    *   - seasonal = per-(key, position-in-period) mean of the detrended
    *     series, then CENTERED per key (Σ over positions = 0) so level
    *     lives in the trend, not the seasonal;
    *   - residual = x − trend − seasonal (NULL wherever trend is NULL).
    *
    * Position-in-period is `(days since epoch) mod period` — explicitly,
    * because the engines disagree on day-of-week numbering (Spark
    * Sunday=1, DuckDB Sunday=0).
    *
    * Scale shape: one centered window + one (key, pos) hash agg + one
    * per-key centering window over the ≤period-row seasonal frame + one
    * broadcastable join back. Degenerate keys behave by construction: a
    * constant series decomposes to (x, 0, 0); a series shorter than
    * `period` has all-NULL trend, hence all-NULL seasonal/residual.
    */
  def decomposeAdditive(
      series: DataFrame,
      keyCol: String,
      orderCol: String,
      valueCol: String,
      period: Int = 7): DataFrame = {
    require(period >= 3 && period % 2 == 1, "period must be odd and >= 3")
    val half = (period - 1) / 2
    val wTrend = Window.partitionBy(keyCol).orderBy(orderCol)
      .rowsBetween(-half, half)
    val x = col(valueCol).cast("double")
    val epoch = java.sql.Date.valueOf("1970-01-01")
    val based = series.select(
      col(keyCol),
      col(orderCol),
      x.as("value"),
      pmod(datediff(col(orderCol), lit(epoch)), lit(period)).as("pos"))
    val trended = based
      .withColumn("trend",
        when(count(lit(1)).over(wTrend) === period, avg(col("value")).over(wTrend)))
      .withColumn("__detr", col("value") - col("trend"))
    val wKey = Window.partitionBy(keyCol)
    val seasonal = trended
      .groupBy(col(keyCol), col("pos"))
      .agg(avg(col("__detr")).as("__s"))
      .withColumn("seasonal", col("__s") - avg(col("__s")).over(wKey))
      .select(col(keyCol), col("pos"), col("seasonal"))
    trended
      .join(seasonal, Seq(keyCol, "pos"))
      .select(
        col(keyCol),
        col(orderCol),
        col("value"),
        col("trend"),
        col("seasonal"),
        (col("value") - col("trend") - col("seasonal")).as("residual"))
  }

  /** Per-key partial autocorrelation (PACF) at lags 1..3 — the AR-order
    * fingerprint that [[autocorrelation]] alone cannot give: ACF at lag k
    * conflates direct dependence with dependence routed through shorter
    * lags, PACF removes the shorter lags' contribution (the statistic
    * behind "is this AR(1) or AR(2)?").
    *
    * Uses the STANDARD ACF estimator (global mean, shared sum-of-squares
    * denominator — not per-slice Pearson): r_k = Σ d_t·d_{t−k} / Σ d_t²
    * with d = x − x̄, which is what the Durbin–Levinson recursion is
    * defined over. The recursion is UNROLLED to closed forms (the reason
    * for the lag-3 cap — deterministic scan-side arithmetic, no
    * per-key iteration):
    *
    *   φ11 = r1
    *   φ22 = (r2 − r1²) / (1 − r1²)
    *   φ21 = r1·(1 − φ22)
    *   φ33 = (r3 − φ21·r2 − φ22·r1) / (1 − φ21·r1 − φ22·r2)
    *
    * Degenerate slices emit NULL, never NaN/throw: constant series
    * (Σd² = 0) null every r_k; |r1| = 1 nulls φ22 (and φ33 through the
    * NULL-propagating arithmetic); a zero φ33 denominator nulls φ33. All
    * divisions sit in the projection under `when` guards (the q_e18 ANSI
    * lesson: aggregate-internal guarded divisions still evaluate).
    *
    * Scale shape: one window-family pass per key (mean + k lags on the
    * same partitioning) then one hash aggregate — the series is assumed
    * pre-aggregated to its grain upstream, so this touches only the
    * small series frame.
    */
  def pacf(
      series: DataFrame,
      keyCol: String,
      orderCol: String,
      valueCol: String): DataFrame = {
    val wKey = Window.partitionBy(keyCol)
    val wOrd = Window.partitionBy(keyCol).orderBy(orderCol)
    val x = col(valueCol).cast("double")
    val centered = series.select(
      col(keyCol),
      col(orderCol),
      (x - avg(x).over(wKey)).as("__d"))
    val lagged = centered.select(
      col(keyCol) +: col("__d") +:
        (1 to 3).map(k => lag(col("__d"), k).over(wOrd).as(s"__d$k")): _*)
    val moments = lagged
      .groupBy(col(keyCol))
      .agg(
        count(lit(1)).cast("int").as("n_obs"),
        sum(col("__d") * col("__d")).as("__ss"),
        sum(col("__d") * col("__d1")).as("__s1"),
        sum(col("__d") * col("__d2")).as("__s2"),
        sum(col("__d") * col("__d3")).as("__s3"))
    val acf = moments.select(
      col(keyCol),
      col("n_obs"),
      when(col("__ss") > 0, col("__s1") / col("__ss")).as("r1"),
      when(col("__ss") > 0, col("__s2") / col("__ss")).as("r2"),
      when(col("__ss") > 0, col("__s3") / col("__ss")).as("r3"))
    val p2 = acf.withColumn("__p2",
      when(lit(1) - col("r1") * col("r1") =!= 0,
        (col("r2") - col("r1") * col("r1")) / (lit(1) - col("r1") * col("r1"))))
    val p21 = col("r1") * (lit(1) - col("__p2"))
    p2.select(
      col(keyCol),
      col("n_obs"),
      col("r1"), col("r2"), col("r3"),
      col("r1").as("pacf1"),
      col("__p2").as("pacf2"),
      when(lit(1) - p21 * col("r1") - col("__p2") * col("r2") =!= 0,
        (col("r3") - p21 * col("r2") - col("__p2") * col("r1")) /
          (lit(1) - p21 * col("r1") - col("__p2") * col("r2"))).as("pacf3"))
  }

  /** Per-key DYNAMIC TIME WARPING distance to a broadcast query
    * pattern (Sakoe–Chiba 1978; the elastic match behind shapelet /
    * motif screening): D(i,j) = |y_i − p_j| + min(D(i−1,j), D(i,j−1),
    * D(i−1,j−1)) over the full alignment lattice, reported as
    * `dtw_distance` = D(n,m). Unlike the sliding-window Euclidean
    * primitive, DTW matches the SHAPE under local time stretching —
    * the "does this series contain this pattern, possibly slower"
    * question.
    *
    * Execution shape: the pattern is a PLAN LITERAL (the model-as-
    * literal discipline); the per-key series folds ONCE through a
    * nested `aggregate` HOF — the outer fold walks the series carrying
    * the previous DP row (m+1 doubles), the inner fold builds the next
    * row left to right (the D(i,j−1) dependency makes the row itself a
    * fold) — O(n·m) work, O(m) state, zero shuffle beyond the one
    * per-key collect. Series length is time-window-bounded (the
    * [[theilSenSlope]] argument), so per-key cost is flat at any
    * corpus size.
    *
    * Determinism: every lattice cell is |y−p| + a 3-way min of
    * doubles, accumulated in the FIXED fold order, so another engine
    * replaying the same recursion (the oracle's per-step lateral
    * unroll) reproduces the distance to the bit; the unreachable-cell
    * sentinel is 1e300, unchanged by any finite addition at this
    * magnitude. `orderCol` must be unique per key (gridded series).
    */
  def dtwToPattern(
      series: DataFrame,
      keyCol: String,
      orderCol: String,
      valueCol: String,
      pattern: Seq[Double]): DataFrame = {
    require(pattern.nonEmpty && pattern.size <= 64, "pattern size in [1,64]")
    val m = pattern.size
    val inf = lit(1e300)
    val pArr = array(pattern.map(lit): _*)
    val collected = series
      .groupBy(col(keyCol))
      .agg(sort_array(collect_list(struct(
        col(orderCol).as("o"), col(valueCol).cast("double").as("y")))).as("__s"))
      .select(col(keyCol),
        transform(col("__s"), e => e.getField("y")).as("__ys"))
    val initRow = array((lit(0.0) +: Seq.fill(m)(inf)): _*)
    val finalRow = aggregate(
      col("__ys"),
      initRow,
      (prev, y) => aggregate(
        sequence(lit(1), lit(m)),
        array(inf),
        (acc, j) => concat(acc, array(
          abs(y - element_at(pArr, j)) +
            least(
              element_at(prev, j),
              element_at(prev, j + 1),
              element_at(acc, j))))))
    collected.select(
      col(keyCol),
      size(col("__ys")).as("n_points"),
      round(element_at(finalRow, m + 1), 6).as("dtw_distance"))
  }

  /** Per-key THEIL–SEN robust trend (Theil 1950 / Sen 1968): slope =
    * median of all pairwise slopes (y_j−y_i)/(x_j−x_i) over x_i < x_j,
    * intercept = median of y_i − slope·x_i — the breakdown-point-29%
    * companion to [[trendSlope]]'s OLS line, unmoved by the outliers
    * that drag covariance (the spec plants one 1000× spike: OLS slope
    * explodes, Theil–Sen's doesn't move).
    *
    * Scale contract: the pair expansion is a per-key self-join —
    * O(n_k²) pairs per key, where n_k is the SERIES length, bounded by
    * the time window at any corpus size (a daily grain over a month is
    * ≤ 435 pairs/key forever); total work grows linearly in #keys, the
    * same asymptote as every other per-key window op here. Keys with
    * < 2 distinct x have no pairs and emit NULL slope (the trendSlope
    * convention). Equal-x pairs (infinite slope) are excluded by the
    * strict x_i < x_j, the standard Theil–Sen convention.
    *
    * Replayability: `xCol` must be an exact integer (epoch days, row
    * index), so each pairwise slope is ONE double division of exact
    * values, rounded to 9 decimals; the median is the built-in
    * `percentile` ≡ DuckDB quantile_cont (the probed-identical (n−1)p
    * interpolation) whose midpoint average of two rounded doubles is
    * the same IEEE op in both engines. Intercept terms round the same
    * way, so the whole line is engine-exact at 6 output decimals.
    */
  def theilSenSlope(
      series: DataFrame,
      keyCol: String,
      xCol: String,
      valueCol: String): DataFrame = {
    val pts = series.select(
      col(keyCol).as("__k"),
      col(xCol).cast("bigint").as("__x"),
      col(valueCol).cast("double").as("__y"))
    val a = pts.select(col("__k"), col("__x").as("__xi"), col("__y").as("__yi"))
    val b = pts.select(col("__k"), col("__x").as("__xj"), col("__y").as("__yj"))
    val pairs = a.join(b, Seq("__k"))
      .filter(col("__xi") < col("__xj"))
      .select(
        col("__k"),
        round((col("__yj") - col("__yi")) /
          (col("__xj") - col("__xi")).cast("double"), 9).as("__s"))
    val med = pairs.groupBy(col("__k")).agg(
      count(lit(1)).cast("bigint").as("n_pairs"),
      percentile(col("__s"), lit(0.5)).as("__slope"))
    val icpt = pts.join(med.select(col("__k"), col("__slope")), Seq("__k"))
      .select(col("__k"),
        round(col("__y") - col("__slope") * col("__x").cast("double"), 9).as("__c"))
      .groupBy(col("__k"))
      .agg(percentile(col("__c"), lit(0.5)).as("__icpt"))
    pts.groupBy(col("__k")).agg(count(lit(1)).cast("int").as("n_points"))
      .join(med, Seq("__k"), "left")
      .join(icpt, Seq("__k"), "left")
      .select(
        col("__k").as(keyCol),
        col("n_points"),
        coalesce(col("n_pairs"), lit(0L)).as("n_pairs"),
        round(col("__slope"), 6).as("ts_slope"),
        round(col("__icpt"), 6).as("ts_intercept"))
  }
}
