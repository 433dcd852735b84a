package graft.operators

import java.sql.Timestamp

import org.apache.spark.sql.functions.col

import graft.SparkSpec

class TimeSeriesSpec extends SparkSpec {
  import spark.implicits._

  private def ts(s: String) = Timestamp.valueOf(s)

  test("known answers: hourly grid, gap rows carry last observation") {
    val events = Seq(
      // user 1: hours 00 and 03 observed → grid 00..03, gaps 01,02
      (1L, ts("2024-01-01 00:10:00"), 1.50),
      (1L, ts("2024-01-01 00:40:00"), 2.25),
      (1L, ts("2024-01-01 03:05:00"), 4.00),
      // user 2: a single hour → one-row grid
      (2L, ts("2024-01-02 10:30:00"), 7.00)
    ).toDF("user_id", "ts", "value")
    val got = TimeSeries.hourlyGapFillLocf(events, "user_id", "ts", "value")
      .orderBy("user_id", "h")
      .collect()
      .map(r => (r.getLong(0), r.getTimestamp(1).toString, r.getInt(2), r.getDouble(3)))
    assert(got === Array(
      (1L, "2024-01-01 00:00:00.0", 2, 3.75),
      (1L, "2024-01-01 01:00:00.0", 0, 3.75),
      (1L, "2024-01-01 02:00:00.0", 0, 3.75),
      (1L, "2024-01-01 03:00:00.0", 1, 4.00),
      (2L, "2024-01-02 10:00:00.0", 1, 7.00)))
  }

  test("rolling z-score: known window stats, flat windows never flag") {
    val series = (
      Seq.tabulate(30)(i => (1L, ts(f"2024-01-01 $i%02d:00:00").getTime / 1000 * 1000, 10.0)) :+
        ((1L, ts("2024-01-02 06:00:00").getTime, 99.0))
      ).map { case (u, ms, v) => (u, new Timestamp(ms), v) }
      .toDF("user_id", "h", "v")
    val got = TimeSeries.rollingZScore(series, "user_id", "h", "v",
      windowSlots = 24, threshold = 3.0)
      .orderBy("h").collect()
    // first 30 slots: flat value 10.0 → zero/undefined std, never anomalous
    assert(got.take(30).forall(!_.getBoolean(got.head.fieldIndex("is_anomaly"))))
    // the 99.0 spike against a flat-10 baseline flags
    val spike = got.last
    assert(spike.getDouble(spike.fieldIndex("v")) === 99.0)
    assert(spike.getBoolean(spike.fieldIndex("is_anomaly")))
    // single-row window (first slot) has null std, not NaN
    assert(got.head.isNullAt(got.head.fieldIndex("roll_std")))
  }

  test("cohort retention: known triangle, offsets in whole weeks") {
    val orders = Seq(
      // user 1 first active week of Jan 1 (Mon), returns weeks +1, +3
      (1L, "2024-01-03"), (1L, "2024-01-09"), (1L, "2024-01-24"),
      // user 2 same cohort, active only week 0 (two orders, one cell row)
      (2L, "2024-01-02"), (2L, "2024-01-05"),
      // user 3 cohort of Jan 8, returns week +1
      (3L, "2024-01-10"), (3L, "2024-01-18")
    ).toDF("u", "d").select(col("u"), col("d").cast("date").as("d"))
    val got = TimeSeries.cohortRetention(orders, "u", "d")
      .orderBy("cohort_week", "week_offset")
      .collect().map(r => (r.getTimestamp(0).toString.take(10), r.getInt(1), r.getInt(2)))
    assert(got === Array(
      ("2024-01-01", 0, 2),
      ("2024-01-01", 1, 1),
      ("2024-01-01", 3, 1),
      ("2024-01-08", 0, 1),
      ("2024-01-08", 1, 1)))
  }

  test("mergeIntervals: overlap and touch merge, gaps split, keys isolated") {
    val iv = Seq(
      // user 1: [0,10) overlaps [5,15); [15,20) TOUCHES (start == max end)
      // and merges; [30,35) opens a new island
      (1L, 0L, 10L, 100L),
      (1L, 5L, 15L, 101L),
      (1L, 15L, 20L, 102L),
      (1L, 30L, 35L, 103L),
      // an earlier LONG interval swallows a later short one: [0,50) ⊃ [10,12)
      // and [20,25) — running MAX end (not previous end) keeps one island
      (2L, 0L, 50L, 200L),
      (2L, 10L, 12L, 201L),
      (2L, 20L, 25L, 202L),
      // user 3: same start twice → one island
      (3L, 7L, 9L, 300L),
      (3L, 7L, 8L, 301L)
    ).toDF("u", "s", "e", "id")
    val got = TimeSeries.mergeIntervals(iv, "u", "s", "e", "id")
      .orderBy("u", "island_start")
      .collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getInt(3)))
    assert(got === Array(
      (1L, 0L, 20L, 3),
      (1L, 30L, 35L, 1),
      (2L, 0L, 50L, 3),
      (3L, 7L, 9L, 2)))
  }

  test("dyadicEwma: exact halving fold, frame bound, single row = value") {
    val series = Seq(
      (1L, 1L, 8.0), (1L, 2L, 4.0), (1L, 3L, 2.0),
      (2L, 1L, 5.0)
    ).toDF("u", "d", "v")
    val got = TimeSeries.dyadicEwma(series, "u", "d", "v", windowRows = 16)
      .orderBy("u", "d").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getDouble(3)))
    // fold: 8 → (8+4)/2 = 6 → (6+2)/2 = 4 — exact dyadic arithmetic
    assert(got === Array((1L, 1L, 8.0), (1L, 2L, 6.0), (1L, 3L, 4.0), (2L, 1L, 5.0)))
    // frame bound: with windowRows = 2 the oldest row falls out
    val bounded = TimeSeries.dyadicEwma(series, "u", "d", "v", windowRows = 2)
      .orderBy("u", "d").collect().map(_.getDouble(3))
    assert(bounded === Array(8.0, 6.0, 3.0, 5.0)) // row 3: (4+2)/2
  }

  test("autocorrelation: alternating series is -1 at lag 1, +1 at lag 2") {
    val series = (1 to 10).map(i =>
      (1L, i, if (i % 2 == 0) 1.0 else -1.0)).toDF("k", "t", "v")
    val got = TimeSeries.autocorrelation(series, "k", "t", "v", maxLag = 2)
      .collect().map(r => (r.getInt(1), r.getInt(2), r.getDouble(3))).toSet
    // lag 1: 9 pairs of opposite signs; lag 2: 8 pairs of equal signs
    assert(got.map { case (l, n, r) => (l, n, math.rint(r * 1e9) / 1e9) } ===
      Set((1, 9, -1.0), (2, 8, 1.0)))
  }

  test("dominantSeasonalLag: period wins; linear ties break to the smaller lag; degenerate keys drop") {
    // key 1: alternating → lag 2 (r = +1) beats lag 1 (r = -1)
    // key 2: linear → every lag has r = 1 after 6-decimal rounding → lag 1
    // key 3: constant → all lags NULL → no row
    val series =
      (1 to 10).map(i => (1L, i, if (i % 2 == 0) 1.0 else -1.0)) ++
        (1 to 10).map(i => (2L, i, i.toDouble)) ++
        (1 to 10).map(i => (3L, i, 7.0))
    val got = TimeSeries.dominantSeasonalLag(series.toDF("k", "t", "v"), "k", "t", "v", maxLag = 3)
      .collect().map(r => (r.getLong(0), r.getInt(1))).toMap
    assert(got === Map(1L -> 2, 2L -> 1))
  }

  test("cusumChangepoint: level shift found at the step; ties earliest; flat keys drop") {
    // key 1: 0,0,0,10,10,10 — |cum − i·mean| peaks at i=3 (|0−15| = 15)
    // key 2: constant → sd = 0 → no row;  key 3: single point → sd NULL → no row
    val series =
      Seq((1L, 1, 0.0), (1L, 2, 0.0), (1L, 3, 0.0), (1L, 4, 10.0), (1L, 5, 10.0), (1L, 6, 10.0)) ++
        Seq((2L, 1, 4.0), (2L, 2, 4.0)) ++
        Seq((3L, 1, 9.0))
    val out = TimeSeries.cusumChangepoint(series.toDF("k", "t", "v"), "k", "t", "v")
      .collect()
    assert(out.map(_.getLong(0)).toSet === Set(1L))
    val r = out.head
    assert(r.getInt(1) === 3, "changepoint at the last pre-shift row")
    assert(r.getInt(3) === 6)
    // stat = 15 / (sd * sqrt(6)), sd = stddev_samp of the six values
    val sd = math.sqrt(Seq(0d, 0, 0, 10, 10, 10).map(v => (v - 5) * (v - 5)).sum / 5)
    assert(math.abs(r.getDouble(2) - 15 / (sd * math.sqrt(6))) < 1e-12)
  }

  test("trendSlope: exact line recovered; constant y → slope 0; single point → NULLs") {
    val series =
      (0 to 4).map(x => (1L, x, 2.0 * x + 3)) ++ //  y = 2x+3 exactly
        (0 to 4).map(x => (2L, x, 7.0)) ++ //        constant
        Seq((3L, 0, 9.0)) //                         single point
    val got = TimeSeries.trendSlope(series.toDF("k", "x", "v"), "k", "x", "v")
      .collect()
      .map(r => r.getLong(0) -> r)
      .toMap
    assert(got(1L).getDouble(2) === 2.0)
    assert(got(1L).getDouble(3) === 3.0)
    assert(got(1L).getDouble(4) === 1.0)
    assert(got(2L).getDouble(2) === 0.0, "constant y: every cov term is exactly 0")
    assert(got(2L).getDouble(3) === 7.0)
    assert(got(2L).isNullAt(4), "r2 undefined at zero y-variance")
    assert(got(3L).isNullAt(2) && got(3L).isNullAt(3) && got(3L).isNullAt(4))
  }

  test("seasonalNaiveBacktest: period-m series scores MASE 0; constant → NULL; short keys drop") {
    val series =
      (1 to 6).map(i => (1L, i, if (i % 2 == 1) 1.0 else 5.0)) ++ // period 2
        (1 to 6).map(i => (2L, i, 4.0)) ++ //                        constant
        Seq((3L, 1, 1.0), (3L, 2, 2.0)) //                           too short for m=2
    val got = TimeSeries
      .seasonalNaiveBacktest(series.toDF("k", "t", "v"), "k", "t", "v", seasonLag = 2)
      .collect().map(r => r.getLong(0) -> r).toMap
    assert(got.keySet === Set(1L, 2L), "key 3 has no m-back rows")
    assert(got(1L).getDouble(3) === 0.0, "perfect period-2 forecast")
    assert(got(1L).getDouble(4) === 4.0)
    assert(got(1L).getDouble(5) === 0.0)
    assert(got(2L).getDouble(3) === 0.0)
    assert(got(2L).isNullAt(5), "constant series: naive MAE 0 → NULL, not Inf")
  }

  test("autocorrelation: constant and single-pair slices emit NULL, not NaN") {
    val series = Seq(
      (1L, 1, 5.0), (1L, 2, 5.0), (1L, 3, 5.0), // constant → zero variance
      (2L, 1, 1.0), (2L, 2, 2.0) // one lag-1 pair → var_samp undefined
    ).toDF("k", "t", "v")
    val got = TimeSeries.autocorrelation(series, "k", "t", "v", maxLag = 1)
      .collect().map(r => (r.getLong(0), r.isNullAt(3))).toMap
    assert(got === Map(1L -> true, 2L -> true))
  }

  test("first slot of every key is observed; sv_filled never null") {
    val events = graft.Tables.load(spark, sf(), "events")
    val filled = TimeSeries.hourlyGapFillLocf(events, "user_id", "ts", "value")
    assert(filled.filter("sv_filled IS NULL").count() === 0)
    // per key: slot count == span hours + 1, and ≥ observed hours
    val bad = filled.groupBy("user_id")
      .agg(
        org.apache.spark.sql.functions.count(org.apache.spark.sql.functions.lit(1)).as("slots"),
        org.apache.spark.sql.functions.expr(
          "CAST((unix_timestamp(max(h)) - unix_timestamp(min(h))) / 3600 AS BIGINT) + 1 AS span"))
      .filter("slots <> span")
    assert(bad.count() === 0)
  }

  test("hampel: hand-computed medians/MADs at window 3; spike flagged, rest not") {
    val series = Seq((1L, 1, 1.0), (1L, 2, 2.0), (1L, 3, 3.0), (1L, 4, 100.0), (1L, 5, 5.0))
      .toDF("k", "t", "v")
    val got = TimeSeries.hampelOutliers(series, "k", "t", "v", windowSize = 3)
      .orderBy("t").collect()
    // t=1,2: window not full → no verdict
    assert(got(0).isNullAt(3) && got(0).isNullAt(5))
    assert(got(1).isNullAt(3) && got(1).isNullAt(5))
    // [1,2,3]: med 2, mad 1, |3-2| = 1 <= 4.4478
    assert(got(2).getDouble(3) === 2.0 && got(2).getDouble(4) === 1.0)
    assert(!got(2).getBoolean(5))
    // [2,3,100]: med 3, mad 1, |100-3| = 97 > 4.4478
    assert(got(3).getDouble(3) === 3.0 && got(3).getDouble(4) === 1.0)
    assert(got(3).getBoolean(5))
    // [3,100,5]: med 5, mad 2, |5-5| = 0
    assert(got(4).getDouble(3) === 5.0 && got(4).getDouble(4) === 2.0)
    assert(!got(4).getBoolean(5))
  }

  test("hampel: zero MAD flags any deviation; exact-median run stays quiet") {
    val series = (1 to 7).map(t => (1L, t, 1.0)) :+ ((1L, 8, 1.000001))
    val got = TimeSeries.hampelOutliers(series.toDF("k", "t", "v"), "k", "t", "v")
      .orderBy("t").collect()
    assert(got(5).isNullAt(5), "6 of 7 rows: window not full, no verdict")
    assert(!got(6).getBoolean(5), "all-equal full window: deviation 0 is not > 0")
    assert(got(7).getDouble(4) === 0.0, "majority equal → MAD exactly 0")
    assert(got(7).getBoolean(5), "any nonzero deviation at MAD 0 is an outlier")
  }

  test("hampel: keys are independent and windowSize must be odd") {
    val series = Seq((1L, 1, 1.0), (1L, 2, 1.0), (2L, 1, 50.0), (2L, 2, 50.0), (2L, 3, 50.0))
      .toDF("k", "t", "v")
    val got = TimeSeries.hampelOutliers(series, "k", "t", "v", windowSize = 3)
      .orderBy("k", "t").collect()
    assert(got(0).isNullAt(3) && got(1).isNullAt(3), "key 1 never fills a 3-window")
    assert(got(4).getDouble(3) === 50.0, "key 2's window sees only key 2")
    intercept[IllegalArgumentException] {
      TimeSeries.hampelOutliers(series, "k", "t", "v", windowSize = 4)
    }
  }

  test("robustTrend: hand-computed S and exact even/odd slope medians") {
    import org.apache.spark.sql.Row
    // odd pair count: y = [1,2,3] → all slopes 1, S = 3
    val lin = Seq((1L, 0, 1.0), (1L, 1, 2.0), (1L, 2, 3.0))
    // even pair count: y = [0,1,3,2] → sorted slopes [-1,.5,2/3,1,1.5,2],
    // median (2/3+1)/2, S = 4
    val mix = Seq((2L, 0, 0.0), (2L, 1, 1.0), (2L, 2, 3.0), (2L, 3, 2.0))
    // single point: no pairs, NULL stats
    val one = Seq((3L, 0, 9.0))
    val got = TimeSeries.robustTrend(
      (lin ++ mix ++ one).toDF("k", "x", "v"), "k", "x", "v")
      .orderBy("k").collect()
    assert(got(0) match {
      case Row(1L, 3, 3, 3L, ts: Double) => math.abs(ts - 1.0) < 1e-12
      case _ => false
    })
    assert(got(1).getLong(3) === 4L)
    assert(math.abs(got(1).getDouble(4) - (2.0 / 3 + 1.0) / 2) < 1e-12)
    assert(got(2).getInt(1) === 1 && got(2).getInt(2) === 0)
    assert(got(2).isNullAt(3) && got(2).isNullAt(4))
  }

  test("robustTrend: a spike tilts S but not the Theil-Sen slope") {
    val flat = (0 to 9).map(i => (1L, i, if (i == 6) 200.0 else 10.0))
    val got = TimeSeries.robustTrend(flat.toDF("k", "x", "v"), "k", "x", "v")
      .collect()(0)
    assert(got.getLong(3) === 3L, "6 rising + 3 falling spike pairs → S = 3")
    assert(got.getDouble(4) === 0.0, "the pairwise median ignores the spike entirely")
  }

  test("pacf: hand-computed Durbin-Levinson on [1,2,3,4]") {
    val series = (1 to 4).map(t => (1L, t, t.toDouble)).toDF("k", "t", "v")
    val got = TimeSeries.pacf(series, "k", "t", "v").collect()
    assert(got.length === 1)
    val r = got(0)
    assert(r.getInt(1) === 4)
    // d = [-1.5,-0.5,0.5,1.5], ss = 5, s1 = 1.25, s2 = -1.5, s3 = -2.25
    assert(math.abs(r.getDouble(2) - 0.25) < 1e-12) // r1
    assert(math.abs(r.getDouble(3) + 0.30) < 1e-12) // r2
    assert(math.abs(r.getDouble(4) + 0.45) < 1e-12) // r3
    assert(math.abs(r.getDouble(5) - 0.25) < 1e-12) // pacf1 = r1
    val p2 = (-0.30 - 0.0625) / (1 - 0.0625)
    assert(math.abs(r.getDouble(6) - p2) < 1e-12)
    val p21 = 0.25 * (1 - p2)
    val p3 = (-0.45 - p21 * -0.30 - p2 * 0.25) / (1 - p21 * 0.25 - p2 * -0.30)
    assert(math.abs(r.getDouble(7) - p3) < 1e-12)
  }

  test("pacf: zero r1 routes pacf2 = r2; constant series is all NULL") {
    // x = [1,2,3]: d = [-1,0,1], ss = 2, s1 = 0 → r1 = 0, pacf2 = r2 = -0.5
    val lin = (1 to 3).map(t => (1L, t, t.toDouble)).toDF("k", "t", "v")
    val g1 = TimeSeries.pacf(lin, "k", "t", "v").collect()(0)
    assert(g1.getDouble(2) === 0.0)
    assert(math.abs(g1.getDouble(6) + 0.5) < 1e-12)
    val const = (1 to 5).map(t => (1L, t, 3.0)).toDF("k", "t", "v")
    val g2 = TimeSeries.pacf(const, "k", "t", "v").collect()(0)
    (2 to 7).foreach(i => assert(g2.isNullAt(i), s"col $i must be NULL on a constant series"))
  }

  test("decompose: linear series has zero seasonal and residual on the interior") {
    val days = (1 to 14).map(i => (1L, ts(f"2024-01-$i%02d 00:00:00"), i.toDouble))
    val got = TimeSeries.decomposeAdditive(days.toDF("k", "day", "v"), "k", "day", "v")
      .orderBy("day").collect()
    assert(got.length === 14)
    // edges: first and last 3 rows have NULL trend → NULL residual
    (0 to 2).foreach(i => assert(got(i).isNullAt(3) && got(i).isNullAt(5)))
    (11 to 13).foreach(i => assert(got(i).isNullAt(3) && got(i).isNullAt(5)))
    // interior: centered MA of a linear series is the value itself
    (3 to 10).foreach { i =>
      assert(math.abs(got(i).getDouble(3) - got(i).getDouble(2)) < 1e-9, s"trend@$i")
      assert(math.abs(got(i).getDouble(4)) < 1e-9, s"seasonal@$i")
      assert(math.abs(got(i).getDouble(5)) < 1e-9, s"residual@$i")
    }
  }

  test("decompose: constant series → (x, 0, 0); short series stays NULL; period validated") {
    val const = (1 to 10).map(i => (1L, ts(f"2024-02-$i%02d 00:00:00"), 5.0))
    val short = (1 to 2).map(i => (2L, ts(f"2024-02-$i%02d 00:00:00"), i.toDouble))
    val got = TimeSeries.decomposeAdditive((const ++ short).toDF("k", "day", "v"), "k", "day", "v")
      .orderBy("k", "day").collect()
    val interior = got.filter(r => r.getLong(0) == 1L && !r.isNullAt(3))
    assert(interior.length === 4)
    interior.foreach { r =>
      assert(r.getDouble(3) === 5.0 && math.abs(r.getDouble(4)) < 1e-12 &&
        math.abs(r.getDouble(5)) < 1e-12)
    }
    got.filter(_.getLong(0) == 2L).foreach { r =>
      assert(r.isNullAt(3) && r.isNullAt(4) && r.isNullAt(5),
        "a series shorter than the period has no trend, seasonal, or residual")
    }
    intercept[IllegalArgumentException] {
      TimeSeries.decomposeAdditive(const.toDF("k", "day", "v"), "k", "day", "v", period = 6)
    }
  }

  test("holtLinear: hand-computed recursion, constant series, key isolation") {
    import spark.implicits._
    // out-of-order input proves the sort; x = [4, 8, 2] at t = 1, 2, 3
    val series = Seq(("a", 3, 2.0), ("a", 1, 4.0), ("a", 2, 8.0),
      ("c", 1, 5.0), ("c", 2, 5.0), ("c", 3, 5.0), ("c", 4, 5.0))
      .toDF("k", "t", "v")
    val got = TimeSeries.holtLinear(series, "k", "t", "v")
      .orderBy("k", "t").collect()
    val a = got.filter(_.getString(0) == "a")
    // t=1 seed: level 4, trend 0, fitted NULL
    assert(a(0).getDouble(3) === 4.0 && a(0).getDouble(4) === 0.0 && a(0).isNullAt(5))
    assert(a(0).getDouble(7) === 4.0) // forecast_next = 4 + 0
    // t=2: fit 4 → level 6, trend 1, residual 4, forecast_next 7
    assert(a(1).getDouble(3) === 6.0 && a(1).getDouble(4) === 1.0)
    assert(a(1).getDouble(5) === 4.0 && a(1).getDouble(6) === 4.0 &&
      a(1).getDouble(7) === 7.0)
    // t=3: fit 7 → level 4.5, trend −0.25, residual −5, forecast_next 4.25
    assert(a(2).getDouble(3) === 4.5 && a(2).getDouble(4) === -0.25)
    assert(a(2).getDouble(5) === 7.0 && a(2).getDouble(6) === -5.0 &&
      a(2).getDouble(7) === 4.25)
    // constant series: level pinned at 5, trend 0, residuals 0 after seed
    val c = got.filter(_.getString(0) == "c")
    assert(c.forall(r => r.getDouble(3) === 5.0 && r.getDouble(4) === 0.0))
    assert(c.drop(1).forall(r => r.getDouble(5) === 5.0 && r.getDouble(6) === 0.0))
  }
}
