package graft.operators

import java.sql.Timestamp

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
}
