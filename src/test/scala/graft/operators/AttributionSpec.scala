package graft.operators

import java.sql.Timestamp

import graft.SparkSpec

class AttributionSpec extends SparkSpec {
  import spark.implicits._

  private def ts(m: Int) = Timestamp.valueOf(f"2024-01-01 10:$m%02d:00")

  test("known answers: first/last flags, linear split, lookback bound") {
    val events = Seq(
      // user 1: clicks at :00 and :20, purchase at :30 → both touch it
      (1L, ts(0), 1L, "click"), (2L, ts(20), 1L, "click"),
      (3L, ts(30), 1L, "purchase"),
      // user 1: second purchase at :45 → both clicks still in the hour
      (4L, ts(45), 1L, "purchase"),
      // user 2: click 2h before purchase → OUTSIDE lookback, no credit
      (5L, Timestamp.valueOf("2024-01-01 08:00:00"), 2L, "click"),
      (6L, ts(10), 2L, "purchase"),
      // user 3: purchase with no clicks at all
      (7L, ts(0), 3L, "purchase")
    ).toDF("event_id", "ts", "user_id", "event_type")
    val got = Attribution.multiTouch(events, "user_id", "ts", "event_id",
      "event_type", "click", "purchase", lookbackSec = 3600L)
      .orderBy("touch_id")
      .collect()
      .map(r => (r.getLong(0), r.getInt(1), r.getDouble(2), r.getInt(3), r.getInt(4)))
    assert(got === Array(
      (1L, 2, 1.0, 2, 0),  // first touch of both conversions, half credit each
      (2L, 2, 1.0, 0, 2))) // last touch of both
  }

  test("equal timestamps break by touch id; credits sum to conversions") {
    val events = Seq(
      (1L, ts(0), 1L, "click"), (2L, ts(0), 1L, "click"), (3L, ts(0), 1L, "click"),
      (4L, ts(5), 1L, "purchase")
    ).toDF("event_id", "ts", "user_id", "event_type")
    val got = Attribution.multiTouch(events, "user_id", "ts", "event_id",
      "event_type", "click", "purchase", 3600L)
      .orderBy("touch_id").collect()
    assert(got.map(_.getInt(3)).toSeq === Seq(1, 0, 0), "lowest id is first")
    assert(got.map(_.getInt(4)).toSeq === Seq(0, 0, 1), "highest id is last")
    assert(math.abs(got.map(_.getDouble(2)).sum - 1.0) < 1e-12,
      "linear credit sums to one conversion")
  }
}
