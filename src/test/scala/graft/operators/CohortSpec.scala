package graft.operators

import java.sql.Timestamp

import graft.SparkSpec

class CohortSpec extends SparkSpec {
  import spark.implicits._

  test("retention: hand-computed matrix; offset-0 rate is 1 per cohort") {
    def ts(s: String) = Timestamp.valueOf(s)
    // weeks are Monday-truncated: W1 = 2024-01-01, W2 = 2024-01-08,
    // W4 = 2024-01-22. u1: W1, W2; u2: W1 only; u3: W2, W4.
    val events = Seq(
      (1L, ts("2024-01-03 10:00:00")), (1L, ts("2024-01-10 09:00:00")),
      (1L, ts("2024-01-10 17:00:00")), // same week twice — distinct-week dedup
      (2L, ts("2024-01-05 12:00:00")),
      (3L, ts("2024-01-08 08:00:00")), (3L, ts("2024-01-25 23:00:00")))
      .toDF("user_id", "ts")
    val got = Cohort.retention(events, "user_id", "ts")
      .orderBy("cohort_week", "week_offset")
      .collect()
      .map(r => (r.getDate(0).toString, r.getInt(1), r.getLong(2), r.getLong(3),
        r.getDouble(4)))
    assert(got.toSeq === Seq(
      ("2024-01-01", 0, 2L, 2L, 1.0),
      ("2024-01-01", 1, 1L, 2L, 0.5),
      ("2024-01-08", 0, 1L, 1L, 1.0),
      ("2024-01-08", 2, 1L, 1L, 1.0)))
  }
}
