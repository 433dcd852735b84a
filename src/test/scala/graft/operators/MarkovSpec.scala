package graft.operators

import java.sql.Timestamp

import graft.SparkSpec

class MarkovSpec extends SparkSpec {
  import spark.implicits._

  private def ts(m: Int) = Timestamp.valueOf(f"2024-01-01 00:$m%02d:00")

  test("known answers: per-key successor pairing, row-conditional p") {
    val events = Seq(
      // user 1: a → b → a → c   user 2: b → a
      (1L, ts(0), 1L, "a"), (2L, ts(1), 1L, "b"),
      (3L, ts(2), 1L, "a"), (4L, ts(3), 1L, "c"),
      (5L, ts(0), 2L, "b"), (6L, ts(5), 2L, "a")
    ).toDF("event_id", "ts", "user_id", "event_type")
    val got = Markov.transitionMatrix(events, "user_id", "ts", "event_type", "event_id")
      .orderBy("cur", "next")
      .collect().map(r => (r.getString(0), r.getString(1), r.getLong(2), r.getDouble(3)))
    // transitions: (a,b) (b,a)×2 (a,c); c(a)=2, c(b)=2
    assert(got === Array(
      ("a", "b", 1L, 0.5),
      ("a", "c", 1L, 0.5),
      ("b", "a", 2L, 1.0)))
  }

  test("topPaths: consecutive trigrams only, total tie-break at the cut") {
    val events = Seq(
      (1L, ts(0), 1L, "a"), (2L, ts(1), 1L, "b"), (3L, ts(2), 1L, "c"),
      (4L, ts(3), 1L, "a"), (5L, ts(4), 1L, "b"), (6L, ts(5), 1L, "c"),
      (7L, ts(0), 2L, "x"), (8L, ts(1), 2L, "y"), (9L, ts(2), 2L, "z")
    ).toDF("event_id", "ts", "user_id", "event_type")
    val got = Markov.topPaths(events, "user_id", "ts", "event_type", "event_id", k = 3)
      .collect().map(r => (r.getString(0), r.getString(1), r.getString(2), r.getLong(3)))
    // user 1 trigrams: abc, bca, cab, abc → abc×2; user 2: xyz×1
    assert(got === Array(
      ("a", "b", "c", 2L),
      ("b", "c", "a", 1L),
      ("c", "a", "b", 1L)))
  }

  test("ties on timestamp break by the tie column; p sums to 1 per row") {
    val t0 = ts(0)
    val events = Seq(
      (1L, t0, 1L, "x"), (2L, t0, 1L, "y"), (3L, t0, 1L, "z")
    ).toDF("event_id", "ts", "user_id", "event_type")
    val got = Markov.transitionMatrix(events, "user_id", "ts", "event_type", "event_id")
      .orderBy("cur").collect().map(r => (r.getString(0), r.getString(1)))
    assert(got === Array(("x", "y"), ("y", "z")), "event_id orders equal timestamps")
    val sums = Markov.transitionMatrix(
      graft.Tables.load(spark, sf(), "events"), "user_id", "ts", "event_type", "event_id")
      .groupBy("cur").sum("p").collect().map(_.getDouble(1))
    assert(sums.forall(s => math.abs(s - 1.0) < 1e-9), "rows are distributions")
  }
}
