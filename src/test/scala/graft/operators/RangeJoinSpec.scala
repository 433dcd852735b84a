package graft.operators

import org.apache.spark.sql.functions._

import graft.{SparkSpec, Tables}

class RangeJoinSpec extends SparkSpec {

  test("nearestWithin: bidirectional pick, ties to earlier, out-of-range absent") {
    import spark.implicits._
    import java.sql.Timestamp
    def ts(s: String) = Timestamp.valueOf(s)
    val left = Seq(
      (10L, 1L, ts("2024-01-01 12:00:00")), // clicks at ±10min and +5min → +5min wins
      (11L, 1L, ts("2024-01-01 18:00:00")), // nothing within 30min → absent
      (12L, 2L, ts("2024-01-01 12:00:00"))  // equidistant ±5min → earlier wins
    ).toDF("purchase_id", "u", "pt")
    val right = Seq(
      (100L, 1L, ts("2024-01-01 11:50:00")),
      (101L, 1L, ts("2024-01-01 12:05:00")),
      (102L, 2L, ts("2024-01-01 11:55:00")),
      (103L, 2L, ts("2024-01-01 12:05:00"))
    ).toDF("click_id", "u", "ct")
    val got = RangeJoin.nearestWithin(left, right, "u", "pt", "ct",
      "purchase_id", "click_id", toleranceMicros = 30L * 60 * 1000000)
      .orderBy("purchase_id")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    assert(got === Array(
      (10L, 101L, 300000000L),
      (12L, 102L, 300000000L)))
  }
  import spark.implicits._

  test("known answers: boundary inclusive, outside excluded, bin edges covered") {
    // tolerance 10 μs; bins are [0,10), [10,20), ... — pairs straddle edges
    val left = Seq((1L, 10L), (2L, 25L)).toDF("lid", "lt")
      .withColumn("lt", timestamp_micros(col("lt")))
    val right = Seq((100L, 0L), (101L, 20L), (102L, 36L)).toDF("rid", "rt")
      .withColumn("rt", timestamp_micros(col("rt")))
    val out = RangeJoin.binnedIntervalJoin(left, right, "lt", "rt", 10L)
      .select("lid", "rid").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(out === Set(
      (1L, 100L), // |10-0|  = 10 == tol, inclusive, adjacent bins
      (1L, 101L), // |10-20| = 10 == tol
      (2L, 101L)  // |25-20| = 5; (2,102) is |25-36| = 11 > tol, excluded
    ), s"got $out")
  }

  test("equals the naive non-equi join on real events; no duplicate pairs") {
    val ev = Tables.load(spark, sf(), "events")
    val e = ev.filter($"event_type" === "error").select($"event_id".as("err_id"), $"ts".as("ets"))
    val p = ev.filter($"event_type" === "purchase").select($"event_id".as("p_id"), $"ts".as("pts"))
    val tol = 3600000000L
    val got = RangeJoin.binnedIntervalJoin(e, p, "ets", "pts", tol)
      .select("err_id", "p_id").collect().map(r => (r.getLong(0), r.getLong(1)))
    assert(got.length === got.toSet.size, "each qualifying pair must appear exactly once")
    val naive = e.join(p, abs(unix_micros($"ets") - unix_micros($"pts")) <= tol)
      .select("err_id", "p_id").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(got.toSet === naive)
    assert(naive.nonEmpty)
  }

  test("plan: equi-join on the bin key, no nested-loop/cartesian") {
    val ev = Tables.load(spark, sf(), "events")
    val e = ev.filter($"event_type" === "error").select($"event_id".as("err_id"), $"ts".as("ets"))
    val p = ev.filter($"event_type" === "purchase").select($"ts".as("pts"), $"value")
    val plan = RangeJoin.binnedIntervalJoin(e, p, "ets", "pts", 3600000000L)
      .queryExecution.executedPlan.toString
    assert(!plan.contains("BroadcastNestedLoopJoin") && !plan.contains("CartesianProduct"),
      s"range join must execute as a bin equi-join:\n$plan")
  }
}
