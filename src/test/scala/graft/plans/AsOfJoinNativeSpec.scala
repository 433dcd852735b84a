package graft.plans

import java.sql.Timestamp

import org.apache.spark.sql.functions._

import graft.SparkSpec

class AsOfJoinNativeSpec extends SparkSpec {
  import spark.implicits._

  private def ts(s: String) = Timestamp.valueOf(s)

  test("known answers: latest prior match, <= inclusive, no-match nulls") {
    val purchases = Seq(
      (1L, 10L, ts("2024-01-01 12:00:00")),
      (1L, 11L, ts("2024-01-01 12:30:00")),
      (2L, 12L, ts("2024-01-01 09:00:00")) // before any click → nulls
    ).toDF("u", "purchase_id", "pt")
    val clicks = Seq(
      (1L, 100L, ts("2024-01-01 11:00:00")),
      (1L, 101L, ts("2024-01-01 12:00:00")), // exactly at purchase → matches (<=)
      (1L, 102L, ts("2024-01-01 12:40:00")), // future → never matches
      (2L, 103L, ts("2024-01-01 10:00:00"))
    ).toDF("cu", "click_id", "ct")
    val got = AsOfJoinNative.leftAsOf(purchases, clicks, "u", "cu", "pt", "ct")
      .orderBy("purchase_id")
      .collect()
      .map(r => (r.getLong(1), if (r.isNullAt(4)) -1L else r.getLong(4)))
    assert(got === Array((10L, 101L), (11L, 101L), (12L, -1L)))
  }

  test("exec appears in the physical plan with exchanges and sorts planned") {
    val purchases = Seq((1L, 10L, ts("2024-01-01 12:00:00"))).toDF("u", "pid", "pt")
    val clicks = Seq((1L, 100L, ts("2024-01-01 11:00:00"))).toDF("cu", "cid", "ct")
    val df = AsOfJoinNative.leftAsOf(purchases, clicks, "u", "cu", "pt", "ct")
    val plan = df.queryExecution.executedPlan.toString
    assert(plan.contains("AsOfJoin"), plan) // SparkPlan nodeName strips "Exec"
    assert(plan.contains("Exchange hashpartitioning"),
      "EnsureRequirements must co-partition both sides on the key")
    assert(plan.contains("Sort"), "EnsureRequirements must plan the (key, ts) sorts")
  }

  test("equals the union+window composition on real events") {
    val ev = graft.Tables.load(spark, sf(), "events")
    val purchases = ev.filter(col("event_type") === "purchase")
      .select(col("event_id"), col("user_id"), col("ts"), col("value"))
    val clicks = ev.filter(col("event_type") === "click")
      .groupBy(col("user_id").as("c_user"), col("ts").as("c_ts"))
      .agg(max("event_id").as("click_id"))
    val native = AsOfJoinNative
      .leftAsOf(purchases, clicks, "user_id", "c_user", "ts", "c_ts")
      .select(col("event_id"), col("click_id"),
        (unix_micros(col("ts")) - unix_micros(col("c_ts"))).as("wait_us"))
    val composed = graft.operators.AsOfJoin
      .leftAsOf(purchases,
        clicks.select(col("c_user").as("user_id"), col("c_ts").as("ts"),
          col("click_id")),
        "user_id", "ts", carryCols = Seq("click_id", "ts"), tieBreakCol = "click_id")
      .select(col("event_id"), col("asof_click_id").as("click_id"),
        (unix_micros(col("ts")) - unix_micros(col("asof_ts"))).as("wait_us"))
    assert(native.exceptAll(composed).count() === 0)
    assert(composed.exceptAll(native).count() === 0)
  }
}
