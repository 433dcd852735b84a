package graft.operators

import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.{SparkSpec, Tables}

class AsOfJoinSpec extends SparkSpec {
  import spark.implicits._

  test("known answers: latest prior right row, <= ties match, no-match → null") {
    val left = Seq((1L, 10L, "p1"), (2L, 20L, "p2"), (3L, 5L, "p0"))
      .toDF("id", "t", "tag")
      .withColumn("t", timestamp_micros(col("t")))
      .withColumn("k", lit("u"))
    val right = Seq((100L, 10L, 7.0), (101L, 12L, 8.0), (102L, 19L, 9.0))
      .toDF("rid", "t", "v")
      .withColumn("t", timestamp_micros(col("t")))
      .withColumn("k", lit("u"))
    val out = AsOfJoin.leftAsOf(left, right, "k", "t", Seq("rid", "v"), "rid")
      .select("id", "asof_rid", "asof_v").orderBy("id")
      .collect().map(r => (r.getLong(0), Option(r.get(1)), Option(r.get(2))))
    assert(out.toSeq === Seq(
      (1L, Some(100L), Some(7.0)),  // rid 100 at t=10 matches left t=10 (<=)
      (2L, Some(102L), Some(9.0)),  // latest of the three priors
      (3L, None, None)))            // nothing at or before t=5
  }

  test("equal-timestamp right rows break ties on tieBreakCol (largest wins)") {
    val left = Seq((1L, 10L)).toDF("id", "t")
      .withColumn("t", timestamp_micros(col("t"))).withColumn("k", lit("u"))
    val right = Seq((100L, 10L), (101L, 10L), (99L, 10L)).toDF("rid", "t")
      .withColumn("t", timestamp_micros(col("t"))).withColumn("k", lit("u"))
    val out = AsOfJoin.leftAsOf(left, right, "k", "t", Seq("rid"), "rid")
      .select("asof_rid").collect().head.getLong(0)
    assert(out === 101L)
  }

  test("equals the naive ranked-candidate formulation on real events") {
    val ev = Tables.load(spark, sf(), "events")
    val p = ev.filter($"event_type" === "purchase").select("event_id", "user_id", "ts")
    val c = ev.filter($"event_type" === "click")
      .select($"user_id".as("cu"), $"ts".as("cts"), $"event_id".as("cid"))
    val got = AsOfJoin.leftAsOf(p, c.select($"cu".as("user_id"), $"cts".as("ts"), $"cid"),
        "user_id", "ts", Seq("cid", "ts"), "cid")
      .select($"event_id", $"asof_cid")
      .collect().map(r => (r.getLong(0), Option(r.get(1)))).toMap
    // naive: all candidate pairs, rank by (cts desc, cid desc), keep #1
    val naive = p.join(c, $"user_id" === $"cu" && $"cts" <= $"ts", "left")
      .withColumn("__rn", row_number().over(
        Window.partitionBy($"event_id").orderBy($"cts".desc_nulls_last, $"cid".desc_nulls_last)))
      .filter($"__rn" === 1)
      .select($"event_id", $"cid")
      .collect().map(r => (r.getLong(0), Option(r.get(1)))).toMap
    assert(got === naive)
    assert(got.values.exists(_.isEmpty), "testdata should include unmatched purchases")
    assert(got.values.exists(_.nonEmpty))
  }

  test("plan: one shuffle on the key, no join operator at all") {
    val ev = Tables.load(spark, sf(), "events")
    val p = ev.filter($"event_type" === "purchase").select("event_id", "user_id", "ts")
    val c = ev.filter($"event_type" === "click").select("user_id", "ts", "event_id")
    val plan = AsOfJoin.leftAsOf(p, c, "user_id", "ts", Seq("event_id"), "event_id")
      .queryExecution.executedPlan.toString
    assert(!plan.contains("Join"), s"as-of must compose via union+window, not a join:\n$plan")
  }
}
