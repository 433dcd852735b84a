package graft.operators

import org.apache.spark.sql.functions._

import graft.SparkSpec

class BloomJoinSpec extends SparkSpec {
  import spark.implicits._

  private lazy val fact = (1L to 5000L).map(i => (i % 500, i)).toDF("k", "row_id")
  private lazy val dim = (0L to 499L by 10).map(k => (k, s"d$k")).toDF("dk", "payload")

  test("pruned join result equals the plain join exactly") {
    val plain = fact.join(dim, fact("k") === dim("dk"))
      .select("row_id", "payload")
      .collect().map(r => (r.getLong(0), r.getString(1))).toSet
    val pruned = BloomJoin.prunedEquiJoin(fact, dim, "k", "dk")
      .select("row_id", "payload")
      .collect().map(r => (r.getLong(0), r.getString(1))).toSet
    assert(pruned === plain)
    assert(plain.nonEmpty)
  }

  test("the Bloom probe prunes most non-matching fact rows before the join") {
    // 50 of 500 distinct keys match → ≥80% of fact rows should die at the
    // probe even with fpp slack
    val bf = dim.stat.bloomFilter("dk", 50, 0.01)
    val kept = fact.filter(org.apache.spark.sql.graft.bridge.column(
      graft.expressions.BloomMightContainLong(
        org.apache.spark.sql.graft.bridge.expression(col("k")), bf))).count()
    assert(kept < 1200, s"expected ~500 of 5000 rows to survive the probe, got $kept")
    assert(kept >= 500, "false negatives are impossible — every match must survive")
  }

  test("null fact keys are dropped by the probe, matching inner-join semantics") {
    val withNulls = fact.union(Seq((java.lang.Long.valueOf(-1L), 99999L)).toDF("k", "row_id")
      .withColumn("k", when(col("row_id") === 99999L, lit(null)).otherwise(col("k"))))
    val plain = withNulls.join(dim, withNulls("k") === dim("dk")).count()
    val pruned = BloomJoin.prunedEquiJoin(withNulls, dim, "k", "dk").count()
    assert(pruned === plain)
  }

  test("explicit sizing evaluates the dim source exactly once (no count pass over dim)") {
    // Job counts are not the invariant — AQE may legitimately run an
    // aggregate as several jobs over one evaluation. What the operator
    // promises with explicit sizing is ONE eager action (the sketch
    // build): no `count()` sizing pass, and a lazy join.
    val bridge = org.apache.spark.sql.graft.bridge
    val actions = new java.util.concurrent.CopyOnWriteArrayList[String]()
    val listener = new org.apache.spark.sql.util.QueryExecutionListener {
      override def onSuccess(
          funcName: String,
          qe: org.apache.spark.sql.execution.QueryExecution,
          durationNs: Long): Unit = { actions.add(funcName); () }
      override def onFailure(
          funcName: String,
          qe: org.apache.spark.sql.execution.QueryExecution,
          exception: Exception): Unit = { actions.add(s"FAILED:$funcName"); () }
    }
    bridge.waitUntilListenerBusEmpty(spark) // drain earlier tests' events
    spark.listenerManager.register(listener)
    try {
      BloomJoin.prunedEquiJoin(fact, dim, "k", "dk", expectedDimKeys = 50L)
      bridge.waitUntilListenerBusEmpty(spark)
      assert(actions.size === 1,
        s"expected the sketch build to be the only eager action, saw $actions")
    } finally spark.listenerManager.unregister(listener)
  }

  test("probe sits in the fact-side scan stage before the join") {
    // file-backed fact side: over a LocalRelation the optimizer folds the
    // probe away at plan time (ConvertToLocalRelation), hiding it
    val lineitem = graft.Tables.load(spark, sf(), "lineitem")
    val urgent = graft.Tables.load(spark, sf(), "orders")
      .filter(col("o_orderpriority") === "1-URGENT").select("o_orderkey")
    val planStr = BloomJoin
      .prunedEquiJoin(lineitem, urgent, "l_orderkey", "o_orderkey")
      .queryExecution.executedPlan.toString
    assert(planStr.contains("bloom_might_contain_long"),
      s"expected the Bloom probe in the physical plan:\n$planStr")
  }
}
