package graft

import org.apache.spark.sql.functions._

/** `Tables.spread` gating (r18): the repartition must fire only when the
  * frame's parallelism is actually below the cluster default — and the
  * decision must be readable from the plan without running a job.
  */
class TablesSpreadSpec extends SparkSpec {

  private def hasExchange(df: org.apache.spark.sql.DataFrame): Boolean =
    df.queryExecution.optimizedPlan.collect {
      case r: org.apache.spark.sql.catalyst.plans.logical.Repartition => r
      case r: org.apache.spark.sql.catalyst.plans.logical.RepartitionByExpression => r
    }.nonEmpty

  test("one-split file scan is spread") {
    val docs = Tables.load(spark, sf(), "documents")
    assert(docs.inputFiles.length < spark.sparkContext.defaultParallelism)
    assert(hasExchange(Tables.spread(docs)))
  }

  test("already-wide checkpointed frame is NOT re-spread") {
    val target = spark.sparkContext.defaultParallelism
    val wide = spark.range(0, 1000, 1, target * 2).toDF("id")
      .localCheckpoint(true)
    assert(wide.inputFiles.isEmpty) // the non-file case under test
    assert(!hasExchange(Tables.spread(wide)))
    // derived plans over the wide leaf still skip the exchange
    assert(!hasExchange(Tables.spread(wide.select(col("id") * 2))))
    org.apache.spark.sql.graft.bridge.freeLocalCheckpoint(wide)
  }

  test("narrow checkpointed frame IS spread") {
    val narrow = spark.range(0, 100, 1, 1).toDF("id").localCheckpoint(true)
    assert(narrow.inputFiles.isEmpty)
    assert(hasExchange(Tables.spread(narrow)))
    org.apache.spark.sql.graft.bridge.freeLocalCheckpoint(narrow)
  }

  test("local relation (no RDD leaf) still spreads") {
    import spark.implicits._
    val local = Seq(1L, 2L, 3L).toDF("id")
    assert(hasExchange(Tables.spread(local)))
  }
}
