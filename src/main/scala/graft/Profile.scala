package graft

import org.apache.spark.scheduler.{SparkListener, SparkListenerJobEnd, SparkListenerJobStart, SparkListenerStageCompleted}
import org.apache.spark.sql.SparkSession

/** Per-job decomposition of one registered query (dev tool for the
  * optimization rounds): attaches a SparkListener, runs the query warm
  * through the noop sink (same methodology as [[Bench]]/[[Time]]), and
  * prints every Spark job's wall time, stage count, task count, and the
  * callsite/description — so an N-second bench row can be split into its
  * constituent jobs without the (disabled) UI. Usage:
  * `runMain graft.Profile <sfDir> <queryName> [reps]`.
  */
object Profile {

  final case class JobRow(
      jobId: Int,
      var name: String,
      var startMs: Long,
      var endMs: Long,
      var nStages: Int,
      var nTasks: Int)

  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val names = (if (args.length > 1) args(1) else "q1_agg").split(",").toSeq
    val reps = if (args.length > 2) args(2).toInt else 1
    val spark: SparkSession = GraftSession.local("graft-profile")
    Bench.warmup(spark, sfDir)
    names.foreach(n => profileOne(spark, sfDir, n, reps))
    spark.stop()
  }

  def profileOne(spark: SparkSession, sfDir: String, name: String, reps: Int): Unit = {
    val fn = SparkEntry.queries.getOrElse(
      name, sys.error(s"unknown query $name"))
    println(s"\n[profile] ======== $name ========")
    // one untimed pass so the profiled pass is warm (JIT + page cache)
    try { Bench.runOne(spark, sfDir, fn); () } catch { case _: Throwable => () }

    val jobs = new java.util.concurrent.ConcurrentHashMap[Int, JobRow]()
    val stageTasks = new java.util.concurrent.ConcurrentHashMap[Int, Int]()
    val listener = new SparkListener {
      override def onJobStart(js: SparkListenerJobStart): Unit = {
        val desc = Option(js.properties)
          .flatMap(p => Option(p.getProperty("spark.job.description")))
          .orElse(Option(js.properties)
            .flatMap(p => Option(p.getProperty("callSite.short"))))
          .getOrElse("")
        jobs.put(js.jobId,
          JobRow(js.jobId, desc, js.time, js.time, js.stageIds.size, 0))
      }
      override def onStageCompleted(sc: SparkListenerStageCompleted): Unit = {
        val si = sc.stageInfo
        stageTasks.put(si.stageId, si.numTasks)
        val ms = (for {a <- si.completionTime; b <- si.submissionTime} yield a - b)
          .getOrElse(-1L)
        if (ms >= 400)
          println(f"[profile]   stage ${si.stageId}%4d ${ms / 1e3}%7.3f s tasks=${si.numTasks}%4d  ${si.name.take(90)}")
        ()
      }
      override def onJobEnd(je: SparkListenerJobEnd): Unit = {
        Option(jobs.get(je.jobId)).foreach(_.endMs = je.time)
      }
    }
    spark.sparkContext.addSparkListener(listener)
    (1 to reps).foreach { i =>
      val t0 = System.nanoTime()
      fn(spark, sfDir).write.format("noop").mode("overwrite").save()
      println(f"[profile] $name rep$i total ${(System.nanoTime() - t0) / 1e9}%8.3f s")
    }
    // let the listener bus drain before reading
    Thread.sleep(500)
    spark.sparkContext.removeSparkListener(listener)
    import scala.jdk.CollectionConverters._
    val rows = jobs.values.asScala.toSeq.sortBy(_.jobId)
    val totalMs = rows.map(r => r.endMs - r.startMs).sum
    println(f"[profile] ${rows.size} jobs, sum of job wall times ${totalMs / 1e3}%8.3f s (reps=$reps)")
    rows.foreach { r =>
      println(f"[profile] job ${r.jobId}%4d ${(r.endMs - r.startMs) / 1e3}%8.3f s  stages=${r.nStages}%3d  ${r.name.take(110)}")
    }
    val taskHisto = stageTasks.values.asScala.groupBy(identity)
      .map { case (k, v) => (k, v.size) }.toSeq.sortBy(_._1)
    println(s"[profile] stage task-count histogram (tasks -> #stages): " +
      taskHisto.map { case (t, n) => s"$t->$n" }.mkString(", "))
  }
}
