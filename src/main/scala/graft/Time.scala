package graft

import org.apache.spark.sql.SparkSession

/** Single-query timing main for perf iteration:
  * `runMain graft.Time <sfDir> <queryName> [reps]` — runs the named
  * registered query `reps` times (default 3) through the noop sink and
  * prints per-rep seconds. Warm-up (q1_agg) runs first so rep 1 isn't
  * paying fresh-JVM codegen costs that [[Bench]] also excludes.
  */
object Time {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val names = if (args.length > 1) args.drop(1).filterNot(_.forall(_.isDigit)).toSeq
                else Seq("q1_agg")
    val reps = args.drop(1).find(_.forall(_.isDigit)).map(_.toInt).getOrElse(3)
    val spark: SparkSession = GraftSession.local("graft-time")

    def runOne(fn: (SparkSession, String) => org.apache.spark.sql.DataFrame): Double = {
      val t0 = System.nanoTime()
      fn(spark, sfDir).write.format("noop").mode("overwrite").save()
      (System.nanoTime() - t0) / 1e9
    }

    try runOne(SparkEntry.queries("q1_agg")) catch { case _: Throwable => }
    names.foreach { name =>
      (1 to reps).foreach { i =>
        val sec = runOne(SparkEntry.queries(name))
        println(f"[time] $name rep$i $sec%8.2f s")
      }
    }
    spark.stop()
  }
}
