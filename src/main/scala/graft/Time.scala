package graft

import org.apache.spark.sql.SparkSession

/** Single-query timing main for perf iteration:
  * `runMain graft.Time <sfDir> <queryName>... [reps]` — runs each named
  * registered query `reps` times (default 3) through the noop sink (via
  * [[Bench.runOne]]) and prints per-rep seconds. A warm-up runs first so
  * rep 1 isn't paying fresh-JVM codegen costs that [[Bench]] also
  * excludes. Unknown query names fail fast with the available set.
  *
  * Only the LAST argument is eligible to be the rep count (and only when
  * it is a non-empty all-digit token) — an all-digit token anywhere else
  * is treated as a query name and fails fast, rather than being silently
  * dropped.
  */
object Time {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val rest = args.drop(1)
    val (names0, reps) = rest.lastOption match {
      case Some(last) if last.nonEmpty && last.forall(_.isDigit) =>
        (rest.dropRight(1).toSeq, last.toInt)
      case _ => (rest.toSeq, 3)
    }
    val names = if (names0.nonEmpty) names0 else Seq("q1_agg")
    names.filterNot(SparkEntry.queries.contains) match {
      case Seq() => ()
      case bad => sys.error(
        s"unknown queries: ${bad.mkString(", ")}; known: ${SparkEntry.queries.keys.toSeq.sorted.mkString(", ")}")
    }
    val spark: SparkSession = GraftSession.local("graft-time")
    Bench.warmup(spark, sfDir)
    names.foreach { name =>
      (1 to reps).foreach { i =>
        val sec = Bench.runOne(spark, sfDir, SparkEntry.queries(name))
        println(f"[time] $name rep$i $sec%8.2f s")
      }
    }
    spark.stop()
  }
}
