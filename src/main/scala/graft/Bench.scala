package graft

import org.apache.spark.sql.SparkSession

/** Benchmark main: every registered query executed END TO END — results go
  * through the noop sink so sorts/projections/sinks are fully evaluated
  * (a bare `count()` lets the optimizer drop ordering and prune the very
  * columns being benchmarked). One JSON line on stdout for the driver.
  */
object Bench {

  /** End-to-end timing of one registered query through the noop sink
    * (shared with [[Time]]).
    */
  def runOne(
      spark: SparkSession,
      sfDir: String,
      fn: (SparkSession, String) => org.apache.spark.sql.DataFrame): Double = {
    val t0 = System.nanoTime()
    fn(spark, sfDir).write.format("noop").mode("overwrite").save()
    (System.nanoTime() - t0) / 1e9
  }

  /** JIT/codegen warmup outside the measurement (first query in a fresh
    * JVM otherwise pays ~5 s of compiler time that isn't the query's).
    */
  def warmup(spark: SparkSession, sfDir: String): Unit =
    try { runOne(spark, sfDir, SparkEntry.queries("q1_agg")); () }
    catch { case _: Throwable => () }

  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val benchOut = sys.env.getOrElse("SPARK_GRAFT_BENCH_OUT", "BENCH_FULL.json")
    // per-query references from the previously COMMITTED quiet sweep —
    // read before this run overwrites the file; powers the second-pass
    // retry below. json4s ships with Spark.
    // a contended prior sweep is NOT a usable retry reference (its rows
    // are noise — comparing against them would retry everything or
    // nothing at random), so the retry pass disarms (the r15 ADVICE
    // self-consistency fix)
    val priorQuietRef: Map[String, Double] = try {
      import org.json4s._
      val parsed = org.json4s.jackson.JsonMethods.parse(new String(
        java.nio.file.Files.readAllBytes(java.nio.file.Paths.get(benchOut)),
        java.nio.charset.StandardCharsets.UTF_8))
      val priorContended = parsed \ "contended" match {
        case JBool(b) => b
        case _ => false
      }
      if (priorContended) Map.empty[String, Double]
      else parsed \ "queries" match {
        case JObject(fields) => fields.collect {
          case (k, JDouble(v)) => k -> v
          case (k, JInt(v)) => k -> v.toDouble
          case (k, JDecimal(v)) => k -> v.toDouble
        }.toMap
        case _ => Map.empty[String, Double]
      }
    } catch { case _: Throwable => Map.empty }
    val spark: SparkSession = GraftSession.local("graft-bench")
    def runOne(fn: (SparkSession, String) => org.apache.spark.sql.DataFrame): Double =
      Bench.runOne(spark, sfDir, fn)

    warmup(spark, sfDir)

    // Per-query time is best-of-2 back-to-back runs: a single cold pass in
    // alphabetical order charges end-of-alphabet families for accumulated
    // JIT/GC/page-cache churn from everything before them (r7 showed 2-12x
    // order-contamination on q_v*; isolated reruns matched the 2nd pass).
    // `total` stays the sum of FIRST-pass times so the driver's headline
    // remains one full cold sweep, comparable with earlier rounds.
    // CONTENTION-PROOFING (the r11 phantom-regression lesson: q_d12 read
    // 6.98 s in the 280-query sweep vs 2.5 s warm-isolated): BOTH
    // back-to-back reps inflate when earlier queries leave block-manager
    // residue, so between queries every leaked persisted RDD (a returned
    // plan pinning a localCheckpoint the query could not free) and cached
    // relation is dropped — each registered query is self-contained by
    // contract, so cross-query persisted state is by definition a leak.
    // A failing query records -1.0 AND its exception message in the
    // artifact's "errors" map — a -1.0 row must be diagnosable from the
    // JSON alone, without hunting driver stderr.
    def dropLeakedState(): Unit = try {
      spark.sharedState.cacheManager.clearCache()
      // blocking: an async unpersist would execute DURING the next
      // query's measured window — the cleanup must finish here
      spark.sparkContext.getPersistentRDDs.valuesIterator
        .foreach(_.unpersist(blocking = true))
    } catch { case _: Throwable => () }
    val errors = scala.collection.mutable.LinkedHashMap.empty[String, String]
    val results = SparkEntry.queries.toSeq.sortBy(_._1).map { case (name, fn) =>
      def once(): Double = try runOne(fn) catch {
        case e: Throwable =>
          val msg = s"${e.getClass.getSimpleName}: ${Option(e.getMessage).getOrElse("").take(300)}"
          System.err.println(s"[bench] $name failed: $msg")
          errors(name) = msg
          -1.0
      }
      dropLeakedState()
      val cold = once()
      dropLeakedState()
      val best = if (cold < 0) cold else math.min(cold, once())
      System.err.println(f"[bench] $name%-28s cold $cold%8.2f s  best $best%8.2f s")
      (name, cold, best)
    }
    def jstr(s: String): String =
      "\"" + s.flatMap {
        case '"' => "\\\""
        case '\\' => "\\\\"
        case c if c < ' ' => f"\\u${c.toInt}%04x"
        case c => c.toString
      } + "\""
    val errs = errors.map { case (k, v) => jstr(k) + ":" + jstr(v) }.mkString("{", ",", "}")
    val total = results.collect { case (_, c, _) if c >= 0 => c }.sum
    // CONTAMINATION SENTINEL (the r13 lesson: the whole sweep ran on a
    // busy box and read 2.2x inflated with nonsense outliers on unchanged
    // code — an unusable artifact that blinded the round's perf signal).
    // Three cheap, stable canaries re-time warm at sweep END; if any
    // exceeds 2x its committed quiet-box warm reference, the artifact
    // self-reports "contended": true so a reader never mistakes machine
    // load for a regression. References are quiet-box warm (PERF.md
    // protocol: best-of-2, isolated), deliberately generous.
    val canaryRef = Seq(
      "q1_agg" -> 1.2,
      "q_j1_inner_join" -> 0.6,
      "q_t1_token_stats" -> 0.8)
    val canaries = canaryRef.map { case (name, ref) =>
      val best = try {
        dropLeakedState()
        val a = runOne(SparkEntry.queries(name))
        dropLeakedState()
        math.min(a, runOne(SparkEntry.queries(name)))
      } catch { case _: Throwable => -1.0 }
      System.err.println(f"[bench] canary $name%-24s warm $best%6.2f s (ref $ref)")
      (name, best, ref)
    }
    val contended = canaries.exists { case (_, b, ref) => b < 0 || b > 2 * ref }
    val canaryJson = canaries.map { case (n, b, _) => jstr(n) + ":" + b }
      .mkString("{", ",", "}")
    // SECOND-PASS RETRY (the r14 procedural finding: the driver's sweep
    // ran contended AGAIN — the sentinel detected it, but the artifact's
    // numbers were still noise). After the sentinel, every row that
    // exceeded 2x its reference from the COMMITTED quiet-box sweep
    // (the previous BENCH_FULL.json, read before this run overwrites it)
    // re-times best-of-2 and the better number splices in, so even a
    // busy-box sweep converges toward warm truth instead of recording
    // transient contention as regression. `total` stays the first-pass
    // cold sum — the headline remains one full sweep.
    val retried = scala.collection.mutable.LinkedHashMap.empty[String, Double]
    val spliced = results.map { case (name, cold, best) =>
      priorQuietRef.get(name) match {
        case Some(ref) if best >= 0 && ref > 0 && best > 2 * ref =>
          val again = try {
            dropLeakedState()
            val a = runOne(SparkEntry.queries(name))
            dropLeakedState()
            math.min(a, runOne(SparkEntry.queries(name)))
          } catch { case _: Throwable => best }
          val b2 = if (again >= 0) math.min(best, again) else best
          System.err.println(
            f"[bench] retry $name%-28s was $best%8.2f s (ref $ref%6.2f) -> $b2%8.2f s")
          if (b2 < best) retried(name) = b2
          (name, cold, b2)
        case _ => (name, cold, best)
      }
    }
    val qsFinal = spliced.map { case (k, _, b) => jstr(k) + ":" + b }
      .mkString("{", ",", "}")
    val retriedJson = retried.map { case (k, v) => jstr(k) + ":" + v }
      .mkString("{", ",", "}")
    // the UNSPLICED best-of-2 map rides along so the artifact is
    // self-consistent: "first_pass" rows sum with the cold pass that
    // produced "value"; "queries" is the retry-corrected view
    val firstPassJson = results.map { case (k, _, b) => jstr(k) + ":" + b }
      .mkString("{", ",", "}")
    val json =
      s"""{"metric":"total","value":$total,"unit":"sec","queries":$qsFinal,"errors":$errs,""" +
        s""""canaries":$canaryJson,"contended":$contended,"retried":$retriedJson,""" +
        s""""first_pass":$firstPassJson,""" +
        s""""sf":"$sfDir"}"""
    println(json)
    // The driver captures stdout with a bounded tail, which has truncated
    // the per-query map in past rounds — persist the complete artifact too.
    try {
      java.nio.file.Files.write(
        java.nio.file.Paths.get(benchOut),
        (json + "\n").getBytes(java.nio.charset.StandardCharsets.UTF_8))
    } catch {
      case e: Exception => System.err.println(s"[bench] full-JSON write failed: $e")
    }
    spark.stop()
  }
}
