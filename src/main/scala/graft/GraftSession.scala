package graft

import org.apache.spark.sql.SparkSession

/** Session factory with the engine's tuned defaults.
  *
  * Local-mode testing uses `local[N]`, but every knob here is chosen for the
  * 1000-executor / 100 TB target: AQE on (runtime re-plan, skew-join
  * splitting, partition coalescing), broadcast threshold generous enough that
  * dimension tables (region/nation/descriptor lookups — see SURVEY.md §2.3 J3)
  * never shuffle, UTC session time for oracle parity.
  */
object GraftSession {

  /** Number of local cores; the driver exports SPARK_GRAFT_CPUS. */
  def cpus: String = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")

  def builder(appName: String = "graft"): SparkSession.Builder = {
    val b = SparkSession
      .builder()
      .appName(appName)
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
      .config("spark.sql.adaptive.skewJoin.enabled", "true")
      .config("spark.sql.autoBroadcastJoinThreshold", (64L * 1024 * 1024).toString)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
    // Deployment-tuning knobs, env-gated so the driver's bench runs the
    // defaults unchanged (the r18 A/B harness for guide §2.3/§3.1 —
    // numbers in OPTIMIZATION_r18.md; production values justified there):
    //  SPARK_GRAFT_SHUFFLE_CODEC  spark.io.compression.codec (default lz4)
    //  SPARK_GRAFT_PREFER_SMJ     spark.sql.join.preferSortMergeJoin
    sys.env.get("SPARK_GRAFT_SHUFFLE_CODEC")
      .foreach(c => b.config("spark.io.compression.codec", c))
    sys.env.get("SPARK_GRAFT_PREFER_SMJ")
      .foreach(v => b.config("spark.sql.join.preferSortMergeJoin", v))
    b
  }

  /** Local session for tests / benchmarks. */
  def local(appName: String = "graft"): SparkSession = {
    val spark = builder(appName).master(s"local[$cpus]").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    spark
  }
}
