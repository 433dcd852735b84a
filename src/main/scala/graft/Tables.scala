package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions.expr
import org.apache.spark.sql.types.LongType

/** Catalog over the harness parquet tables (TESTDATA.md).
  *
  * One parquet file per table under `sfDir`. Reads are plain
  * `spark.read.parquet` so Catalyst's pushdown/pruning reach the scan —
  * every query should show `PushedFilters`/pruned `ReadSchema` in explain.
  */
object Tables {

  val tpch: Seq[String] =
    Seq("region", "nation", "customer", "supplier", "part", "orders", "lineitem")

  val extra: Seq[String] = Seq("events", "documents", "embeddings")

  val all: Seq[String] = tpch ++ extra

  def path(sfDir: String, name: String): String = s"$sfDir/$name.parquet"

  def load(spark: SparkSession, sfDir: String, name: String): DataFrame =
    if (name == "events") {
      // events.ts is parquet TIMESTAMP(NANOS) which Spark's vectorized
      // reader rejects; read the raw int64 nanos and convert losslessly to
      // a microsecond TimestampType (integer `div`, not double division —
      // nanos since epoch exceed double's 53-bit mantissa).
      spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
      val raw = spark.read.parquet(path(sfDir, name))
      if (raw.schema("ts").dataType == LongType)
        raw.withColumn("ts", expr("timestamp_micros(ts div 1000)"))
      else raw
    } else spark.read.parquet(path(sfDir, name))

  /** The same table as a file STREAM (micro-batch source): schema taken
    * from a batch read, `pathGlobFilter` isolating the table's file in
    * the shared sf directory. Events' nanosecond timestamps are not
    * supported here — stream the other tables, or pre-convert.
    */
  def readStream(spark: SparkSession, sfDir: String, name: String): DataFrame = {
    require(name != "events", "events.ts is TIMESTAMP(NANOS); stream a converted copy instead")
    val schema = spark.read.parquet(path(sfDir, name)).schema
    spark.readStream
      .schema(schema)
      .option("pathGlobFilter", s"$name.parquet")
      .parquet(sfDir)
  }

  /** Register every table as a temp view so `spark.sql` text matches the
    * DuckDB oracle's table names exactly.
    */
  def registerAll(spark: SparkSession, sfDir: String): Unit =
    all.foreach(n => load(spark, sfDir, n).createOrReplaceTempView(n))

  /** Ensure at least the cluster's default parallelism before heavy per-row
    * compute (signature passes, per-doc hashing). A small corpus arriving
    * as one parquet row group is ONE input split — without this, a 32-core
    * machine runs the whole MinHash/SimHash pass on a single task. No-op
    * when the input already has enough files (the 100 TB case: thousands),
    * so no shuffle is added at scale.
    *
    * The gate reads `inputFiles` (a listing, no job) rather than
    * `rdd.getNumPartitions` — under AQE the latter materializes every
    * upstream shuffle stage just to learn a partition count. File count
    * under-estimates splits for multi-row-group files (large files split
    * further by maxPartitionBytes), erring toward a harmless repartition
    * of inputs that are small anyway; non-file plans (in-memory test
    * frames, post-join frames) report zero files and are spread too.
    */
  def spread(df: DataFrame): DataFrame = {
    val target = df.sparkSession.sparkContext.defaultParallelism
    if (df.inputFiles.length >= target) df else df.repartition(target)
  }
}
