package graft.streaming

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.OutputMode

import graft.Tables
import graft.operators.KMeans

/** Streaming vector scoring: route an unbounded embedding stream onto a
  * BATCH-FITTED model carried as plan literals — the online half of the
  * cluster-based curation loop (fit clusters offline on the corpus,
  * assign arrivals online to shards/tiers). STATELESS by construction:
  * the model is k×dim literals inside a scan-side expression (the DSIR
  * ratio-map discipline, `CorpusStream`), so there is no state store, no
  * watermark, and per-record cost is O(k·dim) codegen arithmetic.
  */
object VectorStream {

  /** Scan-side argmin-cluster expression against a literal centroid set.
    * Noise/tie handling matches [[KMeans.assign]] exactly: the fold
    * keeps the incumbent unless a STRICTLY smaller round(d, 6) appears,
    * so equidistant candidates resolve to the smaller cluster index and
    * online assignments agree with the batch clustering bit-for-bit.
    * Returns a struct `(c, d)`.
    */
  def assignExpr(vecCol: Column, centroids: Seq[(Int, Seq[Double])]): Column = {
    require(centroids.nonEmpty, "need at least one centroid")
    val cand = array(centroids.sortBy(_._1).map { case (c, vec) =>
      struct(
        lit(c).as("c"),
        aggregate(
          zip_with(vecCol, array(vec.map(lit): _*), (a, b) => (a - b) * (a - b)),
          lit(0.0), (acc, x) => acc + x).as("d"))
    }: _*)
    aggregate(
      slice(cand, 2, centroids.size - 1),
      element_at(cand, 1),
      (acc, x) =>
        when(round(x.getField("d"), 6) < round(acc.getField("d"), 6), x).otherwise(acc))
  }

  /** q_v14's streaming twin, run to completion: fit the deterministic
    * k-means model on the batch corpus, then assign the embedding STREAM
    * against the shipped centroids. The k-row `collect` is the bounded
    * model artifact (k×dim literals), not driver-side data flow.
    */
  def kmeansScoredAvailableNow(
      spark: SparkSession,
      sfDir: String,
      k: Int = 8,
      iterations: Int = 2,
      statePartitions: Int = EventStreams.defaultStatePartitions): DataFrame = {
    val centroids = KMeans
      .centroidsUsed(
        Tables.load(spark, sfDir, "embeddings"), "vec_id", "embedding", k, iterations)
      .collect()
      .map(r => r.getInt(0) -> r.getSeq[Double](1).toSeq)
      .toSeq
    val s = EventStreams.streamSession(spark, statePartitions)
    val scored = Tables.readStream(s, sfDir, "embeddings")
      .select(
        col("vec_id"),
        assignExpr(
          transform(col("embedding"), x => x.cast("double")), centroids).as("__b"))
      .select(
        col("vec_id"),
        col("__b.c").cast("int").as("cluster"),
        col("__b.d").as("dist2"))
    EventStreams.runToTable(
      s, scored, s"stream_kmeans_score_${System.nanoTime()}", OutputMode.Append())
      .orderBy("vec_id")
  }
}
