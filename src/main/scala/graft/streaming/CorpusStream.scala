package graft.streaming

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.OutputMode

import graft.Tables
import graft.functions.TextAnalysis

/** Streaming ingest of the DOCUMENT corpus: the landing zone consumed as
  * a file stream, quality/repetition filters applied scan-side per
  * micro-batch, and exact content dedup across batches — the streaming
  * form of the batch curation pass, for pipelines that ingest crawl
  * drops incrementally instead of re-scanning the corpus per run.
  *
  * The filters are pure per-row expressions (zero state); the dedup
  * holds one entry per distinct content hash — bounded by the corpus's
  * distinct-content count, the right trade for an ingest feed where a
  * re-delivered file must not re-emit its documents. (A time-bounded
  * variant would watermark an ingest timestamp; the synthetic corpus has
  * none.)
  */
object CorpusStream {

  def readDocumentStream(spark: SparkSession, sfDir: String): DataFrame = {
    val schema = spark.read.parquet(Tables.path(sfDir, "documents")).schema
    spark.readStream
      .schema(schema)
      .option("pathGlobFilter", "documents.parquet")
      .parquet(sfDir)
  }

  /** The scan-side keep rules: length floor + Gopher repetition caps. */
  def qualityFilter(docs: DataFrame): DataFrame = docs
    .filter(
      col("n_chars") >= 50 &&
        TextAnalysis.topTokenShare(col("text")) < 0.3 &&
        TextAnalysis.dupBigramFraction(col("text")) < 0.2)

  /** Filter + content-dedup run to completion (AvailableNow), emitting the
    * surviving documents' scalars — batch-oracle-verifiable.
    */
  def filteredAvailableNow(
      spark: SparkSession,
      sfDir: String,
      statePartitions: Int = EventStreams.defaultStatePartitions): DataFrame = {
    val s = EventStreams.streamSession(spark, statePartitions)
    EventStreams.runToTable(
      s,
      qualityFilter(readDocumentStream(s, sfDir))
        .withColumn("__h", md5(col("text")))
        .dropDuplicates("__h")
        .select("doc_id", "lang", "n_chars"),
      s"stream_corpus_filter_${System.nanoTime()}",
      OutputMode.Append())
      .orderBy("doc_id")
  }
}
