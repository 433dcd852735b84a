package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Overlapping-window document chunking — the RAG/retrieval-ingest
  * staple: split each document into `size`-char windows every `stride`
  * chars (overlap = size − stride), keeping provenance (doc id + chunk
  * index) so chunks can be traced back.
  *
  * Pure scan-side codegen (`sequence` → `explode` → `substr`): no
  * shuffle, no UDF, parallelism = input splits. Output grows by
  * ~size/stride×, which at 100 TB argues for chunking AFTER filtering/
  * dedup, not before — compose it downstream of the quality gates.
  *
  * Char-window chunking is deliberately tokenizer-agnostic; token-budget
  * packing of the resulting chunks is the separate, gated
  * [[Curation.packSequences]] pass.
  */
object Chunking {

  /** Output: idCol, chunk_idx (0-based), chunk. Empty/null text yields a
    * single empty chunk (chunk 0) so every document keeps provenance.
    */
  def chunkWithOverlap(
      df: DataFrame,
      idCol: String,
      textCol: String,
      size: Int,
      stride: Int): DataFrame = {
    require(size > 0 && stride > 0 && stride <= size,
      "need 0 < stride <= size (windows must cover the text)")
    df.select(
        col(idCol),
        explode(
          sequence(lit(1), greatest(length(coalesce(col(textCol), lit(""))), lit(1)),
            lit(stride))).as("start"),
        col(textCol))
      .select(
        col(idCol),
        expr(s"CAST((start - 1) div $stride AS INT)").as("chunk_idx"),
        expr(s"substr(coalesce($textCol, ''), start, $size)").as("chunk"))
  }
}
