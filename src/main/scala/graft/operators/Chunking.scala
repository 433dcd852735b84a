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

  /** CONTENT-DEFINED chunking (the Rabin/LBFS scheme, Muthitacharoen et
    * al. SOSP 2001 §3.1; the storage-dedup workhorse behind rsync/
    * restic/casync): a chunk boundary falls after position p whenever
    * the hash of the `window`-char run ending at p is ≡ 0 (mod
    * `modulus`) — a rule that depends only on LOCAL content, so inserting
    * or deleting a prefix SHIFTS chunk offsets but leaves every interior
    * chunk identity intact. Fixed-size chunking loses all alignment on a
    * one-byte insert; CDC is how shifted duplicates stay deduplicable.
    *
    * Boundary hash is the portable md5-60 ([[graft.functions.Hashing
    * .md5Hash60]]), so any engine replays the exact boundary set (the
    * q_d19 oracle does). Chunks longer than `maxLen` split at fixed
    * offsets RELATIVE TO THE CHUNK START — still closed-form from the
    * boundary set, so the cap never breaks replayability. Expected chunk
    * length ≈ `modulus` chars (tune modulus, not code).
    *
    * Output: `(idCol, chunk_idx, start, len, chunk_hash)` — 1-based
    * start, md5-60 identity; the chunk TEXT is deliberately not shipped
    * (hash+offsets suffice for dedup; re-slice on demand). Empty/null
    * text yields no rows.
    *
    * Shape at scale: map-only — one scan-side HOF pass per document
    * (one md5 per position + one per chunk), zero shuffle until a caller
    * aggregates by chunk_hash; cross-doc dedup is then one hash-partition
    * groupBy, the q_d1 exact-dedup shape on chunk identities.
    */
  def cdcChunks(
      df: DataFrame,
      idCol: String,
      textCol: String,
      window: Int = 16,
      modulus: Int = 64,
      maxLen: Int = Int.MaxValue): DataFrame = {
    require(window >= 1, "window must be positive")
    require(modulus >= 1, "modulus must be positive")
    require(maxLen >= 1, "maxLen must be positive")
    val text = coalesce(col(textCol), lit(""))
    val L = length(text).cast("bigint")
    // boundary AFTER position p (1-based) iff md5-60 of the window
    // ending at p is 0 mod modulus; the text end is always a boundary
    val hashEnds = filter(
      sequence(lit(window.toLong), L), p =>
        pmod(
          graft.functions.Hashing.md5Hash60(
            substring(text, (p - (window - 1)).cast("int"), lit(window))),
          lit(modulus.toLong)) === 0L)
    val ends = when(L >= window, array_distinct(concat(hashEnds, array(L))))
      .otherwise(array(L))
    // (start, len) per hash-defined chunk, then the maxLen post-split:
    // sub-chunk j of a chunk covers [start + j·maxLen, …] — closed-form
    val chunks = graft.functions.hof.bind(ends) { e =>
      flatten(transform(sequence(lit(0), size(e) - 1), i => {
        val start =
          when(i === 0, lit(1L)).otherwise(element_at(e, i) + 1L)
        val len = element_at(e, i + 1) - start + 1L
        transform(
          sequence(lit(0L),
            floor((len + (maxLen - 1).toLong) / maxLen.toLong).cast("bigint") - 1L),
          j => struct(
            (start + j * maxLen.toLong).as("start"),
            least(len - j * maxLen.toLong, lit(maxLen.toLong)).as("len")))
      }))
    }
    // r17 opt: the per-char rolling-hash boundary scan is the hot path —
    // spread so a one-row-group corpus doesn't run it on one input split
    graft.Tables.spread(df.filter(length(coalesce(col(textCol), lit(""))) >= 1))
      .select(col(idCol), text.as("__cdc_txt"),
        posexplode(chunks).as(Seq("chunk_idx", "c")))
      .select(
        col(idCol),
        col("chunk_idx").cast("int").as("chunk_idx"),
        col("c.start").as("start"),
        col("c.len").as("len"),
        graft.functions.Hashing.md5Hash60(
          substring(col("__cdc_txt"),
            col("c.start").cast("int"), col("c.len").cast("int")))
          .as("chunk_hash"))
  }
}
