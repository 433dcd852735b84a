package graft.queries

import org.apache.spark.sql.functions._

import graft.Tables
import graft.operators.Multimodal

/** Multimodal binary-column operators. The payload is the document text
  * encoded as UTF-8 bytes — the testdata ships no media blobs, so the
  * binary *plumbing* (lengths, hashes, slicing, metadata structs) is what
  * the oracle verifies; decode itself is the documented stub.
  */
object MultimodalQueries extends QueryGroup {

  private def withPayload(df: org.apache.spark.sql.DataFrame) =
    df.withColumn("payload", col("text").cast("binary"))

  // Binary payload metadata — byte length and prefix are codec-independent
  // and oracle-checkable (DuckDB encode() produces the same UTF-8 bytes).
  private val qM1 = Q(
    "q_m1_binary_meta",
    """SELECT doc_id,
      |       CAST(octet_length(encode(text)) AS INT) AS n_bytes,
      |       hex(encode(substr(text, 1, 8))) AS prefix_hex
      |FROM documents ORDER BY doc_id""".stripMargin) { (s, dir) =>
    withPayload(Tables.load(s, dir, "documents"))
      .select(
        col("doc_id"),
        length(col("payload")).as("n_bytes"),
        hex(substring(col("payload"), 1, 8)).as("prefix_hex"))
      .orderBy("doc_id")
  }

  // Full media-record assembly: payload + typed metadata struct + stubbed
  // decode + features + frame samples, emitted as harness-sortable scalars
  // (structs flattened, arrays fingerprinted). Rows-only: the stub outputs
  // are xxhash64-derived, so no SQL oracle; shapes and determinism are
  // spec-verified.
  private val qM2 = Q.rowsOnly("q_m2_media_record") { (s, dir) =>
    val docs = withPayload(Tables.load(s, dir, "documents"))
    Multimodal
      .decodeStage(Multimodal.withMediaMeta(docs, "payload", "text/plain"),
        "payload", numPartitions = 32) { p =>
        Seq(
          "image_meta" -> Multimodal.decodeImageMetaStub(p),
          "features"   -> Multimodal.extractFeaturesStub(p, dim = 16),
          "frames"     -> Multimodal.sampleFramesStub(p, n = 4, frameBytes = 64))
      }
      .select(
        col("doc_id"),
        col("media_meta.media_type").as("media_type"),
        col("media_meta.n_bytes").as("n_bytes"),
        col("media_meta.content_hash").as("content_hash"),
        col("image_meta.width").as("width"),
        col("image_meta.height").as("height"),
        col("image_meta.channels").as("channels"),
        md5(concat_ws(",", transform(col("features"), _.cast("string")))).as("features_md5"),
        size(col("frames")).as("n_frames"),
        md5(concat_ws(",", transform(col("frames"), f => hex(f)))).as("frames_md5"))
      .orderBy("doc_id")
  }

  // Stub-decoded features feeding the ANN operator — multimodal similarity
  // is the text pipeline with a different encoder (rows-only).
  private val qM3 = Q.rowsOnly("q_m3_media_ann") { (s, dir) =>
    val feats = withPayload(Tables.spread(Tables.load(s, dir, "documents")))
      .select(col("doc_id").as("vec_id"),
        Multimodal.extractFeaturesStub(col("payload"), dim = 16).as("embedding"))
    graft.operators.SimilaritySearch
      .bruteForceTopK(feats, feats.filter(col("vec_id") < 4), "vec_id", "embedding", k = 5)
      .select(col("query_id"), col("neighbor_id"), col("cosine"), col("rank").cast("int").as("rank"))
      .orderBy("query_id", "rank")
  }

  override val all: Seq[Q] = Seq(qM1, qM2, qM3)
}
