package graft.operators

import org.apache.spark.sql.{DataFrame, SaveMode}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Terminal TRAINING-SHARD export — the curation pipeline's last mile
  * (r15 VERDICT task #5/#6 family): after filtering/mixing/packing, a
  * training run mounts fixed-token-budget shard files plus a MANIFEST
  * (per shard: doc count, token count, source mix, content digest) that
  * lets the run verify what it is reading and lets two exports be
  * compared without reading data files.
  *
  * Shard rule (deterministic, replayable in SQL): documents in `idCol`
  * order form one token stream; a document lands in shard
  * `floor(exclusive_prefix_tokens / budget)`. Whole documents are never
  * split, so a shard can overshoot `budget` by at most one document —
  * the standard landing-zone tradeoff (WebDataset-style shards do the
  * same); boundaries depend only on (order, token counts), never on
  * partitioning or arrival order, which is what makes re-runs
  * IDEMPOTENT.
  *
  * Manifest digest: `content_md5` = md5 of the concatenation of each
  * member document's text-md5 in id order — verifiable per shard
  * without re-reading other shards, and exactly replayable in any
  * engine with md5 + ordered string_agg.
  *
  * Scale shape: shard assignment reuses [[Curation.packSequences]]'s
  * TWO-LEVEL prefix sum (no corpus-sized single-partition window); the
  * manifest is one groupBy per shard whose collected state is bounded
  * by docs-per-shard (≈ budget / typical doc tokens — a knob, not the
  * corpus); the writer repartitions BY shard before `partitionBy` so
  * each shard directory gets one file, not tasks×dirs slivers (the r15
  * SubstringIndex layout lesson).
  */
object ShardExport {

  /** Per-document shard assignment: input columns +
    * (token_count, shard_id, seq_in_shard).
    */
  def assign(
      docs: DataFrame,
      idCol: String,
      textCol: String,
      sourceCol: String,
      budget: Int): DataFrame = {
    require(budget >= 1, "budget must be positive")
    val withTc = docs.select(
      col(idCol), col(sourceCol), col(textCol),
      graft.functions.TextAnalysis.tokenCount(col(textCol)).as("token_count"))
    Curation.packSequences(withTc, idCol, "token_count", budget)
      .withColumnRenamed("pack_id", "shard_id")
      .withColumn("seq_in_shard",
        row_number().over(
          Window.partitionBy("shard_id").orderBy(idCol)).cast("int"))
      .drop("pack_offset")
  }

  /** Per-shard manifest: (shard_id, n_docs, n_tokens, source_mix,
    * content_md5) — `source_mix` renders as `src:count` pairs sorted by
    * source name, comma-joined (deterministic and string-comparable
    * across engines).
    */
  def manifest(assigned: DataFrame, idCol: String, textCol: String,
      sourceCol: String): DataFrame = {
    val mix = assigned
      .groupBy(col("shard_id"), col(sourceCol).as("__src"))
      .agg(count(lit(1)).as("__n"))
      .groupBy("shard_id")
      .agg(concat_ws(",",
        transform(
          array_sort(collect_list(struct(col("__src"), col("__n")))),
          s => concat(s.getField("__src"), lit(":"), s.getField("__n"))))
        .as("source_mix"))
    val digest = assigned
      .groupBy("shard_id")
      .agg(
        count(lit(1)).as("n_docs"),
        sum(col("token_count")).as("n_tokens"),
        md5(concat_ws("",
          transform(
            array_sort(collect_list(struct(col(idCol).as("__id"),
              md5(coalesce(col(textCol), lit("")).cast("binary"))
                .as("__h")))),
            s => s.getField("__h"))).cast("binary")).as("content_md5"))
    digest.join(mix, Seq("shard_id"))
      .select("shard_id", "n_docs", "n_tokens", "source_mix", "content_md5")
  }

  /** INCREMENTAL append — the landing-zone posture of the index
    * families (DedupIndex / SubstringIndex / AnnIndex) applied to the
    * terminal artifact: new documents pack into FRESH shards starting
    * after the existing maximum (each drop starts its own token
    * budget — the WebDataset convention: shards are immutable once
    * written, so a drop never rewrites or reopens an old shard, and a
    * training run can mount old + new manifests unioned). Work ∝ the
    * batch: one `_manifest` read for the max shard id, the batch's own
    * two-level prefix sum, one partitioned append. Existing shard
    * files and manifest rows are byte-untouched (spec-pinned).
    */
  def append(
      spark: org.apache.spark.sql.SparkSession,
      docs: DataFrame,
      idCol: String,
      textCol: String,
      sourceCol: String,
      budget: Int,
      outDir: String): Unit = {
    val maxRow = spark.read.parquet(s"$outDir/_manifest")
      .agg(max(col("shard_id"))).head()
    require(!maxRow.isNullAt(0),
      s"append target has an EMPTY manifest ($outDir/_manifest): refuse " +
        "to guess shard numbering — write() the first drop instead")
    val maxShard = maxRow.getLong(0)
    val assigned = assign(docs, idCol, textCol, sourceCol, budget)
      .withColumn("shard_id", col("shard_id") + (maxShard + 1L))
      .localCheckpoint(true)
    try {
      assigned
        .repartition(col("shard_id"))
        .sortWithinPartitions("shard_id", "seq_in_shard")
        .write.mode(SaveMode.Append)
        .partitionBy("shard_id")
        .parquet(s"$outDir/shards")
      manifest(assigned, idCol, textCol, sourceCol)
        .coalesce(1)
        .write.mode(SaveMode.Append)
        .parquet(s"$outDir/_manifest")
    } finally {
      org.apache.spark.sql.graft.bridge.freeLocalCheckpoint(assigned)
    }
  }

  /** Write the mountable artifact: shard member files partitioned by
    * shard_id (one file per shard directory) plus `_manifest` parquet.
    * Overwrites `outDir` — re-running the same input yields the same
    * shards, members and digests (idempotence is spec-pinned).
    */
  def write(
      docs: DataFrame,
      idCol: String,
      textCol: String,
      sourceCol: String,
      budget: Int,
      outDir: String): Unit = {
    val assigned = assign(docs, idCol, textCol, sourceCol, budget)
      .localCheckpoint(true)
    try {
      assigned
        .repartition(col("shard_id"))
        .sortWithinPartitions("shard_id", "seq_in_shard")
        .write.mode(SaveMode.Overwrite)
        .partitionBy("shard_id")
        .parquet(s"$outDir/shards")
      manifest(assigned, idCol, textCol, sourceCol)
        .coalesce(1)
        .write.mode(SaveMode.Overwrite)
        .parquet(s"$outDir/_manifest")
    } finally {
      org.apache.spark.sql.graft.bridge.freeLocalCheckpoint(assigned)
    }
  }
}
