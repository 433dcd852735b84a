package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** WITHIN-document repetition removal — the C4/Gopher cleanup stage
  * that runs between boilerplate extraction and corpus-level dedup:
  * crawled pages repeat navigation crumbs, cookie banners and template
  * lines INSIDE one document, and those repeats both poison n-gram
  * statistics and inflate every downstream dedup signal. Exact
  * duplicate lines are removed keeping the FIRST occurrence (document
  * order is meaning; later repeats are the noise).
  *
  * Short lines are EXEMPT from dedup (`minLineChars` on the trimmed
  * line): blank separators and one-word list items repeat legitimately,
  * and C4's rule family dedups sentences/lines of substance, not
  * structure. The exemption is part of the contract and the oracle.
  *
  * Scale shape: one split + posexplode, one per-(doc, line) window for
  * first-occurrence ranking, one per-doc reassembly aggregate —
  * partition width bounded by lines-in-one-document everywhere; no
  * corpus-wide shuffle key, so the stage runs at scan parallelism.
  */
object DocRepetition {

  /** Per-document line dedup:
    * (doc_id, text_clean, n_lines, n_lines_kept, n_chars_clean,
    * dup_line_fraction r6) — `dup_line_fraction` the share of removed
    * lines, the corpus-health readout that flags template-heavy
    * sources. Documents with no text yield one empty-text row
    * (n_lines = 1: the empty split token — split semantics, pinned by
    * the oracle).
    */
  def dedupLines(
      docs: DataFrame,
      idCol: String,
      textCol: String,
      minLineChars: Int = 10): DataFrame = {
    require(minLineChars >= 1, "minLineChars must be positive")
    val wOcc = Window.partitionBy("doc_id", "__line").orderBy("__idx")
    val wDoc = Window.partitionBy("doc_id")
    docs
      .select(col(idCol).as("doc_id"),
        posexplode(split(coalesce(col(textCol), lit("")), "\n"))
          .as(Seq("__idx", "__line")))
      .withColumn("__exempt", length(trim(col("__line"))) < minLineChars)
      .withColumn("__keep",
        col("__exempt") || row_number().over(wOcc) === 1)
      .withColumn("n_lines", count(lit(1)).over(wDoc))
      .withColumn("n_lines_kept",
        sum(when(col("__keep"), 1L).otherwise(0L)).over(wDoc))
      .filter(col("__keep"))
      .groupBy(col("doc_id"), col("n_lines"), col("n_lines_kept"))
      .agg(concat_ws("\n",
        transform(
          array_sort(collect_list(struct(col("__idx"), col("__line")))),
          s => s.getField("__line"))).as("text_clean"))
      .select(
        col("doc_id"),
        col("text_clean"),
        col("n_lines").cast("bigint").as("n_lines"),
        col("n_lines_kept").cast("bigint").as("n_lines_kept"),
        length(col("text_clean")).as("n_chars_clean"),
        round((col("n_lines") - col("n_lines_kept")).cast("double") /
          col("n_lines"), 6).as("dup_line_fraction"))
  }
}
