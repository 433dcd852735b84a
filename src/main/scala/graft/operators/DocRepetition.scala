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

  /** Default `minLineChars`: trimmed lines shorter than this are EXEMPT
    * from dedup. Shared with the streaming wrapper's persisted
    * seen-line store (`CorpusStream.globalLineDedupAvailableNow`) so
    * the store filter and the dedup rule can never diverge (r16
    * ADVICE).
    */
  val defaultMinLineChars: Int = 10

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
      minLineChars: Int = defaultMinLineChars): DataFrame = {
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

  /** CORPUS-GLOBAL line dedup — the other half of the C4 rule: cookie
    * banners, subscribe prompts and copyright footers repeat ACROSS
    * documents, and only the corpus-wide first occurrence (smallest
    * (doc, idx)) survives; every later document loses the line. Short
    * lines stay exempt exactly as in [[dedupLines]].
    *
    * Scale shape — deliberately NOT the per-line window of the
    * within-doc form: a window partitioned by line CONTENT sorts every
    * occurrence of a hot line in one task (a banner on 10⁸ pages is a
    * straight skew stall). Instead the first occurrence per line is
    * one `min(struct(doc, idx))` HASH AGGREGATE — partial aggregation
    * collapses hot lines MAP-SIDE, so the shuffle carries one row per
    * distinct line per input partition — and survivors join back on
    * (line, doc, idx). Output schema matches [[dedupLines]].
    */
  def dedupLinesGlobal(
      docs: DataFrame,
      idCol: String,
      textCol: String,
      minLineChars: Int = defaultMinLineChars,
      seenLines: Option[DataFrame] = None): DataFrame = {
    require(minLineChars >= 1, "minLineChars must be positive")
    val lines = docs
      .select(col(idCol).as("doc_id"),
        posexplode(split(coalesce(col(textCol), lit("")), "\n"))
          .as(Seq("__idx", "__line")))
      .withColumn("__exempt", length(trim(col("__line"))) < minLineChars)
    val firstOcc = lines
      .filter(!col("__exempt"))
      .groupBy(col("__line"))
      .agg(min(struct(col("doc_id"), col("__idx"))).as("__first"))
      .select(col("__line"), col("__first.doc_id").as("__fd"),
        col("__first.__idx").as("__fi"))
    // the incremental form (`seenLines`: one `__line` column — the
    // landing-zone store): a line seen in an EARLIER drop drops here
    // even at its in-batch first occurrence
    val withSeen = seenLines match {
      case Some(seen) =>
        lines.join(
          seen.select(col("__line")).distinct()
            .withColumn("__seen", lit(true)),
          Seq("__line"), "left")
      case None => lines.withColumn("__seen", lit(null).cast("boolean"))
    }
    // TOTAL by construction (the HtmlExtract.extract posture): one
    // aggregate over ALL lines with a conditional collect — a document
    // whose every substantial line first appeared elsewhere still
    // comes back, with only its exempt lines (possibly empty text)
    withSeen
      .join(firstOcc, Seq("__line"), "left")
      .withColumn("__keep",
        col("__exempt") ||
          (col("doc_id") === col("__fd") && col("__idx") === col("__fi") &&
            col("__seen").isNull))
      .groupBy(col("doc_id"))
      .agg(
        count(lit(1)).cast("bigint").as("n_lines"),
        sum(when(col("__keep"), 1L).otherwise(0L)).cast("bigint")
          .as("n_lines_kept"),
        concat_ws("\n",
          transform(
            array_sort(collect_list(
              when(col("__keep"), struct(col("__idx"), col("__line"))))),
            s => s.getField("__line"))).as("text_clean"))
      .select(
        col("doc_id"),
        col("text_clean"),
        col("n_lines"),
        col("n_lines_kept"),
        length(col("text_clean")).as("n_chars_clean"),
        round((col("n_lines") - col("n_lines_kept")).cast("double") /
          col("n_lines"), 6).as("dup_line_fraction"))
  }
}
