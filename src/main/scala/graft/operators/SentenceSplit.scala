package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Rule-based sentence segmentation — the preprocessing stage between
  * document cleanup and anything sentence-scoped (sentence-level dedup,
  * quality scoring, chunk boundaries that respect sentences, alignment
  * mining). Neural segmenters don't belong in a scan; the deterministic
  * rule family below is the one production corpus pipelines run, and
  * every rule is an RE2-compatible regex (no lookaround) so a SQL
  * oracle replays the segmentation exactly:
  *
  *   1. PROTECT known abbreviations (`Mr. Mrs. Dr. Prof. St. vs. etc.
  *      e.g. i.e. Jr. Sr. Inc. Ltd. No. Fig. al.`) and single-letter
  *      initials (`J. K.`) by swapping their dot for U+0002 — the
  *      classic failure cases of naive splitting;
  *   2. BREAK after `[.!?]+` followed by spaces and an upper-case or
  *      digit sentence opener (the opener is CONSUMED and re-emitted —
  *      RE2 has no lookahead; consuming it is equivalent here because
  *      an opener character can never itself end a sentence);
  *   3. restore protected dots, split on U+0001, trim, drop empties.
  *
  * Scale shape: pure scan-side regexp chain + one posexplode; the only
  * window renumbers sentences per document. Boundary (documented):
  * the abbreviation list is fixed and English-oriented; quote-trailing
  * terminators (`."`) keep the quote with the LEFT sentence.
  */
object SentenceSplit {

  private val abbrevs = Seq(
    "Mr", "Mrs", "Ms", "Dr", "Prof", "St", "vs", "etc", "Jr", "Sr",
    "Inc", "Ltd", "Co", "No", "Fig", "al", "approx", "Dept")

  /** The protected-abbreviation pattern: `(^|space)Abbr.` (also covers
    * `e.g.`/`i.e.` via their own entries below).
    */
  private val abbrevPattern =
    s"(^|[ (\\n\\t])((?i:${abbrevs.mkString("|")})|[A-Z])\\."

  /** Segmented text with U+0001 sentence delimiters. */
  def markBoundaries(text: Column): Column = {
    val noCtl = translate(coalesce(text, lit("")), "\u0001\u0002", "")
    // e.g. / i.e. — both dots protected as a unit
    val egie = regexp_replace(
      regexp_replace(noCtl, "([ (\\n\\t])e\\.g\\.", "$1e\u0002g\u0002"),
      "([ (\\n\\t])i\\.e\\.", "$1i\u0002e\u0002")
    // run twice: consecutive initials ("J. K. Rowling") overlap — the
    // second match starts inside the first's consumed region, which one
    // global pass cannot see (same two-pass idiom as the q_t34 chain)
    val prot0 = regexp_replace(egie, abbrevPattern, "$1$2\u0002")
    val prot = regexp_replace(prot0, abbrevPattern, "$1$2\u0002")
    val broken = regexp_replace(
      prot, "([.!?]+[\"')\\]]*) +([\"'(\\[]*[A-Z0-9])", "$1\u0001$2")
    translate(broken, "\u0002", ".")
  }

  /** One row per sentence: (doc_id, sent_idx, sentence, n_chars,
    * n_words) — trimmed, empties dropped, renumbered per document in
    * order.
    */
  def sentences(docs: DataFrame, idCol: String, textCol: String): DataFrame = {
    val w = Window.partitionBy("doc_id").orderBy("__i")
    docs
      .select(col(idCol).as("doc_id"),
        posexplode(split(markBoundaries(col(textCol)), ""))
          .as(Seq("__i", "__s")))
      .withColumn("sentence", trim(col("__s")))
      .filter(length(col("sentence")) > 0)
      .select(
        col("doc_id"),
        (row_number().over(w) - 1).as("sent_idx"),
        col("sentence"),
        length(col("sentence")).as("n_chars"),
        size(split(col("sentence"), "\\s+")).as("n_words"))
  }
}
