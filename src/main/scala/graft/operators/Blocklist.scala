package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.graft.bridge

import graft.expressions.{MultiMatch, MultiMatchCounts}

/** Dictionary (blocklist) filtering over a document corpus — the
  * compliance pass an LLM-data pipeline runs before anything else ships:
  * given N banned/flagged phrases, find every document containing any of
  * them, or keep only the clean ones.
  *
  * The match is ONE Aho–Corasick pass per document
  * ([[graft.expressions.MultiMatch]]): O(text + matches) however large
  * the dictionary, vs O(N × text) for per-pattern `contains` columns.
  * The automaton is built once on the driver and rides the codegen
  * references array — scan-side, no shuffle, no join; at 100 TB the cost
  * is exactly one streaming pass over the text bytes.
  *
  * Patterns arrive as a Seq (driver-side, bounded: a dictionary is a
  * curated artifact of at most ~10^5 entries, not a dataset); caller
  * collects them from a frame if needed.
  */
object Blocklist {

  /** Matched-pattern ids per text value: array<int>, ascending, empty
    * when clean, null on null text.
    */
  def matchIds(text: Column, patterns: Seq[String]): Column =
    bridge.column(MultiMatch(bridge.expression(text), patterns))

  /** One row per (document, matched pattern): (idCol, pid, pattern,
    * first_off — 1-based offset of the first occurrence, the evidence a
    * reviewer needs). Clean documents emit nothing.
    */
  def annotate(
      df: DataFrame,
      idCol: String,
      textCol: String,
      patterns: Seq[String]): DataFrame = {
    val pats = array(patterns.map(lit): _*)
    df.select(col(idCol), col(textCol).as("__t"),
        explode(matchIds(col(textCol), patterns)).as("pid"))
      .withColumn("pattern", element_at(pats, col("pid") + 1))
      .withColumn("first_off", instr(col("__t"), col("pattern")).cast("long"))
      .drop("__t")
  }

  /** Documents with no dictionary hit — the shipping filter. Null text
    * is kept (nothing to match), mirroring SQL `contains` semantics.
    */
  def filterClean(
      df: DataFrame,
      textCol: String,
      patterns: Seq[String]): DataFrame =
    df.filter(col(textCol).isNull || size(matchIds(col(textCol), patterns)) === 0)

  /** Per-pattern occurrence counts (overlapping included), aligned to the
    * pattern array: array<int> with counts(i) for patterns(i).
    */
  def matchCounts(text: Column, patterns: Seq[String]): Column =
    bridge.column(MultiMatchCounts(bridge.expression(text), patterns))

  /** Weighted lexicon score per document — the toxicity/sentiment/quality
    * lexicon pass: score = Σ weight(i) · occurrences(i), plus the raw hit
    * total. One automaton walk per document, the weighted fold inline:
    * (idCol, n_hits, score). Weights ride the plan as an array literal
    * zipped against the counts — still zero shuffle, scan-side.
    */
  def lexiconScore(
      df: DataFrame,
      idCol: String,
      textCol: String,
      lexicon: Seq[(String, Double)]): DataFrame = {
    require(lexicon.nonEmpty, "lexicon must be non-empty")
    val cnts = matchCounts(coalesce(col(textCol), lit("")), lexicon.map(_._1))
    val ws = array(lexicon.map(e => lit(e._2)): _*)
    df.select(col(idCol), cnts.as("__c"))
      .select(
        col(idCol),
        aggregate(col("__c"), lit(0L), (acc, c) => acc + c.cast("long"))
          .as("n_hits"),
        aggregate(
          zip_with(col("__c"), ws, (c, w) => c.cast("double") * w),
          lit(0.0), (acc, x) => acc + x).as("score"))
  }
}
