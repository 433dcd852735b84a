package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.functions.TextAnalysis

/** Benchmark decontamination: flag training documents that share any
  * k-token shingle with an evaluation/benchmark probe set — the standard
  * leakage guard a pretraining corpus runs before training (eval questions
  * quoted verbatim inside crawled pages inflate benchmark scores).
  *
  * Shape at scale: the probe side is shingled and deduplicated (benchmark
  * suites are thousands of documents — tiny next to the corpus), the
  * corpus side is shingled scan-side, and contamination is one shingle
  * equi-join + per-doc count. With a small probe set AQE broadcasts the
  * probe shingles, so the corpus is never shuffled at all — the flag rides
  * the ingest scan like the quality filters. No pair enumeration, no
  * O(corpus²) anything: cost is corpus shingles × hash probe.
  *
  * Reference scope ends at row-identity sync (SURVEY.md §2); this is part
  * of the beyond-reference training-data surface.
  */
object Decontamination {

  /** Per-corpus-document overlap with the probe set: `(idCol…, n_hits,
    * contaminated)` where `n_hits` counts the document's DISTINCT
    * k-shingles that appear anywhere in `probes`, and `contaminated` is
    * `n_hits > 0`. Every corpus row is kept (zero-hit docs flag false) —
    * the caller filters or routes on the flag.
    */
  def flagOverlap(
      corpus: DataFrame,
      probes: DataFrame,
      idCol: String,
      textCol: String,
      k: Int = 8): DataFrame = {
    require(k > 0, "shingle size must be positive")
    // probes only need the text column; corpus needs (idCol, textCol)
    val probeShingles = graft.Tables.spread(probes)
      .select(explode(TextAnalysis.tokenShingles(col(textCol), k)).as("__s"))
      .distinct()
    val corpusShingles = graft.Tables.spread(corpus)
      .select(col(idCol), explode(TextAnalysis.tokenShingles(col(textCol), k)).as("__s"))
      .distinct()
    val hits = corpusShingles
      .join(probeShingles, "__s")
      .groupBy(idCol)
      .agg(count(lit(1)).as("n_hits"))
    corpus
      .join(hits, Seq(idCol), "left")
      .select(col(idCol),
        coalesce(col("n_hits"), lit(0L)).as("n_hits"))
      .withColumn("contaminated", col("n_hits") > 0)
  }
}
