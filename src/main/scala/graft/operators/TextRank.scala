package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.functions.TextAnalysis

/** TextRank keyword extraction (Mihalcea & Tarau 2004, "TextRank:
  * Bringing Order into Text"): rank corpus vocabulary by running
  * PageRank over the token CO-OCCURRENCE graph — a token matters when
  * it co-occurs with tokens that matter, the recursive importance no
  * frequency count (TF-IDF, q_t6) expresses. The classic corpus-level
  * keyword list for curation dashboards and topic tagging.
  *
  * Reference behavior: the reference ETL has no text analytics; this
  * extends the engine's text family with the graph-ranking primitive,
  * composing [[TextAnalysis.tokens]] with the gated [[PageRank]].
  *
  * Execution shape, corpus → graph → rank:
  *  1. Tokenize and length-filter SCAN-SIDE (codegen HOFs, zero
  *     shuffle). The `minTokenLen` filter is the content-word proxy
  *     (classic TextRank filters by POS; a deterministic length floor
  *     keeps both engines exact) — and, as in the original, the
  *     co-occurrence window applies to the FILTERED sequence.
  *  2. Adjacent-pair edges are built row-locally by zipping the token
  *     array with its own tail (`zip_with(slice, slice)`) — no window
  *     function, no per-doc shuffle; self-loops (repeated tokens)
  *     drop.
  *  3. ONE hash aggregate reduces the corpus-sized pair stream to the
  *     vocabulary²-bounded undirected edge frame (canonical
  *     least/greatest orientation, then symmetrized for the random
  *     walk) — everything downstream is vocabulary-scale, not
  *     corpus-scale.
  *  4. Weighted [[PageRank.run]] on the token graph; ranks rounded to
  *     6 decimals, top-k under the deterministic (rank desc, token
  *     asc) total order (Spark's TakeOrdered — no global sort
  *     materialization).
  */
object TextRank {

  /** Corpus-level keywords: (token, rank), `topK` rows. */
  def keywords(
      df: DataFrame,
      textCol: String,
      minTokenLen: Int = 4,
      iterations: Int = 3,
      damping: Double = 0.85,
      topK: Int = 20): DataFrame = {
    require(minTokenLen >= 1, "minTokenLen must be >= 1")
    require(topK >= 1, "topK must be >= 1")
    val edges = cooccurrenceEdges(df, textCol, minTokenLen)
    PageRank.run(edges, iterations, damping)
      .select(col("node").as("token"), round(col("rank"), 6).as("rank"))
      .orderBy(col("rank").desc, col("token"))
      .limit(topK)
  }

  /** The symmetrized weighted co-occurrence edge frame (src, dst,
    * weight): adjacency over the length-filtered token sequence,
    * exposed separately so callers can run other graph ops
    * (communities, components) over the same text graph.
    */
  def cooccurrenceEdges(
      df: DataFrame,
      textCol: String,
      minTokenLen: Int): DataFrame = {
    val toks = df
      .select(filter(TextAnalysis.tokens(col(textCol)),
        t => length(t) >= minTokenLen).as("tk"))
      .where(size(col("tk")) >= 2)
    val pairs = toks
      .select(explode(zip_with(
        slice(col("tk"), lit(1), size(col("tk")) - 1),
        slice(col("tk"), lit(2), size(col("tk")) - 1),
        (a, b) => struct(least(a, b).as("src"), greatest(a, b).as("dst"))))
        .as("e"))
      .select(col("e.src"), col("e.dst"))
      .where(col("src") =!= col("dst"))
    val und = pairs.groupBy("src", "dst")
      .agg(count(lit(1)).cast("double").as("weight"))
    und.unionByName(
      und.select(col("dst").as("src"), col("src").as("dst"), col("weight")))
  }
}
