package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.functions.TextAnalysis

/** BM25 keyword retrieval over a document corpus (Robertson/Okapi with
  * the Lucene-style `ln(1 + (N − df + 0.5)/(df + 0.5))` idf, which keeps
  * every idf positive).
  *
  * Scale shape: the corpus-sized work is ONE tokenize+filter scan (only
  * query-term postings survive — the filter is pushed into the exploded
  * projection, so the shuffled tf frame is |matching (doc, term)| rows,
  * not the corpus) and one hash aggregate per (doc, term). The df and
  * corpus-stats frames are term-count- and one-row-sized, broadcast to
  * the postings. Nothing global is sorted; the result is per-doc scores,
  * compose with q_c4-style top-k for ranked retrieval.
  */
object Bm25 {

  /** Per-document BM25 score for `queryTerms` (docs with ≥1 matching
    * term). Output: idCol, n_terms_matched, bm25.
    */
  def score(
      docs: DataFrame,
      idCol: String,
      textCol: String,
      queryTerms: Seq[String],
      k1: Double = 1.2,
      b: Double = 0.75): DataFrame = {
    require(queryTerms.nonEmpty, "BM25 needs at least one query term")
    // r17 opt: spread — tokenization is consumed twice (stats + tf) and
    // a one-row-group corpus otherwise tokenizes on one input split
    val toks = graft.Tables.spread(docs).select(
      col(idCol), TextAnalysis.tokens(col(textCol)).as("__tk"))
    // corpus stats: one scan-side aggregate to a single broadcast row
    val stats = toks
      .select(size(col("__tk")).cast("double").as("dl"))
      .agg(
        count(lit(1)).cast("double").as("n_docs"),
        (sum("dl") / count(lit(1))).as("avgdl"))
    // postings: doc length rides along the explode, so tf never needs a
    // corpus-sized join back to a doc-length table
    val tf = toks
      .select(col(idCol), size(col("__tk")).cast("double").as("dl"),
        explode(col("__tk")).as("term"))
      .where(col("term").isin(queryTerms: _*))
      .groupBy(col(idCol), col("dl"), col("term"))
      .agg(count(lit(1)).cast("double").as("tf"))
    val df = tf.groupBy("term").agg(count(lit(1)).cast("double").as("df"))
    val idf = log(lit(1) + (col("n_docs") - col("df") + lit(0.5)) / (col("df") + lit(0.5)))
    val tfNorm = col("tf") * lit(k1 + 1) /
      (col("tf") + lit(k1) * (lit(1 - b) + lit(b) * col("dl") / col("avgdl")))
    tf
      .join(broadcast(df), "term")
      .crossJoin(broadcast(stats))
      .groupBy(col(idCol))
      .agg(
        count(lit(1)).cast("int").as("n_terms_matched"),
        sum(idf * tfNorm).as("bm25"))
  }
}
