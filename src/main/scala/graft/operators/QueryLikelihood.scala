package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.functions.TextAnalysis

/** Dirichlet-smoothed query-likelihood retrieval (Zhai & Lafferty 2001,
  * "A study of smoothing methods for language models applied to ad hoc
  * information retrieval"): rank documents by the query's log-likelihood
  * under each document's smoothed unigram LM —
  *
  *   score(q, d) = Σ_{t ∈ q} ln( (tf(t,d) + μ·P(t|C)) / (|d| + μ) )
  *
  * — the probabilistic-LM counterpart to [[Bm25]]'s tf-idf family; the
  * two disagree most on short documents, which is exactly where the
  * Dirichlet prior μ earns its keep.
  *
  * Scale shape: query terms are a LITERAL list, so the per-doc term
  * frequencies come from a scan-side `isin` filter BEFORE the one
  * (doc, term)-keyed aggregate — corpus tokens that aren't query terms
  * never shuffle. Doc lengths are one doc-keyed aggregate (and reuse
  * the same exchange); collection stats reduce to a broadcast
  * |q|-row frame; the score grid is |docs|×|q| rows via a broadcast
  * cross join of the literal term frame. Top-k via TakeOrdered.
  *
  * Determinism: per-term log contributions are quantized to
  * DECIMAL(18,9) (the [[NaiveBayes]] discipline), so the per-doc sum
  * over |q| terms is exact and order-free; the final score ships as a
  * 6-decimal double under the (score desc, doc asc) total order.
  * Query terms absent from the collection (P(t|C) = 0 ⇒ −∞ for every
  * document) are dropped from the query, the standard convention.
  */
object QueryLikelihood {

  def score(
      df: DataFrame,
      idCol: String,
      textCol: String,
      queryTerms: Seq[String],
      mu: Double = 50.0,
      topK: Int = 20): DataFrame = {
    require(queryTerms.nonEmpty, "need at least one query term")
    require(queryTerms.distinct == queryTerms, "query terms must be distinct")
    require(mu > 0, "mu must be positive")
    val spark = df.sparkSession
    import spark.implicits._

    val toks = df.select(col(idCol),
      explode(TextAnalysis.tokens(col(textCol))).as("__t"))
    val docLen = toks.groupBy(col(idCol))
      .agg(count(lit(1)).as("__dl"))
    val collTotal = toks.agg(count(lit(1)).as("__ct"))
    val termCf = toks
      .where(col("__t").isin(queryTerms: _*))
      .groupBy(col("__t").as("__term"))
      .agg(count(lit(1)).as("__cf"))
    // literal query frame; collection-absent terms drop via the inner join
    val terms = queryTerms.toDF("__term")
      .join(termCf, Seq("__term"))
      .crossJoin(broadcast(collTotal))
    val tf = toks
      .where(col("__t").isin(queryTerms: _*))
      .groupBy(col(idCol), col("__t").as("__term"))
      .agg(count(lit(1)).as("__tf"))

    val contrib = round(
      log((coalesce(col("__tf"), lit(0L)).cast("double") +
        lit(mu) * (col("__cf").cast("double") / col("__ct").cast("double"))) /
        (col("__dl").cast("double") + lit(mu))), 9)
      .cast("decimal(18,9)")
    docLen
      .crossJoin(broadcast(terms))
      .join(tf, Seq(idCol, "__term"), "left")
      .groupBy(col(idCol))
      .agg(sum(contrib).as("__s"))
      .select(col(idCol), round(col("__s").cast("double"), 6).as("score"))
      .orderBy(col("score").desc, col(idCol))
      .limit(topK)
  }
}
