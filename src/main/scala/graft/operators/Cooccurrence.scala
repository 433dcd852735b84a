package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.functions.TextAnalysis

/** Windowed co-occurrence statistics with pointwise mutual information
  * (Church–Hanks 1990, the association measure behind skip-gram/GloVe
  * co-occurrence matrices): unordered token pairs within `window`
  * positions, corpus-level pair and unigram counts, and
  * PMI = ln(P(a,b) / (P(a)·P(b))) with P(a,b) = c_ab/N_pairs and
  * P(a) = c_a/N_tokens — the statistics an embedding pipeline derives
  * its training signal from, and the collocation detector a curation
  * pass uses (high-PMI pairs are multi-word expressions; PMI ≈ 0 pairs
  * are noise).
  *
  * Beyond-reference surface: the reference syncs rows and never models
  * text.
  *
  * Determinism contract: pairs canonicalize as (least, greatest) in
  * binary string order; counts are exact integers; the PMI double is
  * computed with one fixed association (c_ab·N_tok·N_tok)/(N_pairs·c_a·
  * c_b) and ROUNDED to 6 decimals before shipping — natural log differs
  * in the last ulp across libm implementations, so the raw double is
  * not an oracle-stable value (the q_e19/q_v19 rounding rule).
  *
  * Shape at scale: pair generation is MAP-ONLY (one scan-side HOF pass
  * per document, ∝ tokens·window — no positional self-join); then one
  * hash aggregate for pair counts, one for unigrams, and two joins of
  * the min-count-PRUNED pair frame against the unigram frame — the
  * prune happens before the joins, so hapax noise never shuffles twice.
  */
object Cooccurrence {

  /** Output: `(tok_a, tok_b, c_ab, c_a, c_b, pmi)` for pairs with
    * `c_ab >= minPairCount`, tok_a <= tok_b.
    */
  def pmiPairs(
      df: DataFrame,
      textCol: String,
      window: Int,
      minPairCount: Long): DataFrame =
    pmiPairsOfArrays(
      df.select(TextAnalysis.tokens(col(textCol)).as("__toks")),
      "__toks", window, minPairCount)

  /** [[pmiPairs]] over an ALREADY-TOKENIZED sequence column
    * (`array<string>`): the entry point for non-text sequences — walk
    * corpora ([[RandomWalks]] node sequences are the skip-gram input of
    * DeepWalk/node2vec training), event paths, API call chains. Same
    * canonicalization, counting, and rounded-PMI contract.
    */
  def pmiPairsOfArrays(
      df0: DataFrame,
      seqCol: String,
      window: Int,
      minPairCount: Long): DataFrame = {
    require(window >= 1, "window must be positive")
    require(minPairCount >= 1, "minPairCount must be positive")
    // r17 opt: the windowed pair explosion is the per-row hot path —
    // spread so a one-row-group corpus doesn't run it on one input split
    val df = graft.Tables.spread(df0)
    val toks = coalesce(col(seqCol), array().cast("array<string>"))
    val pairsOfDoc = graft.functions.hof.bind(toks) { tk =>
      val n = size(tk)
      when(n >= 2,
        flatten(transform(sequence(lit(0), n - 2), i =>
          transform(sequence(lit(1), least(lit(window), n - 1 - i)), d => {
            val a = element_at(tk, i + 1)
            val b = element_at(tk, i + d + 1)
            struct(least(a, b).as("tok_a"), greatest(a, b).as("tok_b"))
          }))))
        .otherwise(array().cast("array<struct<tok_a:string,tok_b:string>>"))
    }
    val pairs = df.select(explode(pairsOfDoc).as("p"))
      .select(col("p.tok_a").as("tok_a"), col("p.tok_b").as("tok_b"))
    val pairCounts = pairs.groupBy("tok_a", "tok_b")
      .agg(count(lit(1)).as("c_ab"))
      .filter(col("c_ab") >= minPairCount) // prune BEFORE the vocab joins
    val unigrams = df.select(explode(toks).as("tok"))
      .groupBy("tok").agg(count(lit(1)).as("c"))
    // corpus scalars ride as broadcast one-row frames
    val totals = unigrams.agg(sum(col("c")).cast("bigint").as("n_tok"))
      .crossJoin(broadcast(
        pairs.agg(count(lit(1)).cast("bigint").as("n_pairs"))))
    pairCounts
      .join(unigrams.select(col("tok").as("tok_a"), col("c").as("c_a")), Seq("tok_a"))
      .join(unigrams.select(col("tok").as("tok_b"), col("c").as("c_b")), Seq("tok_b"))
      .crossJoin(broadcast(totals))
      .select(
        col("tok_a"), col("tok_b"),
        col("c_ab").cast("bigint").as("c_ab"),
        col("c_a").cast("bigint").as("c_a"),
        col("c_b").cast("bigint").as("c_b"),
        round(
          log((col("c_ab").cast("double") * col("n_tok") * col("n_tok")) /
            (col("n_pairs").cast("double") * col("c_a") * col("c_b"))), 6)
          .as("pmi"))
  }
}
