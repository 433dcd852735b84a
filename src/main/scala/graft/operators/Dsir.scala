package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.functions.{Hashing, TextAnalysis}

/** Data Selection via Importance Resampling (DSIR, Xie et al. 2023,
  * arXiv:2302.03169): score every raw document by how much more likely
  * its hashed n-gram features are under a small TARGET corpus (the
  * distribution you want more of) than under the raw corpus itself, then
  * keep the top-weighted documents. This is the standard cheap,
  * classifier-free way to steer a 100 TB crawl toward a quality domain —
  * the selection signal is two B-bucket unigram histograms, not a model.
  *
  * Beyond-reference surface (the reference ingests rosters and has no
  * corpus curation at all); added for the LLM-pipeline side next to the
  * mixture/sampling operators in [[Curation]].
  *
  * Scale shape: both feature distributions reduce to B rows (B =
  * `numBuckets`, hundreds–thousands) — broadcast material by
  * construction, fit on the FULL corpora with one hash aggregate each,
  * never a driver sample. Per-document scoring is one explode + one
  * (doc, bucket) hash aggregate — shuffle keyed on the doc id — then a
  * broadcast join against the B-row ratio table and one sum. Nothing
  * corpus-sized is collected, broadcast, or globally sorted; the final
  * top-k cut is TakeOrderedAndProject.
  *
  * Portability: bucket ids come from [[Hashing.md5Hash60]] (the engine-
  * portable md5 prefix hash the q_d4/q_t5 twins established), and each
  * bucket's log-ratio is ONE `ln` over an exact-integer-ratio argument —
  * `ln(((ct+1)·(Nr+B)) / ((cr+1)·(Nt+B)))` — so both engines hand the
  * same IEEE double to the same libm. Ranking rounds the weight to 6
  * decimals (the harness tolerance) with doc_id tie-break before any
  * cut, the q_e19 argmax discipline.
  */
object Dsir {

  /** (doc_id, bucket, c) hashed-unigram bucket counts per document. */
  private def docBucketCounts(
      docs: DataFrame,
      docIdCol: String,
      textCol: String,
      numBuckets: Int): DataFrame =
    docs
      .select(col(docIdCol), explode(TextAnalysis.tokens(col(textCol))).as("__tok"))
      .select(col(docIdCol), pmod(Hashing.md5Hash60(col("__tok")), lit(numBuckets)).as("bucket"))
      .groupBy(col(docIdCol), col("bucket"))
      .agg(count(lit(1)).as("c"))

  /** Per-raw-document DSIR importance weight
    * `log_w = Σ_b c_b · ln( ((ct_b+1)·(Nr+B)) / ((cr_b+1)·(Nt+B)) )`
    * (add-1 smoothed hashed-unigram log-likelihood ratio, target over
    * raw). Output: (docIdCol, n_tokens, log_w) for every raw doc with at
    * least one token. Higher = more target-like.
    */
  /** The B-row log-ratio MODEL ARTIFACT: per bucket,
    * `ln(((ct+1)·(Nr+B)) / ((cr+1)·(Nt+B)))`. Buckets absent from one
    * corpus smooth to count 0; this is the entire "model" — broadcast
    * material that can also collect to a plan literal for stateless
    * (streaming) scoring.
    */
  def bucketLogRatios(
      raw: DataFrame,
      target: DataFrame,
      docIdCol: String,
      textCol: String,
      numBuckets: Int): DataFrame = {
    require(numBuckets > 0, "numBuckets must be positive")
    val targetHist = docBucketCounts(target, docIdCol, textCol, numBuckets)
      .groupBy("bucket").agg(sum("c").as("ct"))
    val rawHist = docBucketCounts(raw, docIdCol, textCol, numBuckets)
      .groupBy("bucket").agg(sum("c").as("cr"))
    val nt = targetHist.agg(coalesce(sum("ct"), lit(0L)).as("nt"))
    val nr = rawHist.agg(coalesce(sum("cr"), lit(0L)).as("nr"))
    rawHist
      .join(targetHist, Seq("bucket"), "full_outer")
      .crossJoin(broadcast(nt))
      .crossJoin(broadcast(nr))
      .select(
        col("bucket"),
        log(
          ((coalesce(col("ct"), lit(0L)) + 1).cast("double") * (col("nr") + numBuckets)) /
            ((coalesce(col("cr"), lit(0L)) + 1).cast("double") * (col("nt") + numBuckets)))
          .as("log_ratio"))
  }

  def importanceWeights(
      raw: DataFrame,
      target: DataFrame,
      docIdCol: String,
      textCol: String,
      numBuckets: Int): DataFrame = {
    require(numBuckets > 0, "numBuckets must be positive")
    val rawCounts = docBucketCounts(raw, docIdCol, textCol, numBuckets)
    val ratios = bucketLogRatios(raw, target, docIdCol, textCol, numBuckets)
    rawCounts
      .join(broadcast(ratios), Seq("bucket"))
      .groupBy(col(docIdCol))
      .agg(
        sum("c").cast("int").as("n_tokens"),
        sum(col("c") * col("log_ratio")).as("log_w"))
  }

  /** STATELESS per-row scoring against a FITTED ratio map (bucket →
    * log_ratio, collected from [[bucketLogRatios]] — B entries, a plan
    * literal like the IVF centroids): `log_w` is a scan-side
    * `aggregate` fold over the row's own tokens, no shuffle, no state —
    * which is exactly what lets the same scorer run inside a streaming
    * micro-batch (q_st14) or a per-row ingest filter. Buckets outside
    * the map (never seen in either fit corpus) fall back to
    * `defaultLogRatio` = ln((Nr+B)/(Nt+B)), the both-counts-zero
    * smoothing value. Rows with zero tokens score NULL.
    *
    * Token-order note: the fold adds per-token log-ratios left-to-right
    * in document order, while [[importanceWeights]] sums per-bucket
    * subtotals — same terms, different association, equal only to IEEE
    * noise (the 6-decimal harness tolerance), which is why the oracle
    * replays THIS fold's grouping, not bit-identity with the batch agg.
    */
  def scoreWithRatios(
      docs: DataFrame,
      docIdCol: String,
      textCol: String,
      ratioMap: Map[Long, Double],
      defaultLogRatio: Double,
      numBuckets: Int): DataFrame = {
    require(numBuckets > 0, "numBuckets must be positive")
    val m = typedlit(ratioMap)
    val toks = TextAnalysis.tokens(col(textCol))
    val buckets = transform(toks, t => pmod(Hashing.md5Hash60(t), lit(numBuckets)))
    docs.select(
      col(docIdCol),
      size(toks).cast("int").as("n_tokens"),
      when(size(toks) > 0,
        aggregate(
          buckets,
          lit(0.0),
          (acc, b) => acc + coalesce(element_at(m, b), lit(defaultLogRatio))))
        .as("log_w"))
      .where(col("n_tokens") > 0)
  }

  /** The importance-resampling CUT: the `k` most target-like raw docs.
    * Rank compares `round(log_w, 6)` descending with ascending-doc-id
    * ties so the kept set is identical across engines.
    */
  def selectTopK(
      raw: DataFrame,
      target: DataFrame,
      docIdCol: String,
      textCol: String,
      numBuckets: Int,
      k: Int): DataFrame =
    importanceWeights(raw, target, docIdCol, textCol, numBuckets)
      .orderBy(round(col("log_w"), 6).desc, col(docIdCol))
      .limit(k)
}
