package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Corpus-curation operators for training-data pipelines: deterministic
  * sampling, stratified sampling, weighted source mixing, and sequence
  * packing. Everything here is a scan-side filter or a bounded two-level
  * aggregation — nothing samples with `rand()` (retries/replays must not
  * change the corpus) and nothing shuffles the full corpus.
  *
  * Reference scope ends at full-snapshot sync (`SisConnectorService.java`
  * moves every row every run); curation is part of the beyond-reference
  * surface the engine adds for LLM-scale data work.
  */
object Curation {

  /** Uniform-in-[0,1) hash of `key` salted with `seed`: the first 32 bits
    * of md5, which any engine can reproduce (the DuckDB oracles replay it
    * verbatim) — unlike xxhash64, whose seed handling is Spark-private.
    * Deterministic per (key, seed): retries, replays and backfills keep
    * or drop the same rows.
    *
    * A null key hashes to NULL (not to a hash of the bare seed —
    * concat_ws would silently skip the null), matching SQL `||` null
    * propagation: null-key rows fail every `hash < rate` filter and are
    * dropped, in the engine and the oracle alike.
    */
  def hashUnit(key: Column, seed: String): Column =
    when(key.isNull, lit(null).cast("double")).otherwise(
      conv(substring(md5(concat_ws(":", key.cast("string"), lit(seed))), 1, 8), 16, 10)
        .cast("bigint") / lit(4294967296L))

  /** Keep each row with probability `rate`, decided by [[hashUnit]] of its
    * key — a pure scan-side filter (reaches the parquet scan as a
    * predicate on computed columns; no shuffle, no state).
    */
  def deterministicSample(
      df: DataFrame, keyCol: String, rate: Double, seed: String): DataFrame = {
    require(rate >= 0.0 && rate <= 1.0, s"rate must be in [0,1], got $rate")
    df.filter(hashUnit(col(keyCol), seed) < lit(rate))
  }

  /** Per-stratum sampling rates (strata without an entry keep
    * `defaultRate`). Still a scan-side filter: the rate lookup is a map
    * literal in the plan, not a join.
    */
  def stratifiedSample(
      df: DataFrame,
      keyCol: String,
      stratumCol: String,
      rates: Map[String, Double],
      defaultRate: Double,
      seed: String): DataFrame = {
    require((defaultRate +: rates.values.toSeq).forall(r => r >= 0.0 && r <= 1.0),
      "all rates must be in [0,1]")
    val rateCol = coalesce(
      element_at(typedlit(rates), col(stratumCol)), lit(defaultRate))
    df.filter(hashUnit(col(keyCol), seed) < rateCol)
  }

  /** Downsample a corpus to target stratum proportions `weights` (summing
    * to ~1) WITHOUT upsampling: the output is the largest corpus whose
    * stratum mix matches the weights, i.e. `scale = min_s(n_s / w_s)`
    * rows total with `w_s * scale` rows expected from stratum s. Strata
    * absent from `weights` (or weighted 0) are dropped.
    *
    * Shape at scale: one count-aggregate over the stratum column (tiny
    * result — strata are sources/languages, not documents), the rate
    * table derived from it stays a broadcast join, and the sampling
    * decision is the same scan-side [[hashUnit]] filter. No corpus
    * shuffle, no driver-side collect.
    */
  def mixture(
      df: DataFrame,
      keyCol: String,
      stratumCol: String,
      weights: Map[String, Double],
      seed: String): DataFrame = {
    require(weights.values.forall(_ >= 0.0), "weights must be non-negative")
    val spark = df.sparkSession
    import spark.implicits._
    val w = weights.toSeq.filter(_._2 > 0.0).toDF(stratumCol, "__wt")
    val cnt = df.groupBy(stratumCol).agg(count(lit(1)).as("__n")).join(w, stratumCol)
    val scale = cnt.agg(min(col("__n") / col("__wt")).as("__scale"))
    val rates = cnt.crossJoin(broadcast(scale))
      .select(col(stratumCol),
        least(lit(1.0), col("__wt") * col("__scale") / col("__n")).as("__rate"))
    df.join(broadcast(rates), stratumCol)
      .filter(hashUnit(col(keyCol), seed) < col("__rate"))
      .drop("__rate")
  }

  /** Sequence packing, concat-then-chunk style: lay all documents out in
    * `orderCol` order as one token stream and cut it into packs of
    * `budget` tokens. Emits each document's pack id and offset (documents
    * may straddle a pack boundary — standard pretraining chunking).
    *
    * The global running token count is a two-level prefix sum keyed by
    * `floor(orderCol / bucketWidth)`: within-bucket cumsum is an ordinary
    * partitioned window, bucket totals are a tiny frame (corpus/`
    * bucketWidth` rows) whose exclusive prefix runs in one partition and
    * broadcasts back. No single-partition window ever sees corpus-sized
    * data — the failure mode of the naive `Window.orderBy(id)` global
    * cumsum, which drags every row into one task.
    */
  def packSequences(
      df: DataFrame,
      orderCol: String,
      tokenCol: String,
      budget: Int,
      bucketWidth: Int = 4096): DataFrame = {
    require(budget > 0 && bucketWidth > 0)
    val inBucket = Window.partitionBy("__b").orderBy(orderCol)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val withIn = df
      .withColumn("__b", floor(col(orderCol) / bucketWidth))
      .withColumn("__cin", sum(col(tokenCol)).over(inBucket))
    val bucketPrefix = Window.orderBy("__b")
      .rowsBetween(Window.unboundedPreceding, -1)
    val offsets = withIn
      .groupBy("__b").agg(sum(col(tokenCol)).as("__bt"))
      .withColumn("__off", coalesce(sum("__bt").over(bucketPrefix), lit(0L)))
      .select("__b", "__off")
    withIn
      .join(broadcast(offsets), "__b")
      .withColumn("__cum", col("__off") + col("__cin") - col(tokenCol))
      .withColumn("pack_id", floor(col("__cum") / budget))
      .withColumn("pack_offset", col("__cum") % budget)
      .drop("__b", "__cin", "__off", "__cum")
  }

  /** Exactly `k` rows, chosen deterministically (the k smallest
    * [[hashUnit]] values): a fixed-size sample whose membership is a pure
    * function of (key, seed). No global sort — the selection is a
    * bounded-heap top-k ([[graft.expressions.TopKScoreId]]) over the
    * negated hash: map-side O(log k) updates, ≤ k-entry partials shuffle
    * to one reducer, and the picked key set broadcasts back as a
    * scan-side semi join. The naive `ORDER BY hash LIMIT k` ships and
    * sorts the whole corpus instead.
    */
  def sampleExactK(df: DataFrame, keyCol: String, k: Int, seed: String): DataFrame = {
    require(k > 0, "k must be positive")
    val scored = df.select(
      lit(0).as("__g"),
      (-hashUnit(col(keyCol), seed)).as("cosine"),
      col(keyCol).as("neighbor_id"))
    val picked = SimilaritySearch.topKPerKey(scored, "__g", k)
      .select(col("neighbor_id").as("__pick"))
    df.join(broadcast(picked), col(keyCol) === col("__pick"), "left_semi")
  }

  /** Deterministic sample of exactly `k` rows PER GROUP (the stratified
    * form of [[sampleExactK]]): within each group, the k hash-smallest
    * keys win — fixed per-stratum quotas regardless of stratum size,
    * where [[stratifiedSample]]'s per-group RATES cannot promise a count.
    * Same bounded-heap shape: map-side O(log k) heap updates per group,
    * ≤ k-entry partials shuffle on the group key, and the picked key set
    * (k · |groups| rows) broadcasts back as a scan-side semi join.
    *
    * PRECONDITION: `keyCol` values must be unique corpus-wide (the semi
    * join keeps every row sharing a picked key). Groups smaller than k
    * return whole.
    */
  def sampleExactKPerGroup(
      df: DataFrame,
      groupCol: String,
      keyCol: String,
      k: Int,
      seed: String): DataFrame = {
    require(k > 0, "k must be positive")
    val scored = df.select(
      col(groupCol).as("__g"),
      (-hashUnit(col(keyCol), seed)).as("cosine"),
      col(keyCol).as("neighbor_id"))
    val picked = SimilaritySearch.topKPerKey(scored, "__g", k)
      .select(col("neighbor_id").as("__pick"))
    df.join(broadcast(picked), col(keyCol) === col("__pick"), "left_semi")
  }

  /** Temperature-scaled source mixture (the multilingual-pretraining
    * recipe: sampling weight ∝ n_s^α, α < 1 up-weights small strata —
    * α = 0.5 is the common "temperature 2" setting): integer per-stratum
    * QUOTAS `floor(total · n_s^α / Σ_t n_t^α)` (capped at the stratum
    * size), filled with each stratum's hash-smallest keys. Unlike
    * [[mixture]] (caller-provided weights, rate-based keep) the weights
    * derive from the observed sizes and the result is an exact count per
    * stratum.
    *
    * Scale/portability shape: stratum sizes are one hash aggregate to a
    * |strata|-row frame; the normalizer Σ n^α is ROUNDED to 6 decimals
    * before use so the quota integers cannot flip on summation order;
    * the per-stratum cut is the [[sampleExactKPerGroup]] bounded heap
    * with k = max quota (one bounded driver read of the |strata|-row
    * quota frame — the IVF-fit precedent), trimmed per stratum by rank.
    * α = 0.5 (default) computes n^α as `sqrt` — IEEE-correctly-rounded,
    * so quotas are engine-exact; other α go through `pow`, whose last
    * bit is libm-dependent (fine in-engine, avoid on a cross-engine
    * gate).
    *
    * PRECONDITION: `keyCol` unique corpus-wide (semi-join contract of
    * [[sampleExactKPerGroup]]).
    */
  def temperatureMixture(
      df: DataFrame,
      groupCol: String,
      keyCol: String,
      totalTarget: Long,
      seed: String,
      alpha: Double = 0.5): DataFrame = {
    require(totalTarget > 0, "totalTarget must be positive")
    require(alpha > 0 && alpha <= 1, s"alpha must be in (0,1], got $alpha")
    def w(n: Column): Column =
      if (alpha == 0.5) sqrt(n.cast("double")) else pow(n.cast("double"), lit(alpha))
    val sizes = df.groupBy(col(groupCol).as("__g")).agg(count(lit(1)).as("__n"))
    val z = sizes.agg(round(sum(w(col("__n"))), 6).as("__z"))
    val quotas = sizes.crossJoin(broadcast(z))
      .select(
        col("__g"),
        least(col("__n"),
          floor(lit(totalTarget.toDouble) * w(col("__n")) / col("__z")).cast("bigint"))
          .as("__quota"))
    val maxQuota = quotas.agg(coalesce(max("__quota"), lit(0L))).head().getLong(0).toInt
    if (maxQuota <= 0) return df.limit(0)
    val scored = df.select(
      col(groupCol).as("__g"),
      (-hashUnit(col(keyCol), seed)).as("cosine"),
      col(keyCol).as("neighbor_id"))
    val picked = SimilaritySearch.topKPerKey(scored, "__g", maxQuota)
      .join(broadcast(quotas), "__g")
      .where(col("rank") <= col("__quota"))
      .select(col("neighbor_id").as("__pick"))
    df.join(broadcast(picked), col(keyCol) === col("__pick"), "left_semi")
  }

  /** Deterministic weighted sample of exactly `k` rows (Efraimidis &
    * Spirakis A-ES): each row draws `u = hashUnit(key, seed)` and scores
    * `u^(1/w)`; the k largest scores win, so inclusion probability rises
    * with weight while membership stays a pure function of
    * (key, seed, weights) — retries and backfills pick the same rows.
    * Same bounded-heap shape as [[sampleExactK]]: map-side O(log k) heap
    * updates, ≤ k-entry partials, picked keys broadcast back as a semi
    * join. Rows with null/non-positive weight or null key are never
    * sampled (their score is null, which the heap excludes).
    *
    * PRECONDITION: `keyCol` values must be unique. The final left-semi
    * join keeps EVERY row sharing a picked key, and duplicate keys share
    * one hash draw — with duplicates the "exactly k rows" contract breaks
    * (more than k rows return) and the weighting is distorted. Dedup on
    * the key first if it can repeat.
    */
  def weightedSampleK(
      df: DataFrame,
      keyCol: String,
      weightCol: String,
      k: Int,
      seed: String): DataFrame = {
    require(k > 0, "k must be positive")
    val w = col(weightCol).cast("double")
    val score = when(w > 0.0, pow(hashUnit(col(keyCol), seed), lit(1.0) / w))
    val scored = df.select(
      lit(0).as("__g"),
      score.as("cosine"),
      col(keyCol).as("neighbor_id"))
    val picked = SimilaritySearch.topKPerKey(scored, "__g", k)
      .select(col("neighbor_id").as("__pick"))
    df.join(broadcast(picked), col(keyCol) === col("__pick"), "left_semi")
  }

  /** Deterministic train/validation/test split assignment: adds `split`,
    * the label of the cumulative-weight range `hashUnit(key, seed)` falls
    * into. A pure scan-side expression — the canonical reproducible ML
    * partitioning (a document's split never changes across runs, machines
    * or engines; group-level splits fall out of keying by the group id).
    * Weights are normalized; null keys get a null split (route them
    * explicitly rather than silently training on them). Prefer weights
    * that are exact binary fractions (0.75/0.125/0.125) when an external
    * system must reproduce the boundaries bit-for-bit.
    */
  def assignSplit(
      df: DataFrame,
      keyCol: String,
      splits: Seq[(String, Double)],
      seed: String): DataFrame = {
    require(splits.nonEmpty && splits.forall(_._2 > 0), "positive split weights required")
    val total = splits.map(_._2).sum
    val upperBounds = splits.dropRight(1)
      .scanLeft(0.0) { case (acc, (_, wt)) => acc + wt / total }.tail
    val u = hashUnit(col(keyCol), seed)
    val chain = upperBounds.zip(splits).foldRight(lit(splits.last._1)) {
      case ((ub, (name, _)), els) => when(u < ub, name).otherwise(els)
    }
    df.withColumn("split", when(u.isNull, lit(null).cast("string")).otherwise(chain))
  }

  /** Leakage-safe train/validation/test split: [[assignSplit]] keyed by
    * the near-dup CLUSTER id instead of the document id, so a document
    * and all its near-duplicates land in the SAME split. Keying by doc id
    * leaks n−1 near-copies of every test document into train — the
    * classic eval-inflation bug dedup-aware splitting exists to prevent.
    * `pairs` is any verified near-dup pair frame (MinHash-LSH, SimHash,
    * embedding cosine); clustering is transitive
    * ([[ConnectedComponents.assignClusters]]). Output keeps every input
    * row plus `cluster_id` and `split`.
    */
  def leakageSafeSplit(
      docs: DataFrame,
      idCol: String,
      pairs: DataFrame,
      splits: Seq[(String, Double)],
      seed: String): DataFrame =
    assignSplit(
      ConnectedComponents.assignClusters(docs, idCol, pairs),
      "cluster_id", splits, seed)

  /** Top-k rows per group by a score column — the curation form (keep the
    * k best documents per source) of the bounded-heap aggregate
    * [[graft.expressions.TopKScoreId]]: map-side O(log k) heap updates,
    * ≤ k-entry partials shuffle, no per-group sort of the full corpus.
    */
  def topKPerGroup(
      df: DataFrame,
      groupCol: String,
      scoreCol: String,
      idCol: String,
      k: Int): DataFrame =
    SimilaritySearch.topKPerKey(
      df.select(col(groupCol),
        col(scoreCol).cast("double").as("cosine"),
        col(idCol).as("neighbor_id")),
      groupCol, k)
      .select(col(groupCol), col("neighbor_id").as(idCol),
        col("cosine").as(scoreCol), col("rank"))

  /** CCNet-style perplexity bucketing: score every document with the
    * corpus unigram LM ([[UnigramLm.meanLogProb]]) and split into
    * `nBuckets` equal-count quality tiers by rank — bucket 1 = most
    * fluent (highest mean log-prob ≈ lowest perplexity), the head/
    * middle/tail cut CCNet trains on. Ranking compares the score ROUNDED
    * to 6 decimals with id ties (the q_e19 argmax discipline: raw-double
    * ordering lets last-bit noise flip a boundary doc between engines).
    *
    * Output: `(idCol, n_tokens, mean_logprob, bucket)`.
    *
    * Scale note: `ntile` is a GLOBAL window — a single-task sort over
    * the one-row-per-document score frame. That is CCNet's own shape (it
    * sorts the corpus by perplexity once), fine up to ~10⁸ docs; beyond
    * that, cut at score thresholds from approx percentiles instead and
    * accept the approximate tier boundary.
    */
  def perplexityBuckets(
      docs: DataFrame,
      idCol: String,
      textCol: String,
      nBuckets: Int = 3): DataFrame = {
    require(nBuckets >= 2, "nBuckets must be >= 2")
    UnigramLm.meanLogProb(docs, idCol, textCol)
      .withColumn("bucket",
        ntile(nBuckets).over(
          Window.orderBy(round(col("mean_logprob"), 6).desc, col(idCol))))
  }
}
