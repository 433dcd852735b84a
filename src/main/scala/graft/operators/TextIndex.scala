package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.functions.{Hashing, TextAnalysis}

/** Persisted BM25 text index — the retrieval twin of the persisted
  * dedup/ANN indexes ([[DedupIndex]], [[AnnIndex]]): tokenize the corpus
  * ONCE, write postings + corpus stats, and serve keyword queries from
  * the index with no corpus scan and no fit parameters in scope.
  *
  * Layout: `postings/` is `(doc_id, dl, term, tf)` partitioned by
  * `bucket = md5Hash60(term) mod numBuckets` — query terms map to
  * buckets DRIVER-SIDE (the literal-model discipline), so the read
  * prunes to the query's partitions via directory elimination before
  * any row is touched; `stats/` is the one-row (n_docs, avgdl) frame.
  * The bucket hash is the engine-portable md5 prefix ([[Hashing]]), so
  * build and probe agree forever — a JVM re-implementation is
  * spec-pinned against the Spark column form.
  *
  * Scale shape: the build is q_t11's one tokenize scan + one (doc, term)
  * hash agg, written once; a query reads |query-term postings| rows,
  * computes df from them (complete: a term's postings live wholly in its
  * bucket), and scores with the exact [[Bm25]] expressions.
  */
object TextIndex {

  /** JVM twin of [[Hashing.md5Hash60]] for driver-side bucket routing of
    * literal query terms (first 15 hex chars of md5, parsed base-16).
    */
  def jvmMd5Hash60(s: String): Long = {
    val d = java.security.MessageDigest.getInstance("MD5")
      .digest(s.getBytes(java.nio.charset.StandardCharsets.UTF_8))
    java.lang.Long.parseLong(
      d.take(8).map(b => f"$b%02x").mkString.substring(0, 15), 16)
  }

  def build(
      docs: DataFrame,
      idCol: String,
      textCol: String,
      path: String,
      numBuckets: Int = 64): Unit = {
    require(numBuckets >= 1, "numBuckets must be >= 1")
    val toks = docs.select(
      col(idCol).as("doc_id"), TextAnalysis.tokens(col(textCol)).as("__tk"))
    toks
      .select(
        col("doc_id"), size(col("__tk")).cast("double").as("dl"),
        explode(col("__tk")).as("term"))
      .groupBy(col("doc_id"), col("dl"), col("term"))
      .agg(count(lit(1)).cast("double").as("tf"))
      .withColumn("bucket", pmod(Hashing.md5Hash60(col("term")), lit(numBuckets.toLong)))
      .write.mode("overwrite").partitionBy("bucket").parquet(s"$path/postings")
    toks
      .select(size(col("__tk")).cast("double").as("dl"))
      .agg(
        count(lit(1)).cast("double").as("n_docs"),
        (sum("dl") / count(lit(1))).as("avgdl"))
      .write.mode("overwrite").parquet(s"$path/stats")
  }

  /** BM25 scores for `queryTerms` served from the index at `path` —
    * same output contract as [[Bm25.score]]. The returned plan's scan
    * carries the bucket list as a PartitionFilter (callers can gate on
    * [[graft.sources.Layout.hasPartitionFilter]]).
    */
  def scoreFromIndex(
      spark: SparkSession,
      path: String,
      queryTerms: Seq[String],
      k1: Double = 1.2,
      b: Double = 0.75,
      numBuckets: Int = 64): DataFrame = {
    require(queryTerms.nonEmpty, "BM25 needs at least one query term")
    val buckets = queryTerms
      .map(t => java.lang.Math.floorMod(jvmMd5Hash60(t), numBuckets.toLong))
      .distinct
    val stats = spark.read.parquet(s"$path/stats")
    // select BY NAME before use: partitionBy moves `bucket` to the end of
    // the read-back schema (the DedupIndex lesson, PERF.md)
    val postings = spark.read.parquet(s"$path/postings")
      .where(col("bucket").isin(buckets: _*))
      .select(col("doc_id"), col("dl"), col("term"), col("tf"))
      .where(col("term").isin(queryTerms: _*))
    val df = postings.groupBy("term").agg(count(lit(1)).cast("double").as("df"))
    val idf = log(lit(1) + (col("n_docs") - col("df") + lit(0.5)) / (col("df") + lit(0.5)))
    val tfNorm = col("tf") * lit(k1 + 1) /
      (col("tf") + lit(k1) * (lit(1 - b) + lit(b) * col("dl") / col("avgdl")))
    postings
      .join(broadcast(df), "term")
      .crossJoin(broadcast(stats))
      .groupBy(col("doc_id"))
      .agg(
        count(lit(1)).cast("int").as("n_terms_matched"),
        sum(idf * tfNorm).as("bm25"))
  }
}
