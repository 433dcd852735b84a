package graft.operators

import org.apache.spark.sql.functions._

import graft.SparkSpec

class SegmentDedupSpec extends SparkSpec {
  import spark.implicits._

  private def md5Of(s: String): String =
    java.security.MessageDigest.getInstance("MD5")
      .digest(s.getBytes("UTF-8")).map("%02x".format(_)).mkString

  test("known answers: first occurrence wins, full-dup doc disappears") {
    val docs = Seq(
      (1L, "a b c d"),       // segments: "a b", "c d"
      (2L, "a b x y"),       // "a b" claimed by doc 1 → keeps only "x y"
      (3L, "c d a b"),       // both claimed → doc absent from output
      (4L, "e f g")          // odd tail → "e f", "g"
    ).toDF("doc_id", "text")
    val got = NearDup.segmentDedup(docs, "doc_id", "text", segWords = 2)
      .orderBy("doc_id")
      .collect()
      .map(r => (r.getLong(0), r.getInt(1), r.getString(2)))
    assert(got === Array(
      (1L, 2, md5Of("a b c d")),
      (2L, 1, md5Of("x y")),
      (4L, 2, md5Of("e f g"))))
  }

  test("within-doc position breaks ties; repeated segment in one doc kept once") {
    val docs = Seq((1L, "p q p q r s")).toDF("doc_id", "text")
    val got = NearDup.segmentDedup(docs, "doc_id", "text", segWords = 2).collect()
    assert(got.length === 1)
    assert(got.head.getInt(1) === 2) // "p q" (first), "r s"
    assert(got.head.getString(2) === md5Of("p q r s"))
  }

  test("corpus invariant: every distinct segment survives exactly once") {
    val docs = graft.Tables.load(spark, sf(), "documents")
    val segWords = 20
    val words = when(trim(col("text")) === "", array().cast("array<string>"))
      .otherwise(split(trim(col("text")), "\\s+"))
    val allSegs = docs.select(col("doc_id"), words.as("__w"))
      .filter(size(col("__w")) > 0)
      .select(posexplode(expr(
        s"transform(sequence(0, (size(__w) + ${segWords - 1}) div $segWords - 1)," +
          s" i -> array_join(slice(__w, i * $segWords + 1, $segWords), ' '))")))
      .select(col("col").as("seg"))
    val distinctSegs = allSegs.distinct().count()
    val kept = NearDup.segmentDedup(docs, "doc_id", "text", segWords)
      .agg(sum("n_segments_kept")).collect().head.getLong(0)
    assert(kept === distinctSegs)
  }
}
