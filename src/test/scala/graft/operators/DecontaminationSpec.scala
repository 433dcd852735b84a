package graft.operators

import org.apache.spark.sql.functions._

import graft.SparkSpec

class DecontaminationSpec extends SparkSpec {
  import spark.implicits._

  private lazy val probes = Seq(
    (100L, "the quick brown fox jumps over the lazy dog")
  ).toDF("doc_id", "text")

  test("verbatim k-gram leakage is flagged; clean docs are not") {
    val corpus = Seq(
      // contains "quick brown fox jumps" verbatim
      (1L, "witness the quick brown fox jumps again and again today"),
      // shares words but no 4-token shingle
      (2L, "brown dog jumps over a quick lazy fox somewhere else"),
      (3L, "completely unrelated text about query engines and shuffles")
    ).toDF("doc_id", "text")
    val out = Decontamination
      .flagOverlap(corpus, probes, "doc_id", "text", k = 4)
      .select("doc_id", "n_hits", "contaminated")
      .collect().map(r => r.getLong(0) -> ((r.getLong(1), r.getBoolean(2)))).toMap
    assert(out(1L)._2 && out(1L)._1 >= 1)
    assert(out(2L) === ((0L, false)))
    assert(out(3L) === ((0L, false)))
    assert(out.size === 3) // every corpus row kept
  }

  test("an exact copy of a probe hits on (n_tokens - k + 1) shingles") {
    val corpus = Seq((7L, "the quick brown fox jumps over the lazy dog")).toDF("doc_id", "text")
    val out = Decontamination
      .flagOverlap(corpus, probes, "doc_id", "text", k = 4)
      .select("doc_id", "n_hits", "contaminated")
      .collect().head
    assert(out.getLong(1) === 6) // 9 tokens, k=4 → 6 distinct shingles
    assert(out.getBoolean(2))
  }

  test("probe set smaller than k still matches whole-text shingles") {
    val shortProbe = Seq((0L, "alpha beta")).toDF("doc_id", "text")
    val corpus = Seq((1L, "alpha beta"), (2L, "alpha beta gamma delta epsilon")).toDF("doc_id", "text")
    val out = Decontamination
      .flagOverlap(corpus, shortProbe, "doc_id", "text", k = 4)
      .select("doc_id", "n_hits", "contaminated")
      .collect().map(r => r.getLong(0) -> r.getBoolean(2)).toMap
    assert(out(1L)) // whole-text shingle "alpha beta" matches
    assert(!out(2L)) // 5 tokens → real 4-shingles, none equal "alpha beta"
  }
}
