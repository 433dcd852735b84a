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

  test("overlapFraction grades partial quoting; exact copy scores 1.0; clean 0.0") {
    import spark.implicits._
    val probes = Seq((0L, "what is the capital of france paris obviously")).toDF("doc_id", "text")
    val corpus = Seq(
      // exact copy: every shingle hits → fraction 1.0
      (1L, "what is the capital of france paris obviously"),
      // quotes the probe once inside a longer page → strictly between 0 and 1
      (2L, "intro text here what is the capital of france paris obviously and more commentary follows here"),
      // clean → 0.0
      (3L, "completely unrelated content about gardening and soil preparation")
    ).toDF("doc_id", "text")
    val out = Decontamination
      .overlapFraction(corpus, probes, "doc_id", "text", k = 4)
      .select("doc_id", "n_shingles", "n_hits", "overlap_fraction")
      .collect()
      .map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2), r.getDouble(3))))
      .toMap
    val (s1, h1, f1) = out(1L)
    assert(s1 === 5L && h1 === 5L && f1 === 1.0) // 8 tokens, k=4 → 5 shingles
    val (s2, h2, f2) = out(2L)
    assert(h2 === 5L && f2 === h2.toDouble / s2 && f2 > 0.0 && f2 < 1.0)
    assert(out(3L)._3 === 0.0)
    // fraction consistency with flagOverlap's hit counts
    val flags = Decontamination.flagOverlap(corpus, probes, "doc_id", "text", k = 4)
      .select("doc_id", "n_hits").collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    out.foreach { case (id, (_, h, _)) => assert(h === flags(id)) }
  }
}
