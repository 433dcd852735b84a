package graft.operators

import graft.SparkSpec

class DocRepetitionSpec extends SparkSpec {
  import spark.implicits._

  private def run(text: String, minLineChars: Int = 10) =
    DocRepetition.dedupLines(
      Seq((1L, text)).toDF("doc_id", "text"), "doc_id", "text", minLineChars)
      .as[(Long, String, Long, Long, Int, Double)].collect().head

  test("repeated substantial lines drop, first occurrence survives in place") {
    val nav = "Home | About | Contact us today"
    val text = Seq(nav, "First real paragraph line.", nav,
      "Second real paragraph line.", nav).mkString("\n")
    val r = run(text)
    assert(r._2 === Seq(nav, "First real paragraph line.",
      "Second real paragraph line.").mkString("\n"))
    assert(r._3 === 5L && r._4 === 3L)
    assert(r._6 === 0.4)
  }

  test("short lines are exempt: blanks and separators repeat freely") {
    val text = Seq("A substantial content line one.", "", "--",
      "A substantial content line two.", "", "--").mkString("\n")
    val r = run(text)
    assert(r._2 === text)
    assert(r._4 === r._3)
    assert(r._6 === 0.0)
  }

  test("threshold boundary: a line exactly at minLineChars dedups") {
    val ten = "abcdefghij" // 10 chars = default threshold -> NOT exempt
    val nine = "abcdefghi" // 9 chars -> exempt
    val r = run(Seq(ten, nine, ten, nine).mkString("\n"))
    assert(r._2 === Seq(ten, nine, nine).mkString("\n"))
  }

  test("empty and null text yield one kept empty line") {
    assert(run("")._2 === "")
    assert(run("")._3 === 1L)
    val r = DocRepetition.dedupLines(
      Seq((1L, null.asInstanceOf[String])).toDF("doc_id", "text"),
      "doc_id", "text")
      .as[(Long, String, Long, Long, Int, Double)].collect().head
    assert(r._2 === "" && r._3 === 1L && r._4 === 1L)
  }

  test("global dedup: cross-doc lines survive only at the smallest (doc, idx)") {
    val banner = "SUBSCRIBE TO OUR NEWSLETTER NOW"
    val docs = Seq(
      (3L, s"$banner\nunique third body line\n--"),
      (1L, s"$banner\nunique first body line\n--\n$banner"),
      (2L, s"unique second body line\n$banner\n--")).toDF("doc_id", "text")
    val got = DocRepetition.dedupLinesGlobal(docs, "doc_id", "text")
      .orderBy("doc_id")
      .as[(Long, String, Long, Long, Int, Double)].collect().toSeq
    // doc 1 keeps the banner (first occurrence is (1, 0)); its own
    // within-doc repeat at idx 3 also drops; docs 2 and 3 lose theirs
    assert(got.map(r => (r._1, r._2)) === Seq(
      (1L, s"$banner\nunique first body line\n--"),
      (2L, "unique second body line\n--"),
      (3L, "unique third body line\n--")))
    assert(got.map(_._4) === Seq(3L, 2L, 2L)) // kept counts
  }

  test("global dedup is total: a doc made entirely of seen lines survives") {
    val docs = Seq(
      (1L, "the only substantial line in this corpus"),
      (2L, "the only substantial line in this corpus")).toDF("doc_id", "text")
    val got = DocRepetition.dedupLinesGlobal(docs, "doc_id", "text")
      .orderBy("doc_id")
      .as[(Long, String, Long, Long, Int, Double)].collect().toSeq
    assert(got.map(r => (r._1, r._2, r._4)) === Seq(
      (1L, "the only substantial line in this corpus", 1L),
      (2L, "", 0L))) // present, empty — never silently dropped
  }

  test("leading/trailing whitespace differences are distinct lines") {
    val a = "A substantial content line."
    val r = run(Seq(a, "  " + a).mkString("\n"))
    // trimmed equality is NOT the key — exact line text is
    assert(r._2 === Seq(a, "  " + a).mkString("\n"))
  }
}
