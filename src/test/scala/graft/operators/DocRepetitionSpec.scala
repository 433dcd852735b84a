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

  test("leading/trailing whitespace differences are distinct lines") {
    val a = "A substantial content line."
    val r = run(Seq(a, "  " + a).mkString("\n"))
    // trimmed equality is NOT the key — exact line text is
    assert(r._2 === Seq(a, "  " + a).mkString("\n"))
  }
}
