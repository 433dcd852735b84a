package graft.operators

import graft.SparkSpec

class SentenceSplitSpec extends SparkSpec {
  import spark.implicits._

  private def run(text: String): Seq[String] =
    SentenceSplit.sentences(
      Seq((1L, text)).toDF("doc_id", "text"), "doc_id", "text")
      .orderBy("sent_idx").select("sentence").as[String].collect().toSeq

  test("terminators split; openers must be capital or digit") {
    assert(run("First one. Second one! Third one? 4th one.") ===
      Seq("First one.", "Second one!", "Third one?", "4th one."))
    // lower-case continuation after a dot is NOT a boundary
    assert(run("See fig. 9 vs. the baseline. next word stays attached") ===
      Seq("See fig. 9 vs. the baseline. next word stays attached"))
  }

  test("abbreviations and initials do not split") {
    assert(run("Dr. Smith met Mr. Jones. They left.") ===
      Seq("Dr. Smith met Mr. Jones.", "They left."))
    assert(run("J. K. Rowling wrote it. Everyone read it.") ===
      Seq("J. K. Rowling wrote it.", "Everyone read it."))
    assert(run("Use markers, e.g. commas. Or not, i.e. never. Done.") ===
      Seq("Use markers, e.g. commas.", "Or not, i.e. never.", "Done."))
    assert(run("Acme Inc. Ltd. was sold.") === Seq("Acme Inc. Ltd. was sold."))
  }

  test("quote-trailing terminators keep the quote left") {
    assert(run("He said \"stop.\" Then he left. (Really.) Yes.") ===
      Seq("He said \"stop.\"", "Then he left.", "(Really.)", "Yes."))
  }

  test("multiple terminators and counts") {
    val got = SentenceSplit.sentences(
      Seq((1L, "What?! Two words. One.")).toDF("doc_id", "text"),
      "doc_id", "text")
      .orderBy("sent_idx")
      .select("sentence", "n_chars", "n_words")
      .as[(String, Int, Int)].collect().toSeq
    assert(got === Seq(("What?!", 6, 1), ("Two words.", 10, 2), ("One.", 4, 1)))
  }

  test("abbreviations protected after newlines and tabs too") {
    assert(run("First line ends.\nDr. Smith continues. Done.") ===
      Seq("First line ends.\nDr. Smith continues.", "Done."))
  }

  test("degenerates: empty, null, whitespace-only") {
    assert(run("") === Seq())
    assert(run("   ") === Seq())
    assert(SentenceSplit.sentences(
      Seq((1L, null.asInstanceOf[String])).toDF("doc_id", "text"),
      "doc_id", "text").count() === 0L)
  }
}
