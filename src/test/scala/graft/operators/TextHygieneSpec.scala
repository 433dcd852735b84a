package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.functions._

class TextHygieneSpec extends SparkSpec {
  import spark.implicits._

  private def cleanOne(text: String) =
    TextHygiene.clean(Seq((1L, text)).toDF("doc_id", "text"), "doc_id", "text")
      .as[(Long, String, Int, Int, Boolean, Boolean, Boolean, Boolean, Boolean)]
      .collect().head

  test("control chars scrub; tab/newline/cr survive") {
    val r = cleanOne("abc\td\ne\rfg")
    assert(r._2 === "abc\td\ne\rfg")
    assert(r._5 && !r._6 && !r._7 && !r._8 && r._9)
  }

  test("mojibake repairs: trigraphs, digraphs, and the NBSP/SHY members") {
    val r = cleanOne("caffÃ© â€“dashâ€” " +
      "â€œqâ€™ nÃ± " +
      "vÃ­ " + // Ã + SOFT HYPHEN -> í (repair precedes scrub)
      "lÃ ")   // Ã + NBSP -> à
    assert(r._2 === "caffé –dash— “q’ nñ ví là")
    assert(!r._5 && r._6 && !r._7 && !r._8 && r._9)
  }

  test("invisible scrub after repair: zero-widths drop, NBSP becomes space") {
    val r = cleanOne("a\u200Bb\u200Cc\u200D\uFEFFd e\u00ADf x\u00A0y")
    assert(r._2 === "abcd ef x y")
    assert(!r._6 && r._7 && r._9)
  }

  test("NFC composes NFD sequences; flags pinpoint the stage") {
    // e + COMBINING ACUTE, a + COMBINING GRAVE -> precomposed under NFC
    val r = cleanOne("e\u0301clair a\u0300 plain")
    assert(r._2 === "\u00E9clair \u00E0 plain")
    assert(r._3 === 16 && r._4 === 14)
    assert(!r._5 && !r._6 && !r._7 && r._8 && r._9)
  }

  test("clean ASCII text is unchanged with all flags false") {
    val r = cleanOne("plain ascii text, nothing to fix")
    assert(r._2 === "plain ascii text, nothing to fix")
    assert(!r._5 && !r._6 && !r._7 && !r._8 && !r._9)
  }

  test("null text treated as empty") {
    val r = cleanOne(null)
    assert(r._2 === "" && r._3 === 0 && !r._9)
  }

  test("utf8 lenient decode substitutes U+FFFD, never faults") {
    val bad = Array[Byte]('o'.toByte, 'k'.toByte, 0xC3.toByte, 'x'.toByte,
      0xFF.toByte, 'z'.toByte)
    val got = Seq(Tuple1(bad)).toDF("b")
      .select(org.apache.spark.sql.graft.bridge.column(
        graft.expressions.Utf8DecodeLenient(
          org.apache.spark.sql.graft.bridge.expression(col("b")))).as("s"))
      .as[String].collect().head
    assert(got === "ok�x�z")
  }
}
