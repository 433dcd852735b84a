package graft.operators

import graft.SparkSpec

/** [[HtmlMeta]] — attribute orders, quote forms, first-match rule,
  * entity/whitespace handling, and absence→NULL the arithmetic gate
  * (q_t45) only samples.
  */
class HtmlMetaSpec extends SparkSpec {
  import spark.implicits._

  private def meta(html: String) =
    HtmlMeta.meta(Seq((1L, html)).toDF("id", "html"), "id", "html")
      .as[(Long, Option[String], Option[String], Option[String],
        Option[String], Option[String])]
      .collect().head

  test("all fields, name-first, double quotes") {
    val m = meta(
      """<html lang="en"><head><title>My &amp; Doc</title>
        |<meta name="description" content="a summary here">
        |<link rel="canonical" href="https://ex.com/c">
        |<meta property="og:title" content="OG title"></head></html>""".stripMargin)
    assert(m === ((1L, Some("My & Doc"), Some("a summary here"),
      Some("https://ex.com/c"), Some("OG title"), Some("en"))))
  }

  test("content-first order and single quotes") {
    val m = meta(
      "<html LANG=de-AT><head>" +
        "<meta content='desc first' name='description'>" +
        "<link href='https://ex.com/k' rel='canonical'>" +
        "<meta content='og first' property='og:title'></head></html>")
    assert(m._3 === Some("desc first"))
    assert(m._4 === Some("https://ex.com/k"))
    assert(m._5 === Some("og first"))
    assert(m._6 === Some("de-AT"))
  }

  test("first match wins; title collapses whitespace") {
    val m = meta(
      "<title>  One\n  Two </title><title>Second</title>" +
        "<meta name=\"description\" content=\"first\">" +
        "<meta name=\"description\" content=\"second\">")
    assert(m._2 === Some("One Two"))
    assert(m._3 === Some("first"))
  }

  test("absent fields are NULL; other metas do not leak") {
    val m = meta(
      "<html><head><meta name=\"keywords\" content=\"k1,k2\">" +
        "<link rel=\"stylesheet\" href=\"/s.css\"></head></html>")
    assert(m === ((1L, None, None, None, None, None)))
  }

  test("null html is total") {
    val m = HtmlMeta
      .meta(Seq((1L, null: String)).toDF("id", "html"), "id", "html")
      .as[(Long, Option[String], Option[String], Option[String],
        Option[String], Option[String])]
      .collect().head
    assert(m === ((1L, None, None, None, None, None)))
  }
}
