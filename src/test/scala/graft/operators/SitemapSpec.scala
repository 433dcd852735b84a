package graft.operators

import org.apache.spark.sql.functions._

import graft.SparkSpec

/** [[Sitemap]] — classification, index resolution scope, and the
  * robots composition edges the arithmetic gate (q_c33) only samples.
  */
class SitemapSpec extends SparkSpec {
  import spark.implicits._

  private def sm(rows: (String, String, String)*) =
    rows.toDF("host", "url", "body")

  test("urlset / sitemapindex / invalid classify; invalid yields no rows") {
    val f = Sitemap.frontier(sm(
      ("a.com", "https://a.com/s.xml",
        "<urlset><url><loc>https://a.com/p1</loc>" +
          "<lastmod>2024-01-02</lastmod></url>" +
          "<url><loc>https://a.com/p2</loc></url></urlset>"),
      ("a.com", "https://a.com/broken.xml", "<urlset><url><loc>x"),
      ("a.com", "https://a.com/notxml.xml", "hello not xml"),
      ("a.com", "https://a.com/empty.xml", "<urlset></urlset>")),
      "host", "url", "body")
      .orderBy("loc")
      .select("loc", "lastmod", "via_index")
      .as[(String, Option[String], Boolean)].collect().toSeq
    assert(f === Seq(
      ("https://a.com/p1", Some("2024-01-02"), false),
      ("https://a.com/p2", None, false)))
  }

  test("index marks via_index only for SAME-host referenced urlsets") {
    val f = Sitemap.frontier(sm(
      ("a.com", "https://a.com/sitemap.xml",
        "<sitemapindex><sitemap><loc>https://a.com/child.xml</loc>" +
          "</sitemap><sitemap><loc>https://b.com/child.xml</loc>" +
          "</sitemap></sitemapindex>"),
      ("a.com", "https://a.com/child.xml",
        "<urlset><url><loc>https://a.com/x</loc></url></urlset>"),
      // same url string but hosted under b.com's row — the a.com index
      // entry must NOT mark it (host is part of the join key)
      ("b.com", "https://b.com/child.xml",
        "<urlset><url><loc>https://b.com/y</loc></url></urlset>"),
      ("b.com", "https://b.com/direct.xml",
        "<urlset><url><loc>https://b.com/z</loc></url></urlset>")),
      "host", "url", "body")
      .select("host", "sitemap_url", "via_index")
      .distinct().as[(String, String, Boolean)].collect().toSet
    assert(f === Set(
      ("a.com", "https://a.com/child.xml", true),
      ("b.com", "https://b.com/child.xml", false),
      ("b.com", "https://b.com/direct.xml", false)))
  }

  test("governed frontier: path extraction + robots; bare-host loc = /") {
    val robots = Seq(("a.com", "User-agent: *\nDisallow: /\nAllow: /ok/\n"))
      .toDF("host", "robots")
    val f = Sitemap.governedFrontier(sm(
      ("a.com", "https://a.com/s.xml",
        "<urlset><url><loc>https://a.com/ok/page</loc></url>" +
          "<url><loc>https://a.com/no/page?q=1#f</loc></url>" +
          "<url><loc>https://a.com</loc></url></urlset>")),
      "host", "url", "body", robots, "host", "robots", "bot")
      .select("loc", "allowed", "matched_pattern")
      .as[(String, Boolean, Option[String])].collect()
      .map(r => r._1 -> ((r._2, r._3))).toMap
    assert(f("https://a.com/ok/page") === ((true, Some("/ok/"))))
    // query/fragment are not part of the robots path match
    assert(f("https://a.com/no/page?q=1#f") === ((false, Some("/"))))
    assert(f("https://a.com") === ((false, Some("/"))))
  }
}
