package graft.operators

import graft.SparkSpec

class RobotsSpec extends SparkSpec {
  import spark.implicits._

  private val body =
    """# comment line
      |User-agent: graftbot
      |Disallow: /private/
      |Allow: /private/ok/
      |Disallow: /tmp
      |
      |User-agent: *
      |Disallow: /
      |""".stripMargin

  private val starOnly =
    """User-agent: alpha
      |User-agent: *
      |Disallow: /blocked/
      |Allow: /blocked/except/
      |Disallow:
      |""".stripMargin

  private def decide(agent: String, urls: Seq[(String, String)]) =
    Robots.decide(
      Seq(("a.com", body), ("b.com", starOnly)).toDF("host", "robots"),
      "host", "robots",
      urls.toDF("host", "path"), "host", "path", agent)
      .orderBy("host", "path")
      .as[(String, String, Boolean, Option[String], Option[Boolean])]
      .collect().toSeq

  test("exact agent group wins; longest match; Allow wins ties") {
    val got = decide("GraftBot", Seq(
      ("a.com", "/private/ok/page"),
      ("a.com", "/private/no"),
      ("a.com", "/tmpfile"),
      ("a.com", "/open/page")))
    assert(got.map(r => (r._2, r._3)) === Seq(
      ("/open/page", true),      // no match -> allowed
      ("/private/no", false),    // Disallow /private/
      ("/private/ok/page", true), // longer Allow overrides
      ("/tmpfile", false)))      // prefix match, no trailing slash needed
    assert(got.find(_._2 == "/private/ok/page").get._4 ===
      Some("/private/ok/"))
  }

  test("star group applies only when the agent has no exact group") {
    // graftbot has an exact group on a.com -> the * Disallow:/ ignored
    val a = decide("graftbot", Seq(("a.com", "/anything")))
    assert(a.head._3 === true)
    // otherbot has no exact group -> * applies
    val o = decide("otherbot", Seq(("a.com", "/anything")))
    assert(o.head._3 === false)
  }

  test("consecutive UA lines share a group; empty Disallow matches nothing") {
    val got = decide("alpha", Seq(
      ("b.com", "/blocked/page"),
      ("b.com", "/blocked/except/x"),
      ("b.com", "/free")))
    assert(got.map(r => (r._2, r._3)) === Seq(
      ("/blocked/except/x", true),
      ("/blocked/page", false),
      ("/free", true))) // the empty Disallow did NOT block everything
  }

  test("rules before any User-agent line are ignored (RFC: groupless)") {
    val orphan = "Disallow: /\nUser-agent: *\nDisallow: /only/"
    val got = Robots.decide(
      Seq(("c.com", orphan)).toDF("host", "robots"), "host", "robots",
      Seq(("c.com", "/anything"), ("c.com", "/only/x")).toDF("host", "path"),
      "host", "path", "anybot")
      .orderBy("path")
      .as[(String, String, Boolean, Option[String], Option[Boolean])]
      .collect().toSeq
    assert(got.map(r => (r._2, r._3)) ===
      Seq(("/anything", true), ("/only/x", false)))
  }

  test("host without robots rows: everything allowed") {
    val got = Robots.decide(
      Seq(("a.com", body)).toDF("host", "robots"), "host", "robots",
      Seq(("nowhere.com", "/x")).toDF("host", "path"), "host", "path",
      "graftbot")
      .as[(String, String, Boolean, Option[String], Option[Boolean])]
      .collect().toSeq
    assert(got === Seq(("nowhere.com", "/x", true, None, None)))
  }

  // ---- RFC 9309 wildcards (r15 VERDICT task #2) ----

  private val wildBody =
    """User-agent: *
      |Disallow: /*.pdf$
      |Disallow: /search*private
      |Allow: /search/public*private
      |Disallow: /exact$
      |Disallow: /a+b(c)
      |""".stripMargin

  private def decideWild(urls: Seq[String]) = Robots.decide(
    Seq(("w.com", wildBody)).toDF("host", "robots"), "host", "robots",
    urls.map(("w.com", _)).toDF("host", "path"), "host", "path", "anybot")
    .orderBy("path")
    .as[(String, String, Boolean, Option[String], Option[Boolean])]
    .collect().toSeq

  test("wildcards: trailing $ anchors at path end") {
    val got = decideWild(Seq("/doc.pdf", "/doc.pdf?x=1", "/exact", "/exact2"))
    assert(got.map(r => (r._2, r._3)) === Seq(
      ("/doc.pdf", false),      // matches /*.pdf$
      ("/doc.pdf?x=1", true),   // $ anchor: trailing query breaks it
      ("/exact", false),        // /exact$ matches exactly
      ("/exact2", true)))       // anchored, no prefix semantics
  }

  test("wildcards: mid-pattern * spans any sequence; precedence by pattern length") {
    val got = decideWild(Seq(
      "/search/x/private/1",          // Disallow /search*private (len 16)
      "/search/public/x/private/1"))  // Allow (len 22) outranks it
    assert(got.map(r => (r._2, r._3)) === Seq(
      ("/search/public/x/private/1", true),
      ("/search/x/private/1", false)))
    assert(got(0)._4 === Some("/search/public*private"))
  }

  test("wildcards: regex metacharacters in patterns stay literal") {
    val got = decideWild(Seq("/a+b(c)/page", "/aab(c)/page", "/doczpdf"))
    assert(got.map(r => (r._2, r._3)) === Seq(
      ("/a+b(c)/page", false), // literal +() prefix match
      ("/aab(c)/page", true),  // '+' is not a regex quantifier here
      ("/doczpdf", true)))     // '.' in *.pdf$ is literal, z doesn't match
  }

  test("meta: delay from the chosen group only, min across values, invalid stays null") {
    val b1 = "User-agent: graftbot\nCrawl-delay: 4\nCrawl-delay: 2\n" +
      "Disallow: /a/\n\nUser-agent: *\nCrawl-delay: 9\nDisallow: /\n"
    val b2 = "User-agent: *\nCrawl-delay: fast\nDisallow: /b/\n"
    val b3 = "User-agent: *\nDisallow: /c/\n"
    val got = Robots.meta(
      Seq(("x.com", b1), ("y.com", b2), ("z.com", b3))
        .toDF("host", "robots"),
      "host", "robots", "graftbot")
      .orderBy("host")
      .as[(String, Option[Int], Int, String)].collect().toSeq
    assert(got === Seq(
      ("x.com", Some(2), 0, ""),   // exact group; min(4, 2); star's 9 ignored
      ("y.com", None, 0, ""),      // non-numeric delay never becomes 0
      ("z.com", None, 0, "")))
  }

  test("meta: sitemaps are host-global and in file order; # starts a comment") {
    val b = "Sitemap: https://s.com/lead.xml\n" +
      "User-agent: graftbot\nDisallow: /d/\n" +
      "Sitemap: https://s.com/in-group.xml#frag\n" +
      "User-agent: *\nDisallow: /\nSitemap: https://s.com/tail.xml\n"
    val got = Robots.meta(
      Seq(("s.com", b)).toDF("host", "robots"), "host", "robots", "graftbot")
      .as[(String, Option[Int], Int, String)].collect().head
    assert(got._3 === 3)
    assert(got._4 === "https://s.com/lead.xml,https://s.com/in-group.xml," +
      "https://s.com/tail.xml")
  }

  test("decide preserves input multiplicity and extra frontier columns") {
    val urls = Seq(
      ("a.com", "/private/no", 101L),
      ("a.com", "/private/no", 102L), // duplicate (host, path), distinct id
      ("a.com", "/open", 103L)).toDF("host", "path", "url_id")
    val got = Robots.decide(
      Seq(("a.com", body)).toDF("host", "robots"), "host", "robots",
      urls, "host", "path", "graftbot")
      .select("url_id", "path", "allowed")
      .as[(Long, String, Boolean)].collect().toSeq.sortBy(_._1)
    assert(got === Seq(
      (101L, "/private/no", false),
      (102L, "/private/no", false),
      (103L, "/open", true)))
  }
}
