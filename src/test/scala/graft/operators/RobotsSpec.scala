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
}
