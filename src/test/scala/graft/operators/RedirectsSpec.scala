package graft.operators

import graft.SparkSpec

/** [[Redirects]] — chain outcomes (ok at and under the budget,
  * dangling both ways, exact loop detection, too-deep), relative
  * Location resolution, and duplicate-capture dedup the arithmetic
  * gate (q_c37) only samples.
  */
class RedirectsSpec extends SparkSpec {
  import spark.implicits._

  private def resolve(maxHops: Int, rows: (String, Int, String)*) =
    Redirects.finalTargets(
      rows.toDF("url", "status", "location"),
      "url", "status", "location", maxHops)
      .orderBy("url")
      .select("url", "final_url", "n_hops", "status")
      .as[(String, String, Int, String)].collect().toSeq

  test("direct, one-hop, two-hop chains resolve ok") {
    val got = resolve(5,
      ("https://a.io/0", 301, "https://a.io/1"),
      ("https://a.io/1", 302, "/2"), // relative Location
      ("https://a.io/2", 200, null))
    assert(got === Seq(
      ("https://a.io/0", "https://a.io/2", 2, "ok"),
      ("https://a.io/1", "https://a.io/2", 1, "ok"),
      ("https://a.io/2", "https://a.io/2", 0, "ok")))
  }

  test("dangling: missing target vs 3xx without location") {
    val got = resolve(5,
      ("https://a.io/m", 301, "https://a.io/nowhere"),
      ("https://a.io/n", 308, null))
    assert(got === Seq(
      ("https://a.io/m", "https://a.io/nowhere", 1, "dangling"),
      ("https://a.io/n", "https://a.io/n", 0, "dangling")))
  }

  test("two-cycle detects as loop, not too-deep") {
    val got = resolve(5,
      ("https://a.io/p", 302, "https://a.io/q"),
      ("https://a.io/q", 302, "https://a.io/p"))
    assert(got === Seq(
      ("https://a.io/p", "https://a.io/q", 1, "loop"),
      ("https://a.io/q", "https://a.io/p", 1, "loop")))
  }

  test("budget: exactly maxHops is ok; maxHops+1 is too-deep") {
    val chain = Seq(
      ("https://a.io/0", 301, "https://a.io/1"),
      ("https://a.io/1", 301, "https://a.io/2"),
      ("https://a.io/2", 301, "https://a.io/3"),
      ("https://a.io/3", 200, null))
    val got = resolve(3, chain: _*)
    assert(got.head === (("https://a.io/0", "https://a.io/3", 3, "ok")))
    val got2 = resolve(2, chain: _*)
    assert(got2.head === (("https://a.io/0", "https://a.io/2", 2, "too-deep")))
  }

  test("duplicate captures of one url do not multiply chains") {
    val got = resolve(5,
      ("https://a.io/0", 301, "https://a.io/t"),
      ("https://a.io/t", 200, null),
      ("https://a.io/t", 200, null))
    assert(got.count(_._1 == "https://a.io/0") === 1)
  }

  test("self-redirect is an immediate loop") {
    val got = resolve(5, ("https://a.io/s", 301, "https://a.io/s"))
    assert(got === Seq(("https://a.io/s", "https://a.io/s", 0, "loop")))
  }
}
