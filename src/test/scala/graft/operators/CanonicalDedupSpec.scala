package graft.operators

import graft.SparkSpec

/** [[CanonicalDedup]] — group keying, self-representative preference,
  * relative canonical resolution, and totality the arithmetic gate
  * (q_d25) only samples.
  */
class CanonicalDedupSpec extends SparkSpec {
  import spark.implicits._

  private def collapse(rows: (Long, String, String)*) =
    CanonicalDedup.collapse(
      rows.toDF("id", "url", "html"), "id", "url", "html")
      .orderBy("id")
      .as[(Long, String, String, Boolean, Boolean)]
      .collect().toSeq

  test("variants collapse onto the canonical target; target is kept") {
    val got = collapse(
      (1L, "https://s.io/p2?sess=9",
        "<link rel=\"canonical\" href=\"https://s.io/p\">"),
      (2L, "https://s.io/p", "<p>the target itself</p>"),
      (3L, "https://s.io/p/print",
        "<link rel='canonical' href='/p'>"), // relative canonical
      (4L, "https://s.io/other", "<p>unrelated</p>"))
    assert(got === Seq(
      (1L, "https://s.io/p2?sess=9", "https://s.io/p", false, false),
      (2L, "https://s.io/p", "https://s.io/p", true, true),
      (3L, "https://s.io/p/print", "https://s.io/p", false, false),
      (4L, "https://s.io/other", "https://s.io/other", true, true)))
  }

  test("group without its target keeps the smallest (url, id)") {
    val got = collapse(
      (7L, "https://s.io/b", "<link rel=canonical href=\"https://s.io/c\">"),
      (5L, "https://s.io/a", "<link rel=canonical href=\"https://s.io/c\">"))
    assert(got.filter(_._5).map(_._1) === Seq(5L))
    assert(got.forall(_._3 == "https://s.io/c"))
  }

  test("tracking-variant url IS the target after canonicalization") {
    val got = collapse(
      (1L, "https://s.io/p?utm_source=m", "<p>no canonical</p>"))
    // own group: url_canon == canonical_key == stripped form
    assert(got === Seq(
      (1L, "https://s.io/p", "https://s.io/p", true, true)))
  }

  test("null html is total: own group, kept") {
    val got = CanonicalDedup.collapse(
      Seq((9L, "https://s.io/x", null: String)).toDF("id", "url", "html"),
      "id", "url", "html")
      .as[(Long, String, String, Boolean, Boolean)].collect().toSeq
    assert(got === Seq(
      (9L, "https://s.io/x", "https://s.io/x", true, true)))
  }
}
