package graft.operators

import graft.SparkSpec

class HtmlExtractSpec extends SparkSpec {
  import spark.implicits._

  private def blockRows(html: String, minChars: Int = 25,
      maxLink: Double = 0.33) =
    HtmlExtract.blocks(
      Seq((1L, html)).toDF("doc_id", "html"), "doc_id", "html",
      minChars, maxLink)
      .orderBy("block_idx")
      .select("block_text", "n_chars", "n_words", "n_link_chars", "is_content")
      .as[(String, Int, Int, Int, Boolean)].collect().toSeq

  test("script/style/comment subtrees vanish; tags strip; blocks split") {
    val html =
      """<html><head><title>T</title><style>p { color: red }</style>
        |<script type="text/javascript">var x = "<p>not text</p>";</script>
        |</head><body><!-- hidden <p>comment</p> -->
        |<p>First paragraph with plenty of real content here.</p>
        |<div>Second <b>block</b> also has enough words to be content.</div>
        |</body></html>""".stripMargin
    val got = blockRows(html)
    assert(got.map(_._1) === Seq(
      "T",
      "First paragraph with plenty of real content here.",
      "Second block also has enough words to be content."))
    assert(got.map(_._5) === Seq(false, true, true))
    // inline <b> did not split the block; its tags became spaces then
    // collapsed, so word counts see through markup
    assert(got(2)._3 === 9)
  }

  test("link density classifies nav/footer as boilerplate") {
    val html =
      "<nav><a href='/'>Home</a> <a href='/a'>About</a> <a href='/c'>Contact" +
        "</a></nav>" +
        "<p>A genuine article paragraph long enough to clear the floor, " +
        "with one <a href='x'>inline link</a> inside it.</p>" +
        "<footer><a href='/t'>Terms of service</a> and also " +
        "<a href='/p'>privacy policy page</a></footer>"
    val got = blockRows(html)
    assert(got.size === 3)
    val nav = got(0); val art = got(1); val foot = got(2)
    assert(nav._1 === "Home About Contact")
    // every nav char is anchor text
    assert(nav._4 === nav._2 - 2 && !nav._5)
    assert(art._5, "article paragraph must be content")
    assert(art._4 === "inline link".length)
    assert(!foot._5, "link-heavy footer must be boilerplate")
  }

  test("entities decode (amp last); double-escapes decode one level") {
    val html = "<p>Fish &amp; chips &lt;tag&gt; &quot;q&quot; &#39;a&#39; " +
      "x&nbsp;y literal &amp;lt; stays</p>"
    val got = blockRows(html, minChars = 1)
    assert(got.head._1 ===
      "Fish & chips <tag> \"q\" 'a' x y literal &lt; stays")
  }

  test("malformed unclosed tag stays literal; marker chars are scrubbed") {
    val got = blockRows("<p>ok text before</p><foo junk trails here", 1)
    assert(got.map(_._1) === Seq("ok text before", "<foo junk trails here"))
    val got2 = blockRows("<p>abcd</p>", 1)
    assert(got2.map(_._1) === Seq("abcd"))
  }

  test("extract joins content blocks in order and counts drops") {
    val html = "<nav><a href='/'>Home</a><a href='/b'>B</a></nav>" +
      "<p>First real paragraph with enough characters in it.</p>" +
      "<p>tiny</p>" +
      "<p>Second real paragraph, also clearing the length floor.</p>"
    val got = HtmlExtract.extract(
      Seq((7L, html)).toDF("doc_id", "html"), "doc_id", "html")
      .as[(Long, String, Long, Long)].collect().toSeq
    assert(got === Seq((7L,
      "First real paragraph with enough characters in it.\n" +
        "Second real paragraph, also clearing the length floor.",
      2L, 2L)))
  }

  test("block tag nested inside an anchor: unbalanced markers count as text") {
    // documented boundary: the <div> splits the anchor's markers across
    // blocks; unbalanced markers never match the link-segment pattern,
    // so the mass counts as plain text (undercounts link density)
    val got = blockRows(
      "<p>before text stays intact here</p>" +
        "<a href='/x'><div>inside the anchor division</div></a>" +
        "<p>after text also stays intact</p>", 1)
    assert(got.map(_._1) === Seq(
      "before text stays intact here",
      "inside the anchor division",
      "after text also stays intact"))
    assert(got(1)._4 === 0) // no balanced segment -> zero link chars
  }

  test("blocksClassified: good needs length AND link-sparsity AND stop density") {
    val html =
      "<p>The point of this test is that it should read like prose and " +
        "the words in it are mostly the common ones.</p>" + // good
      "<div><a href='/a'>Home</a> <a href='/b'>Products</a> " +
        "<a href='/c'>Contact us for more details today</a></div>" + // bad: links
      "<p>short bit</p>" + // short
      "<p>XGBoost CUDA kernels: fp16 matmul latency 3ms throughput " +
        "9000qps batchsize 128 quantization int8 sparsity 0.93</p>" // bad: stops
    val got = HtmlExtract.blocksClassified(
      Seq((1L, html)).toDF("doc_id", "html"), "doc_id", "html")
      .orderBy("block_idx")
      .select("blk_class", "n_stop_words")
      .as[(String, Int)].collect().toSeq
    assert(got.map(_._1) === Seq("good", "bad", "short", "bad"))
    assert(got(0)._2 > 5)  // prose is stopword-rich
    assert(got(3)._2 <= 1) // the spec sheet has (almost) none
  }

  test("degenerate inputs: null html, empty html, all-boilerplate doc") {
    val df = Seq(
      (1L, null.asInstanceOf[String]),
      (2L, ""),
      (3L, "<nav><a href='/'>Home</a></nav>")).toDF("doc_id", "html")
    assert(HtmlExtract.blocks(df, "doc_id", "html")
      .filter($"doc_id" < 3).count() === 0L)
    // extract is TOTAL: zero-block docs (null/empty html) still come
    // back, with empty text and zero block counts (the q_f15 oracle's
    // LEFT-JOIN semantics, now the operator contract)
    val ex = HtmlExtract.extract(df, "doc_id", "html")
      .as[(Long, String, Long, Long)].collect().toSeq.sortBy(_._1)
    assert(ex === Seq((1L, "", 0L, 0L), (2L, "", 0L, 0L), (3L, "", 0L, 1L)))
  }
}
