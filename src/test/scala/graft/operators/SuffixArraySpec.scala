package graft.operators

import scala.util.Random

import graft.SparkSpec

class SuffixArraySpec extends SparkSpec {
  import spark.implicits._

  /** Brute-force generalized suffix array: every (doc, off) sorted by
    * (suffix string, doc, off) — the oracle definition.
    */
  private def bruteSa(docs: Seq[(Long, String)]): Seq[(Long, Long, Long)] =
    docs.flatMap { case (d, t) =>
      (1 to t.length).map(o => (t.substring(o - 1), d, o.toLong))
    }.sorted.zipWithIndex.map { case ((_, d, o), i) => (i.toLong, d, o) }

  /** Brute-force duplicate L-window positions. */
  private def bruteDup(
      docs: Seq[(Long, String)], l: Int, crossDoc: Boolean): Set[(Long, Long)] = {
    val grams = docs.flatMap { case (d, t) =>
      (1 to t.length - l + 1).map(o => (t.substring(o - 1, o - 1 + l), d, o.toLong))
    }
    grams.groupBy(_._1).values
      .filter(g => g.size >= 2 && (!crossDoc || g.map(_._2).distinct.size >= 2))
      .flatten.map(g => (g._2, g._3)).toSet
  }

  private def seededDocs(n: Int, words: Int, seed: Int): Seq[(Long, String)] = {
    val r = new Random(seed)
    val vocab = Vector("row", "key", "scan", "join", "agg", "sort", "col")
    (0L until n.toLong).map { d =>
      (d, Seq.fill(words)(vocab(r.nextInt(vocab.size))).mkString(" "))
    }
  }

  test("suffix array equals the brute-force suffix sort, ties by doc") {
    // doc 2 duplicates doc 0's text exactly — every suffix ties cross-doc
    val docs = Seq((0L, "banana"), (1L, "bananas"), (2L, "banana"), (3L, ""))
    val got = SuffixArray.suffixArray(docs.toDF("doc_id", "text"), "doc_id", "text")
      .as[(Long, Long, Long)].collect().sortBy(_._1).toSeq
    assert(got === bruteSa(docs))
  }

  test("suffix array on a seeded word-salad corpus, 1 vs 16 partitions") {
    val docs = seededDocs(12, 30, seed = 7)
    val one = SuffixArray.suffixArray(
      docs.toDF("doc_id", "text").coalesce(1), "doc_id", "text")
      .as[(Long, Long, Long)].collect().sortBy(_._1).toSeq
    val many = SuffixArray.suffixArray(
      docs.toDF("doc_id", "text").repartition(16), "doc_id", "text")
      .as[(Long, Long, Long)].collect().sortBy(_._1).toSeq
    assert(one === bruteSa(docs))
    assert(many === one)
  }

  test("build stops at the window bound and tableFor picks floor(log2 L)") {
    val docs = Seq((0L, "a" * 100)).toDF("doc_id", "text")
    val ctx = SuffixArray.build(docs, "doc_id", "text", maxWindow = 40)
    // windows 1,2,4,8,16,32 — 64 exceeds maxWindow
    assert(ctx.tables.map(_._1) === Vector(1, 2, 4, 8, 16, 32))
    assert(ctx.tableFor(40)._1 === 32)
    assert(ctx.tableFor(1)._1 === 1)
    // asking for L=80 when 2*32 < 80 and the build did NOT cover the
    // corpus (maxLen 100) must fail loudly, not return garbage
    assert(!ctx.coversCorpus)
    intercept[IllegalArgumentException](SuffixArray.duplicateWindows(ctx, 80))
    // full build stops once the window covers maxLen+1 (101 -> 128)
    val full = SuffixArray.build(docs, "doc_id", "text")
    assert(full.tables.map(_._1) === Vector(1, 2, 4, 8, 16, 32, 64, 128))
    // baseWindow=8 skips the first three rounds
    val wide = SuffixArray.build(docs, "doc_id", "text", maxWindow = 40,
      baseWindow = 8)
    assert(wide.tables.map(_._1) === Vector(8, 16, 32))
    intercept[IllegalArgumentException](wide.tableFor(4))
  }

  test("baseWindow=8 dedup path matches brute grams incl. truncated tails") {
    // short docs (< 8 chars) and tail positions exercise the truncated
    // initial-key collisions that must never surface as candidates
    val docs = seededDocs(10, 25, seed = 29) ++ Seq((90L, "row key"), (91L, "key"))
    val ctx = SuffixArray.build(docs.toDF("doc_id", "text"), "doc_id", "text",
      maxWindow = 40, baseWindow = 8)
    for (l <- Seq(8, 13, 40)) {
      val got = SuffixArray.duplicateWindows(ctx, l)
        .as[(Long, Long)].collect().toSet
      assert(got === bruteDup(docs, l, crossDoc = true), s"L=$l")
    }
  }

  test("duplicate windows match brute-force grams, both crossDoc modes") {
    val docs = seededDocs(10, 25, seed = 13)
    val ctx = SuffixArray.build(docs.toDF("doc_id", "text"), "doc_id", "text",
      maxWindow = 12)
    for (crossDoc <- Seq(true, false); l <- Seq(4, 9, 12)) {
      val got = SuffixArray.duplicateWindows(ctx, l, crossDoc)
        .as[(Long, Long)].collect().toSet
      assert(got === bruteDup(docs, l, crossDoc), s"L=$l crossDoc=$crossDoc")
    }
  }

  test("spans merge overlapping windows into maximal islands") {
    // shared 12-char block at different offsets; L=8 windows inside it
    // must merge into ONE span per doc covering exactly the block
    val block = "shared block"
    val docs = Seq(
      (0L, "xx" + block + "yy"),
      (1L, "zzzzz" + block + "qq"))
    val ctx = SuffixArray.build(docs.toDF("doc_id", "text"), "doc_id", "text",
      maxWindow = 8)
    val spans = SuffixArray.duplicatedSpans(ctx, 8)
      .as[(Long, Long, Long, Long)].collect().sortBy(_._1).toSeq
    // block starts at off 3 (doc 0) and 6 (doc 1), 5 windows of L=8 each
    assert(spans === Seq((0L, 3L, 12L, 5L), (1L, 6L, 12L, 5L)))
  }

  test("repetition profile counts dup windows per length from one build") {
    val docs = seededDocs(8, 20, seed = 3)
    val ctx = SuffixArray.build(docs.toDF("doc_id", "text"), "doc_id", "text",
      maxWindow = 16)
    val got = SuffixArray.repetitionProfile(ctx, Seq(3, 8, 16))
      .as[(Long, Long, Long)].collect().sortBy(_._1).toSeq
    val want = Seq(3, 8, 16).map { l =>
      val dup = bruteDup(docs, l, crossDoc = true)
      (l.toLong, dup.size.toLong, dup.map(_._1).toSet.size.toLong)
    }
    assert(got === want)
  }

  test("degenerate inputs: empty corpus, all-empty texts, null text") {
    val empty = Seq.empty[(Long, String)].toDF("doc_id", "text")
    assert(SuffixArray.suffixArray(empty, "doc_id", "text").count() === 0L)
    val blank = Seq((0L, ""), (1L, null.asInstanceOf[String])).toDF("doc_id", "text")
    assert(SuffixArray.suffixArray(blank, "doc_id", "text").count() === 0L)
    val ctx = SuffixArray.build(blank, "doc_id", "text", maxWindow = 4)
    assert(SuffixArray.duplicateWindows(ctx, 2).count() === 0L)
  }

  test("empty docs mint no phantom positions at L=1 (unordered mode)") {
    // sequence(1, 0) evaluates DESCENDING as [1, 0]; without the len>0
    // guard each empty doc would contribute phantom offsets 0 and 1 that
    // collide with each other and pass the off+L-1<=len filter at L=1
    val docs = Seq((0L, ""), (1L, ""), (2L, null.asInstanceOf[String]),
      (3L, "ab"), (4L, "cd")).toDF("doc_id", "text")
    val ctx = SuffixArray.build(docs, "doc_id", "text",
      maxWindow = 1, baseWindow = 1)
    assert(SuffixArray.duplicateWindows(ctx, 1).count() === 0L)
    // a real shared char still reports — the guard only drops len=0 rows
    val docs2 = Seq((0L, ""), (1L, "a"), (2L, "a")).toDF("doc_id", "text")
    val ctx2 = SuffixArray.build(docs2, "doc_id", "text",
      maxWindow = 1, baseWindow = 1)
    val got = SuffixArray.duplicateWindows(ctx2, 1)
      .as[(Long, Long)].collect().toSet
    assert(got === Set((1L, 1L), (2L, 1L)))
  }
}
