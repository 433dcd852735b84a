package graft.functions

import org.apache.spark.sql.functions._

import graft.SparkSpec
import graft.functions.TextAnalysis._

class TextAnalysisSpec extends SparkSpec {
  import spark.implicits._

  private def one[T](c: org.apache.spark.sql.Column, text: String): T =
    Seq(text).toDF("t").select(c.as("r")).collect().head.getAs[T]("r")

  test("tokens handles empty / ragged whitespace") {
    assert(one[Seq[String]](tokens(col("t")), "") === Seq.empty)
    assert(one[Seq[String]](tokens(col("t")), "  A  b\tc ") === Seq("a", "b", "c"))
    assert(one[Int](tokenCount(col("t")), "one two three") === 3)
  }

  test("bpe-ish tokens split contractions, words, numbers, punct runs") {
    assert(one[Seq[String]](bpeIshTokens(col("t")), "don't stop, 42!!") ===
      Seq("don", "'t", "stop", ",", "42", "!!"))
  }

  test("langId picks the language with most stopword evidence") {
    assert(one[String](langId(col("t")), "the cat is on the mat and it was fine") === "en")
    assert(one[String](langId(col("t")), "der Hund ist nicht auf das Sofa und die Katze") === "de")
    assert(one[String](langId(col("t")), "le chat et les maisons du village qui ne dort pas") === "fr")
    assert(one[String](langId(col("t")), "el perro no come por la noche en su casa") === "es")
    assert(one[String](langId(col("t")), "你好 世界") === "zh")
    assert(one[String](langId(col("t")), "zzz qqq xyzzy") === "und")
  }

  test("sentence / syllable heuristics: known answers and floors") {
    assert(one[Int](sentenceCount(col("t")), "One. Two! Three?") === 3)
    // a run of terminators is one boundary; terminator-free text floors at 1
    assert(one[Int](sentenceCount(col("t")), "Wait... what?!") === 2)
    assert(one[Int](sentenceCount(col("t")), "no terminators here") === 1)
    // beau-ti-ful = 3 vowel groups; "rhythm"/"123" floor at 1 each
    assert(one[Int](syllableCount(col("t")), "beautiful") === 3)
    assert(one[Int](syllableCount(col("t")), "rhythm 123") === 2)
    assert(one[Int](syllableCount(col("t")), "") === 0)
  }

  test("fleschReadingEase: hand-computed score; empty text is NULL") {
    // "the cat sat." → 3 words, 1 sentence, 3 syllables:
    // 206.835 − 1.015·3 − 84.6·1 = 119.19
    val s = one[Double](fleschReadingEase(col("t")), "the cat sat.")
    assert(math.abs(s - (206.835 - 1.015 * 3 - 84.6)) < 1e-12)
    val r = Seq("").toDF("t").select(fleschReadingEase(col("t")).as("r")).collect().head
    assert(r.isNullAt(0))
    // monotonicity: polysyllabic prose scores harder (lower)
    val hard = one[Double](fleschReadingEase(col("t")),
      "interdisciplinary considerations necessitate comprehensive evaluation.")
    assert(hard < s)
  }

  test("punctRatio / meanTokenLen / stopwordRatio known answers") {
    assert(one[Double](punctRatio(col("t")), "a,b.") === 0.5)
    assert(one[Double](punctRatio(col("t")), "") === 0.0)
    assert(one[Double](meanTokenLen(col("t")), "ab abcd") === 3.0)
    assert(one[Double](stopwordRatio(col("t")), "the dog the cat") === 0.5)
  }

  test("repetition metrics known answers") {
    // "a a a b": top token a = 3/4; bigrams [a a, a a, a b] → 1 - 2/3
    assert(one[Double](topTokenShare(col("t")), "a a a b") === 0.75)
    assert(math.abs(one[Double](dupBigramFraction(col("t")), "a a a b") - (1.0 - 2.0 / 3)) < 1e-12)
    assert(one[Double](topTokenShare(col("t")), "") === 0.0)
    assert(one[Double](dupBigramFraction(col("t")), "solo") === 0.0)
    // 5 bigrams [x y, y x, x y, y x, x y], 2 distinct → 1 - 2/5
    assert(one[Double](dupBigramFraction(col("t")), "x y x y x y") === 0.6)
  }

  test("qualityScore stays in [0,1] and ranks clean text above junk") {
    val clean = "the quick brown fox jumps over the lazy dog and it was good to see"
    val junk = ";;;; !!! ### $$$ %%%"
    val qc = one[Double](qualityScore(col("t")), clean)
    val qj = one[Double](qualityScore(col("t")), junk)
    assert(qc >= 0.0 && qc <= 1.0 && qj >= 0.0 && qj <= 1.0)
    assert(qc > qj)
  }

  test("shingles known answers") {
    assert(one[Seq[String]](charShingles(col("t"), 3), "abcd") === Seq("abc", "bcd"))
    assert(one[Seq[String]](tokenShingles(col("t"), 2), "a b c") === Seq("a b", "b c"))
    assert(one[Seq[String]](tokenShingles(col("t"), 5), "a b") === Seq("a b")) // shorter than k
  }

  test("winnowing fingerprint: deterministic, identity-stable, edit-robust") {
    val base = "the quick brown fox jumps over the lazy dog again and again today"
    val edited = base.replace("lazy", "hazy")
    val df = Seq((1, base), (2, base), (3, edited)).toDF("id", "t")
      .select(col("id"), winnowingFingerprint(col("t")).as("fp"))
    val rows = df.collect().map(r => r.getInt(0) -> r.getSeq[Long](1)).toMap
    assert(rows(1) === rows(2)) // deterministic
    val inter = rows(1).toSet.intersect(rows(3).toSet).size.toDouble
    val uni = rows(1).toSet.union(rows(3).toSet).size.toDouble
    assert(inter / uni > 0.5, s"local edit should preserve most fingerprints ($inter/$uni)")
    assert(rows(1) !== rows(3))
  }

  test("PII redaction: emails/phones/ssns replaced with typed tags; counts match") {
    val df = Seq(
      (1L, "contact bob.smith+x@ex-ample.co.uk or 555-123-4567 today"),
      (2L, "ssn 123-45-6789 twice 123-45-6789"),
      (3L, "clean text with numbers 12345 and 1-2-3")).toDF("id", "text")
    val out = df.select(
      col("id"),
      TextAnalysis.redactPii(col("text")).as("red"),
      TextAnalysis.piiCounts(col("text")).as("c"))
      .collect().map(r => (r.getLong(0), r.getString(1), r.getStruct(2))).toSeq
    val byId = out.map(t => t._1 -> t).toMap
    assert(byId(1L)._2 === "contact [EMAIL] or [PHONE] today")
    assert(byId(1L)._3.getInt(0) === 1 && byId(1L)._3.getInt(1) === 1 && byId(1L)._3.getInt(2) === 0)
    assert(byId(2L)._2 === "ssn [SSN] twice [SSN]")
    assert(byId(2L)._3.getInt(2) === 2)
    assert(byId(3L)._2 === "clean text with numbers 12345 and 1-2-3")
    assert(byId(3L)._3.getInt(0) + byId(3L)._3.getInt(1) + byId(3L)._3.getInt(2) === 0)
  }

  test("normalizeText: lowercases, strips urls/emails/control chars, collapses whitespace") {
    val df = Seq(
      (1L, "  Visit HTTPS://Example.COM/a?b=1 or   mail Bob@Ex.io NOW  "),
      (2L, "tabs\tand\u0000nulls\u001fand  newlines\n\nhere"),
      (3L, ""),
      (4L, "already clean")).toDF("id", "text")
    val got = df.select(col("id"), TextAnalysis.normalizeText(col("text")).as("n"))
      .collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    assert(got(1L) === "visit or mail now")
    assert(got(2L) === "tabs and nulls and newlines here")
    assert(got(3L) === "")
    assert(got(4L) === "already clean")
  }

  test("canonicalizeUrl: case, port, slash, fragment, tracking params") {
    def canon(u: String): String =
      one[String](TextAnalysis.canonicalizeUrl(col("t")), u)
    // scheme+host lowercased; PATH case preserved
    assert(canon("HTTPS://WWW.Ex.COM/Articles/3") === "https://www.ex.com/Articles/3")
    // default port, trailing slash, fragment all dropped
    assert(canon("https://ex.com:443/a/") === "https://ex.com/a")
    assert(canon("https://ex.com/a#frag") === "https://ex.com/a")
    // tracking params stripped wherever they sit; genuine params keep order
    assert(canon("https://ex.com/a?utm_source=f&id=3&utm_campaign=x&b=2") ===
      "https://ex.com/a?id=3&b=2")
    assert(canon("https://ex.com/a?gclid=z") === "https://ex.com/a")
    assert(canon("https://ex.com/a?fbclid=z&q=1") === "https://ex.com/a?q=1")
    // all four collapse to one canonical form
    assert(
      Seq("HTTPS://Ex.com:443/p/?utm_source=x", "https://ex.com/p#f",
        "https://ex.com/p/", "https://ex.com/p")
        .map(canon).distinct === Seq("https://ex.com/p"))
    // query-only URL (no path), bare host with trailing slash
    assert(canon("https://ex.com?id=1") === "https://ex.com?id=1")
    assert(canon("https://ex.com/") === "https://ex.com")
  }
}
