package graft.operators

import graft.SparkSpec

class BpeSpec extends SparkSpec {
  import spark.implicits._

  test("learnMerges: hand-computed 3 rounds incl. greedy overlap and tie-break") {
    // vocabulary: aaaa×2, aab×1, banana×3
    // round 1 pairs: (a,a)=7 (a,n)=6 (n,a)=6 (b,a)=3 (a,b)=1 → (a,a)
    // round 2 (after aaaa→[aa,aa], aab→[aa,b]): (a,n)=6 ties (n,a)=6 →
    //   lexicographic left wins → (a,n)
    // round 3 (banana→[b,an,an,a]): (an,a)=(an,an)=(b,an)=3 → (an,a)
    val docs = Seq("aaaa AAAA", "aab banana", "banana  banana").toDF("text")
    val got = Bpe.learnMerges(docs, "text", rounds = 3)
      .orderBy("round").collect()
      .map(r => (r.getInt(0), r.getString(1), r.getString(2), r.getLong(3)))
    assert(got.toSeq === Seq((1, "a", "a", 7L), (2, "a", "n", 6L), (3, "an", "a", 3L)))
  }

  test("learnMerges: overlap parity — aaaa merges to [aa,aa], aaa to [aa,a]") {
    // after round 1 on a's-only vocabulary, the only round-2 pair counts
    // are over the greedily-merged symbols: aaaa→(aa,aa), aaa→(aa,a),
    // aaaaa→(aa,aa),(aa,a)
    val docs = Seq("aaaa aaa aaaaa").toDF("text")
    val got = Bpe.learnMerges(docs, "text", rounds = 2)
      .orderBy("round").collect()
      .map(r => (r.getInt(0), r.getString(1), r.getString(2), r.getLong(3)))
    // round 1: (a,a) appears 3+2+4 = 9 times
    assert(got(0) === ((1, "a", "a", 9L)))
    // round 2 pairs: (aa,aa)=2 [from aaaa, aaaaa], (aa,a)=2 [aaa, aaaaa]
    // → tie on count, (aa,a) < (aa,aa) lexicographically
    assert(got(1) === ((2, "aa", "a", 2L)))
  }

  test("compressionStats: hand-computed totals on the toy corpus") {
    // after 3 merges: aaaa=[aa,aa] aab=[aa,b] banana=[b,an,ana]
    // words 6, chars 2·4+3+3·6=29, tokens 2·2+2+3·3=15, vocab {aa,b,an,ana}
    val docs = Seq("aaaa AAAA", "aab banana", "banana  banana").toDF("text")
    val r = Bpe.compressionStats(docs, "text", rounds = 3).head()
    assert(r.getInt(0) === 3)
    assert(r.getLong(1) === 6L && r.getLong(2) === 29L && r.getLong(3) === 15L)
    assert(r.getLong(4) === 4L)
    assert(r.getDouble(5) === 29.0 / 15.0 && r.getDouble(6) === 2.5)
  }

  test("applyMerges: scan-side inference ≡ training application, hand cases") {
    import org.apache.spark.sql.functions.col
    // the toy corpus's learned merges: (a,a), (a,n), (an,a)
    val merges = Seq(("a", "a"), ("a", "n"), ("an", "a"))
    val docs = Seq(
      (1L, "aaaa AAAA"), (2L, "aab banana"), (3L, "banana  banana"),
      (4L, ""), (5L, "aaa x")).toDF("doc_id", "text")
    val toks = docs
      .select(col("doc_id"), Bpe.applyMerges(col("text"), merges).as("t"))
      .collect()
      .map(r => r.getLong(0) -> r.getSeq[scala.collection.Seq[String]](1).map(_.toSeq))
      .toMap
    assert(toks(1L) === Seq(Seq("aa", "aa"), Seq("aa", "aa")))
    assert(toks(2L) === Seq(Seq("aa", "b"), Seq("b", "an", "ana")))
    assert(toks(3L) === Seq(Seq("b", "an", "ana"), Seq("b", "an", "ana")))
    assert(toks(4L) === Seq.empty, "empty text → no words")
    // self-pair greedy parity: aaa → [aa, a]; untouched word survives
    assert(toks(5L) === Seq(Seq("aa", "a"), Seq("x")))
    // tokenizationSummary digest is order-sensitive: len·(31·wi + si)
    val sum5 = Bpe.tokenizationSummary(
      docs.filter(col("doc_id") === 5L), "doc_id", "text", merges).head()
    // words [aa,a],[x]: digest = 2·(31+1) + 1·(31+2) + 1·(62+1) = 160
    assert(sum5.getInt(1) === 2 && sum5.getLong(2) === 3L && sum5.getLong(3) === 160L)
    val sum4 = Bpe.tokenizationSummary(
      docs.filter(col("doc_id") === 4L), "doc_id", "text", merges).head()
    assert(sum4.getInt(1) === 0 && sum4.getLong(2) === 0L && sum4.getLong(3) === 0L)
  }

  test("tokenizationSummaryByVocab ≡ scan-side tokenizationSummary, row for row") {
    import org.apache.spark.sql.functions.col
    val merges = Seq(("a", "a"), ("a", "n"), ("an", "a"))
    val docs = Seq(
      (1L, "aaaa AAAA"), (2L, "aab banana"), (3L, "banana  banana"),
      (4L, ""), (5L, "aaa x"), (6L, "banana aaaa aab aaa")).toDF("doc_id", "text")
    val scanSide = Bpe.tokenizationSummary(docs, "doc_id", "text", merges)
      .orderBy("doc_id").collect().map(_.toSeq).toSeq
    val byVocab = Bpe.tokenizationSummaryByVocab(docs, "doc_id", "text", merges)
      .orderBy("doc_id").collect().map(_.toSeq).toSeq
    assert(byVocab === scanSide)
  }

  test("property: applyMerges token totals ≡ compressionStats on random corpora") {
    import org.apache.spark.sql.functions.{col, sum => fsum}
    val rnd = new scala.util.Random(20260814L)
    (1 to 3).foreach { _ =>
      val corpus = (1 to 12).map { i =>
        (i.toLong,
          Seq.fill(rnd.nextInt(6) + 1)(
            Seq.fill(rnd.nextInt(6) + 1)(('a' + rnd.nextInt(3)).toChar).mkString)
            .mkString(" "))
      }
      val docs = corpus.toDF("doc_id", "text")
      val merges = Bpe.learnMerges(docs, "text", rounds = 3)
        .orderBy("round").collect()
        .map(r => (r.getString(1), r.getString(2))).toSeq
      val streamedTotal = Bpe.tokenizationSummary(docs, "doc_id", "text", merges)
        .agg(fsum(col("n_tokens"))).head().getLong(0)
      val trained = Bpe.compressionStats(docs, "text", rounds = 3).head()
      assert(streamedTotal === trained.getAs[Long]("total_tokens"),
        s"inference-path token total must equal the training frame's on $corpus")
    }
  }

  test("property: learnMerges matches a sequential reference BPE on random corpora") {
    // reference: plain sequential Scala BPE — count weighted adjacent
    // pairs, argmax under (count desc, left, right), leftmost-greedy
    // rewrite, repeat
    def referenceMerges(
        words: Map[String, Long], rounds: Int): Seq[(Int, String, String, Long)] = {
      var syms: Map[Vector[String], Long] =
        words.groupMapReduce(w => w._1.split("").toVector)(_._2)(_ + _)
      val out = Seq.newBuilder[(Int, String, String, Long)]
      var r = 1
      var done = false
      while (r <= rounds && !done) {
        val counts = syms.toSeq.flatMap { case (s, wc) =>
          s.zip(s.tail).map(p => p -> wc)
        }.groupMapReduce(_._1)(_._2)(_ + _)
        if (counts.isEmpty) done = true
        else {
          val ((a, b), c) = counts.minBy { case ((a, b), c) => (-c, a, b) }
          out += ((r, a, b, c))
          def rewrite(s: Vector[String]): Vector[String] = {
            val buf = Vector.newBuilder[String]
            var i = 0
            while (i < s.length) {
              if (i + 1 < s.length && s(i) == a && s(i + 1) == b) {
                buf += (a + b); i += 2
              } else { buf += s(i); i += 1 }
            }
            buf.result()
          }
          syms = syms.toSeq.map { case (s, wc) => rewrite(s) -> wc }
            .groupMapReduce(_._1)(_._2)(_ + _)
        }
        r += 1
      }
      out.result()
    }
    val wordGen = org.scalacheck.Gen.nonEmptyListOf(
      org.scalacheck.Gen.oneOf("a", "b", "ab", "ba", "aab", "abab", "aaaa",
        "bbb", "aba", "baab")).map(_.take(12))
    val seed = org.scalacheck.rng.Seed(42L)
    var s = seed
    (1 to 8).foreach { _ =>
      val words = wordGen.pureApply(org.scalacheck.Gen.Parameters.default, s)
      s = s.next
      val corpus = Seq(words.mkString(" ")).toDF("text")
      val got = Bpe.learnMerges(corpus, "text", rounds = 4)
        .orderBy("round").collect()
        .map(r => (r.getInt(0), r.getString(1), r.getString(2), r.getLong(3)))
        .toSeq
      val wc = words.groupMapReduce(identity)(_ => 1L)(_ + _)
      assert(got === referenceMerges(wc, 4), s"corpus: ${words.mkString(" ")}")
    }
  }

  test("batched: disjoint top pairs merge in ONE driver round, bit-equal to sequential") {
    // (a,b)=5 (c,d)=4 (e,f)=3 — pairwise symbol-disjoint, distinct counts
    val docs = Seq(Seq.fill(5)("ab") ++ Seq.fill(4)("cd") ++ Seq.fill(3)("ef"))
      .map(_.mkString(" ")).toDF("text")
    val got = Bpe.learnMergesBatched(docs, "text", totalMerges = 3, batchSize = 3)
      .orderBy("round").collect()
      .map(r => (r.getInt(0), r.getInt(1), r.getString(2), r.getString(3), r.getLong(4)))
    assert(got.toSeq === Seq(
      (1, 1, "a", "b", 5L), (2, 1, "c", "d", 4L), (3, 1, "e", "f", 3L)),
      "all three merges in batch_round 1")
    val seqR = Bpe.learnMerges(docs, "text", rounds = 3)
      .orderBy("round").collect()
      .map(r => (r.getInt(0), r.getString(1), r.getString(2), r.getLong(3)))
    assert(got.map(t => (t._1, t._3, t._4, t._5)).toSeq === seqR.toSeq)
  }

  test("batched: interacting pairs truncate the batch; self-pairs close it") {
    // (a,b)=5 and (b,c)=4 share b → batch 1 = {(a,b)} only
    val inter = Seq((Seq.fill(5)("ab") ++ Seq.fill(4)("bc")).mkString(" ")).toDF("text")
    val gi = Bpe.learnMergesBatched(inter, "text", totalMerges = 2, batchSize = 3)
      .orderBy("round").collect()
      .map(r => (r.getInt(0), r.getInt(1), r.getString(2), r.getString(3)))
    assert(gi.toSeq === Seq((1, 1, "a", "b"), (2, 2, "b", "c")),
      "sharing pair must wait for the next driver round")
    // tie at the stop count: (a,b)=4, (a,e)=4 (shares a, stop), (c,d)=4
    // — (c,d) ties the stop count so it must NOT ride in batch 1
    val tie = Seq((Seq.fill(4)("ab") ++ Seq.fill(4)("ae") ++ Seq.fill(4)("cd"))
      .mkString(" ")).toDF("text")
    val gt = Bpe.learnMergesBatched(tie, "text", totalMerges = 3, batchSize = 3)
      .orderBy("round").collect()
      .map(r => (r.getInt(0), r.getInt(1), r.getString(2), r.getString(3)))
    assert(gt.map(t => (t._3, t._4)).toSeq === Seq(("a", "b"), ("a", "e"), ("c", "d")))
    // (c,d) TIES the stop count in round-trip 1, so it must be excluded
    // from batch 1 (a created pair could beat it lexicographically); in
    // round-trip 2 it legitimately batches with the now-unblocked (a,e)
    assert(gt.map(_._2).toSeq === Seq(1, 2, 2), "tie truncation splits batch 1")
    // self-pair closes its batch: (a,a)=5 then disjoint (b,c)=4 must wait
    val self = Seq((Seq.fill(5)("aa") ++ Seq.fill(4)("bc")).mkString(" ")).toDF("text")
    val gs = Bpe.learnMergesBatched(self, "text", totalMerges = 2, batchSize = 3)
      .orderBy("round").collect()
      .map(r => (r.getInt(0), r.getInt(1), r.getString(2), r.getString(3)))
    assert(gs.toSeq === Seq((1, 1, "a", "a"), (2, 2, "b", "c")))
  }

  test("property: batched ≡ sequential reference on random corpora, any batch size") {
    def referenceMerges(
        words: Map[String, Long], rounds: Int): Seq[(Int, String, String, Long)] = {
      var syms: Map[Vector[String], Long] =
        words.groupMapReduce(w => w._1.split("").toVector)(_._2)(_ + _)
      val out = Seq.newBuilder[(Int, String, String, Long)]
      var r = 1
      var done = false
      while (r <= rounds && !done) {
        val counts = syms.toSeq.flatMap { case (s, wc) =>
          s.zip(s.tail).map(p => p -> wc)
        }.groupMapReduce(_._1)(_._2)(_ + _)
        if (counts.isEmpty) done = true
        else {
          val ((a, b), c) = counts.minBy { case ((a, b), c) => (-c, a, b) }
          out += ((r, a, b, c))
          def rewrite(s: Vector[String]): Vector[String] = {
            val buf = Vector.newBuilder[String]
            var i = 0
            while (i < s.length) {
              if (i + 1 < s.length && s(i) == a && s(i + 1) == b) {
                buf += (a + b); i += 2
              } else { buf += s(i); i += 1 }
            }
            buf.result()
          }
          syms = syms.toSeq.map { case (s, wc) => rewrite(s) -> wc }
            .groupMapReduce(_._1)(_._2)(_ + _)
        }
        r += 1
      }
      out.result()
    }
    val wordGen = org.scalacheck.Gen.nonEmptyListOf(
      org.scalacheck.Gen.oneOf("a", "b", "ab", "ba", "aab", "abab", "aaaa",
        "bbb", "aba", "baab", "cd", "dc", "xy"))
      .map(_.take(12))
    var s = org.scalacheck.rng.Seed(977L)
    (1 to 6).foreach { i =>
      val words = wordGen.pureApply(org.scalacheck.Gen.Parameters.default, s)
      s = s.next
      val corpus = Seq(words.mkString(" ")).toDF("text")
      val wc = words.groupMapReduce(identity)(_ => 1L)(_ + _)
      val want = referenceMerges(wc, 4)
      Seq(2, 3).foreach { bs =>
        val got = Bpe.learnMergesBatched(corpus, "text", totalMerges = 4, batchSize = bs)
          .orderBy("round").collect()
          .map(r => (r.getInt(0), r.getString(2), r.getString(3), r.getLong(4)))
          .toSeq
        assert(got === want.map(t => (t._1, t._2, t._3, t._4)),
          s"corpus: ${words.mkString(" ")} batchSize=$bs")
      }
    }
  }

  test("learnMerges stops early when the corpus runs out of pairs") {
    val docs = Seq("ab ab cd").toDF("text")
    val got = Bpe.learnMerges(docs, "text", rounds = 10)
      .orderBy("round").collect()
    // round 1 merges (a,b); round 2 merges (c,d); then no pairs remain
    assert(got.length === 2)
    assert(got(0).getString(1) === "a" && got(0).getString(2) === "b")
    assert(got(1).getString(1) === "c" && got(1).getString(2) === "d")
  }
}
