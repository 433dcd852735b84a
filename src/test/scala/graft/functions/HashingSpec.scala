package graft.functions

import org.apache.spark.sql.functions._

import graft.SparkSpec
import graft.functions.Hashing._

class HashingSpec extends SparkSpec {
  import spark.implicits._

  test("jaccard known answers (set semantics)") {
    val df = Seq((Seq("a", "b", "c"), Seq("b", "c", "d"))).toDF("x", "y")
      .select(jaccard(col("x"), col("y")).as("j"))
    assert(df.collect().head.getDouble(0) === 0.5)
  }

  test("minhash: identical sets → identical signatures; estimate tracks exact jaccard") {
    val a = (1 to 40).map(i => s"sh$i")
    val b = (21 to 60).map(i => s"sh$i") // |∩|=20, |∪|=60 → J=1/3
    val df = Seq((1, a), (2, a), (3, b)).toDF("id", "sh")
      .select(col("id"), minHashSignature(col("sh"), 128).as("sig"))
    val sigs = df.collect().map(r => r.getInt(0) -> r.getSeq[Long](1)).toMap
    assert(sigs(1) === sigs(2))
    val est = sigs(1).zip(sigs(3)).count { case (x, y) => x == y }.toDouble / 128
    assert(math.abs(est - 1.0 / 3.0) < 0.15, s"minhash estimate $est vs exact 0.333")
  }

  test("estimatedJaccard column form agrees with manual slot count") {
    val a = (1 to 30).map(i => s"x$i")
    val b = (16 to 45).map(i => s"x$i")
    val df = Seq((a, b)).toDF("a", "b")
      .select(estimatedJaccard(
        minHashSignature(col("a"), 64), minHashSignature(col("b"), 64)).as("e"))
    val e = df.collect().head.getDouble(0)
    assert(e >= 0.0 && e <= 1.0)
  }

  test("band keys: equal signatures share all bands, disjoint share none (whp)") {
    val a = (1 to 40).map(i => s"sh$i")
    val c = (100 to 140).map(i => s"sh$i")
    val df = Seq((1, a), (2, a), (3, c)).toDF("id", "sh")
      .select(col("id"),
        bandKeys(minHashSignature(col("sh"), 64), 16, 4).as("bk"))
    val keys = df.collect().map(r => r.getInt(0) ->
      r.getSeq[org.apache.spark.sql.Row](1).map(x => (x.getInt(0), x.getLong(1))).toSet).toMap
    assert(keys(1) === keys(2))
    assert(keys(1).intersect(keys(3)).isEmpty)
  }

  test("simhash: permutation-invariant-ish, near texts → small hamming") {
    val t1 = "alpha beta gamma delta epsilon zeta eta theta".split(" ").toSeq
    val t2 = t1.updated(3, "CHANGED") // one token differs
    val t3 = (1 to 8).map(i => s"completely$i")
    val df = Seq((1, t1), (2, t1), (3, t2), (4, t3)).toDF("id", "tk")
      .select(col("id"), simHash(col("tk")).as("h"))
    val hs = df.collect().map(r => r.getInt(0) -> r.getLong(1)).toMap
    assert(hs(1) === hs(2))
    def ham(x: Long, y: Long) = java.lang.Long.bitCount(x ^ y)
    assert(ham(hs(1), hs(3)) < ham(hs(1), hs(4)),
      s"one-token edit (${ham(hs(1), hs(3))}) should be closer than unrelated (${ham(hs(1), hs(4))})")
  }

  test("simhash block keys: pigeonhole guarantees a shared block at hamming<4") {
    val sims = Seq(
      (1, 0x0123456789abcdefL),
      (2, 0x0123456789abcdeeL), // hamming 1
      (3, 0x0123456789abcde0L)) // hamming 4 from id=1? (ef^e0 = 0f → 4 bits)
    val df = sims.toDF("id", "sim")
      .select(col("id"), simHashBlocks(col("sim"), 4).as("bk"))
    val keys = df.collect().map(r => r.getInt(0) ->
      r.getSeq[org.apache.spark.sql.Row](1).map(x => (x.getInt(0), x.getLong(1))).toSet).toMap
    assert(keys(1).intersect(keys(2)).nonEmpty)  // hamming 1 < 4 blocks → must collide
    assert(keys(1).intersect(keys(3)).size === 3) // differs only in block 0
  }

  test("native SimHash64 expression equals the HOF reference bit-exact") {
    // real documents: full tokenize pipeline, interpreted vs codegen'd
    val docs = graft.Tables.load(spark, sf(), "documents").limit(200)
      .select(col("doc_id"), TextAnalysis.tokens(col("text")).as("tk"))
    val both = docs.select(
      col("doc_id"),
      simHash(col("tk")).as("native"),
      simHashHof(col("tk")).as("hof"))
    assert(both.filter(col("native") =!= col("hof")).count() === 0)

    // edge cases: empty array (→ 0L), duplicates (votes accumulate),
    // single token, null array (→ SQL NULL, matching the HOF aggregate)
    val edges = Seq(
      (1, Some(Seq.empty[String])),
      (2, Some(Seq("x", "x", "y"))),
      (3, Some(Seq("only"))),
      (4, None)).toDF("id", "tk")
    val e = edges.select(col("id"),
      simHash(col("tk")).as("native"), simHashHof(col("tk")).as("hof"))
    assert(e.filter(coalesce(col("native"), lit(-1L)) =!=
      coalesce(col("hof"), lit(-1L))).count() === 0)
    val byId = e.collect().map(r => r.getInt(0) ->
      (if (r.isNullAt(1)) None else Some(r.getLong(1)))).toMap
    assert(byId(1) === Some(0L))
    assert(byId(4) === None)
  }

  test("native Md5Hash60 expression equals the built-in chain bit-exact") {
    // real documents AND every token of them — the hash runs per token in
    // the portable kernels, so the equality must hold on token-shaped input
    val docs = graft.Tables.load(spark, sf(), "documents").limit(200)
    val onDocs = docs.select(
      Hashing.md5Hash60(col("text")).as("native"),
      Hashing.md5Hash60Builtin(col("text")).as("chain"))
    assert(onDocs.filter(col("native") =!= col("chain")).count() === 0)
    val onTokens = docs
      .select(explode(TextAnalysis.tokens(col("text"))).as("t"))
      .select(
        Hashing.md5Hash60(col("t")).as("native"),
        Hashing.md5Hash60Builtin(col("t")).as("chain"))
    assert(onTokens.filter(col("native") =!= col("chain")).count() === 0)

    // edge cases: empty string, unicode, null → null
    val edges = Seq(Some(""), Some("héllo wörld ✓"), Some("a"), None).toDF("s")
      .select(
        Hashing.md5Hash60(col("s")).as("native"),
        Hashing.md5Hash60Builtin(col("s")).as("chain"))
    assert(edges.filter(
      coalesce(col("native"), lit(-1L)) =!= coalesce(col("chain"), lit(-1L))).count() === 0)
    val rows = edges.collect()
    assert(rows.count(r => r.isNullAt(0)) === 1, "null in → null out on the native path")
  }

  test("native MinHashSignature expression equals the HOF reference bit-exact") {
    // real documents: the full shingle pipeline both interpreted and codegen'd
    val docs = graft.Tables.load(spark, sf(), "documents").limit(200)
      .select(col("doc_id"), array_distinct(TextAnalysis.tokenShingles(col("text"), 3)).as("sh"))
    val both = docs.select(
      col("doc_id"),
      minHashSignature(col("sh"), 64).as("native"),
      minHashSignatureHof(col("sh"), 64).as("hof"))
    assert(both.filter(col("native") =!= col("hof")).count() === 0)

    // edge cases: empty set, duplicate shingles, single element
    val edges = Seq(
      (1, Seq.empty[String]),
      (2, Seq("x", "x", "x")),
      (3, Seq("only"))).toDF("id", "sh")
    val e = edges.select(
      minHashSignature(col("sh"), 32).as("native"),
      minHashSignatureHof(array_distinct(col("sh")), 32).as("hof"))
    assert(e.filter(col("native") =!= col("hof")).count() === 0)
    // empty set → MaxValue in every slot
    val empty = edges.filter(col("id") === 1)
      .select(minHashSignature(col("sh"), 8)).collect().head.getSeq[Long](0)
    assert(empty === Seq.fill(8)(Long.MaxValue))
  }
}
