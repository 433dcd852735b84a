package graft.operators

import org.apache.spark.sql.functions._

import graft.SparkSpec

class ChunkingCdcSpec extends SparkSpec {
  import spark.implicits._

  private val body =
    "content defined chunking keeps interior chunk identities stable " * 12

  test("chunks partition the text exactly: contiguous, full cover, len >= 1") {
    val df = Seq((1L, body)).toDF("id", "txt")
    val ch = Chunking.cdcChunks(df, "id", "txt", window = 16, modulus = 16)
      .orderBy("chunk_idx").collect()
    assert(ch.length >= 2, "modulus 16 over ~780 chars must cut somewhere")
    var expectStart = 1L
    ch.foreach { r =>
      assert(r.getAs[Long]("start") === expectStart, "contiguous")
      assert(r.getAs[Long]("len") >= 1)
      expectStart += r.getAs[Long]("len")
    }
    assert(expectStart - 1 === body.length.toLong, "full cover")
  }

  test("shift-invariance: a prefix insert leaves interior chunk hashes intact") {
    val df = Seq((1L, body), (2L, "XYZ padding of another size " + body))
      .toDF("id", "txt")
    val ch = Chunking.cdcChunks(df, "id", "txt", window = 16, modulus = 16)
    val h1 = ch.filter(col("id") === 1).select("chunk_hash")
      .as[Long].collect().toSet
    val h2 = ch.filter(col("id") === 2).select("chunk_hash")
      .as[Long].collect().toSet
    val shared = h1 intersect h2
    // everything after the first boundary inside `body` is identical
    assert(shared.size >= h1.size - 2,
      s"interior chunks must survive the shift (shared ${shared.size} of ${h1.size})")
    // fixed-size chunking for contrast: same split sizes, no alignment
    val fixed1 = body.grouped(64).map(c => c.hashCode).toSet
    val fixed2 = ("XYZ padding of another size " + body).grouped(64)
      .map(c => c.hashCode).toSet
    assert((fixed1 intersect fixed2).size <= 1,
      "fixed-size chunks lose alignment on the same input (the CDC motivation)")
  }

  test("maxLen cap splits oversized chunks deterministically and keeps cover") {
    val df = Seq((1L, body)).toDF("id", "txt")
    val capped = Chunking.cdcChunks(df, "id", "txt",
      window = 16, modulus = 100000, maxLen = 50) // no hash boundary fires
    val rows = capped.orderBy("chunk_idx").collect()
    assert(rows.forall(_.getAs[Long]("len") <= 50))
    assert(rows.map(_.getAs[Long]("len")).sum === body.length.toLong)
    assert(rows.init.forall(_.getAs[Long]("len") === 50), "only the tail is short")
  }

  test("degenerate inputs: empty and null text yield no rows; short text one chunk") {
    val df = Seq((1L, ""), (2L, null.asInstanceOf[String]), (3L, "tiny"))
      .toDF("id", "txt")
    val ch = Chunking.cdcChunks(df, "id", "txt", window = 16, modulus = 4)
    assert(ch.filter(col("id").isin(1L, 2L)).count() === 0)
    val tiny = ch.filter(col("id") === 3).collect()
    assert(tiny.length === 1 &&
      tiny(0).getAs[Long]("start") === 1L && tiny(0).getAs[Long]("len") === 4L)
  }
}
