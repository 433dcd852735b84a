package graft.queries

import org.apache.spark.sql.functions._

import graft.SparkSpec

/** Pins the arithmetic contract of [[DuckXxh64]]'s generated oracle SQL:
  * a BigInt replay of the EXACT formulas the generator emits — 32-bit
  * limb-split multiply-mod-2^64, rotate as shift-mod-plus-shift, the
  * stripe/merge/tail/avalanche stage order with the same per-step
  * applicability guards — must equal Spark's `xxhash64` built-in (the
  * production kernels' hash) on adversarial byte lengths. If either side
  * drifts, the q_d4x/q_t5x oracles drift with it, so this is the spec
  * that fails first.
  */
class XxHashOracleSpec extends SparkSpec {

  private val M = BigInt(1) << 64
  private val S = BigInt(1) << 32
  private val P1 = BigInt("11400714785074694791")
  private val P2 = BigInt("14029467366897019727")
  private val P3 = BigInt("1609587929392839161")
  private val P4 = BigInt("9650029242287828579")
  private val P5 = BigInt("2870177450012600261")
  private val Seed = BigInt(42)

  // the generator's formulas, verbatim semantics
  private def mulmod(a: BigInt, c: BigInt): BigInt =
    ((a % S) * (c % S) + ((((a / S) * (c % S) + (a % S) * (c / S)) % S) * S)) % M
  private def rotl(a: BigInt, r: Int): BigInt =
    ((a * (BigInt(1) << r)) % M) + (a / (BigInt(1) << (64 - r)))
  private def xr(a: BigInt, b: BigInt): BigInt = a ^ b
  private def round(acc: BigInt, lane: BigInt): BigInt =
    mulmod(rotl((acc + mulmod(lane, P2)) % M, 31), P1)

  private def lane(bytes: Array[Byte], off: Int, w: Int): BigInt =
    (0 until w).foldLeft(BigInt(0)) { (acc, k) =>
      acc + (BigInt(bytes(off + k) & 0xFF) << (8 * k))
    }

  /** The oracle's stage order: stripes → merge → +len → <=3 8-rounds →
    * 4-round → <=3 byte rounds → avalanche.
    */
  private def oracleXxh64(bytes: Array[Byte]): BigInt = {
    val n = bytes.length
    val nst = n / 32
    var h =
      if (n >= 32) {
        var v1 = (Seed + P1 + P2) % M
        var v2 = (Seed + P2) % M
        var v3 = Seed
        var v4 = (Seed - P1 + M) % M
        for (i <- 0 until nst) {
          v1 = round(v1, lane(bytes, 32 * i, 8))
          v2 = round(v2, lane(bytes, 32 * i + 8, 8))
          v3 = round(v3, lane(bytes, 32 * i + 16, 8))
          v4 = round(v4, lane(bytes, 32 * i + 24, 8))
        }
        var hh = (rotl(v1, 1) + rotl(v2, 7) + rotl(v3, 12) + rotl(v4, 18)) % M
        for (v <- Seq(v1, v2, v3, v4))
          hh = (mulmod(xr(hh, mulmod(rotl(mulmod(v, P2), 31), P1)), P1) + P4) % M
        hh
      } else (Seed + P5) % M
    h = (h + n) % M
    val r = n - 32 * nst
    for (j <- 0 until 3 if r >= 8 * (j + 1))
      h = (mulmod(rotl(xr(h, round(0, lane(bytes, 32 * nst + 8 * j, 8))), 27), P1) + P4) % M
    if (r % 8 >= 4)
      h = (mulmod(rotl(xr(h, mulmod(lane(bytes, 32 * nst + 8 * (r / 8), 4), P1)), 23), P2) + P3) % M
    val nb = (r % 8) % 4
    val boff = 32 * nst + 8 * (r / 8) + (if (r % 8 >= 4) 4 else 0)
    for (j <- 0 until 3 if nb > j)
      h = mulmod(rotl(xr(h, mulmod(lane(bytes, boff + j, 1), P5)), 11), P1)
    h = xr(h, h / (BigInt(1) << 33))
    h = mulmod(h, P2)
    h = xr(h, h / (BigInt(1) << 29))
    h = mulmod(h, P3)
    xr(h, h / (BigInt(1) << 32))
  }

  private def signed(u: BigInt): Long =
    (if (u >= (BigInt(1) << 63)) u - M else u).toLong

  test("oracle arithmetic == Spark xxhash64 on adversarial byte lengths") {
    val cases = Seq(
      "", "a", "ab", "abc", "abcd", "abcde", "abcdef", "abcdefg",
      "abcdefgh", "abcdefghi", "abcdefghijkl", "0123456789abcdef",
      "0123456789abcdefg", "0123456789abcdefghij",
      "x" * 31, "x" * 32, "x" * 33, "y" * 39, "z" * 40, "w" * 63,
      "v" * 64, "u" * 65, "t" * 100, "s" * 1000,
      "héllo", "héllo wörld ünïcode", "日本語テキスト",
      "mixed ascii and 日本語 and émojis")
    import spark.implicits._
    val got = cases.toDF("s").select(col("s"), xxhash64(col("s")))
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    cases.foreach { c =>
      val want = signed(oracleXxh64(c.getBytes("UTF-8")))
      assert(got(c) === want, s"drift on ${c.take(20)} (len ${c.length})")
    }
  }

  test("generated SQL embeds the stage chain and stays single-statement") {
    for (sql <- Seq(DuckXxh64.simhashProdOracle, DuckXxh64.fingerprintProdOracle)) {
      assert(sql.startsWith("WITH RECURSIVE"))
      assert(!sql.contains(";"), "oracle must be one statement")
      // the recursive stripe fold, the merge rounds, and the avalanche
      // must all be present — a regressed generator would drop a stage
      for (marker <- Seq("xs AS (", "xmerged AS", "q4f AS", "f5 AS", "h_u", "h_s"))
        assert(sql.contains(marker), s"missing stage marker $marker")
    }
  }
}
