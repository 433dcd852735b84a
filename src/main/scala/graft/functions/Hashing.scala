package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** MinHash / SimHash signature machinery, expressed with Spark built-ins
  * and higher-order functions so signatures are computed scan-side (no
  * shuffle, no UDF) — at 100 TB the signature pass is embarrassingly
  * parallel and the only shuffle in near-dup detection is the bucket join
  * on band keys.
  */
object Hashing {

  /** Mersenne prime 2^31-1 for the affine permutation family. Base hashes
    * and (a,b) all live below 2^31 so `a*h + b < 2^62` never overflows a
    * Long and the mod-prime arithmetic stays mathematically exact.
    */
  private val P = 2147483647L // 2^31 - 1

  /** Deterministic (a_i, b_i) parameters for the permutation family,
    * derived from splitmix64 of the index — reproducible across runs and
    * executors with no broadcast state.
    */
  private def splitmix64(x0: Long): Long = {
    var x = x0 + 0x9e3779b97f4a7c15L
    x = (x ^ (x >>> 30)) * 0xbf58476d1ce4e5b9L
    x = (x ^ (x >>> 27)) * 0x94d049bb133111ebL
    x ^ (x >>> 31)
  }

  def permParams(numPerm: Int): Seq[(Long, Long)] =
    (0 until numPerm).map { i =>
      // floorMod, not math.abs: abs(Long.MinValue) is negative, which would
      // break the a ∈ [1, P-1] invariant
      val a = java.lang.Math.floorMod(splitmix64(2L * i), P - 1) + 1 // a ∈ [1, P-1]
      val b = java.lang.Math.floorMod(splitmix64(2L * i + 1), P)     // b ∈ [0, P-1]
      (a, b)
    }

  /** Engine-portable 60-bit hash: the first 15 hex chars of md5 parsed as
    * an integer — non-negative, < 2^60, reproducible in any engine (the
    * DuckDB twin is `('0x' || substring(md5(x), 1, 15))::BIGINT`). The
    * 64-bit-hash operators (SimHash, winnowing) accept this as a drop-in
    * token hash so their gate queries get value-exact oracles; xxhash64
    * stays the production fast path ([[graft.expressions.SimHash64]]).
    *
    * Native codegen kernel ([[graft.expressions.Md5Hash60]]): digests
    * the raw bytes and assembles the long with shifts — no hex string,
    * no substring slice, no base-16 parse. [[md5Hash60Builtin]] keeps
    * the built-in-chain form; a spec asserts bit-exact equality.
    */
  def md5Hash60(c: Column): Column =
    org.apache.spark.sql.graft.bridge.column(
      graft.expressions.Md5Hash60(org.apache.spark.sql.graft.bridge.expression(c)))

  /** The built-in-chain twin of [[md5Hash60]] (hex render + substring +
    * conv parse) — the reference form the native kernel is verified
    * against, and the exact shape the DuckDB oracles replay.
    */
  def md5Hash60Builtin(c: Column): Column =
    conv(substring(md5(c), 1, 15), 16, 10).cast("bigint")

  /** MinHash signature (array<bigint> of length `numPerm`) of a set of
    * string shingles. One xxhash64 per shingle, then `numPerm` affine
    * permutations `(a*h + b) mod (2^31-1)` minimized per permutation.
    * Empty shingle sets get the max value in every slot (matches nothing).
    *
    * Native codegen'd kernel ([[graft.expressions.MinHashSignature]]);
    * [[minHashSignatureHof]] keeps the composable HOF form for
    * cross-verification.
    */
  def minHashSignature(shingles: Column, numPerm: Int = 64): Column =
    org.apache.spark.sql.graft.bridge.column(
      graft.expressions.MinHashSignature(
        org.apache.spark.sql.graft.bridge.expression(shingles), numPerm))

  /** Reference HOF implementation of [[minHashSignature]] — identical
    * values, interpreted evaluation; used by specs to cross-check the
    * native expression.
    */
  def minHashSignatureHof(shingles: Column, numPerm: Int = 64): Column =
    // base hashes bound once: referenced from the per-permutation lambda
    // they would otherwise be recomputed numPerm times (graft.functions.hof)
    hof.bind(transform(array_distinct(shingles), s => pmod(xxhash64(s), lit(P)))) { base =>
      val perms = array(permParams(numPerm).map { case (a, b) =>
        struct(lit(a).as("a"), lit(b).as("b"))
      }: _*)
      transform(perms, p =>
        coalesce(
          array_min(transform(base, h =>
            pmod(pmod(p.getField("a") * h, lit(P)) + p.getField("b"), lit(P)))),
          lit(Long.MaxValue)))
    }

  /** LSH band keys for a MinHash signature: `numBands` keys, each a hash of
    * `rowsPerBand` consecutive signature slots. Docs sharing ≥1 band key
    * are near-dup candidates. Returns array<struct<band:int, key:bigint>>
    * ready to explode + shuffle on.
    */
  def bandKeys(signature: Column, numBands: Int, rowsPerBand: Int): Column =
    transform(sequence(lit(0), lit(numBands - 1)), b =>
      struct(
        b.cast("int").as("band"),
        xxhash64(concat_ws("_", b, concat_ws(",", slice(signature, b * rowsPerBand + 1, lit(rowsPerBand)))))
          .as("key")))

  /** Exact Jaccard similarity of two shingle arrays (set semantics). */
  def jaccard(a: Column, b: Column): Column = {
    val inter = size(array_intersect(a, b)).cast("double")
    val uni = size(array_union(a, b)).cast("double")
    when(uni === 0, 1.0).otherwise(inter / uni)
  }

  /** Estimated Jaccard from two MinHash signatures (fraction of agreeing
    * slots).
    */
  def estimatedJaccard(sigA: Column, sigB: Column): Column =
    size(filter(zip_with(sigA, sigB, (x, y) => x === y), e => e)).cast("double") /
      size(sigA)

  /** 64-bit SimHash (Charikar) of a token array: each token hashes to 64
    * bits; bit j of the result is 1 iff the sum of ±1 votes over tokens is
    * positive.
    *
    * Native codegen'd kernel ([[graft.expressions.SimHash64]]);
    * [[simHashHof]] keeps the composable HOF form for cross-verification.
    */
  def simHash(toks: Column): Column =
    org.apache.spark.sql.graft.bridge.column(
      graft.expressions.SimHash64(
        org.apache.spark.sql.graft.bridge.expression(toks)))

  /** Reference HOF implementation of [[simHash]] — identical values,
    * interpreted evaluation (a 64-slot vote vector folded with `aggregate`
    * + `zip_with`, then packed into one BIGINT); used by specs to
    * cross-check the native expression.
    */
  def simHashHof(toks: Column): Column = simHashHofWith(toks, 64, xxhash64(_))

  /** [[simHashHof]] generalized over the token hash and bit width: bit j
    * of the signature (j < `bits`) is 1 iff the frequency-weighted ±1
    * votes from bit j of each token's hash sum positive.
    */
  def simHashHofWith(toks: Column, bits: Int, tokenHash: Column => Column): Column = {
    require(bits > 0 && bits <= 64)
    val bitIdx = sequence(lit(0), lit(bits - 1))
    val votes = aggregate(
      toks,
      array_repeat(lit(0L), bits),
      (acc, t) =>
        // token hash bound once per token — inside the per-bit zip_with it
        // would otherwise be recomputed per BIT (bits× the hashing work)
        hof.bind(tokenHash(t)) { h =>
          zip_with(acc, bitIdx, (a, i) =>
            a + when(call_function("shiftright", h, i).bitwiseAND(lit(1L)) === 1L, 1L).otherwise(-1L))
        })
    aggregate(
      zip_with(votes, bitIdx, (v, i) => when(v > 0, call_function("shiftleft", lit(1L), i)).otherwise(0L)),
      lit(0L),
      (acc, x) => acc.bitwiseOR(x))
  }

  /** Engine-portable SimHash: [[md5Hash60]] token hashes over the low 60
    * bits (top 4 stay 0 — [[hamming]] and [[simHashBlocks]] work
    * unchanged). Interpreted HOF evaluation — the gate/oracle variant; the
    * codegen kernel [[simHash]] is the production path.
    */
  def simHashPortable(toks: Column): Column = simHashHofWith(toks, 60, md5Hash60)

  /** Hamming distance between two 64-bit SimHashes. */
  def hamming(a: Column, b: Column): Column = bit_count(a.bitwiseXOR(b))

  /** Charikar blocking keys for SimHash near-dup search: split the 64-bit
    * hash into `numBlocks` contiguous bit blocks; two hashes within
    * Hamming distance < numBlocks share ≥1 identical block (pigeonhole).
    * Returns array<struct<band:int, key:bigint>>.
    */
  def simHashBlocks(sim: Column, numBlocks: Int = 4): Column = {
    val width = 64 / numBlocks
    val mask = (1L << width) - 1
    transform(sequence(lit(0), lit(numBlocks - 1)), b =>
      struct(
        b.cast("int").as("band"),
        call_function("shiftright", sim, b * width).bitwiseAND(lit(mask)).as("key")))
  }
}
