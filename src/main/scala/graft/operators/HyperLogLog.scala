package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** HyperLogLog distinct-count sketch (Flajolet–Fusy–Gandouet–Meunier
  * 2007) — the cardinality companion to the bottom-k quantile sketch
  * (q_q20): at 100 TB an exact `count(distinct id)` per group shuffles
  * every distinct value; the HLL register frame keeps 2^p integers per
  * group, combines MAP-SIDE (registers are per-bucket maxima, so the
  * partial-aggregate buffers that shuffle are ≤ m rows per group per
  * partition), and merges across batches/corpora by the same
  * bucket-wise max — the mergeable-sketch law the streaming twin
  * (q_st30) operationalizes.
  *
  * Replayability (the engine discipline): the ranking hash is the
  * portable md5-60 ([[graft.functions.Hashing.md5Hash60]]) so another
  * engine reproduces every register EXACTLY; the harmonic sum is kept
  * as the EXACT scaled integer S = Σ_j 2^(r0 − M_j) (r0 = the maximum
  * possible rank, so every term is an integer ≥ 1; m·2^r0 = 2^61 fits
  * BIGINT) — the estimate is then ONE double division of exact
  * integers plus the fixed small-range branch, deterministic and
  * partition-order-proof. No sampling, no per-engine float folklore.
  *
  * Bucket/rank split of the 60-bit hash: bucket = low p bits,
  * w = high (60−p) bits, rank = leading zeros of w in (60−p)-bit
  * width + 1 (w = 0 → 61−p). Bit length goes through the minimal-width
  * `bin()` string — probed identical in Spark and DuckDB — because
  * `floor(log2(w))+1` mis-rounds just below large powers of two.
  *
  * Small-range correction (E ≤ 2.5m with empty registers): linear
  * counting m·ln(m/V). The large-range correction is omitted — it
  * exists for 32-bit hashes; collisions in a 60-bit space are
  * negligible below ~2^30 distinct values (documented divergence).
  *
  * Reference anchor: the reference's only cardinality notion is
  * driver-side `Map` key counts (`SisConnectorService.java:690-708`);
  * this is the scale-path generalization.
  */
object HyperLogLog {

  /** Width in bits of the portable md5-60 ranking hash. */
  val HashBits = 60

  private def alphaCol(m: Int): Column =
    lit(0.7213) / (lit(1.0) + lit(1.079) / lit(m.toDouble))

  /** Observed registers: `(groupCols…, bucket, r)` — one row per
    * NON-EMPTY bucket (empty buckets are implicit zeros, reconstructed
    * in [[estimateFromRegisters]]). `hashCol` must be the md5-60 (or
    * any uniform non-negative 60-bit) BIGINT hash of the identity
    * being counted. Mergeable: registers of a union = bucket-wise max
    * of per-part registers.
    */
  def registers(
      df: DataFrame,
      groupCols: Seq[String],
      hashCol: Column,
      p: Int): DataFrame = {
    require(p >= 7 && p <= 16, "p in [7,16] (alpha constant needs m >= 128)")
    val m = 1 << p
    val wBits = HashBits - p
    val h = hashCol.cast("long")
    val w = shiftrightunsigned(h, p)
    // rank = leading zeros of w in wBits width + 1; bin() is
    // minimal-width in both engines, ltrim drops w=0 to length 0
    val r = (lit(wBits) - length(ltrim(bin(w), "0")) + lit(1)).cast("int")
    df.select(
      (groupCols.map(col) :+
        h.bitwiseAND(lit((m - 1).toLong)).cast("int").as("bucket") :+
        r.as("r")): _*)
      .groupBy((groupCols.map(col) :+ col("bucket")): _*)
      .agg(max("r").as("r"))
  }

  /** Estimate from a register frame (as produced by [[registers]], or
    * a bucket-wise max-merge of several): per group
    * `(groupCols…, m, n_zero, s_scaled, nd_estimate)` where `s_scaled`
    * is the exact integer Σ 2^(r0 − M_j) over ALL m buckets and
    * `nd_estimate` the bias-corrected (small-range-aware) cardinality,
    * rounded to 6 decimals.
    */
  def estimateFromRegisters(
      regs: DataFrame,
      groupCols: Seq[String],
      p: Int): DataFrame = {
    require(p >= 7 && p <= 16, "p in [7,16]")
    val m = 1 << p
    val r0 = HashBits - p + 1 // max possible rank; scale exponent
    val g = regs
      .groupBy(groupCols.map(col): _*)
      .agg(
        count(lit(1)).cast("long").as("__nb"),
        sum(expr(s"shiftleft(CAST(1 AS BIGINT), $r0 - r)")).as("__sp"))
    val nZero = (lit(m.toLong) - col("__nb")).as("n_zero")
    val sScaled = (col("__sp") + (lit(m.toLong) - col("__nb")) * lit(1L << r0))
      .as("s_scaled")
    val withS = g.select(
      (groupCols.map(col) :+ lit(m).as("m") :+ nZero :+ sScaled): _*)
    val mD = lit(m.toDouble)
    // m²·2^r0 is a power of two — exact as a double product
    val eRaw = alphaCol(m) * mD * mD * lit((1L << r0).toDouble) /
      col("s_scaled").cast("double")
    val est = when(
      eRaw <= lit(2.5) * mD && col("n_zero") > 0,
      mD * log(mD / col("n_zero").cast("double"))).otherwise(eRaw)
    withS.select(
      (groupCols.map(col) :+ col("m") :+ col("n_zero") :+ col("s_scaled") :+
        round(est, 6).as("nd_estimate")): _*)
  }

  /** One-call distinct sketch: registers + estimate. */
  def distinctSketch(
      df: DataFrame,
      groupCols: Seq[String],
      hashCol: Column,
      p: Int): DataFrame =
    estimateFromRegisters(registers(df, groupCols, hashCol, p), groupCols, p)

  /** Max-merge of register frames (the mergeable-sketch operation):
    * union the frames, bucket-wise max. Registers from disjoint or
    * overlapping corpora merge to exactly the registers of the union —
    * the spec pins the law.
    */
  def mergeRegisters(groupCols: Seq[String], frames: DataFrame*): DataFrame = {
    require(frames.nonEmpty, "need at least one register frame")
    frames.reduce(_.unionByName(_))
      .groupBy((groupCols.map(col) :+ col("bucket")): _*)
      .agg(max("r").as("r"))
  }
}
