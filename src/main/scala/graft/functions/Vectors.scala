package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._
import org.apache.spark.sql.graft.bridge

import graft.expressions.FloatVectorDot

/** Dense-vector math over `array<float>` embedding columns: evaluated
  * per-row inside the scan projection, no UDF serialization, no shuffle.
  * The hot inner product is a native codegen'd Catalyst expression
  * ([[FloatVectorDot]]); the HOF form is kept as [[dotHof]] for
  * cross-verification.
  */
object Vectors {

  /** Dot product of two equal-length float arrays, accumulated in double
    * left-to-right (deterministic order — safe to compare across engines).
    * Whole-stage-codegen'd primitive loop.
    */
  def dot(a: Column, b: Column): Column =
    bridge.column(FloatVectorDot(bridge.expression(a), bridge.expression(b)))

  /** Reference implementation of [[dot]] via higher-order functions —
    * same numerics (bit-exact), interpreted evaluation; used by specs to
    * cross-check the native expression.
    */
  def dotHof(a: Column, b: Column): Column =
    aggregate(
      zip_with(a, b, (x, y) => x.cast("double") * y.cast("double")),
      lit(0.0),
      (acc, x) => acc + x)

  /** L2 norm. */
  def norm(a: Column): Column = sqrt(dot(a, a))

  /** Cosine similarity; 0 when either vector is all-zero. */
  def cosine(a: Column, b: Column): Column = {
    val d = norm(a) * norm(b)
    when(d === 0, 0.0).otherwise(dot(a, b) / d)
  }

  /** Deterministic pseudo-random hyperplane component for (plane, dim):
    * xxhash64 of the index pair mapped to [-1, 1). No stored model, no
    * broadcast — every executor derives the same planes from the indices.
    */
  private def planeComponent(plane: Column, dim: Column): Column =
    (pmod(xxhash64(concat_ws(":", plane, dim)), lit(1000000L)).cast("double") /
      500000.0) - 1.0

  /** Random-hyperplane (SRP) LSH bit signature of a float vector packed
    * into one BIGINT: bit i = sign(v · r_i). Cosine-similar vectors agree
    * on most bits (collision prob = 1 - θ/π per bit).
    */
  def hyperplaneSignature(v: Column, numPlanes: Int = 16): Column =
    aggregate(
      transform(sequence(lit(0), lit(numPlanes - 1)), p => {
        val proj = aggregate(
          zip_with(v, sequence(lit(0), size(v) - 1), (x, i) =>
            x.cast("double") * planeComponent(p, i)),
          lit(0.0),
          (acc, x) => acc + x)
        when(proj > 0, call_function("shiftleft", lit(1L), p)).otherwise(lit(0L))
      }),
      lit(0L),
      (acc, x) => acc.bitwiseOR(x))
}
