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

  /** Symmetric max-abs int8 quantization: `code_i = round(x_i / max|x| ·
    * 127)` as `array<tinyint>` — 1 byte per dimension instead of 4 on any
    * downstream scan or shuffle. Cosine is SCALE-INVARIANT, so similarity
    * ranking runs directly on the codes with no dequantization and no
    * stored scale (the scale only matters for dot/L2, which an exact
    * re-rank recomputes from raw vectors). All-zero vectors quantize to
    * all-zero codes; null propagates; a vector containing NaN quantizes
    * to NULL codes (unrankable — matching the exact path, where a NaN
    * cosine is excluded by the top-k heap; an unguarded round(NaN) cast
    * would THROW under ANSI mode, Spark 4's default).
    */
  def int8Codes(v: Column): Column =
    hof.bind(array_max(transform(v, e => abs(e.cast("double"))))) { m =>
      when(v.isNull || isnan(m), lit(null))
        .when(m === 0.0, transform(v, _ => lit(0).cast("tinyint")))
        .otherwise(transform(v, e =>
          round(e.cast("double") / m * 127.0).cast("tinyint")))
    }

  /** Cosine similarity; 0 when either vector is all-zero. */
  def cosine(a: Column, b: Column): Column = {
    val d = norm(a) * norm(b)
    when(d === 0, 0.0).otherwise(dot(a, b) / d)
  }

  /** Deterministic pseudo-random hyperplane component for (plane, dim):
    * xxhash64 of "plane:dim" mapped to [-1, 1). No stored model, no
    * broadcast — the same value on every executor. Computed at PLAN time
    * (it only depends on indices); the per-row form cost a string concat +
    * hash per (plane, dim) per row.
    */
  private[graft] def planeComponent(plane: Int, dim: Int): Double = {
    import org.apache.spark.sql.catalyst.expressions.{Literal, XxHash64}
    import org.apache.spark.unsafe.types.UTF8String
    val h = XxHash64(Seq(Literal(UTF8String.fromString(s"$plane:$dim"),
      org.apache.spark.sql.types.StringType)), 42L)
      .eval(null).asInstanceOf[Long]
    (((h % 1000000L) + 1000000L) % 1000000L).toDouble / 500000.0 - 1.0
  }

  /** Supported embedding dimensionality ceiling for the literal plane
    * matrix (rows are sliced to the input's actual dim).
    */
  val maxDim = 512

  /** Random-hyperplane (SRP) LSH bit signature of a float vector packed
    * into one BIGINT: bit i = sign(v · r_(planeOffset+i)). Cosine-similar
    * vectors agree on most bits (collision prob = 1 - θ/π per bit). The
    * plane matrix is a plan-time literal — per row the work is
    * numPlanes × dim multiplies, nothing else. `planeOffset` selects a
    * disjoint slice of the plane family so banded LSH
    * ([[graft.operators.SimilaritySearch.srpPairs]]) gets independent
    * per-band signatures.
    *
    * Native codegen'd kernel ([[graft.expressions.HyperplaneSignature]]);
    * [[hyperplaneSignatureHof]] keeps the composable HOF form for
    * cross-verification. (One contract nuance: the native form
    * null-propagates a NULL input vector; the HOF form yields 0 — no
    * caller feeds null vectors.)
    */
  def hyperplaneSignature(v: Column, numPlanes: Int = 16, planeOffset: Int = 0): Column =
    bridge.column(graft.expressions.HyperplaneSignature(
      bridge.expression(v), numPlanes, planeOffset))

  /** Reference HOF implementation of [[hyperplaneSignature]] — identical
    * values, interpreted evaluation; used by specs to cross-check the
    * native expression.
    */
  def hyperplaneSignatureHof(v: Column, numPlanes: Int = 16, planeOffset: Int = 0): Column = {
    val planes: Seq[Seq[Double]] =
      (planeOffset until planeOffset + numPlanes)
        .map(p => (0 until maxDim).map(i => planeComponent(p, i)))
    val planesLit = typedlit(planes)
    // explicit failure beyond maxDim: a truncated plane row would zip-pad
    // with nulls, null out every projection, and silently give EVERY vector
    // signature 0 — one giant LSH bucket instead of an error
    val checked = when(size(v) > maxDim,
      raise_error(concat(lit(s"hyperplaneSignature supports dim <= $maxDim, got "),
        size(v).cast("string")))).otherwise(lit(0)).cast("bigint")
    aggregate(
      transform(sequence(lit(0), lit(numPlanes - 1)), p => {
        val proj = aggregate(
          zip_with(v, slice(element_at(planesLit, p + 1), lit(1), size(v)), (x, c) =>
            x.cast("double") * c),
          lit(0.0),
          (acc, x) => acc + x)
        when(proj > 0, call_function("shiftleft", lit(1L), p)).otherwise(lit(0L))
      }),
      lit(0L),
      (acc, x) => acc.bitwiseOR(x)) + checked
  }
}
