package graft.expressions

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression, UnsafeArrayData, XXH64}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodeGenerator, CodegenContext, ExprCode, FalseLiteral}
import org.apache.spark.sql.catalyst.expressions.codegen.Block._
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, LongType, StringType}

/** Native Catalyst expression: the full MinHash signature of an
  * `array<string>` shingle set in one tight primitive loop —
  * `numPerm` affine permutations `(a_i*h + b_i) mod P` (P = 2^31-1)
  * minimized over the xxhash64 (seed 42, same as the `xxhash64` built-in)
  * of each shingle.
  *
  * Why a custom Expression (the [[FloatVectorDot]] rationale at array
  * scale): the composable HOF form
  * ([[graft.functions.Hashing.minHashSignatureHof]]) evaluates
  * interpretively — per-row lambda dispatch over a 64-element permutation
  * array, each slot re-walking the base-hash array with two boxed `pmod`s
  * per element, plus the materialized intermediate arrays. This form
  * hashes each shingle once, keeps the running minima in one `long[]`,
  * allocates nothing else, and participates in whole-stage codegen. On the
  * near-dup pipeline the signature pass dominates the scan stage
  * (BENCH r01: q_d3 11.8 s / q_d5 10.0 s at sf0.1, mostly here).
  *
  * Value-identical to the HOF form in every case the engine produces:
  * same shingle hash (`XXH64.hashUTF8String`, seed 42), same
  * permutation parameters, same mod-prime arithmetic (all operands
  * non-negative, so `pmod` ≡ `%`), duplicate shingles cannot change a
  * minimum, empty or null input yields `Long.MaxValue` in every slot
  * (matches nothing). Spec-verified equal on real documents.
  */
case class MinHashSignature(child: Expression, numPerm: Int)
    extends UnaryExpression {

  private val P = 2147483647L // 2^31 - 1

  // permutation parameters, derived exactly as Hashing.permParams
  private lazy val (aParams, bParams) = {
    val ps = graft.functions.Hashing.permParams(numPerm)
    (ps.map(_._1).toArray, ps.map(_._2).toArray)
  }

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(StringType, _) => TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires array<string>, got ${t.simpleString}")
  }

  override def dataType: DataType = ArrayType(LongType, containsNull = false)

  // null input degenerates to the empty-set signature, never SQL NULL —
  // the contract the HOF form's coalesce(array_min(...), MaxValue) gives
  override def nullable: Boolean = false

  override def prettyName: String = "minhash_signature"

  private def emptySignature: Array[Long] = Array.fill(numPerm)(Long.MaxValue)

  override def eval(input: InternalRow): Any = {
    val v = child.eval(input)
    val sig = emptySignature
    if (v != null) {
      val arr = v.asInstanceOf[ArrayData]
      val n = arr.numElements()
      var i = 0
      while (i < n) {
        // null element: the xxhash64 built-in leaves the seed untouched
        val raw = if (arr.isNullAt(i)) 42L else XXH64.hashUTF8String(arr.getUTF8String(i), 42L)
        val h = ((raw % P) + P) % P
        var p = 0
        while (p < numPerm) {
          val cand = ((aParams(p) * h) % P + bParams(p)) % P
          if (cand < sig(p)) sig(p) = cand
          p += 1
        }
        i += 1
      }
    }
    UnsafeArrayData.fromPrimitiveArray(sig)
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val childGen = child.genCode(ctx)
    val aRef = ctx.addReferenceObj("minhashA", aParams, "long[]")
    val bRef = ctx.addReferenceObj("minhashB", bParams, "long[]")
    val arr = ctx.freshName("arr")
    val sig = ctx.freshName("sig")
    val n = ctx.freshName("n")
    val i = ctx.freshName("i")
    val p = ctx.freshName("p")
    val raw = ctx.freshName("raw")
    val h = ctx.freshName("h")
    val cand = ctx.freshName("cand")
    val code =
      code"""
        |${childGen.code}
        |long[] $sig = new long[$numPerm];
        |java.util.Arrays.fill($sig, Long.MAX_VALUE);
        |if (!${childGen.isNull}) {
        |  org.apache.spark.sql.catalyst.util.ArrayData $arr = ${childGen.value};
        |  int $n = $arr.numElements();
        |  for (int $i = 0; $i < $n; $i++) {
        |    long $raw = $arr.isNullAt($i)
        |      ? 42L
        |      : org.apache.spark.sql.catalyst.expressions.XXH64.hashUTF8String(
        |          $arr.getUTF8String($i), 42L);
        |    long $h = (($raw % ${P}L) + ${P}L) % ${P}L;
        |    for (int $p = 0; $p < $numPerm; $p++) {
        |      long $cand = (($aRef[$p] * $h) % ${P}L + $bRef[$p]) % ${P}L;
        |      if ($cand < $sig[$p]) $sig[$p] = $cand;
        |    }
        |  }
        |}
        |${CodeGenerator.javaType(dataType)} ${ev.value} =
        |  org.apache.spark.sql.catalyst.expressions.UnsafeArrayData.fromPrimitiveArray($sig);
      """.stripMargin
    ev.copy(code = code, isNull = FalseLiteral)
  }

  override protected def withNewChildInternal(newChild: Expression): MinHashSignature =
    copy(child = newChild)
}
