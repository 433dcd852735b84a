package graft.expressions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types.{DataType, LongType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Native Catalyst expression: the engine-portable 60-bit md5 prefix
  * hash — value-identical to
  * `conv(substring(md5(x), 1, 15), 16, 10)::bigint`
  * (= DuckDB's `('0x' || substring(md5(x), 1, 15))::BIGINT`), the hash
  * every portable-oracle kernel keys on (MinHash/SimHash portable
  * twins, DSIR buckets, winnowing fingerprints).
  *
  * Why a custom Expression (the [[SimHash64]] rationale): the built-in
  * chain materializes a 32-char hex STRING per value, allocates a
  * substring slice, then PARSES 15 hex chars back through `conv`'s
  * arbitrary-base loop — three UTF8String allocations and a base-16
  * parse per token, per row, inside hot dedup/bucketing scans. This
  * kernel digests the raw UTF-8 bytes and assembles the value with
  * shifts: the first 15 hex chars are exactly the first 7.5 bytes, i.e.
  * `(big-endian uint64 of bytes 0..7) >>> 4`. No hex rendering, no
  * parsing, a thread-local digest instance, stays inside whole-stage
  * codegen.
  *
  * Honest measurement (sf0.1, 5 warm reps): NEUTRAL on the gate corpus
  * — the MD5 block computation dominates the chain's allocations at
  * these token counts (q_c10 medians 1.5 s both forms). Kept because
  * it removes three per-value allocations from every portable-kernel
  * scan (the win grows with token volume), and as the simplest
  * end-to-end exemplar of the native-Expression pattern.
  *
  * Null in → null out (UnaryExpression contract), matching the chain.
  * Spec-asserted bit-exact against the HOF/built-in twin on real data.
  */
case class Md5Hash60(child: Expression) extends UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case StringType => TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires string, got ${t.simpleString}")
  }

  override def dataType: DataType = LongType

  override def prettyName: String = "md5_hash60"

  override def nullSafeEval(v: Any): Any =
    Md5Hash60.hash60(v.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, s =>
      s"graft.expressions.Md5Hash60$$.MODULE$$.hash60($s)")

  override protected def withNewChildInternal(newChild: Expression): Md5Hash60 =
    copy(child = newChild)
}

object Md5Hash60 {

  // one digest instance per executor thread — getInstance allocates and
  // does a provider lookup; digest() leaves the instance reset
  private val localMd = new ThreadLocal[java.security.MessageDigest] {
    override def initialValue(): java.security.MessageDigest =
      java.security.MessageDigest.getInstance("MD5")
  }

  /** First 60 bits of md5(utf8 bytes): big-endian uint64 of digest
    * bytes 0..7, shifted right 4 (drops the 16th hex nibble).
    */
  def hash60(s: UTF8String): Long = {
    val d = localMd.get().digest(s.getBytes)
    var x = 0L
    var i = 0
    while (i < 8) { x = (x << 8) | (d(i) & 0xffL); i += 1 }
    x >>> 4
  }
}
