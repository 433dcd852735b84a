package graft.expressions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types.{BooleanType, DataType, LongType}
import org.apache.spark.util.sketch.BloomFilter

/** Membership probe of a pre-built Bloom filter over a BIGINT key — the
  * runtime-filter primitive for join pruning: fact rows whose key cannot
  * be on the dimension side are dropped AT THE SCAN, before they are ever
  * shuffled or buffered by the join.
  *
  * Spark's own `BloomFilterMightContain` exists but is `private[sql]`
  * (injected only by its runtime-filter optimizer rule, which triggers on
  * statistics the engine's callers may not have); this is the same probe
  * as a public building block over the public
  * `org.apache.spark.util.sketch.BloomFilter`. The filter object rides to
  * executors as a codegen reference object (serialized once per task
  * binary, shared across rows); the probe itself participates in
  * whole-stage codegen.
  *
  * No false negatives, by Bloom construction: composing this with an
  * exact join never changes the join's result — only the number of rows
  * that reach it (verified by the `q_j10` oracle, which is the plain
  * join).
  */
case class BloomMightContainLong(child: Expression, filter: BloomFilter)
    extends UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case LongType => TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires bigint, got ${t.simpleString}")
  }

  override def dataType: DataType = BooleanType

  override def prettyName: String = "bloom_might_contain_long"

  override def nullSafeEval(v: Any): Any =
    filter.mightContainLong(v.asInstanceOf[Long])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("bloomFilter", filter,
      classOf[BloomFilter].getName)
    nullSafeCodeGen(ctx, ev, v => s"${ev.value} = $ref.mightContainLong($v);")
  }

  override protected def withNewChildInternal(newChild: Expression): BloomMightContainLong =
    copy(child = newChild)
}
