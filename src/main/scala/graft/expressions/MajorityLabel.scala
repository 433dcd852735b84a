package graft.expressions

import java.io.{ByteArrayInputStream, ByteArrayOutputStream, DataInputStream, DataOutputStream}

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.types.{DataType, LongType}

/** Majority vote over bigint labels with the LPA tie rule — the winner
  * is the most frequent label, ties broken to the SMALLEST label — as
  * ONE aggregate.
  *
  * Why it exists (the q_g17 scheduling-floor item): label propagation's
  * per-round update is classically TWO hash aggregates — count per
  * (node, label), then argmax per node — which is two Exchanges per
  * round on the engine's hottest iterative family. As a typed aggregate
  * the per-node label histogram accumulates MAP-SIDE (an open-addressed
  * long→long map bounded by the node's distinct neighbor labels, i.e.
  * its degree) and only the partial histograms shuffle, keyed on node
  * alone: one Exchange per round, half the scheduling floor. The vote
  * arithmetic is all-integer, so the result is bit-identical to the
  * two-aggregate form — [[graft.operators.LabelPropagation]]'s spec pins
  * the equivalence and the DuckDB oracles keep replaying the two-stage
  * counting.
  *
  * Determinism: counts are exact longs; `eval` scans the histogram once
  * comparing (count DESC, label ASC) — no floats, no ordering
  * sensitivity, merge is per-key addition (commutative/associative).
  */
case class MajorityLabel(
    labelExpr: Expression,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
    extends TypedImperativeAggregate[MajorityLabel.Histo] {

  import MajorityLabel._

  override def children: Seq[Expression] = Seq(labelExpr)

  override def nullable: Boolean = true

  override def dataType: DataType = LongType

  override def checkInputDataTypes(): TypeCheckResult =
    if (labelExpr.dataType == LongType) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires bigint labels, got ${labelExpr.dataType.simpleString}")

  override def prettyName: String = "majority_label"

  override def createAggregationBuffer(): Histo = new Histo()

  override def update(b: Histo, input: InternalRow): Histo = {
    val l = labelExpr.eval(input)
    if (l != null) b.add(l.asInstanceOf[Long], 1L)
    b
  }

  override def merge(b: Histo, other: Histo): Histo = {
    other.foreach((l, c) => b.add(l, c))
    b
  }

  override def eval(b: Histo): Any = b.argmax

  override def serialize(b: Histo): Array[Byte] = {
    val bos = new ByteArrayOutputStream()
    val out = new DataOutputStream(bos)
    out.writeInt(b.size)
    b.foreach { (l, c) => out.writeLong(l); out.writeLong(c) }
    out.flush()
    bos.toByteArray
  }

  override def deserialize(bytes: Array[Byte]): Histo = {
    val in = new DataInputStream(new ByteArrayInputStream(bytes))
    val n = in.readInt()
    val b = new Histo()
    var j = 0
    while (j < n) { b.add(in.readLong(), in.readLong()); j += 1 }
    b
  }

  override def withNewMutableAggBufferOffset(newOffset: Int): MajorityLabel =
    copy(mutableAggBufferOffset = newOffset)

  override def withNewInputAggBufferOffset(newOffset: Int): MajorityLabel =
    copy(inputAggBufferOffset = newOffset)

  override protected def withNewChildrenInternal(
      newChildren: IndexedSeq[Expression]): MajorityLabel =
    copy(labelExpr = newChildren(0))
}

object MajorityLabel {

  /** Open-addressed long→long histogram sized to the node's distinct
    * neighbor-label count (starts at 8, doubles; degree-bounded).
    * Labels may be any long EXCEPT the Long.MinValue sentinel, which
    * marks empty slots — node ids in this engine are non-negative keys,
    * and the operator validates nothing else maps there.
    */
  final class Histo {
    private final val EMPTY = Long.MinValue
    private var keys = Array.fill(8)(EMPTY)
    private var cnts = new Array[Long](8)
    private var n = 0

    def size: Int = n

    def add(label: Long, c: Long): Unit = {
      require(label != Long.MinValue, "Long.MinValue label unsupported")
      if (n * 4 >= keys.length * 3) grow()
      var i = index(label)
      while (keys(i) != EMPTY && keys(i) != label) i = (i + 1) & (keys.length - 1)
      if (keys(i) == EMPTY) { keys(i) = label; n += 1 }
      cnts(i) += c
    }

    private def index(label: Long): Int = {
      // splitmix64 finalizer scatter
      var x = label + 0x9e3779b97f4a7c15L
      x = (x ^ (x >>> 30)) * 0xbf58476d1ce4e5b9L
      x = (x ^ (x >>> 27)) * 0x94d049bb133111ebL
      ((x ^ (x >>> 31)) & (keys.length - 1)).toInt
    }

    private def grow(): Unit = {
      val ok = keys; val oc = cnts
      keys = Array.fill(ok.length * 2)(EMPTY)
      cnts = new Array[Long](ok.length * 2)
      n = 0
      var i = 0
      while (i < ok.length) {
        if (ok(i) != EMPTY) add(ok(i), oc(i))
        i += 1
      }
    }

    def foreach(f: (Long, Long) => Unit): Unit = {
      var i = 0
      while (i < keys.length) {
        if (keys(i) != EMPTY) f(keys(i), cnts(i))
        i += 1
      }
    }

    /** (count DESC, label ASC) winner; null when no votes arrived. */
    def argmax: Any = {
      if (n == 0) return null
      var bestL = 0L
      var bestC = -1L
      var i = 0
      while (i < keys.length) {
        if (keys(i) != EMPTY &&
          (cnts(i) > bestC || (cnts(i) == bestC && keys(i) < bestL))) {
          bestC = cnts(i)
          bestL = keys(i)
        }
        i += 1
      }
      bestL
    }
  }
}
