package graft.expressions

import java.io.{ByteArrayInputStream, ByteArrayOutputStream, DataInputStream, DataOutputStream}

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.types.{DataType, LongType, StructField, StructType}

/** Per-node best Louvain local move as ONE aggregate — the
  * [[MajorityLabel]] trick generalized from majority vote to a weighted
  * argmax with exact integer gains (the q_g17 scheduling-floor cut
  * applied to the q_g12/q_g16 move phase).
  *
  * Why it exists: the move phase classically builds k_iC with a hash
  * aggregate over (node, neighboring community), reads it TWICE (once
  * for candidates, once for the node's own-community mass k_iA), then
  * threads a multi-join chain before the global argmax — several
  * Exchanges per move on the engine's heaviest sequential family. As a
  * typed aggregate the per-node (community → (Σ weight, D_C)) histogram
  * accumulates MAP-SIDE (bounded by the node's distinct neighboring
  * communities, i.e. its degree) and only partial histograms shuffle,
  * keyed on node alone: ONE Exchange per move, with k_iA read from the
  * same histogram at eval — no second pass, no self-join.
  *
  * Inputs per row (node-grouped): the neighbor's community `c`, the
  * edge weight `wt`, that community's degree mass `dcb`, the node's own
  * label `aLabel` and strength `d` (group constants, captured once).
  * `m` (total edge mass) is a constructor literal — a bounded driver
  * value in every caller.
  *
  * Eval scans the histogram once over candidates c ≠ aLabel maximizing
  * the node-local score s(c) = 4m·k_c − 2d·D_c with ties to the
  * SMALLEST community. The full gain
  * ΔQ·4m² = 4m·(k_c − k_A) − 2d·(D_c − D_A + d) differs from s(c) by a
  * per-node constant, so the per-node argmax (and its tie rule) is
  * IDENTICAL to taking the best row of the classic all-candidates
  * frame — spec-pinned against the unfused form. All integers: no
  * ordering sensitivity, merge is per-key addition.
  *
  * Output: struct(a_label, c, k, ka, d, dcb) of the node's best
  * candidate — gain and D_A attach outside (one |V|-row projection) —
  * or null when the node has no cross-community neighbor.
  */
case class BestMoveCandidate(
    cExpr: Expression,
    wtExpr: Expression,
    dcbExpr: Expression,
    aLabelExpr: Expression,
    dExpr: Expression,
    m: Long,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
    extends TypedImperativeAggregate[BestMoveCandidate.Buf] {

  import BestMoveCandidate._

  override def children: Seq[Expression] =
    Seq(cExpr, wtExpr, dcbExpr, aLabelExpr, dExpr)

  override def nullable: Boolean = true

  override val dataType: DataType = StructType(Seq(
    StructField("a_label", LongType, nullable = false),
    StructField("c", LongType, nullable = false),
    StructField("k", LongType, nullable = false),
    StructField("ka", LongType, nullable = false),
    StructField("d", LongType, nullable = false),
    StructField("dcb", LongType, nullable = false)))

  override def checkInputDataTypes(): TypeCheckResult =
    if (children.forall(_.dataType == LongType)) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires bigint inputs, got " +
        children.map(_.dataType.simpleString).mkString(", "))

  override def prettyName: String = "best_move_candidate"

  override def createAggregationBuffer(): Buf = new Buf()

  override def update(b: Buf, input: InternalRow): Buf = {
    val c = cExpr.eval(input)
    val wt = wtExpr.eval(input)
    val dcb = dcbExpr.eval(input)
    val aL = aLabelExpr.eval(input)
    val d = dExpr.eval(input)
    if (c != null && wt != null && dcb != null && aL != null && d != null) {
      b.setConsts(aL.asInstanceOf[Long], d.asInstanceOf[Long])
      b.add(c.asInstanceOf[Long], wt.asInstanceOf[Long], dcb.asInstanceOf[Long])
    }
    b
  }

  override def merge(b: Buf, other: Buf): Buf = {
    if (other.hasConsts) b.setConsts(other.aLabel, other.d)
    other.foreach((c, k, dcb) => b.add(c, k, dcb))
    b
  }

  override def eval(b: Buf): Any = b.best(m)

  override def serialize(b: Buf): Array[Byte] = {
    val bos = new ByteArrayOutputStream()
    val out = new DataOutputStream(bos)
    out.writeBoolean(b.hasConsts)
    if (b.hasConsts) { out.writeLong(b.aLabel); out.writeLong(b.d) }
    out.writeInt(b.size)
    b.foreach { (c, k, dcb) =>
      out.writeLong(c); out.writeLong(k); out.writeLong(dcb)
    }
    out.flush()
    bos.toByteArray
  }

  override def deserialize(bytes: Array[Byte]): Buf = {
    val in = new DataInputStream(new ByteArrayInputStream(bytes))
    val b = new Buf()
    if (in.readBoolean()) b.setConsts(in.readLong(), in.readLong())
    val n = in.readInt()
    var j = 0
    while (j < n) { b.add(in.readLong(), in.readLong(), in.readLong()); j += 1 }
    b
  }

  override def withNewMutableAggBufferOffset(newOffset: Int): BestMoveCandidate =
    copy(mutableAggBufferOffset = newOffset)

  override def withNewInputAggBufferOffset(newOffset: Int): BestMoveCandidate =
    copy(inputAggBufferOffset = newOffset)

  override protected def withNewChildrenInternal(
      newChildren: IndexedSeq[Expression]): BestMoveCandidate =
    copy(cExpr = newChildren(0), wtExpr = newChildren(1),
      dcbExpr = newChildren(2), aLabelExpr = newChildren(3),
      dExpr = newChildren(4))
}

object BestMoveCandidate {

  /** Open-addressed community → (Σ weight, D_C) histogram plus the
    * group's (aLabel, d) constants — degree-bounded, same memory
    * posture as [[MajorityLabel.Histo]]. Community ids are
    * engine-internal non-negative longs; Long.MinValue is the empty
    * sentinel.
    */
  final class Buf {
    private final val EMPTY = Long.MinValue
    private var keys = Array.fill(8)(EMPTY)
    private var ks = new Array[Long](8)
    private var dcbs = new Array[Long](8)
    private var n = 0
    var hasConsts = false
    var aLabel = 0L
    var d = 0L

    def size: Int = n

    def setConsts(a: Long, dd: Long): Unit =
      if (!hasConsts) { aLabel = a; d = dd; hasConsts = true }

    def add(c: Long, k: Long, dcb: Long): Unit = {
      require(c != Long.MinValue, "Long.MinValue community unsupported")
      if (n * 4 >= keys.length * 3) grow()
      var i = index(c)
      while (keys(i) != EMPTY && keys(i) != c) i = (i + 1) & (keys.length - 1)
      if (keys(i) == EMPTY) { keys(i) = c; n += 1 }
      ks(i) += k
      dcbs(i) = dcb // per-community constant within one move round
    }

    private def index(c: Long): Int = {
      var x = c + 0x9e3779b97f4a7c15L
      x = (x ^ (x >>> 30)) * 0xbf58476d1ce4e5b9L
      x = (x ^ (x >>> 27)) * 0x94d049bb133111ebL
      ((x ^ (x >>> 31)) & (keys.length - 1)).toInt
    }

    private def grow(): Unit = {
      val ok = keys; val oks = ks; val od = dcbs
      keys = Array.fill(ok.length * 2)(EMPTY)
      ks = new Array[Long](ok.length * 2)
      dcbs = new Array[Long](ok.length * 2)
      n = 0
      var i = 0
      while (i < ok.length) {
        if (ok(i) != EMPTY) add(ok(i), oks(i), od(i))
        i += 1
      }
    }

    def foreach(f: (Long, Long, Long) => Unit): Unit = {
      var i = 0
      while (i < keys.length) {
        if (keys(i) != EMPTY) f(keys(i), ks(i), dcbs(i))
        i += 1
      }
    }

    /** Best candidate c ≠ aLabel by (s(c) = 4m·k − 2d·dcb DESC, c ASC);
      * null when none exists. ka comes off the same histogram.
      */
    def best(m: Long): Any = {
      if (!hasConsts || n == 0) return null
      var ka = 0L
      var bestC = 0L
      var bestK = 0L
      var bestDcb = 0L
      var bestS = 0L
      var found = false
      var i = 0
      while (i < keys.length) {
        if (keys(i) != EMPTY) {
          if (keys(i) == aLabel) ka = ks(i)
          else {
            val s = 4L * m * ks(i) - 2L * d * dcbs(i)
            if (!found || s > bestS || (s == bestS && keys(i) < bestC)) {
              found = true
              bestS = s
              bestC = keys(i)
              bestK = ks(i)
              bestDcb = dcbs(i)
            }
          }
        }
        i += 1
      }
      if (!found) null
      else InternalRow(aLabel, bestC, bestK, ka, d, bestDcb)
    }
  }
}
