package graft.operators

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Z-order (Morton-code) clustering: interleave the bits of quantized
  * column ranks so that rows close in EVERY clustered dimension land in
  * the same partition, giving file-level pruning for conjunctive range
  * predicates over columns that are NOT the partition key.
  *
  * At 100 TB this is the layout answer to "we filter on (partkey,
  * quantity) but can only partition by one column": a k-bit-per-dim
  * Morton code makes one derived partition column serve every dimension
  * at once, and a d-dimensional box predicate touches only the codes
  * whose cell-box intersects it — enumerated driver-side (at most
  * 2^(bits·d) candidates, 64 for the default 3-bit × 2-dim layout) and
  * pushed as an IN-list partition filter that Catalyst turns into
  * directory pruning at the scan.
  *
  * The code columns are pure integer built-ins (shift/and/or), so the
  * write-side derivation whole-stage-codegens inside the scan — no UDF,
  * no shuffle beyond the partitioned write itself.
  *
  * Reference anchor: the reference has no storage layout at all (its
  * Dao keeps everything on the driver heap, Dao.java:40-75); this is
  * part of the engine's own 100 TB posture alongside
  * [[graft.sources.Layout]] bucketing.
  */
object ZOrder {

  /** Quantize `c` into 2^bits equal-width cells over [lo, hi], clamped.
    * Bounds come from a driver-side min/max (one tiny aggregate — the
    * same bounded pattern as the IVF/PQ fits).
    */
  def cell(c: Column, lo: Double, hi: Double, bits: Int): Column = {
    val n = 1 << bits
    val w = cellWidth(lo, hi, bits)
    least(lit(n - 1), greatest(lit(0), floor((c - lit(lo)) / lit(w)))).cast("int")
  }

  /** Morton code of the quantized cells: bit b of dim i lands at position
    * b·d + i. Dim 0 occupies the least-significant lane.
    */
  def zValue(cells: Seq[Column], bits: Int): Column = {
    val d = cells.size
    val terms = for {
      b <- 0 until bits
      (c, i) <- cells.zipWithIndex
    } yield shiftleft(shiftrightunsigned(c, b).bitwiseAND(lit(1)), b * d + i)
    terms.reduce(_.bitwiseOR(_)).cast("int")
  }

  // ---- driver-side mirrors (bit-identical: same IEEE double ops) ----

  private def cellWidth(lo: Double, hi: Double, bits: Int): Double = {
    val n = 1 << bits
    // strictly positive width so hi itself clamps into the top cell and a
    // degenerate (constant) column cannot divide by zero
    math.max((hi - lo) / n, java.lang.Double.MIN_NORMAL)
  }

  /** Driver-side mirror of [[cell]]. */
  def cellOf(v: Double, lo: Double, hi: Double, bits: Int): Int = {
    val n = 1 << bits
    math.min(n - 1, math.max(0, math.floor((v - lo) / cellWidth(lo, hi, bits)).toInt))
  }

  /** Driver-side mirror of [[zValue]]. */
  def zOf(cells: Seq[Int], bits: Int): Int = {
    val d = cells.size
    (for {
      b <- 0 until bits
      (c, i) <- cells.zipWithIndex
    } yield ((c >> b) & 1) << (b * d + i)).foldLeft(0)(_ | _)
  }

  /** Every Morton code whose cell-box intersects the conjunctive range
    * box `boxes(i) = (loᵢ, hiᵢ)` — the partition covering set to push as
    * an IN-list filter. Over-approximate by construction (codes may hold
    * out-of-box rows; the residual predicate still applies), never
    * under-approximate: a row inside the box always lands in a covered
    * code because write side and covering side share the same
    * quantization.
    */
  def coveringZ(
      boxes: Seq[(Double, Double)],
      los: Seq[Double],
      his: Seq[Double],
      bits: Int): Seq[Int] = {
    require(boxes.size == los.size && los.size == his.size)
    val d = boxes.size
    val cellRanges = boxes.zipWithIndex.map { case ((blo, bhi), i) =>
      (cellOf(blo, los(i), his(i), bits), cellOf(bhi, los(i), his(i), bits))
    }
    (0 until (1 << (bits * d))).filter { z =>
      cellRanges.zipWithIndex.forall { case ((cLo, cHi), i) =>
        val c = (0 until bits).map(b => ((z >> (b * d + i)) & 1) << b).foldLeft(0)(_ | _)
        c >= cLo && c <= cHi
      }
    }
  }
}
