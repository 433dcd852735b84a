package graft.expressions

/** Baseline-sequential JPEG (ITU-T T.81 SOF0) pixel decode — the static
  * kernel behind [[JpegBaselinePixels]]: marker walk, DQT/DHT/DRI/SOF0/
  * SOS parse, the canonical Huffman DECODE procedure (T.81 F.2.2.3 with
  * MINCODE/MAXCODE/VALPTR), byte-stuffing-aware bit reading with restart
  * markers, per-block dequantize + 2-D IDCT, nearest-neighbor chroma
  * upsampling, and the JFIF YCbCr→RGB conversion.
  *
  * Decode contract (all deterministic, replayed by gate oracles):
  *   - IDCT: separable double-precision with the exact T.81 A.3.3 basis
  *     (Cu·cos((2x+1)uπ/16)/2 per pass); samples round as
  *     ⌊v + 128.5⌋ clamped to [0,255].
  *   - Color: R = Y + 1.402·(Cr−128), G = Y − 0.344136·(Cb−128)
  *     − 0.714136·(Cr−128), B = Y + 1.772·(Cb−128), each ⌊x+0.5⌋
  *     clamped — the JFIF §7 constants.
  *   - Chroma upsampling is sample REPLICATION (box), not libjpeg's
  *     "fancy" linear filter: the deterministic choice an oracle can
  *     replay; documented divergence from libjpeg renderings.
  *   - Strict failure: anything that is not an 8-bit baseline SOF0
  *     stream with 1 or 3 components decodes to null — progressive
  *     (SOF2), extended (SOF1), arithmetic coding, 16-bit quant tables,
  *     truncated entropy data, invalid Huffman prefixes, out-of-range
  *     coefficient runs, missing EOI, or a pixel count past `maxPixels`
  *     (bounded BEFORE any plane allocates — the decompression-bomb
  *     guard). No libjpeg-style pad-with-gray salvage.
  *
  * Scope boundary (SURVEY §8): this closes the JPEG-pixels stub for
  * baseline sequential files — the format's dominant profile; SOF2
  * progressive stays out of scope, documented there.
  */
object JpegCodec {

  private final class Malformed extends Exception(null, null, false, false)
  private val bad = new Malformed

  // T.81 A.3.3 basis, folded with the 1/2-per-pass normalization:
  // COS(u)(x) = Cu * cos((2x+1) u pi / 16) / 2, Cu = 1/sqrt(2) for u=0.
  private val COS: Array[Array[Double]] = Array.tabulate(8, 8) { (u, x) =>
    val cu = if (u == 0) 1.0 / math.sqrt(2.0) else 1.0
    cu * math.cos((2 * x + 1) * u * math.Pi / 16.0) / 2.0
  }

  private val ZIGZAG: Array[Int] = Array(
    0, 1, 8, 16, 9, 2, 3, 10, 17, 24, 32, 25, 18, 11, 4, 5,
    12, 19, 26, 33, 40, 48, 41, 34, 27, 20, 13, 6, 7, 14, 21, 28,
    35, 42, 49, 56, 57, 50, 43, 36, 29, 22, 15, 23, 30, 37, 44, 51,
    58, 59, 52, 45, 38, 31, 39, 46, 53, 60, 61, 54, 47, 55, 62, 63)

  /** Canonical Huffman table (T.81 C.2): decode via code-range compare
    * per length — O(16) worst case per symbol, no LUT allocation.
    */
  private final class Huff(counts: Array[Int], symbols: Array[Byte]) {
    val minCode = new Array[Int](17)
    val maxCode = Array.fill(17)(-1)
    val valPtr = new Array[Int](17)
    locally {
      var code = 0
      var k = 0
      var l = 1
      while (l <= 16) {
        if (counts(l - 1) > 0) {
          valPtr(l) = k
          minCode(l) = code
          code += counts(l - 1)
          k += counts(l - 1)
          maxCode(l) = code - 1
        }
        code <<= 1
        l += 1
      }
      if (k != symbols.length) throw bad
    }
    def decode(br: BitReader): Int = {
      var code = br.bit()
      var l = 1
      while (l <= 16) {
        if (maxCode(l) >= 0 && code <= maxCode(l))
          return symbols(valPtr(l) + code - minCode(l)) & 0xFF
        code = (code << 1) | br.bit()
        l += 1
      }
      throw bad // invalid prefix
    }
  }

  /** Entropy-segment bit reader: 0xFF 0x00 unstuffs to a data 0xFF; any
    * other 0xFF-marker mid-bits is an error EXCEPT when the MCU loop
    * consumes it as an expected restart. Truncation is an error.
    */
  private final class BitReader(data: Array[Byte], var pos: Int) {
    private var acc = 0
    private var cnt = 0
    private var pendingMarker = -1

    def bit(): Int = {
      if (cnt == 0) {
        if (pendingMarker >= 0 || pos >= data.length) throw bad
        var b = data(pos) & 0xFF
        pos += 1
        if (b == 0xFF) {
          if (pos >= data.length) throw bad
          val m = data(pos) & 0xFF
          pos += 1
          if (m != 0x00) { pendingMarker = m; throw bad }
          b = 0xFF
        }
        acc = b
        cnt = 8
      }
      cnt -= 1
      (acc >> cnt) & 1
    }

    def receive(s: Int): Int = {
      var v = 0
      var i = 0
      while (i < s) { v = (v << 1) | bit(); i += 1 }
      v
    }

    /** Byte-align and consume an expected restart marker RSTn. */
    def restart(n: Int): Unit = {
      cnt = 0
      if (pendingMarker < 0) {
        // marker not yet hit during bits — read it now
        if (pos + 1 >= data.length) throw bad
        if ((data(pos) & 0xFF) != 0xFF) throw bad
        pendingMarker = data(pos + 1) & 0xFF
        pos += 2
      }
      if (pendingMarker != 0xD0 + n) throw bad
      pendingMarker = -1
    }

    /** Byte-align and require the next marker to be EOI. */
    def expectEoi(): Unit = {
      cnt = 0
      if (pendingMarker < 0) {
        // skip fill bytes 0xFF before the marker code
        if (pos + 1 >= data.length) throw bad
        if ((data(pos) & 0xFF) != 0xFF) throw bad
        var p = pos + 1
        while (p < data.length && (data(p) & 0xFF) == 0xFF) p += 1
        if (p >= data.length) throw bad
        pendingMarker = data(p) & 0xFF
      }
      if (pendingMarker != 0xD9) throw bad
    }
  }

  private def extend(v: Int, s: Int): Int =
    if (s == 0) 0 else if (v < (1 << (s - 1))) v - (1 << s) + 1 else v

  /** Dequantized coefficients (natural order) → 8x8 spatial samples
    * appended into `plane` at (bx*8, by*8) of a `pw`-wide sample plane.
    */
  private def idctToPlane(
      coef: Array[Double], plane: Array[Int], pw: Int, px0: Int, py0: Int): Unit = {
    // coef is natural order: index u*8+v, u = VERTICAL frequency (row),
    // v = HORIZONTAL frequency (col). Pass 1 transforms the horizontal
    // frequency axis into spatial columns: tmp[u][cx] = Σv COS(v)(cx)·F[u][v]
    val tmp = new Array[Double](64)
    var u = 0
    while (u < 8) {
      var cx = 0
      while (cx < 8) {
        var s = 0.0
        var v = 0
        while (v < 8) { s += COS(v)(cx) * coef(u * 8 + v); v += 1 }
        tmp(u * 8 + cx) = s
        cx += 1
      }
      u += 1
    }
    // pass 2: rows — f[ry][cx] = Σu COS(u)(ry)·tmp[u][cx]
    var ry = 0
    while (ry < 8) {
      var cx = 0
      while (cx < 8) {
        var s = 0.0
        var uu = 0
        while (uu < 8) { s += COS(uu)(ry) * tmp(uu * 8 + cx); uu += 1 }
        var q = math.floor(s + 128.5).toInt
        if (q < 0) q = 0 else if (q > 255) q = 255
        plane((py0 + ry) * pw + (px0 + cx)) = q
        cx += 1
      }
      ry += 1
    }
  }

  private def clampByte(v: Double): Int = {
    var q = math.floor(v + 0.5).toInt
    if (q < 0) q = 0 else if (q > 255) q = 255
    q
  }

  private final case class Comp(
      id: Int, h: Int, v: Int, tq: Int,
      var dcTab: Int = 0, var acTab: Int = 0, var pred: Int = 0)

  def baselinePixels(bytes: Array[Byte], maxPixels: Int): Array[Byte] =
    try decode(bytes, maxPixels) catch { case _: Malformed => null }

  // scalastyle:off method.length cyclomatic.complexity
  private def decode(data: Array[Byte], maxPixels: Int): Array[Byte] = {
    if (data == null || data.length < 4) throw bad
    def u8(p: Int): Int = {
      if (p >= data.length) throw bad
      data(p) & 0xFF
    }
    def u16(p: Int): Int = (u8(p) << 8) | u8(p + 1)
    if (u8(0) != 0xFF || u8(1) != 0xD8) throw bad

    val qt = Array.ofDim[Int](4, 64) // natural order
    val qtSeen = new Array[Boolean](4)
    val dcTabs = new Array[Huff](4)
    val acTabs = new Array[Huff](4)
    var comps: Array[Comp] = null
    var w = 0
    var h = 0
    var dri = 0
    var pos = 2

    var scanning = true
    while (scanning) {
      if (u8(pos) != 0xFF) throw bad
      var p = pos + 1
      while (u8(p) == 0xFF) p += 1 // fill bytes
      val marker = u8(p)
      pos = p + 1
      marker match {
        case 0xD9 => throw bad // EOI before SOS
        case 0xC0 => // SOF0 baseline
          val len = u16(pos)
          if (u8(pos + 2) != 8) throw bad // precision
          h = u16(pos + 3); w = u16(pos + 5)
          val nf = u8(pos + 7)
          if (w < 1 || h < 1 || (nf != 1 && nf != 3)) throw bad
          if (w.toLong * h > maxPixels) throw bad
          if (len != 8 + 3 * nf) throw bad
          comps = Array.tabulate(nf) { i =>
            val o = pos + 8 + 3 * i
            val hv = u8(o + 1)
            val c = Comp(u8(o), hv >> 4, hv & 0xF, u8(o + 2))
            if (c.h < 1 || c.h > 4 || c.v < 1 || c.v > 4 || c.tq > 3) throw bad
            c
          }
          pos += len
        case m if (m >= 0xC1 && m <= 0xCF) && m != 0xC4 && m != 0xC8 && m != 0xCC =>
          throw bad // non-baseline SOF (progressive, extended, arithmetic…)
        case 0xC4 => // DHT
          val len = u16(pos)
          var o = pos + 2
          val end = pos + len
          while (o < end) {
            val tcth = u8(o)
            val tc = tcth >> 4
            val th = tcth & 0xF
            if (tc > 1 || th > 3) throw bad
            val counts = Array.tabulate(16)(i => u8(o + 1 + i))
            val n = counts.sum
            if (n == 0 || n > 256 || o + 17 + n > end) throw bad
            val syms = new Array[Byte](n)
            var i = 0
            while (i < n) { syms(i) = data(o + 17 + i); i += 1 }
            val t = new Huff(counts, syms)
            if (tc == 0) dcTabs(th) = t else acTabs(th) = t
            o += 17 + n
          }
          pos += len
        case 0xDB => // DQT
          val len = u16(pos)
          var o = pos + 2
          val end = pos + len
          while (o < end) {
            val pqtq = u8(o)
            if ((pqtq >> 4) != 0) throw bad // 16-bit tables: not baseline
            val tq = pqtq & 0xF
            if (tq > 3 || o + 65 > end) throw bad
            var i = 0
            while (i < 64) { qt(tq)(ZIGZAG(i)) = u8(o + 1 + i); i += 1 }
            qtSeen(tq) = true
            o += 65
          }
          pos += len
        case 0xDD => // DRI
          if (u16(pos) != 4) throw bad
          dri = u16(pos + 2)
          pos += 4
        case 0xDA => // SOS — entropy data follows
          if (comps == null) throw bad
          val len = u16(pos)
          val ns = u8(pos + 2)
          if (ns != comps.length || len != 6 + 2 * ns) throw bad
          var i = 0
          while (i < ns) {
            val cs = u8(pos + 3 + 2 * i)
            val c = comps.find(_.id == cs).getOrElse(throw bad)
            val tdta = u8(pos + 4 + 2 * i)
            c.dcTab = tdta >> 4
            c.acTab = tdta & 0xF
            if (c.dcTab > 3 || c.acTab > 3) throw bad
            i += 1
          }
          // baseline spectral selection: Ss=0, Se=63, AhAl=0
          if (u8(pos + 3 + 2 * ns) != 0 || u8(pos + 4 + 2 * ns) != 63 ||
            u8(pos + 5 + 2 * ns) != 0) throw bad
          pos += len
          scanning = false
        case m if (m >= 0xE0 && m <= 0xEF) || m == 0xFE => // APPn / COM
          pos += u16(pos)
        case _ => throw bad
      }
    }

    comps.foreach(c => if (!qtSeen(c.tq)) throw bad)
    val maxH = comps.map(_.h).max
    val maxV = comps.map(_.v).max
    comps.foreach { c =>
      if (maxH % c.h != 0 || maxV % c.v != 0) throw bad
      if (dcTabs(c.dcTab) == null || acTabs(c.acTab) == null) throw bad
    }
    val mcusX = (w + 8 * maxH - 1) / (8 * maxH)
    val mcusY = (h + 8 * maxV - 1) / (8 * maxV)

    // per-component sample planes at the component's own resolution,
    // padded to whole MCUs; bounded by maxPixels * (maxH*maxV) per comp
    val planeW = comps.map(c => mcusX * 8 * c.h)
    val planeH = comps.map(c => mcusY * 8 * c.v)
    val planes = comps.indices.map { i =>
      val n = planeW(i).toLong * planeH(i)
      if (n > 4L * maxPixels + 4096L) throw bad
      new Array[Int](n.toInt)
    }.toArray

    val br = new BitReader(data, pos)
    val coef = new Array[Double](64)
    var rstN = 0
    var mcusSinceRestart = 0
    var my = 0
    while (my < mcusY) {
      var mx = 0
      while (mx < mcusX) {
        if (dri > 0 && mcusSinceRestart == dri) {
          comps.foreach(_.pred = 0)
          br.restart(rstN)
          rstN = (rstN + 1) & 7
          mcusSinceRestart = 0
        }
        var ci = 0
        while (ci < comps.length) {
          val c = comps(ci)
          val q = qt(c.tq)
          var bv = 0
          while (bv < c.v) {
            var bh = 0
            while (bh < c.h) {
              java.util.Arrays.fill(coef, 0.0)
              val s = dcTabs(c.dcTab).decode(br)
              if (s > 11) throw bad
              c.pred += extend(br.receive(s), s)
              coef(0) = c.pred.toDouble * q(0)
              var k = 1
              var open = true
              while (open && k < 64) {
                val rs = acTabs(c.acTab).decode(br)
                val r = rs >> 4
                val sz = rs & 0xF
                if (sz == 0) {
                  if (r == 15) k += 16 else open = false // ZRL / EOB
                } else {
                  k += r
                  if (k > 63) throw bad
                  coef(ZIGZAG(k)) = extend(br.receive(sz), sz).toDouble * q(ZIGZAG(k))
                  k += 1
                }
              }
              idctToPlane(coef, planes(ci), planeW(ci),
                (mx * c.h + bh) * 8, (my * c.v + bv) * 8)
              bh += 1
            }
            bv += 1
          }
          ci += 1
        }
        mcusSinceRestart += 1
        mx += 1
      }
      my += 1
    }
    br.expectEoi()

    // assemble output: gray passthrough or YCbCr -> RGB with
    // nearest-neighbor (replicated) chroma upsampling
    if (comps.length == 1) {
      val out = new Array[Byte](w * h)
      var y = 0
      while (y < h) {
        var x = 0
        while (x < w) {
          out(y * w + x) = planes(0)(y * planeW(0) + x).toByte
          x += 1
        }
        y += 1
      }
      out
    } else {
      val out = new Array[Byte](w * h * 3)
      val hs = comps.map(c => maxH / c.h)
      val vs = comps.map(c => maxV / c.v)
      var y = 0
      while (y < h) {
        var x = 0
        while (x < w) {
          val yy = planes(0)((y / vs(0)) * planeW(0) + x / hs(0)).toDouble
          val cb = planes(1)((y / vs(1)) * planeW(1) + x / hs(1)).toDouble
          val cr = planes(2)((y / vs(2)) * planeW(2) + x / hs(2)).toDouble
          val o = (y * w + x) * 3
          out(o) = clampByte(yy + 1.402 * (cr - 128.0)).toByte
          out(o + 1) = clampByte(
            yy - 0.344136 * (cb - 128.0) - 0.714136 * (cr - 128.0)).toByte
          out(o + 2) = clampByte(yy + 1.772 * (cb - 128.0)).toByte
          x += 1
        }
        y += 1
      }
      out
    }
  }
  // scalastyle:on method.length cyclomatic.complexity
}
