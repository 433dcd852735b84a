package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Multimodal (image/audio/video) column handling for training-data
  * pipelines: media travels as an opaque `binary` payload column plus a
  * typed metadata struct; decode / feature-extraction / frame-sampling are
  * per-row transforms that scale embarrassingly (no shuffle — the only
  * cluster concern is partition *balance*, handled by hash repartitioning
  * on the id before heavy decode stages).
  *
  * The container has no media codecs, so COMPRESSED decode steps are
  * STUBS: a deterministic synthetic "decoder" marked [STUB] below stands
  * in where libjpeg/ffmpeg would be called. Everything around it —
  * schema, batch shape, partitioning, null handling — is real and
  * tested, so swapping a real codec in is a one-function change. Two
  * layers decode for REAL, no codec library, no UDF, pure codegen
  * built-ins:
  *
  *  - HEADERS across the whole container family: [[decodePngMeta]],
  *    [[decodeGifMeta]], [[decodeBmpMeta]] and [[decodeWavMeta]] read
  *    fixed-offset headers, and [[decodeJpegMeta]] walks JPEG's
  *    variable-position marker chain with the `aggregate` HOF.
  *  - CONTENT of the uncompressed containers: [[wavSampleStats]] reads
  *    the actual PCM frames (per-channel RMS/peak/clipping — the
  *    silent/clipped-clip cut) and [[bmpPixelStats]] the actual 24-bpp
  *    pixel rows (per-channel means/extremes and the blank-image cut) —
  *    fixed-layout byte-slice integer arithmetic, the same discipline
  *    as the header parsers.
  *  - CONTENT of DEFLATE-compressed PNGs — REAL decompression, not a
  *    stub: [[decodePngPixels]] runs the zlib inflate (adler-verified)
  *    and the five-filter scanline reconstruction through the native
  *    codegen expression [[graft.expressions.PngUnfilteredPixels]];
  *    [[pngPixelStats]] and [[pngAHash]] put the decoded pixels through
  *    the same stats/near-dup machinery as the BMP layer.
  *
  * What remains stubbed is decode of payloads whose codecs are genuine
  * signal-processing libraries (JPEG pixels, MP3/OGG audio, video
  * codecs) — those need libjpeg/ffmpeg; the container/entropy-coding
  * layer (chunk walks, marker walks, box walks, DEFLATE) is real.
  */
object Multimodal {

  /** REAL PNG header decode — not a stub. Parses the 8-byte PNG signature
    * and the IHDR chunk that immediately follows it (PNG spec §5.2/§11.2.2:
    * IHDR is always the first chunk, so width/height/bit-depth/color-type
    * sit at fixed byte offsets 16-25). Returns a struct
    * `(width, height, bit_depth, color_type, channels)` or NULL when the
    * payload is absent, too short, or not a PNG — a real decoder's failure
    * path.
    *
    * Implemented entirely with codegen built-ins (`substring`/`hex`/`conv`
    * on the binary column): no UDF, stays inside whole-stage codegen, and
    * every derived value is replayable by any engine that can slice bytes —
    * which is how the q_m4 gate oracle checks it. At 100 TB this is a pure
    * scan-side expression like the text-quality filters: dimension/aspect
    * filtering happens before any shuffle or (stubbed) pixel decode.
    */
  def decodePngMeta(payload: Column): Column = {
    // big-endian unsigned int of `len` bytes at 1-based offset `pos` —
    // kept as BIGINT: a corrupt 4-byte field with the high bit set is
    // 2^31..2^32-1, which an int cast would THROW on under ANSI mode
    // (Spark 4 default) instead of taking the null path below
    def be(pos: Int, len: Int): Column =
      conv(hex(substring(payload, pos, len)), 16, 10).cast("bigint")
    val sigOk  = hex(substring(payload, 1, 8)) === lit("89504E470D0A1A0A")
    val ihdrOk = hex(substring(payload, 13, 4)) === lit("49484452") // "IHDR"
    val w = be(17, 4)
    val h = be(21, 4)
    // PNG spec: width/height are 1..2^31-1; a zero or high-bit value is a
    // corrupt/hostile header → decode failure (null), never a crash
    val dimsOk = w >= 1L && w <= Int.MaxValue.toLong &&
      h >= 1L && h <= Int.MaxValue.toLong
    val colorType = be(26, 1).cast("int") // one byte — always int-safe
    // PNG color types: 0 greyscale, 2 truecolor, 3 indexed(palette),
    // 4 grey+alpha, 6 truecolor+alpha; anything else → null channels.
    val channels = element_at(
      typedlit(Map(0 -> 1, 2 -> 3, 3 -> 1, 4 -> 2, 6 -> 4)), colorType)
    when(payload.isNotNull && length(payload) >= 26 && sigOk && ihdrOk && dimsOk,
      struct(
        w.cast("int").as("width"),
        h.cast("int").as("height"),
        be(25, 1).cast("int").as("bit_depth"),
        colorType.as("color_type"),
        channels.as("channels")))
      .otherwise(lit(null))
  }

  /** Little-endian unsigned integer of `len` bytes at 1-based offset
    * `pos` — the GIF/BMP twin of the big-endian reader in
    * [[decodePngMeta]]. Kept BIGINT for the same ANSI-overflow reason.
    */
  private def le(payload: Column, pos: Int, len: Int): Column =
    (0 until len)
      .map(i => conv(hex(substring(payload, pos + i, 1)), 16, 10).cast("bigint")
        * lit(1L << (8 * i)))
      .reduce(_ + _)

  /** REAL GIF header decode — not a stub. Parses the 6-byte signature
    * ("GIF87a"/"GIF89a") and the Logical Screen Descriptor that always
    * follows it (GIF89a spec §17-18: width/height are little-endian u16
    * at offsets 7-10; the packed byte at 11 carries the global-color-table
    * flag and size). Returns `(width, height, version, gct_size)` — gct
    * size is the entry count 2^(bits+1), or 0 when no global table — or
    * NULL for absent/short/non-GIF payloads.
    *
    * Pure codegen built-ins like [[decodePngMeta]]: byte slices + integer
    * arithmetic, no UDF, scan-side at any scale.
    */
  def decodeGifMeta(payload: Column): Column = {
    val sig = hex(substring(payload, 1, 6))
    val sigOk = sig === lit("474946383761") || sig === lit("474946383961")
    val w = le(payload, 7, 2)
    val h = le(payload, 9, 2)
    val packed = le(payload, 11, 1).cast("int")
    val gctSize = when(packed.bitwiseAND(lit(0x80)) =!= 0,
      element_at(
        typedlit(Seq(2, 4, 8, 16, 32, 64, 128, 256)),
        packed.bitwiseAND(lit(7)) + 1)).otherwise(lit(0))
    when(payload.isNotNull && length(payload) >= 13 && sigOk && w >= 1L && h >= 1L,
      struct(
        w.cast("int").as("width"),
        h.cast("int").as("height"),
        substring(payload, 4, 3).cast("string").as("version"),
        gctSize.cast("int").as("gct_size")))
      .otherwise(lit(null))
  }

  /** REAL BMP header decode — not a stub. Parses the "BM" signature and
    * the DIB info header (BITMAPINFOHEADER and its V4/V5 extensions all
    * share the first 40 bytes): width/height are little-endian 32-bit at
    * offsets 19/23, bits-per-pixel u16 at 29. A negative stored height
    * (two's complement) is the spec's top-down marker and is normalized,
    * surfaced as `top_down`. Returns
    * `(width, height, top_down, bits_per_pixel)` or NULL for
    * absent/short/non-BMP payloads or a pre-Info (core) header.
    */
  def decodeBmpMeta(payload: Column): Column = {
    val sigOk = hex(substring(payload, 1, 2)) === lit("424D")
    val dibSize = le(payload, 15, 4)
    val w = le(payload, 19, 4)
    val hRaw = le(payload, 23, 4)
    val hNeg = hRaw >= lit(2147483648L)
    val h = when(hNeg, lit(4294967296L) - hRaw).otherwise(hRaw)
    val bpp = le(payload, 29, 2).cast("int")
    when(payload.isNotNull && length(payload) >= 30 && sigOk && dibSize >= 40L &&
        w >= 1L && w <= Int.MaxValue.toLong && h >= 1L && h <= Int.MaxValue.toLong,
      struct(
        w.cast("int").as("width"),
        h.cast("int").as("height"),
        hNeg.as("top_down"),
        bpp.as("bits_per_pixel")))
      .otherwise(lit(null))
  }

  /** REAL WAV (RIFF/PCM) header decode — not a stub, and the first AUDIO
    * container with a real parse (pixel/sample decode stays stubbed; the
    * header doesn't need a codec). Parses the canonical PCM layout
    * (RIFF spec: "RIFF" + size + "WAVE", then a 16-byte "fmt " chunk —
    * audio format u16, channels u16, sample rate u32, byte rate u32,
    * block align u16, bits per sample u16, all little-endian): returns
    * `(channels, sample_rate, bits_per_sample, n_samples, duration_us)`
    * or NULL for absent/short/non-RIFF/non-canonical-PCM payloads
    * (compressed formats, extensible fmt). `n_samples`/`duration_us`
    * additionally require the "data" chunk at the canonical offset 37
    * and derive by INTEGER arithmetic (`data_size / block_align`,
    * `n_samples · 1e6 / sample_rate` floored) so the value is engine-
    * portable; they are NULL (inside a non-null struct) when the data
    * chunk is elsewhere. Internal consistency is enforced the way a real
    * demuxer would: byte rate and block align must agree with
    * channels·bits/8, else the header is corrupt → NULL.
    *
    * Pure codegen built-ins like the image decoders: byte slices +
    * integer arithmetic, no UDF, scan-side at any scale — audio corpus
    * filtering (sample-rate/channel/duration cuts) happens before any
    * shuffle or (stubbed) sample decode.
    */
  def decodeWavMeta(payload: Column): Column = {
    val riffOk = hex(substring(payload, 1, 4)) === lit("52494646") // "RIFF"
    val waveOk = hex(substring(payload, 9, 4)) === lit("57415645") // "WAVE"
    val fmtOk  = hex(substring(payload, 13, 4)) === lit("666D7420") // "fmt "
    val fmtSize = le(payload, 17, 4)
    val audioFormat = le(payload, 21, 2)
    val channels = le(payload, 23, 2)
    val sampleRate = le(payload, 25, 4)
    val byteRate = le(payload, 29, 4)
    val blockAlign = le(payload, 33, 2)
    val bits = le(payload, 35, 2)
    val consistent = blockAlign === channels * (bits / 8L) &&
      byteRate === sampleRate * blockAlign
    val dataOk = length(payload) >= 44 &&
      hex(substring(payload, 37, 4)) === lit("64617461") // "data"
    val dataSize = le(payload, 41, 4)
    // Column `/` is double division — floor back to exact integers (all
    // operands < 2^32, so the double path is value-exact)
    val nSamples = floor(dataSize / blockAlign).cast("bigint")
    when(payload.isNotNull && length(payload) >= 36 && riffOk && waveOk &&
        fmtOk && fmtSize === 16L && audioFormat === 1L &&
        channels >= 1L && sampleRate >= 1L && bits.isin(8L, 16L, 24L, 32L) &&
        consistent,
      struct(
        channels.cast("int").as("channels"),
        sampleRate.cast("int").as("sample_rate"),
        bits.cast("int").as("bits_per_sample"),
        when(dataOk, nSamples).as("n_samples"),
        when(dataOk, floor(nSamples * 1000000L / sampleRate).cast("bigint"))
          .as("duration_us")))
      .otherwise(lit(null))
  }

  /** REAL JPEG header decode — not a stub, and not fixed-offset either:
    * JPEG keeps its dimensions inside a Start-Of-Frame segment at a
    * variable position, behind the APP/DQT/COM segments that precede it.
    * This decoder WALKS the marker chain — up to `maxSegments` segments,
    * each `FF <marker> <be16 length> <payload>` — with the `aggregate`
    * higher-order function folding a cursor struct over a constant
    * `sequence`: still a single scan-side codegen expression, no UDF.
    * The walk stops at SOF0/1/2 (baseline, extended-sequential,
    * progressive — what JFIF encoders emit) and extracts
    * `(width, height, num_components)` from the frame header; it aborts
    * to NULL on a broken chain, SOS/EOI before any SOF, or exhaustion.
    * Scans after SOS are never touched, so entropy-coded data (where
    * length-less RST markers live) cannot derail it.
    */
  def decodeJpegMeta(payload: Column, maxSegments: Int = 16): Column = {
    def byteAt(pos: Column): Column =
      conv(hex(substring(payload, pos, lit(1))), 16, 10).cast("bigint")
    def be16(pos: Column): Column =
      conv(hex(substring(payload, pos, lit(2))), 16, 10).cast("bigint")
    def cursor(pos: Column, w: Column, h: Column, nc: Column): Column =
      struct(pos.cast("int").as("pos"), w.cast("int").as("w"),
        h.cast("int").as("h"), nc.cast("int").as("nc"))
    val nullInt = lit(null).cast("int")
    val init = cursor(lit(3), nullInt, nullInt, nullInt)
    val walked = aggregate(
      sequence(lit(1), lit(maxSegments)),
      init,
      (acc, _) => {
        val pos = acc.getField("pos")
        val done = acc.getField("w").isNotNull || pos.isNull
        val m1 = byteAt(pos)
        val m2 = byteAt(pos + 1)
        val isSof = m1 === 255L && (m2 === 192L || m2 === 193L || m2 === 194L)
        // SOS (scan data follows — no more headers) / EOI / not a marker
        val isStop = m1 =!= 255L || m2 === 218L || m2 === 217L
        val next = pos + 2 + be16(pos + 2)
        when(done, acc)
          .when(isSof, cursor(pos, be16(pos + 7), be16(pos + 5), byteAt(pos + 9)))
          .when(isStop || next > length(payload), cursor(nullInt, nullInt, nullInt, nullInt))
          .otherwise(cursor(next, nullInt, nullInt, nullInt))
      })
    val sigOk = hex(substring(payload, 1, 2)) === lit("FFD8")
    val w = walked.getField("w")
    val h = walked.getField("h")
    when(payload.isNotNull && length(payload) >= 4 && sigOk &&
        w.isNotNull && w >= 1 && h >= 1,
      struct(
        w.as("width"),
        h.as("height"),
        walked.getField("nc").as("num_components")))
      .otherwise(lit(null))
  }

  /** EXIF orientation from a JPEG's APP1 segment (TIFF 6.0 + EXIF 2.x)
    * — the one EXIF field an image-curation pass cannot skip: a camera
    * that stored the sensor raster unrotated marks the intended
    * rotation/mirror here (values 1–8), and a perceptual hash or
    * resize that ignores it silently mismatches visually identical
    * images (the reason [[bmpAHash]] normalizes orientation).
    *
    * The read is the q_m6 JPEG marker walk retargeted at APP1
    * (`FF E1 <len> "Exif\0\0"`), then a SECOND fold over the IFD0
    * directory entries — and it is ENDIANNESS-DEPENDENT: the TIFF
    * header's "II"/"MM" mark decides whether every u16/u32 in the IFD
    * reads little- or big-endian, so both byte orders are implemented
    * as hex-slice reassembly and selected per row. Entry scan stops at
    * tag 0x0112 (type SHORT, value inline in the first 2 value bytes).
    * Returns 1–8, or NULL when there is no APP1 before SOS, the Exif
    * magic/TIFF header is malformed, or IFD0 lacks the tag. Still one
    * scan-side codegen expression: two bounded folds, no UDF.
    */
  def jpegExifOrientation(
      payload: Column, maxSegments: Int = 16, maxIfdEntries: Int = 24): Column = {
    def byteAt(pos: Column): Column =
      conv(hex(substring(payload, pos, lit(1))), 16, 10).cast("bigint")
    def be16(pos: Column): Column =
      conv(hex(substring(payload, pos, lit(2))), 16, 10).cast("bigint")
    def le16(pos: Column): Column =
      conv(concat(hex(substring(payload, pos + 1, lit(1))),
        hex(substring(payload, pos, lit(1)))), 16, 10).cast("bigint")
    def le32(pos: Column): Column =
      conv(concat(
        hex(substring(payload, pos + 3, lit(1))),
        hex(substring(payload, pos + 2, lit(1))),
        hex(substring(payload, pos + 1, lit(1))),
        hex(substring(payload, pos, lit(1)))), 16, 10).cast("bigint")
    def be32(pos: Column): Column =
      conv(hex(substring(payload, pos, lit(4))), 16, 10).cast("bigint")

    // fold 1: marker walk to the APP1 position (FF byte), q_m6 discipline
    val nullInt = lit(null).cast("int")
    def cur(pos: Column, found: Column): Column =
      struct(pos.cast("int").as("pos"), found.cast("int").as("found"))
    val app1 = aggregate(
      sequence(lit(1), lit(maxSegments)),
      cur(lit(3), nullInt),
      (acc, _) => {
        val pos = acc.getField("pos")
        val done = acc.getField("found").isNotNull || pos.isNull
        val m1 = byteAt(pos)
        val m2 = byteAt(pos + 1)
        val isApp1 = m1 === 255L && m2 === 225L
        val isStop = m1 =!= 255L || m2 === 218L || m2 === 217L
        val next = pos + 2 + be16(pos + 2)
        when(done, acc)
          .when(isApp1, cur(pos, pos))
          .when(isStop || next > length(payload), cur(nullInt, nullInt))
          .otherwise(cur(next, nullInt))
      }).getField("found").cast("bigint")

    // HOF lambdas don't CSE (the hof.bind lesson): every downstream
    // reference to the APP1 fold — and every PER-ELEMENT reference from
    // inside the IFD fold — would re-run the 16-step marker walk, so the
    // walk result and the TIFF context are LET-BOUND once per row
    // (unbound this gate measured 15 s at sf0.1; bound it is scan-cheap)
    val out = graft.functions.hof.bind(app1) { a1 =>
      val exifOk = hex(substring(payload, a1 + 4, lit(6))) === lit("457869660000")
      val tb = a1 + 10 // TIFF header base
      val order = hex(substring(payload, tb, lit(2)))
      val isLe = order === lit("4949")
      val tiffOk = (isLe && le16(tb + 2) === 42L) ||
        (order === lit("4D4D") && be16(tb + 2) === 42L)
      def u16(pos: Column): Column = when(isLe, le16(pos)).otherwise(be16(pos))
      def u32(pos: Column): Column = when(isLe, le32(pos)).otherwise(be32(pos))
      val ifd0 = tb + u32(tb + 4)
      graft.functions.hof.bind(struct(
        ifd0.as("ifd0"), u16(ifd0).as("n"), isLe.as("le"),
        (a1.isNotNull && exifOk && tiffOk).as("ok"))) { c =>
        val ifd = c.getField("ifd0")
        val n = c.getField("n")
        def u16i(pos: Column): Column =
          when(c.getField("le"), le16(pos)).otherwise(be16(pos))
        // fold 2: scan IFD0 entries for tag 0x0112 (SHORT, inline value)
        val orient = aggregate(
          sequence(lit(0), lit(maxIfdEntries - 1)),
          lit(null).cast("bigint"),
          (acc, i) => {
            val e = ifd + 2 + i.cast("bigint") * 12
            val hit = i.cast("bigint") < n &&
              u16i(e) === 274L && u16i(e + 2) === 3L
            when(acc.isNotNull, acc).when(hit, u16i(e + 8)).otherwise(acc)
          })
        when(c.getField("ok") && orient >= 1L && orient <= 8L,
          orient.cast("int"))
          .otherwise(lit(null).cast("int"))
      }
    }
    when(payload.isNotNull && length(payload) >= 4 &&
        hex(substring(payload, 1, 2)) === lit("FFD8"),
      out)
      .otherwise(lit(null).cast("int"))
  }

  /** REAL TIFF (TIFF 6.0) header decode — the SEVENTH container format,
    * and the one whose structure the EXIF machinery already speaks: a
    * standalone TIFF is the byte-order mark (`II`/`MM`) + magic 42 + a
    * u32 offset to IFD0, whose 12-byte entries carry the image facts as
    * (tag, type, count, value-or-offset) records — exactly the IFD the
    * q_m15 APP1 walk scans, minus the JPEG wrapping. One `aggregate`
    * fold over IFD0 accumulates the five curation-relevant tags in a
    * single pass (the orientation-fold discipline, generalized to a
    * multi-field accumulator):
    * 0x0100 ImageWidth / 0x0101 ImageLength (SHORT or LONG, inline),
    * 0x0102 BitsPerSample (inline when count 1; count 3 = RGB stores an
    * OFFSET to three u16s — the decoder follows it for the first
    * sample, one bounded read), 0x0103 Compression and 0x0115
    * SamplesPerPixel (SHORT inline). Endianness is selected PER ROW
    * from the byte-order mark, the q_m15 lesson.
    *
    * Returns `(byte_order, n_entries, width, height, bits_per_sample,
    * compression, samples_per_pixel)`; NULL when not a structurally
    * valid TIFF: wrong mark/magic, zero entries, or an entry table
    * running past EOF. Tags absent from a valid IFD yield NULL fields,
    * not a NULL row — partial metadata is still metadata. Pure codegen
    * byte-slice built-ins, zero UDF, zero shuffle.
    */
  def decodeTiffMeta(payload: Column, maxIfdEntries: Int = 24): Column = {
    def be16(pos: Column): Column =
      conv(hex(substring(payload, pos, lit(2))), 16, 10).cast("bigint")
    def le16(pos: Column): Column =
      conv(concat(hex(substring(payload, pos + 1, lit(1))),
        hex(substring(payload, pos, lit(1)))), 16, 10).cast("bigint")
    def be32(pos: Column): Column =
      conv(hex(substring(payload, pos, lit(4))), 16, 10).cast("bigint")
    def le32(pos: Column): Column =
      conv(concat(
        hex(substring(payload, pos + 3, lit(1))),
        hex(substring(payload, pos + 2, lit(1))),
        hex(substring(payload, pos + 1, lit(1))),
        hex(substring(payload, pos, lit(1)))), 16, 10).cast("bigint")

    val order = hex(substring(payload, 1, 2))
    val isLe = order === lit("4949")
    val magicOk = (isLe && le16(lit(3)) === 42L) ||
      (order === lit("4D4D") && be16(lit(3)) === 42L)
    def u16(pos: Column): Column = when(isLe, le16(pos)).otherwise(be16(pos))
    def u32(pos: Column): Column = when(isLe, le32(pos)).otherwise(be32(pos))

    val nullB = lit(null).cast("bigint")
    def tags(w: Column, h: Column, bps: Column, comp: Column, spp: Column): Column =
      struct(w.as("w"), h.as("h"), bps.as("bps"), comp.as("comp"), spp.as("spp"))

    val out = graft.functions.hof.bind(struct(
      (u32(lit(5)) + 1L).as("ifd0"),
      u16(u32(lit(5)) + 1L).as("n"),
      isLe.as("le"))) { c =>
      val ifd = c.getField("ifd0")
      val n = c.getField("n")
      def u16i(pos: Column): Column =
        when(c.getField("le"), le16(pos)).otherwise(be16(pos))
      def u32i(pos: Column): Column =
        when(c.getField("le"), le32(pos)).otherwise(be32(pos))
      val found = aggregate(
        sequence(lit(0), lit(maxIfdEntries - 1)),
        tags(nullB, nullB, nullB, nullB, nullB),
        (acc, i) => {
          val e = ifd + 2L + i.cast("bigint") * 12L
          val tag = u16i(e)
          val typ = u16i(e + 2)
          val cnt = u32i(e + 4)
          // SHORT inline / LONG inline; SHORT count-3 (RGB bps) follows
          // the offset for the first sample — one bounded read
          val inline = when(typ === 3L && cnt === 1L, u16i(e + 8))
            .when(typ === 4L && cnt === 1L, u32i(e + 8))
          val bpsVal = when(typ === 3L && cnt === 1L, u16i(e + 8))
            .when(typ === 3L && cnt === 3L, u16i(u32i(e + 8) + 1L))
          val live = i.cast("bigint") < n
          tags(
            when(live && tag === 256L && acc.getField("w").isNull, inline)
              .otherwise(acc.getField("w")),
            when(live && tag === 257L && acc.getField("h").isNull, inline)
              .otherwise(acc.getField("h")),
            when(live && tag === 258L && acc.getField("bps").isNull, bpsVal)
              .otherwise(acc.getField("bps")),
            when(live && tag === 259L && acc.getField("comp").isNull, inline)
              .otherwise(acc.getField("comp")),
            when(live && tag === 277L && acc.getField("spp").isNull, inline)
              .otherwise(acc.getField("spp")))
        })
      graft.functions.hof.bind(found) { f =>
        val ok = magicOk && n >= 1L &&
          ifd + 1L + n * 12L <= length(payload).cast("bigint")
        when(ok, struct(
          when(isLe, lit("II")).otherwise(lit("MM")).as("byte_order"),
          n.cast("int").as("n_entries"),
          f.getField("w").as("width"),
          f.getField("h").as("height"),
          f.getField("bps").cast("int").as("bits_per_sample"),
          f.getField("comp").cast("int").as("compression"),
          f.getField("spp").cast("int").as("samples_per_pixel")))
      }
    }
    when(payload.isNotNull && length(payload) >= 8, out)
  }

  /** REAL MP3 / MPEG-audio frame-header decode (ISO 11172-3 / 13818-3)
    * — the compressed-audio container next to WAV's PCM and FLAC's
    * STREAMINFO: an MP3 is an optional ID3v2 tag (10-byte header + a
    * SYNCSAFE 28-bit size — 7 data bits per byte, the decoder
    * reassembles them) followed by frames whose 4-byte header packs
    * everything curation needs in BIT FIELDS: 11-bit sync, 2-bit
    * version (MPEG1/2/2.5 — value 1 reserved), 2-bit layer (I/II/III —
    * 0 reserved), 4-bit bitrate INDEX and 2-bit sample-rate index into
    * version/layer-dependent tables, padding bit, 2-bit channel mode.
    * The decoder skips the ID3 tag, validates the first frame header,
    * resolves the table lookups (arrays with CLAMPED element_at — an
    * out-of-range index under ANSI would throw even from a dead branch
    * if a subexpression pass hoisted it, the q_m16 lesson), and derives
    * frame_bytes, samples_per_frame, and the CBR duration estimate
    * (audio_bytes·8000 / bitrate_bps, exact integer division) — the
    * cuts an audio-corpus curation pass actually makes.
    *
    * Returns `(id3_size, version_id, layer, bitrate_kbps, sample_rate,
    * channels, padding, frame_bytes, samples_per_frame,
    * est_duration_ms)`; NULL when the first post-tag header is not a
    * valid frame: bad sync, reserved version/layer, free (0) or bad
    * (15) bitrate index, reserved sample-rate index, or a file too
    * short to hold the header. `version_id` is 10·MPEG-version (10/20/
    * 25) to stay integral. VBR files carry a correct FIRST frame and a
    * wrong duration estimate — the documented CBR contract (a Xing
    * header walk is the natural extension). Pure codegen byte-slice
    * built-ins, zero UDF, zero shuffle.
    */
  def decodeMp3Meta(payload: Column): Column = {
    def byteAt(pos: Column): Column =
      conv(hex(substring(payload, pos, lit(1))), 16, 10).cast("bigint")
    val plen = length(payload).cast("bigint")

    val hasId3 = length(payload) >= 10 &&
      substring(payload, 1, 3) === lit("ID3").cast("binary")
    // syncsafe 28-bit size: 7 data bits per byte, MSB first
    val id3Size = when(hasId3,
      lit(10L) + byteAt(lit(7)).bitwiseAND(lit(127L)) * 2097152L +
        byteAt(lit(8)).bitwiseAND(lit(127L)) * 16384L +
        byteAt(lit(9)).bitwiseAND(lit(127L)) * 128L +
        byteAt(lit(10)).bitwiseAND(lit(127L)))
      .otherwise(lit(0L))

    val out = graft.functions.hof.bind(id3Size) { tag =>
      val h = tag + 1L // 1-based header position
      val b1 = byteAt(h)
      val b2 = byteAt(h + 1L)
      val b3 = byteAt(h + 2L)
      val b4 = byteAt(h + 3L)
      val ver = shiftright(b2.cast("int"), 3).cast("bigint").bitwiseAND(lit(3L))
      val lay = shiftright(b2.cast("int"), 1).cast("bigint").bitwiseAND(lit(3L))
      val brIdx = shiftright(b3.cast("int"), 4).cast("bigint").bitwiseAND(lit(15L))
      val srIdx = shiftright(b3.cast("int"), 2).cast("bigint").bitwiseAND(lit(3L))
      val pad = shiftright(b3.cast("int"), 1).cast("bigint").bitwiseAND(lit(1L))
      val mode = shiftright(b4.cast("int"), 6).cast("bigint").bitwiseAND(lit(3L))
      val syncOk = b1 === 255L && b2.bitwiseAND(lit(224L)) === 224L
      val ok = plen >= tag + 4L && syncOk &&
        ver =!= 1L && lay =!= 0L && brIdx =!= 0L && brIdx =!= 15L && srIdx =!= 3L

      val isV1 = ver === 3L
      val isL1 = lay === 3L
      val isL2 = lay === 2L
      def tab(vals: Int*): Column = array(vals.map(v => lit(v.toLong)): _*)
      // clamped index: brIdx in [1,14] whenever ok; clamp anyway so the
      // lookup can never throw from a speculatively-evaluated branch
      val bi = greatest(least(brIdx, lit(14L)), lit(1L)).cast("int")
      val bitrate =
        when(isV1 && isL1, element_at(tab(32, 64, 96, 128, 160, 192, 224, 256, 288, 320, 352, 384, 416, 448), bi))
          .when(isV1 && isL2, element_at(tab(32, 48, 56, 64, 80, 96, 112, 128, 160, 192, 224, 256, 320, 384), bi))
          .when(isV1, element_at(tab(32, 40, 48, 56, 64, 80, 96, 112, 128, 160, 192, 224, 256, 320), bi))
          .when(isL1, element_at(tab(32, 48, 56, 64, 80, 96, 112, 128, 144, 160, 176, 192, 224, 256), bi))
          .otherwise(element_at(tab(8, 16, 24, 32, 40, 48, 56, 64, 80, 96, 112, 128, 144, 160), bi))
      val si = (srIdx.bitwiseAND(lit(3L)) + 1L).cast("int")
      // 4th (reserved) slot repeats a real rate so no dead-branch
      // division can ever see a zero denominator (ok is false there)
      val sampleRate =
        when(ver === 3L, element_at(tab(44100, 48000, 32000, 32000), si))
          .when(ver === 2L, element_at(tab(22050, 24000, 16000, 16000), si))
          .otherwise(element_at(tab(11025, 12000, 8000, 8000), si))
      val samplesPerFrame =
        when(isL1, lit(384L)).when(isL2, lit(1152L))
          .when(isV1, lit(1152L)).otherwise(lit(576L))
      // frame bytes: L1 in 4-byte slots; L2/L3 byte-granular; L3 on
      // MPEG2/2.5 uses the 576-sample (72·br) size
      val brBps = bitrate * 1000L
      // exact floored integer division: (x − x%y) is divisible by y, so
      // the double division is exact for integers < 2^53 (q_m14 rule)
      def idiv(a: Column, b: Column): Column =
        ((a - a % b) / b).cast("bigint")
      val frameBytes =
        when(isL1, (idiv(lit(12L) * brBps, sampleRate) + pad) * 4L)
          .when(isL2 || isV1, idiv(lit(144L) * brBps, sampleRate) + pad)
          .otherwise(idiv(lit(72L) * brBps, sampleRate) + pad)
      val audioBytes = plen - tag
      val durMs = idiv(audioBytes * 8L, brBps) * 1000L +
        idiv((audioBytes * 8L % brBps) * 1000L, brBps)
      when(ok, struct(
        tag.as("id3_size"),
        when(ver === 3L, lit(10)).when(ver === 2L, lit(20)).otherwise(lit(25))
          .as("version_id"),
        (lit(4L) - lay).cast("int").as("layer"),
        bitrate.cast("int").as("bitrate_kbps"),
        sampleRate.cast("int").as("sample_rate"),
        when(mode === 3L, lit(1)).otherwise(lit(2)).as("channels"),
        pad.cast("int").as("padding"),
        frameBytes.cast("bigint").as("frame_bytes"),
        samplesPerFrame.cast("int").as("samples_per_frame"),
        durMs.cast("bigint").as("est_duration_ms")))
    }
    when(payload.isNotNull && length(payload) >= 4, out)
  }

  /** REAL MP4 / ISO-BMFF (ISO 14496-12) metadata decode — the VIDEO
    * container next to the five image/audio formats: an MP4 is a chain
    * of boxes `[be32 size][4cc type][payload]`, with the movie header
    * (`mvhd` — timescale, duration) nested inside the `moov` box at a
    * VARIABLE position behind whatever `free`/`mdat`/`udta` boxes the
    * muxer emitted. Two marker walks in the q_m6 JPEG discipline — one
    * `aggregate` fold over the top-level chain to locate `moov`, one
    * over moov's children to locate `mvhd` — then fixed-offset
    * big-endian reads for both mvhd versions (v0: 32-bit times at body
    * +12, v1: 64-bit at body +20/+24). Returns
    * `(major_brand, mvhd_version, timescale, duration, duration_us)`
    * or NULL when the file is not a plausible MP4: no leading `ftyp`,
    * a box with size < 8 or past EOF before `moov`, no `mvhd` child,
    * an unknown mvhd version, or timescale 0. 64-bit `largesize`
    * boxes (size field 1) and to-EOF boxes (size 0) abort to NULL —
    * landing-zone clips are bounded, a >4 GiB box is not a clip.
    *
    * `duration_us` divides exact DECIMALs and floors (a v1 duration is
    * 64-bit — the double path would round above 2^53), so the value is
    * engine-replayable to the bit. Pure codegen built-ins, zero UDF,
    * zero shuffle: video corpus filtering (duration/brand cuts) stays
    * scan-side at 100 TB like every other decoder in this family.
    */
  def decodeMp4Meta(payload: Column, maxBoxes: Int = 12): Column = {
    def be32(pos: Column): Column =
      conv(hex(substring(payload, pos, lit(4))), 16, 10).cast("bigint")
    def be64(pos: Column): Column =
      conv(hex(substring(payload, pos, lit(8))), 16, 10).cast("bigint")
    def byteAt(pos: Column): Column =
      conv(hex(substring(payload, pos, lit(1))), 16, 10).cast("bigint")
    def fourCc(pos: Column): Column = hex(substring(payload, pos, lit(4)))
    val plen = length(payload).cast("bigint")

    // fold 1: walk the top-level chain to the `moov` box.
    // cursor: (pos, found) — found carries moov's 1-based position
    val nullLong = lit(null).cast("bigint")
    def cur(pos: Column, found: Column): Column =
      struct(pos.cast("bigint").as("pos"), found.cast("bigint").as("found"))
    def walk(from: Column, limit: Column, target: String): Column =
      aggregate(
        sequence(lit(1), lit(maxBoxes)),
        cur(from, nullLong),
        (acc, _) => {
          val pos = acc.getField("pos")
          val done = acc.getField("found").isNotNull || pos.isNull
          val size = be32(pos)
          val isTarget = fourCc(pos + 4) === lit(target)
          val broken = size < 8L || pos + size > plen + 1L
          when(done, acc)
            .when(pos + 8L > limit + 1L, cur(nullLong, nullLong)) // chain exhausted
            .when(broken, cur(nullLong, nullLong))
            .when(isTarget, cur(pos, pos))
            .otherwise(cur(pos + size, nullLong))
        }).getField("found")

    // ftyp is the first box by spec; the moov search starts right after
    // it. Both walk results are LET-BOUND (hof.bind): HOF lambdas don't
    // CSE, so an unbound `moovEnd` referenced from inside the child walk
    // would re-run the whole top-level walk once PER CHILD BOX, and each
    // field read would re-run both walks once per reference.
    val ftypOk = plen >= 16L && be32(lit(1)) >= 16L &&
      fourCc(lit(5)) === lit("66747970") // "ftyp"
    graft.functions.hof.bind(
      walk(be32(lit(1)) + 1L, plen, "6D6F6F76")) { moovPos => // "moov"
      graft.functions.hof.bind(
        walk(moovPos + 8L, moovPos + be32(moovPos) - 1L, "6D766864")) { mvhdPos => // "mvhd"
        val ver = byteAt(mvhdPos + 8L)
        graft.functions.hof.bind(struct(
          ver.as("ver"),
          when(ver === 0L, be32(mvhdPos + 20L)).otherwise(be32(mvhdPos + 28L)).as("ts"),
          when(ver === 0L, be32(mvhdPos + 24L)).otherwise(be64(mvhdPos + 32L)).as("dur"),
          (payload.isNotNull && ftypOk && moovPos.isNotNull && mvhdPos.isNotNull &&
            when(ver === 0L, length(payload) >= mvhdPos + 27L)
              .otherwise(length(payload) >= mvhdPos + 39L)).as("ok"))) { c =>
          val ts = c.getField("ts")
          val dur = c.getField("dur")
          // Floored EXACT integer division, replayable to the bit. The
          // naive floor(dur*1e6/ts) is wrong in decimal space: Spark caps
          // the quotient scale at 6 and rounds HALF_UP, so for
          // ts >= 2e6 a fraction within 5e-7 of 1 rounds up BEFORE the
          // floor. Instead subtract the modulus first — both divisions
          // below are of exact multiples of ts, so the decimal engine
          // cannot round: duration_us = (dur div ts)*1e6 + (rem*1e6 div ts).
          val durD = dur.cast("decimal(38,0)")
          val tsD = ts.cast("decimal(19,0)")
          val remD = pmod(durD, tsD)
          val remUs = (remD * lit(1000000L)).cast("decimal(38,0)")
          val durUs =
            (((durD - remD) / tsD).cast("decimal(38,0)") * lit(1000000L) +
              ((remUs - pmod(remUs, tsD)) / tsD).cast("decimal(38,0)"))
              .cast("bigint")
          when(c.getField("ok") && c.getField("ver").isin(0L, 1L) && ts >= 1L,
            struct(
              decode(substring(payload, 9, 4), "UTF-8").as("major_brand"),
              c.getField("ver").cast("int").as("mvhd_version"),
              ts.cast("bigint").as("timescale"),
              dur.cast("bigint").as("duration"),
              durUs.as("duration_us")))
            .otherwise(lit(null))
        }
      }
    }
  }

  /** REAL WAV PCM SAMPLE decode — the payload is no longer opaque: this
    * reads the actual frames of the canonical-layout PCM file that
    * [[decodeWavMeta]] validates and emits the per-channel content
    * statistics an audio curation pass filters on (silent / clipped
    * clips): `array<struct(channel, n_frames, rms, peak, n_clipped,
    * clipping_rate)>`, one entry per channel, or NULL when the header is
    * invalid or the data chunk is not at the canonical offset.
    *
    * Sample semantics follow the WAV spec: 8-bit PCM is UNSIGNED with a
    * 128 center (v = byte − 128); 16/24/32-bit are SIGNED little-endian
    * two's complement. A sample clips at the exact rail values
    * 2^(bits−1)−1 / −2^(bits−1) (8-bit: byte 255 / 0). Everything up to
    * the final divisions is exact integer arithmetic — Σv² folds through
    * DECIMAL(38,0) (a 32-bit rail squared is 2^62; a long accumulator
    * would wrap two samples in), peak is max|v|, clip count an integer —
    * so `rms = sqrt(Σv²/n)` and `clipping_rate = clips/n` are
    * engine-replayable to the bit, the q_m8 oracle discipline extended
    * from headers to CONTENT.
    *
    * Scale contract: cost is O(frames·channels) per row with the frame
    * loop as one codegen `aggregate` fold per channel — embarrassingly
    * parallel, zero shuffle, zero UDF. The fold materializes a
    * `sequence` of frame indices per row, so payloads must be bounded
    * clips (the landing-zone shape — long recordings arrive pre-chunked);
    * `maxFrames` caps the scan defensively (stats cover the first
    * `maxFrames` frames, reported in `n_frames`) so one rogue
    * hour-long file cannot allocate a 100M-slot array in an executor.
    */
  def wavSampleStats(payload: Column, maxFrames: Int = 1 << 20): Column = {
    val channels = le(payload, 23, 2)
    val bits = le(payload, 35, 2)
    val blockAlign = le(payload, 33, 2)
    val byteRate = le(payload, 29, 4)
    val sampleRate = le(payload, 25, 4)
    val consistent = blockAlign === channels * (bits / 8L) &&
      byteRate === sampleRate * blockAlign
    val headerOk = length(payload) >= 44 &&
      hex(substring(payload, 1, 4)) === lit("52494646") &&
      hex(substring(payload, 9, 4)) === lit("57415645") &&
      hex(substring(payload, 13, 4)) === lit("666D7420") &&
      le(payload, 17, 4) === 16L && le(payload, 21, 2) === 1L &&
      channels >= 1L && sampleRate >= 1L && bits.isin(8L, 16L, 24L, 32L) &&
      consistent &&
      hex(substring(payload, 37, 4)) === lit("64617461")
    val dataSize = least(le(payload, 41, 4), length(payload).cast("bigint") - 44L)
    // guarded division: `used` feeds the outer WHEN's PREDICATE, which
    // evaluates even for malformed headers — an unguarded 0 blockAlign
    // would make floor(x/0)=floor(Inf) fault the ANSI bigint cast
    val nFrames = when(blockAlign >= 1L,
      floor(dataSize / blockAlign).cast("bigint")).otherwise(lit(0L))
    // least() SKIPS nulls (the q_m23 lesson): a 34-43-byte payload has a
    // readable blockAlign but a NULL dataSize -> nFrames NULL -> an
    // unguarded least() returns the CAP and the fold runs maxFrames
    // no-op steps per malformed row
    val used = when(nFrames.isNotNull, least(nFrames, lit(maxFrames.toLong)))
      .otherwise(lit(0L))
    // HOF lambdas re-evaluate non-lambda subtrees PER ELEMENT (the
    // winnowing lesson — graft.functions.hof), and every header field
    // here is a string-op chain over the payload: unbound, the sample
    // fold re-parsed the fmt chunk per sample and ran 30× slow. Bind
    // the header ONCE per row; lambda-variable field reads are slot
    // lookups.
    val hdr = struct(
      channels.as("ch"), bits.as("bits"), blockAlign.as("ba"),
      (bits / 8L).cast("bigint").as("bp"),
      element_at(
        typedlit(Map(8 -> 128L, 16 -> 32768L, 24 -> 8388608L, 32 -> 2147483648L)),
        bits.cast("int")).as("half"),
      used.as("used"))
    val perChannelBound = graft.functions.hof.bind(hdr) { h =>
      val hBits = h.getField("bits")
      val hHalf = h.getField("half")
      val hUsed = h.getField("used")
      // one substring+hex+conv per SAMPLE (not per byte): read the
      // sample big-endian and byte-swap arithmetically to little-endian
      def sampleAt(frame: Column, ch: Column): Column = {
        val off = lit(45L) + frame * h.getField("ba") +
          ch.cast("bigint") * h.getField("bp")
        val be = conv(hex(substring(payload, off, h.getField("bp"))), 16, 10)
          .cast("bigint")
        val raw = when(hBits === 8L, be)
          .when(hBits === 16L,
            be.bitwiseAND(lit(255L)) * 256L + shiftright(be, 8))
          .when(hBits === 24L,
            be.bitwiseAND(lit(255L)) * 65536L +
              shiftright(be, 8).bitwiseAND(lit(255L)) * 256L +
              shiftright(be, 16))
          .otherwise(
            be.bitwiseAND(lit(255L)) * 16777216L +
              shiftright(be, 8).bitwiseAND(lit(255L)) * 65536L +
              shiftright(be, 16).bitwiseAND(lit(255L)) * 256L +
              shiftright(be, 24))
        when(hBits === 8L, raw - 128L)
          .otherwise(when(raw >= hHalf, raw - hHalf * 2L).otherwise(raw))
      }
      val zero = struct(
        lit(new java.math.BigDecimal(0)).cast("decimal(38,0)").as("sq"),
        lit(0L).as("peak"), lit(0L).as("clips"))
      transform(sequence(lit(0), (h.getField("ch") - 1L).cast("int")), c => {
        // decode each sample ONCE into a value array; the stats fold then
        // touches only the lambda variable (three refs of a slot read,
        // not three re-decodes)
        val vals = transform(sequence(lit(0L), hUsed - 1L), f => sampleAt(f, c))
        val folded = aggregate(
          vals,
          zero,
          (acc, v) => struct(
            (acc.getField("sq") + (v * v).cast("decimal(38,0)"))
              .cast("decimal(38,0)").as("sq"),
            greatest(acc.getField("peak"), abs(v)).as("peak"),
            (acc.getField("clips") +
              when(v === hHalf - 1L || v === -hHalf, 1L).otherwise(0L)).as("clips")))
        struct(
          c.cast("int").as("channel"),
          hUsed.as("n_frames"),
          sqrt(folded.getField("sq").cast("double") / hUsed.cast("double")).as("rms"),
          folded.getField("peak").as("peak"),
          folded.getField("clips").as("n_clipped"),
          (folded.getField("clips").cast("double") / hUsed.cast("double"))
            .as("clipping_rate"))
      })
    }
    when(payload.isNotNull && headerOk && used >= 1L, perChannelBound)
      .otherwise(lit(null))
  }

  /** Per-channel ZERO-CROSSING RATE and SILENCE statistics over real
    * PCM frames — the frequency-content companion to
    * [[wavSampleStats]]'s amplitude stats: ZCR separates tonal/voiced
    * audio (low) from noise/fricatives (high), and the silence rate is
    * the "is there anything here at all" cut an audio curation pipeline
    * applies before any model sees the clip. One struct per channel:
    * `(channel, n_frames, n_zero_crossings, zcr, n_silent,
    * silence_rate)` — a crossing is STRICT sign opposition between
    * consecutive frames (prev·cur < 0; zeros break runs but never
    * count), `zcr` = crossings / (n−1) (NULL for single-frame clips),
    * and a frame is silent when |v| ≤ halfScale / `silenceDenom`
    * (integer division — at 8-bit the threshold is 0, exact silence
    * only). All counts exact integers; same header contract and NULL
    * behavior as [[wavSampleStats]].
    *
    * Scale contract: the [[wavSampleStats]] shape — header bound once,
    * samples decoded ONCE into a bound value array, one index fold per
    * channel reading only slot lookups. Zero shuffle, zero UDF.
    */
  def wavZeroCrossings(
      payload: Column,
      maxFrames: Int = 1 << 20,
      silenceDenom: Long = 1000L): Column = {
    require(silenceDenom >= 1L, "silenceDenom must be positive")
    val channels = le(payload, 23, 2)
    val bits = le(payload, 35, 2)
    val blockAlign = le(payload, 33, 2)
    val byteRate = le(payload, 29, 4)
    val sampleRate = le(payload, 25, 4)
    val consistent = blockAlign === channels * (bits / 8L) &&
      byteRate === sampleRate * blockAlign
    val headerOk = length(payload) >= 44 &&
      hex(substring(payload, 1, 4)) === lit("52494646") &&
      hex(substring(payload, 9, 4)) === lit("57415645") &&
      hex(substring(payload, 13, 4)) === lit("666D7420") &&
      le(payload, 17, 4) === 16L && le(payload, 21, 2) === 1L &&
      channels >= 1L && sampleRate >= 1L && bits.isin(8L, 16L, 24L, 32L) &&
      consistent &&
      hex(substring(payload, 37, 4)) === lit("64617461")
    val dataSize = least(le(payload, 41, 4), length(payload).cast("bigint") - 44L)
    val nFrames = when(blockAlign >= 1L,
      floor(dataSize / blockAlign).cast("bigint")).otherwise(lit(0L))
    // least() SKIPS nulls (the q_m23 lesson): a 34-43-byte payload has a
    // readable blockAlign but a NULL dataSize -> nFrames NULL -> an
    // unguarded least() returns the CAP and the fold runs maxFrames
    // no-op steps per malformed row
    val used = when(nFrames.isNotNull, least(nFrames, lit(maxFrames.toLong)))
      .otherwise(lit(0L))
    val hdr = struct(
      channels.as("ch"), bits.as("bits"), blockAlign.as("ba"),
      (bits / 8L).cast("bigint").as("bp"),
      element_at(
        typedlit(Map(8 -> 128L, 16 -> 32768L, 24 -> 8388608L, 32 -> 2147483648L)),
        bits.cast("int")).as("half"),
      used.as("used"))
    val perChannelBound = graft.functions.hof.bind(hdr) { h =>
      val hBits = h.getField("bits")
      val hHalf = h.getField("half")
      val hUsed = h.getField("used")
      val thr = floor(hHalf / lit(silenceDenom)).cast("bigint")
      def sampleAt(frame: Column, ch: Column): Column = {
        val off = lit(45L) + frame * h.getField("ba") +
          ch.cast("bigint") * h.getField("bp")
        val be = conv(hex(substring(payload, off, h.getField("bp"))), 16, 10)
          .cast("bigint")
        val raw = when(hBits === 8L, be)
          .when(hBits === 16L,
            be.bitwiseAND(lit(255L)) * 256L + shiftright(be, 8))
          .when(hBits === 24L,
            be.bitwiseAND(lit(255L)) * 65536L +
              shiftright(be, 8).bitwiseAND(lit(255L)) * 256L +
              shiftright(be, 16))
          .otherwise(
            be.bitwiseAND(lit(255L)) * 16777216L +
              shiftright(be, 8).bitwiseAND(lit(255L)) * 65536L +
              shiftright(be, 16).bitwiseAND(lit(255L)) * 256L +
              shiftright(be, 24))
        when(hBits === 8L, raw - 128L)
          .otherwise(when(raw >= hHalf, raw - hHalf * 2L).otherwise(raw))
      }
      transform(sequence(lit(0), (h.getField("ch") - 1L).cast("int")), c =>
        graft.functions.hof.bind(
          transform(sequence(lit(0L), hUsed - 1L), f => sampleAt(f, c))) { vals =>
          val folded = aggregate(
            sequence(lit(1L), hUsed),
            struct(lit(0L).as("zc"), lit(0L).as("sil")),
            (acc, i) => {
              val cur = element_at(vals, i.cast("int"))
              // greatest(…,1): i=1 has no predecessor — the i>1 guard
              // discards the read, but ANSI element_at(0) would fault
              val prev = element_at(vals, greatest(i - 1L, lit(1L)).cast("int"))
              struct(
                (acc.getField("zc") + when(
                  i > 1L && ((prev < 0L && cur > 0L) || (prev > 0L && cur < 0L)),
                  1L).otherwise(0L)).as("zc"),
                (acc.getField("sil") + when(abs(cur) <= thr, 1L).otherwise(0L))
                  .as("sil"))
            })
          struct(
            c.cast("int").as("channel"),
            hUsed.as("n_frames"),
            folded.getField("zc").as("n_zero_crossings"),
            when(hUsed >= 2L,
              folded.getField("zc").cast("double") / (hUsed - 1L).cast("double"))
              .as("zcr"),
            folded.getField("sil").as("n_silent"),
            (folded.getField("sil").cast("double") / hUsed.cast("double"))
              .as("silence_rate"))
        })
    }
    when(payload.isNotNull && headerOk && used >= 1L, perChannelBound)
      .otherwise(lit(null))
  }

  /** REAL BMP PIXEL decode — per-channel content statistics over the
    * actual pixel rows of a 24-bpp uncompressed BMP: one struct
    * `(n_pixels, b_mean, b_min, b_max, g_mean, g_min, g_max, r_mean,
    * r_min, r_max, is_blank)` or NULL for invalid/non-24bpp payloads.
    * `is_blank` (every channel constant) is the image-side twin of the
    * silent-clip filter — the thing an LLM image pipeline actually cuts.
    *
    * The walk honors the REAL layout: pixel data starts at the header's
    * own data-offset field (bytes 11-14 — not a hardcoded 54, so files
    * with gap bytes decode correctly), rows are padded to 4-byte
    * boundaries (stride = ⌊(3w+3)/4⌋·4 — the padding bytes must be
    * SKIPPED or every stat drifts), pixels are stored B,G,R. A negative
    * stored height (top-down marker) is normalized exactly as in
    * [[decodeBmpMeta]]; channel statistics are orientation-independent
    * so both orientations fold identically. Sums are exact integers
    * (≤255·n_pixels), means one final division — engine-replayable.
    *
    * Scale contract: one codegen `aggregate` fold over a per-row pixel
    * `sequence` (single pass, all three channels in one accumulator) —
    * zero shuffle, zero UDF; `maxPixels` caps the per-row scan (stats
    * then cover the first `maxPixels` pixels in row-major storage
    * order, reported in `n_pixels`).
    */
  def bmpPixelStats(payload: Column, maxPixels: Int = 1 << 22): Column = {
    val sigOk = hex(substring(payload, 1, 2)) === lit("424D")
    val dataOffset = le(payload, 11, 4)
    val dibSize = le(payload, 15, 4)
    val w = le(payload, 19, 4)
    val hRaw = le(payload, 23, 4)
    val hNeg = hRaw >= lit(2147483648L)
    val h = when(hNeg, lit(4294967296L) - hRaw).otherwise(hRaw)
    val bpp = le(payload, 29, 2)
    val stride = floor((w * 3L + 3L) / 4L).cast("bigint") * 4L
    val headerOk = length(payload) >= 30 && sigOk && dibSize >= 40L &&
      w >= 1L && w <= Int.MaxValue.toLong && h >= 1L && h <= Int.MaxValue.toLong &&
      bpp === 24L &&
      // DOUBLE comparison: h·stride for an absurd-but-in-range corrupt
      // header (w=h=2^31−1) overflows ANSI bigint multiply; the double
      // form is overflow-free and exact for every real file size
      length(payload).cast("double") >=
        dataOffset.cast("double") + h.cast("double") * stride.cast("double")
    // null-guarded (the q_m23 least()-null lesson): a <22-byte payload
    // has NULL dims and least() would size the fold at the cap
    val nPix = when(w.isNotNull && h.isNotNull,
      least(w * h, lit(maxPixels.toLong)))
    val zero = struct(
      lit(0L).as("bs"), lit(255L).as("bmin"), lit(0L).as("bmax"),
      lit(0L).as("gs"), lit(255L).as("gmin"), lit(0L).as("gmax"),
      lit(0L).as("rs"), lit(255L).as("rmin"), lit(0L).as("rmax"))
    // geometry bound ONCE per row (the hof lesson: an unbound fold
    // re-parsed dataOffset/w/stride — twelve string ops — per PIXEL),
    // and all three channels read with ONE substring+conv per pixel:
    // stored order B,G,R makes B the big-endian high byte
    val geo = struct(
      dataOffset.as("off"), w.as("w"), stride.as("stride"), nPix.as("npix"))
    val folded = graft.functions.hof.bind(geo) { g =>
      val pix = transform(sequence(lit(0L), g.getField("npix") - 1L), i => {
        val row = floor(i / g.getField("w")).cast("bigint")
        val xcol = i - row * g.getField("w")
        val base = g.getField("off") + row * g.getField("stride") + xcol * 3L + 1L
        conv(hex(substring(payload, base, lit(3))), 16, 10).cast("bigint")
      })
      aggregate(
        pix,
        zero,
        (acc, p) => {
          val b = shiftright(p, 16)
          val gc = shiftright(p, 8).bitwiseAND(lit(255L))
          val r = p.bitwiseAND(lit(255L))
          struct(
            (acc.getField("bs") + b).as("bs"),
            least(acc.getField("bmin"), b).as("bmin"),
            greatest(acc.getField("bmax"), b).as("bmax"),
            (acc.getField("gs") + gc).as("gs"),
            least(acc.getField("gmin"), gc).as("gmin"),
            greatest(acc.getField("gmax"), gc).as("gmax"),
            (acc.getField("rs") + r).as("rs"),
            least(acc.getField("rmin"), r).as("rmin"),
            greatest(acc.getField("rmax"), r).as("rmax"))
        })
    }
    def mean(s: Column): Column = s.cast("double") / nPix.cast("double")
    when(payload.isNotNull && headerOk,
      struct(
        nPix.as("n_pixels"),
        mean(folded.getField("bs")).as("b_mean"),
        folded.getField("bmin").cast("int").as("b_min"),
        folded.getField("bmax").cast("int").as("b_max"),
        mean(folded.getField("gs")).as("g_mean"),
        folded.getField("gmin").cast("int").as("g_min"),
        folded.getField("gmax").cast("int").as("g_max"),
        mean(folded.getField("rs")).as("r_mean"),
        folded.getField("rmin").cast("int").as("r_min"),
        folded.getField("rmax").cast("int").as("r_max"),
        (folded.getField("bmin") === folded.getField("bmax") &&
          folded.getField("gmin") === folded.getField("gmax") &&
          folded.getField("rmin") === folded.getField("rmax")).as("is_blank")))
      .otherwise(lit(null))
  }

  /** 64-bit perceptual AVERAGE-HASH (aHash) of a 24-bpp BMP payload —
    * the image-side near-dup signature: sample the pixel array on a
    * fixed 8×8 grid (nearest-neighbor: cell (gy,gx) reads image pixel
    * (⌊gy·h/8⌋, ⌊gx·w/8⌋) — deterministic index arithmetic, no
    * interpolation, so the oracle replays it exactly), take the
    * integer luma L = 299·R + 587·G + 114·B per cell, and set bit k
    * (row-major from the image's TOP-left, k=0 the sign bit) iff
    * 64·L_k > ΣL — the strict-majority-of-mean rule, all integers.
    * Re-encodes of the same image land at small Hamming distance;
    * unrelated images differ in ~32 bits. NULL for invalid/non-24bpp
    * payloads.
    *
    * Storage orientation is NORMALIZED (bottom-up rows flip, top-down
    * read directly — the [[decodeBmpMeta]] contract), so the same image
    * saved either way hashes IDENTICALLY — which is precisely what a
    * near-dup signature must guarantee and channel statistics never
    * exercise. The sign bit keeps the full classic 64-bit hash in a
    * signed BIGINT: weight(0) = Long.MinValue, weight(k) = 1L << (63−k)
    * — disjoint powers sum to the exact two's-complement bit pattern on
    * both engines.
    *
    * Scale contract: 64 fixed-offset byte reads + two 64-element folds
    * per row, geometry and luma array each bound ONCE ([[hof.bind]]) —
    * zero shuffle, zero UDF; feeds [[NearDup.simHashPairs]] as a
    * `signatureOf` for banded image near-dup joins.
    */
  def bmpAHash(payload: Column): Column = {
    val sigOk = hex(substring(payload, 1, 2)) === lit("424D")
    val dataOffset = le(payload, 11, 4)
    val dibSize = le(payload, 15, 4)
    val w = le(payload, 19, 4)
    val hRaw = le(payload, 23, 4)
    val hNeg = hRaw >= lit(2147483648L)
    val h = when(hNeg, lit(4294967296L) - hRaw).otherwise(hRaw)
    val bpp = le(payload, 29, 2)
    val stride = floor((w * 3L + 3L) / 4L).cast("bigint") * 4L
    val headerOk = length(payload) >= 30 && sigOk && dibSize >= 40L &&
      w >= 1L && w <= Int.MaxValue.toLong && h >= 1L && h <= Int.MaxValue.toLong &&
      bpp === 24L &&
      length(payload).cast("double") >=
        dataOffset.cast("double") + h.cast("double") * stride.cast("double")
    val geo = struct(
      dataOffset.as("off"), w.as("w"), h.as("h"), stride.as("stride"),
      hNeg.as("topdown"))
    val hash = graft.functions.hof.bind(geo) { g =>
      val lumas = transform(sequence(lit(0L), lit(63L)), k => {
        val gy = floor(k / 8L).cast("bigint")
        val gx = k % 8L
        val y = floor(gy * g.getField("h") / 8L).cast("bigint")
        val x = floor(gx * g.getField("w") / 8L).cast("bigint")
        // image row y sits at storage row y (top-down) or h−1−y (bottom-up)
        val srow = when(g.getField("topdown"), y)
          .otherwise(g.getField("h") - 1L - y)
        val base = g.getField("off") + srow * g.getField("stride") + x * 3L + 1L
        val p = conv(hex(substring(payload, base, lit(3))), 16, 10).cast("bigint")
        // stored B,G,R → B is the big-endian high byte
        lit(299L) * p.bitwiseAND(lit(255L)) +
          lit(587L) * shiftright(p, 8).bitwiseAND(lit(255L)) +
          lit(114L) * shiftright(p, 16)
      })
      graft.functions.hof.bind(lumas) { lum =>
        graft.functions.hof.bind(
          aggregate(lum, lit(0L), (acc, v) => acc + v)) { total =>
          aggregate(
            sequence(lit(0L), lit(63L)),
            lit(0L),
            (acc, k) => {
              val bit = element_at(lum, (k + 1L).cast("int")) * 64L > total
              val weight = when(k === 0L, lit(Long.MinValue))
                .otherwise(call_function(
                  "shiftleft", lit(1L), (lit(63L) - k).cast("int")))
              acc + when(bit, weight).otherwise(0L)
            })
        }
      }
    }
    when(payload.isNotNull && headerOk, hash).otherwise(lit(null))
  }

  /** REAL PNG PIXEL decode — the compressed-payload boundary the header
    * decoders documented is now CLOSED for PNG: signature + chunk walk,
    * concatenated-IDAT zlib INFLATE (adler-32 verified), and the full
    * five-filter scanline reconstruction (None/Sub/Up/Average/Paeth),
    * via the native codegen expression
    * [[graft.expressions.PngUnfilteredPixels]]. Returns the raw pixel
    * bytes (row-major, top-down, channels interleaved — G/GA/RGB/RGBA)
    * or NULL for anything that is not a well-formed 8-bit non-interlaced
    * PNG of color type 0/2/4/6 within `maxPixels` (palette and sub-byte
    * depths stay out of scope, documented on the expression).
    *
    * Scale contract: one static kernel call per row inside whole-stage
    * codegen; output allocation is bounded by `maxPixels`·channels
    * BEFORE the inflate runs — the decompression-bomb guard a 100 TB
    * scan of untrusted payloads needs.
    */
  def decodePngPixels(payload: Column, maxPixels: Int = 1 << 22): Column =
    org.apache.spark.sql.graft.bridge.column(
      graft.expressions.PngUnfilteredPixels(
        org.apache.spark.sql.graft.bridge.expression(payload), maxPixels))

  /** Per-channel stats fold over an INTERLEAVED pixel byte buffer
    * (row-major, `ch` channels per pixel — the [[decodePngPixels]] /
    * [[graft.expressions.GifFramePixels]] output shape): sum/min/max per
    * channel slot in one pass, one packed big-endian `substring`+`conv`
    * read per PIXEL with channels split by integer arithmetic. Returns
    * the raw accumulator struct (s0..3, mn0..3, mx0..3); callers shape
    * the user-facing struct. Shared by [[pngPixelStats]] and
    * [[gifPixelStats]].
    */
  private def interleavedChannelFold(
      px: Column, npx: Column, ch: Column): Column = {
    val zero = struct(
      (0 to 3).flatMap { c =>
        Seq(lit(0L).as(s"s$c"), lit(255L).as(s"mn$c"), lit(0L).as(s"mx$c"))
      }: _*)
    val pows = array(lit(1L), lit(256L), lit(65536L), lit(16777216L))
    graft.functions.hof.bind(ch) { chB =>
      aggregate(
        transform(sequence(lit(0L), npx - 1L), i =>
          conv(hex(substring(px, (i * chB + 1L).cast("int"),
            chB.cast("int"))), 16, 10).cast("bigint")),
        zero,
        (acc, v) => struct(
          (0 to 3).flatMap { c =>
            val live = chB > c
            // index clamped ≥1: dead slots never take the branch, but
            // element_at(…, 0) THROWS under ANSI if a subexpression
            // pass ever evaluates it eagerly — keep the expr total
            val value = pmod(
              floor(v / element_at(pows,
                greatest(chB - c, lit(1L)).cast("int")))
                .cast("bigint"), lit(256L))
            Seq(
              when(live, acc.getField(s"s$c") + value)
                .otherwise(acc.getField(s"s$c")).as(s"s$c"),
              when(live, least(acc.getField(s"mn$c"), value))
                .otherwise(acc.getField(s"mn$c")).as(s"mn$c"),
              when(live, greatest(acc.getField(s"mx$c"), value))
                .otherwise(acc.getField(s"mx$c")).as(s"mx$c"))
          }: _*))
    }
  }

  /** User-facing stats struct from the fold accumulator: per-channel
    * mean/min/max (NULL past `ch`) plus the all-channels-constant blank
    * cut. Shared by [[pngPixelStats]] and [[gifPixelStats]].
    */
  private def channelStatsStruct(
      f: Column, npx: Column, ch: Column, metaCols: Seq[Column]): Column = {
    val statCols = (0 to 3).flatMap { c =>
      val live = ch > c
      Seq(
        when(live, f.getField(s"s$c").cast("double") / npx.cast("double"))
          .as(s"c${c}_mean"),
        when(live, f.getField(s"mn$c").cast("int")).as(s"c${c}_min"),
        when(live, f.getField(s"mx$c").cast("int")).as(s"c${c}_max"))
    }
    val blank = (0 to 3).map { c =>
      ch <= c || f.getField(s"mn$c") === f.getField(s"mx$c")
    }.reduce(_ && _)
    struct((metaCols ++ Seq(npx.as("n_pixels")) ++ statCols :+
      blank.as("is_blank")): _*)
  }

  /** Per-channel pixel statistics of a PNG payload — the [[bmpPixelStats]]
    * contract on REAL compressed input: decode via [[decodePngPixels]],
    * then per-channel mean/min/max and the blank-image cut with one
    * scan-side fold (one `substring`+`conv` per PIXEL, channels split by
    * integer arithmetic — no per-byte string ops). Emits a struct
    * `(width, height, channels, n_pixels, c0_mean..c3_max, is_blank)`
    * with NULL stats for channels the color type does not carry, or NULL
    * when the decode fails. Channel order is the PNG byte order:
    * c0=G for gray, c0..c2=R,G,B for truecolor, alpha last.
    */
  def pngPixelStats(payload: Column, maxPixels: Int = 1 << 22): Column = {
    import graft.functions.hof.bind
    bind(decodePngPixels(payload, maxPixels)) { px =>
      bind(decodePngMeta(payload)) { m =>
        val w = m.getField("width").cast("bigint")
        val h = m.getField("height").cast("bigint")
        val ch = m.getField("channels").cast("bigint")
        val npx = w * h
        bind(interleavedChannelFold(px, npx, ch)) { f =>
          when(px.isNotNull && m.isNotNull,
            channelStatsStruct(f, npx, ch, Seq(
              m.getField("width").as("width"),
              m.getField("height").as("height"),
              m.getField("channels").as("channels"))))
            .otherwise(lit(null))
        }
      }
    }
  }

  /** Per-channel pixel statistics of a GIF payload — [[pngPixelStats]]'s
    * contract on the SECOND compressed container: first-frame decode via
    * the native LZW expression [[graft.expressions.GifFramePixels]]
    * (dictionary growth, KwKwK, deinterlacing, palette mapping), then
    * the same one-fold channel stats over the RGB bytes. The frame is
    * always 3-channel (palette-mapped), so c3_* is always NULL. NULL
    * when the payload is not a decodable GIF or exceeds `maxPixels`.
    */
  def gifPixelStats(payload: Column, maxPixels: Int = 1 << 22): Column = {
    import graft.functions.hof.bind
    val pxCol = org.apache.spark.sql.graft.bridge.column(
      graft.expressions.GifFramePixels(
        org.apache.spark.sql.graft.bridge.expression(payload), maxPixels))
    bind(pxCol) { px =>
      bind(decodeGifMeta(payload)) { m =>
        val w = m.getField("width").cast("bigint")
        val h = m.getField("height").cast("bigint")
        val npx = w * h
        bind(interleavedChannelFold(px, npx, lit(3L))) { f =>
          // the decoded frame may legally be smaller than the logical
          // screen (sub-rectangle frames); stats are only meaningful when
          // the frame IS the canvas — anything else reads as undecodable
          when(px.isNotNull && m.isNotNull && length(px) === npx * 3L,
            channelStatsStruct(f, npx, lit(3L), Seq(
              m.getField("width").cast("int").as("width"),
              m.getField("height").cast("int").as("height"),
              lit(3).as("channels"))))
            .otherwise(lit(null))
        }
      }
    }
  }

  /** 64-bit perceptual average-hash of a PNG payload — [[bmpAHash]]'s
    * contract on REAL compressed input, decoding via
    * [[decodePngPixels]]: 8×8 nearest-neighbor grid over the top-down
    * pixel rows, integer luma 299·R + 587·G + 114·B per cell (gray and
    * gray+alpha use 1000·G — the same scale, so a gray image saved as
    * 24-bpp BMP and as grayscale PNG hashes IDENTICALLY, spec-pinned),
    * bit k set iff 64·L_k > ΣL. Alpha never contributes (a re-encode
    * that adds an opaque alpha channel keeps its hash). NULL when the
    * decode fails.
    */
  def pngAHash(payload: Column, maxPixels: Int = 1 << 22): Column = {
    import graft.functions.hof.bind
    bind(decodePngPixels(payload, maxPixels)) { px =>
      bind(decodePngMeta(payload)) { m =>
        val hash = lumaMajorityHash(px,
          m.getField("width").cast("bigint"),
          m.getField("height").cast("bigint"),
          m.getField("channels").cast("bigint"))
        when(px.isNotNull && m.isNotNull, hash).otherwise(lit(null))
      }
    }
  }

  /** REAL baseline-JPEG PIXEL decode — the THIRD compressed container
    * closed, and the one real image corpora are mostly made of: marker
    * walk, canonical Huffman entropy decode, restart handling,
    * dequantize + IDCT, chroma upsampling, JFIF YCbCr→RGB, via the
    * native codegen expression [[graft.expressions.JpegBaselinePixels]].
    * Returns interleaved pixel bytes (row-major top-down, 1 byte/pixel
    * gray or 3 bytes/pixel RGB) or NULL for anything that is not a
    * well-formed 8-bit baseline SOF0 JPEG of 1/3 components within
    * `maxPixels` (progressive SOF2 is the documented SURVEY §8
    * exemption). Same decompression-bomb contract as
    * [[decodePngPixels]]: bounds checked before planes allocate.
    */
  def decodeJpegPixels(payload: Column, maxPixels: Int = 1 << 22): Column =
    org.apache.spark.sql.graft.bridge.column(
      graft.expressions.JpegBaselinePixels(
        org.apache.spark.sql.graft.bridge.expression(payload), maxPixels))

  /** Per-channel pixel statistics of a baseline JPEG —
    * [[pngPixelStats]]'s contract on the JPEG container: decode via
    * [[decodeJpegPixels]], then the shared one-fold channel stats.
    * Channels: c0=gray for 1-component scans, c0..c2=R,G,B for color;
    * c3_* always NULL. NULL when the decode fails (including
    * progressive files, whose SOF2 header [[decodeJpegMeta]] reads but
    * the baseline kernel rejects — geometry alone never fabricates
    * stats).
    */
  def jpegPixelStats(payload: Column, maxPixels: Int = 1 << 22): Column = {
    import graft.functions.hof.bind
    bind(decodeJpegPixels(payload, maxPixels)) { px =>
      bind(decodeJpegMeta(payload)) { m =>
        val w = m.getField("width").cast("bigint")
        val h = m.getField("height").cast("bigint")
        val ch = m.getField("num_components").cast("bigint")
        val npx = w * h
        bind(interleavedChannelFold(px, npx, ch)) { f =>
          when(px.isNotNull && m.isNotNull,
            channelStatsStruct(f, npx, ch, Seq(
              m.getField("width").cast("int").as("width"),
              m.getField("height").cast("int").as("height"),
              ch.cast("int").as("channels"))))
            .otherwise(lit(null))
        }
      }
    }
  }

  /** 64-bit perceptual average-hash of a baseline JPEG — the
    * [[pngAHash]]/[[bmpAHash]]/[[pnmAHash]] contract on the FIFTH
    * container (the shared [[lumaMajorityHash]] kernel over the decoded
    * RGB/gray buffer), so the same image content hashes identically
    * across BMP, PNM, gray/color PNG, and JPEG — provided the JPEG
    * round-trip is value-exact, which flat-per-cell images are (DC-only
    * blocks decode losslessly). NULL when the decode fails.
    */
  def jpegAHash(payload: Column, maxPixels: Int = 1 << 22): Column = {
    import graft.functions.hof.bind
    bind(decodeJpegPixels(payload, maxPixels)) { px =>
      bind(decodeJpegMeta(payload)) { m =>
        val hash = lumaMajorityHash(px,
          m.getField("width").cast("bigint"),
          m.getField("height").cast("bigint"),
          m.getField("num_components").cast("bigint"))
        when(px.isNotNull && m.isNotNull, hash).otherwise(lit(null))
      }
    }
  }

  /** ZIP central-directory decode (PKWARE APPNOTE) — the ARCHIVE
    * container next to the media formats: a data lake full of uploaded
    * zips needs "how many files, how big uncompressed, what methods"
    * BEFORE anything inflates (the decompression-bomb triage). Layout
    * is read back to front, as the format intends: the End-Of-Central-
    * Directory record (sig PK\x05\x06) sits 22 bytes from EOF plus an
    * optional comment, found by ONE bounded backward fold that demands
    * the record's OWN commentLen field equal the distance scanned (a
    * stray sig in file data cannot satisfy that identity); then the
    * central directory is walked entry by entry (sig PK\x01\x02,
    * little-endian sizes/method, variable name/extra/comment lengths
    * chaining to the next entry) with a second bounded fold.
    *
    * Returns `(n_entries, total_compressed, total_uncompressed,
    * n_stored, n_deflated, cd_offset, comment_len)`; NULL when no
    * consistent EOCD exists, the entry count exceeds `maxEntries`, any
    * entry signature breaks, or the walk does not consume exactly
    * cdSize bytes (the cross-check that catches truncated/spliced
    * archives). Multi-disk and ZIP64 archives reject (their sentinel
    * fields make the consistency checks fail) — landing-zone uploads
    * are single-disk; a ZIP64 walk is the natural extension. Pure
    * codegen byte-slice built-ins, zero UDF, zero shuffle.
    */
  def decodeZipMeta(
      payload: Column,
      maxEntries: Int = 64,
      maxCommentLen: Int = 64): Column = {
    def le(pos: Column, n: Int): Column =
      conv(concat((n - 1 to 0 by -1).map(i =>
        hex(substring(payload, pos + i, lit(1)))): _*), 16, 10).cast("bigint")
    def sig(pos: Column, hexSig: String): Column =
      hex(substring(payload, pos, lit(4))) === lit(hexSig)
    val plen = length(payload).cast("bigint")

    // EOCD: scan k = 0..maxCommentLen; candidate at plen-21-k must have
    // the sig AND declare commentLen == k
    val eocd = aggregate(
      sequence(lit(0), lit(maxCommentLen)),
      lit(null).cast("bigint"),
      (acc, k) => {
        val pos = plen - 21L - k.cast("bigint")
        val hit = pos >= 1L && sig(pos, "504B0506") &&
          le(pos + 20L, 2) === k.cast("bigint")
        when(acc.isNotNull, acc).when(hit, pos).otherwise(acc)
      })

    val out = graft.functions.hof.bind(eocd) { e =>
      val nEntries = le(e + 10L, 2)
      val cdSize = le(e + 12L, 4)
      val cdOffset = le(e + 16L, 4)
      val commentLen = le(e + 20L, 2)
      def entryState(pos: Column, cnt: Column, comp: Column, uncomp: Column,
          stored: Column, deflated: Column, bad: Column): Column =
        struct(pos.as("pos"), cnt.as("cnt"), comp.as("comp"),
          uncomp.as("uncomp"), stored.as("stored"),
          deflated.as("deflated"), bad.as("bad"))
      val walked = graft.functions.hof.bind(
        struct(nEntries.as("n"), (cdOffset + 1L).as("start"))) { g =>
        aggregate(
          sequence(lit(0), lit(maxEntries - 1)),
          entryState(g.getField("start"), lit(0L), lit(0L), lit(0L),
            lit(0L), lit(0L), lit(false)),
          (acc, _) => {
            val pos = acc.getField("pos")
            val done = acc.getField("cnt") >= g.getField("n") ||
              acc.getField("bad")
            val sigOk = sig(pos, "504B0102")
            val method = le(pos + 10L, 2)
            val comp = le(pos + 20L, 4)
            val uncomp = le(pos + 24L, 4)
            val varLen = le(pos + 28L, 2) + le(pos + 30L, 2) + le(pos + 32L, 2)
            when(done, acc)
              .when(!sigOk || pos + 45L > plen,
                entryState(pos, acc.getField("cnt"), acc.getField("comp"),
                  acc.getField("uncomp"), acc.getField("stored"),
                  acc.getField("deflated"), lit(true)))
              .otherwise(entryState(
                pos + 46L + varLen,
                acc.getField("cnt") + 1L,
                acc.getField("comp") + comp,
                acc.getField("uncomp") + uncomp,
                acc.getField("stored") + when(method === 0L, 1L).otherwise(0L),
                acc.getField("deflated") + when(method === 8L, 1L).otherwise(0L),
                lit(false)))
          })
      }
      graft.functions.hof.bind(walked) { w =>
        val ok = e.isNotNull && nEntries <= maxEntries &&
          !w.getField("bad") && w.getField("cnt") === nEntries &&
          w.getField("pos") === cdOffset + cdSize + 1L
        when(ok, struct(
          nEntries.cast("int").as("n_entries"),
          w.getField("comp").as("total_compressed"),
          w.getField("uncomp").as("total_uncompressed"),
          w.getField("stored").cast("int").as("n_stored"),
          w.getField("deflated").cast("int").as("n_deflated"),
          cdOffset.as("cd_offset"),
          commentLen.cast("int").as("comment_len")))
      }
    }
    when(payload.isNotNull && length(payload) >= 22, out)
  }

  /** TAR / USTAR archive decode (POSIX.1-1988) — the uncompressed
    * archive next to ZIP: 512-byte header blocks with OCTAL-ASCII
    * numeric fields, each entry's data rounded up to whole blocks, the
    * archive terminated by a zero block. The walk verifies each
    * header's CHECKSUM (sum of header bytes with the checksum field
    * read as spaces — the format's own integrity line) with a bounded
    * per-entry fold, parses the size field via a leading-octal-digits
    * regex + `conv(_, 8, 10)`, and chains `512 + ⌈size/512⌉·512`.
    *
    * Returns `(n_entries, n_files, n_dirs, total_size, max_size)`;
    * NULL when a header's magic is not `ustar`, a checksum breaks, an
    * entry runs past EOF, or more than `maxEntries` entries precede
    * the terminator. Pure codegen built-ins, zero UDF.
    */
  def decodeTarMeta(payload: Column, maxEntries: Int = 8): Column = {
    def byteAt(pos: Column): Column =
      conv(hex(substring(payload, pos, lit(1))), 16, 10).cast("bigint")
    val plen = length(payload).cast("bigint")

    def state(pos: Column, cnt: Column, files: Column, dirs: Column,
        total: Column, mx: Column, done: Column, bad: Column): Column =
      struct(pos.as("pos"), cnt.as("cnt"), files.as("files"),
        dirs.as("dirs"), total.as("total"), mx.as("mx"),
        done.as("done"), bad.as("bad"))

    val walked = aggregate(
      sequence(lit(0), lit(maxEntries)),
      state(lit(1L), lit(0L), lit(0L), lit(0L), lit(0L), lit(0L),
        lit(false), lit(false)),
      (acc, _) => {
        val pos = acc.getField("pos")
        val stop = acc.getField("done") || acc.getField("bad")
        val zeroBlock = byteAt(pos) === 0L
        val overCap = acc.getField("cnt") >= maxEntries
        val magicOk = hex(substring(payload, pos + 257L, lit(5))) === lit("7573746172")
        // checksum: Σ header bytes, field 148..155 (0-based) as spaces
        val ckSum = graft.functions.hof.bind(pos) { p =>
          aggregate(
            sequence(lit(0L), lit(511L)),
            lit(0L),
            (s2, i) => s2 + when(i >= 148L && i < 156L, lit(32L))
              .otherwise(coalesce(byteAt(p + i), lit(0L))))
        }
        val ckDeclared = conv(
          concat(lit("0"), regexp_extract(
            substring(payload, (pos + 148L).cast("int"), lit(8)).cast("string"),
            "^([0-7]+)", 1)), 8, 10).cast("bigint")
        val size = conv(
          concat(lit("0"), regexp_extract(
            substring(payload, (pos + 124L).cast("int"), lit(12)).cast("string"),
            "^([0-7]+)", 1)), 8, 10).cast("bigint")
        val typeflag = byteAt(pos + 156L)
        val isDir = typeflag === 53L // '5'
        val blocks = floor((size + 511L) / 512L).cast("bigint")
        val next = pos + 512L + blocks * 512L
        val headerOk = pos + 511L <= plen && magicOk && ckSum === ckDeclared &&
          next - 1L <= plen
        when(stop, acc)
          .when(zeroBlock,
            state(pos, acc.getField("cnt"), acc.getField("files"),
              acc.getField("dirs"), acc.getField("total"),
              acc.getField("mx"), lit(true), acc.getField("bad")))
          .when(overCap || !headerOk,
            state(pos, acc.getField("cnt"), acc.getField("files"),
              acc.getField("dirs"), acc.getField("total"),
              acc.getField("mx"), lit(false), lit(true)))
          .otherwise(state(
            next,
            acc.getField("cnt") + 1L,
            acc.getField("files") + when(isDir, 0L).otherwise(1L),
            acc.getField("dirs") + when(isDir, 1L).otherwise(0L),
            acc.getField("total") + when(isDir, 0L).otherwise(size),
            greatest(acc.getField("mx"), when(isDir, 0L).otherwise(size)),
            lit(false), lit(false)))
      })
    graft.functions.hof.bind(walked) { w =>
      when(payload.isNotNull && length(payload) >= 1024 &&
          w.getField("done") && !w.getField("bad"),
        struct(
          w.getField("cnt").cast("int").as("n_entries"),
          w.getField("files").cast("int").as("n_files"),
          w.getField("dirs").cast("int").as("n_dirs"),
          w.getField("total").as("total_size"),
          w.getField("mx").as("max_size")))
    }
  }

  /** Netpbm binary PGM/PPM (P5/P6) header decode — the EIGHTH container
    * and the only one with a TEXT header: `P5|P6 <w> <h> <maxval>` as
    * ASCII tokens separated by whitespace runs, one single whitespace
    * byte, then raw interleaved samples (gray for P5, RGB for P6). The
    * header is parsed with one anchored regexp over the UTF-8 decode of
    * the first 32 bytes — safe because the match is pure ASCII (1 byte
    * = 1 char) and PRECEDES any replacement chars lenient decoding
    * substitutes for binary pixel bytes, so the match length IS the
    * byte offset of the pixel data. Numeric captures parse through a
    * `concat('0', …)` prefix so an empty capture can never ANSI-fault
    * a cast. The maxval capture is `\d{1,3}` with a REQUIRED trailing
    * whitespace: a pixel byte that happens to be an ASCII digit can
    * force a reject (backtrack exhausts) but never a misparse.
    * Returns `(format, width, height, maxval, data_offset)`; NULL for
    * wrong magic, maxval ≠ 255 (16-bit Netpbm out of scope), a header
    * with comments (documented divergence: `#` lines are rejected, not
    * skipped), or a payload shorter than w·h·channels.
    */
  def decodePnmMeta(payload: Column): Column = {
    // parse over the HEX rendering (not a UTF-8 decode, which
    // ANSI-faults on the binary pixel bytes that follow the header):
    // the header is pure ASCII, so every token is a fixed hex-pair
    // vocabulary — "50" P, "3[56]" 5/6, "3[0-9]" digits, 20/09/0A/0D
    // whitespace — and the match length in hex chars is exactly twice
    // the byte offset
    val head = hex(substring(payload, 1, 32))
    val ws = "(?:20|09|0A|0D)"
    val pat = s"^50(3[56])$ws+(3[0-9](?:3[0-9]){0,4})$ws+" +
      s"(3[0-9](?:3[0-9]){0,4})$ws+(3[0-9](?:3[0-9]){0,2})$ws"
    def num(g: Int): Column =
      concat(lit("0"), unhex(regexp_extract(head, pat, g)).cast("string"))
        .cast("bigint")
    val fmt = concat(lit("P"), unhex(regexp_extract(head, pat, 1)).cast("string"))
    val w = num(2)
    val h = num(3)
    val maxv = num(4)
    val dataOff = (length(regexp_extract(head, pat, 0)) / 2 + 1).cast("bigint")
    val ch = when(fmt === "P6", lit(3L)).otherwise(lit(1L))
    val ok = fmt =!= "P" && w >= 1L && h >= 1L && maxv === 255L &&
      length(payload).cast("bigint") >= dataOff - 1L + w * h * ch
    when(payload.isNotNull && length(payload) >= 8 && ok,
      struct(
        fmt.as("format"),
        w.as("width"),
        h.as("height"),
        maxv.cast("int").as("maxval"),
        dataOff.as("data_offset")))
  }

  /** PGM/PPM pixel decode as a FRAME operator: header parsed ONCE into
    * plain columns behind an eager barrier, then the shared channel
    * fold + the [[lumaMajorityHash]] run with COLUMN-derived geometry.
    *
    * Why a frame op and not a Column function like [[pngPixelStats]]:
    * parse-once-into-attributes is the right 100 TB shape — one regex
    * pass per payload behind the barrier, and the fold geometry reads
    * row slots instead of re-deriving header fields. The barrier also
    * keeps an in-plan payload CONSTRUCTION (gate corpora) from being
    * inlined into every decode reference by projection collapse.
    *
    * Output: `(idCol, format, width, height, maxval, channels,
    * n_pixels, c0_* .. c3_*, is_blank, ahash)`; NULL fields for
    * invalid payloads, NULL c1..c3 for P5.
    */
  def pnmDecodedFrame(
      df: DataFrame,
      idCol: String,
      payloadCol: String,
      maxPixels: Int = 1 << 22): DataFrame = {
    val meta = df
      .select(col(idCol), col(payloadCol).as("__pnm_payload"),
        decodePnmMeta(col(payloadCol)).as("__m"))
      .select(col(idCol), col("__pnm_payload"),
        col("__m.format").as("format"),
        col("__m.width").as("width"),
        col("__m.height").as("height"),
        col("__m.maxval").as("maxval"),
        col("__m.data_offset").as("__off"))
      .localCheckpoint(true)
    val ch = when(col("format") === "P6", lit(3L)).otherwise(lit(1L))
    // NULL-guarded size bound — least() SKIPS nulls, so an invalid
    // payload (width/height NULL) would otherwise size the fold at
    // maxPixels: a 4M-element no-op fold PER BAD ROW (measured 431 s
    // at 500 mixed rows vs 2 s guarded). The guard keeps npx NULL on
    // invalid rows, which the HOF chain propagates for free.
    val npx = when(col("format").isNotNull,
      least(col("width") * col("height"), lit(maxPixels.toLong)))
    val px = substring(col("__pnm_payload"),
      col("__off").cast("int"), (npx * ch).cast("int"))
    import graft.functions.hof.bind
    val stats = bind(interleavedChannelFold(px, npx, ch)) { f =>
      when(col("format").isNotNull,
        channelStatsStruct(f, npx, ch, Seq(ch.cast("int").as("channels"))))
    }
    val hash = when(col("format").isNotNull,
      lumaMajorityHash(px, col("width"), col("height"), ch))
    // materialize the stats STRUCT (one fold per row) before unpacking:
    // projection collapse would otherwise hand each of the 12 extracted
    // fields its own copy of the interpreted fold — interpreted HOFs
    // get no common-subexpression elimination (measured 12× on this
    // exact shape)
    val stage2 = meta
      .select(
        col(idCol), col("format"),
        col("width"), col("height"), col("maxval"),
        stats.as("__s"), hash.as("ahash"))
      .localCheckpoint(true)
    org.apache.spark.sql.graft.bridge.freeLocalCheckpoint(meta)
    stage2.select(
      col(idCol), col("format"),
      col("width"), col("height"), col("maxval"),
      col("__s.channels").as("channels"),
      col("__s.n_pixels").as("n_pixels"),
      col("__s.c0_mean").as("c0_mean"), col("__s.c0_min").as("c0_min"),
      col("__s.c0_max").as("c0_max"),
      col("__s.c1_mean").as("c1_mean"), col("__s.c1_min").as("c1_min"),
      col("__s.c1_max").as("c1_max"),
      col("__s.c2_mean").as("c2_mean"), col("__s.c2_min").as("c2_min"),
      col("__s.c2_max").as("c2_max"),
      col("__s.is_blank").as("is_blank"),
      col("ahash"))
  }

  /** Perceptual aHash of a PGM/PPM payload — [[pngAHash]]'s exact
    * contract (the shared [[lumaMajorityHash]] kernel) on the raw
    * buffer, so the SAME image hashes identically as grayscale PGM,
    * truecolor PPM, grayscale/truecolor PNG, and 24-bpp BMP — the
    * cross-format near-dup bridge, spec-pinned.
    */
  def pnmAHash(payload: Column): Column = {
    import graft.functions.hof.bind
    bind(decodePnmMeta(payload)) { m =>
      val w = m.getField("width")
      val h = m.getField("height")
      val ch = when(m.getField("format") === "P6", lit(3L)).otherwise(lit(1L))
      val px = substring(payload,
        m.getField("data_offset").cast("int"), (w * h * ch).cast("int"))
      when(m.isNotNull, lumaMajorityHash(px, w, h, ch)).otherwise(lit(null))
    }
  }

  /** The shared 8x8 luma-majority perceptual hash over an interleaved
    * pixel buffer (top-down row-major, `ch` channels): gray scales by
    * 1000 — the same scale as 299+587+114 — so one image hashes
    * IDENTICALLY as grayscale or truecolor in ANY container wired to
    * this kernel (PNG, BMP via its own reader, PNM). Extracted from
    * [[pngAHash]] for the PNM family; bit semantics unchanged.
    */
  private def lumaMajorityHash(
      px: Column, wc: Column, hc: Column, chc: Column): Column = {
    import graft.functions.hof.bind
    val geo = struct(wc.as("w"), hc.as("h"), chc.as("ch"))
    bind(geo) { g =>
      val w = g.getField("w"); val h = g.getField("h")
      val ch = g.getField("ch")
      val lumas = transform(sequence(lit(0L), lit(63L)), k => {
        val gy = floor(k / 8L).cast("bigint")
        val gx = k % 8L
        val y = floor(gy * h / 8L).cast("bigint")
        val x = floor(gx * w / 8L).cast("bigint")
        val base = ((y * w + x) * ch + 1L).cast("int")
        val v = conv(hex(substring(px, base, ch.cast("int"))), 16, 10)
          .cast("bigint")
        // packed big-endian: for RGB(A) the R byte is highest
        when(ch === 1L, lit(1000L) * v)
          .when(ch === 2L, lit(1000L) * shiftright(v, 8))
          .when(ch === 3L,
            lit(299L) * shiftright(v, 16) +
              lit(587L) * shiftright(v, 8).bitwiseAND(lit(255L)) +
              lit(114L) * v.bitwiseAND(lit(255L)))
          .otherwise(
            lit(299L) * shiftright(v, 24) +
              lit(587L) * shiftright(v, 16).bitwiseAND(lit(255L)) +
              lit(114L) * shiftright(v, 8).bitwiseAND(lit(255L)))
      })
      bind(lumas) { lum =>
        bind(aggregate(lum, lit(0L), (acc, v) => acc + v)) { total =>
          aggregate(
            sequence(lit(0L), lit(63L)),
            lit(0L),
            (acc, k) => {
              val bit = element_at(lum, (k + 1L).cast("int")) * 64L > total
              val weight = when(k === 0L, lit(Long.MinValue))
                .otherwise(call_function(
                  "shiftleft", lit(1L), (lit(63L) - k).cast("int")))
              acc + when(bit, weight).otherwise(0L)
            })
        }
      }
    }
  }

  /** REAL WebP header decode — not a stub: the RIFF container walk plus
    * ALL THREE WebP variants' dimension encodings (the modern web-corpus
    * format next to PNG/GIF/JPEG):
    *  - `VP8 ` (lossy): 3-byte frame tag, the 9D 01 2A sync code, then
    *    14-bit width/height in little-endian u16s (scale bits masked);
    *  - `VP8L` (lossless): the 0x2F signature byte, then 14-bit
    *    width−1 / height−1 BIT-PACKED little-endian across 4 bytes;
    *  - `VP8X` (extended): flags byte + 24-bit canvas width−1 /
    *    height−1.
    * Returns `(width, height, format)` (format ∈ lossy/lossless/
    * extended) or NULL for absent/short/non-WebP payloads, bad sync or
    * signature bytes included. Pure codegen built-ins (byte slices +
    * integer arithmetic) like [[decodeGifMeta]] — scan-side at any
    * scale; the q_m19 oracle derives expectations independently.
    */
  def decodeWebpMeta(payload: Column): Column = {
    val riffOk = hex(substring(payload, 1, 4)) === lit("52494646") &&
      hex(substring(payload, 9, 4)) === lit("57454250") // "RIFF" … "WEBP"
    val fourcc = hex(substring(payload, 13, 4))
    def b(pos: Int): Column = le(payload, pos, 1)
    // chunk payload starts at 1-based offset 21 (12 RIFF+WEBP, 8 header)
    val isVp8 = fourcc === lit("56503820")  // "VP8 "
    val isVp8l = fourcc === lit("5650384C") // "VP8L"
    val isVp8x = fourcc === lit("56503858") // "VP8X"
    val vp8SyncOk = hex(substring(payload, 24, 3)) === lit("9D012A")
    val vp8W = pmod(le(payload, 27, 2), lit(16384L))
    val vp8H = pmod(le(payload, 29, 2), lit(16384L))
    val vp8lSigOk = b(21) === 0x2fL
    val vp8lW = b(22) + pmod(b(23), lit(64L)) * 256L + 1L
    val vp8lH = floor(b(23) / 64L).cast("bigint") +
      b(24) * 4L + pmod(b(25), lit(16L)) * 1024L + 1L
    val vp8xW = le(payload, 25, 3) + 1L
    val vp8xH = le(payload, 28, 3) + 1L
    val minLen = when(isVp8, 30L).when(isVp8l, 25L).otherwise(lit(30L))
    val variantOk =
      (isVp8 && vp8SyncOk && vp8W >= 1L) ||
        (isVp8l && vp8lSigOk) || isVp8x
    when(payload.isNotNull && length(payload) >= minLen && riffOk && variantOk,
      struct(
        when(isVp8, vp8W).when(isVp8l, vp8lW).otherwise(vp8xW)
          .cast("int").as("width"),
        when(isVp8, vp8H).when(isVp8l, vp8lH).otherwise(vp8xH)
          .cast("int").as("height"),
        when(isVp8, lit("lossy")).when(isVp8l, lit("lossless"))
          .otherwise(lit("extended")).as("format")))
      .otherwise(lit(null))
  }

  /** REAL FLAC STREAMINFO decode — not a stub: the "fLaC" magic, the
    * first metadata-block header (must be STREAMINFO, type 0, length
    * 34), and the BIT-PACKED audio parameters: 20-bit sample rate,
    * 3-bit channels−1, 5-bit bits-per-sample−1, 36-bit total samples
    * (the >2^32 field). `duration_us` is the floored EXACT integer
    * division (total·1e6 div rate) computed modulus-first — the decimal
    * quotient-scale trap the MP4 decoder documented cannot round here.
    * Returns `(sample_rate, channels, bits_per_sample, total_samples,
    * duration_us)` or NULL for absent/short/non-FLAC payloads or a
    * zero sample rate (legal only for non-audio streams). Pure codegen
    * built-ins; the q_m20 oracle derives expectations independently.
    */
  def decodeFlacMeta(payload: Column): Column = {
    def b(pos: Int): Column = le(payload, pos, 1) // single byte
    val magicOk = hex(substring(payload, 1, 4)) === lit("664C6143") // "fLaC"
    // block header: bit7 = last-metadata flag (either is legal), bits
    // 0-6 type must be 0 (STREAMINFO), 24-bit BE length must be 34
    val typeOk = pmod(b(5), lit(128L)) === 0L
    val lenOk = b(6) === 0L && b(7) === 0L && b(8) === 34L
    val rate = b(19) * 4096L + b(20) * 16L +
      floor(b(21) / 16L).cast("bigint")
    val channels = (pmod(floor(b(21) / 2L).cast("bigint"), lit(8L)) + 1L)
    val bps = pmod(b(21), lit(2L)) * 16L +
      floor(b(22) / 16L).cast("bigint") + 1L
    val total = pmod(b(22), lit(16L)) * 4294967296L +
      le6BE(payload) // bytes 23-26 big-endian u32
    val totalD = total.cast("decimal(38,0)")
    val rateD = rate.cast("decimal(19,0)")
    val remD = pmod(totalD, rateD)
    val remUs = (remD * lit(1000000L)).cast("decimal(38,0)")
    val durUs =
      (((totalD - remD) / rateD).cast("decimal(38,0)") * lit(1000000L) +
        ((remUs - pmod(remUs, rateD)) / rateD).cast("decimal(38,0)"))
        .cast("bigint")
    when(payload.isNotNull && length(payload) >= 42 && magicOk &&
      typeOk && lenOk && rate >= 1L,
      struct(
        rate.cast("int").as("sample_rate"),
        channels.cast("int").as("channels"),
        bps.cast("int").as("bits_per_sample"),
        total.cast("bigint").as("total_samples"),
        durUs.as("duration_us")))
      .otherwise(lit(null))
  }

  /** Big-endian u32 at the STREAMINFO total-samples tail (bytes 23-26). */
  private def le6BE(payload: Column): Column =
    le(payload, 23, 1) * 16777216L + le(payload, 24, 1) * 65536L +
      le(payload, 25, 1) * 256L + le(payload, 26, 1)

  /** Position-salted payload hash feeding the stub decoders. Default is
    * xxhash64 (codegen fast path); `portable = true` derives a 60-bit hash
    * from md5 over the hex rendering (uppercase in Spark AND DuckDB), so
    * gate queries can replay the identical arithmetic in the oracle.
    */
  private def saltedHash(payload: Column, salt: Column, portable: Boolean): Column =
    if (portable)
      graft.functions.Hashing.md5Hash60(
        concat_ws(":", hex(payload), salt.cast("string")))
    else xxhash64(payload, salt)

  /** Canonical media-record schema: `(payload binary, meta struct)`.
    * Attach to any frame carrying a binary column.
    */
  def withMediaMeta(
      df: DataFrame, payloadCol: String, mediaType: String,
      portable: Boolean = false): DataFrame =
    df.withColumn("media_meta", struct(
      lit(mediaType).as("media_type"),
      length(col(payloadCol)).as("n_bytes"),
      (if (portable) saltedHash(col(payloadCol), lit(-1), portable)
       else xxhash64(col(payloadCol))).as("content_hash")))

  /** [STUB] Header decode: a real implementation parses the codec header
    * (JPEG SOF / WAV fmt / MP4 moov); this deterministic stand-in derives
    * plausible dimensions from the content hash so downstream logic
    * (filtering by resolution, bucketing by aspect ratio) is exercised
    * end-to-end. Null payload → null struct, as a real decoder's failure
    * path would produce.
    */
  def decodeImageMetaStub(payload: Column, portable: Boolean = false): Column =
    // position-salted hashes, not hash arithmetic: ANSI mode (Spark 4
    // default) faults on long overflow
    when(payload.isNull, lit(null)).otherwise(struct(
      (pmod(saltedHash(payload, lit(0), portable), lit(1920L)) + 32L).cast("int").as("width"),
      (pmod(saltedHash(payload, lit(1), portable), lit(1080L)) + 32L).cast("int").as("height"),
      pmod(saltedHash(payload, lit(2), portable), lit(3L)).cast("int").as("channels")))

  /** [STUB] Fixed-dim feature vector from a payload: a real implementation
    * runs a vision/audio encoder over decoded pixels; this stand-in derives
    * the vector from position-salted content hashes, normalized to [-1,1] —
    * shape and determinism match a real extractor, so the ANN operators in
    * [[SimilaritySearch]] compose with it unchanged.
    */
  def extractFeaturesStub(payload: Column, dim: Int = 16, portable: Boolean = false): Column =
    when(payload.isNull, lit(null)).otherwise(
      transform(sequence(lit(0), lit(dim - 1)), i =>
        ((pmod(saltedHash(payload, i, portable), lit(2000001L)).cast("double") / 1000000.0) - 1.0)
          .cast("float")))

  /** Frame sampling: cut `n` evenly-spaced fixed-width byte windows from
    * the payload — the exact plumbing (array<binary> out, index arithmetic,
    * short-payload degenerate case) of video frame extraction, with the
    * codec call stubbed to `substring`.
    */
  def sampleFramesStub(payload: Column, n: Int = 4, frameBytes: Int = 64): Column = {
    val len = length(payload)
    when(payload.isNull, lit(null)).otherwise(
      transform(sequence(lit(0), lit(n - 1)), i => {
        val offset = (i * greatest(len - frameBytes, lit(0)) / lit(math.max(n - 1, 1))).cast("int")
        substring(payload, lit(1) + offset, lit(frameBytes))
      }))
  }

  /** Heavy-decode stage wrapper: repartition by content hash so decode work
    * is balanced across executors regardless of upstream partitioning (file
    * order correlates with size/content in real corpora), then apply the
    * per-row decode columns. At 1000 executors this is the difference
    * between one straggler decoding all 4K video and an even spread.
    */
  def decodeStage(df: DataFrame, payloadCol: String, numPartitions: Int)(
      decodeCols: Column => Seq[(String, Column)]): DataFrame = {
    val balanced = df.repartition(numPartitions, xxhash64(col(payloadCol)))
    decodeCols(col(payloadCol)).foldLeft(balanced) {
      case (acc, (name, c)) => acc.withColumn(name, c)
    }
  }
}
