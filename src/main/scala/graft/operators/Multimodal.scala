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
  * The container has no media codecs, so MOST decode steps are STUBS: a
  * deterministic synthetic "decoder" marked [STUB] below stands in where
  * libjpeg/ffmpeg would be called. Everything around it — schema, batch
  * shape, partitioning, null handling — is real and tested, so swapping a
  * real codec in is a one-function change. The exception is image
  * HEADERS, which decode for REAL across the whole container family:
  * [[decodePngMeta]], [[decodeGifMeta]] and [[decodeBmpMeta]] read
  * fixed-offset headers, and [[decodeJpegMeta]] walks JPEG's
  * variable-position marker chain with the `aggregate` higher-order
  * function — all pure codegen built-ins, no codec library, no UDF.
  * What remains stubbed is pixel/audio/video DECODE, which genuinely
  * needs libjpeg/ffmpeg.
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
