package graft.operators

import org.apache.spark.sql.functions._

import graft.SparkSpec

class Mp3MetaSpec extends SparkSpec {

  private def decode(payloads: Seq[(Long, Array[Byte])]) = {
    val s = spark
    import s.implicits._
    payloads.toDF("id", "payload")
      .select(col("id"), Multimodal.decodeMp3Meta(col("payload")).as("m"))
      .collect().map(r => r.getAs[Long]("id") ->
        (if (r.isNullAt(1)) null else r.getStruct(1))).toMap
  }

  private def bytes(xs: Int*): Array[Byte] = xs.map(_.toByte).toArray

  test("canonical MPEG1 Layer III 128kbps/44100 header (FF FB 90 64)") {
    val frame = bytes(0xFF, 0xFB, 0x90, 0x64) ++ Array.fill[Byte](413)(0)
    val m = decode(Seq((1L, frame)))(1L)
    assert(m.getAs[Long]("id3_size") == 0L)
    assert(m.getAs[Int]("version_id") == 10 && m.getAs[Int]("layer") == 3)
    assert(m.getAs[Int]("bitrate_kbps") == 128)
    assert(m.getAs[Int]("sample_rate") == 44100)
    assert(m.getAs[Int]("channels") == 2 && m.getAs[Int]("padding") == 0)
    // floor(144*128000/44100) = 417
    assert(m.getAs[Long]("frame_bytes") == 417L)
    assert(m.getAs[Int]("samples_per_frame") == 1152)
    // 417 bytes: floor(417*8*1000/128000) = 26 ms
    assert(m.getAs[Long]("est_duration_ms") == 417L * 8 * 1000 / 128000)
  }

  test("MPEG2 Layer III 40kbps/22050 padded mono (FF F3 52 C0)") {
    val m = decode(Seq((1L, bytes(0xFF, 0xF3, 0x52, 0xC0))))(1L)
    assert(m.getAs[Int]("version_id") == 20 && m.getAs[Int]("layer") == 3)
    assert(m.getAs[Int]("bitrate_kbps") == 40)
    assert(m.getAs[Int]("sample_rate") == 22050)
    assert(m.getAs[Int]("channels") == 1 && m.getAs[Int]("padding") == 1)
    // floor(72*40000/22050) + 1 = 130 + 1
    assert(m.getAs[Long]("frame_bytes") == 131L)
    assert(m.getAs[Int]("samples_per_frame") == 576)
  }

  test("MPEG1 Layer I 32kbps/48000 slot-sized frames (FF FF 14 00)") {
    val m = decode(Seq((1L, bytes(0xFF, 0xFF, 0x14, 0x00))))(1L)
    assert(m.getAs[Int]("layer") == 1)
    assert(m.getAs[Int]("bitrate_kbps") == 32)
    assert(m.getAs[Int]("sample_rate") == 48000)
    assert(m.getAs[Long]("frame_bytes") == 32L) // (12*32000/48000)*4
    assert(m.getAs[Int]("samples_per_frame") == 384)
  }

  test("ID3v2 tag skipped via the syncsafe size") {
    // syncsafe 0x00 0x00 0x02 0x01 = 257 → header at 10+257
    val tag = bytes(0x49, 0x44, 0x33, 4, 0, 0, 0, 0, 2, 1) ++
      Array.fill[Byte](257)(0)
    val m = decode(Seq((1L, tag ++ bytes(0xFF, 0xFB, 0x90, 0x64))))(1L)
    assert(m != null, "post-tag frame must decode")
    assert(m.getAs[Long]("id3_size") == 267L)
    assert(m.getAs[Int]("bitrate_kbps") == 128)
  }

  test("malformations reject to NULL") {
    val cases = Seq(
      2L -> bytes(0xFE, 0xFB, 0x90, 0x64), // bad sync
      3L -> bytes(0xFF, 0xEB, 0x90, 0x64), // reserved version (01)
      4L -> bytes(0xFF, 0xF9, 0x90, 0x64), // reserved layer (00)
      5L -> bytes(0xFF, 0xFB, 0xF0, 0x64), // bitrate index 15
      6L -> bytes(0xFF, 0xFB, 0x00, 0x64), // free bitrate (0)
      7L -> bytes(0xFF, 0xFB, 0x9C, 0x64), // sample-rate index 3
      8L -> bytes(0xFF, 0xFB, 0x90),       // short file
      9L -> (bytes(0x49, 0x44, 0x33, 4, 0, 0, 0, 0, 0, 60) ++
        Array.fill[Byte](2)(0))) // ID3 size past EOF
    val out = decode(cases)
    cases.foreach { case (id, _) => assert(out(id) == null, s"id $id") }
  }
}
