package graft.operators

import org.apache.spark.sql.functions._

import graft.SparkSpec

/** Regression for the least()-null sizing bug (q_m23 lesson): payloads
  * short enough to NULL a header dimension must reject in
  * MICROSECONDS, not run a maxFrames/maxPixels no-op fold. The specs
  * assert both the NULL result and a wall-clock ceiling that the
  * 4M-step fold (~1 s/row) cannot meet.
  */
class MultimodalShortPayloadSpec extends SparkSpec {

  private def run(c: org.apache.spark.sql.Column, payloads: Seq[Array[Byte]]): Long = {
    val s = spark
    import s.implicits._
    val df = payloads.zipWithIndex.map { case (p, i) => (i.toLong, p) }
      .toDF("id", "payload")
    val t0 = System.nanoTime()
    val rows = df.select(c.as("x")).collect()
    assert(rows.forall(_.isNullAt(0)))
    (System.nanoTime() - t0) / 1000000
  }

  test("short WAV (34-43 bytes: blockAlign readable, dataSize not) rejects fast") {
    // RIFF....WAVEfmt + enough bytes to read blockAlign at 33-34
    val p = "RIFF    WAVEfmt ".getBytes("ISO-8859-1") ++
      Array.fill[Byte](18)(1)
    assert(p.length >= 34 && p.length < 44)
    val ms = run(Multimodal.wavSampleStats(col("payload")), Seq.fill(50)(p))
    assert(ms < 20000, s"50 short WAVs took $ms ms - cap-sized fold regressed")
    val ms2 = run(Multimodal.wavZeroCrossings(col("payload")), Seq.fill(50)(p))
    assert(ms2 < 20000, s"zero-crossings: $ms2 ms")
  }

  test("short BMP (<22 bytes: dims unreadable) rejects fast") {
    val p = "BM        ".getBytes("ISO-8859-1")
    val ms = run(Multimodal.bmpPixelStats(col("payload")), Seq.fill(50)(p))
    assert(ms < 20000, s"50 short BMPs took $ms ms - cap-sized fold regressed")
  }
}
