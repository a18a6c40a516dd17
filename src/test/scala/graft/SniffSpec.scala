package graft

import org.apache.spark.sql.functions._

import graft.multimodal.{Multimodal, WavCodec}

/** [[Multimodal.sniffMetadata]]: byte-level header fields asserted
  * against what the real JDK encoders wrote — no decode involved. */
class SniffSpec extends SparkSuite {

  private def rec(id: Long, kind: String, payload: Array[Byte]) =
    Multimodal.MediaRecord(id, kind,
      Multimodal.MediaMeta("raw", 0, 0, 0, 0), payload)

  test("PNG IHDR: width, height, bit depth as the JDK encoder wrote them") {
    val s = Multimodal.sniffMetadata(Multimodal.synthesizePng(spark, 1))
      .collect().head
    assert(s.container === "png")
    assert(s.width === 16 && s.height === 16) // synthesizePng is 16x16
    assert(s.bit_depth === 8)
  }

  test("WAV fmt chunk: sample rate, channels, bit depth as encoded") {
    import spark.implicits._
    val s = Multimodal.sniffMetadata(
      Seq(rec(2L, "audio",
        WavCodec.encode(Array.fill(64)(123), 22050))).toDS())
      .collect().head
    assert(s.container === "wav")
    assert(s.sample_rate === 22050)
    assert(s.channels === 1)
    assert(s.bit_depth === 16)
  }

  test("GIF logical screen descriptor: width and height as encoded") {
    val s = Multimodal.sniffMetadata(
      Multimodal.synthesizeGif(spark, 1, nFrames = 2)).collect().head
    assert(s.container === "gif")
    assert(s.width === 8 && s.height === 8) // synthesizeGif frames are 8x8
  }

  test("unrecognized bytes catalog as unknown with -1 fields, never throw") {
    import spark.implicits._
    val s = Multimodal.sniffMetadata(
      Seq(rec(4L, "video", Array.tabulate(100)(_.toByte)),
        rec(5L, "image", Array[Byte]())).toDS())
      .collect().sortBy(_.media_id)
    assert(s.forall(_.container === "unknown"))
    assert(s.forall(m => m.width === -1 && m.sample_rate === -1))
  }

  test("registry query catalogs every container class, counts exact") {
    val out = SparkEntry.queries("q_multimodal_metadata")(spark, Sf)
      .collect().map(r => r.getString(0) ->
        (r.getLong(1), r.getInt(2), r.getInt(4))).toMap
    // synthesize(300): 100 audio WAVs + 200 raw image/video payloads;
    // synthesizeGif(50); synthesizePng(50)
    assert(out("wav")._1 === 100L && out("wav")._3 === 16000)
    assert(out("gif")._1 === 50L && out("gif")._2 === 8)
    assert(out("png")._1 === 50L)
    assert(out("unknown")._1 === 200L)
  }
}
