package graft

import graft.multimodal.{Multimodal, WavCodec}

/** [[Multimodal.vadSegments]] on planted clips with exact segment
  * structure: tone|silence|tone boundaries, the all-silence null case,
  * and threshold edge behavior. */
class VadSpec extends SparkSuite {

  private def clip(id: Long, samples: Array[Int]) =
    Multimodal.MediaRecord(id, "audio",
      Multimodal.MediaMeta("wav", 0, 0, 16000, 0),
      WavCodec.encode(samples, 16000))

  private def tone(n: Int, amp: Int): Array[Int] =
    Array.tabulate(n)(i => if (i % 2 == 0) amp else -amp)

  test("tone|silence|tone yields exactly two segments with exact boundaries") {
    import spark.implicits._
    // 4 frames of 64: [tone, silence, tone, tone]
    val samples = tone(64, 20000) ++ Array.fill(64)(0) ++ tone(128, 20000)
    val segs = Multimodal.vadSegments(Seq(clip(1L, samples)).toDS(),
      frameLen = 64, threshold = 0.1).collect().sortBy(_.seg_idx)
    assert(segs.length === 2)
    assert(segs(0).start_frame === 0 && segs(0).n_frames === 1)
    assert(segs(1).start_frame === 2 && segs(1).n_frames === 2)
    // square wave of amplitude a has RMS a/32768 exactly
    assert(math.abs(segs(0).peak_rms - 20000.0 / 32768.0) < 1e-12)
  }

  test("an all-silence clip yields no segments") {
    import spark.implicits._
    val segs = Multimodal.vadSegments(
      Seq(clip(2L, Array.fill(256)(0))).toDS(),
      frameLen = 64, threshold = 0.1).collect()
    assert(segs.isEmpty)
  }

  test("sub-threshold tone stays silent; threshold is strict") {
    import spark.implicits._
    // amplitude 3000 -> rms ~0.0916 < 0.1
    val segs = Multimodal.vadSegments(
      Seq(clip(3L, tone(256, 3000))).toDS(),
      frameLen = 64, threshold = 0.1).collect()
    assert(segs.isEmpty)
  }

  test("registry query: per-clip segments are well-formed") {
    val out = SparkEntry.queries("q_multimodal_vad")(spark, Sf).collect()
    assert(out.nonEmpty)
    out.foreach { r =>
      assert(r.getInt(1) >= 0)          // seg_idx
      assert(r.getInt(2) >= 0)          // start_frame
      assert(r.getInt(3) >= 1)          // n_frames
      assert(r.getDouble(4) > 0.1)      // peak above threshold
    }
  }
}
