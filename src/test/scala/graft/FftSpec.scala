package graft

import org.apache.spark.sql.functions._

import graft.multimodal.{Fft, Multimodal, WavCodec}

/** [[Fft]] (radix-2 Cooley-Tukey) and [[Multimodal.spectrogram]]:
  * analytic identities (impulse, Parseval) plus a planted pure tone
  * whose dominant bin and band concentration are known exactly. */
class FftSpec extends SparkSuite {

  test("impulse transforms to a flat unit spectrum") {
    val n = 64
    val re = new Array[Double](n)
    val im = new Array[Double](n)
    re(0) = 1.0
    Fft.transform(re, im)
    (0 until n).foreach { k =>
      assert(math.abs(re(k) - 1.0) < 1e-12 && math.abs(im(k)) < 1e-12)
    }
  }

  test("Parseval: sum |X_k|^2 == N * sum x^2 on deterministic noise") {
    val n = 256
    val re = Array.tabulate(n)(i => ((mix64(i) & 0xffff) / 65536.0) - 0.5)
    val im = new Array[Double](n)
    val timeE = re.map(x => x * x).sum
    Fft.transform(re, im)
    val freqE = (0 until n).map(k => re(k) * re(k) + im(k) * im(k)).sum
    assert(math.abs(freqE - n * timeE) / (n * timeE) < 1e-9,
      s"Parseval violated: $freqE vs ${n * timeE}")
  }

  test("a bin-aligned sine peaks at exactly its bin (and its mirror)") {
    val n = 256
    val bin = 32
    val re = Array.tabulate(n)(i => math.sin(2.0 * math.Pi * bin * i / n))
    val im = new Array[Double](n)
    Fft.transform(re, im)
    val p = (0 until n).map(k => re(k) * re(k) + im(k) * im(k))
    val top = p.zipWithIndex.sortBy(-_._1).take(2).map(_._2).toSet
    assert(top === Set(bin, n - bin))
    // every other bin is numerically zero relative to the peak
    p.zipWithIndex.filterNot(t => top(t._2)).foreach { case (e, _) =>
      assert(e < p(bin) * 1e-12)
    }
  }

  test("spectrogram of a planted 2 kHz tone: dominant bin, hz, band concentration") {
    import spark.implicits._
    val n = 256
    val bin = 32
    val sr = 16000
    val payload = WavCodec.encode(Array.tabulate(n)(i =>
      math.round(30000.0 * math.sin(2.0 * math.Pi * bin * i / n)).toInt), sr)
    val media = Seq(Multimodal.MediaRecord(1L, "audio",
      Multimodal.MediaMeta("wav", 0, 0, sr, 0), payload)).toDS()
    val s = Multimodal.spectrogram(media, nFft = n, nBands = 8).collect().head
    assert(s.dominant_bin === bin)
    assert(math.abs(s.dominant_hz - bin.toDouble * sr / n) < 1e-9) // = 2000 Hz
    // bin 32 of 128 one-sided bins -> band index (32-1)*8/128 = 1
    val share = s.band_energy(1) / s.total_energy
    assert(share > 0.95, s"tone energy not concentrated: $share")
    // bands partition the one-sided spectrum exactly
    assert(math.abs(s.band_energy.sum - s.total_energy) <=
      s.total_energy * 1e-12)
  }

  test("registry query emits one row per decodable audio clip") {
    val out = SparkEntry.queries("q_multimodal_spectrogram")(spark, Sf)
    val n = out.count()
    assert(n === 100) // 300 synthesized media, every 3rd is audio
    assert(out.filter(col("dominant_bin") < 1 ||
      col("dominant_bin") > 128).count() === 0)
  }
}
