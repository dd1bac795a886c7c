package graft

import org.scalatest.funsuite.AnyFunSuite

import graft.functions.Dsp

/** Analytic validation of the DSP kernels — the reference leans on librosa
  * and golden logs; with no JVM reference library, known-signal mathematics
  * is the ground truth (SURVEY §7.4 hard part).
  */
class DspSpec extends AnyFunSuite {

  val rng = new scala.util.Random(42)

  def naiveDft(x: Array[Double]): (Array[Double], Array[Double]) = {
    val n = x.length
    val re = new Array[Double](n)
    val im = new Array[Double](n)
    for (k <- 0 until n; t <- 0 until n) {
      val ang = -2.0 * math.Pi * k * t / n
      re(k) += x(t) * math.cos(ang)
      im(k) += x(t) * math.sin(ang)
    }
    (re, im)
  }

  test("fft matches the naive DFT on random signals") {
    for (_ <- 1 to 5) {
      val x = Array.fill(64)(rng.nextDouble() * 2 - 1)
      val (er, ei) = naiveDft(x)
      val re = x.clone()
      val im = new Array[Double](64)
      Dsp.fft(re, im)
      for (k <- 0 until 64) {
        assert(math.abs(re(k) - er(k)) < 1e-9, s"re[$k]")
        assert(math.abs(im(k) - ei(k)) < 1e-9, s"im[$k]")
      }
    }
  }

  test("fft satisfies Parseval's theorem") {
    val x = Array.fill(256)(rng.nextDouble() * 2 - 1)
    val re = x.clone()
    val im = new Array[Double](256)
    Dsp.fft(re, im)
    val timeEnergy = x.map(v => v * v).sum
    val freqEnergy = re.zip(im).map { case (a, b) => a * a + b * b }.sum / 256
    assert(math.abs(timeEnergy - freqEnergy) < 1e-9)
  }

  test("stft of an exact-bin tone peaks at that bin in every frame") {
    val nFft = 1024
    val bin = 40
    val y = Array.tabulate(8192)(i =>
      math.sin(2.0 * math.Pi * bin * i / nFft))
    val mag = Dsp.stftMag(y, nFft, 256)
    // skip edge frames dominated by reflect padding
    mag.slice(2, mag.length - 2).foreach { frame =>
      assert(frame.indexOf(frame.max) === bin)
    }
  }

  test("amplitudeToDb: max is 0 dB, floor is -80 dB") {
    val s = Array(Array(1.0, 0.1, 1e-9))
    val db = Dsp.amplitudeToDb(s)
    assert(math.abs(db(0)(0)) < 1e-12)
    assert(math.abs(db(0)(1) + 20.0) < 1e-9)
    assert(db(0)(2) === -80.0)
  }

  test("mel filterbank peaks move monotonically up in frequency") {
    val fb = Dsp.melFilterbank(8000.0, 1024, 32)
    val peaks = fb.map(f => f.indexOf(f.max))
    assert(peaks.zip(peaks.tail).forall { case (a, b) => a <= b })
    assert(fb.forall(_.forall(_ >= 0.0)))
    // every filter has some support
    assert(fb.forall(_.exists(_ > 0.0)))
  }

  test("mfcc of a flat (white) spectrum concentrates energy in c0") {
    val y = Array.fill(8192)(rng.nextDouble() * 2 - 1)
    val c = Dsp.mfcc(y, 8000.0)
    val frame = c(c.length / 2)
    assert(math.abs(frame(0)) > math.abs(frame(5)))
    assert(frame.length === 13)
  }

  test("softmask is in [0,1] and 0.5 at equality") {
    val m = Dsp.softmask(Array(1.0, 0.0, 3.0), Array(1.0, 0.0, 1.0), 2.0)
    assert(math.abs(m(0) - 0.5) < 1e-12)
    assert(math.abs(m(1) - 0.5) < 1e-12)
    assert(m(2) > 0.5 && m(2) <= 1.0)
  }

  test("nnFilter of identical frames is the identity") {
    val frames = Array.fill(6)(Array(1.0, 2.0, 3.0))
    val out = Dsp.nnFilter(frames, 3)
    out.foreach(f => assert(f.toSeq === Seq(1.0, 2.0, 3.0)))
  }

  test("wav pcm16 encode/decode roundtrip") {
    val y = Array.tabulate(800)(i => math.sin(2.0 * math.Pi * 440 * i / 8000))
    val bytes = Dsp.encodeWavPcm16(y, 8000)
    val (back, sr) = Dsp.decodeWavPcm16(bytes)
    assert(sr === 8000)
    assert(back.length === 800)
    y.zip(back).foreach { case (a, b) => assert(math.abs(a - b) < 1e-4) }
  }

  test("peakBin finds the argmax of all-negative dB spectrograms") {
    import org.apache.spark.sql.functions._
    val spark = TestSpark.spark
    import spark.implicits._
    val df = Seq(Seq(Seq(-40.0f, -3.0f, -80.0f), Seq(-60.0f, -9.0f, 0.0f)))
      .toDF("spec")
    val bin = df.select(
      graft.functions.AudioFunctions.peakBin(col("spec")).as("b"))
      .as[Int].head()
    assert(bin === 2) // the 0.0 dB peak, not a default-initialized 0
  }

  test("resample preserves a tone's frequency and librosa's output length") {
    val sr = 8000
    val f = 440.0
    val y = Array.tabulate(4096)(i => math.sin(2.0 * math.Pi * f * i / sr))
    // downsample 2:1 — interior samples must match the analytic tone at
    // the new rate (edges excluded: the truncated kernel is approximate)
    val down = Dsp.resample(y, sr, sr / 2)
    assert(down.length === 2048) // ceil(4096 * 0.5)
    (64 until down.length - 64).foreach { k =>
      val want = math.sin(2.0 * math.Pi * f * k / (sr / 2))
      assert(math.abs(down(k) - want) < 1e-2,
        s"sample $k: ${down(k)} vs $want")
    }
    // upsample 1:2 likewise
    val up = Dsp.resample(y, sr, sr * 2)
    assert(up.length === 8192)
    (128 until up.length - 128).foreach { k =>
      val want = math.sin(2.0 * math.Pi * f * k / (sr * 2))
      assert(math.abs(up(k) - want) < 1e-2)
    }
    // identity rates return a copy
    assert(Dsp.resample(y, sr, sr).toSeq === y.toSeq)
  }

  test("fingerprints: stable-peak pair hashes survive time shift and " +
      "requantization; boundary junk and silence runs are filtered") {
    def melody(src: Long): Seq[Int] = (0 until 8).map { k =>
      val h = src * 37 + k * 11 + 5
      (3 + (h * h / 64) % 12 + 12 * (k % 2)).toInt
    }
    def clip(src: Long, shift: Int, amp: Int): Array[Double] = {
      val y = new Array[Double](shift + 8 * 256)
      for (k <- 0 until 8; n <- 0 until 256)
        y(shift + k * 256 + n) = math.round(
          amp * math.cos(2 * math.Pi * melody(src)(k) * n / 64)) / 32768.0
      y
    }
    def fp(y: Array[Double]) =
      Dsp.fingerprints(Dsp.stftMag(y, 64, 64)).toSeq
    val expect = melody(9).sliding(2)
      .map(p => p(0).toLong * 256 + p(1)).toSeq.distinct.sorted
    assert(fp(clip(9, 0, 8000)) === expect)
    // time shift by 2.5 frames: leading silence is a dropped bin-0 run,
    // note boundaries move — hashes identical
    assert(fp(clip(9, 160, 8000)) === expect)
    // requantization: argmax is amplitude-invariant
    assert(fp(clip(9, 0, 5600)) === expect)
    // a different melody shares few hashes
    val other = fp(clip(10, 0, 8000)).toSet
    assert(expect.toSet.intersect(other).size < 6)
    // pure silence fingerprints to nothing
    assert(Dsp.fingerprints(Dsp.stftMag(new Array[Double](2048), 64, 64))
      .isEmpty)
  }

  test("resample downsampling filters out above-Nyquist content") {
    val sr = 8000
    // 3 kHz tone: below input Nyquist (4 kHz) but above the 2:1 output's
    // (2 kHz) — the anti-aliasing kernel must suppress it, not fold it
    val y = Array.tabulate(4096)(i => math.sin(2.0 * math.Pi * 3000 * i / sr))
    val down = Dsp.resample(y, sr, sr / 2)
    val energy = down.slice(64, down.length - 64).map(x => x * x).sum /
      (down.length - 128)
    assert(energy < 0.01, s"aliased energy leaked through: $energy")
  }
}
