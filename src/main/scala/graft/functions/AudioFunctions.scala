package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions.udf

/** Column-level audio operators (klio-audio parity,
  * `audio/src/klio_audio/transforms/audio.py`): waveforms are
  * `array<float>` columns, spectrograms `array<array<float>>` (frame-major).
  *
  * These are Scala UDFs by design: each row carries a whole signal and the
  * kernels ([[Dsp]]) are tight primitive-array loops — there is nothing for
  * per-expression codegen to fuse, and the array payloads dominate cost.
  * The reference pays a proto+pickle round trip per operator on top of the
  * same math (`audio/src/klio_audio/decorators.py:53-142`); here rows stay
  * in Tungsten format between UDF calls.
  */
object AudioFunctions {

  private def toD(xs: Seq[Float]): Array[Double] = xs.toArray.map(_.toDouble)
  private def toF(xs: Array[Double]): Seq[Float] = xs.toSeq.map(_.toFloat)
  private def toF2(xs: Array[Array[Double]]): Seq[Seq[Float]] =
    xs.toSeq.map(r => r.toSeq.map(_.toFloat))

  /** Deterministic synthetic PCM16 WAV (gate fixture source): sample j is
    * the LCG value ((id·131 + j·7919) mod 65535) − 32767 scaled to
    * [−1, 1], forced to silence before `onset`. ONE definition shared by
    * every codec-backed gate query (m2/m3/a6) so the LCG constants and
    * codec scaling can never diverge between a query and its oracle.
    */
  val syntheticLcgWav = udf((id: Long, onset: Int) =>
    Dsp.encodeWavPcm16(Array.tabulate(256) { j =>
      if (j < onset) 0.0
      else (((id * 131 + j * 7919) % 65535) - 32767) / 32767.0
    }, 8000))

  /** Integer PCM recovery of a decoded [−1,1] float signal:
    * k = round(v·32768) — the inverse the oracles replay.
    */
  def pcm16(y: Column): Column = {
    import org.apache.spark.sql.functions.{transform, round}
    transform(y, v => round(v.cast("double") * 32768).cast("long"))
  }

  /** Deterministic sine synth (test/pipeline signal source):
    * sin(2π·bin·i/nFft) for `samples` samples — a pure tone centered on an
    * exact FFT bin.
    */
  val synthTone = udf((bin: Int, nFft: Int, samples: Int) =>
    toF(Array.tabulate(samples)(i =>
      math.sin(2.0 * math.Pi * bin * i / nFft))))

  /** GetSTFT (audio.py:76-132): magnitude spectrogram. */
  val stftMag = udf((y: Seq[Float], nFft: Int, hop: Int) =>
    toF2(Dsp.stftMag(toD(y), nFft, hop)))

  /** GetSpec (audio.py:135-187): dB-scaled magnitude spectrogram. */
  val spectrogramDb = udf((y: Seq[Float], nFft: Int, hop: Int) =>
    toF2(Dsp.amplitudeToDb(Dsp.stftMag(toD(y), nFft, hop))))

  /** GetMelSpec (audio.py:190-244). */
  val melSpec = udf((y: Seq[Float], sr: Double, nFft: Int, hop: Int,
      nMels: Int) => toF2(Dsp.melSpectrogram(toD(y), sr, nFft, hop, nMels)))

  /** GetMFCC (audio.py:247-305). */
  val mfcc = udf((y: Seq[Float], sr: Double, nMfcc: Int) =>
    toF2(Dsp.mfcc(toD(y), sr, nMfcc)))

  /** power_to_db over a matrix column (MelSpecToPlot's pre-step,
    * audio.py:404-407: librosa.power_to_db(payload, ref=np.max)).
    */
  val powerDb = udf((spec: Seq[Seq[Float]]) =>
    toF2(Dsp.powerToDb(spec.map(f => toD(f)).toArray)))

  /** GetMagnitude example (integration transforms.py:54-68): the GLOBAL
    * argmax bin over all frames of a magnitude spectrogram — the
    * spectrogram's single dominant frequency bin (ties to the lowest
    * frame/bin), not a per-frame vector.
    */
  val peakBin = udf((spec: Seq[Seq[Float]]) => {
    // global peak over all frames, ties to the lowest bin; -inf init so
    // all-negative inputs (dB-scaled spectrograms peak at exactly 0) still
    // find their true argmax
    var best = Float.NegativeInfinity
    var bin = 0
    spec.foreach { frame =>
      var b = 0
      frame.foreach { v =>
        if (v > best) { best = v; bin = b }
        b += 1
      }
    }
    bin
  })

  /** GetSoftMask example (transforms.py:117-140). */
  val softmask = udf((x: Seq[Float], xRef: Seq[Float], power: Double) =>
    toF(Dsp.softmask(toD(x), toD(xRef), power)))

  /** FilterNearestNeighbors example (transforms.py:71-92). */
  val nnFilter = udf((spec: Seq[Seq[Float]], k: Int) =>
    toF2(Dsp.nnFilter(spec.map(f => toD(f)).toArray, k)))

  /** Landmark fingerprint hashes over a magnitude STFT
    * ([[Dsp.fingerprints]]): distinct successive-stable-peak pair
    * hashes — the audio near-dup signature.
    */
  val fingerprints = udf((spec: Seq[Seq[Float]]) =>
    Dsp.fingerprints(spec.map(f => toD(f)).toArray).toSeq)

  /** LoadAudio stand-in (audio.py:26-73): WAV PCM16 bytes → samples. */
  val decodeWav = udf((bytes: Array[Byte]) =>
    toF(Dsp.decodeWavPcm16(bytes)._1))

  /** LoadAudio's resampling half (librosa.load(sr=...), audio.py:26-73):
    * windowed-sinc sample-rate conversion.
    */
  val resample = udf((y: Seq[Float], srIn: Int, srOut: Int) =>
    toF(Dsp.resample(toD(y), srIn, srOut)))

  def stft(y: Column, nFft: Int = 1024, hop: Int = 256): Column = {
    import org.apache.spark.sql.functions.lit
    stftMag(y, lit(nFft), lit(hop))
  }
}
