package graft.functions

/** Pure-Scala DSP kernels backing the audio operator surface (reference
  * `audio/src/klio_audio/transforms/audio.py`, which delegates to librosa —
  * no JVM equivalent exists offline, so these are from-scratch
  * implementations validated by property tests against analytic signals).
  *
  * Semantics follow librosa defaults where the reference uses them:
  * hann window, centered frames with reflect padding, slaney mel scale,
  * orthonormal DCT-II for MFCC.
  */
object Dsp {

  /** In-place iterative radix-2 Cooley–Tukey FFT. Lengths must be powers
    * of two.
    */
  def fft(re: Array[Double], im: Array[Double]): Unit = {
    val n = re.length
    require(n == im.length && (n & (n - 1)) == 0,
      s"FFT length must be a power of two, got $n")
    // bit reversal
    var i = 1
    var j = 0
    while (i < n) {
      var bit = n >> 1
      while ((j & bit) != 0) { j ^= bit; bit >>= 1 }
      j |= bit
      if (i < j) {
        val tr = re(i); re(i) = re(j); re(j) = tr
        val ti = im(i); im(i) = im(j); im(j) = ti
      }
      i += 1
    }
    var len = 2
    while (len <= n) {
      val ang = -2.0 * math.Pi / len
      val wr = math.cos(ang)
      val wi = math.sin(ang)
      var blockStart = 0
      while (blockStart < n) {
        var cr = 1.0
        var ci = 0.0
        var k = 0
        while (k < len / 2) {
          val i0 = blockStart + k
          val i1 = i0 + len / 2
          val xr = re(i1) * cr - im(i1) * ci
          val xi = re(i1) * ci + im(i1) * cr
          re(i1) = re(i0) - xr
          im(i1) = im(i0) - xi
          re(i0) += xr
          im(i0) += xi
          val ncr = cr * wr - ci * wi
          ci = cr * wi + ci * wr
          cr = ncr
          k += 1
        }
        blockStart += len
      }
      len <<= 1
    }
  }

  /** Periodic Hann window (librosa/scipy default for STFT). */
  def hann(n: Int): Array[Double] =
    Array.tabulate(n)(i => 0.5 - 0.5 * math.cos(2.0 * math.Pi * i / n))

  /** Reflect-pad `y` by `pad` samples on both sides (librosa center mode). */
  def reflectPad(y: Array[Double], pad: Int): Array[Double] = {
    val n = y.length
    require(n > 1, "cannot reflect-pad a signal shorter than 2 samples")
    Array.tabulate(n + 2 * pad) { i =>
      var k = i - pad
      // reflect without repeating the edge sample
      while (k < 0 || k >= n) {
        if (k < 0) k = -k
        if (k >= n) k = 2 * (n - 1) - k
      }
      y(k)
    }
  }

  /** Magnitude STFT: frames of `nFft` every `hop` samples, hann-windowed,
    * centered. Returns (1 + nFft/2) x nFrames magnitudes, frame-major:
    * result(f) is the spectrum of frame f. (GetSTFT parity,
    * audio.py:76-132.)
    */
  def stftMag(y: Array[Double], nFft: Int = 1024, hop: Int = 256)
      : Array[Array[Double]] = {
    if (y.length < 2) return Array.empty // too short to reflect-pad/frame
    val w = hann(nFft)
    val padded = reflectPad(y, nFft / 2)
    val nFrames = 1 + (padded.length - nFft) / hop
    val nBins = nFft / 2 + 1
    Array.tabulate(nFrames) { f =>
      val re = new Array[Double](nFft)
      val im = new Array[Double](nFft)
      var i = 0
      while (i < nFft) { re(i) = padded(f * hop + i) * w(i); i += 1 }
      fft(re, im)
      Array.tabulate(nBins)(b => math.hypot(re(b), im(b)))
    }
  }

  /** amplitude_to_db with ref = max (GetSpec parity, audio.py:135-187):
    * 20 log10(S/ref) clamped at amin=1e-5 and top_db=80.
    */
  def amplitudeToDb(s: Array[Array[Double]], topDb: Double = 80.0)
      : Array[Array[Double]] = {
    val amin = 1e-5
    val ref = math.max(amin, s.iterator.flatMap(_.iterator).maxOption
      .getOrElse(amin))
    val db = s.map(_.map(v =>
      20.0 * math.log10(math.max(amin, v) / ref)))
    val peak = db.iterator.flatMap(_.iterator).maxOption.getOrElse(0.0)
    db.map(_.map(v => math.max(v, peak - topDb)))
  }

  /** power_to_db: 10 log10, same clamping (GetMFCC path, audio.py:247-305). */
  def powerToDb(s: Array[Array[Double]], topDb: Double = 80.0)
      : Array[Array[Double]] = {
    val amin = 1e-10
    val ref = math.max(amin, s.iterator.flatMap(_.iterator).maxOption
      .getOrElse(amin))
    val db = s.map(_.map(v => 10.0 * math.log10(math.max(amin, v) / ref)))
    val peak = db.iterator.flatMap(_.iterator).maxOption.getOrElse(0.0)
    db.map(_.map(v => math.max(v, peak - topDb)))
  }

  private def hzToMel(hz: Double): Double = {
    // slaney scale: linear below 1 kHz, log above
    val fSp = 200.0 / 3.0
    val minLogHz = 1000.0
    val logStep = math.log(6.4) / 27.0
    if (hz < minLogHz) hz / fSp
    else minLogHz / fSp + math.log(hz / minLogHz) / logStep
  }

  private def melToHz(mel: Double): Double = {
    val fSp = 200.0 / 3.0
    val minLogHz = 1000.0
    val minLogMel = minLogHz / fSp
    val logStep = math.log(6.4) / 27.0
    if (mel < minLogMel) mel * fSp
    else minLogHz * math.exp(logStep * (mel - minLogMel))
  }

  /** Slaney-normalized triangular mel filterbank: nMels x (nFft/2+1). */
  def melFilterbank(sr: Double, nFft: Int, nMels: Int = 32,
      fMin: Double = 0.0, fMaxOpt: Double = -1.0): Array[Array[Double]] = {
    val fMax = if (fMaxOpt > 0) fMaxOpt else sr / 2.0
    val nBins = nFft / 2 + 1
    val binHz = Array.tabulate(nBins)(b => b * sr / nFft)
    val melPts = Array.tabulate(nMels + 2)(i =>
      melToHz(hzToMel(fMin) + (hzToMel(fMax) - hzToMel(fMin)) * i / (nMels + 1)))
    Array.tabulate(nMels) { m =>
      val (lo, mid, hi) = (melPts(m), melPts(m + 1), melPts(m + 2))
      val norm = 2.0 / (hi - lo) // slaney area normalization
      Array.tabulate(nBins) { b =>
        val f = binHz(b)
        val up = (f - lo) / (mid - lo)
        val down = (hi - f) / (hi - mid)
        math.max(0.0, math.min(up, down)) * norm
      }
    }
  }

  /** Mel power spectrogram: filterbank × |STFT|², frame-major nMels columns
    * (GetMelSpec parity, audio.py:190-244).
    */
  def melSpectrogram(y: Array[Double], sr: Double, nFft: Int = 1024,
      hop: Int = 256, nMels: Int = 32): Array[Array[Double]] = {
    val mag = stftMag(y, nFft, hop)
    val fb = melFilterbank(sr, nFft, nMels)
    mag.map { frame =>
      val power = frame.map(v => v * v)
      fb.map { filt =>
        var s = 0.0
        var b = 0
        while (b < filt.length) { s += filt(b) * power(b); b += 1 }
        s
      }
    }
  }

  /** Orthonormal DCT-II over the mel axis → MFCCs (audio.py:247-305). */
  def mfcc(y: Array[Double], sr: Double, nMfcc: Int = 13, nFft: Int = 1024,
      hop: Int = 256, nMels: Int = 32): Array[Array[Double]] = {
    val melDb = powerToDb(melSpectrogram(y, sr, nFft, hop, nMels))
    melDb.map { frame =>
      val n = frame.length
      Array.tabulate(nMfcc) { k =>
        var s = 0.0
        var i = 0
        while (i < n) {
          s += frame(i) * math.cos(math.Pi * k * (2 * i + 1) / (2.0 * n))
          i += 1
        }
        val scale =
          if (k == 0) math.sqrt(1.0 / n) else math.sqrt(2.0 / n)
        s * scale
      }
    }
  }

  /** softmask(X, Xref, power): X^p / (X^p + Xref^p), 0.5 where both zero
    * (GetSoftMask example parity, integration transforms.py:117-140).
    */
  def softmask(x: Array[Double], xRef: Array[Double], power: Double = 1.0)
      : Array[Double] =
    x.zip(xRef).map { case (a, b) =>
      val pa = math.pow(math.max(0.0, a), power)
      val pb = math.pow(math.max(0.0, b), power)
      if (pa + pb == 0.0) 0.5 else pa / (pa + pb)
    }

  /** Cosine-similarity nearest-neighbor filter over frames: each frame is
    * replaced by the element-wise median of its k most-similar other frames
    * (FilterNearestNeighbors example parity, transforms.py:71-92 —
    * librosa.decompose.nn_filter with aggregate=median, metric=cosine).
    */
  def nnFilter(frames: Array[Array[Double]], k: Int = 5)
      : Array[Array[Double]] = {
    val n = frames.length
    if (n <= 1) return frames.map(_.clone())
    val norms = frames.map(f => math.sqrt(f.map(v => v * v).sum))
    def cos(i: Int, j: Int): Double = {
      var s = 0.0
      var b = 0
      while (b < frames(i).length) { s += frames(i)(b) * frames(j)(b); b += 1 }
      if (norms(i) == 0 || norms(j) == 0) 0.0 else s / (norms(i) * norms(j))
    }
    Array.tabulate(n) { i =>
      val nbrs = (0 until n).filter(_ != i)
        .sortBy(j => (-cos(i, j), j))
        .take(math.min(k, n - 1))
      Array.tabulate(frames(i).length) { b =>
        val vals = nbrs.map(frames(_)(b)).sorted
        val m = vals.length
        if (m % 2 == 1) vals(m / 2) else (vals(m / 2 - 1) + vals(m / 2)) / 2.0
      }
    }
  }

  /** Sample-rate conversion (the `sr` half of librosa.load — LoadAudio
    * resamples to 22050 Hz BY DEFAULT, audio.py:26-73): windowed-sinc
    * (Kaiser-lite: Hann-windowed, 16 zero-crossings) polyphase resampling,
    * the same construction librosa's `resample(res_type="sinc")` family
    * uses. Output length = ceil(n · srOut/srIn), matching librosa. A pure
    * tone below the output Nyquist keeps its frequency exactly (phase
    * shift only), so resampled spectra stay analytically predictable.
    */
  def resample(y: Array[Double], srIn: Int, srOut: Int): Array[Double] = {
    require(srIn > 0 && srOut > 0, "sample rates must be positive")
    if (srIn == srOut || y.isEmpty) return y.clone()
    val ratio = srOut.toDouble / srIn
    val nOut = math.ceil(y.length * ratio).toInt
    // anti-aliasing: when downsampling, the kernel cutoff narrows to the
    // output Nyquist (scale = ratio); upsampling keeps the input Nyquist
    val scale = math.min(1.0, ratio)
    val zeros = 16
    val halfWidth = zeros / scale // input samples per kernel half
    val out = new Array[Double](nOut)
    var k = 0
    while (k < nOut) {
      val center = k / ratio
      val lo = math.max(0, math.ceil(center - halfWidth).toInt)
      val hi = math.min(y.length - 1, math.floor(center + halfWidth).toInt)
      var acc = 0.0
      var wsum = 0.0
      var i = lo
      while (i <= hi) {
        val x = (i - center) * scale // in output-sample units
        val sinc =
          if (math.abs(x) < 1e-12) 1.0
          else math.sin(math.Pi * x) / (math.Pi * x)
        val w = 0.5 + 0.5 * math.cos(math.Pi * x / zeros) // hann taper
        val c = sinc * w * scale
        acc += y(i) * c
        wsum += c
        i += 1
      }
      // normalize by the kernel mass actually inside the signal: unit DC
      // gain everywhere, so edge samples don't droop from the truncated tap
      out(k) = if (wsum == 0.0) 0.0 else acc / wsum
      k += 1
    }
    out
  }

  /** Minimal RIFF/WAVE PCM16 mono decode → [-1, 1] doubles (LoadAudio
    * stand-in, audio/io.py:28-111 + audio.py:26-73; OGG needs a codec the
    * container lacks — binary plumbing for it lives in graft.multimodal).
    */
  /** Landmark-style audio fingerprint (the Shazam construction's
    * constellation idea reduced to its exactly-testable core): per-frame
    * DOMINANT spectral peak → STABLE runs (the same argmax bin across
    * ≥ `minRun` consecutive frames — a note-boundary frame mixes two
    * tones and cannot persist, so boundary junk self-filters) → the
    * run-bin sequence's successive pairs hashed as b1·256+b2, distinct,
    * sorted. Two clips sharing many pair hashes are near-duplicate
    * audio regardless of time shift (runs shift with the signal) or
    * requantization (argmax is amplitude-invariant). Bin-0 runs
    * (silence / DC) are dropped; adjacent equal run bins collapse.
    */
  def fingerprints(mag: Array[Array[Double]], minRun: Int = 2)
      : Array[Long] = {
    val am = mag.map { fr =>
      var bi = 0
      var bv = fr(0)
      var b = 1
      while (b < fr.length) {
        if (fr(b) > bv) { bv = fr(b); bi = b }
        b += 1
      }
      bi
    }
    val runs = scala.collection.mutable.ArrayBuffer.empty[Int]
    var i = 0
    while (i < am.length) {
      var j = i
      while (j < am.length && am(j) == am(i)) j += 1
      if (j - i >= minRun && am(i) != 0 &&
          (runs.isEmpty || runs.last != am(i))) runs += am(i)
      i = j
    }
    runs.iterator.zip(runs.iterator.drop(1))
      .map { case (a, b) => a.toLong * 256 + b }
      .toArray.distinct.sorted
  }

  def decodeWavPcm16(bytes: Array[Byte]): (Array[Double], Int) = {
    val bb = java.nio.ByteBuffer.wrap(bytes)
      .order(java.nio.ByteOrder.LITTLE_ENDIAN)
    require(bytes.length > 44 && bb.getInt(0) == 0x46464952,
      "not a RIFF file") // "RIFF"
    require(bb.getInt(8) == 0x45564157, "not a WAVE file") // "WAVE"
    var pos = 12
    var sampleRate = 0
    var dataStart = -1
    var dataLen = 0
    while (pos + 8 <= bytes.length && (dataStart < 0 || sampleRate == 0)) {
      val id = bb.getInt(pos)
      val size = bb.getInt(pos + 4)
      require(size >= 0, s"corrupt WAV: negative chunk size $size")
      if (id == 0x20746d66) { // "fmt "
        require(bb.getShort(pos + 8) == 1, "PCM only")
        require(bb.getShort(pos + 10) == 1, "mono only")
        sampleRate = bb.getInt(pos + 12)
        require(bb.getShort(pos + 22) == 16, "16-bit only")
      } else if (id == 0x61746164) { // "data"
        dataStart = pos + 8
        dataLen = size
      }
      pos += 8 + size + (size & 1)
    }
    require(sampleRate > 0 && dataStart > 0, "missing fmt/data chunk")
    require(dataStart + dataLen <= bytes.length,
      s"corrupt WAV: data chunk ($dataLen bytes at $dataStart) exceeds " +
        s"file length ${bytes.length}")
    val n = dataLen / 2
    val out = Array.tabulate(n)(i =>
      bb.getShort(dataStart + 2 * i) / 32768.0)
    (out, sampleRate)
  }

  /** PCM16 mono WAV encode (for tests and sink parity). */
  def encodeWavPcm16(samples: Array[Double], sampleRate: Int): Array[Byte] = {
    val dataLen = samples.length * 2
    val bb = java.nio.ByteBuffer.allocate(44 + dataLen)
      .order(java.nio.ByteOrder.LITTLE_ENDIAN)
    bb.putInt(0x46464952).putInt(36 + dataLen).putInt(0x45564157)
    bb.putInt(0x20746d66).putInt(16).putShort(1).putShort(1)
      .putInt(sampleRate).putInt(sampleRate * 2).putShort(2).putShort(16)
    bb.putInt(0x61746164).putInt(dataLen)
    samples.foreach { s =>
      val clamped = math.max(-1.0, math.min(1.0, s))
      bb.putShort(math.round(clamped * 32767.0).toShort)
    }
    bb.array()
  }
}
