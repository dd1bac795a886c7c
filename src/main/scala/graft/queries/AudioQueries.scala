package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.Tables
import graft.Checkpoints.StageOps
import graft.functions.AudioFunctions._
import graft.functions.Dsp

/** Audio DSP under the correctness gate. The oracle cannot run an FFT, but
  * analytic signals make STFT results SQL-predictable: a pure tone centered
  * on FFT bin b has its spectral peak exactly at bin b, so the oracle is
  * closed-form. a2 exercises the full mel/MFCC chain (rows-only check —
  * validated analytically in DspSpec instead).
  */
object AudioQueries {

  /** Synthesize one tone per event (bin = 25 + 5·(event_id mod 20) of a
    * 1024-point FFT), run the real STFT, report the global peak bin. The
    * oracle computes the same bin arithmetically.
    */
  def a1StftPeak(s: SparkSession, dir: String): DataFrame =
    Tables.events(s, dir)
      .filter(col("event_id") < 64)
      .select(col("event_id"),
        (lit(25) + (col("event_id") % 20) * 5).cast("int").as("bin"))
      .withColumn("y", synthTone(col("bin"), lit(1024), lit(4096)))
      .select(col("event_id"),
        peakBin(stftMag(col("y"), lit(1024), lit(256))).as("peak_bin"))
      .orderBy(col("event_id"))

  val a1Oracle: String =
    """SELECT event_id, CAST(25 + (event_id % 20) * 5 AS INT) AS peak_bin
      |FROM events WHERE event_id < 64 ORDER BY event_id""".stripMargin

  /** Full chain over synthesized tones: STFT → mel → MFCC, emitting shape
    * stats (frame/coefficient counts) plus the dominant mel band — all
    * closed-form for a pure tone, so the whole chain is oracle-checked.
    */
  def a2MelMfcc(s: SparkSession, dir: String): DataFrame =
    Tables.events(s, dir)
      .filter(col("event_id") < 16)
      .select(col("event_id"),
        (lit(25) + (col("event_id") % 20) * 5).cast("int").as("bin"))
      .withColumn("y", synthTone(col("bin"), lit(1024), lit(4096)))
      .withColumn("mel", melSpec(col("y"), lit(8000.0), lit(1024), lit(256),
        lit(32)))
      .withColumn("mf", mfcc(col("y"), lit(8000.0), lit(13)))
      .select(col("event_id"), col("bin"),
        size(col("mel")).as("n_frames"),
        size(element_at(col("mel"), 1)).as("n_mels"),
        peakBin(col("mel")).as("dominant_mel_band"),
        size(element_at(col("mf"), 1)).as("n_mfcc"))
      .orderBy(col("event_id"))

  /** Closed-form a2 oracle. Shapes: 17 frames (a3's arithmetic), 32 mel
    * bands, 13 MFCCs. Dominant mel band from the slaney filterbank edges:
    * every tone here sits below 1 kHz — the slaney LINEAR region — where
    * the 34 mel points are evenly spaced by Δ = mel(4000)/33 mel =
    * (15 + ln 4/(ln 6.4/27))/33, band m's triangle peaks at point m+1,
    * and adjacent-band weights at mel x are (x−p_j)/Δ vs (p_{j+1}−x)/Δ —
    * so the argmax for a tone at mel x is round(x/Δ) − 1. Spectral
    * leakage (hann sidelobes at bin±1) is symmetric in mel within the
    * linear region, contributing equally to both neighbors, so it cannot
    * flip the argmax. Verified against an independent numpy replica of
    * the full STFT→mel pipeline for all 16 bins.
    */
  val a2Oracle: String =
    """SELECT event_id, CAST(25 + (event_id % 20) * 5 AS INT) AS bin,
      |  17 AS n_frames, 32 AS n_mels,
      |  CAST(floor((CAST(25 + (event_id % 20) * 5 AS DOUBLE)
      |      * (8000.0 / 1024.0) * 3.0 / 200.0)
      |    / ((15.0 + ln(4.0) / (ln(6.4) / 27.0)) / 33.0) + 0.5) AS INT) - 1
      |    AS dominant_mel_band,
      |  13 AS n_mfcc
      |FROM events WHERE event_id < 16 ORDER BY event_id""".stripMargin

  /** The audio-spectrograms integration DAG's compute core
    * (integration/audio-spectrograms/transforms.py:71-140): dB spectrogram
    * → nearest-neighbor filter → softmask of full vs filtered, per tone.
    * Every output is closed-form: frame count = 1 + (samples + nFft −
    * nFft)/hop over the reflect-padded signal, mask length = frames ×
    * bins, and the dB argmax equals the tone bin (dB scaling is
    * monotone), so the whole chain is oracle-checked.
    */
  def a3SoftmaskNn(s: SparkSession, dir: String): DataFrame =
    Tables.events(s, dir)
      .filter(col("event_id") < 8)
      .select(col("event_id"),
        (lit(25) + (col("event_id") % 20) * 5).cast("int").as("bin"))
      .withColumn("y", synthTone(col("bin"), lit(1024), lit(4096)))
      .withColumn("spec", spectrogramDb(col("y"), lit(1024), lit(256)))
      .withColumn("nn", nnFilter(col("spec"), lit(3)))
      .withColumn("mask", softmask(flatten(col("spec")),
        flatten(col("nn")), lit(2.0)))
      .select(col("event_id"),
        size(col("spec")).as("n_frames"),
        size(col("nn")).as("n_nn_frames"),
        size(col("mask")).as("mask_len"),
        peakBin(col("spec")).as("spec_peak"))
      .orderBy(col("event_id"))

  /** 4096 samples reflect-padded by nFft/2 each side → 5120; frames =
    * 1 + (5120 − 1024)/256 = 17; bins = 513; mask = 17·513 = 8721.
    */
  val a3Oracle: String =
    """SELECT event_id, 17 AS n_frames, 17 AS n_nn_frames,
      |  8721 AS mask_len, CAST(25 + (event_id % 20) * 5 AS INT) AS spec_peak
      |FROM events WHERE event_id < 8 ORDER BY event_id""".stripMargin

  /** The audio-spectrograms DAG's SINK stage (SpecToPlot → GcsUploadPlot,
    * reference run.py:93-121): render the dB spectrogram of each tone as
    * a PNG heatmap and report the encoded image's IHDR dimensions —
    * decoded back from the actual PNG bytes, so the render→encode
    * roundtrip is under the gate. Closed-form: width = 17 frames,
    * height = 513 bins. The file write itself is
    * [[graft.multimodal.Plots.uploadPlots]], spec-covered (PlotsSpec).
    */
  def a4SpecPlot(s: SparkSession, dir: String): DataFrame =
    Tables.events(s, dir)
      .filter(col("event_id") < 8)
      .select(col("event_id"),
        (lit(25) + (col("event_id") % 20) * 5).cast("int").as("bin"))
      .withColumn("y", synthTone(col("bin"), lit(1024), lit(4096)))
      .withColumn("png", graft.multimodal.Plots.renderHeatmapPng(
        spectrogramDb(col("y"), lit(1024), lit(256))))
      .select(col("event_id"),
        graft.multimodal.Plots.pngWidth(col("png")).as("width"),
        graft.multimodal.Plots.pngHeight(col("png")).as("height"))
      .orderBy(col("event_id"))

  val a4Oracle: String =
    """SELECT event_id, 17 AS width, 513 AS height
      |FROM events WHERE event_id < 8 ORDER BY event_id""".stripMargin

  /** LoadAudio's resampling half (librosa.load resamples to a target sr
    * by default; audio.py:26-73) under the gate: each tone at bin b of a
    * 1024-point FFT is downsampled 2:1 through the windowed-sinc
    * resampler; in the halved rate the same physical frequency lands at
    * bin 2b (all tones sit below the new Nyquist, so no aliasing), and
    * the output length is ceil(n/2) — both closed-form.
    */
  def a5Resample(s: SparkSession, dir: String): DataFrame =
    Tables.events(s, dir)
      .filter(col("event_id") < 32)
      .select(col("event_id"),
        (lit(25) + (col("event_id") % 20) * 5).cast("int").as("bin"))
      .withColumn("y", synthTone(col("bin"), lit(1024), lit(4096)))
      .withColumn("y2", resample(col("y"), lit(8000), lit(4000)))
      .select(col("event_id"), col("bin"),
        size(col("y2")).as("n_out"),
        peakBin(stftMag(col("y2"), lit(1024), lit(256))).as("peak_bin"))
      .orderBy(col("event_id"))

  val a5Oracle: String =
    """SELECT event_id, CAST(25 + (event_id % 20) * 5 AS INT) AS bin,
      |  2048 AS n_out,
      |  CAST(2 * (25 + (event_id % 20) * 5) AS INT) AS peak_bin
      |FROM events WHERE event_id < 32 ORDER BY event_id""".stripMargin

  /** Silence trimming / onset detection (librosa.effects.trim's role in
    * an audio pipeline): each synthetic clip is SILENT for its first
    * 64 + id%64 samples, then carries the LCG pattern; the query decodes
    * the real WAV, finds the first non-silent sample, frames the signal
    * (win=64, hop=32, rectangular) and reports the first frame with
    * non-zero energy plus the total framed energy — everything in
    * integer PCM arithmetic through codegen'd array HOFs, zero shuffles
    * before the final sort. The oracle recomputes sample values, the
    * trim point, and every frame energy from the closed form, so the
    * framing arithmetic (boundaries, hop overlap) is pinned exactly —
    * the part of onset detection that's actually easy to get wrong.
    */
  def a6SilenceTrim(s: SparkSession, dir: String): DataFrame = {
    import graft.functions.AudioFunctions.{decodeWav, pcm16, syntheticLcgWav}
    val energy = aggregate(
      slice(col("k"), col("t") * 32 + 1, lit(64)),
      lit(0L), (a, x) => a + x * x)
    Tables.events(s, dir).filter(col("event_id") < 64)
      .select(col("event_id"),
        decodeWav(syntheticLcgWav(col("event_id"),
          (lit(64) + col("event_id") % 64).cast("int"))).as("y"))
      .select(col("event_id"), pcm16(col("y")).as("k"),
        array_position(transform(col("k"), x => x =!= 0L), true)
          .as("first_sample"))
      .select(col("event_id"), col("first_sample"),
        explode(sequence(lit(0), lit(6))).as("t"), col("k"))
      .select(col("event_id"), col("first_sample"), col("t"),
        energy.as("energy"))
      .groupBy(col("event_id"))
      .agg(max(col("first_sample")).as("first_sample"),
        min(when(col("energy") > 0, col("t"))).cast("long")
          .as("onset_frame"),
        sum(col("energy")).as("total_energy"))
      .orderBy(col("event_id"))
  }

  val a6Oracle: String =
    """WITH ks AS (SELECT event_id, j,
      |    CASE WHEN j < 64 + event_id % 64 THEN 0
      |      ELSE (event_id * 131 + j * 7919) % 65535 - 32767 END AS k
      |  FROM events, range(0, 256) r(j) WHERE event_id < 64),
      |fs AS (SELECT event_id, MIN(CASE WHEN k <> 0 THEN j END) + 1
      |    AS first_sample FROM ks GROUP BY event_id),
      |fe AS (SELECT event_id, t, SUM(k * k) AS energy
      |  FROM ks, range(0, 7) r(t)
      |  WHERE j >= t * 32 AND j < t * 32 + 64
      |  GROUP BY event_id, t)
      |SELECT fe.event_id, CAST(fs.first_sample AS BIGINT) AS first_sample,
      |  CAST(MIN(CASE WHEN energy > 0 THEN t END) AS BIGINT) AS onset_frame,
      |  CAST(SUM(energy) AS BIGINT) AS total_energy
      |FROM fe JOIN fs ON fe.event_id = fs.event_id
      |GROUP BY fe.event_id, fs.first_sample
      |ORDER BY fe.event_id""".stripMargin

  /** Audio fingerprint near-dup (a7) — the audio sibling of d4/m5:
    * landmark-style stable-peak pair hashes ([[graft.functions.Dsp
    * .fingerprints]]) over the REAL decode → STFT path, matched by an
    * exact hash equi-join (shuffle volume = clips × hashes, the posting
    * -list shape — never clips²). Each planted clip is an 8-note melody
    * of exact-bin tones (note k: bin 3 + ((h²/64) mod 12) + 12·(k mod 2)
    * with h = src·37 + k·11 + 5 — the even/odd register split makes
    * adjacent notes distinct WITHOUT a sequential fixup, so DuckDB
    * replays the melody closed-form); copies are requantized (amp 5600
    * vs 8000 — argmax is amplitude-invariant) or time-shifted by 2.5
    * frames (runs shift with the signal; the leading silence becomes a
    * dropped bin-0 run). Planted copies share all 7 pair hashes,
    * unrelated clips at most 5 (prototyped over the full id range), so
    * the ≥ 6 cut reports exactly the planted relationships — and the
    * oracle replays hash sets and the join from the formula while Spark
    * goes through WAV encode → decode → hann STFT → argmax runs.
    */
  def a7Fingerprint(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    import graft.functions.AudioFunctions.{decodeWav, fingerprints}
    val clips = Tables.events(s, dir).filter(col("event_id") < 40)
      .select(col("event_id")).as[Long].flatMap { id =>
        val out = scala.collection.mutable.ArrayBuffer(
          (id, id, 0, 8000))
        if (id % 3 == 0) out += ((10000 + id, id, 0, 5600))
        if (id % 4 == 0) out += ((20000 + id, id, 160, 8000))
        out
      }.toDF("clip_id", "src", "shift", "amp")
    val synth = udf((src: Long, shift: Int, amp: Int) => {
      val y = new Array[Double](shift + 8 * 256)
      var k = 0
      while (k < 8) {
        val h = src * 37 + k * 11 + 5
        val b = (3 + (h * h / 64) % 12 + 12 * (k % 2)).toInt
        var n = 0
        while (n < 256) {
          y(shift + k * 256 + n) =
            math.round(amp * math.cos(2 * math.Pi * b * n / 64)) / 32768.0
          n += 1
        }
        k += 1
      }
      Dsp.encodeWavPcm16(y, 8000)
    })
    val hs = clips
      .select(col("clip_id"),
        decodeWav(synth(col("src"), col("shift"), col("amp"))).as("y"))
      .select(col("clip_id"),
        explode(fingerprints(stftMag(col("y"), lit(64), lit(64))))
          .as("hash"))
      .staged()
    hs.as("a").join(hs.as("b"),
        col("a.hash") === col("b.hash") &&
          col("a.clip_id") < col("b.clip_id"))
      .groupBy(col("a.clip_id").as("ia"), col("b.clip_id").as("ib"))
      .agg(count(lit(1)).as("n_shared"))
      .filter(col("n_shared") >= 6)
      .orderBy(col("ia"), col("ib"))
  }

  val a7Oracle: String =
    """WITH ids AS (SELECT event_id AS id FROM events WHERE event_id < 40),
      |clips AS (
      |  SELECT id AS clip_id, id AS src FROM ids
      |  UNION ALL SELECT 10000 + id, id FROM ids WHERE id % 3 = 0
      |  UNION ALL SELECT 20000 + id, id FROM ids WHERE id % 4 = 0),
      |mel AS (SELECT clip_id, k,
      |    3 + ((src*37 + k*11 + 5) * (src*37 + k*11 + 5) // 64) % 12
      |      + 12 * (k % 2) AS b
      |  FROM clips, range(0, 8) r(k)),
      |hs AS (SELECT DISTINCT x.clip_id, x.b * 256 + y.b AS hash
      |  FROM mel x JOIN mel y
      |    ON x.clip_id = y.clip_id AND y.k = x.k + 1)
      |SELECT x.clip_id AS ia, y.clip_id AS ib,
      |  CAST(COUNT(*) AS BIGINT) AS n_shared
      |FROM hs x JOIN hs y ON x.hash = y.hash AND x.clip_id < y.clip_id
      |GROUP BY 1, 2 HAVING COUNT(*) >= 6
      |ORDER BY ia, ib""".stripMargin

  /** Per-clip audio QUALITY census — the audio sibling of t2's text
    * quality scoring, the gate before a clip enters a training corpus:
    * length, peak level, clipping count (|s| ≥ 32000 on the int16
    * grid), signal energy, and zero-crossing count, reduced to an
    * integer keep/drop flag (clipping ratio ≤ 2 % in basis points).
    * Everything is integer PCM arithmetic over the REAL WAV decode
    * (codegen'd array HOFs, zero shuffles before the final sort), and
    * the oracle recomputes every statistic from the closed-form LCG
    * sample values — including the LAG-based crossing count, the easy
    * one to get off by one. At 100 TB this is a per-row projection:
    * the census never shuffles audio bytes.
    */
  def a8AudioQuality(s: SparkSession, dir: String): DataFrame = {
    import graft.functions.AudioFunctions.{decodeWav, pcm16, syntheticLcgWav}
    val k = col("k")
    val zc = aggregate(
      zip_with(slice(k, 1, 255), slice(k, 2, 255),
        (a, b) => when(a * b < 0, 1L).otherwise(0L)),
      lit(0L), (a, x) => a + x)
    Tables.events(s, dir).filter(col("event_id") < 64)
      .select(col("event_id"),
        decodeWav(syntheticLcgWav(col("event_id"),
          (lit(64) + col("event_id") % 64).cast("int"))).as("y"))
      .select(col("event_id"), pcm16(col("y")).as("k"))
      .select(col("event_id"),
        size(k).cast("long").as("n_samples"),
        array_max(transform(k, x => abs(x))).as("peak"),
        aggregate(k, lit(0L),
          (a, x) => a + when(abs(x) >= 32000L, 1L).otherwise(0L))
          .as("n_clipped"),
        aggregate(k, lit(0L), (a, x) => a + x * x).as("energy"),
        zc.as("zero_crossings"))
      .withColumn("keep",
        expr("(n_clipped * 10000) DIV n_samples") <= 200L)
      .orderBy(col("event_id"))
  }

  val a8Oracle: String =
    """WITH ks AS (SELECT event_id, j,
      |    CASE WHEN j < 64 + event_id % 64 THEN 0
      |      ELSE (event_id * 131 + j * 7919) % 65535 - 32767 END AS k
      |  FROM events, range(0, 256) r(j) WHERE event_id < 64),
      |lagged AS (SELECT event_id, j, k,
      |    LAG(k) OVER (PARTITION BY event_id ORDER BY j) AS pk FROM ks)
      |SELECT event_id, COUNT(*) AS n_samples,
      |  CAST(MAX(ABS(k)) AS BIGINT) AS peak,
      |  CAST(SUM(CASE WHEN ABS(k) >= 32000 THEN 1 ELSE 0 END) AS BIGINT)
      |    AS n_clipped,
      |  CAST(SUM(k * k) AS BIGINT) AS energy,
      |  CAST(SUM(CASE WHEN pk IS NOT NULL AND pk * k < 0 THEN 1 ELSE 0
      |    END) AS BIGINT) AS zero_crossings,
      |  (SUM(CASE WHEN ABS(k) >= 32000 THEN 1 ELSE 0 END) * 10000)
      |    // COUNT(*) <= 200 AS keep
      |FROM lagged GROUP BY event_id ORDER BY event_id""".stripMargin

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "a1_stft_peak" -> (a1StftPeak _),
    "a2_mel_mfcc" -> (a2MelMfcc _),
    "a3_softmask_nn" -> (a3SoftmaskNn _),
    "a4_spec_plot" -> (a4SpecPlot _),
    "a5_resample" -> (a5Resample _),
    "a6_silence_trim" -> (a6SilenceTrim _),
    "a7_fingerprint" -> (a7Fingerprint _),
    "a8_audio_quality" -> (a8AudioQuality _))

  val oracle: Map[String, String] = Map(
    "a1_stft_peak" -> a1Oracle,
    "a2_mel_mfcc" -> a2Oracle,
    "a3_softmask_nn" -> a3Oracle,
    "a4_spec_plot" -> a4Oracle,
    "a5_resample" -> a5Oracle,
    "a6_silence_trim" -> a6Oracle,
    "a7_fingerprint" -> a7Oracle,
    "a8_audio_quality" -> a8Oracle)
}
