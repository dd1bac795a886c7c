package graft

import java.nio.file.{Files, Paths}
import javax.imageio.ImageIO

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.config.KlioIoConfig
import graft.functions.AudioFunctions._
import graft.functions.Dsp
import graft.multimodal.{Multimodal, Plots}

/** The reference's flagship audio-spectrograms integration DAG end to end
  * (`integration/audio-spectrograms/run.py:46-121`): load binary audio →
  * STFT magnitude → nn-filter → masks → three spectrogram plots per
  * element (-full / -background / -foreground) uploaded to the data
  * output, with the flattened, deduplicated path list as the job result.
  * Here each stage is the corresponding column operator over one
  * DataFrame — no CoGroupByKey needed because the matrices never leave
  * their row.
  */
class AudioSpectrogramsE2ESpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark

  test("audio files flow to uploaded spectrogram plots end to end") {
    val base = Files.createTempDirectory("graft-audiospec").toString
    Files.createDirectories(Paths.get(s"$base/audio_in"))
    // two tones on exact FFT bins (nFft=1024), 4096 samples each
    Seq(("track_a", 25), ("track_b", 100)).foreach { case (name, bin) =>
      val y = Array.tabulate(4096)(i =>
        math.sin(2.0 * math.Pi * bin * i / 1024))
      Files.write(Paths.get(s"$base/audio_in/$name.wav"),
        Dsp.encodeWavPcm16(y, 8000))
    }

    // GcsLoadBinary + LoadAudio
    val files = Multimodal.readMediaDir(spark, s"$base/audio_in", ".wav",
      "audio")
    val loaded = Multimodal.decodeAudio(files)
    // GetSTFT magnitude → nn filter → net (full − filter), all row-local
    val sub = zip_with(col("full"), col("nn"),
      (f, g) => zip_with(f, g, (a, b) => a - b))
    val staged = loaded
      .withColumn("full", stftMag(col("samples"), lit(1024), lit(256)))
      .withColumn("nn", nnFilter(col("full"), lit(3)))
      .withColumn("net", sub)
    // SpecToPlot ×3 → GcsUploadPlot with the reference's name suffixes
    val outDir = s"$base/plots"
    val outputs = Seq(KlioIoConfig(ioType = "file", location = outDir,
      fileSuffix = ".png"))
    val written = Seq("full", "nn" -> "background", "net" -> "foreground")
      .map {
        case (src: String, suffix: String) =>
          Plots.uploadPlots(staged.withColumn("png",
            Plots.renderHeatmapPng(col(src))), outputs, suffix = s"-$suffix")
        case src: String =>
          Plots.uploadPlots(staged.withColumn("png",
            Plots.renderHeatmapPng(col(src))), outputs, suffix = s"-$src")
      }
      // Flatten + Distinct over the yielded paths (run.py:117-121)
      .reduce(_ unionByName _).select(col("path")).distinct()
      .collect().map(_.getString(0)).sorted

    assert(written.length === 6, "2 elements × 3 plots, deduplicated")
    val listed = new java.io.File(outDir).listFiles().map(_.getName)
      .filterNot(_.startsWith(".")).sorted
    assert(listed.toSeq === Seq(
      "track_a-background.png", "track_a-foreground.png",
      "track_a-full.png",
      "track_b-background.png", "track_b-foreground.png",
      "track_b-full.png"))
    // every plot decodes with spectrogram geometry: 17 frames × 513 bins
    listed.foreach { f =>
      val img = ImageIO.read(new java.io.File(outDir, f))
      assert(img.getWidth === 17 && img.getHeight === 513, f)
    }
  }
}
