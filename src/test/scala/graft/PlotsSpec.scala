package graft

import java.nio.file.Files
import javax.imageio.ImageIO

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.config.KlioIoConfig
import graft.multimodal.Plots

/** Plot rendering + upload (SpecToPlot family + GcsUploadPlot parity):
  * PNG geometry and pixel semantics decoded back with ImageIO, and the
  * end-to-end upload listing keyed by element.
  */
class PlotsSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark

  private def renderOne(matrix: Seq[Seq[Float]]): Array[Byte] = {
    import spark.implicits._
    Seq(Tuple1(matrix)).toDF("m")
      .select(Plots.renderHeatmapPng(col("m")).as("png"))
      .collect().head.getAs[Array[Byte]](0)
  }

  test("heatmap PNG has frame-major geometry and min/max anchor colors") {
    // 2 frames × 3 bins; min at (frame 0, bin 0), max at (frame 1, bin 2)
    val png = renderOne(Seq(Seq(0f, 5f, 5f), Seq(5f, 5f, 10f)))
    val img = ImageIO.read(new java.io.ByteArrayInputStream(png))
    assert(img.getWidth == 2 && img.getHeight == 3)
    // bin 0 renders at the BOTTOM row (librosa specshow orientation)
    assert((img.getRGB(0, 2) & 0xffffff) == 0x440154, "min → dark anchor")
    assert((img.getRGB(1, 0) & 0xffffff) == 0xfde725, "max → bright anchor")
  }

  test("pngDims decodes the IHDR header without rasterizing") {
    val png = renderOne(Seq.fill(17)(Seq.fill(513)(1f)))
    import spark.implicits._
    val dims = Seq(Tuple1(png)).toDF("png")
      .select(Plots.pngWidth(col("png")).as("w"),
        Plots.pngHeight(col("png")).as("h"))
      .collect().head
    assert(dims.getInt(0) == 17 && dims.getInt(1) == 513)
  }

  test("waveform PNG renders the envelope on a white canvas") {
    import spark.implicits._
    val y = (0 until 1000).map(i => math.sin(i / 20.0).toFloat)
    val png = Seq(Tuple1(y)).toDF("y")
      .select(Plots.renderWaveformPng(col("y"), lit(120), lit(40)).as("png"))
      .collect().head.getAs[Array[Byte]](0)
    val img = ImageIO.read(new java.io.ByteArrayInputStream(png))
    assert(img.getWidth == 120 && img.getHeight == 40)
    val pixels = for (x <- 0 until 120; yy <- 0 until 40)
      yield img.getRGB(x, yy) & 0xffffff
    assert(pixels.contains(0x440154), "envelope ink present")
    assert(pixels.count(_ == 0xffffff) > pixels.length / 2, "white canvas")
  }

  test("mel-spec plot dB-scales the power matrix before rendering") {
    import spark.implicits._
    // two frames of mel POWER; after power_to_db(ref=max) the max cell
    // is 0 dB (bright anchor) and tiny cells clamp to -80 dB (dark)
    val mel = Seq(Seq(1e-9f, 1f), Seq(1e-9f, 1e-9f))
    val png = Seq(Tuple1(mel)).toDF("m")
      .select(Plots.melSpecToPlotPng(col("m")).as("png"))
      .collect().head.getAs[Array[Byte]](0)
    val img = ImageIO.read(new java.io.ByteArrayInputStream(png))
    assert(img.getWidth == 2 && img.getHeight == 2)
    // frame 0, mel band 1 (top-left pixel) holds the 0 dB max
    assert((img.getRGB(0, 0) & 0xffffff) == 0xfde725)
    assert((img.getRGB(1, 0) & 0xffffff) == 0x440154)
  }

  test("uploadPlots writes element-keyed files and yields their paths") {
    import spark.implicits._
    val outDir = Files.createTempDirectory("graft-plots").toString
    val df = Seq(("tone-a", Seq(Seq(0f, 1f), Seq(1f, 0f))),
        ("tone-b", Seq(Seq(1f, 0f), Seq(0f, 1f))))
      .toDF("element", "m")
      .withColumn("png", Plots.renderHeatmapPng(col("m")))
    val outputs = Seq(KlioIoConfig(ioType = "file", location = outDir,
      fileSuffix = "png"))
    val written = Plots.uploadPlots(df, outputs, prefix = "plot-")
      .collect().map(r => (r.getString(0), r.getString(1))).toMap
    assert(written.keySet == Set("tone-a", "tone-b"))
    // golden listing: exactly the element-keyed files, each a decodable
    // PNG (the local Hadoop FS adds hidden .crc sidecars — not payload)
    val listed = new java.io.File(outDir).listFiles().map(_.getName)
      .filterNot(_.startsWith(".")).sorted
    assert(listed.toSeq == Seq("plot-tone-a.png", "plot-tone-b.png"))
    listed.foreach { f =>
      val img = ImageIO.read(new java.io.File(outDir, f))
      assert(img.getWidth == 2 && img.getHeight == 2)
    }
  }

  test("degenerate inputs: empty matrix renders empty, non-PNG decodes null") {
    import spark.implicits._
    val empty = Seq(Tuple1(Seq.empty[Seq[Float]])).toDF("m")
      .select(Plots.renderHeatmapPng(col("m")).as("png"))
      .collect().head.getAs[Array[Byte]](0)
    assert(empty.isEmpty, "no frames → no PNG bytes, not a crash")
    val dims = Seq(Tuple1("not a png".getBytes)).toDF("png")
      .select(Plots.pngWidth(col("png")).as("w")).collect().head
    assert(dims.isNullAt(0), "non-PNG bytes → null dims, not garbage")
    // constant matrix: span guard keeps normalization finite → low anchor
    val const = renderOne(Seq(Seq(5f, 5f), Seq(5f, 5f)))
    val img = ImageIO.read(new java.io.ByteArrayInputStream(const))
    assert((img.getRGB(0, 0) & 0xffffff) == 0x440154)
  }

  test("uploadPlots fails fast on zero or multiple configured outputs") {
    import spark.implicits._
    val df = Seq(("e", Array.empty[Byte])).toDF("element", "png")
    val io = KlioIoConfig(ioType = "file", location = "/tmp/x",
      fileSuffix = ".png")
    assertThrows[IllegalArgumentException](
      Plots.uploadPlots(df, Seq.empty))
    assertThrows[IllegalArgumentException](
      Plots.uploadPlots(df, Seq(io, io)))
  }
}
