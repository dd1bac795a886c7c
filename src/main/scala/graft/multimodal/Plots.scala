package graft.multimodal

import java.awt.image.BufferedImage
import java.io.ByteArrayOutputStream

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

import graft.config.KlioIoConfig

/** Plot rendering + upload (reference `audio/src/klio_audio/transforms/
  * audio.py:308-515` SpecToPlot / MelSpecToPlot / MFCCToPlot /
  * WaveformToPlot, and `transforms/io.py:115-222` GcsUploadPlot) — the
  * tail of the reference's flagship audio-spectrograms DAG
  * (`integration/audio-spectrograms/run.py:93-121`).
  *
  * The reference renders matplotlib figures per message and uploads the
  * savefig bytes; here each plot is a deterministic java2d PNG rendered
  * inside a UDF (rows stay distributed — no driver-side figure loop), and
  * the upload is a `mapPartitions` writer that opens one filesystem
  * handle per partition and emits the written path per element, exactly
  * the DoFn's yield. PNG bytes are an opaque `binary` column until the
  * sink, so the render composes with any transform chain.
  */
object Plots {

  /** Five-anchor viridis-like colormap (dark violet → teal → yellow),
    * linearly interpolated — deterministic across JVMs (pure int/double
    * arithmetic, no rendering engine state).
    */
  private val anchors: Array[(Int, Int, Int)] =
    Array((68, 1, 84), (59, 82, 139), (33, 145, 140), (94, 201, 98),
      (253, 231, 37))

  private def colorOf(t: Double): Int = {
    val x = math.max(0.0, math.min(1.0, t)) * (anchors.length - 1)
    val i = math.min(anchors.length - 2, x.toInt)
    val f = x - i
    val (r0, g0, b0) = anchors(i)
    val (r1, g1, b1) = anchors(i + 1)
    def lerp(a: Int, b: Int) = math.round(a + (b - a) * f).toInt
    (lerp(r0, r1) << 16) | (lerp(g0, g1) << 8) | lerp(b0, b1)
  }

  private def pngBytes(img: BufferedImage): Array[Byte] = {
    val baos = new ByteArrayOutputStream()
    javax.imageio.ImageIO.write(img, "png", baos)
    baos.toByteArray
  }

  /** Frame-major matrix (frames × bins) → PNG heatmap, one pixel per
    * cell: x = frame (time), y = bin with bin 0 at the BOTTOM row
    * (librosa.display.specshow's y_axis="linear" orientation,
    * audio.py:353-356). Values min-max normalized over the matrix then
    * mapped through the colormap; a constant matrix renders as the low
    * anchor.
    */
  val renderHeatmapPng: org.apache.spark.sql.expressions.UserDefinedFunction =
    udf((spec: Seq[Seq[Float]]) => {
      if (spec == null || spec.isEmpty || spec.head.isEmpty)
        Array.empty[Byte]
      else {
        val w = spec.length
        val h = spec.head.length
        var mn = Double.MaxValue
        var mx = Double.MinValue
        spec.foreach(_.foreach { v =>
          if (v < mn) mn = v
          if (v > mx) mx = v
        })
        val span = if (mx > mn) mx - mn else 1.0
        val img = new BufferedImage(w, h, BufferedImage.TYPE_INT_RGB)
        var x = 0
        while (x < w) {
          val frame = spec(x)
          var y = 0
          while (y < h) {
            img.setRGB(x, h - 1 - y, colorOf((frame(y) - mn) / span))
            y += 1
          }
          x += 1
        }
        pngBytes(img)
      }
    })

  /** Waveform → PNG line plot (WaveformToPlot, audio.py:476-515): fixed
    * `width`×`height` canvas, white background, per-column min/max sample
    * envelope drawn in the colormap's dark anchor — the standard
    * downsampled waveform rendering (a 100 TB corpus of hour-long signals
    * must never rasterize one pixel per sample).
    */
  val renderWaveformPng: org.apache.spark.sql.expressions.UserDefinedFunction =
    udf((y: Seq[Float], width: Int, height: Int) => {
      if (y == null || y.isEmpty) Array.empty[Byte]
      else {
        val img = new BufferedImage(width, height, BufferedImage.TYPE_INT_RGB)
        val bg = 0xffffff
        var px = 0
        while (px < width) {
          var py = 0
          while (py < height) { img.setRGB(px, py, bg); py += 1 }
          px += 1
        }
        val n = y.length
        var absMax = 1e-9
        y.foreach(v => absMax = math.max(absMax, math.abs(v.toDouble)))
        val fg = 0x440154 // dark anchor
        var xcol = 0
        while (xcol < width) {
          val lo = xcol.toLong * n / width
          val hi = math.max(lo + 1, (xcol + 1).toLong * n / width)
          var smn = Double.MaxValue
          var smx = Double.MinValue
          var i = lo
          while (i < hi && i < n) {
            val v = y(i.toInt).toDouble
            if (v < smn) smn = v
            if (v > smx) smx = v
            i += 1
          }
          def toRow(v: Double): Int = {
            val t = (v / absMax + 1.0) / 2.0 // [-max,max] → [0,1]
            math.max(0, math.min(height - 1,
              ((1.0 - t) * (height - 1)).toInt))
          }
          var r = toRow(smx)
          val rEnd = toRow(smn)
          while (r <= rEnd) { img.setRGB(xcol, r, fg); r += 1 }
          xcol += 1
        }
        pngBytes(img)
      }
    })

  /** PNG IHDR dimensions (width, height) decoded from the byte stream —
    * proves the render→encode roundtrip without re-rasterizing. Null or
    * non-PNG bytes → null.
    */
  val pngDims: org.apache.spark.sql.expressions.UserDefinedFunction =
    udf((png: Array[Byte]) => {
      val sig = Array[Byte](0x89.toByte, 'P', 'N', 'G')
      if (png == null || png.length < 24 ||
        !png.take(4).sameElements(sig)) null
      else {
        def be(o: Int) = ((png(o) & 0xff) << 24) | ((png(o + 1) & 0xff) << 16) |
          ((png(o + 2) & 0xff) << 8) | (png(o + 3) & 0xff)
        (be(16), be(20))
      }
    })

  def pngWidth(png: Column): Column = pngDims(png).getField("_1")
  def pngHeight(png: Column): Column = pngDims(png).getField("_2")

  /** MelSpecToPlot parity (audio.py:404-407): the reference runs
    * `power_to_db(payload, ref=max)` before specshow, so the mel POWER
    * matrix is dB-scaled first, then rendered.
    */
  def melSpecToPlotPng(mel: Column): Column =
    renderHeatmapPng(graft.functions.AudioFunctions.powerDb(mel))

  /** GcsUploadPlot parity (transforms/io.py:115-222): write each row's
    * plot bytes to the SINGLE configured data output as
    * `prefix + element + suffix + file_suffix`, returning (element, path)
    * per written plot — the DoFn's yielded output path. Fails fast on
    * zero or multiple configured outputs exactly like the reference
    * (io.py:184-204). Distributed: one filesystem handle per partition,
    * no driver-side loop; on a cluster the executor-side Hadoop
    * configuration resolves the scheme (gs://, s3a://, file://).
    */
  def uploadPlots(df: DataFrame, outputs: Seq[KlioIoConfig],
      prefix: String = "", suffix: String = "",
      elementCol: String = "element", plotCol: String = "png"): DataFrame = {
    require(outputs.nonEmpty,
      "GcsUploadPlot requires a data output to be configured in " +
        "job_config.data.outputs")
    require(outputs.size == 1,
      "GcsUploadPlot does not support multiple configured outputs in " +
        "job_config.data.outputs")
    val out = outputs.head
    val fileSuffix =
      if (out.fileSuffix.isEmpty || out.fileSuffix.startsWith("."))
        out.fileSuffix
      else "." + out.fileSuffix
    val location = out.location
    val spark = df.sparkSession
    import spark.implicits._
    // serializable snapshot of the Hadoop conf for executor-side writes
    val confSer = new org.apache.spark.util.SerializableConfiguration(
      spark.sparkContext.hadoopConfiguration)
    df.select(col(elementCol).cast("string"), col(plotCol))
      .as[(String, Array[Byte])]
      .mapPartitions { it =>
        val fs = new org.apache.hadoop.fs.Path(location)
          .getFileSystem(confSer.value)
        it.map { case (element, png) =>
          val path = new org.apache.hadoop.fs.Path(location,
            prefix + element + suffix + fileSuffix)
          val os = fs.create(path, true)
          try os.write(png) finally os.close()
          (element, path.toString)
        }
      }
      .toDF("element", "path")
  }
}
