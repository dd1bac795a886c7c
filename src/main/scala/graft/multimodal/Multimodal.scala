package graft.multimodal

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._

import graft.functions.Dsp

/** Multimodal columns: image/audio/video as opaque `binary` columns with
  * typed metadata, processed by batched per-partition transforms.
  *
  * The reference moves binary payloads through GCS + pickled DoFns
  * (`audio/src/klio_audio/io.py`, `decorators.py:53-142`); Spark-native,
  * the binary ride IS a column — `spark.read.format("binaryFile")` gives
  * (path, modificationTime, length, content), and everything downstream is
  * ordinary column logic with full pruning/pushdown.
  *
  * Decode reality in this container: WAV decode is real ([[Dsp]]), and
  * image decode/resize is REAL for JDK-native formats (PNG/JPEG/BMP/GIF
  * via `javax.imageio` — [[decodeImage]], [[resizeImage]]). Only formats
  * outside the JDK codec set (webp/heic/video containers) fall back to
  * the clearly-marked deterministic fakes [[decodeImageStub]] /
  * [[sampleFramesStub]] — the Spark plumbing around them (schema,
  * batching, partitioning) is identical, so swapping a stub body for an
  * actual codec (JNI/javacv, or a Python `mapInPandas` stage) changes no
  * schema or plan shape.
  */
object Multimodal {

  /** Typed per-file frame: identity + media kind + raw bytes + metadata. */
  case class MediaFile(element: String, mediaType: String,
      content: Array[Byte], length: Long, meta: Map[String, String])

  /** Decoded-image feature frame (stub decode): fixed shape + a small
    * deterministic feature vector derived from the bytes.
    */
  case class ImageFeatures(element: String, height: Int, width: Int,
      channels: Int, features: Seq[Float])

  /** Read a directory of media files as binary columns; element = basename
    * without suffix (klio's path convention, `_helpers.py:160-163`).
    * Partition count follows file splits — at 100 TB this parallelizes by
    * file with no driver bottleneck.
    */
  def readMediaDir(spark: SparkSession, dir: String, suffix: String,
      mediaType: String): Dataset[MediaFile] = {
    import spark.implicits._
    spark.read.format("binaryFile")
      .option("pathGlobFilter", s"*$suffix")
      .load(dir)
      .select(
        regexp_replace(element_at(split(col("path"), "/"), -1),
          java.util.regex.Pattern.quote(suffix) + "$", "").as("element"),
        lit(mediaType).as("mediaType"),
        col("content"),
        col("length"),
        map(lit("modified"), col("modificationTime").cast("string"))
          .as("meta"))
      .as[MediaFile]
  }

  /** Real audio decode: WAV bytes → waveform column (array<float>) + sample
    * rate, ready for the [[graft.functions.AudioFunctions]] chain.
    */
  def decodeAudio(files: Dataset[MediaFile]): DataFrame = {
    val dec = udf((bytes: Array[Byte]) => {
      val (samples, sr) = Dsp.decodeWavPcm16(bytes)
      (samples.map(_.toFloat).toSeq, sr)
    })
    files.toDF()
      .withColumn("decoded", dec(col("content")))
      .select(col("element"), col("decoded._1").as("samples"),
        col("decoded._2").as("sample_rate"))
  }

  /** 4×4 grid of mean luminance over a decoded frame: integer-summed
    * (ITU-R 601 weights ×1000 — no float accumulation order), one float
    * division per block. Shared by the still-image ([[decodeImage]]) and
    * video-frame ([[sampleVideoFrames]]) paths so per-frame features are
    * comparable across modalities.
    */
  private def blockFeatures(img: java.awt.image.BufferedImage)
      : Array[Float] = {
    val h = img.getHeight
    val w = img.getWidth
    val feats = new Array[Float](16)
    var by = 0
    while (by < 4) {
      var bx = 0
      while (bx < 4) {
        val yLo = by * h / 4
        val yHi = math.max(yLo + 1, (by + 1) * h / 4)
        val xLo = bx * w / 4
        val xHi = math.max(xLo + 1, (bx + 1) * w / 4)
        var sum = 0L
        var n = 0L
        var y = yLo
        while (y < yHi && y < h) {
          var x = xLo
          while (x < xHi && x < w) {
            val rgb = img.getRGB(x, y)
            // integer ITU-R 601 luma ×1000 — exact, no float order
            sum += ((rgb >> 16) & 0xff) * 299L +
              ((rgb >> 8) & 0xff) * 587L + (rgb & 0xff) * 114L
            n += 1
            x += 1
          }
          y += 1
        }
        feats(by * 4 + bx) = (sum.toDouble / (n * 255000.0)).toFloat
        bx += 1
      }
      by += 1
    }
    feats
  }

  /** REAL image decode for JDK-native formats (PNG / JPEG / BMP / GIF /
    * WBMP via `javax.imageio` — no external codec): dimensions, channel
    * count, and a 16-feature descriptor (4×4 grid of mean luminance,
    * integer-summed then one float division per block — deterministic
    * across JVMs). Batched per partition like a real codec stage; blobs
    * ImageIO cannot parse are skipped (route them to [[decodeImageStub]]
    * or a drop channel upstream).
    */
  def decodeImage(files: Dataset[MediaFile]): Dataset[ImageFeatures] = {
    import files.sparkSession.implicits._
    files.mapPartitions { it =>
      it.flatMap { f =>
        val img = try javax.imageio.ImageIO.read(
          new java.io.ByteArrayInputStream(f.content))
        catch { case scala.util.control.NonFatal(_) => null }
        if (img == null) None
        else Some(ImageFeatures(f.element, img.getHeight, img.getWidth,
          img.getColorModel.getNumComponents, blockFeatures(img).toSeq))
      }
    }
  }

  /** One sampled video frame: identity + position (index among the
    * container's frames, count of frames the container holds) + the same
    * 16-block luminance descriptor still images get — so a video corpus
    * and an image corpus share feature space (cross-modal dedup, quality
    * filters, pHash all compose).
    */
  case class FrameFeatures(element: String, frameIdx: Int, nFrames: Int,
      height: Int, width: Int, features: Seq[Float])

  /** REAL video frame sampling for multi-frame JDK-native containers
    * (animated GIF via `javax.imageio.ImageReader` — each stored frame
    * decodes independently, no external codec): every `stride`-th frame
    * of each container becomes one row with the shared 16-block
    * luminance descriptor. This is the production shape of a
    * frame-sampling stage — one sequential pass per blob, rows emitted
    * per kept frame, bytes never shuffled, parallelism = file splits —
    * so swapping the GIF reader for an mp4 demuxer (JNI/javacv or a
    * `mapInPandas` stage) changes no schema or plan. Containers the JDK
    * cannot parse fall back to [[sampleFramesStub]].
    */
  def sampleVideoFrames(files: Dataset[MediaFile], stride: Int)
      : Dataset[FrameFeatures] = {
    require(stride >= 1, s"stride must be >= 1, got $stride")
    import files.sparkSession.implicits._
    files.mapPartitions { it =>
      it.flatMap { f =>
        val iis = javax.imageio.ImageIO.createImageInputStream(
          new java.io.ByteArrayInputStream(f.content))
        val readers = javax.imageio.ImageIO.getImageReaders(iis)
        if (!readers.hasNext) { iis.close(); Iterator.empty }
        else {
          val reader = readers.next()
          reader.setInput(iis)
          val n = try reader.getNumImages(true)
          catch { case scala.util.control.NonFatal(_) => 0 }
          val out = (0 until n by stride).flatMap { i =>
            val img = try reader.read(i)
            catch { case scala.util.control.NonFatal(_) => null }
            if (img == null) None
            else Some(FrameFeatures(f.element, i, n, img.getHeight,
              img.getWidth, blockFeatures(img).toSeq))
          }
          reader.dispose(); iis.close()
          out
        }
      }
    }
  }

  /** One sampled frame reduced to a position-weighted integer
    * fingerprint — the join key for video near-dup detection.
    */
  case class FrameHash(element: String, frameIdx: Int, nFrames: Int,
      fhash: Long)

  /** Frame fingerprints for video near-dup detection: every `stride`-th
    * frame reduces to Σ over pixels of (x·131 + y + 1) · (luma + 7) —
    * a position-weighted integer sum (luma = the exact ITU-R 601
    * ×1000 weights div 1000), chosen COMMUTATIVE so an oracle can
    * replay it as a plain SUM over the pixel formula with no
    * sequential fold. Identical frames (bit-exact decode) hash equal
    * wherever they sit in their containers, so a trimmed or
    * re-concatenated copy still shares its surviving frames' hashes —
    * the equi-join census downstream is shuffle ∝ frames, the a7
    * landmark-hash shape on the video side.
    */
  def sampleVideoFrameHashes(files: Dataset[MediaFile], stride: Int)
      : Dataset[FrameHash] = {
    require(stride >= 1, s"stride must be >= 1, got $stride")
    import files.sparkSession.implicits._
    files.mapPartitions { it =>
      it.flatMap { f =>
        val iis = javax.imageio.ImageIO.createImageInputStream(
          new java.io.ByteArrayInputStream(f.content))
        val readers = javax.imageio.ImageIO.getImageReaders(iis)
        if (!readers.hasNext) { iis.close(); Iterator.empty }
        else {
          val reader = readers.next()
          reader.setInput(iis)
          val n = try reader.getNumImages(true)
          catch { case scala.util.control.NonFatal(_) => 0 }
          val out = (0 until n by stride).flatMap { i =>
            val img = try reader.read(i)
            catch { case scala.util.control.NonFatal(_) => null }
            if (img == null) None
            else {
              var h = 0L
              var y = 0
              while (y < img.getHeight) {
                var x = 0
                while (x < img.getWidth) {
                  val rgb = img.getRGB(x, y)
                  val luma = (((rgb >> 16) & 0xff) * 299L +
                    ((rgb >> 8) & 0xff) * 587L + (rgb & 0xff) * 114L) / 1000L
                  h += (x * 131L + y + 1L) * (luma + 7L)
                  x += 1
                }
                y += 1
              }
              Some(FrameHash(f.element, i, n, h))
            }
          }
          reader.dispose(); iis.close()
          out
        }
      }
    }
  }

  /** Header-only media probe: container type and pixel dimensions
    * parsed from the first bytes of the blob — PNG's IHDR (big-endian
    * w/h at offset 16), GIF's logical screen descriptor (little-endian
    * at offset 6), and JPEG's SOF frame header (marker walk from SOI to
    * SOF0/SOF2, big-endian height then width — a pure byte-walk over
    * the metadata segments, still no entropy-coded data touched) —
    * WITHOUT decoding a pixel. At 100 TB this is the difference between
    * a metadata census that reads ~32 B/blob (with parquet lazily
    * materializing only what the expression touches; JPEG reads to its
    * first SOF, a few hundred bytes of APP/DQT segments) and one that
    * runs the full codec over every image; unknown magics and truncated
    * or malformed marker streams surface as ("unknown", -1, -1) rather
    * than an error, the audit-not-crash contract a corpus census needs.
    */
  val probeHeader: org.apache.spark.sql.expressions.UserDefinedFunction =
    org.apache.spark.sql.functions.udf((bytes: Array[Byte]) => {
      def u8(i: Int): Int = bytes(i) & 0xff
      // SOF markers are C0–CF minus DHT(C4), JPG(C8), DAC(CC)
      def isSof(m: Int): Boolean =
        (m >= 0xc0 && m <= 0xcf) && m != 0xc4 && m != 0xc8 && m != 0xcc
      def jpegSof(): (String, Int, Int) = {
        var i = 2
        while (i + 3 < bytes.length) {
          if (u8(i) != 0xff) return ("unknown", -1, -1)
          var j = i + 1
          while (j < bytes.length && u8(j) == 0xff) j += 1 // fill bytes
          if (j >= bytes.length) return ("unknown", -1, -1)
          val m = u8(j)
          if (isSof(m)) {
            if (j + 8 >= bytes.length) return ("unknown", -1, -1)
            val h = (u8(j + 4) << 8) | u8(j + 5)
            val w = (u8(j + 6) << 8) | u8(j + 7)
            return ("jpeg", w, h)
          } else if (m == 0xd9 || m == 0xda) {
            // EOI / start-of-scan before any SOF: malformed for a probe
            return ("unknown", -1, -1)
          } else if (m == 0x01 || (m >= 0xd0 && m <= 0xd7)) {
            i = j + 1 // standalone marker, no payload
          } else {
            if (j + 2 >= bytes.length) return ("unknown", -1, -1)
            val len = (u8(j + 1) << 8) | u8(j + 2)
            if (len < 2) return ("unknown", -1, -1)
            i = j + 1 + len
          }
        }
        ("unknown", -1, -1)
      }
      if (bytes == null || bytes.length < 10) ("unknown", -1, -1)
      else if (bytes.length >= 24 &&
          u8(0) == 0x89 && u8(1) == 'P' && u8(2) == 'N' && u8(3) == 'G') {
        val w = (u8(16) << 24) | (u8(17) << 16) | (u8(18) << 8) | u8(19)
        val h = (u8(20) << 24) | (u8(21) << 16) | (u8(22) << 8) | u8(23)
        ("png", w, h)
      } else if (u8(0) == 'G' && u8(1) == 'I' && u8(2) == 'F' &&
          u8(3) == '8') {
        val w = u8(6) | (u8(7) << 8)
        val h = u8(8) | (u8(9) << 8)
        ("gif", w, h)
      } else if (u8(0) == 0xff && u8(1) == 0xd8) {
        jpegSof()
      } else ("unknown", -1, -1)
    })

  /** Encode frames as an animated GIF (the JDK-native multi-frame
    * container [[sampleVideoFrames]] reads back) — the test-data writer
    * for the video path; grayscale frames round-trip bit-exactly through
    * the 256-entry palette.
    */
  def encodeGifAnimation(frames: Seq[java.awt.image.BufferedImage])
      : Array[Byte] = {
    val baos = new java.io.ByteArrayOutputStream()
    val writer = javax.imageio.ImageIO
      .getImageWritersByFormatName("gif").next()
    val ios = javax.imageio.ImageIO.createImageOutputStream(baos)
    writer.setOutput(ios)
    writer.prepareWriteSequence(null)
    frames.foreach { img =>
      writer.writeToSequence(
        new javax.imageio.IIOImage(img, null, null),
        writer.getDefaultWriteParam)
    }
    writer.endWriteSequence()
    writer.dispose(); ios.close()
    baos.toByteArray
  }

  /** REAL nearest-neighbor image resize: decode (JDK formats), NN-sample
    * to `outH`×`outW` (source pixel = (y·h/outH, x·w/outW) — pure integer
    * arithmetic, bit-deterministic unlike Graphics2D interpolation),
    * re-encode PNG. Output (element, png) feeds
    * [[graft.multimodal.Plots.uploadPlots]] or any binary sink.
    */
  def resizeImage(files: Dataset[MediaFile], outH: Int, outW: Int)
      : DataFrame = {
    import files.sparkSession.implicits._
    files.mapPartitions { it =>
      it.flatMap { f =>
        val img = try javax.imageio.ImageIO.read(
          new java.io.ByteArrayInputStream(f.content))
        catch { case scala.util.control.NonFatal(_) => null }
        if (img == null) None
        else {
          val out = new java.awt.image.BufferedImage(outW, outH,
            java.awt.image.BufferedImage.TYPE_INT_RGB)
          var y = 0
          while (y < outH) {
            var x = 0
            while (x < outW) {
              out.setRGB(x, y,
                img.getRGB(x * img.getWidth / outW, y * img.getHeight / outH))
              x += 1
            }
            y += 1
          }
          val baos = new java.io.ByteArrayOutputStream()
          javax.imageio.ImageIO.write(out, "png", baos)
          Some((f.element, baos.toByteArray))
        }
      }
    }.toDF("element", "png")
  }

  /** STUB image decode — deterministic fake for formats outside the JDK's
    * codec set (webp, heic, raw video frames): pretends every blob is an
    * 8x8x3 image and derives 16 features from a rolling hash of the bytes.
    * Batched per partition (the Scala-native shape of `mapInPandas`): one
    * buffer reuse per batch, no per-row setup cost — exactly where a real
    * codec call would go. JDK-native formats use the REAL [[decodeImage]].
    */
  def decodeImageStub(files: Dataset[MediaFile]): Dataset[ImageFeatures] = {
    import files.sparkSession.implicits._
    files.mapPartitions { it =>
      // per-partition (per-batch) setup happens once — codec init in real life
      it.map { f =>
        var h = 1125899906842597L
        f.content.foreach(b => h = h * 31 + (b & 0xff))
        val feats = Array.tabulate(16) { i =>
          val v = (h ^ (h >>> (i + 1))) * 0x9e3779b97f4a7c15L
          ((v >>> 40).toInt / 16777216.0f) - 0.5f
        }
        ImageFeatures(f.element, 8, 8, 3, feats.toSeq)
      }
    }
  }

  /** STUB video frame sampling — takes every `stride`-th 1 KiB chunk of the
    * blob as a "frame" (real impl: container demux + keyframe decode). The
    * output shape (element, frame_idx, frame_bytes) is what a real sampler
    * produces, so downstream per-frame feature pipelines are already
    * correctly shaped.
    */
  def sampleFramesStub(files: Dataset[MediaFile], stride: Int)
      : DataFrame = {
    import files.sparkSession.implicits._
    files.flatMap { f =>
      f.content.grouped(1024).zipWithIndex
        .filter(_._2 % stride == 0)
        .map { case (chunk, idx) => (f.element, idx, chunk) }
    }.toDF("element", "frame_idx", "frame_bytes")
  }

  /** Resize metadata op (real): image resize on the stub schema is a
    * feature-space projection; here it demonstrates typed metadata flowing
    * with the binary column.
    */
  def withDims(df: DataFrame, height: Int, width: Int): DataFrame =
    df.withColumn("height", lit(height)).withColumn("width", lit(width))
}
