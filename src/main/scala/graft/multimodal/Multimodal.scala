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
  * Decode reality in this container: WAV decode is real ([[Dsp]]); image /
  * video codecs do not exist offline, so [[decodeImageStub]] /
  * [[sampleFramesStub]] are clearly-marked deterministic fakes — the Spark
  * plumbing around them (schema, batching, partitioning) is real and
  * tested, and swapping the stub body for an actual codec (JNI/javacv, or
  * a Python `mapInPandas` stage in a PySpark deployment) changes no schema
  * or plan shape.
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

  /** STUB image decode — deterministic fake: pretends every blob is an
    * 8x8x3 image and derives 16 features from a rolling hash of the bytes.
    * Batched per partition (the Scala-native shape of `mapInPandas`): one
    * buffer reuse per batch, no per-row setup cost — exactly where a real
    * codec call would go.
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
