package graft

import java.nio.file.{Files, Paths}

import org.scalatest.funsuite.AnyFunSuite

import graft.functions.Dsp
import graft.multimodal.Multimodal

class MultimodalSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark

  test("binary media dir reads with element identity and real WAV decode") {
    val base = Files.createTempDirectory("graft-media").toString
    Files.createDirectories(Paths.get(s"$base/audio"))
    val tone = Array.tabulate(1600)(i =>
      math.sin(2.0 * math.Pi * 440 * i / 8000))
    Files.write(Paths.get(s"$base/audio/clip_one.wav"),
      Dsp.encodeWavPcm16(tone, 8000))
    Files.write(Paths.get(s"$base/audio/clip_two.wav"),
      Dsp.encodeWavPcm16(tone.map(-_), 8000))
    Files.writeString(Paths.get(s"$base/audio/skip.txt"), "not audio")

    val files = Multimodal.readMediaDir(spark, s"$base/audio", ".wav", "audio")
    val got = files.collect().map(_.element).sorted
    assert(got === Array("clip_one", "clip_two"))

    val decoded = Multimodal.decodeAudio(files)
    val row = decoded.filter("element = 'clip_one'").collect().head
    assert(row.getAs[Int]("sample_rate") === 8000)
    assert(row.getAs[Seq[Float]]("samples").length === 1600)
  }

  test("real image decode reads PNG dims, channels, and block luminance") {
    import java.awt.image.BufferedImage
    val base = Files.createTempDirectory("graft-realimg").toString
    Files.createDirectories(Paths.get(s"$base/img"))
    // 8×4: left half pure white, right half pure black
    val img = new BufferedImage(8, 4, BufferedImage.TYPE_INT_RGB)
    for (y <- 0 until 4; x <- 0 until 8)
      img.setRGB(x, y, if (x < 4) 0xffffff else 0x000000)
    javax.imageio.ImageIO.write(img, "png",
      new java.io.File(s"$base/img/half.png"))

    val files = Multimodal.readMediaDir(spark, s"$base/img", ".png", "image")
    val f = Multimodal.decodeImage(files).collect().head
    assert(f.element === "half")
    assert(f.width === 8 && f.height === 4 && f.channels === 3)
    assert(f.features.length === 16)
    // left-column blocks are full luminance, right-column blocks zero
    assert(f.features(0) === 1.0f && f.features(1) === 1.0f)
    assert(f.features(2) === 0.0f && f.features(3) === 0.0f)
  }

  test("real NN resize downsamples with exact integer sampling") {
    import java.awt.image.BufferedImage
    val base = Files.createTempDirectory("graft-resize").toString
    Files.createDirectories(Paths.get(s"$base/img"))
    // 4×4 checker of 2×2 colored quadrants
    val img = new BufferedImage(4, 4, BufferedImage.TYPE_INT_RGB)
    for (y <- 0 until 4; x <- 0 until 4)
      img.setRGB(x, y, (x / 2, y / 2) match {
        case (0, 0) => 0xff0000
        case (1, 0) => 0x00ff00
        case (0, 1) => 0x0000ff
        case _ => 0xffffff
      })
    javax.imageio.ImageIO.write(img, "png",
      new java.io.File(s"$base/img/quad.png"))

    val files = Multimodal.readMediaDir(spark, s"$base/img", ".png", "image")
    val row = Multimodal.resizeImage(files, 2, 2).collect().head
    assert(row.getString(0) === "quad")
    val out = javax.imageio.ImageIO.read(
      new java.io.ByteArrayInputStream(row.getAs[Array[Byte]](1)))
    assert(out.getWidth === 2 && out.getHeight === 2)
    // NN source pixel for (x,y) is (x*4/2, y*4/2) = top-left of each quadrant
    assert((out.getRGB(0, 0) & 0xffffff) === 0xff0000)
    assert((out.getRGB(1, 0) & 0xffffff) === 0x00ff00)
    assert((out.getRGB(0, 1) & 0xffffff) === 0x0000ff)
    assert((out.getRGB(1, 1) & 0xffffff) === 0xffffff)
  }

  test("image stub decode has stable schema and deterministic features") {
    val base = Files.createTempDirectory("graft-img").toString
    Files.createDirectories(Paths.get(s"$base/img"))
    Files.write(Paths.get(s"$base/img/a.png"), Array[Byte](1, 2, 3, 4))
    Files.write(Paths.get(s"$base/img/b.png"), Array[Byte](9, 9, 9))

    val files = Multimodal.readMediaDir(spark, s"$base/img", ".png", "image")
    val feats = Multimodal.decodeImageStub(files).collect()
      .sortBy(_.element)
    assert(feats.map(_.element).toSeq === Seq("a", "b"))
    assert(feats.forall(f => f.height == 8 && f.width == 8 && f.channels == 3))
    assert(feats.forall(_.features.length == 16))
    // deterministic: same bytes → same features
    val again = Multimodal.decodeImageStub(files).collect().sortBy(_.element)
    assert(again.map(_.features).toSeq === feats.map(_.features).toSeq)
    // different bytes → different features
    assert(feats(0).features !== feats(1).features)
  }

  test("video frame-sampling stub emits strided frame rows") {
    val base = Files.createTempDirectory("graft-vid").toString
    Files.createDirectories(Paths.get(s"$base/vid"))
    Files.write(Paths.get(s"$base/vid/v.mp4"), Array.fill[Byte](5000)(7))

    val files = Multimodal.readMediaDir(spark, s"$base/vid", ".mp4", "video")
    val frames = Multimodal.sampleFramesStub(files, stride = 2).collect()
    // 5000 bytes → 5 chunks of 1024 → indices 0,2,4 kept
    assert(frames.map(_.getInt(1)).sorted === Array(0, 2, 4))
    assert(frames.forall(_.getString(0) == "v"))
  }

  test("real video frame sampling decodes animated GIF frames bit-exactly") {
    import spark.implicits._
    // 7 frames of distinct uniform gray — stride 3 must keep 0, 3, 6,
    // and each kept frame's 16 block features must equal its gray level
    val gif = Multimodal.encodeGifAnimation((0 until 7).map { f =>
      val img = new java.awt.image.BufferedImage(16, 8,
        java.awt.image.BufferedImage.TYPE_INT_RGB)
      val g = 30 * f
      for (y <- 0 until 8; x <- 0 until 16)
        img.setRGB(x, y, (g << 16) | (g << 8) | g)
      img
    })
    val files = spark.createDataset(Seq(
      Multimodal.MediaFile("v0", "image/gif", gif, gif.length.toLong,
        Map.empty)))
    val frames = Multimodal.sampleVideoFrames(files, stride = 3)
      .collect().sortBy(_.frameIdx)
    assert(frames.map(_.frameIdx).toSeq === Seq(0, 3, 6))
    assert(frames.forall(f => f.nFrames == 7 && f.height == 8 &&
      f.width == 16 && f.features.length == 16))
    frames.foreach { f =>
      val expected = (30 * f.frameIdx * 1000L).toDouble / 255000.0
      assert(f.features.forall(_ == expected.toFloat),
        s"frame ${f.frameIdx}: ${f.features}")
    }
    // a blob no reader parses yields zero rows, not a crash
    val junk = spark.createDataset(Seq(Multimodal.MediaFile("x", "video",
      Array.fill[Byte](64)(3), 64L, Map.empty)))
    assert(Multimodal.sampleVideoFrames(junk, 1).count() === 0)
  }

  test("probeHeader walks JPEG markers to SOF — baseline, progressive, " +
      "and malformed streams") {
    import org.apache.spark.sql.functions.col
    def jpeg(w: Int, h: Int, progressive: Boolean): Array[Byte] = {
      val img = new java.awt.image.BufferedImage(w, h,
        java.awt.image.BufferedImage.TYPE_INT_RGB)
      val writer = javax.imageio.ImageIO
        .getImageWritersByFormatName("jpg").next()
      val p = writer.getDefaultWriteParam
      if (progressive) p.setProgressiveMode(
        javax.imageio.ImageWriteParam.MODE_DEFAULT)
      val baos = new java.io.ByteArrayOutputStream()
      val ios = javax.imageio.ImageIO.createImageOutputStream(baos)
      writer.setOutput(ios)
      writer.write(null, new javax.imageio.IIOImage(img, null, null), p)
      writer.dispose(); ios.close()
      baos.toByteArray
    }
    val baseline = jpeg(33, 21, progressive = false)
    val prog = jpeg(17, 45, progressive = true) // SOF2, not SOF0
    val truncated = baseline.take(6) // SOI + APP0 marker, cut mid-segment
    val noSof = Array[Byte](0xff.toByte, 0xd8.toByte, // SOI then EOI
      0xff.toByte, 0xd9.toByte) ++ Array.fill[Byte](12)(0)
    val df = spark.createDataFrame(Seq(
        ("base", baseline), ("prog", prog), ("trunc", truncated),
        ("nosof", noSof)))
      .toDF("tag", "content")
      .select(col("tag"), Multimodal.probeHeader(col("content")).as("p"))
      .select(col("tag"), col("p._1").as("kind"), col("p._2").as("w"),
        col("p._3").as("h"))
      .collect().map(r => r.getString(0) ->
        ((r.getString(1), r.getInt(2), r.getInt(3)))).toMap
    assert(df("base") === (("jpeg", 33, 21)))
    assert(df("prog") === (("jpeg", 17, 45)))
    assert(df("trunc") === (("unknown", -1, -1)))
    assert(df("nosof") === (("unknown", -1, -1)))
  }
}
