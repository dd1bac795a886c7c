package graft

import org.scalatest.funsuite.AnyFunSuite

import graft.multimodal.PHash

/** Unit pins for the integer-exact pHash and the m5 route equivalence
  * the oracle gate can't see (the gate runs the broadcast scan; the
  * banded equi-join is the scale path).
  */
class PHashSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark

  private def png(w: Int, h: Int)(g: (Int, Int) => Int): Array[Byte] = {
    val img = new java.awt.image.BufferedImage(w, h,
      java.awt.image.BufferedImage.TYPE_INT_RGB)
    for (y <- 0 until h; x <- 0 until w) {
      val v = g(x, y) & 0xff
      img.setRGB(x, y, (v << 16) | (v << 8) | v)
    }
    val baos = new java.io.ByteArrayOutputStream()
    javax.imageio.ImageIO.write(img, "png", baos)
    baos.toByteArray
  }

  private def hd(a: Long, b: Long) = java.lang.Long.bitCount(a ^ b)

  private def pattern(id: Long)(x: Int, y: Int): Int =
    ((id * 31 + x * (7 + id % 11) + y * (13 + id % 17) +
      (x.toLong * y * (1 + id % 3)) % 29) % 256).toInt

  test("identical bytes hash identically; the codec round trip is " +
      "deterministic") {
    val b = png(64, 64)(pattern(7))
    assert(PHash.ofBytes(b) == PHash.ofBytes(png(64, 64)(pattern(7))))
  }

  test("a REAL downscale of the same image (AWT area-ish rescale) " +
      "stays within a small hamming distance; different images are far") {
    val base = png(96, 96)(pattern(11))
    val img = javax.imageio.ImageIO.read(
      new java.io.ByteArrayInputStream(base))
    val scaled = new java.awt.image.BufferedImage(64, 64,
      java.awt.image.BufferedImage.TYPE_INT_RGB)
    val gfx = scaled.createGraphics()
    gfx.setRenderingHint(
      java.awt.RenderingHints.KEY_INTERPOLATION,
      java.awt.RenderingHints.VALUE_INTERPOLATION_BILINEAR)
    gfx.drawImage(img, 0, 0, 64, 64, null)
    gfx.dispose()
    val baos = new java.io.ByteArrayOutputStream()
    javax.imageio.ImageIO.write(scaled, "png", baos)
    val hBase = PHash.ofBytes(base).get
    val hScaled = PHash.ofBytes(baos.toByteArray).get
    assert(hd(hBase, hScaled) <= 10,
      s"rescale moved ${hd(hBase, hScaled)} bits")
    val hOther = PHash.ofBytes(png(96, 96)(pattern(12))).get
    assert(hd(hBase, hOther) >= 14,
      s"unrelated image only ${hd(hBase, hOther)} bits away")
  }

  test("hash is invariant under a global positive scale of the luma " +
      "plane (the no-division resize rests on this)") {
    val luma = Array.tabulate(64 * 64) { k =>
      pattern(5)(k % 64, k / 64).toLong * 1000
    }
    val h1 = PHash.ofLuma(luma, 64, 64)
    val h2 = PHash.ofLuma(luma.map(_ * 7), 64, 64)
    assert(h1 == h2)
  }

  test("axis weights: non-square and non-divisor sizes resize exactly " +
      "(48->32 mixes weights 1 and 2; gcd reduction applied)") {
    // 48x20: x gcd 16 (weights 1..2), y gcd 4 (20->32 upscale-ish
    // fractional weights) — just proving no crash and determinism
    val luma = Array.tabulate(48 * 20)(k => (k % 251).toLong * 1000)
    assert(PHash.ofLuma(luma, 48, 20) == PHash.ofLuma(luma, 48, 20))
    val e = intercept[IllegalArgumentException] {
      PHash.ofLuma(new Array[Long](4), 4096, 1)
    }
    assert(e.getMessage.contains("pHash"))
  }

  test("m5 banded equi-join route (forced) returns exactly the " +
      "broadcast-scan result") {
    import graft.queries.OpsQueries
    val dir = "/root/testdata/sf0.001"
    val fast = OpsQueries.m5PhashNeardup(spark, dir).collect().toSeq
    val prev = spark.conf
      .getOption("spark.graft.dedup.maxBroadcastSigs")
    spark.conf.set("spark.graft.dedup.maxBroadcastSigs", "0")
    try {
      val banded = OpsQueries.m5PhashNeardup(spark, dir).collect().toSeq
      assert(banded == fast,
        s"routes disagree: banded=${banded.size} fast=${fast.size}")
      assert(fast.nonEmpty, "planted pairs must exist")
    } finally prev match {
      case Some(v) =>
        spark.conf.set("spark.graft.dedup.maxBroadcastSigs", v)
      case None =>
        spark.conf.unset("spark.graft.dedup.maxBroadcastSigs")
    }
  }
}
