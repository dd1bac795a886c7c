package graft.multimodal

/** Perceptual image hash (pHash) — the image sibling of the text
  * near-dup signatures: 64-bit DCT sign structure, so visually
  * identical or mildly edited images land within a small hamming
  * distance while unrelated images sit ~32 bits apart. The multimodal
  * curation gap this closes: a 100 TB image corpus dedups by signature
  * equi-join / banding exactly like text simhash, never by comparing
  * pixels pairwise.
  *
  * The pipeline is INTEGER-EXACT end to end — the property that makes
  * the m5 oracle gate possible (DuckDB replays every step from the
  * planted pixel formula and must reproduce the hash bit-for-bit) and
  * that makes the hash reproducible across JVMs and engines:
  *
  *  1. luma(x,y) = 299·r + 587·g + 114·b — ITU-R 601 weights ×1000,
  *     integer (the [[Multimodal.decodeImage]] convention).
  *  2. Resize W×H → 32×32 by EXACT fractional-area sums: in units of
  *     1/(32·W), source pixel x overlaps target column i by
  *     ox = max(0, min((x+1)·32, (i+1)·W) − max(x·32, i·W)), an
  *     integer divisible by gcd(32, W) (any integer combination of 32
  *     and W is); dividing by the gcd keeps magnitudes small. No
  *     division by the area: a GLOBAL positive scale cancels in the
  *     median-threshold comparison below, so the resize needs no
  *     rounding decisions at all.
  *  3. 2D DCT-II restricted to the low-frequency 8×8 block, with the
  *     cosine basis quantized to a FIXED-POINT integer table
  *     T(u,x) = round(cos(π(2x+1)u/64)·1024) — row pass then column
  *     pass, all in Long. The 1024 scale keeps the worst-case
  *     magnitude (≤ 32²·lumaMax·resizeWeight·1024²) far from Long
  *     overflow for any image up to [[MaxDim]].
  *  4. med = the 32nd-smallest (1-based) of the 63 coefficients
  *     excluding DC; hash bit k (k = u·8+v) is 1 iff C(u,v) > med.
  *
  * Reference behavior modeled on the public pHash construction
  * (Zauner, "Implementation and Benchmarking of Perceptual Image Hash
  * Functions", 2010); the integer quantization is this engine's own
  * reproducibility choice.
  */
object PHash {

  /** Image dimension bound keeping every accumulator comfortably inside
    * Long: with gcd-reduced weights the resized value is
    * ≤ 255000·(W/gcd)·(H/gcd) ≤ 255000·W·H ≤ 255000·MaxDim², the row
    * pass multiplies by ≤ 32·1024 and the column pass again — 2.1e9 ·
    * 3.3e4 · 3.3e4 ≈ 2.3e18 at the bound (Long max 9.2e18). Production
    * images past the bound should be thumbnailed by the decode stage
    * first (standard for a curation pipeline — pHash only ever looks
    * at 32×32).
    */
  val MaxDim = 2048

  /** T(u,x) = round(cos(π(2x+1)u/64)·1024) for u < 8, x < 32 — the
    * fixed-point low-frequency DCT-II basis, row-major u then x.
    */
  val dctTable: Array[Long] = {
    val t = new Array[Long](8 * 32)
    var u = 0
    while (u < 8) {
      var x = 0
      while (x < 32) {
        t(u * 32 + x) =
          math.round(math.cos(math.Pi * (2 * x + 1) * u / 64) * 1024)
        x += 1
      }
      u += 1
    }
    t
  }

  /** The fractional-area resize weights for one axis of length `dim`:
    * weight(i)(x) = overlap of source pixel x with target cell i in
    * 1/(32·dim) units, divided by gcd(32, dim). Only the non-zero run
    * per target cell matters; returned dense for simplicity (32×dim).
    */
  private def axisWeights(dim: Int): Array[Long] = {
    val g = BigInt(32).gcd(BigInt(dim)).toLong
    val w = new Array[Long](32 * dim)
    var i = 0
    while (i < 32) {
      var x = 0
      while (x < dim) {
        val o = math.min((x + 1L) * 32, (i + 1L) * dim) -
          math.max(x * 32L, i.toLong * dim)
        if (o > 0) w(i * dim + x) = o / g
        x += 1
      }
      i += 1
    }
    w
  }

  /** pHash of a luma plane (row-major, values = 1000×ITU-R-601 luma).
    * Exposed for the oracle-gated query, which builds the plane from
    * the planted closed-form pixels, and for spec-level tests.
    */
  def ofLuma(luma: Array[Long], w: Int, h: Int): Long = {
    require(w > 0 && h > 0 && w <= MaxDim && h <= MaxDim,
      s"pHash supports 1..$MaxDim square-ish images, got ${w}x$h")
    val wx = axisWeights(w)
    val wy = axisWeights(h)
    // resize: columns first (length w → 32), then rows (h → 32)
    val cols = new Array[Long](32 * h) // [y][i]
    var y = 0
    while (y < h) {
      var i = 0
      while (i < 32) {
        var s = 0L
        var x = 0
        while (x < w) {
          val wt = wx(i * w + x)
          if (wt != 0) s += luma(y * w + x) * wt
          x += 1
        }
        cols(y * 32 + i) = s
        i += 1
      }
      y += 1
    }
    val p = new Array[Long](32 * 32) // [j][i]
    var j = 0
    while (j < 32) {
      var i = 0
      while (i < 32) {
        var s = 0L
        var yy = 0
        while (yy < h) {
          val wt = wy(j * h + yy)
          if (wt != 0) s += cols(yy * 32 + i) * wt
          yy += 1
        }
        p(j * 32 + i) = s
        i += 1
      }
      j += 1
    }
    ofResized(p)
  }

  /** The DCT + median-threshold tail over an already-resized 32×32
    * plane (row-major [y][x]); any global positive scaling of the
    * plane yields the same hash.
    */
  def ofResized(p: Array[Long]): Long = {
    // row pass: A(u, y) = Σ_x p(y·32+x)·T(u,x)
    val a = new Array[Long](8 * 32)
    var u = 0
    while (u < 8) {
      var y = 0
      while (y < 32) {
        var s = 0L
        var x = 0
        while (x < 32) {
          s += p(y * 32 + x) * dctTable(u * 32 + x)
          x += 1
        }
        a(u * 32 + y) = s
        y += 1
      }
      u += 1
    }
    // column pass: C(u, v) = Σ_y A(u, y)·T(v, y)
    val c = new Array[Long](64)
    u = 0
    while (u < 8) {
      var v = 0
      while (v < 8) {
        var s = 0L
        var y = 0
        while (y < 32) {
          s += a(u * 32 + y) * dctTable(v * 32 + y)
          y += 1
        }
        c(u * 8 + v) = s
        v += 1
      }
      u += 1
    }
    val ac = java.util.Arrays.copyOfRange(c, 1, 64)
    java.util.Arrays.sort(ac)
    val med = ac(31)
    var h = 0L
    var k = 0
    while (k < 64) {
      if (c(k) > med) h |= 1L << k
      k += 1
    }
    h
  }

  /** pHash of encoded image bytes via the JDK codec — decode, integer
    * luma, then [[ofLuma]]. Returns None for bytes ImageIO cannot
    * parse (route those to a drop channel upstream, the
    * [[Multimodal.decodeImage]] convention).
    */
  def ofBytes(bytes: Array[Byte]): Option[Long] = {
    val img = try javax.imageio.ImageIO.read(
      new java.io.ByteArrayInputStream(bytes))
    catch { case scala.util.control.NonFatal(_) => null }
    if (img == null) None
    else {
      val w = img.getWidth
      val h = img.getHeight
      val luma = new Array[Long](w * h)
      var y = 0
      while (y < h) {
        var x = 0
        while (x < w) {
          val rgb = img.getRGB(x, y)
          luma(y * w + x) = ((rgb >> 16) & 0xff) * 299L +
            ((rgb >> 8) & 0xff) * 587L + (rgb & 0xff) * 114L
          x += 1
        }
        y += 1
      }
      Some(ofLuma(luma, w, h))
    }
  }

  /** The DCT table as a DuckDB VALUES literal `(u, x, t)` — embedded in
    * the m5 oracle so both engines use the IDENTICAL integer basis (a
    * libm-vs-JVM cosine ULP difference can never flip a table entry).
    */
  def dctTableSql: String = {
    val rows = for (u <- 0 until 8; x <- 0 until 32)
      yield s"($u,$x,${dctTable(u * 32 + x)})"
    rows.mkString(",")
  }
}
