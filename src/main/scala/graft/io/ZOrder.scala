package graft.io

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Z-order (Morton) clustering for multi-dimensional range queries over
  * immutable columnar storage — the layout that makes "user ∈ [a,b] AND
  * value ∈ [c,d]" prune files/partitions when a single-column sort can
  * only serve one of the two predicates.
  *
  * The curve interleaves the bits of two bucketized dimensions, so rows
  * close in (x, y) are close in z; writing partitioned/sorted by z gives
  * every physical unit (directory, file, row group) a tight bounding box
  * in BOTH dimensions. A 2-D box query then touches only the z-prefix
  * cells whose boxes intersect it — [[prefixesFor]] enumerates those on
  * the driver (the cell count is a small constant fixed by `prefixBits`,
  * never data-sized), and the resulting `isin` filter prunes at the
  * partition listing, before any file is opened.
  *
  * Everything is plain integer column arithmetic (shift/and/or via the
  * standard binary-magic-numbers spread), so the z computation stays
  * inside whole-stage codegen and costs a handful of ALU ops per row —
  * no UDF, no shuffle beyond the final `repartitionByRange` that
  * physically clusters the data.
  */
object ZOrder {
  /** Spread the low 8 bits of `c` so bit i lands at bit 2i (magic-number
    * bit spread, 3 shift-mask rounds). Input is masked to 8 bits first —
    * callers bucketize each dimension into 0..255.
    */
  def spread8(c: Column): Column = {
    val m = c.bitwiseAND(lit(0xFFL))
    val a = m.bitwiseOR(shiftleft(m, 4)).bitwiseAND(lit(0x0F0FL))
    val b = a.bitwiseOR(shiftleft(a, 2)).bitwiseAND(lit(0x3333L))
    b.bitwiseOR(shiftleft(b, 1)).bitwiseAND(lit(0x5555L))
  }

  /** 16-bit Morton code of two 8-bit buckets: x at even bits, y at odd. */
  def zvalue8(x: Column, y: Column): Column =
    spread8(x).bitwiseOR(shiftleft(spread8(y), 1))

  /** Bit i of an 8-bit value placed at bit `i * stride + offset` — the
    * general k-dimension spread (the magic-number form above is the
    * stride-2 special case). Eight shift/and/or terms per dimension,
    * still pure column arithmetic inside whole-stage codegen.
    */
  private def spreadBits(c: Column, stride: Int, offset: Int): Column = {
    val m = c.bitwiseAND(lit(0xFFL))
    (0 until 8).map(i =>
      shiftleft(shiftright(m, i).bitwiseAND(lit(1L)), i * stride + offset))
      .reduce(_ bitwiseOR _)
  }

  /** N-dimensional Morton code of 2..8 bucketized dimensions (8 bits
    * each, ≤64 bits total): dimension j's bit i lands at bit
    * `i * N + j`, so for N = 2 this is exactly [[zvalue8]]'s layout.
    * More dimensions trade per-dimension resolution for breadth the
    * usual way (8 bits each regardless of N — the CALLER bucketizes
    * to 0..255); Delta's multi-column `OPTIMIZE ZORDER BY` shape.
    */
  def zvalueN(cols: Seq[Column]): Column = {
    require(cols.size >= 2 && cols.size <= 8,
      s"zvalueN interleaves 2..8 dimensions, got ${cols.size}")
    cols.zipWithIndex
      .map { case (c, j) => spreadBits(c, cols.size, j) }
      .reduce(_ bitwiseOR _)
  }

  /** Z prefixes (top `prefixBits` bits of the 16-bit code) whose 2-D cell
    * intersects the box [loX,hiX]×[loY,hiY]. `prefixBits` must be even —
    * k = prefixBits/2 top bits of each dimension — so each prefix is an
    * axis-aligned cell of side 2^(8-k). Driver-side loop over all
    * 2^prefixBits prefixes: exact (a point in the box always lands in a
    * returned prefix) and O(constant), the classic z-range-query
    * decomposition.
    */
  def prefixesFor(loX: Int, hiX: Int, loY: Int, hiY: Int,
      prefixBits: Int): Seq[Int] = {
    require(prefixBits > 0 && prefixBits % 2 == 0 && prefixBits <= 16,
      s"prefixBits must be even in 2..16, got $prefixBits")
    val k = prefixBits / 2
    val side = 1 << (8 - k)
    (0 until (1 << prefixBits)).filter { p =>
      // deinterleave: prefix bit 2i is x's bit (8-k+i), 2i+1 is y's
      var xHi = 0; var yHi = 0
      var i = 0
      while (i < k) {
        xHi |= ((p >> (2 * i)) & 1) << i
        yHi |= ((p >> (2 * i + 1)) & 1) << i
        i += 1
      }
      val (xLo, xHiEnd) = (xHi * side, xHi * side + side - 1)
      val (yLo, yHiEnd) = (yHi * side, yHi * side + side - 1)
      xHiEnd >= loX && xLo <= hiX && yHiEnd >= loY && yLo <= hiY
    }
  }
}
