package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Near-duplicate-detection primitives: shingle hashing, MinHash
  * signatures, LSH banding, SimHash, and quantized-integer vector
  * similarity.
  *
  * Everything is expressed with Spark higher-order functions over array
  * columns — codegen-friendly, no UDFs — and in exact integer arithmetic so
  * results are bit-reproducible across engines (the DuckDB oracle runs the
  * same formulas). At 100 TB the LSH paths (band self-join, hyperplane
  * buckets) replace any all-pairs comparison; the exact all-pairs forms are
  * kept for verification and small probe sets.
  */
object DedupFunctions {

  val P: Long = 1000000007L

  /** LSH band signatures: split a k-length signature into `bands` bands of
    * `r` rows; each band becomes "m1:m2:...:mr". Docs sharing any (band,
    * signature) pair are candidates — the scale path that avoids all-pairs.
    */
  def bandSignatures(mh: Column, bands: Int, r: Int): Column =
    transform(sequence(lit(0), lit(bands - 1)),
      b => concat_ws(":",
        transform(slice(mh, b * r + 1, lit(r)), _.cast("string"))))

  val SimhashMod: Long = 1L << 48

  /** Per-feature 48-bit hash: base-31 polynomial mod 2^48 over chars. */
  def featureHash48(w: Column): Column =
    aggregate(
      transform(call_function("regexp_extract_all", w, lit("."), lit(0)),
        c => ascii(c).cast("long")),
      lit(0L),
      (acc, x) => (acc * 31L + x) % SimhashMod)

  /** 48-bit SimHash over an array<string> feature column: bit b is set when
    * at least half the feature hashes have bit b set (majority vote,
    * ties → 1).
    *
    * A Scala UDF on purpose: expressed as higher-order functions, the
    * 48 per-bit passes re-evaluate the feature-hash child expression each
    * time (HOF lambdas re-run their argument), and HOFs are interpreted —
    * one primitive-array pass here is ~100× the throughput and the formula
    * stays bit-identical to the DuckDB oracle.
    */
  val simhash48: org.apache.spark.sql.expressions.UserDefinedFunction =
    udf((features: Seq[String]) => {
      val counts = new Array[Int](48)
      var n = 0
      // Null input → empty feature set. NOTE: the empty set yields the
      // all-ones signature (majority vote over zero features, ties → 1,
      // matching the oracle's formula exactly) — callers comparing short
      // documents should length-filter first or they all pair at hd=0.
      val fs = if (features == null) Seq.empty[String] else features
      fs.foreach { w =>
        var h = 0L
        var i = 0
        while (i < w.length) {
          h = (h * 31L + w.charAt(i).toLong) % SimhashMod
          i += 1
        }
        var b = 0
        while (b < 48) {
          counts(b) += ((h >>> b) & 1L).toInt
          b += 1
        }
        n += 1
      }
      var sig = 0L
      var b = 0
      while (b < 48) {
        if (2 * counts(b) >= n) sig |= 1L << b
        b += 1
      }
      sig
    })

  /** Hamming distance between two long bit-vectors. */
  def hammingDist(a: Column, b: Column): Column =
    call_function("bit_count", a.bitwiseXOR(b))

  /** Hamming-LSH band keys for a packed bit signature: `bands` chunks of
    * `width` bits each (band i = bits [i·width, (i+1)·width)). By
    * pigeonhole, two signatures within hamming distance `bands − 1` share
    * at least one identical band, so an equi-join on (band index, band
    * bits) has exact recall at that radius — the scale substitute for an
    * all-pairs hamming scan.
    */
  def simhashBands(sh: Column, bands: Int, width: Int): Column =
    transform(sequence(lit(0), lit(bands - 1)),
      b => call_function("shiftrightunsigned", sh, (b * width).cast("int"))
        .bitwiseAND(lit((1L << width) - 1)))

  /** Multi-block Hamming-LSH keys for hd ≤ 6 over a 48-bit signature —
    * the key-width/table-count trade Manku et al. (WWW'07) make for
    * web-scale simhash dedup. Single-block 7-bit bands (the pigeonhole
    * minimum, [[simhashBands]](sh, 7, 7)) have a 128-value key space, so
    * candidate volume is ~n²/128 PER BAND no matter the corpus — a
    * quadratic cliff a 10× scale probe measured at 67× query growth.
    * Here the signature splits into 9 blocks (widths 6,6,6,5,5,5,5,5,5);
    * hd ≤ 6 flips bits in at most 6 blocks, so at least THREE blocks
    * agree, and every qualifying pair shares the full key of one of the
    * C(9,3) = 84 block-triple tables. Keys are 15–18 bits (up to 256×
    * the bucket space), cutting candidates ~250× for 12× more (still
    * n-linear) band rows. Recall stays exact — the property spec pins
    * pigeonhole on generated pairs.
    */
  def simhashTripleKeys(sh: Column): Column = {
    val widths = Seq(6, 6, 6, 5, 5, 5, 5, 5, 5)
    val offsets = widths.scanLeft(0)(_ + _).init
    def block(i: Int): Column =
      call_function("shiftrightunsigned", sh, lit(offsets(i)))
        .bitwiseAND(lit((1L << widths(i)) - 1))
    val triples = for {
      i <- 0 until 9; j <- (i + 1) until 9; k <- (j + 1) until 9
    } yield (i, j, k)
    array(triples.zipWithIndex.map { case ((i, j, k), t) =>
      struct(lit(t).as("band"),
        (block(i) + block(j) * lit(1L << 6) + block(k) * lit(1L << 12))
          .as("bits"))
    }: _*)
  }

  /** Distinct 3-gram shingle set as SORTED packed longs: each shingle's
    * three UTF-16 units occupy 16 bits each, so packing is injective —
    * long equality ⇔ string equality, and intersection counts on the packed
    * sets are exactly the counts on the string sets the oracle computes.
    *
    * One primitive-array pass per document. The higher-order-function
    * formulation ([[graft.functions.TextFunctions.shingles]]) re-evaluates
    * interpreted lambdas per element (HOFs don't participate in codegen);
    * on 2000-char docs this UDF is ~50× faster and is what the hot dedup
    * paths use. Sorted output enables merge-intersection.
    */
  val shinglesPacked3: org.apache.spark.sql.expressions.UserDefinedFunction =
    udf((text: String) => {
      if (text == null || text.length < 3) Array.empty[Long]
      else {
        val n = text.length - 2
        val arr = new Array[Long](n)
        var i = 0
        while (i < n) {
          arr(i) = (text.charAt(i).toLong << 32) |
            (text.charAt(i + 1).toLong << 16) | text.charAt(i + 2).toLong
          i += 1
        }
        java.util.Arrays.sort(arr)
        var w = 0
        var r = 0
        while (r < n) {
          if (w == 0 || arr(w - 1) != arr(r)) { arr(w) = arr(r); w += 1 }
          r += 1
        }
        java.util.Arrays.copyOf(arr, w)
      }
    })

  /** MinHash signature (k=16) over a document's 3-gram shingles in one
    * pass: per shingle the base-31 polynomial hash mod 1e9+7
    * (h = ((c1·31 + c2)·31 + c3) mod P), then the 16 affine-permutation
    * minima (permutation i: h → ((2i+1)h + 7i+3) mod P). Duplicates
    * don't affect minima, so no distinct pass is needed. Bit-identical
    * to the DuckDB oracle's formula.
    */
  val minhash16: org.apache.spark.sql.expressions.UserDefinedFunction =
    udf((text: String) => {
      val mins = Array.fill(16)(P)
      if (text != null && text.length >= 3) {
        var i = 0
        val n = text.length - 2
        while (i < n) {
          val h = ((text.charAt(i).toLong * 31L +
            text.charAt(i + 1).toLong) * 31L +
            text.charAt(i + 2).toLong) % P
          var k = 0
          while (k < 16) {
            val p = ((2 * k + 1) * h + 7 * k + 3) % P
            if (p < mins(k)) mins(k) = p
            k += 1
          }
          i += 1
        }
      }
      mins
    })

  /** 64-register HyperLogLog-style register array over packed 3-shingles
    * ([[shinglesPacked3]] output) in one primitive pass — the per-document
    * "block sketch" that [[graft.expressions.ElementwiseMax]] merges into
    * group/corpus sketches. Hash: the d3/d7 ascii polynomial recovered
    * from the pack's bit-slices, scrambled affinely mod P to spread over
    * ~2^30; bucket = h mod 64; rank = leading-zero count of the remaining
    * 24-bit field + 1, i.e. `25 − length(bin(h div 64))` (25 when the
    * field is 0) — exactly the DuckDB oracle's formula. A UDF for the
    * same measured reason as [[minhash16]]: the relational form costs two
    * shuffles per document batch (group by (doc, bucket), regroup to
    * arrays) that this one narrow pass deletes.
    */
  val hllRegisters64: org.apache.spark.sql.expressions.UserDefinedFunction =
    udf((ps: Seq[Long]) => {
      val regs = new Array[Long](64)
      if (ps != null) ps.foreach { p =>
        val c1 = p >>> 32
        val c2 = (p >> 16) & 0xFFFFL
        val c3 = p & 0xFFFFL
        val h = (((c1 * 31L + c2) * 31L + c3) * 48271L + 11L) % P
        val b = (h % 64L).toInt
        val rest = h / 64L
        val r =
          if (rest == 0L) 25L
          else 25L - (64 - java.lang.Long.numberOfLeadingZeros(rest))
        if (r > regs(b)) regs(b) = r
      }
      regs
    })

  /** Dictionary-encoded bitset for a shingle set: bit i set ⟺ the i-th
    * vocabulary shingle (sorted order) is present. When the corpus'
    * distinct-shingle vocabulary is small, this collapses set intersection
    * to AND+popcount over a few longs — the exact-Jaccard verification
    * drops from O(|A|+|B|) merges on ~KB arrays to a handful of word ops
    * on ~48 bytes, and the pair shuffle shrinks by the same factor. The
    * vocabulary ships in the UDF closure (task broadcast), never joined.
    */
  def bitsetUdf(vocab: Array[Long])
      : org.apache.spark.sql.expressions.UserDefinedFunction = {
    val nWords = (vocab.length + 63) >> 6
    udf((gs: Seq[Long]) => {
      val bits = new Array[Long](nWords)
      val it = gs.iterator
      while (it.hasNext) {
        val i = java.util.Arrays.binarySearch(vocab, it.next())
        if (i >= 0) bits(i >> 6) |= 1L << (i & 63)
      }
      bits
    })
  }

  /** |A ∩ B| of two same-length bitsets: popcount of the word-wise AND.
    * Native codegen kernel ([[graft.expressions.IntersectBits]]); requires
    * [[graft.expressions.LongArrayOps.register]] on the session.
    */
  def intersectBits(a: Column, b: Column): Column =
    call_function("graft_intersect_bits", a, b)

  /** |A ∩ B| for two SORTED long arrays by linear merge — the verification
    * step of every near-dup candidate pair. Native codegen kernel
    * ([[graft.expressions.SortedIntersectCount]]).
    */
  def intersectSortedCount(a: Column, b: Column): Column =
    call_function("graft_sorted_intersect_count", a, b)

  val QuantScale = 1048576.0 // 2^20

  /** Quantize a float vector to exact integers: floor(x * 2^20 + 0.5).
    * Integer dot products / norms are then engine-exact, and the derived
    * cosine is a deterministic IEEE expression — no float-summation-order
    * sensitivity between Spark and the oracle.
    */
  def quantize(v: Column): Column =
    transform(v, x => floor(x.cast("double") * QuantScale + 0.5).cast("long"))

  /** Integer dot product of two array<long> columns, as a native codegen
    * kernel ([[graft.expressions.DotLong]]) — one primitive loop per pair.
    * A higher-order-function formulation re-evaluates interpreted lambdas
    * per element, which dominated pairwise-similarity scans (millions of
    * 64-dim dots per query); a Scala UDF pays Seq boxing per call.
    */
  def dotLong(a: Column, b: Column): Column =
    call_function("graft_dot_long", a, b)

  /** Squared L2 between a quantized integer vector and a double centroid,
    * folded in index order — native codegen kernel
    * ([[graft.expressions.SqDistLong]]), IEEE-identical to the
    * `zip_with`+`aggregate` HOF form and the oracle's `list_reduce`.
    */
  def sqDistLong(a: Column, b: Column): Column =
    call_function("graft_sqdist_long", a, b)

  /** Integer squared norm — the dot kernel against itself (one native
    * loop, vs the interpreted transform+aggregate HOF chain). Requires
    * [[graft.expressions.LongArrayOps.register]] like [[dotLong]].
    */
  def normSqLong(a: Column): Column = dotLong(a, a)

  /** Cosine similarity from quantized integers (deterministic double). */
  def cosineQ(dot: Column, na: Column, nb: Column): Column =
    dot.cast("double") / (sqrt(na.cast("double")) * sqrt(nb.cast("double")))

  /** True float cosine (for engine use where cross-engine exactness is not
    * required): computed in double precision, index order.
    */
  def cosineF(a: Column, b: Column): Column = {
    val dot = aggregate(zip_with(a, b,
      (x, y) => x.cast("double") * y.cast("double")), lit(0.0), (s, x) => s + x)
    val na = aggregate(transform(a, x => x.cast("double") * x.cast("double")),
      lit(0.0), (s, x) => s + x)
    val nb = aggregate(transform(b, x => x.cast("double") * x.cast("double")),
      lit(0.0), (s, x) => s + x)
    dot / (sqrt(na) * sqrt(nb))
  }
}
