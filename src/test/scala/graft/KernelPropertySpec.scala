package graft

import org.apache.spark.sql.functions._
import org.scalacheck.Gen
import org.scalacheck.rng.Seed
import org.scalatest.funsuite.AnyFunSuite

import graft.expressions.LongArrayOps

/** Property tests pinning the native codegen kernels to their obvious
  * Scala reference implementations across generated inputs — the kernels
  * run through real Spark plans (codegen path), the references are plain
  * collections code. Deterministic seeds (no scalatest-scalacheck bridge
  * in the offline cache, so generators are driven directly).
  */
class KernelPropertySpec extends AnyFunSuite {

  lazy val spark = TestSpark.spark

  private val params = Gen.Parameters.default.withSize(24)
  private def samples[T](g: Gen[T], n: Int): Seq[T] =
    (1 to n).map(i => g.pureApply(params, Seed(i.toLong)))

  /** Run a 2-arg kernel over a batch of pairs in ONE Spark job. */
  private def runPairs(fn: String, pairs: Seq[(Seq[Long], Seq[Long])])
      : Seq[Long] = {
    import spark.implicits._
    LongArrayOps.register(spark)
    pairs.zipWithIndex.map { case ((a, b), i) => (i, a, b) }
      .toDF("i", "a", "b")
      .select(col("i"), call_function(fn, col("a"), col("b"))
        .cast("long").as("r"))
      .orderBy(col("i")).as[(Int, Long)].collect().map(_._2).toSeq
  }

  private val longArrays = Gen.listOf(Gen.chooseNum(Long.MinValue / 4,
    Long.MaxValue / 4))

  test("intersect_bits == popcount of pairwise AND") {
    val pairs = samples(Gen.zip(longArrays, longArrays), 60)
      .map { case (a, b) => (a: Seq[Long], b: Seq[Long]) }
    val expect = pairs.map { case (a, b) => a.zip(b)
      .map { case (x, y) => java.lang.Long.bitCount(x & y).toLong }.sum }
    assert(runPairs("graft_intersect_bits", pairs) == expect)
  }

  test("dot_long == sum of pairwise products") {
    val small = Gen.listOf(Gen.chooseNum(-1000000L, 1000000L))
    val pairs = samples(Gen.zip(small, small), 60)
      .map { case (a, b) => (a: Seq[Long], b: Seq[Long]) }
    val expect = pairs.map { case (a, b) =>
      a.zip(b).map { case (x, y) => x * y }.sum }
    assert(runPairs("graft_dot_long", pairs) == expect)
  }

  test("sqdist_long bit-identical to the zip_with+aggregate HOF form") {
    // the kernel replaced the interpreted HOF fold in every assignment
    // scan — the doubles must match BIT-FOR-BIT (index-order IEEE fold),
    // or the oracle hashes diverge
    import spark.implicits._
    LongArrayOps.register(spark)
    val vecs = Gen.listOfN(64, Gen.chooseNum(-2097152L, 2097152L))
    val cents = Gen.listOfN(64, Gen.chooseNum(-2097152.0, 2097152.0))
    val pairs = samples(Gen.zip(vecs, cents), 60)
    val rows = pairs.zipWithIndex.map { case ((a, b), i) => (i, a, b) }
      .toDF("i", "a", "b")
      .select(col("i"),
        call_function("graft_sqdist_long", col("a"), col("b")).as("k"),
        aggregate(zip_with(col("a"), col("b"),
            (x, m) => (x.cast("double") - m) * (x.cast("double") - m)),
          lit(0.0), (acc, x) => acc + x).as("h"))
      .orderBy(col("i")).as[(Int, Double, Double)].collect()
    rows.foreach { case (i, k, h) =>
      assert(java.lang.Double.doubleToLongBits(k) ==
        java.lang.Double.doubleToLongBits(h),
        s"pair $i: kernel $k != HOF $h") }
    // reference implementation cross-check
    val expect = pairs.map { case (a, b) =>
      a.zip(b).foldLeft(0.0) { case (acc, (x, m)) =>
        val d = x.toDouble - m; acc + d * d } }
    rows.map(_._2).zip(expect).foreach { case (k, e) =>
      assert(java.lang.Double.doubleToLongBits(k) ==
        java.lang.Double.doubleToLongBits(e)) }
  }

  test("sorted_intersect_count == distinct set intersection size") {
    val sets = Gen.listOf(Gen.chooseNum(0L, 50L))
      .map(_.distinct.sorted)
    val pairs = samples(Gen.zip(sets, sets), 60)
      .map { case (a, b) => (a: Seq[Long], b: Seq[Long]) }
    val expect = pairs.map { case (a, b) =>
      a.toSet.intersect(b.toSet).size.toLong }
    assert(runPairs("graft_sorted_intersect_count", pairs) == expect)
  }

  test("simhashBands: hd <= bands-1 pairs always share a band (pigeonhole)") {
    import spark.implicits._
    import graft.functions.DedupFunctions.{simhashBands, hammingDist}
    // random 48-bit signatures with 0..6 random bits flipped — every such
    // pair MUST collide in >= 1 of the 7 bands, or d4's banded candidate
    // generation loses recall (the exact-recall claim is math; this pins
    // the bit-slicing implementation to it)
    val sigGen = for {
      base <- Gen.chooseNum(0L, (1L << 48) - 1)
      nFlips <- Gen.chooseNum(0, 6)
      flips <- Gen.listOfN(nFlips, Gen.chooseNum(0, 47))
    } yield (base, flips.foldLeft(base)((s, b) => s ^ (1L << b)))
    val pairs = samples(sigGen, 80)
    val rows = pairs.zipWithIndex.map { case ((a, b), i) => (i, a, b) }
      .toDF("i", "a", "b")
      .select(col("i"), hammingDist(col("a"), col("b")).as("hd"),
        arrays_zip(simhashBands(col("a"), 7, 7),
          simhashBands(col("b"), 7, 7)).as("z"))
      .select(col("i"), col("hd"),
        exists(col("z"), p => p.getField("0") === p.getField("1"))
          .as("share"))
      .collect()
    rows.foreach { r =>
      assert(r.getAs[Int]("hd") <= 6)
      assert(r.getAs[Boolean]("share"),
        s"pair ${r.getInt(0)} at hd=${r.get(1)} shares no band")
    }
  }

  test("simhashTripleKeys: hd <= 6 pairs always share a triple key " +
      "(pigeonhole over 9 blocks)") {
    import spark.implicits._
    import graft.functions.DedupFunctions.{simhashTripleKeys, hammingDist}
    // hd <= 6 flips at most 6 of the 9 blocks, so >= 3 agree and the
    // pair shares one of the C(9,3)=84 block-triple keys — the exact
    // recall claim d4's candidate generation rests on
    val sigGen = for {
      base <- Gen.chooseNum(0L, (1L << 48) - 1)
      nFlips <- Gen.chooseNum(0, 6)
      flips <- Gen.listOfN(nFlips, Gen.chooseNum(0, 47))
    } yield (base, flips.foldLeft(base)((s, b) => s ^ (1L << b)))
    val pairs = samples(sigGen, 80)
    val rows = pairs.zipWithIndex.map { case ((a, b), i) => (i, a, b) }
      .toDF("i", "a", "b")
      .select(col("i"), hammingDist(col("a"), col("b")).as("hd"),
        arrays_zip(simhashTripleKeys(col("a")),
          simhashTripleKeys(col("b"))).as("z"))
      .select(col("i"), col("hd"),
        exists(col("z"), p => p.getField("0") === p.getField("1"))
          .as("share"))
      .collect()
    rows.foreach { r =>
      assert(r.getAs[Int]("hd") <= 6)
      assert(r.getAs[Boolean]("share"),
        s"pair ${r.getInt(0)} at hd=${r.get(1)} shares no triple key")
    }
  }

  test("elementwise_sum == positionwise sum per group") {
    import spark.implicits._
    LongArrayOps.register(spark)
    val groups = samples(
      Gen.nonEmptyListOf(Gen.listOfN(4, Gen.chooseNum(-1000L, 1000L))), 20)
    val rows = groups.zipWithIndex
      .flatMap { case (vs, g) => vs.map(v => (g, v)) }
    val got = rows.toDF("k", "v").repartition(3)
      .groupBy(col("k"))
      .agg(call_function("graft_elementwise_sum", col("v")).as("m"))
      .orderBy(col("k")).as[(Int, Seq[Long])].collect().map(_._2).toSeq
    val expect = groups.map(vs => vs.map(_.toSeq).reduce((x, y) =>
      x.zip(y).map { case (p, q) => p + q }))
    assert(got == expect)
  }

  test("elementwise_min == positionwise reduce per group") {
    import spark.implicits._
    LongArrayOps.register(spark)
    val groups = samples(
      Gen.nonEmptyListOf(Gen.listOfN(4, Gen.chooseNum(-1000L, 1000L))), 20)
    val rows = groups.zipWithIndex
      .flatMap { case (vs, g) => vs.map(v => (g, v)) }
    val got = rows.toDF("k", "v").repartition(3)
      .groupBy(col("k"))
      .agg(call_function("graft_elementwise_min", col("v")).as("m"))
      .orderBy(col("k")).as[(Int, Seq[Long])].collect().map(_._2).toSeq
    val expect = groups.map(vs => vs.map(_.toSeq).reduce((x, y) =>
      x.zip(y).map { case (p, q) => math.min(p, q) }))
    assert(got == expect)
  }

  test("zvalueN round-trips: deinterleaving the N-D Morton code " +
      "recovers every coordinate, and z-order preserves cell prefixes") {
    import spark.implicits._
    for (n <- 2 to 4) {
      val pts = samples(Gen.listOfN(n, Gen.chooseNum(0L, 255L)), 40)
      val cols = (0 until n).map(j => col(s"c$j"))
      val got = pts.zipWithIndex.map { case (p, i) => (i, p) }
        .toDF("i", "p")
        .select(col("i") +: (0 until n)
          .map(j => col("p").getItem(j).as(s"c$j")): _*)
        .select(col("i"), graft.io.ZOrder.zvalueN(cols).as("z"))
        .orderBy(col("i")).as[(Int, Long)].collect().map(_._2)
      pts.zip(got).foreach { case (p, z) =>
        // reference deinterleave: dim j's bit i sits at z bit i*n+j
        val back = (0 until n).map(j =>
          (0 until 8).map(i => ((z >> (i * n + j)) & 1L) << i).sum)
        assert(back == p, s"n=$n: $p -> $z -> $back")
        // prefix property: the top k bits per dim form the z's top n*k
        // bits — what makes a z-RANGE an axis-aligned cell
        val topZ = z >> (8 * n - n * 2) // top 2 bits of each dim
        val expectTop = (0 until n).map(j =>
          ((p(j) >> 6) & 3L) match { case t =>
            ((t & 1L) << j) | (((t >> 1) & 1L) << (j + n)) })
          .reduce(_ | _)
        assert(topZ == expectTop, s"n=$n prefix: $p -> $z")
      }
    }
  }
}
