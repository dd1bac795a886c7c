package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.expressions.LongArrayOps

class ElementwiseMinSpec extends AnyFunSuite {

  test("elementwise min merges across rows and partitions") {
    val spark = TestSpark.spark
    import spark.implicits._
    LongArrayOps.register(spark)
    // 4 partitions force map-side partial buffers + a final merge
    val df = Seq(
      (1, Seq(5L, 1L, 9L)),
      (1, Seq(2L, 7L, 9L)),
      (1, Seq(8L, 3L, 4L)),
      (2, Seq(6L, 6L, 6L))).toDF("k", "v").repartition(4)
    val rows = df.groupBy(col("k"))
      .agg(call_function("graft_elementwise_min", col("v")).as("m"))
      .orderBy(col("k"))
      .collect()
    assert(rows(0).getSeq[Long](1) == Seq(2L, 1L, 4L))
    assert(rows(1).getSeq[Long](1) == Seq(6L, 6L, 6L))
  }

  test("null inputs are ignored; all-null group yields null") {
    val spark = TestSpark.spark
    import spark.implicits._
    LongArrayOps.register(spark)
    val df = Seq((1, Some(Seq(4L, 2L))), (1, None), (2, None))
      .toDF("k", "v")
    val rows = df.groupBy(col("k"))
      .agg(call_function("graft_elementwise_min", col("v")).as("m"))
      .orderBy(col("k"))
      .collect()
    assert(rows(0).getSeq[Long](1) == Seq(4L, 2L))
    assert(rows(1).isNullAt(1))
  }

  test("elementwise max merges across rows and partitions") {
    val spark = TestSpark.spark
    import spark.implicits._
    LongArrayOps.register(spark)
    val df = Seq(
      (1, Seq(5L, 1L, 9L)),
      (1, Seq(2L, 7L, 3L)),
      (2, Seq(0L, 0L, 0L))).toDF("k", "v").repartition(4)
    val rows = df.groupBy(col("k"))
      .agg(call_function("graft_elementwise_max", col("v")).as("m"))
      .orderBy(col("k"))
      .collect()
    assert(rows(0).getSeq[Long](1) == Seq(5L, 7L, 9L))
    assert(rows(1).getSeq[Long](1) == Seq(0L, 0L, 0L))
  }

  test("max-merged block sketches equal the whole-input sketch (HLL union)") {
    val spark = TestSpark.spark
    import spark.implicits._
    LongArrayOps.register(spark)
    // registers per "block"; union must equal the sketch of all rows at once
    val blocks = Seq(
      ("a", Seq(3L, 0L, 7L, 1L)),
      ("b", Seq(1L, 5L, 2L, 9L)),
      ("c", Seq(4L, 4L, 4L, 0L))).toDF("blk", "regs").repartition(3)
    val merged = blocks
      .agg(call_function("graft_elementwise_max", col("regs")))
      .collect()(0).getSeq[Long](0)
    assert(merged == Seq(4L, 5L, 7L, 9L))
  }

  test("d11 sketch estimate lands within 50% of the exact count") {
    val spark = TestSpark.spark
    LongArrayOps.register(spark)
    val rows = graft.queries.DedupQueries
      .dHllCardinality(spark, "/root/testdata/sf0.001").collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val exact = r.getLong(1).toDouble
      val regs = r.getString(2).split(":").map(_.toInt)
      assert(regs.length == 64)
      val m = 64.0
      // standard HLL estimator with the 24-bit rank field used by d11
      val raw = 0.709 * m * m / regs.map(v => math.pow(2.0, -v)).sum
      val est =
        if (raw <= 2.5 * m && regs.count(_ == 0) > 0)
          m * math.log(m / regs.count(_ == 0).toDouble)
        else raw
      assert(math.abs(est - exact) / exact < 0.5,
        s"${r.getString(0)}: est=$est exact=$exact regs=${regs.toSeq}")
    }
  }
}
