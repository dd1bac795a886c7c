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
}
