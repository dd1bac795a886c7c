package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.operators.AsofJoin

class AsofJoinSpec extends AnyFunSuite {

  test("picks latest right row at-or-before, per key") {
    val spark = TestSpark.spark
    import spark.implicits._
    val left = Seq((1L, 10L, "a"), (1L, 25L, "b"), (2L, 10L, "c"))
      .toDF("k", "ts", "tag")
    val right = Seq((1L, 5L, 100L), (1L, 20L, 200L), (2L, 50L, 300L))
      .toDF("k", "ts", "v")
    val out = AsofJoin.withDefault(left, right, "k", "ts", "v", lit(-1L))
      .select(col("tag"), col("v")).as[(String, Long)].collect().toMap
    assert(out == Map("a" -> 100L, "b" -> 200L, "c" -> -1L))
  }

  test("a same-instant update is visible (inclusive semantics)") {
    val spark = TestSpark.spark
    import spark.implicits._
    val left = Seq((1L, 20L, "x")).toDF("k", "ts", "tag")
    val right = Seq((1L, 20L, 7L)).toDF("k", "ts", "v")
    val out = AsofJoin(left, right, "k", "ts", Seq("v"))
      .select(col("v")).as[Long].collect()
    assert(out.toSeq == Seq(7L))
  }

  test("a payload column colliding with a left column is refused") {
    val spark = TestSpark.spark
    import spark.implicits._
    val left = Seq((1L, 10L, "keep")).toDF("k", "ts", "v")
    val right = Seq((1L, 5L, 99L)).toDF("k", "ts", "v")
    val e = intercept[IllegalArgumentException] {
      AsofJoin(left, right, "k", "ts", Seq("v"))
    }
    assert(e.getMessage.contains("collide"))
  }

  test("null left timestamps match nothing (DuckDB/pandas parity)") {
    val spark = TestSpark.spark
    import spark.implicits._
    val left = Seq((1L, Option(20L), "has_ts"), (1L, Option.empty[Long], "no_ts"))
      .toDF("k", "ts", "tag")
    val right = Seq((1L, 5L, 100L)).toDF("k", "ts", "v")
    val out = AsofJoin(left, right, "k", "ts", Seq("v"))
      .select(col("tag"), col("v")).collect()
      .map(r => (r.getString(0), Option(r.get(1)))).toMap
    assert(out("has_ts").contains(100L))
    assert(out("no_ts").isEmpty)
  }
}
