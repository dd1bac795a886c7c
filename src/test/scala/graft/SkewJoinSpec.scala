package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.operators.SkewJoin

class SkewJoinSpec extends AnyFunSuite {

  test("salted join returns exactly the plain join's rows") {
    val spark = TestSpark.spark
    import spark.implicits._
    // key 1 is hot on the big side; small side has duplicate keys too
    val big = ((1 to 50).map(i => (1L, s"b$i")) ++
      Seq((2L, "x"), (3L, "y"))).toDF("k", "bv")
    val small = Seq((1L, "s1"), (1L, "s2"), (2L, "s3"), (4L, "s4"))
      .toDF("k", "sv")
    val plain = big.join(small, Seq("k"))
      .select(col("k"), col("bv"), col("sv"))
      .collect().map(_.toString).sorted
    val salted = SkewJoin(big, small, "k", salts = 8)
      .select(col("k"), col("bv"), col("sv"))
      .collect().map(_.toString).sorted
    assert(salted.toSeq == plain.toSeq)
    assert(plain.length == 50 * 2 + 1) // hot key x2 matches + key 2
  }

  test("saltCols salts unhashable-payload rows by the chosen subset") {
    val spark = TestSpark.spark
    import spark.implicits._
    // a map payload would fail xxhash64 over all columns — restrict the
    // salt hash to the hashable subset
    val big = ((1 to 20).map(i => (1L, s"b$i", Map("m" -> i))) ++
      Seq((2L, "x", Map("m" -> 0)))).toDF("k", "bv", "mp")
    val small = Seq((1L, "s1"), (2L, "s2")).toDF("k", "sv")
    val plain = big.join(small, Seq("k"))
      .select(col("k"), col("bv"), col("sv"))
      .collect().map(_.toString).sorted
    val salted = SkewJoin(big, small, "k", salts = 4,
        saltCols = Seq("k", "bv"))
      .select(col("k"), col("bv"), col("sv"))
      .collect().map(_.toString).sorted
    assert(salted.toSeq == plain.toSeq)
  }
}
