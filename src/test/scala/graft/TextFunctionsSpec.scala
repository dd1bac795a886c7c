package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.functions.TextFunctions._
import graft.functions.DedupFunctions._

/** Edge-case behavior of the text/dedup column functions — notably blank
  * and single-token documents, which reach every corpus at scale.
  */
class TextFunctionsSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  test("wordBigrams on blank / one-word / normal text") {
    val df = Seq("", "   ", "solo", "a b c").toDF("text")
    val rows = df.select(wordBigrams(col("text")).as("bg"))
      .as[Seq[String]].collect()
    assert(rows(0) === Seq.empty)
    assert(rows(1) === Seq.empty)
    assert(rows(2) === Seq.empty)
    assert(rows(3) === Seq("a b", "b c"))
  }

  test("simhash over empty feature set is total but deterministic") {
    val df = Seq("", "x y").toDF("text")
    // must not throw on the empty-features row
    val out = df.select(simhash48(wordBigrams(col("text"))).as("sh"))
      .as[Long].collect()
    assert(out.length === 2)
  }

  test("tokens and shingles handle degenerate inputs") {
    val df = Seq(("", 0), ("ab", 1), ("abcd", 2)).toDF("text", "id")
    val t = df.select(tokenCount(col("text")).as("n")).as[Int].collect()
    assert(t.toSeq === Seq(0, 1, 1))
    val sh = df.select(shingles(col("text"), 3).as("g"))
      .as[Seq[String]].collect()
    assert(sh(0) === Seq.empty) // shorter than n
    assert(sh(1) === Seq.empty)
    assert(sh(2) === Seq("abc", "bcd"))
  }
}
