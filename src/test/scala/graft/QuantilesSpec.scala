package graft

import org.scalatest.funsuite.AnyFunSuite

import graft.operators.ExactQuantiles

/** [[graft.operators.ExactQuantiles]] — the oracle gate (q30) proves one
  * column at one sf; this spec pins the operator against brute force on
  * adversarial shapes: pseudo-random values, negatives, heavy ties,
  * constant columns, and the rank-definition edges (p = 1 → first
  * value, p = 1000 → max).
  */
class QuantilesSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark

  private def brute(values: Seq[Long], pMilles: Seq[Int])
      : Map[Int, Long] = {
    val sorted = values.sorted
    val n = sorted.size.toLong
    pMilles.map { p =>
      val r = (p.toLong * n + 999) / 1000 // 1-indexed ceil rank
      p -> sorted((r - 1).toInt)
    }.toMap
  }

  private def run(values: Seq[Long], pMilles: Seq[Int], bins: Int = 64)
      : Map[Int, Long] = {
    import spark.implicits._
    ExactQuantiles(values.toDF("v").repartition(7), "v", pMilles, bins)
      .collect().map(r => r.getInt(0) -> r.getLong(1)).toMap
  }

  test("matches brute force on pseudo-random data, few bins") {
    val values = (0 until 5000).map(i => (i * 2654435761L) % 10007L)
    val ps = Seq(1, 10, 250, 500, 750, 900, 999, 1000)
    assert(run(values, ps) === brute(values, ps))
  }

  test("negative range and heavy ties") {
    val values = (0 until 2000).map(i => (i % 7).toLong - 3L)
    val ps = Seq(1, 143, 500, 857, 1000)
    assert(run(values, ps) === brute(values, ps))
  }

  test("constant column short-circuits; extremes hit min and max") {
    val const = Seq.fill(100)(42L)
    assert(run(const, Seq(1, 500, 1000)) ===
      Map(1 -> 42L, 500 -> 42L, 1000 -> 42L))
    val two = Seq(-5L, 9L)
    assert(run(two, Seq(1, 1000)) === Map(1 -> -5L, 1000 -> 9L))
  }

  test("refuses empty input and out-of-range p") {
    import spark.implicits._
    intercept[IllegalArgumentException] {
      ExactQuantiles(Seq.empty[Long].toDF("v"), "v", Seq(500))
    }
    intercept[IllegalArgumentException] {
      ExactQuantiles(Seq(1L).toDF("v"), "v", Seq(0))
    }
    intercept[IllegalArgumentException] {
      ExactQuantiles(Seq(1L).toDF("v"), "v", Seq(1001))
    }
  }
}
