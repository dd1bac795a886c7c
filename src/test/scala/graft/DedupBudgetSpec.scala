package graft

import org.scalatest.funsuite.AnyFunSuite

import graft.queries.DedupQueries

/** The candidate-budget escape: rate arithmetic, the fail-loud guard
  * on the exact pair forms, and rate-1 ≡ exact on the census form.
  */
class DedupBudgetSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  private val sf = "/root/testdata/sf0.001"

  test("budgetRate derives ceil(volume/budget); forced rate wins") {
    assert(DedupQueries.budgetRate(100L, 100L, 0L) === 1L)
    assert(DedupQueries.budgetRate(101L, 100L, 0L) === 2L)
    assert(DedupQueries.budgetRate(1000L, 3L, 0L) === 334L)
    assert(DedupQueries.budgetRate(1L, 1000L, 0L) === 1L)
    assert(DedupQueries.budgetRate(1000000L, 1L, 8L) === 8L)
  }

  test("exact pair operators refuse over budget instead of silently sampling") {
    spark.conf.set("spark.graft.dedup.candBudget", "1")
    try {
      val e = intercept[IllegalArgumentException] {
        DedupQueries.dJaccard(spark, sf).collect()
      }
      assert(e.getMessage.contains("candBudget"))
      val e2 = intercept[IllegalArgumentException] {
        DedupQueries.dContainment(spark, sf).collect()
      }
      assert(e2.getMessage.contains("candBudget"))
    } finally spark.conf.unset("spark.graft.dedup.candBudget")
  }

  test("census form at rate 1 (under budget) equals the forced-rate-1 escape") {
    // no budget: exact census, rate column 1
    val exact = DedupQueries.dJaccardCensusBudget(spark, sf, 0.5)
      .collect().map(_.toSeq).toSeq
    assert(exact.nonEmpty && exact.forall(_(1) == 1L))
    // budget exceeded but forced rate 1: keep rule (mod 8 < 8) keeps
    // every pair — identical census, still rate 1
    spark.conf.set("spark.graft.dedup.candBudget", "1")
    spark.conf.set("spark.graft.dedup.candSampleRate", "1")
    try {
      val escaped = DedupQueries.dJaccardCensusBudget(spark, sf, 0.5)
        .collect().map(_.toSeq).toSeq
      assert(escaped === exact)
    } finally {
      spark.conf.unset("spark.graft.dedup.candBudget")
      spark.conf.unset("spark.graft.dedup.candSampleRate")
    }
  }

  test("sampled census n_est scales n_sampled by the stamped rate") {
    val rows = DedupQueries.d21BudgetNeardup(spark, sf).collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      assert(r.getLong(1) === 8L)
      assert(r.getLong(3) === r.getLong(2) * 8L)
    }
    // the rollup total row is always present and first in band order
    assert(rows.head.getLong(0) === -1L)
  }
}
