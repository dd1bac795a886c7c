package graft

import org.scalatest.funsuite.AnyFunSuite

import graft.queries.DedupQueries

/** The candidate-budget escape: rate arithmetic, the fail-loud guard
  * on the exact pair forms, and rate-1 ≡ exact on the census form.
  */
class DedupBudgetSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  private val sf = "/root/testdata/sf0.001"

  test("budgetSample: exact under budget; pinned pair rule; auto doc rule") {
    def withConfs(kv: (String, String)*)(body: => Unit): Unit = {
      kv.foreach { case (k, v) => spark.conf.set(k, v) }
      try body finally kv.foreach { case (k, _) => spark.conf.unset(k) }
    }
    // under budget (or none): exact
    assert(DedupQueries.budgetSample(spark, 1000L, "t") ===
      DedupQueries.BudgetPlan(1L, None, None))
    withConfs("spark.graft.dedup.candBudget" -> "499500") {
      assert(DedupQueries.budgetSample(spark, 1000L, "t").rate === 1L)
    }
    // forced pair rule: d20's (mod 8r, keep 8)
    withConfs("spark.graft.dedup.candBudget" -> "1",
      "spark.graft.dedup.candSampleRate" -> "8") {
      assert(DedupQueries.budgetSample(spark, 1000L, "t") ===
        DedupQueries.BudgetPlan(8L, Some((64L, 8L)), None))
    }
    // auto: doc rule with q = ceil(sqrt(volume/budget)), scale q^2
    withConfs("spark.graft.dedup.candBudget" -> "10000") {
      // volume = 499500, q = ceil(sqrt(49.95)) = 8
      assert(DedupQueries.budgetSample(spark, 1000L, "t") ===
        DedupQueries.BudgetPlan(64L, None, Some((64L, 8L))))
    }
    // pair volume among the 1-in-q doc survivors fits the budget
    withConfs("spark.graft.dedup.candBudget" -> "1000000") {
      val p = DedupQueries.budgetSample(spark, 100000L, "t")
      val q = p.docSample.get._1 / 8L
      val kept = 100000L / q
      assert(kept * (kept - 1) / 2 <= 1000000L)
    }
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

  test("doc-rule census stamps q^2 and scales by it") {
    val rows = DedupQueries.d23BudgetDocSample(spark, sf).collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      assert(r.getLong(1) === 64L)
      assert(r.getLong(3) === r.getLong(2) * 64L)
    }
  }
}
