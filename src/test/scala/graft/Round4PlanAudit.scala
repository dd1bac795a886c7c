package graft

import org.scalatest.funsuite.AnyFunSuite

/** One-shot audit helper (kept as a runnable spec): prints the formatted
  * plans of the round-4 queries so scan pruning and pushdown can be
  * reviewed; asserts the load-bearing properties.
  */
class Round4PlanAudit extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  val sf = "/root/testdata/sf0.001"

  test("round-4 scans prune columns and push filters") {
    // t15_bpe_train is deliberately absent: it aggregates inside its
    // driver loop and returns a LocalRelation, so scan assertions on its
    // RESULT are vacuous (no parquet leaves) while still paying for the
    // full training run
    for (q <- Seq("d11_hll_cardinality", "t12_pii", "q21_range_frame",
        "d14_semantic_dedup", "d12_bloom_prefilter", "t14_domain_mix",
        "q23_rank_family")) {
      val df = SparkEntry.queries(q)(spark, sf)
      val leaves = df.queryExecution.executedPlan.collectLeaves()
        .map(_.toString).filter(_.contains("parquet"))
      leaves.foreach { l =>
        if (sys.env.contains("GRAFT_PRINT_PLANS")) println(s"== $q\n$l")
        // every parquet scan must prune: no scan may read all columns of
        // documents (6 cols) / events (6) / customer (5) when the query
        // touches fewer
        assert(l.contains("ReadSchema"), s"$q: no ReadSchema in $l")
      }
      // documents-based queries never need n_chars; events queries never
      // need props
      if (q.startsWith("d") || Set("t12_pii", "t14_domain_mix")
          .contains(q))
        assert(!leaves.exists(_.contains("n_chars")), s"$q reads n_chars")
      if (q == "q21_range_frame")
        assert(!leaves.exists(_.contains("props")), s"$q reads props")
    }
  }
}
