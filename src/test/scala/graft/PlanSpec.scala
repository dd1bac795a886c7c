package graft

import java.nio.file.Files

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Plan-quality regression guards: the physical plans that matter at scale
  * are asserted, not eyeballed — a change that degrades a broadcast star
  * join to sort-merge, breaks scan-level column pruning, or loses
  * partition pruning fails here before it costs anything on a cluster.
  */
class PlanSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  val sf = "/root/testdata/sf0.001"

  private def executed(df: DataFrame): String =
    df.queryExecution.executedPlan.toString

  test("q6 multi-join is a broadcast star over the fact scan") {
    val plan = executed(SparkEntry.queries("q6_multi_join")(spark, sf))
    assert(plan.contains("BroadcastHashJoin"))
    assert(!plan.contains("SortMergeJoin"),
      "dimension joins must broadcast, not sort-merge")
  }

  test("q6 scans prune to the referenced columns") {
    val df = SparkEntry.queries("q6_multi_join")(spark, sf)
    val scans = df.queryExecution.executedPlan.collectLeaves()
      .map(_.toString).filter(_.contains("parquet"))
    val lineitemScan = scans.find(_.contains("lineitem")).get
    // lineitem has 16 columns; the query needs 3
    assert(lineitemScan.contains("l_orderkey"))
    assert(!lineitemScan.contains("l_comment"),
      "unreferenced columns must not reach the scan")
  }

  test("relational filters push down to the parquet scan") {
    val df = Tables.orders(spark, sf).filter(col("o_orderkey") < 100)
      .select(col("o_orderkey"))
    assert(executed(df).contains("PushedFilters: [IsNotNull(o_orderkey), " +
      "LessThan(o_orderkey,100)]"))
  }

  test("s2 ANN probes broadcast; corpus side stays streamed") {
    val plan = executed(SparkEntry.queries("s2_ann_lsh")(spark, sf))
    assert(plan.contains("BroadcastHashJoin") ||
      plan.contains("BroadcastNestedLoopJoin"))
  }

  test("d4 simhash self-join goes through the band equi-key, never all-pairs") {
    val plan = executed(SparkEntry.queries("d4_simhash")(spark, sf))
    assert(!plan.contains("CartesianProduct"),
      "simhash candidates must equi-join on (band, bits)")
    assert(!plan.contains("BroadcastNestedLoopJoin"),
      "simhash candidates must equi-join on (band, bits)")
  }

  test("d5 embed probes are broadcast, never a bare cross join") {
    val plan = executed(SparkEntry.queries("d5_embed_neardup")(spark, sf))
    assert(plan.contains("BroadcastNestedLoopJoin") ||
      plan.contains("BroadcastHashJoin"))
    assert(!plan.contains("CartesianProduct"),
      "the bounded probe side must broadcast")
  }

  test("s8 IVF-PQ never goes quadratic; codebook and centroid joins broadcast") {
    val plan = executed(SparkEntry.queries("s8_ivfpq")(spark, sf))
    assert(!plan.contains("CartesianProduct"),
      "every corpus-sized pairing must broadcast the small side or " +
        "equi-join on the list id")
    assert(plan.contains("BroadcastHashJoin"),
      "codebook/centroid/probe joins must broadcast")
  }

  test("t14 domain quotas broadcast to the rank join") {
    val plan = executed(SparkEntry.queries("t14_domain_mix")(spark, sf))
    assert(plan.contains("BroadcastHashJoin"),
      "the #domains-sized quota table must broadcast")
    assert(!plan.contains("SortMergeJoin"),
      "no corpus-sized shuffle join belongs in the quota draw")
  }

  test("t16 fuzzy-word candidates meet through the variant equi-key") {
    val plan = executed(SparkEntry.queries("t16_fuzzy_words")(spark, sf))
    assert(!plan.contains("CartesianProduct") &&
      !plan.contains("BroadcastNestedLoopJoin"),
      "deletion-neighborhood matching must equi-join on the variant")
  }

  test("recall/calibration/decontam queries never plan a cartesian pairing") {
    for (q <- Seq("s9_ann_recall", "s10_sq8", "d16_minhash_calib",
        "d17_funnel", "t17_split_decontam")) {
      val plan = executed(SparkEntry.queries(q)(spark, sf))
      assert(!plan.contains("CartesianProduct"),
        s"$q: bounded sides must broadcast, corpus pairings must equi-join")
    }
  }

  test("d8 embed LSH pairs meet through the bucket equi-key") {
    val plan = executed(SparkEntry.queries("d8_embed_lsh")(spark, sf))
    assert(!plan.contains("CartesianProduct") &&
      !plan.contains("BroadcastNestedLoopJoin"),
      "bucketed near-dup must equi-join on bucket id")
  }

  test("plain-expression queries run inside whole-stage codegen") {
    // guard the codegen span on the pure-expression paths (aggregates,
    // pivot, hash arithmetic). Higher-order-function queries are
    // deliberately NOT asserted: HOF lambdas are CodegenFallback in
    // Spark, which is exactly why the hot dedup/similarity paths use
    // native kernels (graft.expressions) or measured UDFs instead.
    // AQE reveals codegen only in the finalized plan, so execute first.
    Seq("t9_split", "q1_agg", "q17_pivot").foreach { q =>
      val df = SparkEntry.queries(q)(spark, sf)
      df.collect()
      // "*(n)" prefixes mark WholeStageCodegen stages in the plan string
      val plan = df.queryExecution.executedPlan.toString
      assert(plan.contains("WholeStageCodegen") || plan.contains("*("),
        s"$q lost whole-stage codegen")
    }
  }

  test("d10 substring spans meet only through span-keyed equi-shuffles") {
    val plan = executed(SparkEntry.queries("d10_substring_dedup")(spark, sf))
    assert(!plan.contains("CartesianProduct") &&
      !plan.contains("BroadcastNestedLoopJoin"),
      "span census must never pair rows outside the span key")
  }

  test("d12 bloom prefilter runs before any join; joins stay broadcast") {
    val df = SparkEntry.queries("d12_bloom_prefilter")(spark, sf)
    val plan = executed(df)
    assert(plan.contains("might_contain"),
      "the bloom prefilter must survive into the physical plan")
    assert(!plan.contains("SortMergeJoin") &&
      !plan.contains("CartesianProduct"),
      "the exact-verify join must broadcast the benchmark side")
    // the prefilter sits under the semi-join, not above it: the join
    // operator's subtree (probe side) must already contain the filter
    val planLines = plan.linesIterator.toSeq
    val joinIdx = planLines.indexWhere(_.contains("BroadcastHashJoin"))
    val filterIdx = planLines.indexWhere(_.contains("might_contain"))
    assert(joinIdx >= 0 && filterIdx > joinIdx,
      "might_contain must filter the probe stream feeding the join")
  }

  test("d13 incremental LSH broadcasts the new block, streams the corpus") {
    // on a dictionary-cap corpus (sf0.001 is one) the arriving block
    // travels as ONE broadcast variable and each corpus row sweeps it
    // inside the row — no join of ANY kind survives in the plan; the
    // general-vocabulary route (banded equi-join, block broadcast) is
    // pinned by the planted-pair spec instead
    val plan = executed(SparkEntry.queries("d13_incremental_lsh")(spark, sf))
    assert(!plan.contains("Join"),
      s"the fused block sweep must not plan a join:\n$plan")
    assert(!plan.contains("SortMergeJoin") &&
      !plan.contains("CartesianProduct"),
      "the corpus must never shuffle to meet the new block")
  }

  test("s6 PQ codebook joins broadcast; only bounded probes nested-loop") {
    val plan = executed(SparkEntry.queries("s6_pq_adc")(spark, sf))
    assert(!plan.contains("CartesianProduct"),
      "PQ scoring must broadcast the bounded probe set")
    assert(plan.contains("BroadcastHashJoin") ||
      plan.contains("BroadcastNestedLoopJoin"))
  }

  test("ANN nearest-code assignment aggregates, never rank-windows") {
    // nearest-centroid / nearest-code selection must be a min_by-style
    // aggregate (map-side combine collapses the codebook-replicated
    // candidates before any shuffle), never a row_number window (which
    // shuffles the full k×-replicated candidate set). The only Windows
    // allowed in these plans are the bounded probe-side top-k ranks,
    // partitioned by qid.
    import org.apache.spark.sql.catalyst.plans.logical.{Window => LWindow}
    for (q <- Seq("s3_ivf_assign", "s5_kmeans_train", "s7_pq_train")) {
      val df = SparkEntry.queries(q)(spark, sf)
      val wins = df.queryExecution.optimizedPlan.collect {
        case w: LWindow => w }
      assert(wins.isEmpty,
        s"$q: assignment must aggregate, not window (found ${wins.size})")
    }
    for (q <- Seq("s4_ivf_probe", "s6_pq_adc", "s8_ivfpq")) {
      val df = SparkEntry.queries(q)(spark, sf)
      val wins = df.queryExecution.optimizedPlan.collect {
        case w: LWindow => w }
      wins.foreach { w =>
        assert(w.partitionSpec.map(_.references.map(_.name).mkString) ==
          Seq("qid"),
          s"$q: only the bounded probe top-k may window, got " +
            w.partitionSpec.mkString(","))
      }
    }
  }

  test("ANN assignment/encode/decode are projections: nothing corpus-" +
      "keyed aggregates") {
    // The nearest-centroid/nearest-code picks and the PQ reconstruction
    // are computed INSIDE each corpus row (broadcast 1-row
    // centroid/codebook pack + fused projection). A vec_id-keyed
    // (corpus-cardinality) aggregate either rides
    // ObjectHashAggregateExec's sort-based fallback cliff (>128 distinct
    // keys per partition degrades to sorting variable-width collect_list
    // buffers carrying the vector payload — the shape behind the
    // driver-recorded 21× s4 blowup in round 5) or plans straight to
    // SortAggregateExec (array-typed min_by buffers), sorting the corpus
    // either way. Only bounded-key aggregates (centroid/codebook builds)
    // may remain.
    import org.apache.spark.sql.execution.aggregate.{
      ObjectHashAggregateExec, SortAggregateExec}
    for (q <- Seq("s3_ivf_assign", "s4_ivf_probe", "s5_kmeans_train",
        "s6_pq_adc", "s7_pq_train", "s8_ivfpq", "s9_ann_recall",
        "s10_sq8", "d14_semantic_dedup")) {
      val df = SparkEntry.queries(q)(spark, sf)
      val offenders = df.queryExecution.executedPlan.collect {
        case a: ObjectHashAggregateExec if a.groupingExpressions
          .exists(_.references.exists(_.name == "vec_id")) => a
        case a: SortAggregateExec if a.groupingExpressions
          .exists(_.references.exists(_.name == "vec_id")) => a
      }
      assert(offenders.isEmpty,
        s"$q: must not aggregate keyed by vec_id " +
          s"(found ${offenders.size})")
    }
  }

  test("t23/s12 retrieval: query terms broadcast to the posting join; " +
      "windows only ever partition by the bounded qid") {
    for (q <- Seq("t23_bm25", "s12_hybrid_rrf")) {
      val plan = executed(SparkEntry.queries(q)(spark, sf))
      assert(plan.contains("BroadcastHashJoin"),
        s"$q: the query-term side must broadcast")
      assert(!plan.contains("CartesianProduct"),
        s"$q: scoring must never pair all docs with all docs")
      // every Window in the plan partitions by qid — never by a
      // corpus-cardinality key
      plan.split("\n").filter(_.contains("Window")).foreach { l =>
        assert(!l.contains("doc_id#") || l.contains("qid"),
          s"$q: window must partition by the bounded qid: $l")
      }
    }
  }

  test("s15 stored hybrid: the dense leg scans ONLY the probed IVF list " +
      "partitions and meets probes on a list-keyed hash join — no " +
      "corpus-wide distance scan survives anywhere in the plan") {
    val df = SparkEntry.queries("s15_hybrid_stored")(spark, sf)
    val plan = executed(df)
    // the stored-codes scan must carry a partition filter over the
    // probed list ids — the pruning that makes query cost ∝ probed
    // lists instead of corpus size
    val codesScans = df.queryExecution.executedPlan.collectLeaves()
      .map(_.toString).filter(_.contains("graft_s15_hybrid/codes"))
    assert(codesScans.nonEmpty,
      "expected a scan of the persisted codes table")
    codesScans.foreach { sc =>
      assert(sc.contains("PartitionFilters") &&
        sc.replaceAll("\\s", "").contains("list#"),
        s"codes scan must prune to the probed list partitions: $sc")
    }
    // probes meet the (pruned, decoded) corpus on the list equi-key —
    // never the broadcast(probes).crossJoin(corpus) shape s12's exact
    // baseline uses
    assert(plan.replaceAll("\\s+", " ")
      .matches(".*BroadcastHashJoin \\[list#.*"),
      "the probe/corpus pairing must hash-join on list")
    assert(!plan.contains("CartesianProduct"),
      "no unbounded product may appear in the stored-index path")
    // the only nested-loop joins allowed are the one-row broadcast
    // packs (codebook / centroid / stats rows): every BNLJ must sit
    // above a grouping-less aggregate on its broadcast side
    val bnlj = df.queryExecution.executedPlan.collect {
      case j: org.apache.spark.sql.execution.joins
        .BroadcastNestedLoopJoinExec => j
    }
    bnlj.foreach { j =>
      val oneRowSide = Seq(j.left, j.right).exists(_.collect {
        case a: org.apache.spark.sql.execution.aggregate
          .HashAggregateExec if a.groupingExpressions.isEmpty => a
        case a: org.apache.spark.sql.execution.aggregate
          .ObjectHashAggregateExec if a.groupingExpressions.isEmpty => a
        case a: org.apache.spark.sql.execution.aggregate
          .SortAggregateExec if a.groupingExpressions.isEmpty => a
      }.nonEmpty)
      assert(oneRowSide,
        s"nested-loop join without a guaranteed one-row side: $j")
    }
  }

  test("t10/t11/t14 never window the raw corpus partitioned by lang alone") {
    // lang is skewed (en ≈ 43% of documents): a Window partitioned only
    // by lang over the raw corpus sort-spills ~43% of the input in one
    // reducer at 100 TB. The de-skewed rewrites allow a single-key
    // Window ONLY over an aggregated (histogram / shard-total) input —
    // corpus-sized windows must carry a compound partition key.
    import org.apache.spark.sql.catalyst.plans.logical.{Aggregate,
      LeafNode, LogicalPlan, Window => LWindow}
    // a raw (un-aggregated) scan reachable below the window means
    // corpus-sized input; merely CONTAINING an Aggregate somewhere (e.g.
    // on the broadcast side of a join) must not satisfy the guard
    def rawScanReachable(p: LogicalPlan): Boolean = p match {
      case _: Aggregate => false
      case _: LeafNode => true
      case other => other.children.exists(rawScanReachable)
    }
    for (q <- Seq("t10_packing", "t11_stratified", "t14_domain_mix")) {
      val df = SparkEntry.queries(q)(spark, sf)
      val wins = df.queryExecution.optimizedPlan.collect {
        case w: LWindow => w }
      wins.foreach { w =>
        if (w.partitionSpec.size < 2) {
          assert(!rawScanReachable(w.child),
            s"$q: a Window partitioned by a single (skewed) key must " +
              "read an aggregated input on every path, never the raw " +
              "corpus")
        }
      }
    }
  }

  test("t29/t30 model joins stay equi-keyed; only the bounded class " +
      "table may nested-loop") {
    // the bigram/count model tables are corpus-vocabulary-sized — a
    // plan that nested-loops or cartesians them against the token
    // stream is quadratic at 100 TB. The ONLY non-equi join allowed is
    // t30's crossJoin against the 4-row broadcast class-constant table.
    for (q <- Seq("t29_lm_score", "t30_nb_langid")) {
      val plan = executed(SparkEntry.queries(q)(spark, sf))
      assert(!plan.contains("CartesianProduct"),
        s"$q: model joins must be equi-keyed")
      val bnl = "BroadcastNestedLoopJoin".r.findAllIn(plan).size
      val limit = if (q == "t30_nb_langid") 1 else 0
      assert(bnl <= limit,
        s"$q: only the bounded class-constant table may nested-loop")
    }
  }

  test("s17 filtered ANN pre-filters the corpus side below the probe " +
      "join") {
    // filter-after-top-k silently under-fills k; the pin: the attribute
    // predicate must sit UNDER the probe join in the optimized plan (on
    // the corpus/list side), so ranking only ever sees eligible vectors
    import org.apache.spark.sql.catalyst.plans.logical.{Filter, Join,
      Window => LWindow}
    val df = SparkEntry.queries("s17_filtered_ann")(spark, sf)
    val joins = df.queryExecution.optimizedPlan.collect { case j: Join => j }
    assert(joins.nonEmpty)
    val filteredBelowJoin = joins.exists(_.children.exists(side =>
      side.collect {
        case f: Filter if f.condition.toString.contains("% 3") => f
      }.nonEmpty))
    assert(filteredBelowJoin,
      "the attribute predicate must land below the probe join")
    val windows = df.queryExecution.optimizedPlan.collect {
      case w: LWindow => w }
    windows.foreach { w =>
      val filterAbove = w.collect {
        case f: Filter if f.condition.toString.contains("% 3") => f
      }
      assert(filterAbove.isEmpty || filteredBelowJoin,
        "the attribute filter must not run after the top-k window")
    }
  }

  test("s19 stored filtered ANN: the range predicate reaches the codes " +
      "scan as a pushed filter and skip-stats prune the other block") {
    val df = SparkEntry.queries("s19_filtered_ann_stored")(spark, sf)
    val scans = df.queryExecution.executedPlan.collectLeaves()
      .map(_.toString)
      .filter(p => p.contains("parquet") && p.contains("graft_s19_ivf"))
    assert(scans.nonEmpty, "the stored codes scan must appear in the plan")
    assert(scans.exists(p => p.contains("PushedFilters") &&
      p.contains("LessThanOrEqual(vec_id") &&
      p.contains("GreaterThanOrEqual(vec_id")),
      s"the range predicate must reach the codes scan pushed:\n$scans")
    // directory-level pruning happened BEFORE Spark planned the scan:
    // the non-overlapping block's directory never appears
    assert(scans.forall(!_.contains("l_hi")),
      "the pruned block must not reach the scan's location list")
    // and SkipStats reports exactly that split on the persisted layout
    val base = spark.conf.get("spark.graft.tmpDir",
      System.getProperty("java.io.tmpdir"))
    val cut = Tables.embeddings(spark, sf)
      .agg(max(col("vec_id"))).collect()(0).getLong(0) / 2
    val (kept, skipped) = graft.io.SkipStats.prunedDirs(spark,
      s"$base/graft_s19_ivf/lists", "vec_id", "0", cut.toString)
    assert(skipped.exists(_.endsWith("l_hi")) &&
      kept.exists(_.endsWith("l_lo")),
      s"prunedDirs must drop the non-overlapping block " +
        s"(kept=$kept skipped=$skipped)")
  }

  test("s23 conjunction pruning: BOTH predicates reach the codes scan " +
      "pushed, and only the doubly-overlapping block is planned") {
    import org.apache.spark.sql.execution.{FileSourceScanExec, SparkPlan}
    import org.apache.spark.sql.execution.adaptive.AdaptiveSparkPlanExec
    val df = SparkEntry.queries("s23_conj_prune")(spark, sf)
    // the plan's toString truncates long filter lists — assert on the
    // scan node's untruncated metadata (descending through AQE wrappers,
    // which plain collect treats as leaves)
    def allScans(p: SparkPlan): Seq[FileSourceScanExec] = p match {
      case a: AdaptiveSparkPlanExec => allScans(a.executedPlan)
      case f: FileSourceScanExec => Seq(f)
      case other => other.children.flatMap(allScans)
    }
    val scans = allScans(df.queryExecution.executedPlan)
      .filter(_.metadata("Location").contains("graft_s23_ivf"))
    assert(scans.nonEmpty, "the stored codes scan must appear in the plan")
    val pushed = scans.map(_.metadata("PushedFilters"))
    assert(pushed.exists(p =>
      p.contains("LessThanOrEqual(vec_id") &&
      p.contains("GreaterThanOrEqual(vec_id") &&
      p.contains("LessThanOrEqual(label") &&
      p.contains("GreaterThanOrEqual(label")),
      s"both conjuncts must reach the codes scan pushed:\n$pushed")
    // pruning removed every block either conjunct rules out BEFORE the
    // scan was planned: only l_ll may appear in the location list
    val locs = scans.map(_.metadata("Location"))
    for (tag <- Seq("l_lh", "l_hl", "l_hh"))
      assert(locs.forall(!_.contains(tag)),
        s"pruned block $tag must not reach the scan's location list")
    assert(locs.exists(_.contains("l_ll")),
      "the surviving block must be the one planned")
  }

  test("s20/s21 whitening-recall pipelines: no cartesian product; " +
      "every nested-loop broadcast side is a one-row pack or the " +
      "bounded probe set") {
    import org.apache.spark.sql.execution.FilterExec
    import org.apache.spark.sql.execution.aggregate.{HashAggregateExec,
      ObjectHashAggregateExec, SortAggregateExec}
    import org.apache.spark.sql.execution.joins.BroadcastNestedLoopJoinExec
    for ((name, df) <- Seq(
        "s20" -> graft.queries.SimilarityQueries.s20Pipeline(spark, sf),
        "s21" -> graft.queries.SimilarityQueries.s21Pipeline(spark, sf))) {
      val plan = df.queryExecution.executedPlan
      assert(!plan.toString.contains("CartesianProduct"),
        s"$name: no unbounded product may appear")
      plan.collect { case j: BroadcastNestedLoopJoinExec => j }
        .foreach { j =>
          val bounded = Seq(j.left, j.right).exists(side =>
            side.collect {
              case a: HashAggregateExec
                if a.groupingExpressions.isEmpty => a
              case a: ObjectHashAggregateExec
                if a.groupingExpressions.isEmpty => a
              case a: SortAggregateExec
                if a.groupingExpressions.isEmpty => a
            }.nonEmpty ||
            side.collect {
              case f: FilterExec
                if f.condition.toString.contains("< 25") => f
            }.nonEmpty)
          assert(bounded,
            s"$name: nested-loop join without a one-row pack or " +
              s"bounded probe side: $j")
        }
    }
  }

  test("t35 DSIR: weight table broadcasts; top-m is TakeOrdered, not a " +
      "global sort") {
    val plan = executed(SparkEntry.queries("t35_dsir_select")(spark, sf))
    assert(plan.contains("BroadcastHashJoin"),
      "the <=1024-row weight table must broadcast to the occurrence scan")
    assert(plan.contains("TakeOrderedAndProject"),
      "the top-100 cut must be per-partition heads + driver merge")
    assert(!plan.contains("SortMergeJoin"))
  }

  test("partitioned writes enable partition pruning on read") {
    val base = Files.createTempDirectory("graft-part").toString
    Tables.documents(spark, sf)
      .withColumn("bucket", col("doc_id") % 4)
      .write.partitionBy("bucket").parquet(s"$base/docs")
    val pruned = spark.read.parquet(s"$base/docs")
      .filter(col("bucket") === 2).select(col("doc_id"))
    val scan = pruned.queryExecution.executedPlan.collectLeaves()
      .map(_.toString).mkString
    assert(scan.contains("PartitionFilters: [isnotnull(bucket"),
      "partition filter must prune at the scan, not post-filter")
  }

  test("d26 paragraph dedup: no string column ever crosses a shuffle") {
    // the winner join and census exchanges must carry only
    // (h, doc_id, pos, len) fixed-width rows — paragraph text stays
    // inside the map-side projection that hashes it
    import org.apache.spark.sql.execution.SparkPlan
    import org.apache.spark.sql.execution.adaptive.AdaptiveSparkPlanExec
    import org.apache.spark.sql.execution.exchange.ShuffleExchangeExec
    import org.apache.spark.sql.types.StringType
    def collectAll[T](plan: SparkPlan)(
        pf: PartialFunction[SparkPlan, T]): Seq[T] =
      plan.collect { case p => p }.flatMap {
        case a: AdaptiveSparkPlanExec => collectAll(a.executedPlan)(pf)
        case p if pf.isDefinedAt(p) => Seq(pf(p))
        case _ => Seq.empty
      }
    val df = SparkEntry.queries("d26_paragraph_dedup")(spark, sf)
    val exchanges = collectAll(df.queryExecution.executedPlan) {
      case e: ShuffleExchangeExec => e
    }
    assert(exchanges.nonEmpty, "expected the h-keyed winner exchange")
    exchanges.foreach { e =>
      val strings = e.output.filter(_.dataType == StringType)
      assert(strings.isEmpty,
        s"string column(s) ${strings.map(_.name).mkString(",")} cross " +
          s"a shuffle: $e")
    }
  }

  test("probe-fan candidate cuts are bounded top-k aggregates with " +
      "map-side partial merge — never a rank window over the fan") {
    // The window formulation (row_number over partitionBy(qid)) funnels
    // the probes × corpus fan into ≤ #probes reducers, each sorting the
    // whole fan. The graft_topk_by TypedImperativeAggregate keeps a
    // k-entry heap per (partition, qid) and partial-merges map-side, so
    // the exchange carries qids × k fixed-width rows. s25/s26 keep one
    // legitimate Window: the final top-3 over the ALREADY-CUT 12-row
    // candidate sets per probe, not the fan.
    import org.apache.spark.sql.catalyst.expressions.aggregate.{
      Final, Partial}
    import org.apache.spark.sql.execution.SparkPlan
    import org.apache.spark.sql.execution.adaptive.AdaptiveSparkPlanExec
    import org.apache.spark.sql.execution.aggregate.ObjectHashAggregateExec
    // plain collect treats AdaptiveSparkPlanExec as a leaf — descend
    def collectAll[T](plan: SparkPlan)(
        pf: PartialFunction[SparkPlan, T]): Seq[T] =
      plan.collect { case p => p }.flatMap {
        case a: AdaptiveSparkPlanExec => collectAll(a.executedPlan)(pf)
        case p if pf.isDefinedAt(p) => Seq(pf(p))
        case _ => Seq.empty
      }
    for ((q, maxWindows) <- Seq("s1_knn_brute" -> 0, "s2_ann_lsh" -> 0,
        "s25_binary_quant" -> 1, "s26_matryoshka" -> 1,
        "t23_bm25" -> 0, "t24_bm25_stored" -> 0,
        "s6_pq_adc" -> 0, "s10_sq8" -> 0, "s11_sq8_stored" -> 0,
        "s13_pq_stored" -> 0,
        // the hybrid paths cut every leg AND the RRF fuse with the
        // aggregate — zero windows anywhere in the plan
        "s12_hybrid_rrf" -> 0, "s15_hybrid_stored" -> 0,
        // the IVF probe family: the per-list fan (∝ corpus/nlists) is
        // cut by the aggregate, not funneled into ≤ #probes reducers
        "s4_ivf_probe" -> 0, "s8_ivfpq" -> 0, "s9_ann_recall" -> 0,
        "s17_filtered_ann" -> 0, "s19_filtered_ann_stored" -> 0,
        "s23_conj_prune" -> 0)) {
      val df = SparkEntry.queries(q)(spark, sf)
      val plan = df.queryExecution.executedPlan
      val topk = collectAll(plan) {
        case a: ObjectHashAggregateExec if a.aggregateExpressions.exists(
          _.aggregateFunction.isInstanceOf[graft.expressions.TopKBy]) => a
      }
      val modes = topk.flatMap(_.aggregateExpressions.map(_.mode)).toSet
      assert(modes.contains(Partial),
        s"$q: the candidate cut must partial-aggregate map-side " +
          s"(found modes $modes)")
      assert(modes.contains(Final),
        s"$q: the candidate cut must merge partials (found modes $modes)")
      assert(topk.forall(_.groupingExpressions.exists(
          _.references.exists(_.name == "qid"))),
        s"$q: graft_topk_by must group by the bounded qid")
      val windows = collectAll(plan) {
        case w: org.apache.spark.sql.execution.window.WindowExec => w
      }
      assert(windows.size <= maxWindows,
        s"$q: at most $maxWindows Window(s) allowed (the post-cut " +
          s"rerank), found ${windows.size}")
    }
  }
}
