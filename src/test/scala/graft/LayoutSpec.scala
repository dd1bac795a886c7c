package graft

import java.io.File

import org.apache.spark.sql.execution.{FileSourceScanExec, SparkPlan}
import org.apache.spark.sql.execution.adaptive.AdaptiveSparkPlanExec
import org.apache.spark.sql.execution.exchange.ShuffleExchangeExec
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.queries.OpsQueries

/** Storage-layout guarantees: bucketed joins really skip the shuffle,
  * partitioned reads really prune directories, and compaction really
  * collapses the file count — asserted on the physical plan and the
  * filesystem, not inferred from results.
  */
class LayoutSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  val sf = "/root/testdata/sf0.001"

  /** AQE wraps the plan in AdaptiveSparkPlanExec, whose `collect` doesn't
    * descend into the inner plan — unwrap before asserting structure.
    */
  private def unwrap(p: SparkPlan): SparkPlan = p match {
    case a: AdaptiveSparkPlanExec => a.executedPlan
    case p => p
  }

  private def parquetFiles(dir: String): Array[File] =
    new File(dir).listFiles().filter(f =>
      f.isFile && f.getName.endsWith(".parquet"))

  test("io10: bucketed join plans with zero shuffle exchanges") {
    val prev = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try {
      val df = OpsQueries.io10BucketedJoin(spark, sf)
      val plan = unwrap(df.queryExecution.executedPlan)
      val joins = plan.collect { case j if j.nodeName.contains("SortMergeJoin") => j }
      assert(joins.nonEmpty, plan.toString)
      // no exchange anywhere below the join: bucket layout satisfies the
      // join's required distribution on both sides
      val exchangesBelowJoin = joins.head.collect {
        case e: ShuffleExchangeExec => e
      }
      assert(exchangesBelowJoin.isEmpty,
        "bucketed tables must join without a shuffle:\n" + plan)
      assert(df.count() > 0)
    } finally spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prev)
  }

  test("io11: partition filter prunes to a single directory") {
    val df = OpsQueries.io11PartitionPrune(spark, sf)
    val scan = unwrap(df.queryExecution.executedPlan).collect {
      case s: FileSourceScanExec => s
    }.head
    assert(scan.partitionFilters.nonEmpty,
      "event_type = 'click' must be a partition filter, not a data filter")
    val listing = scan.selectedPartitions
    assert(listing.partitionCount === 1,
      s"scan must prune to exactly one partition, got ${listing.partitionCount}")
    val selected = listing.toPartitionArray.map(_.urlEncodedPath)
    assert(selected.nonEmpty && selected.forall(_.contains("event_type=click")),
      s"scan must enumerate only the matching partition directory: " +
        selected.mkString(", "))
    assert(df.count() === 1)
  }

  test("io12: compaction collapses 64 files to the planned count, content intact") {
    val tmp = System.getProperty("java.io.tmpdir")
    val result = OpsQueries.io12Compaction(spark, sf).collect()
    val srcFiles = parquetFiles(tmp + "/graft_io12_src").length
    val outFiles = parquetFiles(tmp + "/graft_io12_out").length
    assert(srcFiles === 64)
    val (planned, bytes) = graft.io.Compaction.plan(
      spark, tmp + "/graft_io12_src", 8L * 1024 * 1024)
    assert(outFiles === planned)
    assert(outFiles < srcFiles)
    assert(bytes > 0)
    // row-exact preservation: same census as reading the source directly
    val direct = spark.read.parquet(tmp + "/graft_io12_src")
      .groupBy(col("l_returnflag"))
      .agg(count(lit(1)).as("n"), sum(col("l_orderkey")).as("sum_okey"),
        sum(col("l_partkey")).as("sum_pkey"), sum(col("cents")).as("sum_cents"))
      .orderBy(col("l_returnflag")).collect()
    assert(result.toSeq === direct.toSeq)
  }

  test("compaction plan: ceil division, floor of one file, bad target rejected") {
    val tmp = System.getProperty("java.io.tmpdir")
    OpsQueries.io12Compaction(spark, sf).collect()
    val (one, bytes) = graft.io.Compaction.plan(
      spark, tmp + "/graft_io12_src", Long.MaxValue)
    assert(one === 1)
    val (n, _) = graft.io.Compaction.plan(
      spark, tmp + "/graft_io12_src", bytes / 4)
    assert(n === 5 || n === 4, s"ceil(bytes/(bytes/4)) expected ~4-5, got $n")
    intercept[IllegalArgumentException] {
      graft.io.Compaction.plan(spark, tmp + "/graft_io12_src", 0)
    }
  }
}
