package graft

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.plans.RangeJoinRewrite

/** The optimizer rule: a bare range-predicate join rewrites to a bucketed
  * equi-join (no BroadcastNestedLoopJoin) with identical results — and the
  * rule stays dormant without its conf, leaves equi-joins alone, and
  * preserves null/backwards-interval semantics.
  */
class RangeJoinRewriteSpec extends AnyFunSuite {

  lazy val spark = TestSpark.spark

  private def withRule[T](width: Long)(body: => T): T = {
    spark.experimental.extraOptimizations ++= Seq(new RangeJoinRewrite)
    spark.conf.set(RangeJoinRewrite.WidthConf, width.toString)
    try body
    finally {
      spark.conf.unset(RangeJoinRewrite.WidthConf)
      spark.experimental.extraOptimizations =
        spark.experimental.extraOptimizations
          .filterNot(_.isInstanceOf[RangeJoinRewrite])
    }
  }

  private def points: DataFrame = {
    import spark.implicits._
    (0L until 500L).map(i => (i, i * 13 % 1000)).toDF("pid", "p")
  }
  private def intervals: DataFrame = {
    import spark.implicits._
    (0L until 50L).map(i => (i, i * 19 % 900, i * 19 % 900 + 60))
      .toDF("iid", "s", "e")
  }

  private def joined: DataFrame =
    points.join(intervals, col("p") >= col("s") && col("p") <= col("e"))

  test("rewrites the nested-loop plan into a bucketed equi-join, same result") {
    val baseline = joined.select("pid", "iid").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    val basePlan = joined.queryExecution.executedPlan.toString
    assert(basePlan.contains("BroadcastNestedLoopJoin"))
    withRule(64) {
      val rewritten = joined
      val plan = rewritten.queryExecution.executedPlan.toString
      assert(!plan.contains("BroadcastNestedLoopJoin"), plan)
      val got = rewritten.select("pid", "iid").collect()
        .map(r => (r.getLong(0), r.getLong(1))).toSet
      assert(got === baseline)
    }
  }

  test("comparison orientation doesn't matter (s <= p && e >= p)") {
    withRule(64) {
      val q = points.join(intervals,
        col("s") <= col("p") && col("e") >= col("p"))
      assert(!q.queryExecution.executedPlan.toString
        .contains("BroadcastNestedLoopJoin"))
      assert(q.count() === joined.count())
    }
  }

  test("null points/bounds and backwards intervals still match nothing") {
    import spark.implicits._
    val ps = Seq((1L, Some(10L)), (2L, None)).toDF("pid", "p")
    val is = Seq((7L, Some(0L), Some(100L)), (8L, None, Some(50L)),
      (9L, Some(60L), Some(40L))).toDF("iid", "s", "e")
    val q = ps.join(is, col("p") >= col("s") && col("p") <= col("e"))
    val want = q.select("pid", "iid").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSeq
    withRule(16) {
      val got = ps.join(is, col("p") >= col("s") && col("p") <= col("e"))
        .select("pid", "iid").collect()
        .map(r => (r.getLong(0), r.getLong(1))).toSeq
      assert(got === want)
      assert(got === Seq((1L, 7L)))
    }
  }

  test("negative values bucket by floor division, not truncation") {
    import spark.implicits._
    val ps = Seq((1L, -5L), (2L, -64L), (3L, 0L)).toDF("pid", "p")
    val is = Seq((7L, -70L, -1L)).toDF("iid", "s", "e")
    withRule(64) {
      val got = ps.join(is, col("p") >= col("s") && col("p") <= col("e"))
        .select("pid").collect().map(_.getLong(0)).toSet
      assert(got === Set(1L, 2L))
    }
  }

  test("dormant without the conf; equi-joins and extra conjuncts untouched") {
    spark.experimental.extraOptimizations ++= Seq(new RangeJoinRewrite)
    try {
      // no conf → BNLJ stays
      assert(joined.queryExecution.executedPlan.toString
        .contains("BroadcastNestedLoopJoin"))
    } finally {
      spark.experimental.extraOptimizations =
        spark.experimental.extraOptimizations
          .filterNot(_.isInstanceOf[RangeJoinRewrite])
    }
    withRule(64) {
      // an extra equi conjunct → Spark already plans an equi-join; the
      // rule must not touch it (three conjuncts)
      import spark.implicits._
      val ps = Seq((1L, 10L, 5L)).toDF("pid", "p", "k")
      val is = Seq((7L, 0L, 100L, 5L)).toDF("iid", "s", "e", "k2")
      val q = ps.join(is, col("k") === col("k2") &&
        col("p") >= col("s") && col("p") <= col("e"))
      val plan = q.queryExecution.optimizedPlan.toString
      assert(!plan.contains("_graft_pb"), plan)
      assert(q.count() === 1)
    }
  }

  test("q28 restores extraOptimizations after running") {
    val before = spark.experimental.extraOptimizations
    SparkEntry.queries("q28_range_rewrite")(
      spark, "/root/testdata/sf0.001").collect()
    assert(spark.experimental.extraOptimizations == before,
      "the rewrite rule must not outlive the query that installed it")
  }
}
