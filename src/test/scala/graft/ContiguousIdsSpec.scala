package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.operators.ContiguousIds

/** ContiguousIds: equality with the global ROW_NUMBER it replaces, and the
  * plan property that justifies it — the order shuffle is range
  * partitioning across tasks, never the single-partition exchange a global
  * window would plan.
  */
class ContiguousIdsSpec extends AnyFunSuite {

  lazy val spark = TestSpark.spark

  test("ids are dense 0..n-1 in order-column order") {
    import spark.implicits._
    val df = Seq(30L, 7L, 55L, 1L, 999L, 42L, 13L)
      .toDF("k").repartition(3)
    val got = ContiguousIds(df, "k", "id")
      .orderBy("k").as[(Long, Long)].collect()
    assert(got.map(_._2).toSeq === (0L until 7L))
    assert(got.map(_._1).toSeq === Seq(1L, 7L, 13L, 30L, 42L, 55L, 999L))
  }

  test("matches ROW_NUMBER() - 1 on a larger shuffled input") {
    import spark.implicits._
    val ks = scala.util.Random.shuffle((0L until 5000L).map(_ * 3 + 1)).toSeq
    val df = ks.toDF("k").repartition(8)
    val got = ContiguousIds(df, "k", "id")
      .select(sum(col("id") * col("k")).cast("long")).as[Long].head()
    val want = ks.sorted.zipWithIndex.map { case (k, i) => k * i }.sum
    assert(got === want)
  }

  test("extra columns ride along untouched") {
    import spark.implicits._
    val df = Seq((5L, "e"), (2L, "b"), (9L, "x")).toDF("k", "v")
    val got = ContiguousIds(df, "k", "id")
      .orderBy("id").as[(Long, String, Long)].collect().toSeq
    assert(got === Seq((2L, "b", 0L), (5L, "e", 1L), (9L, "x", 2L)))
  }

  test("plan range-partitions the sort — no single-partition funnel") {
    import spark.implicits._
    val df = (0L until 100L).toDF("k")
    val sorted = df.repartitionByRange(col("k")).sortWithinPartitions("k")
    val plan = sorted.queryExecution.executedPlan.toString.toLowerCase
    assert(plan.contains("rangepartitioning"))
    assert(!plan.contains("singlepartition"))
    // while the window formulation it replaces DOES funnel
    val windowPlan = df.withColumn("id",
        row_number().over(org.apache.spark.sql.expressions.Window
          .orderBy(col("k"))))
      .queryExecution.executedPlan.toString.toLowerCase
    assert(windowPlan.contains("singlepartition"))
  }

  test("reserved-name collision refuses") {
    import spark.implicits._
    assertThrows[IllegalArgumentException] {
      ContiguousIds(Seq(1L).toDF("id"), "id", "id")
    }
  }
}
