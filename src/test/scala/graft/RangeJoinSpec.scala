package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.operators.RangeJoin

/** RangeJoin: result parity with the naive theta join, the bucketed plan
  * shape (equi-join, never BroadcastNestedLoopJoin), and the edge cases
  * (inclusive bounds, nulls, empty/backwards intervals, equi-key prefix).
  */
class RangeJoinSpec extends AnyFunSuite {

  lazy val spark = TestSpark.spark

  private def points(rows: Seq[(Long, Long)]) = {
    import spark.implicits._
    rows.toDF("pid", "p")
  }
  private def intervals(rows: Seq[(Long, Long, Long)]) = {
    import spark.implicits._
    rows.toDF("iid", "s", "e")
  }

  test("matches the naive theta join on random-ish data") {
    val ps = (0L until 200L).map(i => (i, i * 37 % 1000))
    val is = (0L until 40L).map(i => (i, i * 53 % 900, i * 53 % 900 + 75))
    val got = RangeJoin.pointInInterval(points(ps), intervals(is),
        "p", "s", "e", bucketWidth = 64)
      .select("pid", "iid").collect().map(r => (r.getLong(0), r.getLong(1)))
      .toSet
    val want = (for {
      (pid, p) <- ps; (iid, s, e) <- is if p >= s && p <= e
    } yield (pid, iid)).toSet
    assert(got === want)
  }

  test("bounds are inclusive on both ends") {
    val got = RangeJoin.pointInInterval(
        points(Seq((1L, 10L), (2L, 20L), (3L, 9L), (4L, 21L))),
        intervals(Seq((7L, 10L, 20L))), "p", "s", "e", 5)
      .select("pid").collect().map(_.getLong(0)).toSet
    assert(got === Set(1L, 2L))
  }

  test("null points and null/backwards intervals match nothing") {
    import spark.implicits._
    val ps = Seq((1L, Some(10L)), (2L, None))
      .toDF("pid", "p")
    val is = Seq((7L, Some(0L), Some(100L)), (8L, None, Some(50L)),
        (9L, Some(60L), Some(40L)))
      .toDF("iid", "s", "e")
    val got = RangeJoin.pointInInterval(ps, is, "p", "s", "e", 10)
      .select("pid", "iid").collect().map(r => (r.getLong(0), r.getLong(1)))
    assert(got.toSeq === Seq((1L, 7L)))
  }

  test("plan is an equi join on the bucket — no nested loop, no cartesian") {
    val plan = RangeJoin.pointInInterval(points(Seq((1L, 1L))),
        intervals(Seq((1L, 0L, 5L))), "p", "s", "e", 10)
      .queryExecution.executedPlan.toString
    assert(!plan.contains("BroadcastNestedLoopJoin"))
    assert(!plan.contains("CartesianProduct"))
  }

  test("equi-key prefix joins inside the key") {
    import spark.implicits._
    val ps = Seq((1L, 10L, "a"), (2L, 10L, "b")).toDF("pid", "p", "k")
    val is = Seq((7L, 0L, 100L, "a")).toDF("iid", "s", "e", "k")
    val got = RangeJoin.pointInInterval(ps, is, "p", "s", "e", 10,
        equiKeys = Seq("k"))
      .select("pid").collect().map(_.getLong(0)).toSeq
    assert(got === Seq(1L))
  }
}
