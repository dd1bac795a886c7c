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

  test("intervalOverlap matches the naive theta join across bucket " +
      "widths, with no duplicate pairs") {
    import spark.implicits._
    val ls = (0L until 80L).map(i => (i, i * 41 % 700, i * 41 % 700 + i % 90))
    val rs = (0L until 60L).map(i => (i, i * 59 % 650, i * 59 % 650 + i % 120))
    val want = (for {
      (lid, s1, e1) <- ls; (rid, s2, e2) <- rs
      if s1 <= e2 && s2 <= e1
    } yield (lid, rid)).toSeq.sorted
    for (w <- Seq(7L, 64L, 100L, 1000L)) {
      val got = RangeJoin.intervalOverlap(
          ls.toDF("lid", "ls", "le"), rs.toDF("rid", "rs", "re"),
          "ls", "le", "rs", "re", bucketWidth = w)
        .select("lid", "rid").collect()
        .map(r => (r.getLong(0), r.getLong(1))).toSeq.sorted
      // == on sorted SEQUENCES: first-shared-bucket dedup must emit each
      // pair exactly once — a duplicate would pass a Set comparison
      assert(got == want, s"bucketWidth=$w diverged")
    }
  }

  test("intervalOverlap drops backwards intervals and plans an " +
      "equi-join, not a nested loop") {
    import spark.implicits._
    val l = Seq((1L, 10L, 20L), (2L, 30L, 25L)).toDF("lid", "ls", "le")
    val r = Seq((7L, 15L, 18L), (8L, 26L, 29L)).toDF("rid", "rs", "re")
    val q = RangeJoin.intervalOverlap(l, r, "ls", "le", "rs", "re", 8)
    assert(q.select("lid", "rid").collect()
      .map(x => (x.getLong(0), x.getLong(1))).toSet == Set((1L, 7L)))
    val plan = q.queryExecution.executedPlan.toString
    assert(!plan.contains("BroadcastNestedLoopJoin") &&
      !plan.contains("CartesianProduct"),
      "overlap pairs must meet through the bucket equi-key")
  }
}
