package graft

import org.scalatest.funsuite.AnyFunSuite

import graft.queries.GraphQueries

/** Closed-form pins for the graph cores — the oracle gates prove the
  * planted corpus graph; this spec proves the arithmetic on graphs
  * small enough to hand-compute.
  */
class GraphSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark

  test("pagerank: 3-spoke star matches the hand-computed fixed point") {
    import spark.implicits._
    // spokes 1,2,3 each point at hub 0; out-degree 1 each.
    // r0 = 1e6 everywhere.
    // round 1: hub = 150000 + 3*(1000000*85 DIV 100) = 2700000,
    //          spokes = 150000 (no in-edges)
    // round 2+: hub = 150000 + 3*(150000*85 DIV 100) = 532500 — stable
    val e = Seq((1L, 0L), (2L, 0L), (3L, 0L)).toDF("u", "v")
    val got = GraphQueries.pageRank(e, rounds = 3)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(got === Map(0L -> 532500L, 1L -> 150000L, 2L -> 150000L,
      3L -> 150000L))
    // one round stops at the first iterate
    val one = GraphQueries.pageRank(e, rounds = 1)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(one(0L) === 2700000L)
  }

  test("triangles: K4 gives every node 3; a star has none; duplicate " +
      "and reversed edges don't double-count") {
    import spark.implicits._
    val k4 = (for {
      a <- 0L to 3L; b <- 0L to 3L if a < b
    } yield (a, b)).toDF("u", "v")
    val got = GraphQueries.triangleParticipation(k4)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(got === Map(0L -> 3L, 1L -> 3L, 2L -> 3L, 3L -> 3L))
    // same graph with reversed duplicates: undirected semantics hold
    val noisy = k4.unionByName(k4.selectExpr("v AS u", "u AS v"))
    val got2 = GraphQueries.triangleParticipation(noisy)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(got2 === got)
    val star = Seq((1L, 0L), (2L, 0L), (3L, 0L)).toDF("u", "v")
    assert(GraphQueries.triangleParticipation(star).count() === 0)
  }
}
