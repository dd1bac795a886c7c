package graft

import org.scalatest.funsuite.AnyFunSuite

import graft.queries.GraphQueries

/** Closed-form pins for the graph cores — the oracle gates prove the
  * planted corpus graph; this spec proves the arithmetic on graphs
  * small enough to hand-compute.
  */
class GraphSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark

  test("pagerank: 3-spoke star matches the hand-computed trajectory " +
      "with dangling redistribution") {
    import spark.implicits._
    // spokes 1,2,3 each point at hub 0 (out-degree 1); the HUB is
    // dangling, N = 4. r0 = 1e6 everywhere. Per round:
    //   share = (D*85) DIV (100*4) with D = hub's previous rank;
    //   hub   = 150000 + share + 3*(spoke_prev*85 DIV 100)
    //   spoke = 150000 + share
    // round 1: share = 85e6 DIV 400 = 212500
    //          hub = 150000+212500+3*850000       = 2912500
    //          spokes = 362500
    // round 2: share = (2912500*85) DIV 400       = 618906
    //          hub = 150000+618906+3*(362500*85 DIV 100) = 1693281
    //          spokes = 768906
    // round 3: share = (1693281*85) DIV 400       = 359822
    //          hub = 150000+359822+3*(768906*85 DIV 100) = 2470532
    //          spokes = 509822
    val e = Seq((1L, 0L), (2L, 0L), (3L, 0L)).toDF("u", "v")
    val got = GraphQueries.pageRank(e, rounds = 3)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(got === Map(0L -> 2470532L, 1L -> 509822L, 2L -> 509822L,
      3L -> 509822L))
    // one round stops at the first iterate
    val one = GraphQueries.pageRank(e, rounds = 1)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(one === Map(0L -> 2912500L, 1L -> 362500L, 2L -> 362500L,
      3L -> 362500L))
  }

  test("pagerank: a cycle (no dangling nodes) sits at the uniform " +
      "fixed point — redistribution adds exactly zero") {
    import spark.implicits._
    val e = Seq((0L, 1L), (1L, 2L), (2L, 0L)).toDF("u", "v")
    val got = GraphQueries.pageRank(e, rounds = 3)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(got === Map(0L -> 1000000L, 1L -> 1000000L, 2L -> 1000000L))
  }

  test("wcc doubling: labels are component minima and rounds grow as " +
      "log(diameter), not diameter") {
    import spark.implicits._
    // a 256-node path has diameter 255: plain propagation needs ~255
    // rounds; doubling converges in ~log2 + 1 (prototype: 9 at 256,
    // 11 at 1024 — pin with one round of slack each)
    val path256 = (0L until 255L).map(i => (i, i + 1)).toDF("u", "v")
    val (l256, r256) = GraphQueries.wccDoubling(path256)
    assert(l256.select("c").distinct().collect().map(_.getLong(0))
      .toSeq === Seq(0L))
    assert(r256 <= 10, s"256-path took $r256 rounds — not log-bounded")
    val path1024 = (0L until 1023L).map(i => (i, i + 1)).toDF("u", "v")
    val (l1024, r1024) = GraphQueries.wccDoubling(path1024)
    assert(l1024.filter(
      org.apache.spark.sql.functions.col("c") =!= 0L).count() === 0L)
    assert(r1024 <= 12, s"1024-path took $r1024 rounds")
    assert(r1024 - r256 <= 3,
      "4x the diameter must cost ~2 extra rounds, not 4x")
    // disconnected shapes label independently
    val two = (Seq((0L, 1L), (1L, 2L), (10L, 11L))).toDF("u", "v")
    val (lt, _) = GraphQueries.wccDoubling(two)
    val m = lt.collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(m === Map(0L -> 0L, 1L -> 0L, 2L -> 0L, 10L -> 10L,
      11L -> 10L))
  }

  test("hyperball: 2-round register merge equals the directly-hashed " +
      "ball on a hand graph") {
    // directed path 0→1→2→3: ball(0,2) = {0,1,2}, ball(2,2) = {2,3},
    // ball(3,2) = {3}. Replay the register math per member directly
    // and compare to the engine's merge rounds.
    val P = 1000000007L
    def regsOf(members: Seq[Long]): Seq[Long] = {
      val a = Array.fill(64)(0L)
      members.foreach { m =>
        val h = (m * 48271L + 11L) % P
        val b = (h % 64L).toInt
        val hi = h / 64L
        val r = if (hi == 0L) 25L
          else 25L - java.lang.Long.toBinaryString(hi).length
        if (r > a(b)) a(b) = r
      }
      a.toSeq
    }
    import spark.implicits._
    import org.apache.spark.sql.functions._
    graft.expressions.LongArrayOps.register(spark)
    val e = Seq((0L, 1L), (1L, 2L), (2L, 3L)).toDF("u", "v")
    val nodes = e.select(col("u").as("n"))
      .union(e.select(col("v").as("n"))).distinct()
    val ed = e.union(nodes.select(col("n").as("u"), col("n").as("v")))
    val bucket = (((col("n") * 48271L + 11L) % P) % 64L).cast("int")
    val rank = when(expr(s"((n * 48271 + 11) % $P) DIV 64") === 0L,
      lit(25L)).otherwise(lit(25L) -
      length(expr(s"bin(((n * 48271 + 11) % $P) DIV 64)")))
    var regs = nodes.select(col("n"),
      transform(sequence(lit(0), lit(63)),
        j => when(j === bucket, rank).otherwise(lit(0L))).as("regs"))
    for (_ <- 1 to 2) {
      regs = ed.join(regs, ed("v") === regs("n"))
        .groupBy(col("u"))
        .agg(call_function("graft_elementwise_max", col("regs"))
          .as("regs"))
        .select(col("u").as("n"), col("regs"))
    }
    val got = regs.collect()
      .map(r => r.getLong(0) -> r.getSeq[Long](1)).toMap
    assert(got(0L) === regsOf(Seq(0L, 1L, 2L)))
    assert(got(1L) === regsOf(Seq(1L, 2L, 3L)))
    assert(got(2L) === regsOf(Seq(2L, 3L)))
    assert(got(3L) === regsOf(Seq(3L)))
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
