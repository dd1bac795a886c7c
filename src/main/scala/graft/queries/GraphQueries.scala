package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.Checkpoints.StageOps
import graft.Tables

/** Graph operators over edge tables — the link-structure half of a
  * web-scale curation pipeline: crawl-frontier prioritization wants
  * authority scores (PageRank), spam/community detection wants local
  * density (triangles). Both are expressed as ordinary DataFrame
  * join-aggregate rounds, so Catalyst/AQE handle physical strategy,
  * and both keep the ONE property that matters at 10^11 edges: per
  * round, work and shuffle volume are proportional to the edge list,
  * never to node-pairs.
  *
  * Determinism: all arithmetic is integer fixed-point (scale 10^6,
  * damping 85/100 as integer div) so DuckDB replays bit-exactly —
  * the same reason the BM25/DSIR families avoid libm.
  */
object GraphQueries {

  /** The planted link graph: 30 nodes, up to 7 out-strides per node
    * from the documents table's ids (u = id mod 30 → v = (u + 1 +
    * id mod 7) mod 30, self-loops dropped, distinct — 210 edges and
    * 630 triangles at sf0.01, so both gates have real structure).
    * Shared by g1/g2 and replayed verbatim by the oracles.
    */
  private def edges(s: SparkSession, dir: String): DataFrame =
    Tables.documents(s, dir).filter(col("doc_id") < 400)
      .select((col("doc_id") % 30).as("u"),
        ((col("doc_id") % 30 + 1 + col("doc_id") % 7) % 30).as("v"))
      .filter(col("u") =!= col("v"))
      .distinct()

  /** PageRank, 3 synchronous rounds of integer fixed-point power
    * iteration: r₀ = 10^6; rₜ₊₁(v) = 150000 + Σ over in-edges
    * (rₜ(u)·85) div (100·outdeg(u)) — the damped random surfer with
    * every float replaced by exact integer arithmetic (dangling mass
    * is dropped, the standard simplification, replayed identically by
    * the oracle). Scale shape: each round is one join of the rank
    * vector onto the edge list (shuffle ∝ edges) plus one aggregate by
    * destination (shuffle ∝ nodes) — the canonical Pregel-on-DataFrame
    * round; edges carry their out-degree from a single precomputed
    * join, the rank vector is the small side every round, and rounds
    * are a fixed unrolled count so the plan stays a static DAG (no
    * driver-side convergence loop reading results back).
    */
  def g1PageRank(s: SparkSession, dir: String): DataFrame =
    pageRank(edges(s, dir), rounds = 3)

  /** The reusable core: integer-fixed-point PageRank over any (u, v)
    * edge DataFrame. `GraphSpec` pins it against a hand-computed star.
    */
  def pageRank(e: DataFrame, rounds: Int): DataFrame = {
    val od = e.groupBy(col("u")).agg(count(lit(1)).as("d"))
    // one edge-list annotation, reused every round
    val ed = e.join(od, "u").select(col("u"), col("v"), col("d"))
      .staged()
    val nodes = ed.select(col("u").as("n"))
      .union(ed.select(col("v").as("n"))).distinct()
    var ranks = nodes.select(col("n"), lit(1000000L).as("r"))
    for (_ <- 1 to rounds) {
      val contrib = ed.join(ranks, ed("u") === ranks("n"))
        .groupBy(col("v"))
        .agg(sum(expr("(r * 85) DIV (100 * d)")).as("c"))
      ranks = nodes.join(contrib, nodes("n") === contrib("v"), "left")
        .select(col("n"), (lit(150000L) + coalesce(col("c"), lit(0L)))
          .as("r"))
    }
    ranks.select(col("n").as("node"), col("r").as("rank"))
      .orderBy(col("node"))
  }

  val g1Oracle: String =
    """WITH e AS (SELECT DISTINCT doc_id % 30 AS u,
      |    (doc_id % 30 + 1 + doc_id % 7) % 30 AS v
      |  FROM documents
      |  WHERE doc_id < 400
      |    AND doc_id % 30 != (doc_id % 30 + 1 + doc_id % 7) % 30),
      |nodes AS (SELECT u AS n FROM e UNION SELECT v FROM e),
      |od AS (SELECT u, COUNT(*) AS d FROM e GROUP BY 1),
      |r0 AS (SELECT n, CAST(1000000 AS BIGINT) AS r FROM nodes),
      |c1 AS (SELECT e.v AS n, SUM((r0.r * 85) // (100 * od.d)) AS c
      |  FROM e JOIN r0 ON e.u = r0.n JOIN od ON od.u = e.u GROUP BY 1),
      |i1 AS (SELECT nodes.n,
      |    CAST(150000 + COALESCE(c1.c, 0) AS BIGINT) AS r
      |  FROM nodes LEFT JOIN c1 ON nodes.n = c1.n),
      |c2 AS (SELECT e.v AS n, SUM((i1.r * 85) // (100 * od.d)) AS c
      |  FROM e JOIN i1 ON e.u = i1.n JOIN od ON od.u = e.u GROUP BY 1),
      |i2 AS (SELECT nodes.n,
      |    CAST(150000 + COALESCE(c2.c, 0) AS BIGINT) AS r
      |  FROM nodes LEFT JOIN c2 ON nodes.n = c2.n),
      |c3 AS (SELECT e.v AS n, SUM((i2.r * 85) // (100 * od.d)) AS c
      |  FROM e JOIN i2 ON e.u = i2.n JOIN od ON od.u = e.u GROUP BY 1),
      |i3 AS (SELECT nodes.n,
      |    CAST(150000 + COALESCE(c3.c, 0) AS BIGINT) AS r
      |  FROM nodes LEFT JOIN c3 ON nodes.n = c3.n)
      |SELECT n AS node, r AS rank FROM i3 ORDER BY node""".stripMargin

  /** Triangle participation counts via degree-ordered orientation —
    * the standard trick that makes exact triangle counting feasible at
    * scale: orient every undirected edge from its lower-(degree, id)
    * endpoint to the higher, making the graph acyclic with out-degrees
    * bounded by O(√m); triangles are then wedges (a→b, b→c) closed by
    * an oriented edge (a→c), each triangle found EXACTLY once, and the
    * wedge join's fan-out is the oriented out-degree, never the raw
    * degree of a hub. Two self-joins of the oriented edge list — at
    * 10^11 edges this is the difference between O(m^1.5) and the
    * unusable raw-wedge join on celebrity nodes. Output: per-node
    * triangle participation (each triangle credits all three corners).
    */
  def g2TriangleCount(s: SparkSession, dir: String): DataFrame =
    triangleParticipation(edges(s, dir))

  /** The reusable core: per-node triangle participation over any
    * (u, v) edge DataFrame (undirected semantics — each unordered pair
    * is one edge). `GraphSpec` pins it against K4 / a triangle-free
    * star.
    */
  def triangleParticipation(e: DataFrame): DataFrame = {
    val und = e
      .select(least(col("u"), col("v")).as("p"),
        greatest(col("u"), col("v")).as("q"))
      .distinct()
    val deg = und.select(col("p").as("x"))
      .union(und.select(col("q").as("x")))
      .groupBy(col("x")).agg(count(lit(1)).as("dg"))
    val o = und
      .join(deg.withColumnRenamed("x", "p").withColumnRenamed("dg", "dp"),
        "p")
      .join(deg.withColumnRenamed("x", "q").withColumnRenamed("dg", "dq"),
        "q")
      .select(
        when(col("dp") < col("dq") ||
            (col("dp") === col("dq") && col("p") < col("q")),
          col("p")).otherwise(col("q")).as("a"),
        when(col("dp") < col("dq") ||
            (col("dp") === col("dq") && col("p") < col("q")),
          col("q")).otherwise(col("p")).as("b"))
      .staged()
    val tri = o.as("e1")
      .join(o.as("e2"), col("e1.b") === col("e2.a"))
      .join(o.as("e3"),
        col("e3.a") === col("e1.a") && col("e3.b") === col("e2.b"))
      .select(col("e1.a").as("x"), col("e1.b").as("y"),
        col("e2.b").as("z"))
    tri.select(explode(array(col("x"), col("y"), col("z"))).as("node"))
      .groupBy(col("node")).agg(count(lit(1)).as("tri_n"))
      .orderBy(col("node"))
  }

  val g2Oracle: String =
    """WITH e AS (SELECT DISTINCT doc_id % 30 AS u,
      |    (doc_id % 30 + 1 + doc_id % 7) % 30 AS v
      |  FROM documents
      |  WHERE doc_id < 400
      |    AND doc_id % 30 != (doc_id % 30 + 1 + doc_id % 7) % 30),
      |und AS (SELECT DISTINCT LEAST(u, v) AS p, GREATEST(u, v) AS q
      |  FROM e),
      |deg AS (SELECT x, COUNT(*) AS dg FROM (
      |    SELECT p AS x FROM und UNION ALL SELECT q FROM und)
      |  GROUP BY 1),
      |o AS (SELECT CASE WHEN dp.dg < dq.dg
      |      OR (dp.dg = dq.dg AND p < q) THEN p ELSE q END AS a,
      |    CASE WHEN dp.dg < dq.dg
      |      OR (dp.dg = dq.dg AND p < q) THEN q ELSE p END AS b
      |  FROM und JOIN deg dp ON dp.x = p JOIN deg dq ON dq.x = q),
      |tri AS (SELECT e1.a AS x, e1.b AS y, e2.b AS z
      |  FROM o e1 JOIN o e2 ON e1.b = e2.a
      |  JOIN o e3 ON e3.a = e1.a AND e3.b = e2.b)
      |SELECT node, COUNT(*) AS tri_n FROM (
      |  SELECT x AS node FROM tri
      |  UNION ALL SELECT y FROM tri UNION ALL SELECT z FROM tri)
      |GROUP BY 1 ORDER BY node""".stripMargin

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "g1_pagerank" -> (g1PageRank _),
    "g2_triangles" -> (g2TriangleCount _))

  val oracle: Map[String, String] = Map(
    "g1_pagerank" -> g1Oracle,
    "g2_triangles" -> g2Oracle)
}
