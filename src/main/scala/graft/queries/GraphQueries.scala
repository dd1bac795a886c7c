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
    * iteration with DANGLING-MASS REDISTRIBUTION: r₀ = 10^6;
    * rₜ₊₁(v) = 150000 + (Dₜ·85) div (100·N) + Σ over in-edges
    * (rₜ(u)·85) div (100·outdeg(u)), where Dₜ = Σ rₜ(u) over nodes
    * with NO out-edges and N = |nodes| — the damped random surfer
    * whose dangling mass teleports uniformly (on a real crawl graph
    * ~20% of pages are dangling; dropping their mass deflates every
    * rank total). Every float is exact integer arithmetic so DuckDB
    * replays bit-identically. Scale shape per round: one join of the
    * rank vector onto the edge list (shuffle ∝ edges), one aggregate
    * by destination (shuffle ∝ nodes), and ONE scalar aggregate of
    * dangling rank (the flag rides the rank vector — no extra join)
    * folded in as a broadcast 1-row term; rounds stay a fixed unrolled
    * count so the plan is a static DAG. The planted graph drops
    * out-edges of nodes 27–29 so the gate exercises real dangling
    * nodes.
    */
  def g1PageRank(s: SparkSession, dir: String): DataFrame =
    pageRank(edges(s, dir).filter(col("u") < 27), rounds = 3)

  /** The reusable core: integer-fixed-point PageRank with dangling
    * redistribution over any (u, v) edge DataFrame. `GraphSpec` pins
    * it against a hand-computed star (whose hub is dangling) and the
    * uniform fixed point of a cycle.
    */
  def pageRank(e: DataFrame, rounds: Int): DataFrame = {
    val od = e.groupBy(col("u")).agg(count(lit(1)).as("d"))
    // one edge-list annotation, reused every round
    val ed = e.join(od, "u").select(col("u"), col("v"), col("d"))
      .staged()
    // nodes annotated once with the dangling flag: it rides the rank
    // vector through every round, so Dₜ is a filter + 1-row aggregate
    val nodes = ed.select(col("u").as("n"))
      .union(ed.select(col("v").as("n"))).distinct()
      .join(ed.select(col("u").as("n")).distinct()
        .withColumn("has_out", lit(true)), Seq("n"), "left")
      .select(col("n"), col("has_out").isNull.as("dang"))
      .staged()
    val nN = nodes.agg(count(lit(1)).as("nn"))
    var ranks = nodes.select(col("n"), col("dang"), lit(1000000L).as("r"))
    for (_ <- 1 to rounds) {
      val dm = ranks.filter(col("dang"))
        .agg(coalesce(sum(col("r")), lit(0L)).as("dm"))
      val contrib = ed.join(ranks, ed("u") === ranks("n"))
        .groupBy(col("v"))
        .agg(sum(expr("(r * 85) DIV (100 * d)")).as("c"))
      ranks = nodes.join(contrib, nodes("n") === contrib("v"), "left")
        .crossJoin(broadcast(dm))
        .crossJoin(broadcast(nN))
        .select(col("n"), col("dang"),
          (lit(150000L) + expr("(dm * 85) DIV (100 * nn)") +
            coalesce(col("c"), lit(0L))).as("r"))
    }
    ranks.select(col("n").as("node"), col("r").as("rank"))
      .orderBy(col("node"))
  }

  val g1Oracle: String =
    """WITH e AS (SELECT DISTINCT doc_id % 30 AS u,
      |    (doc_id % 30 + 1 + doc_id % 7) % 30 AS v
      |  FROM documents
      |  WHERE doc_id < 400
      |    AND doc_id % 30 != (doc_id % 30 + 1 + doc_id % 7) % 30
      |    AND doc_id % 30 < 27),
      |nodes AS (SELECT u AS n FROM e UNION SELECT v FROM e),
      |nn AS (SELECT COUNT(*) AS c FROM nodes),
      |od AS (SELECT u, COUNT(*) AS d FROM e GROUP BY 1),
      |r0 AS (SELECT n, CAST(1000000 AS BIGINT) AS r FROM nodes),
      |d1 AS (SELECT COALESCE(SUM(r), 0) AS dm FROM r0
      |  WHERE n NOT IN (SELECT u FROM e)),
      |c1 AS (SELECT e.v AS n, SUM((r0.r * 85) // (100 * od.d)) AS c
      |  FROM e JOIN r0 ON e.u = r0.n JOIN od ON od.u = e.u GROUP BY 1),
      |i1 AS (SELECT nodes.n, CAST(150000
      |      + (d1.dm * 85) // (100 * nn.c)
      |      + COALESCE(c1.c, 0) AS BIGINT) AS r
      |  FROM nodes LEFT JOIN c1 ON nodes.n = c1.n
      |  CROSS JOIN d1 CROSS JOIN nn),
      |d2 AS (SELECT COALESCE(SUM(r), 0) AS dm FROM i1
      |  WHERE n NOT IN (SELECT u FROM e)),
      |c2 AS (SELECT e.v AS n, SUM((i1.r * 85) // (100 * od.d)) AS c
      |  FROM e JOIN i1 ON e.u = i1.n JOIN od ON od.u = e.u GROUP BY 1),
      |i2 AS (SELECT nodes.n, CAST(150000
      |      + (d2.dm * 85) // (100 * nn.c)
      |      + COALESCE(c2.c, 0) AS BIGINT) AS r
      |  FROM nodes LEFT JOIN c2 ON nodes.n = c2.n
      |  CROSS JOIN d2 CROSS JOIN nn),
      |d3 AS (SELECT COALESCE(SUM(r), 0) AS dm FROM i2
      |  WHERE n NOT IN (SELECT u FROM e)),
      |c3 AS (SELECT e.v AS n, SUM((i2.r * 85) // (100 * od.d)) AS c
      |  FROM e JOIN i2 ON e.u = i2.n JOIN od ON od.u = e.u GROUP BY 1),
      |i3 AS (SELECT nodes.n, CAST(150000
      |      + (d3.dm * 85) // (100 * nn.c)
      |      + COALESCE(c3.c, 0) AS BIGINT) AS r
      |  FROM nodes LEFT JOIN c3 ON nodes.n = c3.n
      |  CROSS JOIN d3 CROSS JOIN nn)
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

  /** Weakly-connected components for LONG-DIAMETER graphs (crawl/link
    * graphs with chain structure) via min-label propagation PLUS
    * pointer jumping — each round first takes the min label over the
    * closed neighborhood, then rewrites every label through the label
    * OF its label (`c ← c(c)`), so label reach doubles per round and
    * convergence is O(log diameter) rounds (measured: 9 rounds on a
    * 256-path, 11 on a 1024-path — `GraphSpec` pins the log growth)
    * instead of the ∝ diameter of plain propagation
    * ([[graft.queries.DedupQueries]]'s `componentLabels`, which is the
    * right tool for ~10-diameter similarity graphs but not a million-
    * hop chain). Per round: one edge-list join (shuffle ∝ edges), one
    * min-aggregate and one self-join of the label table (shuffle ∝
    * nodes); lineage is truncated per round and the convergence check
    * is a LIMIT-1 count, so driver data stays O(1). Fails loudly at
    * `maxRounds` rather than returning partial labels.
    */
  def wccDoubling(e: DataFrame, maxRounds: Int = 40): (DataFrame, Int) = {
    // symmetrized edges PLUS a self-loop per node: the per-round min is
    // then over the CLOSED neighborhood through one join-aggregate — no
    // per-round union (a staged frame inside a Union trips Union's
    // constraint rewrite against LogicalRDD's origin constraints)
    val sym = e.select(col("u").as("u"), col("v").as("v"))
      .union(e.select(col("v").as("u"), col("u").as("v")))
    val und = sym
      .union(sym.select(col("u").as("u"), col("u").as("v")))
      .distinct().staged()
    var labels = und.select(col("u").as("n")).distinct()
      .select(col("n"), col("n").as("c")).staged()
    var rounds = 0
    var converged = false
    while (!converged && rounds < maxRounds) {
      rounds += 1
      val prop = und.join(labels, und("u") === labels("n"))
        .groupBy(col("v")).agg(min(col("c")).as("c"))
        .select(col("v").as("n"), col("c"))
        .staged() // materialized once: both sides of the jump self-join
      // pointer jump: labels are node ids, so every c has a row in prop
      val jumped = prop.as("a").join(prop.as("b"),
          col("a.c") === col("b.n"))
        .select(col("a.n").as("n"), col("b.c").as("c"))
        .staged()
      val changed = jumped.as("x").join(labels.as("y"),
          col("x.n") === col("y.n"))
        .filter(col("x.c") =!= col("y.c")).limit(1).count()
      labels = jumped
      converged = changed == 0L
    }
    require(converged,
      s"wccDoubling: no convergence after $maxRounds rounds — " +
        "raise maxRounds (diameter > 2^maxRounds is implausible; " +
        "suspect a data problem)")
    (labels, rounds)
  }

  /** The planted WCC graph: three 40-node paths (0–39, 40–79, 80–119:
    * real multi-hop diameter), a 30-leaf star at hub 200, and two
    * isolated edges — six components of three shapes, replayed by a
    * DuckDB recursive CTE.
    */
  def g3Wcc(s: SparkSession, dir: String): DataFrame = {
    val d = Tables.documents(s, dir)
    val path = d.filter(col("doc_id") < 119 && col("doc_id") % 40 =!= 39)
      .select(col("doc_id").as("u"), (col("doc_id") + 1).as("v"))
    val star = d.filter(col("doc_id") < 100)
      .select(lit(200L).as("u"), (lit(201L) + col("doc_id") % 30).as("v"))
    val pairs = d.filter(col("doc_id") < 2)
      .select((lit(300L) + col("doc_id") * 2).as("u"),
        (lit(301L) + col("doc_id") * 2).as("v"))
    val edges = path.union(star).union(pairs).distinct()
    val (labels, _) = wccDoubling(edges)
    labels.groupBy(col("c").as("comp"))
      .agg(count(lit(1)).as("n_nodes"), sum(col("n")).as("checksum"))
      .orderBy(col("comp"))
  }

  val g3Oracle: String =
    """WITH RECURSIVE base AS (
      |  SELECT doc_id AS u, doc_id + 1 AS v FROM documents
      |    WHERE doc_id < 119 AND doc_id % 40 != 39
      |  UNION
      |  SELECT 200, 201 + doc_id % 30 FROM documents WHERE doc_id < 100
      |  UNION
      |  SELECT 300 + doc_id * 2, 301 + doc_id * 2 FROM documents
      |    WHERE doc_id < 2),
      |e AS (SELECT u, v FROM base UNION SELECT v, u FROM base),
      |nodes AS (SELECT DISTINCT u AS n FROM e),
      |reach(n, c) AS (
      |  SELECT n, n FROM nodes
      |  UNION
      |  SELECT e.v, reach.c FROM reach JOIN e ON e.u = reach.n),
      |lab AS (SELECT n, MIN(c) AS comp FROM reach GROUP BY n)
      |SELECT comp, COUNT(*) AS n_nodes, CAST(SUM(n) AS BIGINT) AS checksum
      |FROM lab GROUP BY comp ORDER BY comp""".stripMargin

  /** HyperBall-style 2-hop REACH estimation (Boldi–Vigna's HyperANF /
    * HyperBall: the canonical big-graph neighborhood-function
    * algorithm) — "how many pages does each page reach within k
    * clicks" over a 10^11-edge crawl graph, where enumerating balls is
    * |ball|-quadratic and the sketch route is k rounds of
    * register-merge, shuffle ∝ edges per round:
    *
    *   regs₀(v) = HLL registers of {v};
    *   regsₜ(v) = elementwise-max over the CLOSED out-neighborhood of
    *              regsₜ₋₁ (self-loops make that one join-aggregate,
    *              the g3 trick),
    *
    * so regsₖ(v) is EXACTLY the register array of ball(v, k) — per-
    * register max is associative/commutative/idempotent, the mergeable-
    * sketch property (d11's union argument on a graph). Register math
    * is the d11 integer pipeline (affine hash mod P, bucket = h mod 64,
    * rank via `bin()`), so the gate's contract is sharp: the ENGINE
    * never materializes a ball (two unrolled merge rounds, static DAG);
    * the ORACLE enumerates every ball(v, 2) by brute force and hashes
    * its members directly — equal signatures prove merge ≡ union. The
    * exact ball size rides alongside (the d11 exact-beside-sketch
    * shape); the float estimate stays out of the oracle (bias
    * constants are not replayable folklore).
    */
  def g4HyperBall(s: SparkSession, dir: String): DataFrame = {
    graft.expressions.LongArrayOps.register(s)
    val P = 1000000007L
    val e = edges(s, dir)
    val nodes = e.select(col("u").as("n"))
      .union(e.select(col("v").as("n"))).distinct()
    // closed neighborhood via self-loops: one join-aggregate per round
    val ed = e.union(nodes.select(col("n").as("u"), col("n").as("v")))
      .distinct().staged()
    val h = (col("n") * 48271L + 11L) % P
    val bucket = (h % 64L).cast("int")
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
    // exact |ball(v,2)| — the verification term, ∝ 2-hop pairs (the
    // quantity the sketch exists to avoid at scale)
    val hop2 = ed.as("a").join(ed.as("b"), col("a.v") === col("b.u"))
      .select(col("a.u").as("n"), col("b.v").as("m")).distinct()
    val exact = hop2.groupBy(col("n")).agg(count(lit(1)).as("n_exact"))
    regs.join(exact, Seq("n"))
      .select(col("n").as("node"), col("n_exact"),
        concat_ws(":", transform(col("regs"), _.cast("string")))
          .as("sig"))
      .orderBy(col("node"))
  }

  val g4Oracle: String =
    """WITH e AS (SELECT DISTINCT doc_id % 30 AS u,
      |    (doc_id % 30 + 1 + doc_id % 7) % 30 AS v
      |  FROM documents
      |  WHERE doc_id < 400
      |    AND doc_id % 30 != (doc_id % 30 + 1 + doc_id % 7) % 30),
      |nodes AS (SELECT u AS n FROM e UNION SELECT v FROM e),
      |se AS (SELECT u, v FROM e UNION SELECT n, n FROM nodes),
      |ball AS (SELECT DISTINCT a.u AS n, b.v AS m
      |  FROM se a JOIN se b ON a.v = b.u),
      |hx AS (SELECT n, m, (m * 48271 + 11) % 1000000007 AS h FROM ball),
      |rk AS (SELECT n, h % 64 AS b,
      |    CASE WHEN h // 64 = 0 THEN 25
      |      ELSE 25 - length(bin(h // 64)) END AS r
      |  FROM hx),
      |regs AS (SELECT n, b, MAX(r) mr FROM rk GROUP BY 1, 2),
      |dense AS (SELECT nodes.n, j.j, COALESCE(regs.mr, 0) v
      |  FROM nodes CROSS JOIN range(0, 64) j(j)
      |  LEFT JOIN regs ON regs.n = nodes.n AND regs.b = j.j),
      |sig AS (SELECT n, string_agg(CAST(v AS VARCHAR), ':' ORDER BY j) sig
      |  FROM dense GROUP BY n),
      |ex AS (SELECT n, CAST(COUNT(*) AS BIGINT) n_exact
      |  FROM ball GROUP BY n)
      |SELECT ex.n AS node, ex.n_exact, sig.sig
      |FROM ex JOIN sig USING(n) ORDER BY node""".stripMargin

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "g1_pagerank" -> (g1PageRank _),
    "g2_triangles" -> (g2TriangleCount _),
    "g3_wcc" -> (g3Wcc _),
    "g4_hyperball" -> (g4HyperBall _))

  val oracle: Map[String, String] = Map(
    "g1_pagerank" -> g1Oracle,
    "g2_triangles" -> g2Oracle,
    "g3_wcc" -> g3Oracle,
    "g4_hyperball" -> g4Oracle)
}
