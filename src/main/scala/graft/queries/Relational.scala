package graft.queries

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.types.DecimalType

import graft.Checkpoints.StageOps
import graft.Tables

/** Relational parity surface.
  *
  * The reference (spotify/klio) has no relational operators of its own; its
  * pipelines exercise raw Beam primitives — `beam.CoGroupByKey`
  * (reference `integration/audio-spectrograms/run.py:76-91`), `beam.Distinct`
  * (`run.py:120`), `beam.Flatten` (`exec/src/klio_exec/commands/run.py:363`),
  * tagged outputs (`lib/src/klio/transforms/_helpers.py:50-54`) — plus the
  * existence-check prelude which is relationally a semi/anti join
  * (`lib/src/klio/transforms/helpers.py:91-104`). Each query here maps one of
  * those shapes onto the driver's TPC-H-ish tables, Spark-first: declarative
  * DataFrame ops so Catalyst gets pushdown/pruning/broadcast for free.
  *
  * Determinism vs the DuckDB oracle: money math is done in DECIMAL (exact,
  * engine-independent) and cast to DOUBLE only at the end; averages are
  * derived as double-division of two exactly-matching values so the IEEE
  * result is bit-identical in both engines.
  */
object Relational {

  private def dec2(c: Column): Column = c.cast(DecimalType(18, 2))
  private val one = lit(BigDecimal(1).setScale(2))

  /** TPC-H Q1 shape: scan → filter → hash agg (partial+final, no shuffle of
    * raw rows beyond the 6-group key). Scales: map-side combine means the
    * shuffle carries only n_partitions × n_groups rows at 100 TB.
    */
  def q1Agg(s: SparkSession, dir: String): DataFrame =
    Tables.lineitem(s, dir)
      .filter(col("l_shipdate") <= lit("1998-09-02").cast("timestamp"))
      .groupBy(col("l_returnflag"), col("l_linestatus"))
      .agg(
        sum(dec2(col("l_quantity"))).cast("double").as("sum_qty"),
        sum(dec2(col("l_extendedprice"))).cast("double").as("sum_base_price"),
        sum(dec2(col("l_extendedprice")) * (one - dec2(col("l_discount"))))
          .cast("double").as("sum_disc_price"),
        count(lit(1)).as("count_order"))
      .withColumn("avg_qty", col("sum_qty") / col("count_order"))
      .orderBy(col("l_returnflag"), col("l_linestatus"))

  val q1Oracle: String =
    """SELECT l_returnflag, l_linestatus,
      |  CAST(SUM(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) AS sum_qty,
      |  CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2))) AS DOUBLE) AS sum_base_price,
      |  CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2)) * (CAST(1.00 AS DECIMAL(3,2)) - CAST(l_discount AS DECIMAL(18,2)))) AS DOUBLE) AS sum_disc_price,
      |  COUNT(*) AS count_order,
      |  CAST(SUM(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) / COUNT(*) AS avg_qty
      |FROM lineitem
      |WHERE l_shipdate <= TIMESTAMP '1998-09-02'
      |GROUP BY l_returnflag, l_linestatus
      |ORDER BY l_returnflag, l_linestatus""".stripMargin

  /** CoGroupByKey parity (reference joins full-spectrogram with nn-filtered
    * spectrogram by `kmsg.data.element`, audio-spectrograms/run.py:76-91):
    * equi-join keyed by custkey. customer is small → broadcast; at 100 TB the
    * orders side streams through without a shuffle.
    */
  def q2CogroupJoin(s: SparkSession, dir: String): DataFrame = {
    val o = Tables.orders(s, dir)
    val c = Tables.customer(s, dir)
    o.join(broadcast(c), o("o_custkey") === c("c_custkey"))
      .groupBy(col("c_custkey"), col("c_mktsegment"))
      .agg(
        count(lit(1)).as("n_orders"),
        sum(dec2(col("o_totalprice"))).cast("double").as("total_spent"))
      .orderBy(col("c_custkey"))
  }

  val q2Oracle: String =
    """SELECT c_custkey, c_mktsegment, COUNT(*) AS n_orders,
      |  CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) AS total_spent
      |FROM orders JOIN customer ON o_custkey = c_custkey
      |GROUP BY c_custkey, c_mktsegment
      |ORDER BY c_custkey""".stripMargin

  /** beam.Distinct parity (audio-spectrograms/run.py:120). Distinct is a
    * shuffle on the full key — at scale prefer dropDuplicates on a narrow
    * projection, which is what this does.
    */
  def q3Distinct(s: SparkSession, dir: String): DataFrame =
    Tables.events(s, dir)
      .select(col("user_id"), col("event_type"))
      .distinct()
      .orderBy(col("user_id"), col("event_type"))

  val q3Oracle: String =
    """SELECT DISTINCT user_id, event_type FROM events
      |ORDER BY user_id, event_type""".stripMargin

  /** beam.Flatten parity (exec run.py:363,374 — pass-thru branches unioned
    * back into the main flow): two filtered slices unioned then aggregated.
    * union is a no-shuffle narrow op in Spark.
    */
  def q4FlattenUnion(s: SparkSession, dir: String): DataFrame = {
    val e = Tables.events(s, dir)
    val errors = e.filter(col("event_type") === "error")
    val bigClicks = e.filter(col("event_type") === "click" && col("value") > 10.0)
    errors.unionByName(bigClicks)
      .groupBy(col("user_id"))
      .agg(count(lit(1)).as("n"),
        sum(dec2(col("value"))).cast("double").as("total_value"))
      .orderBy(col("user_id"))
  }

  val q4Oracle: String =
    """SELECT user_id, COUNT(*) AS n,
      |  CAST(SUM(CAST(value AS DECIMAL(18,2))) AS DOUBLE) AS total_value
      |FROM (
      |  SELECT * FROM events WHERE event_type = 'error'
      |  UNION ALL
      |  SELECT * FROM events WHERE event_type = 'click' AND value > 10.0
      |)
      |GROUP BY user_id
      |ORDER BY user_id""".stripMargin

  /** Tagged-output parity (TaggedStates{process, pass_thru, drop},
    * _helpers.py:50-54): single-pass routing via a tag column instead of
    * N re-evaluations of the source — the Spark-idiomatic answer to Beam's
    * .with_outputs().
    */
  def q5TaggedRoute(s: SparkSession, dir: String): DataFrame =
    Tables.events(s, dir)
      .withColumn("tag",
        when(col("event_type") === "error", "drop")
          .when(col("value") < 1.0, "pass_thru")
          .otherwise("process"))
      .groupBy(col("tag"))
      .agg(count(lit(1)).as("n"),
        sum(dec2(col("value"))).cast("double").as("total_value"))
      .orderBy(col("tag"))

  val q5Oracle: String =
    """SELECT CASE WHEN event_type = 'error' THEN 'drop'
      |            WHEN value < 1.0 THEN 'pass_thru'
      |            ELSE 'process' END AS tag,
      |  COUNT(*) AS n,
      |  CAST(SUM(CAST(value AS DECIMAL(18,2))) AS DOUBLE) AS total_value
      |FROM events
      |GROUP BY 1
      |ORDER BY tag""".stripMargin

  /** TPC-H Q5 shape: fact table joined to a star of dims. All dims are tiny
    * relative to lineitem → explicit broadcast so the 100 TB fact side never
    * shuffles for the join; only the final 25-group agg shuffles.
    */
  def q6MultiJoin(s: SparkSession, dir: String): DataFrame = {
    val li = Tables.lineitem(s, dir)
    val o = Tables.orders(s, dir)
    val c = Tables.customer(s, dir)
    val n = Tables.nation(s, dir)
    val r = Tables.region(s, dir)
    li.join(broadcast(o), col("l_orderkey") === col("o_orderkey"))
      .join(broadcast(c), col("o_custkey") === col("c_custkey"))
      .join(broadcast(n), col("c_nationkey") === col("n_nationkey"))
      .join(broadcast(r), col("n_regionkey") === col("r_regionkey"))
      .groupBy(col("r_name"), col("n_name"))
      .agg(sum(dec2(col("l_extendedprice")) * (one - dec2(col("l_discount"))))
        .cast("double").as("revenue"),
        count(lit(1)).as("n_items"))
      .orderBy(col("r_name"), col("n_name"))
  }

  val q6Oracle: String =
    """SELECT r_name, n_name,
      |  CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2)) * (CAST(1.00 AS DECIMAL(3,2)) - CAST(l_discount AS DECIMAL(18,2)))) AS DOUBLE) AS revenue,
      |  COUNT(*) AS n_items
      |FROM lineitem
      |JOIN orders   ON l_orderkey = o_orderkey
      |JOIN customer ON o_custkey = c_custkey
      |JOIN nation   ON c_nationkey = n_nationkey
      |JOIN region   ON n_regionkey = r_regionkey
      |GROUP BY r_name, n_name
      |ORDER BY r_name, n_name""".stripMargin

  /** Window functions (beyond klio — engine completeness): per-user event
    * ranking by value. Single shuffle on user_id; the window sort is local
    * per partition group.
    */
  def q7Window(s: SparkSession, dir: String): DataFrame = {
    val w = Window.partitionBy(col("user_id"))
      .orderBy(col("value").desc, col("event_id"))
    Tables.events(s, dir)
      .withColumn("rk", row_number().over(w))
      .filter(col("rk") <= 3)
      .select(col("user_id"), col("rk"), col("event_id"), col("event_type"),
        col("value"))
      .orderBy(col("user_id"), col("rk"))
  }

  val q7Oracle: String =
    """SELECT user_id, rk, event_id, event_type, value FROM (
      |  SELECT user_id, event_id, event_type, value,
      |    ROW_NUMBER() OVER (PARTITION BY user_id ORDER BY value DESC, event_id) AS rk
      |  FROM events
      |) WHERE rk <= 3
      |ORDER BY user_id, rk""".stripMargin

  /** Global top-k with deterministic tie-break. Spark plans orderBy+limit as
    * TakeOrderedAndProject: per-partition top-k then a k-row merge on the
    * driver — no full sort at 100 TB.
    */
  def q8TopK(s: SparkSession, dir: String): DataFrame =
    Tables.events(s, dir)
      .select(col("event_id"), col("user_id"), col("event_type"), col("value"))
      .orderBy(col("value").desc, col("event_id"))
      .limit(100)

  val q8Oracle: String =
    """SELECT event_id, user_id, event_type, value FROM events
      |ORDER BY value DESC, event_id LIMIT 100""".stripMargin

  /** Existence-check prelude, relationally: klio's "does input data exist for
    * this element" check (helpers.py:91-96) at scale is a semi-join of the
    * message stream against a listing — never a per-row RPC. Here: customers
    * that do have orders (found → process).
    */
  def q9ExistsSemi(s: SparkSession, dir: String): DataFrame = {
    val c = Tables.customer(s, dir)
    val o = Tables.orders(s, dir).select(col("o_custkey"))
    c.join(o, c("c_custkey") === o("o_custkey"), "left_semi")
      .select(col("c_custkey"), col("c_name"))
      .orderBy(col("c_custkey"))
  }

  val q9Oracle: String =
    """SELECT c_custkey, c_name FROM customer
      |WHERE c_custkey IN (SELECT o_custkey FROM orders)
      |ORDER BY c_custkey""".stripMargin

  /** The complement: not_found → drop/trigger-upstream branch
    * (helpers.py:536-753) as a left-anti join.
    */
  def q10ExistsAnti(s: SparkSession, dir: String): DataFrame = {
    val c = Tables.customer(s, dir)
    val o = Tables.orders(s, dir)
      .filter(col("o_orderstatus") === "F").select(col("o_custkey"))
    c.join(o, c("c_custkey") === o("o_custkey"), "left_anti")
      .select(col("c_custkey"), col("c_name"))
      .orderBy(col("c_custkey"))
  }

  val q10Oracle: String =
    """SELECT c_custkey, c_name FROM customer
      |WHERE c_custkey NOT IN (SELECT o_custkey FROM orders WHERE o_orderstatus = 'F')
      |ORDER BY c_custkey""".stripMargin

  /** As-of join over the events stream: every event picks up the most
    * recent "rate update" (a sparse substream) for its key at or before
    * its timestamp. Implemented by [[graft.operators.AsofJoin]] — tagged
    * union + one window pass, a single shuffle on the key, no range-join
    * blow-up. The oracle is DuckDB's native ASOF LEFT JOIN, so the
    * inclusive-≤ and tie semantics are hash-checked against an
    * independent implementation.
    */
  def q11Asof(s: SparkSession, dir: String): DataFrame = {
    val e = Tables.events(s, dir)
    val left = e.filter(col("event_id") < 2000)
      .select(col("event_id"), (col("user_id") % 4).as("k"), col("ts"))
    val updates = e.filter(col("event_id") % 100 === 0)
      .select((col("user_id") % 4).as("k"), col("ts"),
        col("event_id").as("rate"))
      .groupBy(col("k"), col("ts")).agg(max(col("rate")).as("rate"))
    graft.operators.AsofJoin
      .withDefault(left, updates, "k", "ts", "rate", lit(-1L))
      .select(col("event_id"), col("rate"))
      .orderBy(col("event_id"))
  }

  val q11Oracle: String =
    """WITH l AS (SELECT event_id, user_id % 4 AS k, epoch_ns(ts) AS tsn
      |  FROM events WHERE event_id < 2000),
      |u AS (SELECT user_id % 4 AS k, epoch_ns(ts) AS tsn,
      |    MAX(event_id) AS rate
      |  FROM events WHERE event_id % 100 = 0 GROUP BY 1, 2)
      |SELECT l.event_id, COALESCE(u.rate, -1) AS rate
      |FROM l ASOF LEFT JOIN u ON l.k = u.k AND l.tsn >= u.tsn
      |ORDER BY l.event_id""".stripMargin

  /** Set operations: customers with 'F'-status orders INTERSECT customers
    * with 'O'-status orders; EXCEPT for F-only. Both distinct-semantics
    * (one shuffle each, same machinery as dropDuplicates).
    */
  def q12SetOps(s: SparkSession, dir: String): DataFrame = {
    val o = Tables.orders(s, dir)
    val f = o.filter(col("o_orderstatus") === "F").select(col("o_custkey"))
    val op = o.filter(col("o_orderstatus") === "O").select(col("o_custkey"))
    f.intersect(op).select(col("o_custkey"), lit("both").as("bucket"))
      .unionByName(f.except(op)
        .select(col("o_custkey"), lit("f_only").as("bucket")))
      .groupBy(col("bucket"))
      .agg(count(lit(1)).as("n"), sum(col("o_custkey")).as("checksum"))
      .orderBy(col("bucket"))
  }

  val q12Oracle: String =
    """WITH f AS (SELECT DISTINCT o_custkey FROM orders WHERE o_orderstatus = 'F'),
      |o AS (SELECT DISTINCT o_custkey FROM orders WHERE o_orderstatus = 'O'),
      |b AS (SELECT o_custkey, 'both' AS bucket FROM f INTERSECT SELECT o_custkey, 'both' FROM o),
      |x AS (SELECT o_custkey, 'f_only' AS bucket FROM f EXCEPT SELECT o_custkey, 'f_only' FROM o),
      |u AS (SELECT * FROM b UNION ALL SELECT * FROM x)
      |SELECT bucket, COUNT(*) AS n, CAST(SUM(o_custkey) AS BIGINT) AS checksum
      |FROM u GROUP BY bucket ORDER BY bucket""".stripMargin

  /** ROLLUP over (returnflag, linestatus) with grouping ids — subtotal and
    * grand-total rows from one pass (Expand + single agg; no extra scans).
    * Money rides as exact integer cents.
    */
  def q13Rollup(s: SparkSession, dir: String): DataFrame =
    Tables.lineitem(s, dir)
      .select(col("l_returnflag").as("rf"), col("l_linestatus").as("ls"),
        (dec2(col("l_extendedprice")) * 100).cast("long").as("cents"))
      .rollup(col("rf"), col("ls"))
      .agg(count(lit(1)).as("n"), sum(col("cents")).as("total_cents"),
        grouping_id().as("gid"))
      .orderBy(col("gid"), col("rf"), col("ls"))

  val q13Oracle: String =
    """SELECT l_returnflag AS rf, l_linestatus AS ls, COUNT(*) AS n,
      |  CAST(SUM(CAST(CAST(l_extendedprice AS DECIMAL(18,2)) * 100 AS BIGINT))
      |    AS BIGINT) AS total_cents,
      |  CAST(GROUPING(l_returnflag) * 2 + GROUPING(l_linestatus) AS BIGINT)
      |    AS gid
      |FROM lineitem GROUP BY ROLLUP (l_returnflag, l_linestatus)
      |ORDER BY gid, rf NULLS LAST, ls NULLS LAST""".stripMargin

  /** Exact percentiles (median / p90) of integer quantities per group —
    * `percentile` with linear interpolation, the same standard
    * PERCENTILE_CONT definition DuckDB implements, over integers so both
    * engines interpolate between identical exact values.
    */
  def q14Percentiles(s: SparkSession, dir: String): DataFrame =
    Tables.lineitem(s, dir)
      .select(col("l_returnflag").as("rf"),
        col("l_quantity").cast("long").as("q"))
      .groupBy(col("rf"))
      .agg(count(lit(1)).as("n"),
        percentile(col("q"), lit(0.5)).as("median_q"),
        percentile(col("q"), lit(0.9)).as("p90_q"))
      .orderBy(col("rf"))

  val q14Oracle: String =
    """SELECT l_returnflag AS rf, COUNT(*) AS n,
      |  PERCENTILE_CONT(0.5) WITHIN GROUP (ORDER BY CAST(l_quantity AS BIGINT))
      |    AS median_q,
      |  PERCENTILE_CONT(0.9) WITHIN GROUP (ORDER BY CAST(l_quantity AS BIGINT))
      |    AS p90_q
      |FROM lineitem GROUP BY 1 ORDER BY rf""".stripMargin

  /** Sequence analytics per user: lag/lead deltas and a running sum over
    * event time — the window-frame family beyond q7's ranking (one shuffle
    * on the key; frames evaluate within sorted partitions).
    */
  def q15LagLead(s: SparkSession, dir: String): DataFrame = {
    val w = Window.partitionBy(col("user_id")).orderBy(col("ts_us"),
      col("event_id"))
    val run = w.rowsBetween(Window.unboundedPreceding, Window.currentRow)
    Tables.events(s, dir)
      .filter(col("user_id") < 50)
      // microsecond resolution: DuckDB's parquet reader truncates the
      // nanos timestamp to µs, so the cross-engine comparison (ordering
      // included) must happen at µs; coalesce keeps the int64 column
      // null-free (a null would flip pandas to float64 and lose exactness)
      .select(col("user_id"), col("event_id"),
        expr("ts DIV 1000").as("ts_us"),
        (dec2(col("value")) * 100).cast("long").as("cents"))
      .select(col("user_id"), col("event_id"),
        coalesce(col("ts_us") - lag(col("ts_us"), 1).over(w), lit(0L))
          .as("gap_us"),
        lead(col("event_id"), 1).over(w).as("next_event"),
        sum(col("cents")).over(run).as("running_cents"))
      .orderBy(col("user_id"), col("event_id"))
  }

  val q15Oracle: String =
    """SELECT user_id, event_id,
      |  COALESCE(epoch_us(ts) - LAG(epoch_us(ts), 1) OVER w, 0) AS gap_us,
      |  LEAD(event_id, 1) OVER w AS next_event,
      |  CAST(SUM(CAST(CAST(value AS DECIMAL(18,2)) * 100 AS BIGINT))
      |    OVER (PARTITION BY user_id ORDER BY epoch_us(ts), event_id
      |      ROWS UNBOUNDED PRECEDING) AS BIGINT) AS running_cents
      |FROM events WHERE user_id < 50
      |WINDOW w AS (PARTITION BY user_id ORDER BY epoch_us(ts), event_id)
      |ORDER BY user_id, event_id""".stripMargin

  /** Spark's built-in session_window (the declarative sibling of the
    * custom-state [[graft.streaming.Sessionize]]): per-user sessions with
    * a 5-minute gap, in batch — the same expression works on a stream.
    * Sessions merge while events fall strictly inside the previous
    * event's gap window; the oracle replays that as gaps-and-islands SQL
    * (break when diff ≥ gap). Microsecond resolution for cross-engine
    * exactness (see q15).
    */
  def q16SessionWindow(s: SparkSession, dir: String): DataFrame = {
    val gapUs = 300000000L // 5 minutes
    Tables.events(s, dir)
      .filter(col("user_id") < 50)
      .select(col("user_id"),
        timestamp_micros(expr("ts DIV 1000")).as("tsx"),
        (dec2(col("value")) * 100).cast("long").as("cents"))
      .groupBy(col("user_id"), session_window(col("tsx"), "5 minutes"))
      .agg(count(lit(1)).as("n"), sum(col("cents")).as("total_cents"))
      .select(col("user_id"),
        unix_micros(col("session_window.start")).as("start_us"),
        unix_micros(col("session_window.end")).as("end_us"),
        col("n"), col("total_cents"))
      .orderBy(col("user_id"), col("start_us"))
  }

  val q16Oracle: String =
    """WITH e AS (SELECT user_id, epoch_us(ts) AS tsu,
      |    CAST(CAST(value AS DECIMAL(18,2)) * 100 AS BIGINT) AS cents
      |  FROM events WHERE user_id < 50),
      |x AS (SELECT *, CASE WHEN LAG(tsu) OVER w IS NULL
      |      OR tsu - LAG(tsu) OVER w >= 300000000 THEN 1 ELSE 0 END AS brk
      |  FROM e WINDOW w AS (PARTITION BY user_id ORDER BY tsu)),
      |g AS (SELECT *, SUM(brk) OVER (PARTITION BY user_id ORDER BY tsu
      |    ROWS UNBOUNDED PRECEDING) AS sid FROM x)
      |SELECT user_id, MIN(tsu) AS start_us,
      |  MAX(tsu) + 300000000 AS end_us, COUNT(*) AS n,
      |  CAST(SUM(cents) AS BIGINT) AS total_cents
      |FROM g GROUP BY user_id, sid ORDER BY user_id, start_us""".stripMargin

  /** Pivot (long → wide): per-user event-type spend matrix with an
    * EXPLICIT pivot value list — the bounded form that scales (an
    * unlisted pivot first runs a distinct scan to discover columns and
    * caps at `spark.sql.pivotMaxValues`; listing values keeps this a
    * single groupBy with 5 conditional aggregates, map-side combined).
    * Money math in cents (exact longs) per the determinism rule.
    */
  def q17Pivot(s: SparkSession, dir: String): DataFrame =
    Tables.events(s, dir)
      .filter(col("user_id") < 30)
      .select(col("user_id"), col("event_type"),
        (dec2(col("value")) * 100).cast("long").as("cents"))
      .groupBy(col("user_id"))
      .pivot(col("event_type"),
        Seq("click", "error", "purchase", "signup", "view"))
      .agg(coalesce(sum(col("cents")), lit(0L)))
      .orderBy(col("user_id"))

  val q17Oracle: String =
    """WITH e AS (SELECT user_id, event_type,
      |    CAST(CAST(value AS DECIMAL(18,2)) * 100 AS BIGINT) AS cents
      |  FROM events WHERE user_id < 30)
      |SELECT user_id,
      |  CAST(COALESCE(SUM(CASE WHEN event_type = 'click' THEN cents END), 0) AS BIGINT) AS click,
      |  CAST(COALESCE(SUM(CASE WHEN event_type = 'error' THEN cents END), 0) AS BIGINT) AS error,
      |  CAST(COALESCE(SUM(CASE WHEN event_type = 'purchase' THEN cents END), 0) AS BIGINT) AS purchase,
      |  CAST(COALESCE(SUM(CASE WHEN event_type = 'signup' THEN cents END), 0) AS BIGINT) AS signup,
      |  CAST(COALESCE(SUM(CASE WHEN event_type = 'view' THEN cents END), 0) AS BIGINT) AS view
      |FROM e GROUP BY user_id ORDER BY user_id""".stripMargin

  /** GROUPING SETS beyond what ROLLUP/CUBE can express — an arbitrary
    * lattice subset ((rf, ls), (ls)) in ONE pass (Expand + single hash
    * agg; a UNION ALL of two scans would read the table twice). The
    * reference has no relational layer; this rounds out the q13 family.
    */
  def q18GroupingSets(s: SparkSession, dir: String): DataFrame =
    Tables.lineitem(s, dir)
      .select(col("l_returnflag").as("rf"), col("l_linestatus").as("ls"),
        (dec2(col("l_extendedprice")) * 100).cast("long").as("cents"))
      .groupingSets(Seq(Seq(col("rf"), col("ls")), Seq(col("ls"))),
        col("rf"), col("ls"))
      .agg(count(lit(1)).as("n"), sum(col("cents")).as("total_cents"),
        grouping_id().as("gid"))
      .orderBy(col("gid"), col("rf"), col("ls"))

  val q18Oracle: String =
    """SELECT l_returnflag AS rf, l_linestatus AS ls, COUNT(*) AS n,
      |  CAST(SUM(CAST(CAST(l_extendedprice AS DECIMAL(18,2)) * 100 AS BIGINT))
      |    AS BIGINT) AS total_cents,
      |  CAST(GROUPING(l_returnflag) * 2 + GROUPING(l_linestatus) AS BIGINT)
      |    AS gid
      |FROM lineitem GROUP BY GROUPING SETS ((l_returnflag, l_linestatus),
      |  (l_linestatus))
      |ORDER BY gid, rf NULLS LAST, ls NULLS LAST""".stripMargin

  /** Pure range join (no equi key) through [[graft.operators.RangeJoin]]:
    * campaign windows [ts, ts + 10 min] vs the full event stream. The
    * bucketed rewrite turns what Spark would plan as a
    * BroadcastNestedLoopJoin into an equi-join on the time bucket —
    * shuffle-partitioned on both sides, the only formulation that
    * survives 100 TB of points. Timestamps stay int64 nanos end to end,
    * so the oracle comparison is exact.
    */
  def q19RangeJoin(s: SparkSession, dir: String): DataFrame = {
    val winNs = 600000000000L // 10 minutes
    val ev = Tables.events(s, dir)
    val points = ev.select(col("event_id").as("pid"), col("ts").as("pts"))
    val campaigns = ev.filter(col("event_id") % 97 === 0)
      .select(col("event_id").as("campaign_id"), col("ts").as("cstart"),
        (col("ts") + winNs).as("cend"))
    graft.operators.RangeJoin.pointInInterval(
        points, campaigns, "pts", "cstart", "cend", bucketWidth = winNs)
      .groupBy(col("campaign_id"))
      .agg(count(lit(1)).as("n_events"), sum(col("pid")).as("checksum"))
      .orderBy(col("campaign_id"))
  }

  val q19Oracle: String =
    """WITH p AS (SELECT event_id AS pid, epoch_ns(ts) AS pts FROM events),
      |c AS (SELECT event_id AS campaign_id, epoch_ns(ts) AS cstart,
      |    epoch_ns(ts) + 600000000000 AS cend
      |  FROM events WHERE event_id % 97 = 0)
      |SELECT campaign_id, COUNT(*) AS n_events,
      |  CAST(SUM(pid) AS BIGINT) AS checksum
      |FROM p JOIN c ON pts >= cstart AND pts <= cend
      |GROUP BY campaign_id ORDER BY campaign_id""".stripMargin

  /** Interval-OVERLAP join ([[graft.operators.RangeJoin.intervalOverlap]])
    * — q19's two-sided sibling: both join inputs are spans, the match is
    * any overlap, and the naive plan is the same fatal
    * BroadcastNestedLoopJoin. Sessions (15-min windows seeded every
    * 89th event) against incidents (10-min windows every 97th): which
    * sessions were exposed to which incidents. The bucketed rewrite
    * replicates both sides ~2× and pairs them through the bucket
    * equi-key with first-shared-bucket dedup — no distinct pass, no
    * broadcast, shuffle partitioned by time bucket.
    */
  def q29IntervalOverlap(s: SparkSession, dir: String): DataFrame = {
    val m15 = 900000000000L
    val m10 = 600000000000L
    val ev = Tables.events(s, dir)
    val sessions = ev.filter(col("event_id") % 89 === 0)
      .select(col("event_id").as("sid"), col("ts").as("ss"),
        (col("ts") + m15).as("se"))
    val incidents = ev.filter(col("event_id") % 97 === 0)
      .select(col("event_id").as("iid"), col("ts").as("is_"),
        (col("ts") + m10).as("ie"))
    graft.operators.RangeJoin.intervalOverlap(
        sessions, incidents, "ss", "se", "is_", "ie", bucketWidth = m15)
      .groupBy(col("sid"))
      .agg(count(lit(1)).as("n_incidents"), sum(col("iid")).as("checksum"))
      .orderBy(col("sid"))
  }

  val q29Oracle: String =
    """WITH s AS (SELECT event_id AS sid, epoch_ns(ts) AS ss,
      |    epoch_ns(ts) + 900000000000 AS se
      |  FROM events WHERE event_id % 89 = 0),
      |i AS (SELECT event_id AS iid, epoch_ns(ts) AS is_,
      |    epoch_ns(ts) + 600000000000 AS ie
      |  FROM events WHERE event_id % 97 = 0)
      |SELECT sid, COUNT(*) AS n_incidents,
      |  CAST(SUM(iid) AS BIGINT) AS checksum
      |FROM s JOIN i ON ss <= ie AND is_ <= se
      |GROUP BY sid ORDER BY sid""".stripMargin

  /** Exact corpus-profiling quantiles ([[graft.operators.ExactQuantiles]])
    * — document-length percentiles without a global sort: two bounded
    * passes (histogram ∝ bins, then a per-bucket window over only the
    * target buckets' rows), never `ORDER BY` + `ROW_NUMBER` through one
    * partition and never `approx_percentile`'s no-promise summary. The
    * oracle replays the rank definition (value at ⌈p·n/1000⌉, 1-indexed)
    * with a full window — affordable for DuckDB at sf, which is the
    * point: the oracle does the O(n log n) thing the operator avoids.
    */
  def q30ExactQuantiles(s: SparkSession, dir: String): DataFrame =
    graft.operators.ExactQuantiles(
      Tables.documents(s, dir), "n_chars",
      pMilles = Seq(100, 250, 500, 750, 900, 990, 999, 1000))

  val q30Oracle: String =
    """WITH s AS (SELECT n_chars,
      |    ROW_NUMBER() OVER (ORDER BY n_chars) AS rn,
      |    COUNT(*) OVER () AS n
      |  FROM documents),
      |pv(p) AS (VALUES (100), (250), (500), (750), (900), (990),
      |  (999), (1000))
      |SELECT p AS p_mille, MIN(n_chars) AS value
      |FROM pv JOIN s ON rn >= (p * n + 999) // 1000
      |GROUP BY 1 ORDER BY p_mille""".stripMargin

  /** GROUPED exact quantiles ([[graft.operators.ExactQuantiles.grouped]])
    * — per-language length percentiles with NO driver-side step: the
    * (group, bin) histogram is tiny next to the corpus, cumulative
    * ranks are a window over each group's ≤ bins rows, and only the
    * target buckets' rows are ever ranked. The per-group profile every
    * dataset card wants, at any group count.
    */
  def q33GroupedQuantiles(s: SparkSession, dir: String): DataFrame =
    graft.operators.ExactQuantiles.grouped(
      Tables.documents(s, dir), "lang", "n_chars",
      pMilles = Seq(250, 500, 900, 999))

  val q33Oracle: String =
    """WITH s AS (SELECT lang, n_chars,
      |    ROW_NUMBER() OVER (PARTITION BY lang ORDER BY n_chars) AS rn,
      |    COUNT(*) OVER (PARTITION BY lang) AS n
      |  FROM documents),
      |pv(p) AS (VALUES (250), (500), (900), (999))
      |SELECT lang, p AS p_mille, MIN(n_chars) AS value
      |FROM pv JOIN s ON rn >= (p * n + 999) // 1000
      |GROUP BY lang, p ORDER BY lang, p_mille""".stripMargin

  /** Hierarchy flattening (transitive closure) via PATH DOUBLING — the
    * org-chart / category-tree / dependency-DAG traversal every warehouse
    * eventually needs, done the way that survives deep hierarchies at
    * scale: naive iteration joins the edge list once per LEVEL (a
    * 40-deep tree = 40 shuffles), while doubling composes paths with
    * themselves so round r covers depth 2^r — ⌈log₂ depth⌉ self-joins
    * total, each shuffle ∝ the closure size. Planted ternary tree:
    * parent(v) = (v−1) div 3 over 121 nodes of the documents table
    * (max depth 4, so 3 unrolled rounds cover it with headroom ≤ 8);
    * the output is the full (node, ancestor, distance) closure, which
    * DuckDB replays with a recursive CTE — the O(depth)-iteration form
    * the operator avoids.
    */
  def q31TreeClosure(s: SparkSession, dir: String): DataFrame = {
    val edges = Tables.documents(s, dir)
      .filter(col("doc_id") >= 1 && col("doc_id") < 121)
      .select(col("doc_id").as("node"),
        expr("(doc_id - 1) DIV 3").as("anc"), lit(1L).as("d"))
    var paths = edges
    for (_ <- 1 to 3) {
      val hop = paths.as("a").join(paths.as("b"),
          col("a.anc") === col("b.node"))
        .select(col("a.node").as("node"), col("b.anc").as("anc"),
          (col("a.d") + col("b.d")).as("d"))
      // a tree has one path per (node, anc), so distinct is exact dedupe
      paths = paths.unionByName(hop).distinct().staged()
    }
    paths.orderBy(col("node"), col("d"))
  }

  val q31Oracle: String =
    """WITH RECURSIVE anc(node, anc, d) AS (
      |  SELECT doc_id, (doc_id - 1) // 3, CAST(1 AS BIGINT)
      |    FROM documents WHERE doc_id >= 1 AND doc_id < 121
      |  UNION ALL
      |  SELECT a.node, (a.anc - 1) // 3, a.d + 1
      |    FROM anc a WHERE a.anc >= 1)
      |SELECT node, anc, d FROM anc ORDER BY node, d""".stripMargin

  /** Ordered-sequence FUNNEL (view → click → purchase) — the event-
    * analytics staple: how far does each user get, where each stage
    * must happen strictly AFTER the previous one. Expressed as k−1
    * co-partitioned join-aggregates on the user key (first qualifying
    * view per user, first click after it, first purchase after that)
    * instead of the window-sort form — at 100 TB the join form never
    * sorts a user's full event history, shuffles each stage's filtered
    * slice once on the same key (co-partitioned after the first
    * exchange), and stage populations shrink monotonically. The oracle
    * replays the same conditional-min cascade.
    */
  def q32Funnel(s: SparkSession, dir: String): DataFrame = {
    // sparse slice: with the full table every user completes the funnel
    // (a 1-row census is no gate); % 13 spreads users across all stages
    val ev = Tables.events(s, dir).filter(col("event_id") % 13 === 0)
      .select(col("user_id"), col("event_type"), col("ts"))
    val t1 = ev.filter(col("event_type") === "view")
      .groupBy(col("user_id")).agg(min(col("ts")).as("t1"))
    val t2 = ev.filter(col("event_type") === "click")
      .join(t1, "user_id").filter(col("ts") > col("t1"))
      .groupBy(col("user_id")).agg(min(col("ts")).as("t2"))
    val t3 = ev.filter(col("event_type") === "purchase")
      .join(t2, "user_id").filter(col("ts") > col("t2"))
      .groupBy(col("user_id")).agg(min(col("ts")).as("t3"))
    ev.select(col("user_id")).distinct()
      .join(t1, Seq("user_id"), "left")
      .join(t2, Seq("user_id"), "left")
      .join(t3, Seq("user_id"), "left")
      .select(col("user_id"),
        when(col("t3").isNotNull, 3)
          .when(col("t2").isNotNull, 2)
          .when(col("t1").isNotNull, 1)
          .otherwise(0).as("stage"))
      .groupBy(col("stage"))
      .agg(count(lit(1)).as("n_users"), sum(col("user_id")).as("checksum"))
      .orderBy(col("stage"))
  }

  val q32Oracle: String =
    """WITH ev AS (SELECT * FROM events WHERE event_id % 13 = 0),
      |t1 AS (SELECT user_id, MIN(epoch_ns(ts)) AS t1 FROM ev
      |  WHERE event_type = 'view' GROUP BY 1),
      |t2 AS (SELECT e.user_id, MIN(epoch_ns(e.ts)) AS t2
      |  FROM ev e JOIN t1 ON e.user_id = t1.user_id
      |  WHERE e.event_type = 'click' AND epoch_ns(e.ts) > t1.t1
      |  GROUP BY 1),
      |t3 AS (SELECT e.user_id, MIN(epoch_ns(e.ts)) AS t3
      |  FROM ev e JOIN t2 ON e.user_id = t2.user_id
      |  WHERE e.event_type = 'purchase' AND epoch_ns(e.ts) > t2.t2
      |  GROUP BY 1),
      |u AS (SELECT DISTINCT user_id FROM ev)
      |SELECT CASE WHEN t3.t3 IS NOT NULL THEN 3
      |    WHEN t2.t2 IS NOT NULL THEN 2
      |    WHEN t1.t1 IS NOT NULL THEN 1 ELSE 0 END AS stage,
      |  COUNT(*) AS n_users, CAST(SUM(u.user_id) AS BIGINT) AS checksum
      |FROM u LEFT JOIN t1 ON u.user_id = t1.user_id
      |LEFT JOIN t2 ON u.user_id = t2.user_id
      |LEFT JOIN t3 ON u.user_id = t3.user_id
      |GROUP BY 1 ORDER BY stage""".stripMargin

  /** Global contiguous ids via [[graft.operators.ContiguousIds]] (range
    * repartition + per-partition offsets — never the single-partition
    * global window). The oracle recomputes every id as a global
    * ROW_NUMBER, so the checksum pins each row's exact assigned id.
    */
  def q20ContiguousIds(s: SparkSession, dir: String): DataFrame =
    graft.operators.ContiguousIds(
        Tables.documents(s, dir).select(col("doc_id"), col("lang")),
        orderCol = "doc_id", idCol = "gid")
      .groupBy(col("lang"))
      .agg(count(lit(1)).as("n_docs"),
        min(col("gid")).as("min_gid"), max(col("gid")).as("max_gid"),
        sum(col("gid") * col("doc_id")).as("checksum"))
      .orderBy(col("lang"))

  val q20Oracle: String =
    """WITH g AS (SELECT doc_id, lang,
      |    ROW_NUMBER() OVER (ORDER BY doc_id) - 1 AS gid FROM documents)
      |SELECT lang, COUNT(*) AS n_docs,
      |  CAST(MIN(gid) AS BIGINT) AS min_gid,
      |  CAST(MAX(gid) AS BIGINT) AS max_gid,
      |  CAST(SUM(gid * doc_id) AS BIGINT) AS checksum
      |FROM g GROUP BY lang ORDER BY lang""".stripMargin

  /** Time-RANGE window frame (q15's rows-frames sibling): per-user
    * trailing-10-minute event count and spend, `rangeBetween` over the
    * µs timestamp — the sliding-window-per-entity shape (rate limiting,
    * rolling spend, anomaly baselines) that ROWS frames can't express
    * when event density varies. Range frames bound by VALUE, so ties on
    * ts_us all fall in every frame they border — deterministic without a
    * tiebreaker column, which is exactly why the frame orders by the
    * single numeric key. One shuffle on user_id; frames evaluate with a
    * sliding aggregate inside the sorted partition, never re-scanning.
    */
  def q21RangeFrame(s: SparkSession, dir: String): DataFrame = {
    val tenMinUs = 600000000L
    val w = Window.partitionBy(col("user_id")).orderBy(col("ts_us"))
      .rangeBetween(-tenMinUs, 0)
    Tables.events(s, dir)
      .filter(col("user_id") < 50)
      .select(col("user_id"), col("event_id"),
        expr("ts DIV 1000").as("ts_us"),
        (dec2(col("value")) * 100).cast("long").as("cents"))
      .select(col("user_id"), col("event_id"), col("ts_us"),
        count(lit(1)).over(w).as("n_10m"),
        sum(col("cents")).over(w).as("cents_10m"))
      .orderBy(col("user_id"), col("event_id"))
  }

  val q21Oracle: String =
    """SELECT user_id, event_id, epoch_us(ts) AS ts_us,
      |  COUNT(*) OVER w AS n_10m,
      |  CAST(SUM(CAST(CAST(value AS DECIMAL(18,2)) * 100 AS BIGINT))
      |    OVER w AS BIGINT) AS cents_10m
      |FROM events WHERE user_id < 50
      |WINDOW w AS (PARTITION BY user_id ORDER BY epoch_us(ts)
      |  RANGE BETWEEN 600000000 PRECEDING AND CURRENT ROW)
      |ORDER BY user_id, event_id""".stripMargin

  /** Unpivot (melt) — [[q17Pivot]]'s inverse and the feature-engineering
    * workhorse: wide per-row metrics become (metric, value) pairs for
    * uniform downstream aggregation. `Dataset.unpivot` plans as a single
    * Expand (rows × n_metrics) — a narrow map with no shuffle until the
    * final aggregate, so it scales as a pure scan.
    */
  def q22Unpivot(s: SparkSession, dir: String): DataFrame = {
    val li = Tables.lineitem(s, dir).filter(col("l_orderkey") < 4000)
      .select(col("l_orderkey"),
        (dec2(col("l_quantity")) * 100).cast("long").as("quantity_c"),
        (dec2(col("l_extendedprice")) * 100).cast("long").as("price_c"),
        (dec2(col("l_discount")) * 100).cast("long").as("discount_c"),
        (dec2(col("l_tax")) * 100).cast("long").as("tax_c"))
    li.unpivot(Array(col("l_orderkey")),
        Array(col("quantity_c"), col("price_c"), col("discount_c"),
          col("tax_c")), "metric", "value")
      .groupBy(col("metric"))
      .agg(count(lit(1)).as("n"), sum(col("value")).as("total"),
        max(col("value")).as("mx"))
      .orderBy(col("metric"))
  }

  val q22Oracle: String =
    """WITH w AS (SELECT l_orderkey,
      |    CAST(CAST(l_quantity AS DECIMAL(18,2)) * 100 AS BIGINT) AS quantity_c,
      |    CAST(CAST(l_extendedprice AS DECIMAL(18,2)) * 100 AS BIGINT) AS price_c,
      |    CAST(CAST(l_discount AS DECIMAL(18,2)) * 100 AS BIGINT) AS discount_c,
      |    CAST(CAST(l_tax AS DECIMAL(18,2)) * 100 AS BIGINT) AS tax_c
      |  FROM lineitem WHERE l_orderkey < 4000),
      |m AS (
      |  SELECT 'quantity_c' AS metric, quantity_c AS value FROM w
      |  UNION ALL SELECT 'price_c', price_c FROM w
      |  UNION ALL SELECT 'discount_c', discount_c FROM w
      |  UNION ALL SELECT 'tax_c', tax_c FROM w)
      |SELECT metric, COUNT(*) AS n, CAST(SUM(value) AS BIGINT) AS total,
      |  CAST(MAX(value) AS BIGINT) AS mx
      |FROM m GROUP BY metric ORDER BY metric""".stripMargin

  /** Distribution-rank window family — `ntile` / `percent_rank` /
    * `cume_dist` / `dense_rank`, the quantile-bucketing shape behind
    * cohort analysis and score calibration. Ties: percent_rank and
    * cume_dist are tie-stable by definition, but ntile SPLITS ties by
    * physical order, so the window orders by (balance, custkey) — a
    * unique total order — to stay deterministic across engines and
    * across Spark's own retries. One shuffle on nationkey; every rank
    * evaluates in a single sorted pass per partition.
    */
  def q23RankFamily(s: SparkSession, dir: String): DataFrame = {
    val w = Window.partitionBy(col("c_nationkey"))
      .orderBy(col("bal_c"), col("c_custkey"))
    Tables.customer(s, dir)
      .filter(col("c_nationkey") < 5)
      .select(col("c_nationkey"), col("c_custkey"),
        (dec2(col("c_acctbal")) * 100).cast("long").as("bal_c"))
      .select(col("c_nationkey"), col("c_custkey"), col("bal_c"),
        ntile(4).over(w).as("quartile"),
        dense_rank().over(w).as("drank"),
        // floor() before the cast: DuckDB's double→BIGINT cast rounds
        // half-away while Spark's truncates — floor is exact in both
        floor(percent_rank().over(w) * 10000).cast("long").as("prank_bp"),
        floor(cume_dist().over(w) * 10000).cast("long").as("cume_bp"))
      .orderBy(col("c_nationkey"), col("c_custkey"))
  }

  val q23Oracle: String =
    """SELECT c_nationkey, c_custkey,
      |  CAST(CAST(c_acctbal AS DECIMAL(18,2)) * 100 AS BIGINT) AS bal_c,
      |  NTILE(4) OVER w AS quartile,
      |  DENSE_RANK() OVER w AS drank,
      |  CAST(FLOOR(PERCENT_RANK() OVER w * 10000) AS BIGINT) AS prank_bp,
      |  CAST(FLOOR(CUME_DIST() OVER w * 10000) AS BIGINT) AS cume_bp
      |FROM customer WHERE c_nationkey < 5
      |WINDOW w AS (PARTITION BY c_nationkey
      |  ORDER BY CAST(CAST(c_acctbal AS DECIMAL(18,2)) * 100 AS BIGINT),
      |           c_custkey)
      |ORDER BY c_nationkey, c_custkey""".stripMargin

  /** Correlated-subquery shape (TPC-H Q17's skeleton): keep lineitems
    * whose quantity is below 20% of their part's average — "compare each
    * row to its group's aggregate". Decorrelated the way every engine
    * must at scale: compute the per-part aggregate ONCE (map-side-
    * combined groupBy, #parts rows) and equi-join it back, never a
    * per-row subquery re-execution. The threshold comparison works in
    * exact integer space (200·qty_cents vs 2·sum_cents·100/…): both
    * sides stay products of longs, so no division ever happens and the
    * oracle can't drift on rounding.
    */
  def q24CorrSubquery(s: SparkSession, dir: String): DataFrame = {
    val li = Tables.lineitem(s, dir)
      .select(col("l_partkey"),
        (dec2(col("l_quantity")) * 100).cast("long").as("qty_c"),
        (dec2(col("l_extendedprice")) * 100).cast("long").as("price_c"))
    val perPart = li.groupBy(col("l_partkey"))
      .agg(sum(col("qty_c")).as("sum_qty_c"), count(lit(1)).as("n_li"))
    // l_quantity < 0.2 * avg(qty)  ⟺  5 * qty_c * n < sum_qty_c
    li.join(perPart, Seq("l_partkey"))
      .filter(col("qty_c") * 5 * col("n_li") < col("sum_qty_c"))
      .agg(count(lit(1)).as("n_below"),
        sum(col("qty_c")).as("sum_qty"),
        sum(col("price_c")).as("sum_price"))
  }

  val q24Oracle: String =
    """WITH li AS (SELECT l_partkey,
      |    CAST(CAST(l_quantity AS DECIMAL(18,2)) * 100 AS BIGINT) AS qty_c,
      |    CAST(CAST(l_extendedprice AS DECIMAL(18,2)) * 100 AS BIGINT)
      |      AS price_c
      |  FROM lineitem),
      |pp AS (SELECT l_partkey, SUM(qty_c) AS sum_qty_c, COUNT(*) AS n_li
      |  FROM li GROUP BY l_partkey)
      |SELECT COUNT(*) AS n_below,
      |  CAST(SUM(qty_c) AS BIGINT) AS sum_qty,
      |  CAST(SUM(price_c) AS BIGINT) AS sum_price
      |FROM li JOIN pp USING(l_partkey)
      |WHERE qty_c * 5 * n_li < sum_qty_c""".stripMargin

  /** Multiple DISTINCT aggregates in one pass — `COUNT(DISTINCT x)`,
    * `COUNT(DISTINCT y)`, and a plain SUM over the same grouping, the
    * shape Spark plans with a single Expand (one row per distinct-column
    * group) followed by two aggregate levels rather than N separate
    * scans+joins. Engine-relevant at scale because the naive rewrite
    * (self-join per distinct column) multiplies corpus scans; Expand
    * keeps it at one scan + one shuffle on the expanded key.
    */
  def q25MultiDistinct(s: SparkSession, dir: String): DataFrame =
    Tables.lineitem(s, dir)
      .groupBy(col("l_returnflag"))
      .agg(countDistinct(col("l_partkey")).as("nd_part"),
        countDistinct(col("l_suppkey")).as("nd_supp"),
        count(lit(1)).as("n"),
        sum((dec2(col("l_quantity")) * 100).cast("long")).as("sum_qty_c"))
      .orderBy(col("l_returnflag"))

  val q25Oracle: String =
    """SELECT l_returnflag, COUNT(DISTINCT l_partkey) AS nd_part,
      |  COUNT(DISTINCT l_suppkey) AS nd_supp, COUNT(*) AS n,
      |  CAST(SUM(CAST(CAST(l_quantity AS DECIMAL(18,2)) * 100 AS BIGINT))
      |    AS BIGINT) AS sum_qty_c
      |FROM lineitem GROUP BY l_returnflag ORDER BY l_returnflag""".stripMargin

  /** `max_by` / `min_by` argmax aggregation — "latest/first row per key"
    * as ONE hash aggregate with map-side combine, the shape that replaces
    * the window-rank idiom (shuffle + per-partition SORT) when only the
    * extreme row is wanted. The ordering key is composite-but-scalar:
    * (µs since 2024-01-01)·S + event_id with S = 10⁶ — fits a long and
    * is identical in both engines (DuckDB's arg_max accepts only scalar
    * keys, and a tie on raw timestamps would otherwise be
    * engine-defined). Collision-freedom holds only WHILE event_id < S,
    * so the bound is ENFORCED, not assumed: the aggregate also takes
    * max(event_id) and both argmax outputs raise on a group whose ids
    * spill into the timestamp slot — the guard rides in each output
    * column (any pruned subset still raises, the plan stays one
    * aggregate) and CaseWhen's lazy branches keep it off the happy path.
    */
  def q26ArgMax(s: SparkSession, dir: String): DataFrame = {
    val slot = 1000000L
    val key = (expr("ts DIV 1000") - 1704067200000000L) * slot +
      col("event_id")
    def guarded(c: Column): Column =
      when(col("max_id") < slot, c).otherwise(raise_error(concat(
        lit("q26 argmax key overflow: max event_id "),
        col("max_id").cast("string"),
        lit(s" >= $slot spills into the timestamp slot"))))
    Tables.events(s, dir)
      .filter(col("user_id") < 80)
      .select(col("user_id"), col("event_id"), key.as("k"),
        expr("ts DIV 1000").as("ts_us"))
      .groupBy(col("user_id"))
      .agg(max_by(col("event_id"), col("k")).as("last_event0"),
        min_by(col("event_id"), col("k")).as("first_event0"),
        count(lit(1)).as("n"),
        (max(col("ts_us")) - min(col("ts_us"))).as("span_us"),
        max(col("event_id")).as("max_id"))
      .select(col("user_id"),
        guarded(col("last_event0")).as("last_event"),
        guarded(col("first_event0")).as("first_event"),
        col("n"), col("span_us"))
      .orderBy(col("user_id"))
  }

  val q26Oracle: String =
    """SELECT user_id,
      |  arg_max(event_id, (epoch_us(ts) - 1704067200000000) * 1000000
      |    + event_id) AS last_event,
      |  arg_min(event_id, (epoch_us(ts) - 1704067200000000) * 1000000
      |    + event_id) AS first_event,
      |  COUNT(*) AS n,
      |  CAST(MAX(epoch_us(ts)) - MIN(epoch_us(ts)) AS BIGINT) AS span_us
      |FROM events WHERE user_id < 80
      |GROUP BY user_id ORDER BY user_id""".stripMargin

  /** Skew-salted join under the correctness gate
    * ([[graft.operators.SkewJoin]]): the big side is keyed by
    * `user_id % 10` — ten hot keys, each carrying ~10% of the stream, the
    * shape where plain hash partitioning puts whole keys on single tasks
    * — and joins a 10-row dimension on (key, salt) with salts=8. The
    * oracle is the PLAIN join: salting must be result-invisible (each big
    * row meets each matching small row exactly once), which is exactly
    * the property the deterministic full-row-hash salt guarantees across
    * stage retries (SPARK-23207).
    */
  def q27SkewSalted(s: SparkSession, dir: String): DataFrame = {
    val big = Tables.events(s, dir)
      .filter(col("user_id") < 100)
      .select((col("user_id") % 10).as("k"), col("event_id"),
        (dec2(col("value")) * 100).cast("long").as("cents"))
    val dim = Tables.nation(s, dir)
      .filter(col("n_nationkey") < 10)
      .select(col("n_nationkey").as("k"), col("n_name"))
    graft.operators.SkewJoin(big, dim, "k", salts = 8)
      .groupBy(col("n_name"))
      .agg(count(lit(1)).as("n"), sum(col("event_id")).as("sum_id"),
        sum(col("cents")).as("sum_cents"))
      .orderBy(col("n_name"))
  }

  val q27Oracle: String =
    """SELECT n_name, COUNT(*) AS n,
      |  CAST(SUM(event_id) AS BIGINT) AS sum_id,
      |  CAST(SUM(CAST(CAST(value AS DECIMAL(18,2)) * 100 AS BIGINT))
      |    AS BIGINT) AS sum_cents
      |FROM events JOIN nation ON user_id % 10 = n_nationkey
      |WHERE user_id < 100 AND n_nationkey < 10
      |GROUP BY n_name ORDER BY n_name""".stripMargin

  /** The automatic range-join REWRITE under the correctness gate — q19
    * proves the hand-built bucketed range join; this proves the
    * [[graft.plans.RangeJoinRewrite]] optimizer rule produces the same
    * answer from a BARE `p BETWEEN s AND e` join that a SQL user would
    * write. The query installs the rule, requires the nested-loop plan
    * is actually gone (a silent non-rewrite would still pass the hash —
    * the require makes the gate test the RULE, not just the fallback),
    * materializes eagerly while the rule is active (localCheckpoint —
    * plan optimization is lazy, and the rule must be present at
    * execution), then restores the session COMPLETELY: both the width
    * conf and the extraOptimizations list go back to their prior state,
    * so the rule never outlives the query (left installed, any later
    * code setting the conf would silently activate session-wide plan
    * rewrites).
    */
  def q28RangeRewrite(s: SparkSession, dir: String): DataFrame = {
    import graft.plans.RangeJoinRewrite
    val winNs = 600000000000L
    val ev = Tables.events(s, dir)
    val points = ev.select(col("event_id").as("pid"), col("ts").as("pts"))
    val campaigns = ev.filter(col("event_id") % 97 === 0)
      .select(col("event_id").as("campaign_id"), col("ts").as("cstart"),
        (col("ts") + winNs).as("cend"))
    val priorRules = s.experimental.extraOptimizations
    if (!priorRules.exists(_.isInstanceOf[RangeJoinRewrite]))
      s.experimental.extraOptimizations = priorRules :+ new RangeJoinRewrite
    s.conf.set(RangeJoinRewrite.WidthConf, winNs.toString)
    try {
      val agg = points.join(campaigns,
          col("pts") >= col("cstart") && col("pts") <= col("cend"))
        .groupBy(col("campaign_id"))
        .agg(count(lit(1)).as("n_events"), sum(col("pid")).as("checksum"))
        .orderBy(col("campaign_id"))
      val plan = agg.queryExecution.executedPlan.toString
      require(!plan.contains("BroadcastNestedLoopJoin") &&
        !plan.contains("CartesianProduct"),
        "the rewrite rule must replace the nested-loop range join")
      // staged on the AGGREGATE (campaign-cardinality rows), not the raw
      // join: the pair table is points-scale and a 10x probe measured
      // its localCheckpoint dominating the query 2.5x over q19
      agg.staged()
    } finally {
      s.conf.unset(RangeJoinRewrite.WidthConf)
      s.experimental.extraOptimizations = priorRules
    }
  }

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q1_agg" -> (q1Agg _),
    "q2_cogroup_join" -> (q2CogroupJoin _),
    "q3_distinct" -> (q3Distinct _),
    "q4_flatten_union" -> (q4FlattenUnion _),
    "q5_tagged_route" -> (q5TaggedRoute _),
    "q6_multi_join" -> (q6MultiJoin _),
    "q7_window" -> (q7Window _),
    "q8_topk" -> (q8TopK _),
    "q9_exists_semi" -> (q9ExistsSemi _),
    "q10_exists_anti" -> (q10ExistsAnti _),
    "q11_asof_join" -> (q11Asof _),
    "q12_set_ops" -> (q12SetOps _),
    "q13_rollup" -> (q13Rollup _),
    "q14_percentiles" -> (q14Percentiles _),
    "q15_lag_lead" -> (q15LagLead _),
    "q16_session_window" -> (q16SessionWindow _),
    "q17_pivot" -> (q17Pivot _),
    "q18_grouping_sets" -> (q18GroupingSets _),
    "q19_range_join" -> (q19RangeJoin _),
    "q20_contiguous_ids" -> (q20ContiguousIds _),
    "q21_range_frame" -> (q21RangeFrame _),
    "q22_unpivot" -> (q22Unpivot _),
    "q23_rank_family" -> (q23RankFamily _),
    "q24_corr_subquery" -> (q24CorrSubquery _),
    "q25_multi_distinct" -> (q25MultiDistinct _),
    "q26_argmax" -> (q26ArgMax _),
    "q27_skew_salted" -> (q27SkewSalted _),
    "q28_range_rewrite" -> (q28RangeRewrite _),
    "q29_interval_overlap" -> (q29IntervalOverlap _),
    "q30_exact_quantiles" -> (q30ExactQuantiles _),
    "q31_tree_closure" -> (q31TreeClosure _),
    "q32_funnel" -> (q32Funnel _),
    "q33_grouped_quantiles" -> (q33GroupedQuantiles _))

  val oracle: Map[String, String] = Map(
    "q1_agg" -> q1Oracle,
    "q2_cogroup_join" -> q2Oracle,
    "q3_distinct" -> q3Oracle,
    "q4_flatten_union" -> q4Oracle,
    "q5_tagged_route" -> q5Oracle,
    "q6_multi_join" -> q6Oracle,
    "q7_window" -> q7Oracle,
    "q8_topk" -> q8Oracle,
    "q9_exists_semi" -> q9Oracle,
    "q10_exists_anti" -> q10Oracle,
    "q11_asof_join" -> q11Oracle,
    "q12_set_ops" -> q12Oracle,
    "q13_rollup" -> q13Oracle,
    "q14_percentiles" -> q14Oracle,
    "q15_lag_lead" -> q15Oracle,
    "q16_session_window" -> q16Oracle,
    "q17_pivot" -> q17Oracle,
    "q18_grouping_sets" -> q18Oracle,
    "q19_range_join" -> q19Oracle,
    "q20_contiguous_ids" -> q20Oracle,
    "q21_range_frame" -> q21Oracle,
    "q22_unpivot" -> q22Oracle,
    "q23_rank_family" -> q23Oracle,
    "q24_corr_subquery" -> q24Oracle,
    "q25_multi_distinct" -> q25Oracle,
    "q26_argmax" -> q26Oracle,
    "q27_skew_salted" -> q27Oracle,
    "q28_range_rewrite" -> q19Oracle,
    "q29_interval_overlap" -> q29Oracle,
    "q30_exact_quantiles" -> q30Oracle,
    "q31_tree_closure" -> q31Oracle,
    "q32_funnel" -> q32Oracle,
    "q33_grouped_quantiles" -> q33Oracle)
}
