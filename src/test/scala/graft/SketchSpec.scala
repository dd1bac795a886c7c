package graft

import org.apache.spark.sql.Row
import org.apache.spark.sql.execution.adaptive.AdaptiveSparkPlanExec
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Misra–Gries top-k sketch ([[graft.expressions.MisraGriesTopK]]):
  * the oracle gate (t36) proves the exact regime; this spec pins the
  * properties the oracle can't reach — the eviction-regime error bounds,
  * the presence guarantee, partition-order independence of the exact
  * regime, and the map-side partial-aggregation plan shape that is the
  * whole point of the sketch at scale.
  */
class SketchSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark

  private def sketch(df: org.apache.spark.sql.DataFrame, k: Int)
      : Map[String, Long] = {
    graft.expressions.LongArrayOps.register(df.sparkSession)
    df.agg(expr(s"graft_topk_mg(key, $k)").as("sk"))
      .select(explode(col("sk")).as("e"))
      .select(col("e.key"), col("e.est"))
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
  }

  test("exact regime: distinct <= k reproduces the full group count " +
      "under any partitioning") {
    import spark.implicits._
    val rows = (0 until 3000).map(i => s"key_${i % 23}")
    val df = rows.toDF("key")
    val truth = rows.groupBy(identity).map { case (key, g) =>
      key -> g.size.toLong }
    for (parts <- Seq(1, 7, 32)) {
      val got = sketch(df.repartition(parts), 64)
      assert(got === truth, s"parts=$parts")
    }
  }

  test("eviction regime: undercount bounded by N/(k+1), heavy keys present") {
    import spark.implicits._
    val k = 16
    // Zipf-ish: key j appears 2000/(j+1) times over 500 distinct keys
    val rows = (0 until 500).flatMap(j => Seq.fill(2000 / (j + 1))(s"z$j"))
    val n = rows.size.toLong
    val truth = rows.groupBy(identity).map { case (key, g) =>
      key -> g.size.toLong }
    val got = sketch(rows.toDF("key").repartition(11), k)
    assert(got.nonEmpty && got.size <= k)
    val bound = n / (k + 1)
    got.foreach { case (key, est) =>
      val t = truth(key)
      assert(est <= t, s"$key overcounts: $est > $t")
      assert(t - est <= bound, s"$key undercounts past N/(k+1): " +
        s"$t - $est > $bound")
    }
    // every key heavier than N/(k+1) must survive eviction
    truth.filter(_._2 > bound).keys.foreach { key =>
      assert(got.contains(key), s"heavy key $key missing")
    }
  }

  test("plan: partial sketch merges map-side (ObjectHashAggregate pair)") {
    import spark.implicits._
    graft.expressions.LongArrayOps.register(spark)
    val df = (0 until 100).map(i => s"k${i % 5}").toDF("key")
      .repartition(4)
      .agg(expr("graft_topk_mg(key, 8)").as("sk"))
    df.collect()
    // AQE wraps executed stages in ShuffleQueryStage leaves that plain
    // collect won't descend into — assert on the rendered plan instead
    val plan = (df.queryExecution.executedPlan match {
      case a: AdaptiveSparkPlanExec => a.executedPlan
      case p => p
    }).toString
    assert("ObjectHashAggregate".r.findAllIn(plan).size === 2,
      s"expected partial+final ObjectHashAggregate, got:\n$plan")
    assert(plan.contains("partial_graft_topk_mg"),
      s"no map-side partial sketch:\n$plan")
  }

  test("stored-sketch merge: per-shard summaries fold into the direct " +
      "answer in the exact regime, bounds survive eviction") {
    import spark.implicits._
    graft.expressions.LongArrayOps.register(spark)
    // exact regime: 4 shards, 23 distinct keys, k=64 — merged == direct
    val rows = (0 until 3000).map(i => (i % 4, s"key_${i % 23}"))
    val direct = sketch(rows.map(_._2).toDF("key"), 64)
    val merged = rows.toDF("shard", "key")
      .groupBy(col("shard"))
      .agg(expr("graft_topk_mg(key, 64)").as("sk"))
      .agg(expr("graft_topk_merge(sk, 64)").as("sk"))
      .select(explode(col("sk")).as("e"))
      .select(col("e.key"), col("e.est"))
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(merged === direct)
    // eviction regime: shard-level k=16 summaries merged at k=16 keep
    // the MG bounds against the raw truth
    val k = 16
    val zipf = (0 until 500).flatMap(j =>
      Seq.fill(2000 / (j + 1))((j % 8, s"z$j")))
    val n = zipf.size.toLong
    val truth = zipf.groupBy(_._2).map { case (key, g) =>
      key -> g.size.toLong }
    val got = zipf.toDF("shard", "key")
      .groupBy(col("shard"))
      .agg(expr(s"graft_topk_mg(key, $k)").as("sk"))
      .agg(expr(s"graft_topk_merge(sk, $k)").as("sk"))
      .select(explode(col("sk")).as("e"))
      .select(col("e.key"), col("e.est"))
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(got.nonEmpty && got.size <= k)
    val bound = n / (k + 1)
    got.foreach { case (key, est) =>
      assert(est <= truth(key) && truth(key) - est <= bound,
        s"$key: est $est vs true ${truth(key)}, bound $bound")
    }
  }

  test("null keys are ignored; an empty group yields an empty summary") {
    graft.expressions.LongArrayOps.register(spark)
    import spark.implicits._
    val df = Seq(Some("a"), None, Some("a"), None).toDF("key")
    val got = sketch(df, 4)
    assert(got === Map("a" -> 2L))
    val empty = spark.createDataFrame(
      spark.sparkContext.emptyRDD[Row],
      new org.apache.spark.sql.types.StructType()
        .add("key", org.apache.spark.sql.types.StringType))
      .agg(expr("graft_topk_mg(key, 4)").as("sk"))
      .select(size(col("sk"))).collect()(0).getInt(0)
    assert(empty === 0)
  }
}
