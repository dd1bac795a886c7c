package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.operators.SkewJoin

class SkewJoinSpec extends AnyFunSuite {

  test("salted join returns exactly the plain join's rows") {
    val spark = TestSpark.spark
    import spark.implicits._
    // key 1 is hot on the big side; small side has duplicate keys too
    val big = ((1 to 50).map(i => (1L, s"b$i")) ++
      Seq((2L, "x"), (3L, "y"))).toDF("k", "bv")
    val small = Seq((1L, "s1"), (1L, "s2"), (2L, "s3"), (4L, "s4"))
      .toDF("k", "sv")
    val plain = big.join(small, Seq("k"))
      .select(col("k"), col("bv"), col("sv"))
      .collect().map(_.toString).sorted
    val salted = SkewJoin(big, small, "k", salts = 8)
      .select(col("k"), col("bv"), col("sv"))
      .collect().map(_.toString).sorted
    assert(salted.toSeq == plain.toSeq)
    assert(plain.length == 50 * 2 + 1) // hot key x2 matches + key 2
  }

  test("AQE skew-join is the first resort: planted skew splits at runtime") {
    val spark = TestSpark.spark
    import spark.implicits._
    // one key carries ~all rows; with aggressive thresholds AQE must
    // mark the sort-merge join skew-handled (manual salting is for when
    // AQE can't apply — see SkewJoin's doc)
    val confs = Seq(
      "spark.sql.adaptive.enabled" -> "true",
      "spark.sql.adaptive.skewJoin.enabled" -> "true",
      "spark.sql.adaptive.skewJoin.skewedPartitionFactor" -> "1.2",
      "spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes" -> "256",
      "spark.sql.adaptive.advisoryPartitionSizeInBytes" -> "256",
      "spark.sql.autoBroadcastJoinThreshold" -> "-1")
    val prev = confs.map { case (k, _) => k -> spark.conf.getOption(k) }
    confs.foreach { case (k, v) => spark.conf.set(k, v) }
    try {
      val big = (1 to 20000).map(i =>
        (if (i % 100 == 0) i.toLong else 7L, s"payload-$i")).toDF("k", "bv")
      val small = (1L to 200L).map(k => (k, s"s$k")).toDF("k", "sv")
      val joined = big.join(small, Seq("k"))
      // materialize THIS dataset (count() plans a separate tree and the
      // captured plan would stay isFinalPlan=false)
      val n = joined.collect().length
      assert(n > 19000)
      val plan = joined.queryExecution.executedPlan.toString
      assert(plan.contains("skew=true"),
        "AQE must split the skewed partition at runtime:\n" + plan)
    } finally prev.foreach {
      case (k, Some(v)) => spark.conf.set(k, v)
      case (k, None) => spark.conf.unset(k)
    }
  }

  test("saltCols salts unhashable-payload rows by the chosen subset") {
    val spark = TestSpark.spark
    import spark.implicits._
    // a map payload would fail xxhash64 over all columns — restrict the
    // salt hash to the hashable subset
    val big = ((1 to 20).map(i => (1L, s"b$i", Map("m" -> i))) ++
      Seq((2L, "x", Map("m" -> 0)))).toDF("k", "bv", "mp")
    val small = Seq((1L, "s1"), (2L, "s2")).toDF("k", "sv")
    val plain = big.join(small, Seq("k"))
      .select(col("k"), col("bv"), col("sv"))
      .collect().map(_.toString).sorted
    val salted = SkewJoin(big, small, "k", salts = 4,
        saltCols = Seq("k", "bv"))
      .select(col("k"), col("bv"), col("sv"))
      .collect().map(_.toString).sorted
    assert(salted.toSeq == plain.toSeq)
  }
}
