package graft

import org.apache.spark.sql.SparkSession
import org.scalatest.funsuite.AnyFunSuite

import graft.expressions.GraftExtensions

class GraftExtensionsSpec extends AnyFunSuite {

  test("extensions install the native kernels for SQL use") {
    // getOrCreate would hand back the shared test session (ignoring
    // withExtensions), so clear the active/default slots to force a fresh
    // session on the same SparkContext, and restore them after.
    val existing = TestSpark.spark
    SparkSession.clearActiveSession()
    SparkSession.clearDefaultSession()
    try {
      val spark = SparkSession.builder()
        .master("local[2]")
        .appName("graft-ext-test")
        .withExtensions(new GraftExtensions()(_))
        .getOrCreate()
      val row = spark.sql(
        """SELECT
          |  graft_intersect_bits(array(3L, 12L), array(1L, 4L)) AS ib,
          |  graft_dot_long(array(2L, 3L), array(4L, 5L)) AS dot,
          |  graft_sorted_intersect_count(array(1L, 5L, 9L),
          |    array(5L, 9L, 11L)) AS sic""".stripMargin).first()
      assert(row.getInt(0) == 2)  // popcount(3&1) + popcount(12&4) = 1 + 1
      assert(row.getLong(1) == 23L)
      assert(row.getInt(2) == 2)
      // the sketch aggregates and the bloom pair ride the same injection
      val agg = spark.sql(
        """SELECT
          |  graft_elementwise_min(v) AS mn,
          |  graft_elementwise_max(v) AS mx
          |FROM VALUES (array(3L, 9L)), (array(5L, 2L)) AS t(v)""".stripMargin)
        .first()
      assert(agg.getSeq[Long](0) == Seq(3L, 2L))
      assert(agg.getSeq[Long](1) == Seq(5L, 9L))
      val bloom = spark.sql(
        """WITH b AS (SELECT graft_bloom_agg(x, 10L, 1000L) AS bf
          |  FROM VALUES (1L), (2L), (3L) AS t(x))
          |SELECT graft_might_contain((SELECT bf FROM b), 2L) AS hit,
          |       graft_might_contain((SELECT bf FROM b), 99L) AS miss"""
          .stripMargin).first()
      assert(bloom.getBoolean(0))
      assert(!bloom.getBoolean(1))
    } finally {
      SparkSession.setDefaultSession(existing)
      SparkSession.setActiveSession(existing)
    }
  }
}
