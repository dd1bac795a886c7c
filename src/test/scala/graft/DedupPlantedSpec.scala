package graft

import java.nio.file.Files

import org.scalatest.funsuite.AnyFunSuite

import graft.queries.DedupQueries

/** Planted-expectation tests for the round-4 dedup operators: the oracle
  * gate proves Spark and DuckDB compute the same formula, while these pin
  * the formula itself to hand-computed outputs on corpora built to
  * exercise each semantic edge (cross-document vs within-document spans,
  * cross-block vs within-block pairs, partial shingle overlap).
  */
class DedupPlantedSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark

  private def writeDocs(rows: Seq[(Long, String)]): String = {
    import spark.implicits._
    val base = Files.createTempDirectory("graft-planted").toString
    rows.toDF("doc_id", "text").write.parquet(s"$base/documents.parquet")
    base
  }

  test("d10: span census counts cross-document duplication only") {
    val dir = writeDocs(Seq(
      (1L, "one two three four five alpha"),
      (2L, "zz one two three four five yy"),
      (3L, "completely different words here now indeed"),
      // within-doc repetition alone (span repeats INSIDE doc 4 but
      // appears in no other doc) must not count as duplication
      (4L, "p q r s t p q r s t")))
    val rows = DedupQueries.dSubstringDedup(spark, dir).collect()
      .map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2), r.getLong(3))))
      .toMap
    // doc1: 2 windows, 1 span shared with doc2 ("one two three four five")
    assert(rows(1L) == ((2L, 1L, 1L)))
    // doc2: 3 windows, the shared span occurs once
    assert(rows(2L) == ((3L, 1L, 1L)))
    // doc3: 2 windows, nothing shared
    assert(rows(3L) == ((2L, 0L, 0L)))
    // doc4: 6 windows; "p q r s t" twice — within one doc only, nd = 1
    assert(rows(4L) == ((6L, 0L, 0L)))
  }

  test("d13: only cross-block pairs are reported") {
    val filler = (20L until 60L).map(i =>
      (i, s"filler document number $i with its own distinct words $i$i"))
    val corpusFiller = (200L until 240L).map(i =>
      (i, s"corpus document number $i and different content entirely $i$i"))
    val shared = "this exact duplicated text appears on both sides " * 3
    val blockDup = "a block-internal duplicate that repeats " * 3
    val corpDup = "a corpus-internal duplicate that repeats " * 3
    val dir = writeDocs(filler ++ corpusFiller ++ Seq(
      (5L, shared), (1005L, shared),     // cross-block pair → reported
      (6L, blockDup), (7L, blockDup),    // both in the block → NOT reported
      (1006L, corpDup), (1007L, corpDup) // both in the corpus → NOT reported
    ))
    val pairs = DedupQueries.dIncrementalLsh(spark, dir).collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(pairs.contains((5L, 1005L)))
    assert(!pairs.exists { case (a, b) => a >= 100L || b < 100L },
      s"only (new, corpus) pairs may appear: $pairs")
    assert(!pairs.contains((6L, 7L)) && !pairs.contains((1006L, 1007L)))
  }

  test("d12: overlap counts equal exact distinct shared shingles") {
    val dir = writeDocs(Seq(
      (0L, "abcdef"),              // bench: shingles abc bcd cde def
      (10L, "abcxyz"),             // shares only "abc"
      (11L, "qrstuv"),             // shares nothing → absent
      (12L, "zabcdez")))           // shares abc bcd cde → 3
    val rows = DedupQueries.dBloomPrefilter(spark, dir).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(rows == Map(10L -> 1L, 12L -> 3L))
  }
}
