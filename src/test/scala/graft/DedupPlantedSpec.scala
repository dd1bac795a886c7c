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

  private def writeDocsFull(rows: Seq[(Long, String, String)]): String = {
    import spark.implicits._
    val base = Files.createTempDirectory("graft-planted").toString
    rows.map { case (id, text, lang) => (id, text, lang, text.length.toLong) }
      .toDF("doc_id", "text", "lang", "n_chars")
      .write.parquet(s"$base/documents.parquet")
    base
  }

  test("d15: election keeps the longest member; exact ties fall to lowest id") {
    val near = "the quick brown fox jumps over the lazy dog again " * 3
    val twin = "equal twins text body repeated here " * 4
    val dir = writeDocsFull(Seq(
      (1L, near, "en"),
      // a short tail: still jaccard ≥ 0.8 with doc 1, strictly longer →
      // doc 2 must win the election despite the higher id
      (2L, near + " zz", "en"),
      (3L, "an unrelated singleton document with its own words", "fr"),
      // identical text (jaccard 1) and identical n_chars → tie falls to
      // the lower doc_id
      (10L, twin, "de"),
      (11L, twin, "de")))
    val rows = DedupQueries.d15Canonical(spark, dir).collect()
      .map(r => r.getString(0) ->
        ((r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4)))).toMap
    assert(rows("en") == ((2L, 1L, 2L, 1L)),
      s"longest member (doc 2) must be kept: ${rows("en")}")
    assert(rows("de") == ((2L, 1L, 10L, 11L)),
      s"tie must fall to the lowest id: ${rows("de")}")
    assert(rows("fr") == ((1L, 1L, 3L, 0L)), "singletons keep themselves")
  }

  test("t16: a transposition (edit distance 2) survives the neighborhood join") {
    val dir = writeDocs(Seq((1L, "abcd abdc xyz")))
    val pairs = graft.queries.TextQueries.queries("t16_fuzzy_words")(
      spark, dir).collect().map(r =>
      (r.getString(0), r.getString(1), r.getLong(2))).toSet
    assert(pairs == Set(("abcd", "abdc", 2L)),
      s"expected exactly the transposed pair, got $pairs")
  }
}
