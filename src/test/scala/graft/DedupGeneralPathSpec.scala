package graft

import java.nio.file.Files

import org.apache.spark.sql.functions.{col, explode}
import org.scalatest.funsuite.AnyFunSuite

import graft.queries.DedupQueries

/** The driver corpus has a tiny shingle vocabulary, so the dedup queries
  * always take the bitset / degenerate-LSH branches there. This spec
  * builds a HIGH-diversity corpus (random text over a 40-char alphabet →
  * vocabulary far beyond the bitset cap) with planted duplicate and
  * near-duplicate pairs, so the general paths — PPJoin prefix filtering,
  * sorted-merge verification, healthy banded LSH — actually execute and
  * must find exactly the planted pairs.
  */
class DedupGeneralPathSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark

  private lazy val dir: String = {
    import spark.implicits._
    val alphabet = "abcdefghijklmnopqrstuvwxyz0123456789 .,!"
    val rnd = new scala.util.Random(20260812L)
    def randomDoc(len: Int): String =
      Array.fill(len)(alphabet(rnd.nextInt(alphabet.length))).mkString
    val randoms = (0L until 50L).map(i => (i, randomDoc(600)))
    val dupA = randomDoc(600)
    val nearA = dupA.updated(300, '#')
    val docs = randoms ++ Seq((1000L, dupA), (1001L, dupA),
      (1002L, dupA), (1003L, nearA))
    val base = Files.createTempDirectory("graft-genpath").toString
    docs.toDF("doc_id", "text").write.parquet(s"$base/documents.parquet")
    base
  }

  test("simhash banded scale path returns exactly the broadcast-scan " +
      "result") {
    // the broadcast hamming scan is exact by construction; the banded
    // triple-key join is the >cap scale path and rests on the pigeonhole
    // recall argument — forcing the cap to 0 must reproduce the exact
    // result pair-for-pair (hd included)
    val sf = "/root/testdata/sf0.001"
    val exact = SparkEntry.queries("d4_simhash")(spark, sf)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getInt(2))).toSet
    spark.conf.set("spark.graft.dedup.maxBroadcastSigs", "0")
    try {
      val banded = SparkEntry.queries("d4_simhash")(spark, sf)
        .collect().map(r => (r.getLong(0), r.getLong(1), r.getInt(2))).toSet
      assert(banded == exact,
        s"banded path diverged: missing=${(exact -- banded).take(5)} " +
          s"extra=${(banded -- exact).take(5)}")
      assert(exact.nonEmpty, "sf0.001 must contain hd<=6 pairs or the " +
        "equivalence proves nothing")
    } finally spark.conf.unset("spark.graft.dedup.maxBroadcastSigs")
  }

  test("PPJoin + sorted-merge verification find exactly the planted pairs") {
    val pairs = DedupQueries.jaccardPairs(spark, dir, 0.8)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    // 1000=1001=1002 identical (jac 1.0 pairwise); 1003 one char off
    assert(pairs == Set((1000L, 1001L), (1000L, 1002L), (1001L, 1002L),
      (1000L, 1003L), (1001L, 1003L), (1002L, 1003L)))
  }

  test("the forced block sweeps reproduce the prefix routes' results " +
      "exactly (d2 pair set, d19 census)") {
    // sweepCandRatio=0 forces the census-gated escapes the heaps-law
    // octave added — same corpora, index route vs blocked sweep must be
    // row-identical
    val ppJoin = DedupQueries.jaccardPairs(spark, dir, 0.8)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2)))
      .toSet
    val d19Pref = SparkEntry.queries("d19_containment")(spark, dir)
      .collect().map(_.toSeq).toSeq
    spark.conf.set("spark.graft.dedup.sweepCandRatio", "0")
    try {
      val swept = DedupQueries.jaccardPairs(spark, dir, 0.8)
        .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2)))
        .toSet
      assert(swept == ppJoin,
        s"missing=${(ppJoin -- swept).take(5)} extra=${(swept -- ppJoin).take(5)}")
      assert(ppJoin.nonEmpty, "planted pairs required")
      val d19Swept = SparkEntry.queries("d19_containment")(spark, dir)
        .collect().map(_.toSeq).toSeq
      assert(d19Swept == d19Pref,
        s"containment census diverged: $d19Swept vs $d19Pref")
    } finally spark.conf.unset("spark.graft.dedup.sweepCandRatio")
  }

  test("healthy banded LSH finds the planted pairs without degenerating") {
    val pairs = DedupQueries.dMinhashLsh(spark, dir)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    // identical docs collide in every band; the near-dup shares ~99% of
    // shingles so all 16 minhashes are overwhelmingly likely to agree
    assert(pairs.contains((1000L, 1001L)))
    assert(pairs.contains((1000L, 1002L)))
    assert(pairs.contains((1001L, 1002L)))
    // no false positives among the 50 random docs
    assert(pairs.forall { case (a, b) => a >= 1000L && b >= 1000L })
  }

  test("the banded bucket sweep equals a brute-force band-agreement + " +
      "exact-jaccard replay, pair for pair") {
    // independent reference: every doc pair, jaccard on distinct char
    // trigrams, band agreement on the engine's own minhash formula —
    // the full semantics of the banded route with no shared code path
    val docs = spark.read.parquet(s"$dir/documents.parquet")
      .collect().map(r => (r.getLong(0), r.getString(1))).sortBy(_._1)
    val P = 1000000007L
    // jaccard sets use the raw (injective) packed trigrams like the
    // engine's gs; only the minhash goes through the mod-P hash
    def tris(t: String): Set[Long] =
      (0 until t.length - 2).map(i => (t(i).toLong << 32) |
        (t(i + 1).toLong << 16) | t(i + 2).toLong).toSet
    def mh16(t: String): Array[Long] = {
      val mins = Array.fill(16)(P)
      (0 until t.length - 2).foreach { i =>
        val h = ((t(i).toLong * 31 + t(i + 1)) * 31 + t(i + 2)) % P
        for (k <- 0 until 16) {
          val p = ((2 * k + 1) * h + 7 * k + 3) % P
          if (p < mins(k)) mins(k) = p
        }
      }
      mins
    }
    val sets = docs.map { case (_, t) => tris(t) }
    val sigs = docs.map { case (_, t) => mh16(t) }
    val expected = (for {
      i <- docs.indices; j <- (i + 1) until docs.length
      if (0 until 4).exists(b => (0 until 4).forall(k =>
        sigs(i)(b * 4 + k) == sigs(j)(b * 4 + k)))
      inter = (sets(i) & sets(j)).size
      jac = inter.toDouble / (sets(i).size + sets(j).size - inter)
      if jac >= 0.8
    } yield (docs(i)._1, docs(j)._1, jac)).toSet
    val got = SparkEntry.queries("d3_minhash_lsh")(spark, dir)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2)))
      .toSet
    assert(got == expected,
      s"missing=${(expected -- got).take(5)} extra=${(got -- expected).take(5)}")
    assert(expected.nonEmpty, "the planted pairs must make this non-vacuous")
  }

  test("clustering elects one keeper across the planted component") {
    val rows = DedupQueries.dCluster(spark, dir)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toMap
    // all four planted docs form one component with keeper 1000
    assert(rows.get(1000L).contains(4L))
  }

  /** Small-vocabulary corpus ABOVE the broadcast-docs cap: the scale
    * hazard the route must survive is "vocabulary fits the bitset but the
    * corpus doesn't fit a broadcast" — a billion docs over a small
    * shingle alphabet. 30 docs over an 8-char alphabet (vocab ≤ 512
    * trigrams → bitset representation) with the cap forced to 10.
    */
  private lazy val smallVocabDir: String = {
    import spark.implicits._
    val alphabet = "abcdefgh"
    val rnd = new scala.util.Random(42L)
    def doc(len: Int): String =
      Array.fill(len)(alphabet(rnd.nextInt(alphabet.length))).mkString
    val randoms = (0L until 28L).map(i => (i, doc(40)))
    val dup = doc(40)
    val docs = randoms ++ Seq((100L, dup), (101L, dup))
    val base = Files.createTempDirectory("graft-smallvocab").toString
    docs.toDF("doc_id", "text").write.parquet(s"$base/documents.parquet")
    base
  }

  test("d20's sampling keep rule is exact on the general (over-cap) " +
      "route: bucket totals count exactly the id-rule-kept pairs") {
    // the genpath corpus's vocabulary exceeds the bitset cap, so this
    // runs the crossJoin route — the one the oracle can't reach (the
    // driver corpus always routes dense). The keep rule is pure id
    // arithmetic, so the expected sampled-pair total is computable
    // from ids alone; bucket-level statistics are oracle-pinned on the
    // dense route and the bucketing code is shared between routes.
    val ids = spark.read.parquet(s"$dir/documents.parquet")
      .select(col("doc_id")).collect().map(_.getLong(0)).sorted
    def pairCount(keep: (Long, Long) => Boolean): Long =
      (for (a <- ids if a < 30; b <- ids if a < b && keep(a, b)) yield 1L).sum
    val expAll = pairCount((_, _) => true)
    val expKept = pairCount((a, b) => (a * 1000003L + b) % 64 < 8)
    assert(expKept > 0 && expKept < expAll,
      "the planted corpus must make sampling non-trivial")
    val d20 = SparkEntry.queries("d20_sampled_calib")(spark, dir)
      .collect()
    assert(d20.map(_.getLong(1)).sum == expKept,
      "n_sampled must total exactly the id-rule-kept pairs")
    assert(d20.forall(r => r.getLong(2) == r.getLong(1) * 8),
      "n_est must be the 1/r-scaled sampled count")
    val d16 = SparkEntry.queries("d16_minhash_calib")(spark, dir)
      .collect()
    assert(d16.map(_.getLong(1)).sum == expAll,
      "the unsampled census must still see every probe pair")
  }

  test("bitset pair scan drops the broadcast above the corpus-size cap") {
    def run(): (Set[(Long, Long)], String) = {
      val (pairs, base) =
        DedupQueries.jaccardPairsWithBase(spark, smallVocabDir, 0.8)
      val analyzed = pairs.queryExecution.analyzed.toString
      val got = pairs.collect().map(r => (r.getLong(0), r.getLong(1))).toSet
      base.unpersist()
      (got, analyzed)
    }
    val (bcastPairs, bcastPlan) = run()
    // below the cap the FUSED scan runs: the packed corpus travels as
    // one broadcast variable and pairs are produced inside each row —
    // no join of any kind in the plan
    assert(!bcastPlan.contains("Join"),
      s"below the cap the fused scan must not plan a join:\n$bcastPlan")
    spark.conf.set("spark.graft.dedup.maxBroadcastDocs", "10")
    try {
      val (blockedPairs, blockedPlan) = run()
      assert(!blockedPlan.contains("ResolvedHint"),
        "above the cap nothing may be broadcast — blocked scan only")
      assert(blockedPairs == bcastPairs,
        "blocked and broadcast scans must produce identical pairs")
      assert(blockedPairs.contains((100L, 101L)))
      // different block count (cap 3 → 10 blocks) must not change results
      spark.conf.set("spark.graft.dedup.maxBroadcastDocs", "3")
      assert(run()._1 == bcastPairs,
        "pair set must be block-count invariant")
    } finally spark.conf.unset("spark.graft.dedup.maxBroadcastDocs")
  }

  test("d19 containment takes the prefix-filtered overlap join on a " +
      "high-diversity corpus and finds exactly the brute-force census") {
    import spark.implicits._
    // plant true containment: doc 2000 is a strict prefix of the dupA
    // family (1000–1003) — near-zero jaccard pairs vs the randoms, but
    // bp=10000 containment inside each family member
    val baseDocs = spark.read.parquet(s"$dir/documents.parquet")
      .as[(Long, String)].collect().toSeq
    val contained = baseDocs.find(_._1 == 1000L).get._2.take(200)
    val d2 = Files.createTempDirectory("graft-contain").toString
    (baseDocs :+ (2000L, contained)).toDF("doc_id", "text")
      .write.parquet(s"$d2/documents.parquet")
    // the vocabulary (~40³ trigram space) exceeds the 16384-bit bitset
    // cap, which is exactly vocabOf's routing condition — so equality
    // with the brute census below proves the PREFIX path is exact (the
    // staged result hides the plan, so the route is pinned by its
    // precondition on the data, not by plan text)
    val vocabSize = spark.read.parquet(s"$d2/documents.parquet")
      .select(explode(graft.functions.DedupFunctions
        .shinglesPacked3(col("text")))).distinct().count()
    assert(vocabSize > 16384,
      s"corpus must exceed the bitset cap to route the prefix path " +
        s"(got $vocabSize distinct shingles)")
    val q = SparkEntry.queries("d19_containment")(spark, d2)
    val got = q.collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3)))
      .toSeq
    // brute-force reference over the same trigram sets
    val sets = (baseDocs :+ (2000L, contained)).map { case (id, t) =>
      id -> t.sliding(3).toSet
    }
    val brute = (for {
      (ia, ga) <- sets; (ib, gb) <- sets if ia < ib
      small = math.min(ga.size, gb.size) if small >= 30
      bp = 10000L * (ga & gb).size / small if bp >= 9000
    } yield (bp / 1000, ia, ib))
      .groupBy(_._1).toSeq
      .map { case (band, xs) =>
        (band, xs.size.toLong, xs.map(_._2).sum, xs.map(_._3).sum)
      }
      .sortBy(_._1)
    assert(got == brute,
      s"containment census diverged: got=$got expected=$brute")
    assert(brute.nonEmpty && brute.map(_._2).sum >= 10,
      "the planted family must produce containment pairs or the " +
        "equivalence proves nothing")
  }

  test("d19 containment's blocked pair scan (above the broadcast cap) " +
      "matches the broadcast scan") {
    val sf = "/root/testdata/sf0.001"
    def run() = SparkEntry.queries("d19_containment")(spark, sf)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2),
        r.getLong(3))).toSeq
    val bcast = run()
    spark.conf.set("spark.graft.dedup.maxBroadcastDocs", "10")
    try {
      assert(run() == bcast,
        "blocked and broadcast containment scans must census identically")
      assert(bcast.nonEmpty && bcast.map(_._2).sum > 0,
        "sf0.001 must contain containment pairs or the equivalence " +
          "proves nothing")
    } finally spark.conf.unset("spark.graft.dedup.maxBroadcastDocs")
  }

  test("d9 contamination routes oversized benchmark vocabularies " +
      "through the bloom-prefiltered join, identically") {
    val sf = "/root/testdata/sf0.001"
    val closure = DedupQueries.contaminationReport(spark, sf, 1 << 18)
    val forced = DedupQueries.contaminationReport(spark, sf, 4)
    assert(forced.queryExecution.executedPlan.toString
      .contains("might_contain"),
      "above the cap the benchmark vocabulary must never collect — the " +
        "bloom prefilter + exact semi-join must plan instead")
    assert(forced.collect().toSeq == closure.collect().toSeq,
      "both routes must produce identical contamination reports")
  }
}
