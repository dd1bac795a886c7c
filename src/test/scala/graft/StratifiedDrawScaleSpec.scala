package graft

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.queries.TextQueries

/** The de-skewed threshold draw and sub-shard packing must be
  * BIT-IDENTICAL to the naive full-window formulations they replaced —
  * the sf0.01 oracle (500 docs, ≤2 buckets occupied per language) cannot
  * exercise a populated 4096-bucket histogram, boundary buckets holding
  * many rows, languages landing exactly on their quota, or quota-0 /
  * quota-exceeds-stratum edges. This spec replays the OLD window
  * implementations inline on a 200k-row skewed corpus (en ≈ 43%, the
  * TESTDATA shape) and asserts exact equality.
  */
class StratifiedDrawScaleSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark

  private val n = 200000L

  // en ≈ 43%, nineteen other languages sharing the rest — the TESTDATA
  // skew shape that makes partitionBy(lang) a scale-killer
  private lazy val docs: DataFrame = {
    val bucket = pmod(col("id") * 2654435761L, lit(100L))
    spark.range(n)
      .select(col("id").as("doc_id"),
        when(bucket < 43, "en")
          .otherwise(concat(lit("l"), (bucket % 19).cast("string")))
          .as("lang"))
      .localCheckpoint()
  }

  private def oldDraw(quotas: DataFrame): DataFrame = {
    val h = (col("doc_id") * 1103515245L + 12345L) % 2147483648L
    val w = Window.partitionBy(col("lang")).orderBy(col("h"), col("doc_id"))
    docs.select(col("doc_id"), col("lang"), h.as("h"))
      .withColumn("rn", row_number().over(w))
      .join(broadcast(quotas), "lang")
      .filter(col("rn") <= col("quota"))
      .select(col("doc_id"), col("lang"), col("h"))
  }

  private def drawKeeps(quotas: DataFrame): (Set[Long], Set[Long]) = {
    val neu = TextQueries.stratifiedDraw(
        docs.select(col("doc_id"), col("lang")), quotas)
      .select(col("doc_id")).collect().map(_.getLong(0)).toSet
    val old = oldDraw(quotas)
      .select(col("doc_id")).collect().map(_.getLong(0)).toSet
    (neu, old)
  }

  test("threshold draw ≡ window rank on 200k skewed rows, " +
      "across quota edges") {
    import spark.implicits._
    // quotas stressing every branch: deep draws (boundary bucket must
    // split), quota 1 (boundary = first occupied bucket), quota 0 (keep
    // nothing), quota > stratum size (keep everything / bb = -1), and a
    // quota landing exactly on a stratum's size
    val langs = docs.select(col("lang")).distinct().as[String].collect()
    val sizes = docs.groupBy(col("lang")).count()
      .as[(String, Long)].collect().toMap
    val exact = sizes.head // quota == stratum size exactly
    val quotas = langs.toSeq.toDF("lang").withColumn("quota",
      when(col("lang") === exact._1, exact._2)
        .when(col("lang") === "en", 40000L) // deep: ~47% of the stratum
        .when(col("lang") === "l0", 0L)
        .when(col("lang") === "l1", 1L)
        .when(col("lang") === "l2", 10000000L) // far beyond stratum size
        .otherwise(1234L))
    val (neu, old) = drawKeeps(quotas)
    assert(neu.size == old.size,
      s"kept-set sizes differ: new ${neu.size} vs old ${old.size}")
    assert(neu == old, {
      val d1 = (neu -- old).take(5); val d2 = (old -- neu).take(5)
      s"draws differ: new-only $d1, old-only $d2"
    })
  }

  test("sub-shard packing census ≡ per-language window cumsum at 200k") {
    // the packing census depends on every doc's exact running-sum value,
    // so equality here pins the shard-offset arithmetic end to end.
    // Token counts vary per doc (1..16) to make straddling non-trivial.
    val budget = 256L
    val toks = docs
      .select(col("doc_id"), col("lang"),
        (pmod(col("doc_id") * 48271L, lit(16L)) + 1L).as("tok"))
    val wOld = Window.partitionBy(col("lang")).orderBy(col("doc_id"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    def census(withCum: DataFrame): Array[org.apache.spark.sql.Row] =
      withCum.select(col("doc_id"), col("lang"), col("tok"),
          ((col("cum") - col("tok")) / budget).cast("long").as("first_seq"),
          ((col("cum") - 1) / budget).cast("long").as("last_seq"))
        .groupBy(col("lang"))
        .agg(count(lit(1)).as("n_docs"), sum(col("tok")).as("total_tokens"),
          (max(col("last_seq")) + 1).as("n_seqs"),
          sum(when(col("first_seq") =!= col("last_seq"), 1L).otherwise(0L))
            .as("n_straddlers"),
          sum(col("first_seq")).as("placement_checksum"))
        .orderBy(col("lang")).collect()
    val old = census(toks.withColumn("cum", sum(col("tok")).over(wOld)))
    // the PRODUCTION shard-offset arithmetic, not a copy of it
    val neu = census(TextQueries.packedCum(toks, shardSpan = 128L))
    assert(neu.toSeq == old.toSeq)
  }
}
