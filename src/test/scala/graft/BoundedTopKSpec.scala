package graft

import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window
import org.scalatest.funsuite.AnyFunSuite

/** graft_topk_by must be BIT-IDENTICAL to the rank window it replaces —
  * including score ties (id tiebreak), negative doubles, ±0.0, and
  * results smaller than k — under both orders and both score types.
  */
class BoundedTopKSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  private def windowTopK(df: org.apache.spark.sql.DataFrame, score: String,
      asc: Boolean, k: Int) = {
    val ord = if (asc) col(score).asc else col(score).desc
    df.withColumn("rk", row_number().over(
        Window.partitionBy(col("g")).orderBy(ord, col("id"))))
      .filter(col("rk") <= k)
      .select(col("g"), col("rk"), col("id"), col(score))
      .orderBy(col("g"), col("rk"))
      .collect().toSeq
  }

  private def aggTopK(df: org.apache.spark.sql.DataFrame, score: String,
      asc: Boolean, k: Int) = {
    graft.expressions.LongArrayOps.register(spark)
    graft.functions.RankFunctions.topKPerGroup(df, "g", score, "id", k, asc)
      .select(col("g"), col("rk"), col("id"), col(score))
      .orderBy(col("g"), col("rk"))
      .collect().toSeq
  }

  test("long scores match the window under ties, both orders, k > group") {
    // deterministic LCG rows: many tied scores force the id tiebreak;
    // group 7 has fewer than k rows
    val rows = (0 until 4000).map { i =>
      val g = (i * 2654435761L) % 7
      val sc = ((i * 1103515245L + 12345L) % 13) - 6L
      (g, sc, i.toLong)
    } ++ Seq((7L, 1L, 9000L), (7L, 1L, 9001L))
    val df = rows.toDF("g", "sc", "id")
    for (asc <- Seq(true, false); k <- Seq(1, 5, 12)) {
      assert(aggTopK(df, "sc", asc, k) === windowTopK(df, "sc", asc, k),
        s"asc=$asc k=$k")
    }
  }

  test("double scores match the window incl. negatives and zero") {
    val rows = (0 until 3000).map { i =>
      val g = (i * 48271L) % 5
      val sc = (((i * 69621L) % 101) - 50).toDouble / 7.0
      (g, sc, i.toLong)
    } ++ Seq((0L, 0.0, 9000L), (0L, -0.0, 9001L)) // ±0.0 tie on id
    val df = rows.toDF("g", "sc", "id")
    for (asc <- Seq(true, false); k <- Seq(3, 10)) {
      assert(aggTopK(df, "sc", asc, k) === windowTopK(df, "sc", asc, k),
        s"asc=$asc k=$k")
    }
  }

  test("double encode/decode is a bijection on the values that matter") {
    import graft.expressions.TopKBy._
    for (d <- Seq(0.0, 1.0, -1.0, 0.3333333333333333, -1e300, 1e-300,
        Double.MaxValue, Double.MinPositiveValue, -Double.MaxValue)) {
      assert(decodeDouble(encodeDouble(d)) === d)
    }
    // order-isomorphic
    val vals = Seq(-1e300, -2.5, -1e-300, 0.0, 1e-300, 2.5, 1e300)
    assert(vals.map(encodeDouble).sliding(2).forall(p => p(0) < p(1)))
    // -0.0 normalizes to 0.0 (SQL comparison semantics)
    assert(encodeDouble(-0.0) === encodeDouble(0.0))
  }

  test("serialize/deserialize roundtrips the heap and merge accepts " +
      "a deserialized buffer") {
    import graft.expressions.{TopKBy, TopKHeap}
    import org.apache.spark.sql.catalyst.expressions.{BoundReference,
      Literal}
    import org.apache.spark.sql.types.LongType
    val agg = TopKBy(BoundReference(0, LongType, nullable = true),
      BoundReference(1, LongType, nullable = true), k = 5, asc = true)
    val a = new TopKHeap(5)
    // LCG stream with ties
    var x = 7L
    (0 until 200).foreach { i =>
      x = (x * 1103515245L + 12345L) % 97L
      a.insert(x, i.toLong)
    }
    val b = agg.deserialize(agg.serialize(a))
    assert(b.sortedEntries().toSeq === a.sortedEntries().toSeq)
    // merging a deserialized partial into a live one keeps the global
    // top-k (simulates the exchange path end to end)
    val c = new TopKHeap(5)
    (200 until 400).foreach { i =>
      x = (x * 1103515245L + 12345L) % 97L
      c.insert(x, i.toLong)
    }
    val all = new TopKHeap(5)
    // replay both streams through one heap as ground truth
    var y = 7L
    (0 until 400).foreach { i =>
      y = (y * 1103515245L + 12345L) % 97L
      all.insert(y, i.toLong)
    }
    val merged = agg.merge(agg.deserialize(agg.serialize(a)), c)
    assert(merged.sortedEntries().toSeq === all.sortedEntries().toSeq)
  }

  test("heap merge across partitions is order-insensitive") {
    // 1 group spread over many input partitions: partial heaps must merge
    // to the same answer as a single pass
    val df = spark.range(0, 5000, 1, 17)
      .select(lit(0L).as("g"), (col("id") % 97).as("sc"), col("id"))
    assert(aggTopK(df, "sc", asc = true, 7) ===
      windowTopK(df, "sc", asc = true, 7))
  }
}
