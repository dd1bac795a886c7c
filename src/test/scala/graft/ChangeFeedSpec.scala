package graft

import org.apache.hadoop.fs.Path
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.io.{ChangeFeed, Manifest, MergeOnRead}

/** The change feed's core contract, pinned the strong way: for EVERY
  * version pair in a history of appends and merge-on-read deletes, the
  * appending-window fast path (reads only appended dirs + tombstones)
  * must produce exactly the multiset the full-snapshot `exceptAll`
  * diff produces. The fallback IS the semantic definition; the fast
  * path is the scale path — this spec is the proof they're the same
  * function wherever both apply.
  */
class ChangeFeedSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark

  test("appending fast path ≡ brute snapshot diff for every version " +
      "pair of a randomized append/delete history") {
    val root = System.getProperty("java.io.tmpdir") + "/graft_cdfprop_tbl"
    val f = new Path(root)
      .getFileSystem(spark.sparkContext.hadoopConfiguration)
    f.delete(new Path(root), true)
    val rnd = new scala.util.Random(42)
    var nextId = 0L
    // seed batch, then a random mix of appends (fresh id ranges) and
    // range deletes over whatever exists
    spark.range(0, 200).toDF("id").write.parquet(s"$root/data/b0")
    Manifest.commit(spark, root, s"$root/data/b0")
    nextId = 200
    var round = 0
    while (Manifest.versions(spark, root).last < 6) {
      round += 1
      if (rnd.nextBoolean() || round == 1) {
        val n = 50 + rnd.nextInt(100)
        spark.range(nextId, nextId + n).toDF("id")
          .write.parquet(s"$root/data/b$round")
        Manifest.commit(spark, root, s"$root/data/b$round")
        nextId += n
      } else {
        val lo = rnd.nextLong(nextId)
        MergeOnRead.deleteWhere(spark, root, "id",
          col("id").between(lo, lo + 30), s"$root/data")
      }
    }
    val versions = Manifest.versions(spark, root)
    def collectFeed(df: org.apache.spark.sql.DataFrame): Set[(String, Long, Long)] =
      df.groupBy(col("_op"), col("id"))
        .agg(count(lit(1)).as("n")).collect()
        .map(r => (r.getString(0), r.getLong(1), r.getLong(2))).toSet
    for (i <- versions; j <- versions if i <= j) {
      val fast = collectFeed(
        ChangeFeed.changesBetween(spark, root, "id", i, j))
      val a = MergeOnRead.snapshot(spark, root, "id", Some(i))
      val b = MergeOnRead.snapshot(spark, root, "id", Some(j))
      val brute = collectFeed(
        b.exceptAll(a).withColumn("_op", lit("I"))
          .unionByName(a.exceptAll(b).withColumn("_op", lit("D"))))
      assert(fast == brute,
        s"window $i->$j: fast ${fast.size} vs brute ${brute.size}: " +
          s"diff ${(fast diff brute) ++ (brute diff fast)}")
    }
  }
}
