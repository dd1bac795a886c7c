package graft

import org.apache.hadoop.fs.Path
import org.apache.spark.sql.functions.{col, lit}
import org.scalatest.funsuite.AnyFunSuite

import graft.io.{Manifest, MergeOnRead}

/** The round-16 optimization to [[MergeOnRead.snapshot]]: on a
  * uniform-schema table the epoch-scoped merge runs as ONE
  * epoch-conditioned anti-join against a (key, max tombstone epoch)
  * frame instead of a distinct + broadcast + anti-join PER epoch
  * group. This spec pins the optimization's correctness contract:
  *
  *  - flat and grouped forms return IDENTICAL rows on the full op mix
  *    (base data + two overlapping scoped updates + a later global
  *    tombstone), at head and through version pins;
  *  - a drift-evolved table (late column in a newer morins directory)
  *    does NOT take the flat path — per-group unionByName null-fill
  *    semantics are preserved bit-for-bit.
  *
  * `spark.graft.mor.flatSnapshot=false` is the A/B lever.
  */
class MorFlatSnapshotSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  private def freshRoot(tag: String): String = {
    val root = System.getProperty("java.io.tmpdir") + s"/graft_$tag"
    new Path(root).getFileSystem(spark.sparkContext.hadoopConfiguration)
      .delete(new Path(root), true)
    root
  }

  private def seed(root: String, n: Long): Unit = {
    (0L until n).map(i => (i, i * 10)).toDF("k", "v")
      .write.parquet(s"$root/data/b0")
    Manifest.commit(spark, root, s"$root/data/b0")
  }

  private def grouped[T](body: => T): T = {
    spark.conf.set("spark.graft.mor.flatSnapshot", "false")
    try body
    finally spark.conf.unset("spark.graft.mor.flatSnapshot")
  }

  private def rowsOf(root: String, version: Option[Int] = None)
      : Seq[(Long, Long)] =
    MergeOnRead.snapshot(spark, root, "k", version)
      .select(col("k"), col("v"))
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSeq.sorted

  test("flat and grouped merges agree on base + two overlapping " +
      "scoped updates + a global tombstone, at head and time-traveled") {
    val root = freshRoot("flat_snap_mix")
    seed(root, 60)
    def upd(keys: Seq[Long], bump: Long): Unit = {
      val rows = MergeOnRead.snapshot(spark, root, "k")
        .filter(col("k").isin(keys: _*))
        .withColumn("v", col("v") + bump)
      MergeOnRead.updateRows(spark, root, "k",
        rows.select(col("k")), rows, s"$root/data")
    }
    upd(Seq(1L, 2L, 3L), 1000)        // epoch 1
    upd(Seq(3L, 4L), 100000)          // epoch 2, overlaps key 3
    // global (unscoped) tombstone AFTER the scoped ones — hides the
    // named keys at EVERY epoch, including the epoch-2 rewrites
    MergeOnRead.deleteKeys(spark, root, "k",
      Seq(2L, 4L, 7L).toDF("k"), s"$root/data")
    val versions = Manifest.versions(spark, root)
    for (v <- versions.map(Some(_)) :+ None) {
      val flat = rowsOf(root, v)
      val slow = grouped(rowsOf(root, v))
      assert(flat == slow,
        s"flat vs grouped snapshot must be row-identical at $v")
    }
    val head = rowsOf(root).toMap
    assert(!head.contains(2L) && !head.contains(4L) && !head.contains(7L),
      "the global tombstone must hide its keys at every epoch")
    assert(head(3L) == 101030L,
      "overlapping scoped updates must compose (second planned from " +
        "the first's merged snapshot)")
    assert(head(1L) == 1010L && head.size == 57)
  }

  test("a drift-evolved table (late column in a newer morins dir) " +
      "does not take the flat path — grouped null-fill is preserved") {
    val root = freshRoot("flat_snap_drift")
    seed(root, 10)
    // epoch-1 update whose rewritten rows carry a LATE column
    val rows = MergeOnRead.snapshot(spark, root, "k")
      .filter(col("k") < 3).withColumn("v", col("v") + 1000)
      .withColumn("late", lit("x"))
    MergeOnRead.updateRows(spark, root, "k",
      rows.select(col("k")), rows, s"$root/data")
    val snap = MergeOnRead.snapshot(spark, root, "k")
    assert(snap.columns.contains("late"),
      "the drift column must surface through the merge")
    val byK = snap.collect()
      .map(r => r.getLong(r.fieldIndex("k")) ->
        Option(r.get(r.fieldIndex("late")))).toMap
    assert(byK(1L).contains("x") && byK(5L).isEmpty,
      "late column fills null for pre-drift rows (unionByName " +
        "allowMissingColumns semantics)")
    val slow = grouped(MergeOnRead.snapshot(spark, root, "k"))
    assert(snap.select(snap.columns.sorted.map(col): _*).collect()
        .map(_.toString).sorted.toSeq ==
      slow.select(slow.columns.sorted.map(col): _*).collect()
        .map(_.toString).sorted.toSeq,
      "drift tables are grouped-path either way — identical output")
  }
}
