package graft

import org.apache.hadoop.fs.Path
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.expressions.TableChanges
import graft.io.{Cdc, IndexCompaction, Manifest, MergeOnRead, RowDelete}

/** The per-commit CDC ledger ([[graft.io.Cdc]] / `table_changes`):
  * version-attributed change rows over a history that exercises every
  * classification — plain appends, a merge-on-read update (pre/post
  * image pairing), a merge-on-read delete, layout-preserving
  * maintenance (`#op:` fold + compact — skipped outright), and an
  * unmarked copy-on-write rewrite (the snapshot-diff fallback) — plus
  * the SQL TVF surface and the retention/column-mapping refusals.
  */
class CdcSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  private def fresh(tag: String): String = {
    val root = System.getProperty("java.io.tmpdir") + s"/graft_cdc_$tag"
    new Path(root).getFileSystem(spark.sparkContext.hadoopConfiguration)
      .delete(new Path(root), true)
    root
  }

  /** v1: ids 0..99 · v2: ids 100..199 · v3: MoR update ids 0..9
    * (+1000) · v4: MoR delete ids 50..59 · v5: fold · v6: compact ·
    * v7: CoW delete ids 190..199. Values are `v = id * 2` before the
    * update.
    */
  private def history(root: String): Unit = {
    def batch(a: Long, b: Long) =
      spark.range(a, b).select(col("id"), (col("id") * 2).as("v"))
    batch(0, 100).write.parquet(s"$root/data/b1")
    Manifest.commit(spark, root, s"$root/data/b1")
    batch(100, 200).write.parquet(s"$root/data/b2")
    Manifest.commit(spark, root, s"$root/data/b2")
    graft.io.dsv2.GraftMorKey.set(spark, root, "id")
    val upd = spark.range(0, 10)
      .select(col("id"), (col("id") * 2 + 1000).as("v"))
    assert(MergeOnRead.updateRows(spark, root, "id",
      upd.select("id"), upd, s"$root/data").contains(3))
    assert(MergeOnRead.deleteKeys(spark, root, "id",
      spark.range(50, 60).toDF("id"), s"$root/data").contains(4))
    assert(MergeOnRead.fold(spark, root, "id", s"$root/data")
      .exists(_.version == 5))
    assert(IndexCompaction.compact(spark, root,
      s"$root/data/compacted") == 6)
    assert(RowDelete.deleteWhere(spark, root, col("id") >= 190,
      s"$root/data").version == 7)
  }

  test("per-version classification over the full op mix: appends, " +
      "update pre/post pairing, MoR delete, fold/compact skipped, " +
      "CoW rewrite diffed") {
    val root = fresh("ledger")
    history(root)
    val ch = Cdc.changes(spark, root, 1)
      .groupBy(col(Cdc.CommitVersion).as("ver"),
        col(Cdc.ChangeType).as("tpe"))
      .agg(count(lit(1)).as("n"), sum("v").as("sv"))
      .collect().map(r => (r.getInt(0), r.getString(1)) ->
        (r.getLong(2), r.getLong(3))).toMap
    assert(ch((1, "insert")) === (100L, (0L until 100L).map(_ * 2).sum))
    assert(ch((2, "insert")) === (100L, (100L until 200L).map(_ * 2).sum))
    assert(ch((3, "update_preimage")) ===
      (10L, (0L until 10L).map(_ * 2).sum))
    assert(ch((3, "update_postimage")) ===
      (10L, (0L until 10L).map(_ * 2 + 1000).sum))
    assert(ch((4, "delete")) === (10L, (50L until 60L).map(_ * 2).sum))
    assert(ch((7, "delete")) === (10L, (190L until 200L).map(_ * 2).sum))
    // fold (v5) and compact (v6) are layout-preserving and SKIPPED;
    // the CoW rewrite (v7) must diff to exactly its deletes, nothing
    // resurrected from the re-layouts
    assert(!ch.keySet.exists(_._1 == 5))
    assert(!ch.keySet.exists(_._1 == 6))
    assert(ch.keySet.count(_._1 == 7) === 1)
    // a narrowed range returns only its versions
    val narrowed = Cdc.changes(spark, root, 3, Some(4))
      .select(Cdc.CommitVersion).distinct()
      .collect().map(_.getInt(0)).toSet
    assert(narrowed === Set(3, 4))
  }

  test("op markers land in the manifest: fold and compact carry " +
      "their #op:, data commits carry none") {
    val root = fresh("ops")
    history(root)
    assert(Manifest.opOf(spark, root, 5).contains("fold"))
    assert(Manifest.opOf(spark, root, 6).contains("compact"))
    for (v <- Seq(1, 2, 3, 4, 7))
      assert(Manifest.opOf(spark, root, v).isEmpty, s"v$v")
  }

  test("table_changes TVF: path and catalog resolution, literal " +
      "arg enforcement") {
    val root = fresh("tvf")
    history(root)
    TableChanges.register(spark)
    val byType = spark.sql(
      s"SELECT _change_type t, count(*) n, sum(v) sv " +
        s"FROM table_changes('$root', 1) GROUP BY 1")
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(byType === Map("insert" -> 200L, "update_preimage" -> 10L,
      "update_postimage" -> 10L, "delete" -> 20L))
    // pushed projections/filters work like any subquery
    assert(spark.sql(s"SELECT sum(v) FROM table_changes('$root', 3, 3) " +
      "WHERE _change_type = 'update_postimage'")
      .collect()(0).getLong(0) === (0L until 10L).map(_ * 2 + 1000).sum)
    // catalog.table resolution through the warehouse conf
    val wh = new Path(root).getParent.toString
    spark.conf.set("spark.sql.catalog.cdctvf",
      "graft.io.dsv2.GraftCatalog")
    spark.conf.set("spark.sql.catalog.cdctvf.root", wh)
    val name = new Path(root).getName
    assert(spark.sql(
      s"SELECT count(*) FROM table_changes('cdctvf.$name', 1, 2)")
      .collect()(0).getLong(0) === 200)
    // a non-literal argument refuses loudly — Spark's analyzer catches
    // an unresolvable column itself (UNRESOLVED_COLUMN); anything that
    // resolves but isn't foldable hits the builder's own "literal"
    // contract message
    val e = intercept[Exception](spark.sql(
      s"SELECT * FROM table_changes('$root', id)").collect())
    def m(t: Throwable): Boolean = t != null &&
      (Option(t.getMessage).exists(msg => msg.contains("literal") ||
        msg.contains("cannot be resolved")) || m(t.getCause))
    assert(m(e), s"got: $e")
  }

  test("refusals: an expired version inside the range, and a version " +
      "past head") {
    val root = fresh("refuse")
    spark.range(0, 10).toDF("id").write.parquet(s"$root/data/b1")
    Manifest.commit(spark, root, s"$root/data/b1")
    spark.range(10, 20).toDF("id").write.parquet(s"$root/data/b2")
    Manifest.commit(spark, root, s"$root/data/b2")
    spark.range(20, 30).toDF("id").write.parquet(s"$root/data/b3")
    Manifest.commit(spark, root, s"$root/data/b3")
    assert(intercept[IllegalArgumentException](
      Cdc.changes(spark, root, 1, Some(5))).getMessage
      .contains("does not exist yet"))
    Manifest.expire(spark, root, keepLast = 1)
    assert(intercept[IllegalArgumentException](
      Cdc.changes(spark, root, 1)).getMessage.contains("expired"))
    // the surviving head version alone is still readable... except its
    // predecessor is gone too — the step needs v-1
    assert(intercept[IllegalArgumentException](
      Cdc.changes(spark, root, 3)).getMessage.contains("expired"))
  }

  test("streaming change feed: inserts, update postimages, keyed " +
      "deletes; maintenance skipped; rewriting commit fails loudly") {
    val root = fresh("stream")
    def batch(a: Long, b: Long) =
      spark.range(a, b).select(col("id"), (col("id") * 2).as("v"))
    batch(0, 100).write.parquet(s"$root/data/b1")
    Manifest.commit(spark, root, s"$root/data/b1")
    batch(100, 200).write.parquet(s"$root/data/b2")
    Manifest.commit(spark, root, s"$root/data/b2")
    graft.io.dsv2.GraftMorKey.set(spark, root, "id")
    val upd = spark.range(0, 10)
      .select(col("id"), (col("id") * 2 + 1000).as("v"))
    assert(MergeOnRead.updateRows(spark, root, "id",
      upd.select("id"), upd, s"$root/data").contains(3))
    assert(MergeOnRead.fold(spark, root, "id", s"$root/data")
      .exists(_.version == 4))
    def drain(tag: String, fromVersion: Int): org.apache.spark.sql
        .DataFrame = {
      val q = spark.readStream.format("graft")
        .option("readChangeFeed", "true")
        .option("startingVersion", fromVersion)
        .load(root)
        .writeStream.format("memory").queryName(s"cdc_$tag")
        .option("checkpointLocation", fresh(s"ckpt_$tag"))
        .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
        .start()
      q.awaitTermination(120000)
      spark.table(s"cdc_$tag")
    }
    val got = drain("full", 1)
      .groupBy(col(Cdc.CommitVersion).as("ver"),
        col(Cdc.ChangeType).as("tpe"))
      .agg(count(lit(1)).as("n"), sum("v").as("sv"))
      .collect().map(r => (r.getInt(0), r.getString(1)) ->
        (r.getLong(2), if (r.isNullAt(3)) -1L else r.getLong(3))).toMap
    assert(got((1, "insert"))._1 === 100L)
    assert(got((2, "insert"))._1 === 100L)
    assert(got((3, "update_postimage")) ===
      (10L, (0L until 10L).map(_ * 2 + 1000).sum))
    // the tombstone slice: key column set, remaining columns NULL —
    // the keyed-delete shape (sum over all-null v is NULL → -1 here)
    assert(got((3, "delete")) === (10L, -1L))
    // the fold (v4, #op:fold) must be skipped, not refused
    assert(!got.keySet.exists(_._1 == 4))
    // an UNMARKED rewriting commit refuses loudly mid-stream
    assert(RowDelete.deleteWhere(spark, root, col("id") >= 190,
      s"$root/data").version == 5)
    val e = intercept[Exception](drain("rewrite", 5))
    def m(t: Throwable): Boolean = t != null &&
      (Option(t.getMessage).exists(_.contains("rewriting commit")) ||
        m(t.getCause))
    assert(m(e))
    // batch read of a change-feed table has no BATCH_READ capability
    val eb = intercept[Exception](
      spark.read.format("graft").option("readChangeFeed", "true")
        .load(root).collect())
    assert(eb != null)
  }
}
