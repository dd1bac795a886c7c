package graft

import org.apache.hadoop.fs.Path
import org.apache.spark.sql.functions.col
import org.scalatest.funsuite.AnyFunSuite

import graft.io.{Manifest, MergeOnRead}
import graft.plans.MorAntiJoinStrategy

/** Both physical regimes of the DSv2 merge-on-read read path, pinned
  * around `spark.graft.mor.maxBroadcastKeys`:
  *
  *  - UNDER the cap: the scan keeps the key-collecting reader filter
  *    (one data pass, zero shuffle) — the plan carries [[GraftScan]]
  *    with `mor=true`;
  *  - OVER the cap (a heavy takedown stream): nothing is collected on
  *    the driver — [[MorAntiJoinStrategy]] re-plans the relation as
  *    the distributed anti-join ([[MergeOnRead.snapshot]]'s plan), and
  *    the answer is identical;
  *  - over the cap WITHOUT the strategy: the physical scan refuses
  *    loudly instead of silently materializing an unbounded key set
  *    (the 10⁸-key takedown on a 100 TB table that would OOM the
  *    driver).
  *
  * The cap decision reads parquet FOOTER row counts only (memoized),
  * so lowering the cap to 1 exercises the over-cap machinery without
  * an OOM-scale fixture.
  */
class MorAntiJoinSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  private def freshRoot(tag: String): String = {
    val root = System.getProperty("java.io.tmpdir") + s"/graft_$tag"
    new Path(root).getFileSystem(spark.sparkContext.hadoopConfiguration)
      .delete(new Path(root), true)
    root
  }

  private def warehouse: String = {
    val w = System.getProperty("java.io.tmpdir")
    spark.conf.set("spark.sql.catalog.mor_aj", "graft.io.dsv2.GraftCatalog")
    spark.conf.set("spark.sql.catalog.mor_aj.root", w)
    w
  }

  private def seed(root: String, n: Long): Unit = {
    (0L until n).map(i => (i, i * 10)).toDF("k", "v")
      .write.parquet(s"$root/data/b0")
    Manifest.commit(spark, root, s"$root/data/b0")
    graft.io.dsv2.GraftMorKey.set(spark, root, "k")
  }

  private def withCap[T](cap: String)(body: => T): T = {
    val prev = spark.conf.getOption("spark.graft.mor.maxBroadcastKeys")
    spark.conf.set("spark.graft.mor.maxBroadcastKeys", cap)
    try body
    finally prev match {
      case Some(v) => spark.conf.set("spark.graft.mor.maxBroadcastKeys", v)
      case None => spark.conf.unset("spark.graft.mor.maxBroadcastKeys")
    }
  }

  test("under the cap the reader-filter GraftScan plans; over the cap " +
      "the strategy re-plans the same read as a distributed anti-join " +
      "with an identical answer") {
    warehouse
    val root = freshRoot("mor_aj_regimes")
    seed(root, 100)
    MergeOnRead.deleteKeys(spark, root, "k",
      Seq(1L, 3L, 5L).toDF("k"), s"$root/data")
    val q = "SELECT k, v FROM mor_aj.graft_mor_aj_regimes ORDER BY k"
    val under = spark.sql(q)
    assert(under.queryExecution.executedPlan.toString.contains("GraftScan"),
      "under-cap read must keep the key-collecting reader filter")
    val underRows = under.collect().map(r => (r.getLong(0), r.getLong(1)))
    assert(underRows.length == 97 && !underRows.map(_._1).contains(3L))
    withCap("1") {
      val over = spark.sql(q)
      val plan = over.queryExecution.executedPlan.toString
      assert(!plan.contains("GraftScan"),
        s"over-cap read must not plan the key-collecting scan:\n$plan")
      assert(over.collect().map(r => (r.getLong(0), r.getLong(1)))
        .sameElements(underRows),
        "both regimes must return identical rows")
    }
  }

  test("over the cap with EPOCH-SCOPED tombstones (a MoR update's) " +
      "the anti-join regime merges per epoch — census identical to " +
      "the reader-filter regime") {
    warehouse
    val root = freshRoot("mor_aj_epochs")
    seed(root, 100)
    // one update (epoch 1) + one overlapping later update (epoch 2)
    def upd(keys: Seq[Long], bump: Long): Unit = {
      val rows = MergeOnRead.snapshot(spark, root, "k")
        .filter(col("k").isin(keys: _*))
        .withColumn("v", col("v") + bump)
      MergeOnRead.updateRows(spark, root, "k",
        rows.select(col("k")), rows, s"$root/data")
    }
    upd(Seq(1L, 2L, 3L), 1000)
    upd(Seq(3L, 4L), 100000)
    val q = "SELECT k, v FROM mor_aj.graft_mor_aj_epochs ORDER BY k"
    val under = spark.sql(q).collect().map(r => (r.getLong(0), r.getLong(1)))
    assert(under.length == 100)
    assert(under.toMap.apply(3L) == 101030L,
      "the updates must COMPOSE for the re-matched key (the second " +
        "was computed from the first's merged snapshot)")
    assert(under.toMap.apply(1L) == 1010L)
    withCap("1") {
      val over = spark.sql(q)
      val plan = over.queryExecution.executedPlan.toString
      assert(!plan.contains("GraftScan"))
      assert(over.collect().map(r => (r.getLong(0), r.getLong(1)))
        .sameElements(under))
    }
  }

  test("over the cap WITHOUT the strategy the scan refuses loudly — " +
      "never a silent unbounded driver collect") {
    val root = freshRoot("mor_aj_refuse")
    seed(root, 50)
    MergeOnRead.deleteKeys(spark, root, "k",
      Seq(7L).toDF("k"), s"$root/data")
    // a FRESH session: no catalog ever initialized on it, so the
    // strategy is absent (newSession shares the context but builds
    // its own ExperimentalMethods) — the direct-format read is the
    // one path that can reach the physical scan over cap
    val ns = spark.newSession()
    assert(!ns.experimental.extraStrategies
      .exists(_.isInstanceOf[MorAntiJoinStrategy]))
    ns.conf.set("spark.graft.mor.maxBroadcastKeys", "0")
    val e = intercept[Exception] {
      ns.read.format("graft").load(root).select("k").collect()
    }
    def msgs(t: Throwable): Seq[String] =
      if (t == null) Seq.empty
      else Option(t.getMessage).toSeq ++ msgs(t.getCause)
    assert(msgs(e).exists(_.contains("maxBroadcastKeys")),
      s"want the loud over-cap refusal, got: $e")
  }

  test("an all-tombstone table snapshots EMPTY at the FULL schema " +
      "recovered from the last data-bearing version") {
    val root = freshRoot("mor_aj_allts")
    seed(root, 10)
    // replace data away, keep a tombstone entry live (the fold-less
    // total-takedown edge): delete every key, then replace the data
    // dir with nothing but the tombstone
    MergeOnRead.deleteKeys(spark, root, "k",
      (0L until 10L).toDF("k"), s"$root/data")
    val tomb = Manifest.entries(spark, root)
      .filter(MergeOnRead.isTombstone)
    Manifest.replaceDirs(spark, root,
      remove = Set(s"$root/data/b0"), add = Seq.empty)
    assert(Manifest.entries(spark, root) == tomb)
    val snap = MergeOnRead.snapshot(spark, root, "k")
    assert(snap.columns.toSeq == Seq("k", "v"),
      "the empty snapshot must carry the full table schema, not " +
        s"narrow to the key column: ${snap.columns.toSeq}")
    assert(snap.count() == 0)
    // downstream selection of a non-key column analyzes fine
    assert(snap.select(col("v")).count() == 0)
  }
}
