package graft

import org.apache.hadoop.fs.Path
import org.apache.spark.sql.functions.col
import org.scalatest.funsuite.AnyFunSuite

import graft.io.{Manifest, MergeOnRead}

/** Race + edge semantics of the EPOCH-SCOPED merge-on-read UPDATE
  * (io63's shape): two updates planned from the same head compute the
  * SAME epoch, so the commit must arbitrate — overlapping keys would
  * leave BOTH morins copies visible (neither epoch-N tombstone hides
  * epoch-N directories, the very rule that keeps an update's own
  * re-inserts alive), silently duplicating rows. The conflict guard
  * runs INSIDE the optimistic commit loop against the freshly re-read
  * entry list (the [[Manifest.commitAllGuarded]] discipline), so the
  * race is caught no matter which attempt observes it:
  *
  *  - DISJOINT key sets merge correctly and both commit — the `< e`
  *    scoping rule makes A's epoch-N tombstone blind to B's epoch-N
  *    inserts, and a later fold yields the same census as sequential
  *    updates (serializability of the pair, order-free);
  *  - OVERLAPPING key sets refuse loudly with
  *    [[MergeOnRead.ConcurrentUpdateException]] — the caller re-plans
  *    (Delta/Iceberg's concurrent-modification answer).
  *
  * Races are interleaved deterministically through the
  * [[Manifest.betweenReadAndCreate]] seam (the window between a commit
  * attempt's state read and its create call), like every race spec
  * here — never sleeps.
  */
class MorUpdateRaceSpec extends AnyFunSuite {
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

  private def upd(root: String, keys: Seq[Long], bump: Long): Option[Int] = {
    val rows = MergeOnRead.snapshot(spark, root, "k")
      .filter(col("k").isin(keys: _*))
      .withColumn("v", col("v") + bump)
    MergeOnRead.updateRows(spark, root, "k",
      rows.select(col("k")), rows, s"$root/data")
  }

  test("disjoint-key updates racing into the same epoch BOTH commit " +
      "and merge to the sequential result; a fold after the race " +
      "yields the sequential census") {
    val root = freshRoot("mor_race_disjoint")
    seed(root, 20)
    // B's full update runs inside A's first commit attempt's
    // read->create window; the seam self-disables so B's own commit
    // loop does not recurse
    var planted = false
    Manifest.betweenReadAndCreate = () => {
      if (!planted) {
        planted = true
        upd(root, Seq(10L, 11L), 2000L) // racer B, same planned epoch
      }
    }
    try upd(root, Seq(0L, 1L, 2L), 1000L) // A: loses v-slot, retries
    finally Manifest.betweenReadAndCreate = () => ()
    // both updates landed: A retried at the next version slot, the
    // guard saw B's same-epoch tombstone, keys disjoint -> allowed
    assert(Manifest.versions(spark, root) === Seq(1, 2, 3))
    def census(df: org.apache.spark.sql.DataFrame): Map[Long, Long] =
      df.collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    val expect = (0L until 20L).map { k =>
      k -> (k * 10 + (if (k <= 2) 1000L else 0L) +
        (if (k == 10 || k == 11) 2000L else 0L))
    }.toMap
    assert(census(MergeOnRead.snapshot(spark, root, "k")) === expect,
      "the merged read must equal sequential updates")
    // fold ends the deferral; the folded table reads identically
    MergeOnRead.fold(spark, root, "k", s"$root/data")
    val folded = MergeOnRead.snapshot(spark, root, "k")
    assert(census(folded) === expect,
      "a fold after the race must yield the sequential census")
    assert(Manifest.entries(spark, root)
      .forall(!MergeOnRead.isTombstone(_)), "fold spends the epochs")
  }

  test("overlapping-key updates racing into the same epoch refuse " +
      "loudly with ConcurrentUpdateException; the loser commits " +
      "nothing") {
    val root = freshRoot("mor_race_overlap")
    seed(root, 20)
    var planted = false
    Manifest.betweenReadAndCreate = () => {
      if (!planted) {
        planted = true
        upd(root, Seq(2L, 3L), 2000L) // racer B shares key 2
      }
    }
    val e = intercept[MergeOnRead.ConcurrentUpdateException] {
      try upd(root, Seq(0L, 1L, 2L), 1000L)
      finally Manifest.betweenReadAndCreate = () => ()
    }
    assert(e.getMessage.contains("overlapping keys"))
    // only B's version landed; A's staged pair stays an orphan
    assert(Manifest.versions(spark, root) === Seq(1, 2))
    val got = MergeOnRead.snapshot(spark, root, "k")
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(got(2L) === 2020L && got(0L) === 0L,
      "only the racer's update is visible — no partial loser state")
  }

  test("SQL MoR UPDATE racing a concurrent update over overlapping " +
      "keys refuses through the same guard") {
    val cat = freshRoot("mor_race_sql_cat")
    spark.conf.set("spark.sql.catalog.gmr",
      "graft.io.dsv2.GraftCatalog")
    spark.conf.set("spark.sql.catalog.gmr.root", cat)
    val tbl = "gmr.t"
    (0L until 20L).map(i => (i, i * 10)).toDF("k", "v")
      .createOrReplaceTempView("mor_race_src")
    spark.sql(s"CREATE TABLE $tbl AS SELECT * FROM mor_race_src")
    spark.sql(s"CALL gmr.set_mor_key('t', 'k')")
    val tblRoot = s"$cat/t"
    var planted = false
    Manifest.betweenReadAndCreate = () => {
      if (!planted) {
        planted = true
        upd(tblRoot, Seq(5L), 2000L)
      }
    }
    val thrown = intercept[Throwable] {
      try spark.sql(s"UPDATE $tbl SET v = v + 1 WHERE k IN (4, 5)")
      finally Manifest.betweenReadAndCreate = () => ()
    }
    def chain(t: Throwable): Seq[Throwable] =
      Iterator.iterate(t)(_.getCause).takeWhile(_ != null).take(8).toSeq
    assert(chain(thrown).exists(
        _.isInstanceOf[MergeOnRead.ConcurrentUpdateException]),
      s"expected ConcurrentUpdateException in the chain, got $thrown")
    val got = spark.sql(s"SELECT * FROM $tbl")
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(got(5L) === 2050L && got(4L) === 40L,
      "the losing SQL update must leave no partial state")
  }

  test("a RUNNING stream hitting a MoR UPDATE commit fails loudly " +
      "without ignoreChanges (it would silently re-deliver " +
      "already-streamed keys); with ignoreChanges the morins rows " +
      "stream as appends") {
    // restart-time is already guarded at RESOLVE (live tombstones
    // refuse without the morKey option) — the hazard is a stream that
    // resolved a tombstone-free table and is RUNNING when the update's
    // appending commit lands: addedDirs must not pass the morins
    // directory through as a plain append
    def start(root: String, out: String, ignoreChanges: Boolean) = {
      val rs = spark.readStream.format("graft")
        .option("startingVersion", "1")
      (if (ignoreChanges) rs.option("ignoreChanges", "true") else rs)
        .load(root)
        .writeStream.format("parquet")
        .option("path", s"$out/sink")
        .option("checkpointLocation", s"$out/ckpt")
        .start()
    }
    val root = freshRoot("mor_stream_upd")
    val out = freshRoot("mor_stream_upd_out")
    seed(root, 10)
    val q = start(root, out, ignoreChanges = false)
    try {
      q.processAllAvailable() // seed drained while tombstone-free
      assert(spark.read.parquet(s"$out/sink").count() === 10L)
      upd(root, Seq(3L, 4L), 1000L) // appending MoR UPDATE commit
      val refused = intercept[Throwable] {
        q.processAllAvailable()
        q.awaitTermination(30000)
        throw new IllegalStateException("stream did not fail")
      }
      assert(refused.getMessage.contains("merge-on-read UPDATE"),
        s"the refusal must name the hazard, got: ${refused.getMessage}")
    } finally q.stop()
    // the opt-in path: same sequence with ignoreChanges from the start
    val root2 = freshRoot("mor_stream_upd2")
    val out2 = freshRoot("mor_stream_upd2_out")
    seed(root2, 10)
    val q2 = start(root2, out2, ignoreChanges = true)
    try {
      q2.processAllAvailable()
      upd(root2, Seq(3L, 4L), 1000L)
      q2.processAllAvailable()
    } finally q2.stop()
    val sunk = spark.read.parquet(s"$out2/sink")
    assert(sunk.count() === 12L,
      "with ignoreChanges the two rewritten rows stream as appends")
    assert(sunk.filter(col("k") === 3L && col("v") === 1030L).count() === 1L)
  }

  test("N genuinely concurrent disjoint-key updates (real threads, " +
      "no seam) all land or retry cleanly; the merged read and a " +
      "final fold equal the sequential result") {
    val root = freshRoot("mor_race_threads")
    seed(root, 64)
    val nWriters = 4
    val errors = new java.util.concurrent.ConcurrentLinkedQueue[Throwable]
    val threads = (0 until nWriters).map { w =>
      new Thread(() => {
        try {
          // writer w owns keys [w*8, w*8+4) — disjoint by construction;
          // overlap-free racers must never see ConcurrentUpdateException
          val keys = (w * 8L until w * 8L + 4L)
          var attempts = 0
          var done = false
          while (!done) {
            try { upd(root, keys, 1000L * (w + 1)); done = true }
            catch {
              // lost-commit retries are internal; the only loud refusal
              // allowed here would be an overlap — which cannot happen
              case e: MergeOnRead.ConcurrentUpdateException =>
                attempts += 1
                if (attempts > 10) throw e
            }
          }
        } catch { case t: Throwable => errors.add(t) }
      })
    }
    threads.foreach(_.start())
    threads.foreach(_.join(120000))
    assert(errors.isEmpty,
      s"writer failed: ${Option(errors.peek()).map(_.toString)}")
    def census(df: org.apache.spark.sql.DataFrame): Map[Long, Long] =
      df.collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    val expect = (0L until 64L).map { k =>
      val w = k / 8
      k -> (k * 10 + (if (w < nWriters && k % 8 < 4) 1000L * (w + 1)
        else 0L))
    }.toMap
    assert(census(MergeOnRead.snapshot(spark, root, "k")) === expect,
      "the merged read after the free-running race must be sequential")
    MergeOnRead.fold(spark, root, "k", s"$root/data")
    assert(census(MergeOnRead.snapshot(spark, root, "k")) === expect,
      "the fold must preserve it")
  }

  test("epoch-scoped snapshot tolerates drift (morins-only columns " +
      "null-fill across epoch groups) and an all-tombstone table " +
      "snapshots empty instead of crashing") {
    val root = freshRoot("mor_drift")
    seed(root, 6)
    // drift-evolved update: the rewritten rows carry a NEW column the
    // epoch-0 directory lacks
    val rows = MergeOnRead.snapshot(spark, root, "k")
      .filter(col("k") < 2L)
      .withColumn("v", col("v") + 100L)
      .withColumn("w", col("k") * 7)
    MergeOnRead.updateRows(spark, root, "k",
      rows.select(col("k")), rows, s"$root/data")
    val snap = MergeOnRead.snapshot(spark, root, "k")
    assert(snap.columns.sorted.toSeq === Seq("k", "v", "w"))
    val byK = snap.collect()
      .map(r => r.getLong(0) -> Option(r.get(2))).toMap
    assert(byK(0L) === Some(0L) && byK(5L) === None,
      "old-epoch rows null-fill the drift column")
    assert(snap.count() === 6L)
    // all-tombstone table: replace away every data dir, keep a tombstone
    val root2 = freshRoot("mor_all_tombs")
    seed(root2, 4)
    MergeOnRead.deleteKeys(spark, root2, "k",
      Seq(0L, 1L).toDF("k"), s"$root2/data")
    val tomb = Manifest.entries(spark, root2)
      .filter(MergeOnRead.isTombstone)
    Manifest.rewrite(spark, root2, tomb)
    val empty = MergeOnRead.snapshot(spark, root2, "k")
    assert(empty.columns.toSeq === Seq("k", "v") && empty.count() === 0L,
      "an all-tombstone table snapshots EMPTY at the full schema " +
        "recovered from the last data-bearing version")
  }

  test("a LOWER-epoch racer committing between this update's plan and " +
      "commit refuses too — the guard keys on plan-time visibility, " +
      "not epoch ordering (lost-update anomaly)") {
    val root = freshRoot("mor_race_lower_epoch")
    seed(root, 20)
    // U1 lands first (epoch 1), so the victim X plans at epoch 2
    upd(root, Seq(0L), 100L)
    assert(Manifest.versions(spark, root) === Seq(1, 2))
    // racer R simulates an update PLANNED BEFORE U1 (it minted epoch 1
    // from the pre-U1 entry list) that commits inside X's plan→commit
    // window: its epoch is LOWER than X's, so an epoch-ordering guard
    // is blind to it — yet X's epoch-2 tombstone would hide R's
    // committed morins-1 row for the shared key, and X's re-insert was
    // computed from a snapshot that never saw R: a lost update.
    var planted = false
    Manifest.betweenReadAndCreate = () => {
      if (!planted) {
        planted = true
        val tombDir =
          s"$root/data/${MergeOnRead.TombstonePrefix}e1-racer"
        val insDir = s"$root/data/${MergeOnRead.InsertPrefix}1-racer"
        Seq(5L).toDF("k").write.parquet(tombDir)
        Seq((5L, 1049L)).toDF("k", "v").write.parquet(insDir)
        Manifest.commitAll(spark, root, Seq(tombDir, insDir))
      }
    }
    val e = intercept[MergeOnRead.ConcurrentUpdateException] {
      try upd(root, Seq(5L), 7000L)
      finally Manifest.betweenReadAndCreate = () => ()
    }
    assert(e.getMessage.contains("overlapping keys"))
    // R's committed update SURVIVES; X committed nothing
    val got = MergeOnRead.snapshot(spark, root, "k")
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(got(5L) === 1049L,
      "the lower-epoch racer's committed update must not be lost")
    assert(got(0L) === 100L && got.size === 20)
  }
}
