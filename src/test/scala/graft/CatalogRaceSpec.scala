package graft

import org.apache.hadoop.fs.Path
import org.apache.spark.sql.functions.col
import org.scalatest.funsuite.AnyFunSuite

import graft.io.{Catalog, Manifest}

/** Concurrent-writer race gate for [[Catalog.pinLatest]]: N writers
  * each publish a new version of their own table PAIR into a shared
  * catalog and race the pin step. The stabilization protocol documents
  * what it does and does not give: a vector may capture another
  * writer's publish mid-gap (first table committed, second not yet),
  * but it must never capture a CAUSALLY INVERTED cut — a writer
  * commits `a_i` before `b_i`, so any vector showing the new `b_i`
  * while still pinning the old `a_i` would be a state that never
  * existed (once `b_i`'s new version is visible, a re-read of `a_i`
  * must see its new version, so two consecutive scans can never agree
  * on the inversion). With the fail-loud change, pinLatest either
  * publishes a twice-observed-stable vector or throws — it never
  * silently publishes an unsettled one; writers retry on the refusal.
  */
class CatalogRaceSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  test("racing multi-table publishes all land; no catalog version " +
      "pins a causally inverted cut of any writer's publish") {
    val base = System.getProperty("java.io.tmpdir") + "/graft_cat_race"
    new Path(base).getFileSystem(spark.sparkContext.hadoopConfiguration)
      .delete(new Path(base), true)
    val nWriters = 4
    val rounds = 3
    val cat = s"$base/cat"
    val tables = (0 until nWriters)
      .map(i => (s"$base/a$i", s"$base/b$i"))
    // seed: every table at version 1, catalog pinning the seed vector
    tables.zipWithIndex.foreach { case ((a, b), i) =>
      Seq(i.toLong).toDF("k").write.parquet(s"$base/d_a${i}_1")
      Seq(i.toLong).toDF("k").write.parquet(s"$base/d_b${i}_1")
      Manifest.commit(spark, a, s"$base/d_a${i}_1")
      Manifest.commit(spark, b, s"$base/d_b${i}_1")
    }
    val roots = tables.flatMap(t => Seq(t._1, t._2))
    Catalog.pinLatest(spark, cat, roots)
    val errors = new java.util.concurrent.ConcurrentLinkedQueue[Throwable]
    val pinned = new java.util.concurrent.ConcurrentLinkedQueue[Int]
    val threads = (0 until nWriters).map { i =>
      new Thread(() => {
        try {
          val (a, b) = tables(i)
          for (r <- 2 to rounds + 1) {
            Seq(i.toLong * 100 + r).toDF("k")
              .write.parquet(s"$base/d_a${i}_$r")
            Seq(i.toLong * 100 + r).toDF("k")
              .write.parquet(s"$base/d_b${i}_$r")
            Manifest.commit(spark, a, s"$base/d_a${i}_$r")
            Manifest.commit(spark, b, s"$base/d_b${i}_$r")
            // the fail-loud contract: retry the pin while peers are
            // mid-publish rather than accept a torn vector
            var done = false
            var attempts = 0
            while (!done) {
              try { pinned.add(Catalog.pinLatest(spark, cat, roots))
                done = true }
              catch { case e: IllegalArgumentException
                  if e.getMessage.contains("stabilization") =>
                attempts += 1
                if (attempts > 50) throw e
              }
            }
          }
        } catch { case t: Throwable => errors.add(t) }
      })
    }
    threads.foreach(_.start())
    threads.foreach(_.join(120000))
    assert(errors.isEmpty,
      s"writer failed: ${Option(errors.peek()).map(_.toString)}")
    assert(pinned.size == nWriters * rounds, "every pin must land")
    // every writer's final versions are pinned by the latest vector
    val latest = Catalog.resolve(spark, cat)
    tables.foreach { case (a, b) =>
      assert(latest(a) == rounds + 1 && latest(b) == rounds + 1)
    }
    // no vector in the whole history inverts any writer's commit order
    // (b_i ahead of a_i), and none pins a version beyond the tables'
    // committed history
    val hist = Catalog.history(spark, cat)
    // idempotent pins may REUSE a version (same vector observed by two
    // writers burns one catalog version), so history can be smaller
    // than the pin count — but every returned version must exist
    val histVersions = hist.map(_._1).toSet
    pinned.forEach(v => assert(histVersions.contains(v),
      s"pinLatest returned $v which is not a catalog version"))
    hist.foreach { case (cv, vec) =>
      tables.foreach { case (a, b) =>
        assert(vec(b) <= vec(a),
          s"catalog@$cv pins inverted cut ($a@${vec(a)}, $b@${vec(b)})")
        assert(vec(a) <= rounds + 1 && vec(b) >= 1)
      }
    }
  }

  test("a DSv2 append losing the commit race to a concurrent appender " +
      "rebases and lands both payloads, ledger gapless (deterministic " +
      "seam injection)") {
    val root = System.getProperty("java.io.tmpdir") + "/graft_v2race_tbl"
    val f = new Path(root)
      .getFileSystem(spark.sparkContext.hadoopConfiguration)
    f.delete(new Path(root), true)
    (0L until 10L).map(i => (i, i)).toDF("id", "v")
      .write.format("graft").save(root) // create (v1)
    // plant a competing APPEND inside the V2 write's read->create window
    // — the racer wins manifest-v2, our commit must rebase onto its list
    (100L until 110L).map(i => (i, i)).toDF("id", "v")
      .write.parquet(s"$root/data/racer")
    var planted = false
    Manifest.betweenReadAndCreate = () => {
      if (!planted) {
        planted = true
        val body = (Manifest.committed(spark, root) :+ s"$root/data/racer")
          .mkString("\n") + "\n#graft-manifest-complete"
        val out = f.create(new Path(root, "manifest-v000002"), false)
        out.write(body.getBytes(java.nio.charset.StandardCharsets.UTF_8))
        out.close()
      }
    }
    try {
      (200L until 210L).map(i => (i, i)).toDF("id", "v")
        .write.format("graft")
        .mode(org.apache.spark.sql.SaveMode.Append).save(root)
    } finally Manifest.betweenReadAndCreate = () => ()
    assert(Manifest.versions(spark, root) === Seq(1, 2, 3),
      "the lost race must retry at the next slot — no gap, no clobber")
    val ids = spark.read.format("graft").load(root)
      .select(col("id")).collect().map(_.getLong(0)).sorted
    assert(ids.toSeq === ((0L until 10L) ++ (100L until 110L) ++
      (200L until 210L)).sorted,
      "both the racer's and the retried append's payloads must land")
  }

  test("a DSv2 append racing a compaction rebases onto the REPLACING " +
      "winner's list — the compacted payload plus the append, nothing " +
      "twice") {
    val root = System.getProperty("java.io.tmpdir") + "/graft_v2cmp_tbl"
    val f = new Path(root)
      .getFileSystem(spark.sparkContext.hadoopConfiguration)
    f.delete(new Path(root), true)
    (0L until 10L).map(i => (i, i)).toDF("id", "v")
      .write.format("graft").save(root)
    (10L until 20L).map(i => (i, i)).toDF("id", "v")
      .write.format("graft")
      .mode(org.apache.spark.sql.SaveMode.Append).save(root)
    // the compaction wins v3 inside the append's read->create window
    spark.read.format("graft").load(root).coalesce(1)
      .write.parquet(s"$root/data/compacted")
    var planted = false
    Manifest.betweenReadAndCreate = () => {
      if (!planted) {
        planted = true
        val body = s"$root/data/compacted\n#graft-manifest-complete"
        val out = f.create(new Path(root, "manifest-v000003"), false)
        out.write(body.getBytes(java.nio.charset.StandardCharsets.UTF_8))
        out.close()
      }
    }
    try {
      (20L until 30L).map(i => (i, i)).toDF("id", "v")
        .write.format("graft")
        .mode(org.apache.spark.sql.SaveMode.Append).save(root)
    } finally Manifest.betweenReadAndCreate = () => ()
    assert(Manifest.versions(spark, root) === Seq(1, 2, 3, 4))
    val entries = Manifest.committed(spark, root)
    assert(entries.head === s"$root/data/compacted" && entries.size === 2,
      s"the retried append must fold the compaction winner's list, " +
        s"not resurrect the compacted-away dirs: $entries")
    val ids = spark.read.format("graft").load(root)
      .select(col("id")).collect().map(_.getLong(0)).sorted
    assert(ids.toSeq === (0L until 30L).toSeq,
      "exactly the compacted payload plus the append — nothing twice")
  }

  test("a SQL DELETE racing a concurrent APPEND keeps the append; " +
      "racing a REPLACING commit that consumed its input groups it " +
      "refuses loudly") {
    val wh = java.nio.file.Files
      .createTempDirectory("graft-dml-race").toString
    spark.conf.set("spark.sql.catalog.dmlrace",
      "graft.io.dsv2.GraftCatalog")
    spark.conf.set("spark.sql.catalog.dmlrace.root", wh)
    val root = s"$wh/t"
    (0L until 100L).map(i => (i, i)).toDF("id", "v")
      .write.format("graft").save(root)
    // ---- race 1: an append lands inside the DELETE's commit window —
    // the partial replace rebases, the appended rows survive
    (200L until 210L).map(i => (i, i)).toDF("id", "v")
      .write.parquet(s"$root/data/racerA")
    var planted = false
    Manifest.betweenReadAndCreate = () => {
      if (!planted) {
        planted = true
        Manifest.commit(spark, root, s"$root/data/racerA")
      }
    }
    try spark.sql("DELETE FROM dmlrace.t WHERE id >= 50 AND id < 100")
    finally Manifest.betweenReadAndCreate = () => ()
    assert(spark.read.format("graft").load(root).count() === 60L,
      "50 survivors + the racing append's 10 rows must both be present")
    // ---- race 2: a compaction consumes the DELETE's input groups —
    // committing would resurrect removed rows, so it must refuse
    spark.read.format("graft").load(root).coalesce(1)
      .write.parquet(s"$root/data/folded")
    var planted2 = false
    Manifest.betweenReadAndCreate = () => {
      if (!planted2) {
        planted2 = true
        Manifest.rewrite(spark, root, Seq(s"$root/data/folded"))
      }
    }
    val e =
      try intercept[Exception](
        spark.sql("DELETE FROM dmlrace.t WHERE id < 10"))
      finally Manifest.betweenReadAndCreate = () => ()
    def conflict(t: Throwable): Boolean = t != null &&
      (Option(t.getMessage).exists(_.contains("concurrent rewrite")) ||
        conflict(t.getCause))
    assert(conflict(e),
      s"a replacing race must refuse with the conflict error, got $e")
    assert(spark.read.format("graft").load(root).count() === 60L,
      "the refused DELETE must not have changed the table")
  }

  test("createIfAbsent is atomic under contention on the local fs: " +
      "exactly one winner per slot, winner's body intact") {
    // hadoop's local create(overwrite=false) is check-then-create — two
    // racers could both pass the check and the slower TRUNCATE the
    // winner's manifest (a silently lost commit). The committer claims
    // local slots with O_EXCL; this hammers the seam directly.
    val dir = java.nio.file.Files
      .createTempDirectory("graft-committer-race").toString
    val f = new Path(dir)
      .getFileSystem(spark.sparkContext.hadoopConfiguration)
    for (round <- 0 until 50) {
      val target = new Path(s"$dir/manifest-v%06d".format(round))
      val wins = new java.util.concurrent.atomic.AtomicInteger
      val start = new java.util.concurrent.CountDownLatch(1)
      val threads = (0 until 8).map { i =>
        new Thread(() => {
          start.await()
          if (graft.io.FsCreateCommitter.createIfAbsent(f, target,
              s"body-$i\n#graft-manifest-complete".getBytes("UTF-8")))
            wins.incrementAndGet()
        })
      }
      threads.foreach(_.start()); start.countDown()
      threads.foreach(_.join(60000))
      assert(wins.get === 1,
        s"round $round: exactly one racer may win the slot")
      val content = new String(java.nio.file.Files.readAllBytes(
        java.nio.file.Paths.get(s"$dir/manifest-v%06d".format(round))),
        "UTF-8")
      assert((0 until 8).exists(i =>
          content == s"body-$i\n#graft-manifest-complete"),
        s"round $round: the slot must hold ONE whole body, got " +
          s"'${content.take(60)}'")
    }
  }

  test("two genuinely concurrent DSv2 appends to one table both land") {
    val root = System.getProperty("java.io.tmpdir") + "/graft_v2par_tbl"
    new Path(root).getFileSystem(spark.sparkContext.hadoopConfiguration)
      .delete(new Path(root), true)
    (0L until 5L).map(i => (i, i)).toDF("id", "v")
      .write.format("graft").save(root)
    val errors = new java.util.concurrent.ConcurrentLinkedQueue[Throwable]
    val threads = (1 to 2).map { t =>
      new Thread(() => {
        try (t * 100L until t * 100L + 10L).map(i => (i, i))
          .toDF("id", "v").write.format("graft")
          .mode(org.apache.spark.sql.SaveMode.Append).save(root)
        catch { case e: Throwable => errors.add(e) }
      })
    }
    threads.foreach(_.start()); threads.foreach(_.join(120000))
    assert(errors.isEmpty,
      s"concurrent append failed: ${Option(errors.peek())}")
    assert(Manifest.versions(spark, root) === Seq(1, 2, 3),
      "both appends must land as consecutive versions")
    assert(spark.read.format("graft").load(root).count() === 25L)
  }

  test("DETERMINISTIC two-publisher pin race via the Committer seam: " +
      "the loser converges onto the winner's newer vector — the head " +
      "never regresses and no version is torn") {
    import spark.implicits._
    val base = System.getProperty("java.io.tmpdir") + "/graft_pin_race2"
    new Path(base).getFileSystem(spark.sparkContext.hadoopConfiguration)
      .delete(new Path(base), true)
    val (cat, ta, tb) = (s"$base/cat", s"$base/a", s"$base/b")
    def commitBoth(r: Int): Unit = {
      Seq(r.toLong).toDF("k").write.parquet(s"$base/d_a$r")
      Seq(r.toLong).toDF("k").write.parquet(s"$base/d_b$r")
      Manifest.commit(spark, ta, s"$base/d_a$r")
      Manifest.commit(spark, tb, s"$base/d_b$r")
    }
    commitBoth(1)
    Catalog.pinLatest(spark, cat, Seq(ta, tb)) // seed: (a@1, b@1)
    commitBoth(2) // publisher A will capture (a@2, b@2)
    // the ambush: exactly when A claims its first catalog version
    // slot, publisher B advances BOTH tables to v3 and fully publishes
    // (a@3, b@3) — A's create loses the slot, its retry would land the
    // stale (a@2, b@2) as the newest catalog version
    var fired = false
    val ambush = new graft.io.Committer {
      override def createIfAbsent(f: org.apache.hadoop.fs.FileSystem,
          target: Path, body: Array[Byte]): Boolean = {
        if (!fired && target.toString.contains("/cat/")) {
          fired = true
          commitBoth(3)
          Catalog.pinLatest(spark, cat, Seq(ta, tb)) // B wins
        }
        graft.io.FsCreateCommitter.createIfAbsent(f, target, body)
      }
    }
    val returned = Catalog.pinLatest(spark, cat, Seq(ta, tb), ambush)
    assert(fired, "the ambush must have interposed B's publish")
    // the RETURNED version resolves the settled head — B's vector
    assert(Catalog.resolve(spark, cat, Some(returned)) ===
      Map(ta -> 3, tb -> 3),
      "the loser must converge onto the winner's state")
    assert(Catalog.resolve(spark, cat) === Map(ta -> 3, tb -> 3),
      "the catalog head must never regress to the loser's stale vector")
    // every landed version is a consistent per-publish vector — the
    // loser's superseded (2,2) may appear mid-history, torn cuts never
    val hist = Catalog.history(spark, cat)
    hist.foreach { case (cv, vec) =>
      assert(vec(ta) === vec(tb),
        s"catalog@$cv pins a torn vector: (a@${vec(ta)}, b@${vec(tb)})")
    }
    assert(hist.last._2 === Map(ta -> 3, tb -> 3))
    // replayed publish with nothing new burns no catalog version
    val v2 = Catalog.pinLatest(spark, cat, Seq(ta, tb))
    assert(v2 === hist.last._1 &&
      Catalog.history(spark, cat).size === hist.size,
      "an idempotent re-publish must not burn a catalog version")
  }
}
