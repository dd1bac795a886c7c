package graft

import java.io.File

import org.apache.spark.sql.execution.{FileSourceScanExec, SparkPlan}
import org.apache.spark.sql.execution.adaptive.AdaptiveSparkPlanExec
import org.apache.spark.sql.execution.exchange.ShuffleExchangeExec
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.queries.OpsQueries

/** Storage-layout guarantees: bucketed joins really skip the shuffle,
  * partitioned reads really prune directories, and compaction really
  * collapses the file count — asserted on the physical plan and the
  * filesystem, not inferred from results.
  */
class LayoutSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  val sf = "/root/testdata/sf0.001"

  /** AQE wraps the plan in AdaptiveSparkPlanExec, whose `collect` doesn't
    * descend into the inner plan — unwrap before asserting structure.
    */
  private def unwrap(p: SparkPlan): SparkPlan = p match {
    case a: AdaptiveSparkPlanExec => a.executedPlan
    case p => p
  }

  private def parquetFiles(dir: String): Array[File] =
    new File(dir).listFiles().filter(f =>
      f.isFile && f.getName.endsWith(".parquet"))

  test("DSv2 read path: skip-stats pruning happens BEFORE the scan is " +
      "planned — pruned directories never enter the input partitions") {
    import org.apache.spark.sql.functions.{col, lit}
    import graft.io.{Manifest, SkipStats}
    val root = java.nio.file.Files
      .createTempDirectory("graft-dsv2").toString + "/tbl"
    import spark.implicits._
    def batch(lo: Long, hi: Long) =
      (lo until hi).map(i => (i, i * 3)).toDF("id", "v")
    Seq((0L, 100L, "b1"), (100L, 200L, "b2"), (200L, 300L, "b3"))
      .foreach { case (lo, hi, name) =>
        batch(lo, hi).write.parquet(s"$root/data/$name")
        SkipStats.write(spark, s"$root/data/$name", Seq("id"))
        Manifest.commit(spark, root, s"$root/data/$name")
      }
    val df = spark.read.format("graft").load(root)
      .filter(col("id").between(120, 180)).select(col("id"))
    val scans = unwrap(df.queryExecution.executedPlan).collect {
      case b: org.apache.spark.sql.execution.datasources.v2
          .BatchScanExec => b
    }
    assert(scans.size === 1)
    val scan = scans.head.scan.asInstanceOf[graft.io.dsv2.GraftScan]
    assert(scan.skippedDirs.map(d => d.substring(d.lastIndexOf('/') + 1))
      .sorted === Seq("b1", "b3"),
      "the out-of-range directories must be pruned at planning")
    assert(scan.keptDirs.map(_.split('/').last) === Seq("b2"))
    // the partition-level consequence: no planned file touches a
    // pruned directory — pruning preceded planning, it is not a filter
    val files = scan.planInputPartitions().flatMap {
      case fp: org.apache.spark.sql.execution.datasources.FilePartition =>
        fp.files.map(_.filePath.toString)
    }
    assert(files.nonEmpty)
    assert(files.forall(_.contains("/data/b2/")),
      s"planned files must come only from the kept directory: " +
        files.mkString(", "))
    // column pruning reached the delegate parquet scan
    assert(scan.readSchema().fieldNames.toSeq === Seq("id"))
    // and the answer is exact despite pruning (inclusive-bound keeps)
    assert(df.count() === 61)
    // everything-pruned still answers (empty, right schema)
    val none = spark.read.format("graft").load(root)
      .filter(col("id") === lit(99999L))
    assert(none.count() === 0)
  }

  test("DSv2 write path: append/overwrite on an existing table plan as " +
      "V2 writes; sortBy injects the required range sort; the sidecar " +
      "written through the V2 path prunes the next read") {
    import scala.collection.mutable
    val plans = mutable.ListBuffer.empty[(String, SparkPlan)]
    val listener = new org.apache.spark.sql.util.QueryExecutionListener {
      override def onSuccess(funcName: String,
          qe: org.apache.spark.sql.execution.QueryExecution,
          durationNs: Long): Unit =
        plans.synchronized { plans += ((funcName, qe.executedPlan)) }
      override def onFailure(funcName: String,
          qe: org.apache.spark.sql.execution.QueryExecution,
          exception: Exception): Unit = ()
    }
    import spark.implicits._
    val root = java.nio.file.Files
      .createTempDirectory("graft-v2write").toString + "/tbl"
    def batch(lo: Long, hi: Long) =
      (lo until hi).map(i => (i, i % 5)).toDF("id", "grp")
    // create: no committed version yet -> V1 fallback (by design)
    batch(0, 100).write.format("graft").save(root)
    spark.listenerManager.register(listener)
    try {
      batch(100, 200).write.format("graft")
        .mode(org.apache.spark.sql.SaveMode.Append)
        .option("statsCols", "id").option("sortBy", "id").save(root)
      batch(0, 50).write.format("graft")
        .mode(org.apache.spark.sql.SaveMode.Overwrite).save(root)
      // the listener bus is async — wait for both write plans to land
      val deadline = System.nanoTime() + 30L * 1000 * 1000 * 1000
      while (System.nanoTime() < deadline && !plans.synchronized {
          val t = plans.map(_._2.toString)
          t.exists(_.contains("AppendData")) &&
            t.exists(_.contains("OverwriteByExpression")) })
        Thread.sleep(50)
    } finally spark.listenerManager.unregister(listener)
    val texts = plans.synchronized(plans.toList)
      .map { case (fn, p) => (fn, p.toString) }
    val append = texts.filter(_._2.contains("AppendData"))
    assert(append.nonEmpty,
      s"the append must plan as a V2 AppendData, saw: " +
        s"${texts.map(_._1).mkString(", ")}")
    assert(append.exists { case (_, t) =>
      t.contains("Sort [id") || t.contains("Sort [id#") ||
        (t.contains("Sort") && t.contains("AppendData")) },
      "sortBy must inject the required ordering below the V2 write:\n" +
        append.map(_._2).mkString("\n"))
    assert(texts.exists(_._2.contains("OverwriteByExpression")),
      "overwrite must plan as a V2 truncate-write")
    // the V2 path committed one version per save, replacing on overwrite
    assert(graft.io.Manifest.versions(spark, root) === Seq(1, 2, 3))
    assert(spark.read.format("graft").load(root).count() === 50L)
    assert(spark.read.format("graft").option("versionAsOf", "2")
      .load(root).count() === 200L)
    // the sidecar written through the V2 path prunes the next read
    val pruned = spark.read.format("graft").option("versionAsOf", "2")
      .load(root).filter(col("id") >= 150)
    pruned.collect()
    // (the create batch has no sidecar, so only the append's dir can
    // be skipped — pruning must still kick in on the sorted batch)
    assert(pruned.queryExecution.executedPlan.toString
      .contains("skippedDirs="), "the V2 write must stay skip-stats aware")
  }

  test("io10: bucketed join plans with zero shuffle exchanges") {
    val prev = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try {
      val df = OpsQueries.io10BucketedJoin(spark, sf)
      val plan = unwrap(df.queryExecution.executedPlan)
      val joins = plan.collect { case j if j.nodeName.contains("SortMergeJoin") => j }
      assert(joins.nonEmpty, plan.toString)
      // no exchange anywhere below the join: bucket layout satisfies the
      // join's required distribution on both sides
      val exchangesBelowJoin = joins.head.collect {
        case e: ShuffleExchangeExec => e
      }
      assert(exchangesBelowJoin.isEmpty,
        "bucketed tables must join without a shuffle:\n" + plan)
      assert(df.count() > 0)
    } finally spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prev)
  }

  test("io11: partition filter prunes to a single directory") {
    val df = OpsQueries.io11PartitionPrune(spark, sf)
    val scan = unwrap(df.queryExecution.executedPlan).collect {
      case s: FileSourceScanExec => s
    }.head
    assert(scan.partitionFilters.nonEmpty,
      "event_type = 'click' must be a partition filter, not a data filter")
    val listing = scan.selectedPartitions
    assert(listing.partitionCount === 1,
      s"scan must prune to exactly one partition, got ${listing.partitionCount}")
    val selected = listing.toPartitionArray.map(_.urlEncodedPath)
    assert(selected.nonEmpty && selected.forall(_.contains("event_type=click")),
      s"scan must enumerate only the matching partition directory: " +
        selected.mkString(", "))
    assert(df.count() === 1)
  }

  test("io34: the evolved layout prunes on the NEW partition key") {
    // the gate itself proves answer-identity; this pins the point of
    // the evolution — a ub filter prunes at the listing on the evolved
    // snapshot (it was a data filter under the old event_type layout)
    OpsQueries.io34PartitionEvolution(spark, sf).collect()
    val evolved = spark.read.parquet(
      System.getProperty("java.io.tmpdir") + "/graft_io34/by_ub")
      .filter(col("ub") === 2)
    val scan = unwrap(evolved.queryExecution.executedPlan).collect {
      case s: FileSourceScanExec => s
    }.head
    assert(scan.partitionFilters.nonEmpty,
      "ub = 2 must be a partition filter on the evolved layout")
    assert(scan.selectedPartitions.partitionCount === 1,
      s"scan must prune to exactly the ub=2 directory, got " +
        s"${scan.selectedPartitions.partitionCount}")
    val selected = scan.selectedPartitions.toPartitionArray
      .map(_.urlEncodedPath)
    assert(selected.nonEmpty && selected.forall(_.contains("ub=2")),
      s"scan must enumerate only ub=2: ${selected.mkString(", ")}")
  }

  test("io35: column mapping refuses unknown columns and logical collisions") {
    import graft.io.{ColumnMapping, Manifest}
    val root = java.nio.file.Files
      .createTempDirectory("graft-colmap").toString
    val tbl = s"$root/tbl"
    import spark.implicits._
    Seq((1L, 2L), (3L, 4L)).toDF("a", "b").write.parquet(s"$root/d0")
    Manifest.commit(spark, tbl, s"$root/d0")
    ColumnMapping.renameColumn(spark, tbl, root, "a", "x")
    // logical schema is now (x, b): the OLD name is gone...
    val eUnknown = intercept[IllegalArgumentException] {
      ColumnMapping.renameColumn(spark, tbl, root, "a", "y")
    }
    assert(eUnknown.getMessage.contains("no logical column 'a'"))
    // ...and renaming onto an existing logical name refuses
    val eClash = intercept[IllegalArgumentException] {
      ColumnMapping.renameColumn(spark, tbl, root, "b", "x")
    }
    assert(eClash.getMessage.contains("'x' exists"))
    // rename-back drops the mapping entirely (identity maps to empty)
    ColumnMapping.renameColumn(spark, tbl, root, "x", "a")
    assert(ColumnMapping.mapping(spark, tbl) === Map.empty)
    assert(ColumnMapping.snapshot(spark, tbl).columns.toSeq ===
      Seq("a", "b"))
  }

  test("io12: compaction collapses 64 files to the planned count, content intact") {
    val tmp = System.getProperty("java.io.tmpdir")
    val result = OpsQueries.io12Compaction(spark, sf).collect()
    val srcFiles = parquetFiles(tmp + "/graft_io12_src").length
    val outFiles = parquetFiles(tmp + "/graft_io12_out").length
    assert(srcFiles === 64)
    val (planned, bytes) = graft.io.Compaction.plan(
      spark, tmp + "/graft_io12_src", 8L * 1024 * 1024)
    assert(outFiles === planned)
    assert(outFiles < srcFiles)
    assert(bytes > 0)
    // row-exact preservation: same census as reading the source directly
    val direct = spark.read.parquet(tmp + "/graft_io12_src")
      .groupBy(col("l_returnflag"))
      .agg(count(lit(1)).as("n"), sum(col("l_orderkey")).as("sum_okey"),
        sum(col("l_partkey")).as("sum_pkey"), sum(col("cents")).as("sum_cents"))
      .orderBy(col("l_returnflag")).collect()
    assert(result.toSeq === direct.toSeq)
  }

  test("compaction plan: ceil division, floor of one file, bad target rejected") {
    val tmp = System.getProperty("java.io.tmpdir")
    OpsQueries.io12Compaction(spark, sf).collect()
    val (one, bytes) = graft.io.Compaction.plan(
      spark, tmp + "/graft_io12_src", Long.MaxValue)
    assert(one === 1)
    val (n, _) = graft.io.Compaction.plan(
      spark, tmp + "/graft_io12_src", bytes / 4)
    assert(n === 5 || n === 4, s"ceil(bytes/(bytes/4)) expected ~4-5, got $n")
    intercept[IllegalArgumentException] {
      graft.io.Compaction.plan(spark, tmp + "/graft_io12_src", 0)
    }
  }

  test("io14: z-order box query prunes to the intersecting z-prefix cells") {
    val df = OpsQueries.io14Zorder(spark, sf)
    val scan = unwrap(df.queryExecution.executedPlan).collect {
      case s: FileSourceScanExec => s
    }.head
    assert(scan.partitionFilters.nonEmpty,
      "zp IN (...) must be a partition filter, not a data filter")
    val listing = scan.selectedPartitions
    // box [30,150]×[0,30] intersects x-cells {0,1,2} × y-cell {0} → the
    // z prefixes interleaving x bits at even positions: 0, 1, 4
    assert(graft.io.ZOrder.prefixesFor(30, 150, 0, 30, 4) === Seq(0, 1, 4))
    assert(listing.partitionCount === 3,
      s"scan must prune to the 3 intersecting z cells, got " +
        s"${listing.partitionCount}")
    val written = new File(System.getProperty("java.io.tmpdir") +
      "/graft_io14_zorder").listFiles().count(_.getName.startsWith("zp="))
    assert(written > 3, s"data must occupy >3 z cells (saw $written), " +
      "or the prune proves nothing")
  }

  test("io15: failed audit leaves staging for inspection, published table untouched") {
    OpsQueries.io15Wap(spark, sf).collect()
    val root = System.getProperty("java.io.tmpdir") + "/graft_io15_wap"
    // clean batch moved out of staging into the published table
    assert(!new File(s"$root/_staging/b1").exists(), "b1 must have moved")
    assert(new File(s"$root/published/batch=1").exists())
    // defective batch: held in staging, never published
    assert(new File(s"$root/_staging/b2").exists(),
      "failed batch must stay staged for inspection")
    assert(!new File(s"$root/published/batch=2").exists(),
      "failed batch must not publish")
    // publish refuses to clobber an existing target
    val boom = intercept[IllegalArgumentException] {
      graft.io.WriteAuditPublish.publish(spark,
        s"$root/_staging/b2", s"$root/published/batch=1")
    }
    assert(boom.getMessage.contains("already exists"))
  }

  test("io16: manifest commits are snapshot-isolated, immutable, and race-safe") {
    OpsQueries.io16Manifest(spark, sf).collect()
    val root = System.getProperty("java.io.tmpdir") + "/graft_io16_tbl"
    // the orphan's files exist on disk but no snapshot may list them
    assert(new File(s"$root/data/b3").exists())
    val latest = graft.io.Manifest.snapshot(spark, root)
      .inputFiles.mkString("\n")
    assert(!latest.contains("/b3/"), "orphan batch leaked into a snapshot")
    // historical versions remain readable and pin their exact file set
    assert(graft.io.Manifest.versions(spark, root) === Seq(1, 2))
    val v1 = graft.io.Manifest.snapshot(spark, root, Some(1)).inputFiles
    assert(v1.forall(_.contains("/b1/")), "v1 must read only batch 1")
    // losing a commit race: version file already exists → create fails
    intercept[java.io.IOException] {
      val f = new org.apache.hadoop.fs.Path(root)
        .getFileSystem(spark.sparkContext.hadoopConfiguration)
      f.create(new org.apache.hadoop.fs.Path(root, "manifest-v000002"),
        false).close()
    }
    // commit() itself must survive losing the race: through the test
    // seam, a competitor lands manifest-v3 INSIDE the read→create window
    // of our commit — the retry loop must re-read the winner's list,
    // fold it in, and land on v4
    val f = new org.apache.hadoop.fs.Path(root)
      .getFileSystem(spark.sparkContext.hadoopConfiguration)
    var planted = false
    graft.io.Manifest.betweenReadAndCreate = () => {
      if (!planted) {
        planted = true
        val out = f.create(
          new org.apache.hadoop.fs.Path(root, "manifest-v000003"), false)
        out.write(
          s"$root/data/b1\n$root/data/race\n#graft-manifest-complete"
            .getBytes(java.nio.charset.StandardCharsets.UTF_8))
        out.close()
      }
    }
    try {
      val got = graft.io.Manifest.commit(spark, root, s"$root/data/b2")
      assert(got == 4, s"lost race must retry at the next slot, got v$got")
      assert(graft.io.Manifest.committed(spark, root) ==
        Seq(s"$root/data/b1", s"$root/data/race", s"$root/data/b2"),
        "the retried commit must append to the race WINNER's list")
    } finally graft.io.Manifest.betweenReadAndCreate = () => ()
  }

  test("io16: the commit race survives a swapped-in committer " +
      "(conditional-PUT seam)") {
    // the protocol must be committer-agnostic: the same interleaved race
    // (a competitor lands the next version inside our read→create
    // window) resolves identically through a conditional-PUT-style
    // committer — emulated here with a mutex'd exists+overwrite, the
    // If-None-Match shape an object store provides. This pins the seam a
    // production S3 deployment drops its client into.
    import org.apache.hadoop.fs.{FileSystem, Path}
    object ConditionalPut extends graft.io.Committer {
      val monitor = new Object
      var puts = 0
      override def createIfAbsent(f: FileSystem, target: Path,
          body: Array[Byte]): Boolean = monitor.synchronized {
        if (f.exists(target)) false
        else {
          val out = f.create(target, true)
          try out.write(body) finally out.close()
          puts += 1
          true
        }
      }
    }
    val root = System.getProperty("java.io.tmpdir") + "/graft_cput_tbl"
    val f = new Path(root)
      .getFileSystem(spark.sparkContext.hadoopConfiguration)
    f.delete(new Path(root), true)
    assert(graft.io.Manifest.commit(spark, root, s"$root/data/b1",
      ConditionalPut) == 1)
    var planted = false
    graft.io.Manifest.betweenReadAndCreate = () => {
      if (!planted) {
        planted = true
        val out = f.create(new Path(root, "manifest-v000002"), false)
        out.write((s"$root/data/b1\n$root/data/race\n" +
          "#graft-manifest-complete")
          .getBytes(java.nio.charset.StandardCharsets.UTF_8))
        out.close()
      }
    }
    try {
      val got = graft.io.Manifest.commit(spark, root, s"$root/data/b2",
        ConditionalPut)
      assert(got == 3, s"lost race must retry at the next slot, got v$got")
      assert(graft.io.Manifest.committed(spark, root) ==
        Seq(s"$root/data/b1", s"$root/data/race", s"$root/data/b2"),
        "the retried commit must append to the race WINNER's list")
      assert(ConditionalPut.puts == 2,
        "both surviving versions must have gone through the seam")
    } finally graft.io.Manifest.betweenReadAndCreate = () => ()
  }

  test("expire reclaims a corrupt dead manifest; repair frees a stuck " +
      "terminator-less latest") {
    import org.apache.hadoop.fs.Path
    val root = System.getProperty("java.io.tmpdir") + "/graft_repair_tbl"
    val f = new Path(root)
      .getFileSystem(spark.sparkContext.hadoopConfiguration)
    f.delete(new Path(root), true)
    spark.range(1).toDF("id").write.mode("overwrite")
      .parquet(s"$root/data/b1")
    spark.range(1).toDF("id").write.mode("overwrite")
      .parquet(s"$root/data/b2")
    assert(graft.io.Manifest.commit(spark, root, s"$root/data/b1") == 1)
    // a writer died mid-write on v2 (no terminator), then the table
    // moved on: v3 committed by a healthy producer
    val dead = f.create(new Path(root, "manifest-v000002"), false)
    dead.write(s"$root/data/ghost\n"
      .getBytes(java.nio.charset.StandardCharsets.UTF_8))
    dead.close()
    val v3 = graft.io.Manifest.rewrite(spark, root,
      Seq(s"$root/data/b1", s"$root/data/b2"))
    assert(v3 == 3)
    // vacuum down to the latest: the corrupt v2 must not abort the
    // loop — it reclaims as "references nothing" and its file goes
    val expired = graft.io.Manifest.expire(spark, root, keepLast = 1)
    assert(expired == Seq(1, 2))
    assert(graft.io.Manifest.versions(spark, root) == Seq(3))
    // now wedge the LATEST slot: v4 terminator-less blocks every commit
    val stuck = f.create(new Path(root, "manifest-v000004"), false)
    stuck.write("partial".getBytes(java.nio.charset.StandardCharsets.UTF_8))
    stuck.close()
    intercept[graft.io.Manifest.IncompleteManifestException] {
      graft.io.Manifest.committed(spark, root)
    }
    // inside the grace window repair must leave the (possibly healthy,
    // in-flight) writer alone
    assert(graft.io.Manifest.repair(spark, root,
      graceMs = 60000L).isEmpty)
    // past the grace window the stuck slot is reclaimed and commits flow
    assert(graft.io.Manifest.repair(spark, root, graceMs = 0L)
      .contains(4))
    val v4 = graft.io.Manifest.commit(spark, root, s"$root/data/b2")
    assert(v4 == 4 || v4 == 5, s"commit must proceed after repair, got $v4")
    assert(graft.io.Manifest.committed(spark, root).last ==
      s"$root/data/b2")
  }

  test("io20: copy-on-write delete carries unaffected files verbatim " +
      "and rewrites only matching directories") {
    import org.apache.hadoop.fs.Path
    val root = System.getProperty("java.io.tmpdir") + "/graft_cow_tbl"
    val f = new Path(root)
      .getFileSystem(spark.sparkContext.hadoopConfiguration)
    f.delete(new Path(root), true)
    spark.range(0, 100).toDF("id").write.parquet(s"$root/data/b1")
    spark.range(100, 200).toDF("id").write.parquet(s"$root/data/b2")
    graft.io.Manifest.commit(spark, root, s"$root/data/b1")
    graft.io.Manifest.commit(spark, root, s"$root/data/b2")
    val before = spark.read.parquet(s"$root/data/b1").inputFiles.sorted
    val res = graft.io.RowDelete.deleteWhere(spark, root,
      col("id").between(150, 159), s"$root/data/del")
    assert(res.carried == Seq(s"$root/data/b1") &&
      res.rewritten.size == 1)
    // file-granular zero-copy: the new snapshot reads b1's ORIGINAL
    // parquet files, not copies — same physical paths, byte for byte
    val after = graft.io.Manifest.snapshot(spark, root).inputFiles
      .filter(_.contains("/data/b1/")).sorted
    assert(after.sameElements(before),
      s"carried dir must keep its exact files: $before vs $after")
    val ids = graft.io.Manifest.snapshot(spark, root)
      .select("id").collect().map(_.getLong(0)).sorted
    assert(ids.sameElements((0L until 150L) ++ (160L until 200L)),
      "exactly the matched rows are gone")
    // old version still reads everything (time travel over a delete)
    assert(graft.io.Manifest.snapshot(spark, root, Some(2)).count() == 200)
  }

  test("io20: NULL-predicate rows survive a copy-on-write delete in " +
      "rewritten directories, matching SQL DELETE semantics") {
    import org.apache.hadoop.fs.Path
    val root = System.getProperty("java.io.tmpdir") + "/graft_cow_null"
    val f = new Path(root)
      .getFileSystem(spark.sparkContext.hadoopConfiguration)
    f.delete(new Path(root), true)
    // b1 mixes deletable rows with NULL-predicate rows; b2 holds ONLY
    // NULL-predicate rows. SQL DELETE keeps NULL-predicate rows, so the
    // outcome must be identical whether a row shares a directory with a
    // match (b1, rewritten) or not (b2, carried verbatim).
    import spark.implicits._
    Seq((1L, Some(5L)), (2L, Some(50L)), (3L, None: Option[Long]))
      .toDF("id", "v").write.parquet(s"$root/data/b1")
    Seq((4L, None: Option[Long]), (5L, None: Option[Long]))
      .toDF("id", "v").write.parquet(s"$root/data/b2")
    graft.io.Manifest.commit(spark, root, s"$root/data/b1")
    graft.io.Manifest.commit(spark, root, s"$root/data/b2")
    val res = graft.io.RowDelete.deleteWhere(spark, root,
      col("v") > 10, s"$root/data/del")
    assert(res.carried == Seq(s"$root/data/b2") && res.rewritten.size == 1,
      s"only b1 holds a match: $res")
    val ids = graft.io.Manifest.snapshot(spark, root)
      .select("id").collect().map(_.getLong(0)).sorted
    assert(ids.sameElements(Seq(1L, 3L, 4L, 5L)),
      "exactly the TRUE-predicate row is deleted; NULL-predicate rows " +
        s"are kept in rewritten and carried dirs alike, got ${ids.toSeq}")
  }

  test("io21: merge-on-read delete writes only keys; fold ends the " +
      "deferral without changing what readers see") {
    import org.apache.hadoop.fs.Path
    val root = System.getProperty("java.io.tmpdir") + "/graft_mor_tbl"
    val f = new Path(root)
      .getFileSystem(spark.sparkContext.hadoopConfiguration)
    f.delete(new Path(root), true)
    spark.range(0, 100).toDF("id").write.parquet(s"$root/data/b1")
    spark.range(100, 200).toDF("id").write.parquet(s"$root/data/b2")
    graft.io.Manifest.commit(spark, root, s"$root/data/b1")
    graft.io.Manifest.commit(spark, root, s"$root/data/b2")
    val before = graft.io.Manifest.snapshot(spark, root).inputFiles.sorted
    val v3 = graft.io.MergeOnRead.deleteWhere(spark, root, "id",
      col("id").between(150, 159), s"$root/data")
    assert(v3.contains(3))
    // write-cheap half of the trade: the delete wrote ONLY a keys
    // directory — the merged snapshot still reads every original data
    // file, plus the tombstone side of the anti-join
    val merged = graft.io.MergeOnRead.snapshot(spark, root, "id")
    val dataFiles = merged.inputFiles.filter(!_.contains("/tombstones-"))
    assert(dataFiles.sorted.sameElements(before),
      "tombstone commit must leave every original data file in place")
    assert(merged.select("id").collect().map(_.getLong(0)).sorted
      .sameElements((0L until 150L) ++ (160L until 200L)))
    // time travel to the pre-delete version reads everything
    assert(graft.io.MergeOnRead
      .snapshot(spark, root, "id", Some(2)).count() == 200)
    // fold rewrites only the directory holding tombstoned keys and the
    // folded table reads IDENTICALLY to the merged one
    val res = graft.io.MergeOnRead.fold(spark, root, "id", s"$root/data")
    assert(res.exists(r => r.carried == Seq(s"$root/data/b1") &&
      r.rewritten.size == 1))
    assert(!graft.io.Manifest.entries(spark, root)
      .exists(graft.io.MergeOnRead.isTombstone))
    val folded = graft.io.Manifest.snapshot(spark, root)
    assert(folded.select("id").collect().map(_.getLong(0)).sorted
      .sameElements((0L until 150L) ++ (160L until 200L)),
      "fold must not change what readers see")
    // fold on a tombstone-free table is a no-op
    assert(graft.io.MergeOnRead
      .fold(spark, root, "id", s"$root/data").isEmpty)
  }

  test("io23: an appending window's change feed reads only the " +
      "appended directories — IO proportional to the change") {
    import org.apache.hadoop.fs.Path
    val root = System.getProperty("java.io.tmpdir") + "/graft_cdf_tbl"
    val f = new Path(root)
      .getFileSystem(spark.sparkContext.hadoopConfiguration)
    f.delete(new Path(root), true)
    spark.range(0, 100).toDF("id").write.parquet(s"$root/data/b1")
    spark.range(100, 200).toDF("id").write.parquet(s"$root/data/b2")
    graft.io.Manifest.commit(spark, root, s"$root/data/b1")
    graft.io.Manifest.commit(spark, root, s"$root/data/b2")
    val feed = graft.io.ChangeFeed.changesBetween(spark, root, "id", 1, 2)
    // the incremental-read payoff: a pure-append window never touches
    // pre-existing data — only b2's files appear in the scan
    val files = feed.inputFiles
    assert(files.nonEmpty && files.forall(_.contains("/data/b2/")),
      s"append-only feed must read only appended dirs: ${files.toSeq}")
    assert(feed.filter(col("_op") === "I").count() == 100 &&
      feed.count() == 100)
    // an empty window yields an empty feed
    assert(graft.io.ChangeFeed
      .changesBetween(spark, root, "id", 2, 2).count() == 0)
  }

  test("io24: skip-stats range scan plans only overlapping directories " +
      "and the sidecar is invisible to plain readers") {
    import org.apache.hadoop.fs.Path
    val root = System.getProperty("java.io.tmpdir") + "/graft_skip_tbl"
    val f = new Path(root)
      .getFileSystem(spark.sparkContext.hadoopConfiguration)
    f.delete(new Path(root), true)
    Seq((0L, 100L, "b1"), (100L, 200L, "b2"), (200L, 300L, "b3"))
      .foreach { case (lo, hi, name) =>
        spark.range(lo, hi).toDF("id").write.parquet(s"$root/data/$name")
        graft.io.SkipStats.write(spark, s"$root/data/$name", Seq("id"))
        graft.io.Manifest.commit(spark, root, s"$root/data/$name")
      }
    val scan = graft.io.SkipStats.scan(spark, root, "id", 120, 180)
    // dir-granular pruning: only b2's files are in the plan at all
    assert(scan.inputFiles.nonEmpty &&
      scan.inputFiles.forall(_.contains("/data/b2/")),
      s"range scan must plan only the overlapping dir: ${scan.inputFiles.toSeq}")
    assert(scan.select("id").collect().map(_.getLong(0)).sorted
      .sameElements(120L to 180L))
    // the sidecar never reaches a plain snapshot reader's file list
    val snapFiles = graft.io.Manifest.snapshot(spark, root).inputFiles
    assert(snapFiles.length == 3 * spark.read
      .parquet(s"$root/data/b1").inputFiles.length &&
      !snapFiles.exists(_.contains("_graft_stats")))
    assert(graft.io.Manifest.snapshot(spark, root).count() == 300)
  }

  test("index compaction: an appending manifest index compacts to fewer " +
      "files as a replacing commit — census identical, skip-stats " +
      "re-emitted, per-increment stats folded, time travel intact") {
    import org.apache.hadoop.fs.Path
    val root = System.getProperty("java.io.tmpdir") + "/graft_idxcompact"
    val f = new Path(root)
      .getFileSystem(spark.sparkContext.hadoopConfiguration)
    f.delete(new Path(root), true)
    // s14-shaped IVF list entries: one append-only commit per block
    Seq(0, 1, 2).foreach { b =>
      spark.range(b * 100L, b * 100L + 100L)
        .selectExpr("id AS vec_id", "CAST(id % 7 AS INT) AS clabel")
        .repartition(4)
        .write.parquet(s"$root/data/block$b")
      graft.io.Manifest.commit(spark, root, s"$root/data/block$b")
    }
    val preVersion = graft.io.Manifest.versions(spark, root).last
    val pre = graft.io.Manifest.snapshot(spark, root)
    val preFiles = pre.inputFiles.length
    val preCensus = pre.groupBy("clabel").count().collect()
      .map(r => (r.getInt(0), r.getLong(1))).sortBy(_._1)
    graft.io.IndexCompaction.compact(spark, root,
      s"$root/data/compacted", statsCols = Seq("vec_id"))
    val post = graft.io.Manifest.snapshot(spark, root)
    assert(post.inputFiles.length < preFiles,
      s"file count must drop ($preFiles -> ${post.inputFiles.length})")
    assert(post.inputFiles.forall(_.contains("/data/compacted")))
    val postCensus = post.groupBy("clabel").count().collect()
      .map(r => (r.getInt(0), r.getLong(1))).sortBy(_._1)
    assert(postCensus.sameElements(preCensus),
      "compaction must not change the census")
    // the rewritten directory carries FRESH skip-stats — a range scan
    // keeps planning through the sidecar after maintenance
    val scan = graft.io.SkipStats.scan(spark, root, "vec_id", 10, 20)
    assert(scan.count() == 11)
    // time travel: the pre-compact version still reads the increments
    assert(graft.io.Manifest
      .snapshot(spark, root, Some(preVersion)).count() == 300)
    // per-increment distributive stats: 3 rows fold to 1, same totals
    val sroot = root + "_stats"
    f.delete(new Path(sroot), true)
    Seq(0, 1, 2).foreach { b =>
      spark.range(1).selectExpr("CAST(100 AS BIGINT) AS nd",
        s"CAST(${1000 + b} AS BIGINT) AS tl")
        .write.parquet(s"$sroot/data/s$b")
      graft.io.Manifest.commit(spark, sroot, s"$sroot/data/s$b")
    }
    graft.io.IndexCompaction.compactStats(spark, sroot,
      s"$sroot/data/folded")(
      _.agg(sum(col("nd")).as("nd"), sum(col("tl")).as("tl")))
    val folded = graft.io.Manifest.snapshot(spark, sroot)
    assert(folded.count() == 1)
    val r0 = folded.select(col("nd"), col("tl")).collect()(0)
    assert(r0.getLong(0) == 300 && r0.getLong(1) == 3003)
  }

  test("a streamed-in manifest table is range-prunable from its FIRST " +
      "batch: foreachBatch ingest via commitWithStats lets a pruned " +
      "scan read only the overlapping directories") {
    import org.apache.hadoop.fs.Path
    import org.apache.spark.sql.streaming.Trigger
    val root = System.getProperty("java.io.tmpdir") + "/graft_streamstats"
    val f = new Path(root)
      .getFileSystem(spark.sparkContext.hadoopConfiguration)
    f.delete(new Path(root), true)
    val srcDir = s"$root/src"
    val tbl = s"$root/tbl"
    // three source files with disjoint id ranges → three microbatches
    Seq((0L, 100L), (100L, 200L), (200L, 300L)).foreach { case (lo, hi) =>
      spark.range(lo, hi).toDF("id").coalesce(1)
        .write.mode("append").parquet(srcDir)
    }
    val ingest = (batch: org.apache.spark.sql.DataFrame, batchId: Long) => {
      if (!batch.isEmpty) {
        val dest = s"$tbl/data/batch=$batchId"
        batch.write.mode("overwrite").parquet(dest)
        graft.io.Manifest.commitWithStats(batch.sparkSession, tbl, dest,
          Seq("id"))
      }
      ()
    }
    spark.readStream.schema(spark.read.parquet(srcDir).schema)
      .option("maxFilesPerTrigger", "1").parquet(srcDir)
      .writeStream.foreachBatch(ingest)
      .option("checkpointLocation", s"$root/ckpt")
      .trigger(Trigger.AvailableNow()).start().awaitTermination()
    // no maintenance pass has run — pruning must already work
    val (kept, skipped) =
      graft.io.SkipStats.prunedDirs(spark, tbl, "id", "120", "180")
    assert(kept.size == 1 && skipped.size == 2,
      s"expected exactly one overlapping batch dir, got kept=$kept")
    val scan = graft.io.SkipStats.scan(spark, tbl, "id", 120, 180)
    assert(scan.inputFiles.forall(p =>
      kept.exists(k => p.replaceFirst("^file:/*", "/").startsWith(
        k.replaceFirst("^file:/*", "/")))),
      s"pruned scan must plan only the overlapping directory's files: " +
        s"${scan.inputFiles.toSeq} vs $kept")
    assert(scan.collect().map(_.getLong(0)).sorted
      .sameElements(120L to 180L))
  }

  test("sweepAllOrphans reclaims a crashed-rewrite STAGING orphan " +
      "alongside ingest orphans, while committed rewrites, live data " +
      "and time travel survive") {
    import org.apache.hadoop.fs.Path
    import graft.io.Manifest
    val root = System.getProperty("java.io.tmpdir") + "/graft_sweepall"
    val f = new Path(root)
      .getFileSystem(spark.sparkContext.hadoopConfiguration)
    f.delete(new Path(root), true)
    val dataRoot = s"$root/data"
    val staging = s"$root/staging"
    spark.range(0, 100).toDF("id").write.parquet(s"$dataRoot/b0")
    Manifest.commit(spark, root, s"$dataRoot/b0")
    spark.range(100, 200).toDF("id").write.parquet(s"$dataRoot/b1")
    val v2 = Manifest.commit(spark, root, s"$dataRoot/b1")
    // a SUCCESSFUL maintenance rewrite: staged, then committed — its
    // directory is referenced like any entry and must survive the sweep
    spark.read.parquet(s"$dataRoot/b0", s"$dataRoot/b1").repartition(1)
      .write.parquet(s"$staging/cow-v2-0")
    Manifest.rewrite(spark, root, Seq(s"$staging/cow-v2-0"))
    // a CRASHED maintenance rewrite: landed under staging, never
    // committed — the orphan a data-root-only sweep would never visit
    spark.range(0, 200).toDF("id").write.parquet(s"$staging/cow-v3-0")
    // and a plain crashed-ingest orphan under the data root
    spark.range(0, 9).toDF("id").write.parquet(s"$dataRoot/b_orphan")
    val swept = Manifest.sweepAllOrphans(spark, root,
      Seq(dataRoot, staging), graceMs = 0L)
    assert(swept.map(p => p.substring(p.lastIndexOf('/') + 1)).toSet ==
      Set("b_orphan", "cow-v3-0"), s"swept: $swept")
    // the live snapshot reads the committed rewrite; time travel to the
    // pre-rewrite version still reads the original directories
    assert(Manifest.snapshot(spark, root).count() == 200)
    assert(Manifest.snapshot(spark, root, Some(v2)).count() == 200)
    assert(Manifest.snapshot(spark, root).inputFiles
      .forall(_.contains("/staging/cow-v2-0")))
  }

  test("io24: pruned scan on a tombstoned table merges deletes or " +
      "fails loudly — never resurrects deleted rows") {
    import org.apache.hadoop.fs.Path
    val root = System.getProperty("java.io.tmpdir") + "/graft_skipmor_tbl"
    val f = new Path(root)
      .getFileSystem(spark.sparkContext.hadoopConfiguration)
    f.delete(new Path(root), true)
    Seq((0L, 100L, "b1"), (100L, 200L, "b2")).foreach {
      case (lo, hi, name) =>
        spark.range(lo, hi).toDF("id").write.parquet(s"$root/data/$name")
        graft.io.SkipStats.write(spark, s"$root/data/$name", Seq("id"))
        graft.io.Manifest.commit(spark, root, s"$root/data/$name")
    }
    graft.io.MergeOnRead.deleteWhere(spark, root, "id",
      col("id").between(120, 129), s"$root/data")
    intercept[IllegalArgumentException] {
      graft.io.SkipStats.scan(spark, root, "id", 110, 150)
    }
    val merged = graft.io.SkipStats.scan(spark, root, "id", 110, 150,
      morKey = Some("id"))
    assert(merged.select("id").collect().map(_.getLong(0)).sorted
      .sameElements((110L to 119L) ++ (130L to 150L)),
      "pruned scan must still merge live tombstones")
    // pruning still held: no b1 data file in the plan
    assert(merged.inputFiles
      .filter(!_.contains("/tombstones-")).forall(_.contains("/data/b2/")))
  }

  test("io22: upsert replaces a key's rows in EVERY directory holding " +
      "them") {
    import org.apache.hadoop.fs.Path
    val root = System.getProperty("java.io.tmpdir") + "/graft_merge_tbl"
    val f = new Path(root)
      .getFileSystem(spark.sparkContext.hadoopConfiguration)
    f.delete(new Path(root), true)
    // key 50 lives in BOTH directories; key 999 in neither
    spark.range(0, 100).toDF("id").write.parquet(s"$root/data/b1")
    spark.createDataFrame(Seq(Tuple1(50L), Tuple1(200L))).toDF("id")
      .write.parquet(s"$root/data/b2")
    graft.io.Manifest.commit(spark, root, s"$root/data/b1")
    graft.io.Manifest.commit(spark, root, s"$root/data/b2")
    val src = spark.createDataFrame(Seq(Tuple1(50L), Tuple1(999L)))
      .toDF("id")
    val res = graft.io.Merge.upsert(spark, root, "id", src, s"$root/data")
    assert(res.exists(_.carried.isEmpty), "both dirs hold key 50")
    val ids = graft.io.Manifest.snapshot(spark, root)
      .select("id").collect().map(_.getLong(0)).sorted
    // key 50 now appears ONCE (the source row), 999 inserted
    assert(ids.sameElements(((0L until 100L) :+ 200L :+ 999L).sorted),
      s"got ${ids.toSeq}")
  }

  test("io24: row-level maintenance carries skip-stats — a maintained " +
      "table stays skippable") {
    import org.apache.hadoop.fs.Path
    val root = System.getProperty("java.io.tmpdir") + "/graft_skipmnt_tbl"
    val f = new Path(root)
      .getFileSystem(spark.sparkContext.hadoopConfiguration)
    f.delete(new Path(root), true)
    Seq((0L, 100L, "b1"), (100L, 200L, "b2")).foreach {
      case (lo, hi, name) =>
        spark.range(lo, hi).toDF("id").write.parquet(s"$root/data/$name")
        graft.io.SkipStats.write(spark, s"$root/data/$name", Seq("id"))
        graft.io.Manifest.commit(spark, root, s"$root/data/$name")
    }
    // copy-on-write delete rewrites b2; its replacement keeps a sidecar
    graft.io.RowDelete.deleteWhere(spark, root,
      col("id").between(150, 159), s"$root/data/del")
    val afterDel = graft.io.SkipStats.scan(spark, root, "id", 120, 130)
    assert(afterDel.inputFiles.forall(_.contains("/del/cow")) &&
      afterDel.count() == 11,
      "the rewritten dir must still prune b1 out via its carried stats")
    // merge-on-read delete + fold: the fold rewrite keeps a sidecar too
    graft.io.MergeOnRead.deleteWhere(spark, root, "id",
      col("id") === 10, s"$root/data")
    graft.io.MergeOnRead.fold(spark, root, "id", s"$root/data")
    val afterFold = graft.io.SkipStats.scan(spark, root, "id", 0, 50)
    assert(afterFold.inputFiles.forall(_.contains("/data/fold")) &&
      afterFold.count() == 50,
      "post-fold scan must prune to the folded b1 rewrite alone")
    // upsert: the appended source dir inherits the stats discipline
    graft.io.Merge.upsert(spark, root, "id",
      spark.range(500, 510).toDF("id"), s"$root/data/up")
    val afterUp = graft.io.SkipStats.scan(spark, root, "id", 500, 600)
    assert(afterUp.inputFiles.forall(_.contains("merge-upsert")) &&
      afterUp.count() == 10,
      "a range over only the upsert batch must prune everything else")
  }

  test("io22: upsert over a tombstoned key revives it with the new " +
      "row; other tombstoned keys stay deleted") {
    import org.apache.hadoop.fs.Path
    val root = System.getProperty("java.io.tmpdir") + "/graft_mortup_tbl"
    val f = new Path(root)
      .getFileSystem(spark.sparkContext.hadoopConfiguration)
    f.delete(new Path(root), true)
    spark.range(0, 100).selectExpr("id", "id * 10 AS v")
      .write.parquet(s"$root/data/b1")
    graft.io.Manifest.commit(spark, root, s"$root/data/b1")
    // keys 40..49 merge-on-read deleted, NOT folded
    graft.io.MergeOnRead.deleteWhere(spark, root, "id",
      col("id").between(40, 49), s"$root/data")
    // upsert key 42 (currently tombstoned) and key 7 (live)
    val src = spark.createDataFrame(Seq((42L, -1L), (7L, -2L)))
      .toDF("id", "v")
    graft.io.Merge.upsert(spark, root, "id", src, s"$root/data/up")
    val got = graft.io.MergeOnRead.snapshot(spark, root, "id")
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(got(42L) == -1L, "the upsert is the tombstoned key's new truth")
    assert(got(7L) == -2L)
    assert(!(40L to 49L).filter(_ != 42L).exists(got.contains),
      "other tombstoned keys must stay deleted")
    assert(got.size == 91, s"90 survivors + revived 42, got ${got.size}")
    // the remaining tombstone entry still carries the tombstone name
    assert(graft.io.Manifest.entries(spark, root)
      .exists(graft.io.MergeOnRead.isTombstone))
  }

  test("io20: a predicate delete carries live tombstones verbatim — " +
      "never rewrites them into data") {
    import org.apache.hadoop.fs.Path
    val root = System.getProperty("java.io.tmpdir") + "/graft_cowts_tbl"
    val f = new Path(root)
      .getFileSystem(spark.sparkContext.hadoopConfiguration)
    f.delete(new Path(root), true)
    spark.range(0, 100).toDF("id").write.parquet(s"$root/data/b1")
    graft.io.Manifest.commit(spark, root, s"$root/data/b1")
    graft.io.MergeOnRead.deleteWhere(spark, root, "id",
      col("id").between(50, 59), s"$root/data")
    // the predicate overlaps tombstoned keys 50..54
    graft.io.RowDelete.deleteWhere(spark, root,
      col("id").between(20, 54), s"$root/data/del")
    val entries = graft.io.Manifest.entries(spark, root)
    assert(entries.count(graft.io.MergeOnRead.isTombstone) == 1,
      "the tombstone entry must survive under its tombstone name")
    val ids = graft.io.MergeOnRead.snapshot(spark, root, "id")
      .collect().map(_.getLong(0)).sorted
    assert(ids.sameElements((0L until 20L) ++ (60L until 100L)),
      s"55..59 must stay deleted (masked), 20..54 predicate-deleted")
  }

  test("manifest: commitIfAbsent is idempotent per directory") {
    import org.apache.hadoop.fs.Path
    val root = System.getProperty("java.io.tmpdir") + "/graft_cia_tbl"
    val f = new Path(root)
      .getFileSystem(spark.sparkContext.hadoopConfiguration)
    f.delete(new Path(root), true)
    spark.range(0, 10).toDF("id").write.parquet(s"$root/data/b1")
    val v1 = graft.io.Manifest.commitIfAbsent(spark, root, s"$root/data/b1")
    // the replayed/racing duplicate commit burns no version and adds
    // no duplicate entry
    val v2 = graft.io.Manifest.commitIfAbsent(spark, root, s"$root/data/b1")
    assert(v1 == 1 && v2 == 1)
    assert(graft.io.Manifest.entries(spark, root) == Seq(s"$root/data/b1"))
  }

  test("io21: past the key cap the merge-on-read anti-join runs " +
      "shuffled, with an identical snapshot") {
    import org.apache.hadoop.fs.Path
    val root = System.getProperty("java.io.tmpdir") + "/graft_mor_cap"
    val f = new Path(root)
      .getFileSystem(spark.sparkContext.hadoopConfiguration)
    f.delete(new Path(root), true)
    spark.range(0, 200).toDF("id").write.parquet(s"$root/data/b1")
    graft.io.Manifest.commit(spark, root, s"$root/data/b1")
    graft.io.MergeOnRead.deleteWhere(spark, root, "id",
      col("id").between(50, 99), s"$root/data")
    // kill auto-broadcast so the physical strategy reflects ONLY the
    // cap's hint, not Spark's size estimate of the tiny test table
    val prevAuto = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try {
      def plan(df: org.apache.spark.sql.DataFrame) =
        df.queryExecution.sparkPlan.toString
      val under = graft.io.MergeOnRead.snapshot(spark, root, "id")
      assert(plan(under).contains("BroadcastHashJoin"),
        "under the cap the tombstone keys broadcast")
      spark.conf.set("spark.graft.mor.maxBroadcastKeys", "0")
      val over = graft.io.MergeOnRead.snapshot(spark, root, "id")
      assert(!plan(over).contains("BroadcastHashJoin"),
        "past the cap the anti-join must run shuffled, not broadcast")
      assert(over.select("id").collect().map(_.getLong(0)).sorted
        .sameElements(under.select("id").collect().map(_.getLong(0))
          .sorted),
        "the cap picks a physical strategy, never a different snapshot")
      // fold under the forced-shuffle regime still ends the deferral
      assert(graft.io.MergeOnRead
        .fold(spark, root, "id", s"$root/data").nonEmpty)
      assert(graft.io.Manifest.snapshot(spark, root)
        .count() == 150)
    } finally {
      spark.conf.unset("spark.graft.mor.maxBroadcastKeys")
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prevAuto)
    }
  }

  test("io25: sync on a source with no commits is a graceful no-op") {
    import org.apache.hadoop.fs.Path
    val src = System.getProperty("java.io.tmpdir") + "/graft_nosync_src"
    val out = System.getProperty("java.io.tmpdir") + "/graft_nosync_out"
    val f = new Path(src)
      .getFileSystem(spark.sparkContext.hadoopConfiguration)
    f.delete(new Path(src), true); f.delete(new Path(out), true)
    assert(graft.io.ChangeFeed
      .sync(spark, src, "id", out, s"$out/data").isEmpty)
  }

  test("io26: orphan sweep never touches a directory referenced only " +
      "by a historical version — time travel survives the sweep") {
    import org.apache.hadoop.fs.Path
    val root = System.getProperty("java.io.tmpdir") + "/graft_sweep_tbl"
    val f = new Path(root)
      .getFileSystem(spark.sparkContext.hadoopConfiguration)
    f.delete(new Path(root), true)
    spark.range(0, 100).toDF("id").write.parquet(s"$root/data/b1")
    spark.range(100, 200).toDF("id").write.parquet(s"$root/data/b2")
    graft.io.Manifest.commit(spark, root, s"$root/data/b1")
    graft.io.Manifest.commit(spark, root, s"$root/data/b2")
    // a REPLACING commit drops b1 from the LATEST version only
    graft.io.Manifest.rewrite(spark, root, Seq(s"$root/data/b2"))
    spark.range(900, 950).toDF("id").write.parquet(s"$root/data/orphan")
    // graceMs = 0: the test IS the crashed writer, sweep immediately
    val swept = graft.io.Manifest.sweepOrphans(spark, root, s"$root/data",
      graceMs = 0L)
    assert(swept.map(new Path(_).getName) == Seq("orphan"),
      s"only the never-committed dir goes: $swept")
    // b1 is referenced by versions 1 and 2 — time travel still reads it
    assert(graft.io.Manifest.snapshot(spark, root, Some(2)).count() == 200)
    assert(graft.io.Manifest.snapshot(spark, root).count() == 100)
  }

  test("catalog retention: expiring old catalog versions is safe, " +
      "expiring a still-pinned table version refuses loudly") {
    import org.apache.hadoop.fs.Path
    import graft.io.{Catalog, Manifest}
    val base = System.getProperty("java.io.tmpdir") + "/graft_cat_ret"
    val f = new Path(base)
      .getFileSystem(spark.sparkContext.hadoopConfiguration)
    f.delete(new Path(base), true)
    val (tbl, cat) = (s"$base/tbl", s"$base/cat")
    spark.range(0, 10).toDF("k").write.parquet(s"$base/d1")
    Manifest.commit(spark, tbl, s"$base/d1")
    Catalog.pin(spark, cat, Seq(tbl -> 1)) // catalog v1 pins tbl@1
    spark.range(10, 30).toDF("k").write.parquet(s"$base/d2")
    Manifest.commit(spark, tbl, s"$base/d2")
    Catalog.pin(spark, cat, Seq(tbl -> 2)) // catalog v2 pins tbl@2
    // the table cannot shed tbl@1 while catalog v1 still pins it —
    // a dangling pin must be a refusal, not a later read failure
    val e = intercept[IllegalArgumentException] {
      Catalog.expireTable(spark, cat, tbl, keepLast = 1)
    }
    assert(e.getMessage.contains("still pinned"))
    assert(Manifest.versions(spark, tbl) == Seq(1, 2), "nothing expired")
    // the catalog root is an ordinary manifest table: expiring ITS
    // old versions is always safe (drops old pin vectors only)
    assert(Manifest.expire(spark, cat, keepLast = 1) == Seq(1))
    assert(Catalog.resolve(spark, cat) == Map(tbl -> 2))
    // the pinned table data was NOT touched by the catalog expire
    // (catalog entries are root@version strings, not data dirs)
    assert(Manifest.snapshot(spark, tbl, Some(1)).count() == 10)
    // with the old vector gone, the table expire now proceeds and the
    // catalog read path still answers from the surviving pin (tbl@2
    // is an APPEND — its dir list carries d1, so the data survives
    // and only the v1 manifest is reclaimed)
    assert(Catalog.expireTable(spark, cat, tbl, keepLast = 1) == Seq(1))
    assert(Catalog.snapshotOf(spark, cat, tbl).count() == 30)
  }

  test("quarantine retention: the quarantine table is an ordinary " +
      "manifest table — expire keeps the latest triage set readable") {
    import org.apache.hadoop.fs.Path
    import graft.io.{Constraints, Manifest}
    val base = System.getProperty("java.io.tmpdir") + "/graft_q_ret"
    val fsys = new Path(base)
      .getFileSystem(spark.sparkContext.hadoopConfiguration)
    fsys.delete(new Path(base), true)
    import spark.implicits._
    def ingest(rows: Seq[(java.lang.Long, Long)], tag: String) =
      Constraints.commitQuarantined(spark, s"$base/t", s"$base/q",
        rows.toDF("id", "x"), s"$base/b$tag", s"$base/q$tag",
        Seq("id_not_null" -> col("id").isNotNull))
    ingest(Seq((1L, 1L), (null, 2L)), "1")
    ingest(Seq((2L, 3L), (null, 4L)), "2")
    assert(Manifest.versions(spark, s"$base/q") == Seq(1, 2))
    assert(Manifest.expire(spark, s"$base/q", keepLast = 1) == Seq(1))
    // latest still reads both quarantine batches? No — expire drops
    // the v1 manifest but v2 is an APPEND whose dir-list includes q1,
    // so the latest triage set keeps every surviving violation
    assert(Manifest.snapshot(spark, s"$base/q").count() == 2)
    assert(Manifest.snapshot(spark, s"$base/t").count() == 2)
  }

  test("bucketed point lookup prunes to a single bucket") {
    OpsQueries.io10BucketedJoin(spark, sf).collect()
    // a literal equality on the bucketing key must prune the scan to 1
    // of the 8 buckets — the point-lookup payoff of the bucketed layout.
    // autoBucketedScan would turn the bucketed scan off for a bare
    // filter (no operator needs the distribution), which also forfeits
    // the prune — disable it the way a point-lookup reader would.
    val prev = spark.conf
      .get("spark.sql.sources.bucketing.autoBucketedScan.enabled")
    spark.conf
      .set("spark.sql.sources.bucketing.autoBucketedScan.enabled", "false")
    try {
      val df = spark.table("graft_io10_orders")
        .filter(col("o_custkey") === 42)
      val scan = unwrap(df.queryExecution.executedPlan).collect {
        case s: FileSourceScanExec => s
      }.head
      assert(scan.toString.contains("SelectedBucketsCount: 1 out of 8"),
        s"expected single-bucket prune, scan was: ${scan.toString.take(400)}")
    } finally spark.conf
      .set("spark.sql.sources.bucketing.autoBucketedScan.enabled", prev)
  }

  test("expire on a cloned-from table refuses while a registered clone " +
      "references the dirs; dropClone unblocks it") {
    import org.apache.hadoop.fs.Path
    import graft.io.Manifest
    val base = System.getProperty("java.io.tmpdir") + "/graft_clone_ret"
    val f = new Path(base)
      .getFileSystem(spark.sparkContext.hadoopConfiguration)
    f.delete(new Path(base), true)
    val (src, cln) = (s"$base/src", s"$base/clone")
    spark.range(5).toDF("id").write.parquet(s"$base/data/b1")
    spark.range(5, 9).toDF("id").write.parquet(s"$base/data/b2")
    Manifest.commit(spark, src, s"$base/data/b1")
    // clone pins src@v1 = {b1}; the source then rewrites away from b1,
    // so expire(keepLast=1) would reclaim exactly what the clone reads
    Manifest.shallowClone(spark, src, cln)
    assert(Manifest.registeredClones(spark, src) == Seq(cln))
    Manifest.rewrite(spark, src, Seq(s"$base/data/b2"))
    val ex = intercept[IllegalArgumentException] {
      Manifest.expire(spark, src, keepLast = 1)
    }
    assert(ex.getMessage.contains(cln) &&
      ex.getMessage.contains(s"$base/data/b1"),
      s"refusal must name the clone and the dirs: ${ex.getMessage}")
    // nothing was reclaimed by the refused attempt
    assert(Manifest.versions(spark, src) == Seq(1, 2))
    assert(Manifest.snapshot(spark, cln).count() == 5)
    // force overrides explicitly (deep-copied-or-accepted-loss path)
    // — not exercised destructively here; dropClone is the normal path
    assert(Manifest.dropClone(spark, src, cln))
    assert(Manifest.registeredClones(spark, src).isEmpty)
    assert(Manifest.expire(spark, src, keepLast = 1) == Seq(1))
    assert(!f.exists(new Path(s"$base/data/b1")))
    // expire with NO clash never consults clones: re-clone the current
    // version and expire again — single live version, nothing dead
    Manifest.shallowClone(spark, src, s"$base/clone2")
    assert(Manifest.expire(spark, src, keepLast = 1) == Seq.empty)
  }

  test("a chained shallow clone stays retention-protected on the " +
      "ORIGINAL source after the intermediate clone is dropped") {
    import org.apache.hadoop.fs.Path
    import graft.io.Manifest
    val base = System.getProperty("java.io.tmpdir") + "/graft_clone_chain"
    val f = new Path(base)
      .getFileSystem(spark.sparkContext.hadoopConfiguration)
    f.delete(new Path(base), true)
    val (src, c1, c2) = (s"$base/src", s"$base/c1", s"$base/c2")
    spark.range(5).toDF("id").write.parquet(s"$base/data/b1")
    spark.range(5, 9).toDF("id").write.parquet(s"$base/data/b2")
    Manifest.commit(spark, src, s"$base/data/b1")
    Manifest.shallowClone(spark, src, c1)
    // clone-of-a-clone: c2's dirs belong to SRC's data root, so it
    // must be registered on src as well as on c1
    Manifest.shallowClone(spark, c1, c2)
    assert(Manifest.registeredClones(spark, src).sorted == Seq(c1, c2))
    assert(Manifest.registeredClones(spark, c1) == Seq(c2))
    assert(Manifest.cloneSources(spark, c2).sorted == Seq(c1, src))
    // the documented lifecycle: c1 is dropped and deregistered — the
    // pre-fix registry now forgot c2 entirely and expire reclaimed b1
    // out from under it
    assert(Manifest.dropClone(spark, src, c1))
    Manifest.rewrite(spark, src, Seq(s"$base/data/b2"))
    val ex = intercept[IllegalArgumentException] {
      Manifest.expire(spark, src, keepLast = 1)
    }
    assert(ex.getMessage.contains(c2) &&
      ex.getMessage.contains(s"$base/data/b1"),
      s"refusal must name the surviving chained clone: ${ex.getMessage}")
    assert(Manifest.snapshot(spark, c2).count() == 5)
    // dropCloneEverywhere releases the whole chain in one call
    assert(Manifest.dropCloneEverywhere(spark, c2).contains(src))
    assert(Manifest.registeredClones(spark, src).isEmpty)
    assert(Manifest.expire(spark, src, keepLast = 1) == Seq(1))
    assert(!f.exists(new Path(s"$base/data/b1")))
  }

  test("sweepOrphans spares directories only a registered clone " +
      "references; dropClone releases them") {
    import org.apache.hadoop.fs.Path
    import graft.io.Manifest
    val base = System.getProperty("java.io.tmpdir") + "/graft_clone_swp"
    val f = new Path(base)
      .getFileSystem(spark.sparkContext.hadoopConfiguration)
    f.delete(new Path(base), true)
    val (src, cln) = (s"$base/src", s"$base/clone")
    spark.range(3).toDF("id").write.parquet(s"$base/data/b1")
    spark.range(3).toDF("id").write.parquet(s"$base/data/lost")
    Manifest.commit(spark, src, s"$base/data/b1")
    // the post-expire-force shape: a dir no SOURCE version references
    // but a registered clone still lists
    Manifest.registerClone(spark, src, cln)
    Manifest.rewrite(spark, cln, Seq(s"$base/data/lost"))
    assert(Manifest.sweepOrphans(spark, src, s"$base/data",
      graceMs = 0L).isEmpty)
    assert(f.exists(new Path(s"$base/data/lost")))
    assert(Manifest.dropClone(spark, src, cln))
    assert(Manifest.sweepOrphans(spark, src, s"$base/data", graceMs = 0L)
      == Seq(new Path(s"$base/data/lost").toUri.getPath))
  }

  test("z-order prefix decomposition never misses a boxed point") {
    val rnd = new scala.util.Random(7)
    for (_ <- 1 to 200) {
      val (x1, x2) = (rnd.nextInt(256), rnd.nextInt(256))
      val (y1, y2) = (rnd.nextInt(256), rnd.nextInt(256))
      val (loX, hiX) = (math.min(x1, x2), math.max(x1, x2))
      val (loY, hiY) = (math.min(y1, y2), math.max(y1, y2))
      val prefixes = graft.io.ZOrder.prefixesFor(loX, hiX, loY, hiY, 4).toSet
      for (_ <- 1 to 20) {
        val px = loX + rnd.nextInt(hiX - loX + 1)
        val py = loY + rnd.nextInt(hiY - loY + 1)
        // prefix of the point's Morton code, same bit layout as zvalue8
        def spread(v: Int) = (0 until 8).map(i => ((v >> i) & 1) << (2 * i)).sum
        val z = spread(px) | (spread(py) << 1)
        assert(prefixes.contains(z >> 12),
          s"point ($px,$py) in box [$loX,$hiX]x[$loY,$hiY] lost")
      }
    }
  }
}
