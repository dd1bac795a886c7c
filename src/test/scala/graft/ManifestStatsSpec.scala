package graft

import org.apache.spark.sql.functions.col
import org.scalatest.funsuite.AnyFunSuite

import graft.io.{Manifest, SkipStats}

/** Stats-in-manifest planning metadata ([[graft.io.Manifest]] `#ann:`
  * annotations + [[graft.io.DirStatsProvider]]): commits embed each
  * directory's sidecar body / bloom keys / schema into the manifest, so
  * a plan's per-directory facts cost ZERO sidecar opens on an annotated
  * manifest and AT MOST ONE open per directory on the fallback path
  * (pre-format manifests, post-commit retrofits) — never the 3–6
  * re-parses per directory the planner paid before round 14.
  */
class ManifestStatsSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark

  private lazy val wh: String = {
    val wh = java.nio.file.Files
      .createTempDirectory("graft-mstats").toString
    spark.conf.set("spark.sql.catalog.mst",
      "graft.io.dsv2.GraftCatalog")
    spark.conf.set("spark.sql.catalog.mst.root", wh)
    wh
  }

  private def mkTable(name: String, withStats: Boolean): String = {
    import spark.implicits._
    val root = s"$wh/$name"
    for ((lo, hi, tag) <- Seq((0L, 100L, "b1"), (100L, 200L, "b2"))) {
      (lo until hi).map(i => (i, i)).toDF("id", "v")
        .write.parquet(s"$root/data/$tag")
      if (withStats)
        SkipStats.write(spark, s"$root/data/$tag", Seq("id"))
      Manifest.commit(spark, root, s"$root/data/$tag")
    }
    root
  }

  private def countingPlan(df: => org.apache.spark.sql.DataFrame)
      : (org.apache.spark.sql.DataFrame, Int, Int) = {
    var sidecar = 0
    var schema = 0
    SkipStats.onSidecarOpen = _ => sidecar += 1
    graft.io.dsv2.GraftTable.onSchemaProbe = _ => schema += 1
    try {
      val q = df
      q.collect()
      (q, sidecar, schema)
    } finally {
      SkipStats.onSidecarOpen = _ => ()
      graft.io.dsv2.GraftTable.onSchemaProbe = _ => ()
    }
  }

  test("an annotated manifest plans pruning with ZERO sidecar opens " +
      "and ZERO footer probes; the answer matches the probe") {
    wh
    mkTable("annotated", withStats = true)
    val (q, sidecar, schema) = countingPlan(
      spark.sql("SELECT id FROM mst.annotated WHERE id < 50"))
    assert(q.queryExecution.executedPlan.toString
      .contains("skippedDirs=1"),
      s"b2 must prune:\n${q.queryExecution.executedPlan}")
    assert(sidecar === 0, s"annotated plan opened $sidecar sidecars")
    assert(schema === 0, s"annotated resolve probed $schema footers")
  }

  test("MANY-directory ceiling (the PlanProbe regression tripwire): a " +
      "512-leaf annotated table plans range/LIMIT/TopN within O(1) " +
      "manifest reads, zero sidecar opens, zero footer probes") {
    import org.apache.spark.sql.functions.{col => c, format_string}
    wh
    val root = s"$wh/many512"
    val n = 512
    // the production fixture shape: ONE partitioned write job, stats
    // rendered from known bounds, sidecars installed without Spark
    // jobs, ONE seeded commit (zero per-leaf probes)
    val stage = s"$root/data/ingest"
    spark.range(0, n * 8L).toDF("k")
      .withColumn("pb", format_string("%04d", (c("k") / 8).cast("int")))
      .write.partitionBy("pb").parquet(stage)
    val dirBodies = (0 until n).map { b =>
      val d = f"$stage/pb=$b%04d"
      val body = SkipStats.render(8L,
        Seq("k" -> SkipStats.ColStats("long",
          Some(((b * 8L).toString, (b * 8L + 7).toString)))),
        Map("k" -> 8L))
      SkipStats.installRendered(spark, d, body)
      (d, body)
    }
    val schemaJson = Manifest.inferDirSchema(spark, dirBodies.head._1)
      .map(_.json)
    val seed = dirBodies.flatMap { case (d, body) =>
      Seq(Manifest.seedStats(d, body),
        Manifest.seedBloom(d, Seq.empty)) ++
        schemaJson.map(j => Manifest.seedSchema(d, j)).toSeq
    }.toMap
    Manifest.rewrite(spark, root, dirBodies.map(_._1), seedAnn = seed)
    var manifestReads = 0
    Manifest.onManifestRead = _ => manifestReads += 1
    try {
      def probe(df: => org.apache.spark.sql.DataFrame, pin: String)
          : Unit = {
        manifestReads = 0
        val (q, sidecar, schema) = countingPlan(df)
        assert(q.queryExecution.executedPlan.toString.contains(pin),
          s"want '$pin':\n${q.queryExecution.executedPlan}")
        assert(sidecar === 0, s"$sidecar sidecar opens at 512 dirs")
        assert(schema === 0, s"$schema footer probes at 512 dirs")
        assert(manifestReads <= 8,
          s"$manifestReads manifest reads — planning must be O(1) " +
            "metadata reads, not O(directories)")
      }
      // BETWEEN: strict bounds loosen to inclusive in the range
      // translation, which would keep the adjacent bucket
      probe(spark.sql(
        "SELECT k FROM mst.many512 WHERE k BETWEEN 2048 AND 2055"),
        s"skippedDirs=${n - 1}")
      probe(spark.sql(
        "SELECT * FROM (SELECT k FROM mst.many512 LIMIT 8) t"),
        s"limitDirs=${n - 1}")
      probe(spark.sql(
        "SELECT k FROM mst.many512 ORDER BY k LIMIT 8"),
        s"topNDirs=${n - 1}")
    } finally Manifest.onManifestRead = _ => ()
  }

  test("a PRE-FORMAT manifest (no annotations) falls back to at most " +
      "ONE sidecar open per directory, and still prunes") {
    wh
    val root = mkTable("preformat", withStats = true)
    // strip the annotations: rewrite each manifest as the entry list
    // alone (the pre-round-14 format), preserving the terminator
    val f = new org.apache.hadoop.fs.Path(root)
      .getFileSystem(spark.sparkContext.hadoopConfiguration)
    Manifest.versions(spark, root).foreach { v =>
      val p = new org.apache.hadoop.fs.Path(root, f"manifest-v$v%06d")
      val in = f.open(p)
      val body = try new String(
        org.apache.commons.io.IOUtils.toByteArray(in), "UTF-8")
      finally in.close()
      val stripped = body.split("\n").filter(_.nonEmpty)
        .filterNot(_.startsWith("#ann:")).mkString("\n")
      val out = f.create(p, true)
      try out.write(stripped.getBytes("UTF-8"))
      finally out.close()
    }
    val (q, sidecar, schema) = countingPlan(
      spark.sql("SELECT id FROM mst.preformat WHERE id < 50"))
    assert(q.queryExecution.executedPlan.toString
      .contains("skippedDirs=1"))
    // resolve probes footers per dir (no schema annotation), and the
    // provider opens each directory's sidecar at most once per plan
    assert(sidecar <= 2, s"fallback opened $sidecar sidecars for 2 dirs")
    assert(schema === 2, s"pre-format resolve must probe both footers")
  }

  test("annotations CARRY across commits — only the new directory is " +
      "probed — and a clone's first commit is seeded from its source") {
    import spark.implicits._
    wh
    val root = mkTable("carry", withStats = true)
    // a third commit: the manifest body must keep b1/b2 annotations
    (200L until 300L).map(i => (i, i)).toDF("id", "v")
      .write.parquet(s"$root/data/b3")
    SkipStats.write(spark, s"$root/data/b3", Seq("id"))
    Manifest.commit(spark, root, s"$root/data/b3")
    val ann = Manifest.annotationsOf(spark, root)
    assert(ann.stats.keySet.map(_.split("/").last) ===
      Set("b1", "b2", "b3"))
    assert(ann.stats.values.forall(_.nonEmpty),
      "every directory's sidecar body must be embedded")
    assert(ann.schemas.values.forall(_.nonEmpty))
    // shallow clone: one manifest write, annotations seeded — a plan
    // on the clone opens no sidecars
    Manifest.shallowClone(spark, root, s"$wh/carryclone")
    val (q, sidecar, schema) = countingPlan(
      spark.sql("SELECT id FROM mst.carryclone WHERE id < 50"))
    assert(q.queryExecution.executedPlan.toString
      .contains("skippedDirs=2"))
    assert(sidecar === 0, s"seeded clone plan opened $sidecar sidecars")
    assert(schema === 0)
  }

  test("a post-commit retrofit is honored by the plan-time fallback, " +
      "and CALL sidecar's stats commit restores zero-IO planning") {
    wh
    val root = mkTable("retroann", withStats = false)
    // no sidecars at commit: annotations embed as known-empty, nothing
    // prunes, nothing is opened needlessly... until a retrofit lands
    val (q0, _, _) = countingPlan(
      spark.sql("SELECT id FROM mst.retroann WHERE id < 50"))
    assert(q0.queryExecution.executedPlan.toString
      .contains("skippedDirs=0"))
    // Scala-API retrofit (sidecar written AFTER the commit): the empty
    // annotation re-probes at plan time, so pruning works immediately
    SkipStats.write(spark, s"$root/data/b1", Seq("id"))
    SkipStats.write(spark, s"$root/data/b2", Seq("id"))
    val (q1, sidecar1, _) = countingPlan(
      spark.sql("SELECT id FROM mst.retroann WHERE id < 50"))
    assert(q1.queryExecution.executedPlan.toString
      .contains("skippedDirs=1"),
      "the retrofitted sidecars must prune through the fallback probe")
    assert(sidecar1 >= 1 && sidecar1 <= 2,
      s"fallback must open each retrofitted sidecar once, got $sidecar1")
    // the stats commit re-embeds — planning returns to zero IO
    Manifest.refreshAnnotations(spark, root)
    val (q2, sidecar2, _) = countingPlan(
      spark.sql("SELECT id FROM mst.retroann WHERE id < 50"))
    assert(q2.queryExecution.executedPlan.toString
      .contains("skippedDirs=1"))
    assert(sidecar2 === 0,
      s"after the stats commit the plan opened $sidecar2 sidecars")
  }

  test("RENAME TABLE carries annotations under the new name — the " +
      "renamed table still plans with zero sidecar opens") {
    wh
    mkTable("renann", withStats = true)
    spark.sql("ALTER TABLE mst.renann RENAME TO renann2")
    val (q, sidecar, schema) = countingPlan(
      spark.sql("SELECT id FROM mst.renann2 WHERE id < 50"))
    assert(q.queryExecution.executedPlan.toString
      .contains("skippedDirs=1"))
    assert(sidecar === 0,
      s"renamed table's plan opened $sidecar sidecars")
    assert(schema === 0)
  }
}
