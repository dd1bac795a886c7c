package graft

import java.io.File
import java.nio.file.Files

import org.scalatest.funsuite.AnyFunSuite

/** `spark.graft.checkpointDir` switches the iterative loops (label
  * propagation, Lloyd, BPE) from executor-local lineage truncation to
  * RELIABLE checkpoints that survive executor loss — the difference
  * between an hours-long 100 TB propagation restarting a round and
  * restarting from zero. Asserted: identical results either way, and the
  * checkpoint data actually lands under the configured directory.
  */
class CheckpointsSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  val sf = "/root/testdata/sf0.001"

  private def countFiles(d: File): Int =
    Option(d.listFiles).map(_.map(f =>
      if (f.isDirectory) countFiles(f) else 1).sum).getOrElse(0)

  test("componentLabels under a reliable checkpoint dir: same labels, " +
      "files in the configured location") {
    val base = SparkEntry.queries("d6_cluster")(spark, sf).collect()
    val dir = Files.createTempDirectory("graft-ckpt").toString
    spark.conf.set("spark.graft.checkpointDir", dir)
    try {
      val ckpt = SparkEntry.queries("d6_cluster")(spark, sf).collect()
      assert(ckpt.toSeq == base.toSeq,
        "reliable checkpointing must not change the labeling")
      assert(countFiles(new File(dir)) > 0,
        "checkpoint() must write durable round snapshots under " +
          "spark.graft.checkpointDir")
    } finally {
      spark.conf.unset("spark.graft.checkpointDir")
    }
  }

  test("checkpointReclaim deletes superseded round snapshots, keeps the " +
      "latest, and leaves results unchanged") {
    import org.apache.spark.sql.functions._
    import graft.Checkpoints.StageOps
    val dir = Files.createTempDirectory("graft-ckpt-reclaim").toString
    spark.conf.set("spark.graft.checkpointDir", dir)
    spark.conf.set("spark.graft.checkpointReclaim", "true")
    try {
      val r1 = spark.range(0, 1000).toDF("id")
        .withColumn("x", col("id") * 2).staged()
      val afterR1 = countFiles(new File(dir))
      assert(afterR1 > 0, "round 1 must write a durable snapshot")
      val r2 = r1.withColumn("x", col("x") + 1).staged()
      // round 1's snapshot is superseded the moment round 2 materializes
      val r3 = r2.withColumn("x", col("x") * 3).staged()
      assert(r3.agg(sum(col("x"))).head.getLong(0) ==
        (0L until 1000L).map(i => (i * 2 + 1) * 3).sum,
        "reclaim must not change loop results")
      // only the LATEST round's files remain: three rounds at
      // default retention would stack three rdd-* dirs; reclaim keeps one
      val rddDirs = Option(new File(dir).listFiles).get
        .flatMap(app => Option(app.listFiles).getOrElse(Array.empty))
        .filter(_.getName.startsWith("rdd-"))
      assert(rddDirs.length == 1,
        s"superseded round snapshots must be deleted, found " +
          rddDirs.map(_.getName).mkString(","))
    } finally {
      spark.conf.unset("spark.graft.checkpointDir")
      spark.conf.unset("spark.graft.checkpointReclaim")
    }
  }

  test("default retention (reclaim off) stacks every round snapshot") {
    import org.apache.spark.sql.functions._
    import graft.Checkpoints.StageOps
    val dir = Files.createTempDirectory("graft-ckpt-keep").toString
    spark.conf.set("spark.graft.checkpointDir", dir)
    try {
      val r1 = spark.range(0, 100).toDF("id").staged()
      val r2 = r1.withColumn("x", col("id") + 1).staged()
      r2.count()
      val rddDirs = Option(new File(dir).listFiles).get
        .flatMap(app => Option(app.listFiles).getOrElse(Array.empty))
        .filter(_.getName.startsWith("rdd-"))
      assert(rddDirs.length == 2,
        "without opt-in every round snapshot must be retained " +
          s"(Spark's cleanCheckpoints contract), found ${rddDirs.length}")
    } finally spark.conf.unset("spark.graft.checkpointDir")
  }

  test("every staged loop family is checkpoint-dir invariant " +
      "(Lloyd, BPE, range-rewrite materialization)") {
    for (q <- Seq("s7_pq_train", "t15_bpe_train", "q28_range_rewrite")) {
      val base = SparkEntry.queries(q)(spark, sf).collect()
      val dir = Files.createTempDirectory("graft-ckpt2").toString
      spark.conf.set("spark.graft.checkpointDir", dir)
      try {
        val ckpt = SparkEntry.queries(q)(spark, sf).collect()
        assert(ckpt.toSeq == base.toSeq,
          s"$q: reliable checkpointing must not change results")
        // re-pointing the conf must re-bind the context's checkpoint
        // location — a once-only bind would leave this dir empty and
        // silently keep writing to the previous test's directory
        assert(countFiles(new File(dir)) > 0,
          s"$q: checkpoints must land under the CURRENT conf dir")
      } finally spark.conf.unset("spark.graft.checkpointDir")
    }
  }
}
