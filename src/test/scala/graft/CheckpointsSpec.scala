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
