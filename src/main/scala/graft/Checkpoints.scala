package graft

import org.apache.spark.sql.DataFrame

/** Lineage-truncation for iterative algorithms (label propagation, Lloyd
  * rounds, BPE merges): without a checkpoint each round replays all prior
  * rounds; with only `localCheckpoint` the truncated lineage lives in
  * executor block storage, so on a real cluster losing one executor
  * mid-iteration kills the job — there is no recompute path. For an
  * hours-long 100 TB propagation that is a practical reliability bug.
  *
  * `stage` therefore honors `spark.graft.checkpointDir`: when set, rounds
  * checkpoint RELIABLY to that (HDFS/object-store) directory and survive
  * executor loss; when unset (local mode, short jobs, the test gates) it
  * falls back to `localCheckpoint`, which is faster and needs no storage.
  */
object Checkpoints {
  def stage(df: DataFrame): DataFrame = {
    val s = df.sparkSession
    s.conf.getOption("spark.graft.checkpointDir")
      .filter(_.nonEmpty) match {
      case Some(dir) =>
        // setCheckpointDir creates a fresh UUID subdir per call; set it
        // only when unset so every round of a loop shares one directory
        if (s.sparkContext.getCheckpointDir.isEmpty)
          s.sparkContext.setCheckpointDir(dir)
        df.checkpoint()
      case None => df.localCheckpoint()
    }
  }

  /** Postfix form: `df.staged()` ≡ `Checkpoints.stage(df)`. */
  implicit class StageOps(private val df: DataFrame) extends AnyVal {
    def staged(): DataFrame = stage(df)
  }
}
