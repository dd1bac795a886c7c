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
  // The conf dir last bound, keyed by the context's application id.
  // setCheckpointDir appends a fresh UUID subdir per call, so it must
  // run once per DISTINCT conf value: every round of a loop shares one
  // directory, re-pointing the conf mid-session (e.g. off a filling
  // local disk) takes effect on the next stage(), and a RESTARTED
  // context (new applicationId, empty checkpoint dir) re-binds instead
  // of inheriting a stale guard. The checkpoint dir is a CONTEXT-level
  // Spark setting — two concurrent sessions on one context configuring
  // different dirs contradict each other by construction and are
  // unsupported (last bind wins).
  @volatile private var boundDir: Option[(String, String)] = None

  def stage(df: DataFrame): DataFrame = {
    val s = df.sparkSession
    s.conf.getOption("spark.graft.checkpointDir")
      .filter(_.nonEmpty) match {
      case Some(dir) =>
        val appId = s.sparkContext.applicationId
        synchronized {
          if (!boundDir.contains((appId, dir)) ||
              s.sparkContext.getCheckpointDir.isEmpty) {
            s.sparkContext.setCheckpointDir(dir)
            boundDir = Some((appId, dir))
          }
        }
        // checkpoint() is eager and, unpersisted, computes the lineage
        // TWICE (once for the materializing action, once in the
        // checkpoint write job) — persist around it so the hours-long
        // loop rounds this feature exists for pay one computation.
        // Checkpoint files accrue per round; reclaiming superseded round
        // snapshots is the operator's retention call (same contract as
        // Spark's own cleanCheckpoints default).
        val persisted = df.persist(
          org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
        try persisted.checkpoint()
        finally persisted.unpersist()
      case None => df.localCheckpoint()
    }
  }

  /** Postfix form: `df.staged()` ≡ `Checkpoints.stage(df)`. */
  implicit class StageOps(private val df: DataFrame) extends AnyVal {
    def staged(): DataFrame = stage(df)
  }
}
