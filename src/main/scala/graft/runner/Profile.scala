package graft.runner

import org.apache.spark.sql.{Dataset, SparkSession}

import graft.model.KlioMessage
import graft.operators.HandleKlio

/** `klioexec profile` stand-in (reference `exec/src/klio_exec/commands/
  * profile.py:60-89` + `cli.py:153-374`): run a user transform over a
  * synthetic or file-backed message set, repeated N times, and report
  * wall-clock per iteration and element throughput.
  *
  * The reference substitutes event IO with `beam.Create(ids)` or
  * `ReadFromText` (StubIOMapper) and relies on Python profilers hooked via
  * `ACTIVE_PROFILER`; on the JVM the measurement story is Spark's own task
  * metrics / async-profiler, so this utility covers the workflow parity —
  * same inputs, same repeat semantics, no outputs — and returns timings
  * instead of plot files.
  */
object Profile {

  case class Report(iterations: Int, elements: Long, okPerIter: Seq[Long],
      secPerIter: Seq[Double]) {
    def totalSec: Double = secPerIter.sum
    def throughputPerSec: Double =
      if (totalSec == 0.0) 0.0 else iterations * elements / totalSec
  }

  /** `beam.Create(ids)` parity: fresh v2 messages from entity ids. */
  def messagesFrom(spark: SparkSession, ids: Seq[String])
      : Dataset[KlioMessage] = {
    implicit val enc = KlioMessage.encoder
    spark.createDataset(ids.map(KlioMessage.fromElement))
  }

  /** Time `transform` over `messages`, `iterations` times. Each iteration
    * is an independent action (no caching of the transformed result — the
    * point is to measure the transform, re-executed, like the reference's
    * FlatMap×iterations).
    */
  def timeit(messages: Dataset[KlioMessage],
      transform: KlioMessage => KlioMessage,
      iterations: Int = 3, retries: Int = 0, timeoutMs: Long = 0): Report = {
    val elements = messages.count()
    val runs = (1 to iterations).map { _ =>
      val t0 = System.nanoTime()
      val ok = HandleKlio.ok(
        HandleKlio(messages, transform, retries, 0, timeoutMs)).count()
      (ok, (System.nanoTime() - t0) / 1e9)
    }
    Report(iterations, elements, runs.map(_._1), runs.map(_._2))
  }
}
