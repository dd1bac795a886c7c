package graft

import java.util.concurrent.ConcurrentHashMap

import org.scalatest.funsuite.AnyFunSuite

import graft.model.KlioMessage
import graft.operators.HandleKlio

class HandleKlioSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  test("errors divert original message to the drop channel") {
    val ds = Seq(KlioMessage("good"), KlioMessage("bad")).toDS()
    val attempts = HandleKlio(ds, m =>
      if (m.element == "bad") sys.error("boom")
      else m.copy(payload = "done")).cache()
    assert(HandleKlio.ok(attempts).collect().map(_.payload) === Array("done"))
    val drops = HandleKlio.dropped(attempts).collect()
    assert(drops.length === 1 && drops.head.msg.element === "bad")
    assert(drops.head.error.contains("boom"))
  }

  test("retry recovers after transient failures") {
    val ds = Seq(KlioMessage("flaky")).toDS()
    val attempts = HandleKlio(ds, m => {
      val n = HandleKlioSpec.counts.merge(m.element, 1, _ + _)
      if (n < 3) sys.error(s"transient $n")
      m.copy(payload = s"attempt$n")
    }, retries = 3)
    assert(HandleKlio.ok(attempts).collect().map(_.payload)
      === Array("attempt3"))
  }

  test("retryOn filter: transient matches retry, permanent fails fast") {
    // reference @retry(exception=...) parity (_retry.py:45-57,76): only
    // matching failures consume the retry budget
    val ds = Seq(KlioMessage("flaky2"), KlioMessage("perm")).toDS()
    val attempts = HandleKlio(ds, m => {
      val n = HandleKlioSpec.counts.merge(m.element, 1, _ + _)
      if (m.element == "perm")
        throw new IllegalStateException("permanent")
      if (n < 3) throw new java.io.IOException(s"transient $n")
      m.copy(payload = s"attempt$n")
    }, retries = 5,
      retryOn = HandleKlio.retryOnClasses(classOf[java.io.IOException]))
      .cache()
    val ok = HandleKlio.ok(attempts).collect()
    assert(ok.map(_.payload) === Array("attempt3"))
    val perm = HandleKlio.dropped(attempts).collect()
      .find(_.msg.element == "perm").get
    assert(perm.attempts === 1, "permanent error must not retry")
    assert(perm.error.contains("permanent"))
    // the transient element used exactly 3 attempts
    assert(attempts.filter(_.msg.element == "flaky2")
      .collect().head.attempts === 3)
  }

  test("timeout drops hung elements, fast ones pass") {
    val ds = Seq(KlioMessage("fast"), KlioMessage("slow")).toDS()
    val attempts = HandleKlio(ds, m => {
      if (m.element == "slow") Thread.sleep(30000)
      m.copy(payload = "ok")
    }, timeoutMs = 1500).cache()
    assert(HandleKlio.ok(attempts).collect().map(_.element)
      === Array("fast"))
    val drops = HandleKlio.dropped(attempts).collect()
    assert(drops.length === 1 && drops.head.msg.element === "slow")
    assert(drops.head.error.toLowerCase.contains("timed out"))
  }
}

object HandleKlioSpec {
  // Executor-side attempt counter (single-JVM local mode).
  val counts = new ConcurrentHashMap[String, Int]()
}
