package graft.queries

import scala.concurrent.{Await, Future}
import scala.concurrent.duration.Duration
import scala.concurrent.ExecutionContext.Implicits.global

/** Concurrent submission of INDEPENDENT Spark actions from one driver —
  * the shape a production maintenance tier has anyway (many loaders /
  * folders running against separate tables or separate manifest roots).
  * Spark's scheduler is explicitly multi-job; the only shared state the
  * callers here touch is a [[graft.io.Manifest]] list, whose commit loop
  * is designed to absorb append races (lost create → re-read → retry).
  * Both failures propagate: the first exception rethrows after both
  * branches settle, so a gate can't half-succeed silently.
  */
private[queries] object GraftPar {
  def par[A, B](a: => A, b: => B): (A, B) = {
    val fa = Future(a)
    val fb = Future(b)
    // await both before rethrowing either, so no branch is abandoned
    // mid-write when its sibling fails
    val ra = scala.util.Try(Await.result(fa, Duration.Inf))
    val rb = scala.util.Try(Await.result(fb, Duration.Inf))
    (ra.get, rb.get)
  }
}
