package graft

import org.scalatest.funsuite.AnyFunSuite

import graft.runner.Profile

class ProfileSpec extends AnyFunSuite {

  test("timeit repeats the transform and reports per-iteration counts") {
    val spark = TestSpark.spark
    val msgs = Profile.messagesFrom(spark, (1 to 40).map(_.toString))
    val report = Profile.timeit(msgs,
      m => m.copy(payload = m.element.reverse), iterations = 3)
    assert(report.iterations == 3)
    assert(report.elements == 40)
    assert(report.okPerIter == Seq(40L, 40L, 40L))
    assert(report.secPerIter.length == 3)
    assert(report.secPerIter.forall(_ > 0.0))
    assert(report.throughputPerSec > 0.0)
  }

  test("timeit excludes error-dropped elements from ok counts") {
    val spark = TestSpark.spark
    val msgs = Profile.messagesFrom(spark, (1 to 10).map(_.toString))
    val report = Profile.timeit(msgs,
      m => if (m.element.toInt % 2 == 0) sys.error("boom") else m,
      iterations = 2)
    assert(report.okPerIter == Seq(5L, 5L))
  }
}
