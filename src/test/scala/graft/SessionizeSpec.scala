package graft

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.streaming.Sessionize
import graft.streaming.Sessionize.{Event, Session}

class SessionizeSpec extends AnyFunSuite {

  test("gap-splits sessions within a batch and carries the open tail") {
    val spark = TestSpark.spark
    import spark.implicits._
    implicit val sc = spark.sqlContext

    val input = MemoryStream[Event]
    val withTime = input.toDS()
      .withColumn("eventTime", timestamp_millis(col("tsMs")))
      .withWatermark("eventTime", "0 seconds")
      .as[Event]
    val sessions = Sessionize(withTime, gapMs = 30000)
    val query = sessions.writeStream
      .format("memory").queryName("sessions_out")
      .outputMode("append").start()
    try {
      // two sessions for key 1 inside one batch: the first completes
      // (gap > 30 s), the second stays open in state
      input.addData(
        Event(1, 1000, 2.0), Event(1, 11000, 3.0),
        Event(1, 60000, 5.0),
        Event(2, 5000, 1.0))
      query.processAllAvailable()
      // the gap-completed session emits; the watermark (60 s) also fires
      // key 2's event-time timeout within processAllAvailable
      val afterBatch1 = spark.table("sessions_out").as[Session].collect()
      assert(afterBatch1.toSet ==
        Set(Session(1, 1000, 11000, 2, 5.0), Session(2, 5000, 5000, 1, 1.0)))

      // watermark jumps far ahead -> open sessions time out and emit
      input.addData(Event(3, 500000, 1.0))
      query.processAllAvailable()
      input.addData(Event(3, 900000, 1.0))
      query.processAllAvailable()
      val all = spark.table("sessions_out").as[Session].collect().toSet
      assert(all.contains(Session(1, 60000, 60000, 1, 5.0)))
      assert(all.contains(Session(2, 5000, 5000, 1, 1.0)))
    } finally query.stop()
  }

  test("works in batch mode for backfill") {
    val spark = TestSpark.spark
    import spark.implicits._
    val events = Seq(
      Event(7, 0, 1.0), Event(7, 10000, 1.0), Event(7, 100000, 4.0))
      .toDS()
    // batch mode: no timeouts fire, so only gap-completed sessions emit
    val out = Sessionize(events, gapMs = 30000).collect().toSet
    assert(out == Set(Session(7, 0, 10000, 2, 2.0)))
  }
}
