package graft

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.streaming.{Sessionize, SessionizeTws}
import graft.streaming.Sessionize.{Event, Session}

/** The transformWithState sessionizer must be drop-in interchangeable
  * with the flatMapGroupsWithState one: same sessions, same emission on
  * watermark passage, same open-tail carry across batches.
  */
class SessionizeTwsSpec extends AnyFunSuite {

  private val ProviderConf = "spark.sql.streaming.stateStore.providerClass"
  private val RocksDb =
    "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider"

  private def withRocksDb[T](body: => T): T = {
    val spark = TestSpark.spark
    val prev = spark.conf.getOption(ProviderConf)
    spark.conf.set(ProviderConf, RocksDb)
    try body
    finally prev match {
      case Some(v) => spark.conf.set(ProviderConf, v)
      case None => spark.conf.unset(ProviderConf)
    }
  }

  test("gap-splits, carries open tails, and fires event-time timers") {
    val spark = TestSpark.spark
    import spark.implicits._
    implicit val sc = spark.sqlContext
    withRocksDb {
      val input = MemoryStream[Event]
      val withTime = input.toDS()
        .withColumn("eventTime", timestamp_millis(col("tsMs")))
        .withWatermark("eventTime", "0 seconds")
        .as[Event]
      val sessions = SessionizeTws(withTime, gapMs = 30000)
      val query = sessions.writeStream
        .format("memory").queryName("tws_sessions_out")
        .outputMode("append").start()
      try {
        input.addData(
          Event(1, 1000, 2.0), Event(1, 11000, 3.0),
          Event(1, 60000, 5.0),
          Event(2, 5000, 1.0))
        query.processAllAvailable()
        val afterBatch1 = spark.table("tws_sessions_out").as[Session]
          .collect()
        assert(afterBatch1.toSet ==
          Set(Session(1, 1000, 11000, 2, 5.0),
            Session(2, 5000, 5000, 1, 1.0)))

        // a session EXTENDED across batches leaves a stale timer; the
        // processor must ignore it and emit the merged session once the
        // real expiry passes
        input.addData(Event(1, 70000, 7.0))
        query.processAllAvailable()
        input.addData(Event(3, 900000, 1.0))
        query.processAllAvailable()
        val all = spark.table("tws_sessions_out").as[Session].collect()
        assert(all.count(_ == Session(1, 60000, 70000, 2, 12.0)) == 1,
          s"merged session must emit exactly once: ${all.toSeq}")
      } finally query.stop()
    }
  }

  test("agrees with the flatMapGroupsWithState sessionizer") {
    val spark = TestSpark.spark
    import spark.implicits._
    implicit val sc = spark.sqlContext
    // ts=0 sits exactly on the initial watermark and is filtered as late
    // by the stateful operators (both of them) — start past it
    val events = Seq(
      Event(1, 1000, 1.0), Event(1, 11000, 2.0), Event(1, 51000, 3.0),
      Event(2, 5000, 4.0), Event(2, 40000, 5.0),
      Event(3, 7000, 6.0),
      // flush sentinels far past every gap
      Event(1, 1000000, 0.0), Event(2, 1000000, 0.0),
      Event(3, 1000000, 0.0))

    def run(f: org.apache.spark.sql.Dataset[Event] =>
        org.apache.spark.sql.Dataset[Session], name: String): Set[Session] =
      withRocksDb {
        val input = MemoryStream[Event]
        val withTime = input.toDS()
          .withColumn("eventTime", timestamp_millis(col("tsMs")))
          .withWatermark("eventTime", "0 seconds")
          .as[Event]
        val query = f(withTime).writeStream
          .format("memory").queryName(name)
          .outputMode("append").start()
        try {
          input.addData(events: _*)
          query.processAllAvailable()
          // advance the watermark so gap timers fire
          input.addData(Event(99, 2000000, 0.0))
          query.processAllAvailable()
          spark.table(name).as[Session].collect().toSet
            .filter(_.key <= 3)
        } finally query.stop()
      }

    val classic = run(Sessionize(_, 30000), "xcheck_classic")
    val tws = run(SessionizeTws(_, 30000), "xcheck_tws")
    assert(tws == classic, s"tws=$tws classic=$classic")
    assert(tws.contains(Session(1, 1000, 11000, 2, 3.0)))
  }
}
