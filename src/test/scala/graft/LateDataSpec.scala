package graft

import java.nio.file.Files

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.Trigger
import org.scalatest.funsuite.AnyFunSuite

/** Pins the EXACT late-data drop boundary the st18 oracle replays:
  * with a watermark of `floor(maxEventTimeMs) - delay` persisted from a
  * prior run, a stateful operator drops a subsequent row iff its event
  * time is <= that watermark (microsecond comparison against the
  * ms-truncated watermark value), and counts each dropped RAW row once
  * in `numRowsDroppedByWatermark`. Planted timestamps sit 1 µs / 1 ms
  * on each side of the boundary so the inequality is forced, not
  * data-luck.
  */
class LateDataSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark

  // night-1 max event time: µs value, ms-aligned so the ms truncation
  // in the watermark bookkeeping is exact
  private val T = 1700000000000000L
  private val delayUs = 172800000000L // "48 hours"
  private val wm1 = T - delayUs

  private def plant(rows: Seq[(Long, Long)]): DataFrame = {
    import spark.implicits._
    rows.toDF("event_id", "us")
      .select(col("event_id"), timestamp_micros(col("us")).as("ets"))
  }

  test("late rows drop iff ets <= persisted watermark; metric counts raw rows") {
    val root = Files.createTempDirectory("graft-late").toString
    val srcDir = s"$root/src"
    val outDir = s"$root/out"
    val schema = plant(Seq((0L, 0L))).schema

    def runOnce(): Long = {
      val prev = spark.conf.get("spark.sql.shuffle.partitions")
      spark.conf.set("spark.sql.shuffle.partitions", "2")
      try {
        val q = spark.readStream.schema(schema).parquet(srcDir)
          .withWatermark("ets", "48 hours")
          .dropDuplicatesWithinWatermark("event_id")
          .writeStream.format("parquet").option("path", outDir)
          .option("checkpointLocation", s"$root/ckpt")
          .trigger(Trigger.AvailableNow()).start()
        q.awaitTermination()
        q.recentProgress.iterator.flatMap(_.stateOperators)
          .map(_.numRowsDroppedByWatermark).sum
      } finally spark.conf.set("spark.sql.shuffle.partitions", prev)
    }

    // night 1: a single row fixes the watermark at T - 48h
    plant(Seq((1L, T))).coalesce(1).write.mode("append").parquet(srcDir)
    assert(runOnce() === 0L)

    // night 2: rows straddling the boundary at µs resolution
    plant(Seq(
      (2L, wm1 - 1000L), // 1 ms late  -> dropped
      (3L, wm1),         // exactly at the watermark -> dropped (<=)
      (4L, wm1 + 1L),    // 1 µs after -> kept
      (5L, wm1 + 1000L)  // 1 ms after -> kept
    )).coalesce(1).write.mode("append").parquet(srcDir)
    val dropped = runOnce()

    val kept = spark.read.parquet(outDir)
      .select(col("event_id")).as[Long](spark.implicits.newLongEncoder)
      .collect().sorted.toSeq
    assert(kept === Seq(1L, 4L, 5L), s"kept=$kept dropped=$dropped")
    assert(dropped === 2L)
  }
}
