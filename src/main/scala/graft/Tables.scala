package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions.{col, expr, lit, unix_micros}
import org.apache.spark.sql.types.{LongType, StructType, TimestampNTZType,
  TimestampType}

/** Loaders for the driver-provided parquet tables (TESTDATA.md). */
object Tables {
  def apply(spark: SparkSession, dir: String, name: String): DataFrame =
    // schema-memoized read: the driver tables are immutable for a run,
    // and the bare read's schema-inference job (one per DataFrame
    // construction, hundreds per suite) is pure overhead
    graft.io.SchemaMemo.read(spark, Seq(s"$dir/$name.parquet"))

  def lineitem(s: SparkSession, d: String): DataFrame = apply(s, d, "lineitem")
  def orders(s: SparkSession, d: String): DataFrame = apply(s, d, "orders")
  def customer(s: SparkSession, d: String): DataFrame = apply(s, d, "customer")
  def supplier(s: SparkSession, d: String): DataFrame = apply(s, d, "supplier")
  def part(s: SparkSession, d: String): DataFrame = apply(s, d, "part")
  def nation(s: SparkSession, d: String): DataFrame = apply(s, d, "nation")
  def region(s: SparkSession, d: String): DataFrame = apply(s, d, "region")

  /** The events table with `ts` pinned to epoch NANOSECONDS as a LONG,
    * whatever flavor the generator wrote. The engine-wide contract (and
    * every DuckDB oracle, via `epoch_ns(ts)`/`epoch_us(ts)`) treats
    * event time as an absolute nanosecond count: earlier driver testdata
    * stored parquet TIMESTAMP(NANOS), which Spark (no ns timestamp type)
    * reads as raw LongType under `legacy.parquet.nanosAsLong`; the
    * current generator writes timestamp[us], surfaced as TIMESTAMP_NTZ.
    * Normalizing at the scan keeps every downstream query and oracle
    * byte-identical across flavors.
    */
  def events(s: SparkSession, d: String): DataFrame =
    normalizeTs(apply(s, d, "events"))

  /** The events parquet as a STREAMING file source (the Pub/Sub
    * stand-in the st-family gates drive), with the same `ts`
    * normalization as [[events]]. Streaming sources require the
    * on-disk schema up front — the RAW schema, since the nanos-long
    * normalization is a projection over it, not a read-time type.
    */
  def eventsStream(s: SparkSession, d: String): DataFrame =
    normalizeTs(s.readStream.schema(eventsRawSchema(s, d))
      .option("pathGlobFilter", "events.parquet").parquet(d))

  /** On-disk schema of the events parquet (what a streaming file source
    * must declare), as opposed to [[events]]'s normalized one.
    */
  def eventsRawSchema(s: SparkSession, d: String): StructType =
    apply(s, d, "events").schema

  /** `ts` → epoch-nanos LONG. TIMESTAMP_NTZ is measured against the
    * epoch with `timestampdiff` — a wall-clock difference, so the
    * result is session-timezone-free (a cast through TIMESTAMP would
    * shift by the session zone); true instants go through
    * `unix_micros`, exact by definition. Parquet micros × 1000 is
    * always in-range: 2^63 ns ≈ year 2262.
    */
  def normalizeTs(df: DataFrame): DataFrame =
    df.schema("ts").dataType match {
      case LongType => df
      case TimestampNTZType => df.withColumn("ts",
        expr("timestampdiff(MICROSECOND, " +
          "TIMESTAMP_NTZ '1970-01-01 00:00:00', ts)") * lit(1000L))
      case TimestampType => df.withColumn("ts",
        unix_micros(col("ts")) * lit(1000L))
      case other => throw new IllegalArgumentException(
        s"events.ts: unsupported on-disk type $other")
    }

  def documents(s: SparkSession, d: String): DataFrame = apply(s, d, "documents")
  def embeddings(s: SparkSession, d: String): DataFrame = apply(s, d, "embeddings")
}
