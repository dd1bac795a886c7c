package graft.io

import org.apache.spark.sql.{DataFrame, Dataset, Encoders, Row, SaveMode, SparkSession}
import org.apache.spark.sql.functions._

import graft.model.{KlioMessage, KlioProto, KlioWire}

/** Event sources/sinks (reference `lib/src/klio/transforms/io.py`), as thin
  * builders over Spark readers/writers returning/accepting message-shaped
  * DataFrames. Each read/write is `observe`d with the reference's metric
  * names (kmsg-read / kmsg-write, io.py:93-145) so listeners see parity
  * counters.
  *
  * Offline mapping: `file` → text, `bq` → parquet stand-in, `avro` → the
  * Spark avro connector (not shipped in this container; JSON wire files
  * cover interop), `pubsub` → file-backed stream (graft.streaming).
  */
object EventIO {

  // Observation names must be unique per query (Spark rejects two
  // different-result observations sharing a name, e.g. two event inputs in
  // one job); the metric COLUMN names stay the reference's kmsg-* set.
  private val obsId = new java.util.concurrent.atomic.AtomicInteger
  private def obs(prefix: String): String =
    s"$prefix-${obsId.incrementAndGet()}"

  /** KlioReadFromText (io.py:148-189): one line → one new v2 message with
    * element = line. Lines that are full wire-JSON messages parse as such
    * (allow_non_klio_messages parity, serializer.py:90-105).
    */
  def readText(spark: SparkSession, path: String,
      allowNonKlio: Boolean = true): DataFrame =
    KlioWire.decode(spark.read.text(path), allowNonKlio)
      .observe(obs("klio_read"), count(lit(1)).as("kmsg-read"))

  /** KlioWriteToText (io.py:386-424): element per line. */
  def writeText(df: DataFrame, path: String): Unit =
    df.observe(obs("klio_write"), count(lit(1)).as("kmsg-write"))
      .select(col("element").cast("string"))
      .write.mode(SaveMode.Overwrite).text(path)

  /** Full-fidelity wire-JSON event files (stand-in for the avro event IO,
    * io.py:428-657 — same role: lossless message envelope interop).
    */
  def readWire(spark: SparkSession, path: String): DataFrame =
    KlioWire.decode(spark.read.text(path), allowNonKlio = false)
      .observe(obs("klio_read_wire"), count(lit(1)).as("kmsg-read"))

  def writeWire(df: DataFrame, path: String): Unit =
    KlioWire.encode(
      df.observe(obs("klio_write_wire"), count(lit(1)).as("kmsg-write")))
      .write.mode(SaveMode.Overwrite).text(path)

  /** Proto wire files: the reference's ACTUAL wire format (serialized
    * KlioMessage proto, klio.proto) in varint-length-delimited frames — the
    * standard proto streaming container. One `.pb` shard per partition.
    * This is the binary sibling of [[writeWire]]'s JSON files; bytes here
    * interop with the reference's `klio_pb2` ([[KlioProto]]).
    */
  def writeProtoWire(df: DataFrame, path: String): Unit = {
    val spark = df.sparkSession
    val confB = spark.sparkContext.broadcast(
      new HadoopConf(spark.sparkContext.hadoopConfiguration))
    val dir = new org.apache.hadoop.fs.Path(path)
    val fs = dir.getFileSystem(spark.sparkContext.hadoopConfiguration)
    fs.delete(dir, true)
    fs.mkdirs(dir)
    df.observe(obs("klio_write_proto"), count(lit(1)).as("kmsg-write"))
      .as[KlioMessage](Encoders.product[KlioMessage])
      .foreachPartition { (rows: Iterator[KlioMessage]) =>
        if (rows.nonEmpty) {
          val part = org.apache.spark.TaskContext.getPartitionId()
          val file = new org.apache.hadoop.fs.Path(dir, f"part-$part%05d.pb")
          val out = file.getFileSystem(confB.value.value).create(file, true)
          val buf = new java.io.BufferedOutputStream(out, 1 << 16)
          try rows.foreach { m =>
            val b = KlioProto.toBytes(m)
            var len = b.length
            while ((len & ~0x7f) != 0) { // varint frame length
              buf.write((len & 0x7f) | 0x80); len >>>= 7
            }
            buf.write(len)
            buf.write(b)
          } finally buf.close()
        }
      }
  }

  /** Read varint-framed proto wire files back into message rows. Each
    * frame decodes with the reference's v1→v2 upgrade and non-klio lift
    * semantics ([[KlioProto.fromBytes]]). Shards are written bounded (one
    * per upstream partition), so whole-shard reads stay within task
    * memory; a 100 TB corpus fans out across shards, not within one.
    */
  def readProtoWire(spark: SparkSession, path: String,
      allowNonKlio: Boolean = true): DataFrame = {
    import spark.implicits._
    val frames = spark.read.format("binaryFile")
      .option("pathGlobFilter", "*.pb").load(path)
      .select(col("content"))
      .as[Array[Byte]]
      .flatMap { bytes =>
        val out = List.newBuilder[KlioMessage]
        var pos = 0
        while (pos < bytes.length) {
          var len = 0; var shift = 0; var more = true
          while (more) {
            val b = bytes(pos); pos += 1
            len |= (b & 0x7f) << shift; shift += 7; more = (b & 0x80) != 0
          }
          out += KlioProto.fromBytes(
            java.util.Arrays.copyOfRange(bytes, pos, pos + len), allowNonKlio)
          pos += len
        }
        out.result()
      }
    frames.toDF()
      .observe(obs("klio_read_proto"), count(lit(1)).as("kmsg-read"))
  }

  /** KlioReadFromBigQuery (io.py:192-352), parquet stand-in: with one
    * selected column the raw value becomes the element; with several, a JSON
    * object of them does (klio_message_columns semantics, io.py:219-241).
    * Column selection is a real projection here — pushed to the scan.
    */
  def readBq(spark: SparkSession, path: String,
      columns: Seq[String] = Seq.empty): DataFrame =
    bqMessages(spark.read.parquet(path), columns)

  /** KlioReadFromBigQuery's `query` form (io.py:288-306: a SQL query
    * replaces the table+columns arguments): the query text runs against
    * the registered table and its result rows become messages under the
    * same 1-col/N-col element rule. The query executes IN the engine —
    * filters/projections inside it reach the parquet scan like any other
    * plan, where the reference ships the text to the warehouse.
    */
  def readBqQuery(spark: SparkSession, path: String, viewName: String,
      sql: String, columns: Seq[String] = Seq.empty): DataFrame = {
    spark.read.parquet(path).createOrReplaceTempView(viewName)
    bqMessages(spark.sql(sql), columns)
  }

  private def bqMessages(table: DataFrame, columns: Seq[String]): DataFrame = {
    val elem = columns match {
      case Seq() => to_json(struct(table.columns.map(col).toSeq: _*))
      case Seq(one) => col(one).cast("string")
      case many => to_json(struct(many.map(col): _*))
    }
    table.select(KlioWire.newMessageColumns(elem): _*)
      .observe(obs("klio_read_bq"), count(lit(1)).as("kmsg-read"))
  }

  /** KlioWriteToBigQuery's row projection (io.py:355-383): the message
    * payload is a JSON row; parse it against the declared columns (the BQ
    * schema from config, `_io.py:462-491`). The declared schema is a real
    * StructType → real column pruning downstream.
    */
  def bqRows(df: DataFrame,
      schema: org.apache.spark.sql.types.StructType): DataFrame =
    df.select(from_json(col("payload"), schema).as("row"))
      .select(col("row.*"))

  /** KlioWriteToBigQuery (io.py:355-383): [[bqRows]] written columnar. */
  def writeBq(df: DataFrame, path: String,
      schema: org.apache.spark.sql.types.StructType): Unit =
    bqRows(df.observe(obs("klio_write_bq"), count(lit(1)).as("kmsg-write")),
      schema)
      .write.mode(SaveMode.Overwrite).parquet(path)
}
