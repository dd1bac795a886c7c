package graft

import java.nio.ByteBuffer
import java.nio.file.{Files, Paths}

import org.apache.avro.Schema
import org.apache.avro.file.{CodecFactory, DataFileStream, DataFileWriter}
import org.apache.avro.generic.{GenericData, GenericDatumReader, GenericDatumWriter, GenericRecord}
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.io.AvroIO
import graft.model.KlioWire

/** Locks the REAL avro container IO: the container format (magic, codec,
  * writer schema = the reference's KLIO_SCHEMA_OBJ), the distributed
  * write→read roundtrip through the splittable scan, and the reference's
  * element-recovery rule for foreign schemas (io.py:481-495).
  */
class AvroIOSpec extends AnyFunSuite {

  lazy val spark = TestSpark.spark

  test("container bytes carry avro magic, deflate codec, and the klio schema") {
    val bytes = AvroIO.encodeContainer(Seq("a", "b"))
    assert(bytes.take(4).toSeq === Seq[Byte]('O', 'b', 'j', 1))
    val in = new DataFileStream[GenericRecord](
      new java.io.ByteArrayInputStream(bytes),
      new GenericDatumReader[GenericRecord]())
    try {
      assert(in.getMetaString("avro.codec") === "deflate")
      val schema = in.getSchema
      assert(schema.getFullName === "klio.avro.KlioMessage")
      assert(schema.getField("element").schema().getType
        === Schema.Type.BYTES)
    } finally in.close()
  }

  test("container encode/decode roundtrip preserves elements in order") {
    val els = Seq("battleclip_daq", "x/y z", "", "ünïcødé-✓")
    assert(AvroIO.decodeContainer(AvroIO.encodeContainer(els)) === els)
  }

  test("writeKlioAvro → readAvro roundtrips elements as fresh v2 messages") {
    import spark.implicits._
    val dir = Files.createTempDirectory("graft_avro").toString + "/evt"
    val els = (1 to 257).map(i => s"el-$i")
    val msgs = els.toDF("id")
      .repartition(3)
      .select(KlioWire.newMessageColumns(col("id")): _*)
    AvroIO.writeKlioAvro(msgs, dir)
    val files = Files.list(Paths.get(dir)).toArray.map(_.toString)
      .filter(_.endsWith(".avro"))
    assert(files.length === 3) // one shard per non-empty partition
    val back = AvroIO.readAvro(spark, dir)
    assert(back.columns.toSeq ===
      Seq("element", "payload", "version", "metadata"))
    val rows = back.select(col("element"), col("version"),
        col("metadata.intendedRecipients.mode"))
      .as[(String, Int, String)].collect()
    assert(rows.map(_._1).sorted.toSeq === els.sorted)
    assert(rows.forall { case (_, v, m) => v == 2 && m == "anyone" })
  }

  test("foreign writer schema: element field recovered, else record JSON") {
    val dir = Files.createTempDirectory("graft_avro_foreign").toString
    val schema = new Schema.Parser().parse(
      """{"type":"record","name":"Other","fields":[
        |{"name":"track","type":"string"},{"name":"n","type":"long"}]}"""
        .stripMargin)
    val w = new DataFileWriter(new GenericDatumWriter[GenericRecord](schema))
    w.setCodec(CodecFactory.nullCodec())
    w.create(schema, new java.io.File(dir, "foreign.avro"))
    val rec = new GenericData.Record(schema)
    rec.put("track", "t1"); rec.put("n", 7L)
    w.append(rec); w.close()

    val back = AvroIO.readAvro(spark, dir)
      .select("element").collect().map(_.getString(0))
    assert(back.toSeq === Seq("""{"track": "t1", "n": 7}"""))

    // and a schema WITH an element field of string type
    val schema2 = new Schema.Parser().parse(
      """{"type":"record","name":"WithEl","fields":[
        |{"name":"element","type":"string"},{"name":"x","type":"int"}]}"""
        .stripMargin)
    val dir2 = Files.createTempDirectory("graft_avro_el").toString
    val w2 =
      new DataFileWriter(new GenericDatumWriter[GenericRecord](schema2))
    w2.create(schema2, new java.io.File(dir2, "el.avro"))
    val rec2 = new GenericData.Record(schema2)
    rec2.put("element", "the-id"); rec2.put("x", 1)
    w2.append(rec2); w2.close()
    val back2 = AvroIO.readAvro(spark, dir2)
      .select("element").collect().map(_.getString(0))
    assert(back2.toSeq === Seq("the-id"))
  }

  test("proto wire files roundtrip through EventIO write/read") {
    import spark.implicits._
    val dir = Files.createTempDirectory("graft_pb").toString + "/wire"
    val msgs = Seq(
      graft.model.KlioMessage("e1", "p1"),
      graft.model.KlioMessage("e2", "", 2,
        graft.model.KlioMetadata(force = true)),
      graft.model.KlioMessage("e3", "p3", 2,
        graft.model.KlioMetadata(intendedRecipients =
          graft.model.KlioRecipients("limited",
            Seq(graft.model.KlioJobRef("j", "g")), None))))
    graft.io.EventIO.writeProtoWire(
      spark.createDataset(msgs).toDF().repartition(2), dir)
    val back = graft.io.EventIO.readProtoWire(spark, dir,
        allowNonKlio = false)
      .as[graft.model.KlioMessage].collect()
    assert(back.sortBy(_.element).toSeq === msgs)
  }
}
