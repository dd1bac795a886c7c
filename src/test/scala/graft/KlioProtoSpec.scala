package graft

import java.sql.Timestamp

import org.scalacheck.Gen
import org.scalacheck.rng.Seed
import org.scalatest.funsuite.AnyFunSuite

import graft.model._

/** Byte-level lock on the hand-rolled proto3 wire codec: golden vectors
  * computed from the proto3 wire spec + klio.proto field numbers, roundtrip
  * properties, the v1→v2 upgrade, forward compat (unknown fields), and the
  * non-klio lift — the same semantics the JSON wire codec carries, now at
  * the reference's real wire format.
  */
class KlioProtoSpec extends AnyFunSuite {

  private val params = Gen.Parameters.default.withSize(16)
  private def samples[T](g: Gen[T], n: Int): Seq[T] =
    (1 to n).map(i => g.pureApply(params, Seed(i.toLong)))

  private def hex(b: Array[Byte]): String =
    b.map(x => f"$x%02x").mkString(" ")

  test("golden vector: minimal v2 message matches hand-computed proto3 bytes") {
    // KlioMessage{metadata{intended_recipients{anyone{}}}, data{element:"abc"}, version:V2}
    //   metadata (field 1): 0a 04 | 32 02 0a 00   (recipients=6 → anyone=1, len 0)
    //   data     (field 2): 12 05 | 1a 03 'abc'   (element=3)
    //   version  (field 3): 18 02
    val expected = "0a 04 32 02 0a 00 12 05 1a 03 61 62 63 18 02"
    assert(hex(KlioProto.toBytes(KlioMessage("abc"))) === expected)
  }

  test("golden vector: force/ping flags and payload encode at klio.proto numbers") {
    // metadata{force=4:true, ping=5:true, recipients} data{payload=2:"p", element=3:"e"}
    val m = KlioMessage("e", "p", 2,
      KlioMetadata(force = true, ping = true))
    val expected =
      "0a 08 20 01 28 01 32 02 0a 00 12 06 12 01 70 1a 01 65 18 02"
    assert(hex(KlioProto.toBytes(m)) === expected)
  }

  test("golden vector: limited recipients with trigger_children_of") {
    val m = KlioMessage("x", "", 2, KlioMetadata(intendedRecipients =
      KlioRecipients("limited", Seq(KlioJobRef("j", "g")),
        Some(KlioJobRef("j", "g")))))
    // Limited: recipients=1{job_name=1:"j", gcp_project=2:"g"}, trigger=2{...}
    // KlioJob bytes: 0a 01 6a 12 01 67 (len 6)
    // Limited bytes: 0a 06 <job> 12 06 <job> (len 16)
    // Recipients: 12 10 <limited>  (len 18)
    // Metadata: 32 12 <recipients> (len 20)
    val expected = "0a 14 32 12 12 10 0a 06 0a 01 6a 12 01 67 " +
      "12 06 0a 01 6a 12 01 67 12 03 1a 01 78 18 02"
    assert(hex(KlioProto.toBytes(m)) === expected)
  }

  private val genJob: Gen[KlioJobRef] = for {
    n <- Gen.alphaNumStr.suchThat(_.length <= 12)
    p <- Gen.alphaNumStr.suchThat(_.length <= 12)
  } yield KlioJobRef(n, p)

  private val genRecipients: Gen[KlioRecipients] = Gen.oneOf(
    Gen.const(KlioRecipients("anyone")),
    for {
      rs <- Gen.listOfN(2, genJob)
      t <- Gen.option(genJob)
    } yield KlioRecipients("limited", rs, t))

  private val genAudit: Gen[KlioAuditItem] = for {
    ms <- Gen.chooseNum(0L, 4102444800000L) // ms precision by design
    j <- genJob
  } yield KlioAuditItem(new Timestamp(ms), j.jobName, j.gcpProject)

  private val genMessage: Gen[KlioMessage] = for {
    el <- Gen.alphaNumStr.suchThat(s => s.nonEmpty && s.length <= 20)
    pay <- Gen.alphaNumStr.suchThat(_.length <= 20)
    force <- Gen.oneOf(true, false)
    ping <- Gen.oneOf(true, false)
    rec <- genRecipients
    audit <- Gen.listOf(genAudit).map(_.take(3))
  } yield KlioMessage(el, pay, 2, KlioMetadata(force, ping, rec, audit))

  test("roundtrip property: fromBytes(toBytes(m)) == m for all metadata shapes") {
    samples(genMessage, 200).foreach { m =>
      assert(KlioProto.fromBytes(KlioProto.toBytes(m)) === m)
    }
  }

  test("v1 upgrade: entity_id bytes decode to element, payload/force carry, version 2") {
    // v1 wire: metadata{force=4:true} data{entity_id=1:"x7", payload=2:"pp"} version=3:1
    val v1 = Array[Int](
      0x0a, 0x02, 0x20, 0x01, // metadata{force:true}
      0x12, 0x08, 0x0a, 0x02, 'x', '7', 0x12, 0x02, 'p', 'p',
      0x18, 0x01).map(_.toByte)
    val m = KlioProto.fromBytes(v1)
    assert(m.element === "x7")
    assert(m.payload === "pp")
    assert(m.version === 2)
    assert(m.metadata.force)
    assert(m.metadata.intendedRecipients.mode === "anyone")
  }

  test("forward compat: unknown fields at any level are skipped") {
    val base = KlioProto.toBytes(KlioMessage("abc", "p"))
    // append an unknown length-delimited field 15 (tag 0x7a) at top level
    val extended = base ++ Array[Int](0x7a, 0x03, 1, 2, 3).map(_.toByte)
    assert(KlioProto.fromBytes(extended) === KlioMessage("abc", "p"))
  }

  test("v1 leftovers downstream/visited (KlioJob fields 1-2 of Metadata) skip") {
    // metadata{downstream=1{job_name:"j"}} data{element=3:"e"} version:2
    val bytes = Array[Int](
      0x0a, 0x05, 0x0a, 0x03, 0x0a, 0x01, 'j',
      0x12, 0x03, 0x1a, 0x01, 'e', 0x18, 0x02).map(_.toByte)
    val m = KlioProto.fromBytes(bytes)
    assert(m.element === "e")
    assert(m.version === 2)
  }

  test("non-klio bytes lift when allowed, DecodeError when strict") {
    val raw = "battleclip_daq".getBytes("UTF-8")
    assert(KlioProto.fromBytes(raw) ===
      KlioMessage("battleclip_daq"))
    assertThrows[IllegalArgumentException] {
      KlioProto.fromBytes(raw, allowNonKlio = false)
    }
  }

  test("audit timestamps keep millisecond fidelity through seconds+nanos") {
    val t = new Timestamp(1767225600123L)
    val m = KlioMessage("e", "", 2,
      KlioMetadata(jobAuditLog = Seq(KlioAuditItem(t, "j", "g"))))
    val back = KlioProto.fromBytes(KlioProto.toBytes(m))
    assert(back.metadata.jobAuditLog.head.timestamp.getTime === t.getTime)
  }
}
