package graft.model

import java.nio.charset.StandardCharsets.UTF_8
import java.sql.Timestamp

/** The reference's REAL wire format: proto3 encoding of `KlioMessage`
  * (reference `core/src/klio_core/proto/klio.proto:28-120`), hand-rolled on
  * the public proto3 wire spec (varints + length-delimited fields) so the
  * engine needs no protobuf runtime jar. Bytes produced here parse with the
  * reference's generated `klio_pb2`, and bytes published by a klio job parse
  * here — this is the interop boundary the JSON wire codec ([[KlioWire]])
  * stands in for inside the engine.
  *
  * Field numbers (klio.proto):
  *  - KlioMessage: metadata=1, data=2, version=3 (enum V1=1, V2=2)
  *  - Data: entity_id=1, payload=2, element=3 (:79-86)
  *  - Metadata: downstream=1, visited=2 (v1 leftovers, skipped on decode),
  *    job_audit_log=3, force=4, ping=5, intended_recipients=6 (:29-75)
  *  - Recipients: oneof anyone=1 (empty message), limited=2
  *  - Limited: recipients=1 (repeated KlioJob), trigger_children_of=2
  *  - KlioJob: job_name=1, gcp_project=2, inputs=3 (deprecated, skipped)
  *  - KlioJobAuditLogItem: timestamp=1 (google.protobuf.Timestamp
  *    {seconds=1, nanos=2}), klio_job=2 (:109-114)
  *
  * Proto3 presence rules are honored: default values (false, 0, empty
  * bytes/strings) are omitted on encode and assumed on decode; unknown
  * fields and wire types are skipped, so messages from newer reference
  * versions still decode (forward compat).
  */
object KlioProto {

  // ---- wire primitives -----------------------------------------------

  private final class Writer {
    private val buf = new java.io.ByteArrayOutputStream(64)
    def bytes: Array[Byte] = buf.toByteArray
    def varint(v: Long): Unit = {
      var x = v
      while ((x & ~0x7fL) != 0) {
        buf.write(((x & 0x7f) | 0x80).toInt); x >>>= 7
      }
      buf.write(x.toInt)
    }
    def tag(field: Int, wire: Int): Unit = varint((field.toLong << 3) | wire)
    def lenDelim(field: Int, b: Array[Byte]): Unit = {
      tag(field, 2); varint(b.length.toLong); buf.write(b, 0, b.length)
    }
    def str(field: Int, s: String): Unit =
      if (s != null && s.nonEmpty) lenDelim(field, s.getBytes(UTF_8))
    def bool(field: Int, b: Boolean): Unit =
      if (b) { tag(field, 0); varint(1L) }
    def int(field: Int, v: Long): Unit =
      if (v != 0L) { tag(field, 0); varint(v) }
    def msg(field: Int, m: Writer): Unit = lenDelim(field, m.bytes)
  }

  private final class Reader(b: Array[Byte], from: Int, until: Int) {
    private var pos = from
    def hasNext: Boolean = pos < until
    def varint(): Long = {
      var shift = 0; var out = 0L
      while (true) {
        require(pos < until, "proto: truncated varint")
        val byt = b(pos); pos += 1
        out |= (byt & 0x7fL) << shift
        if ((byt & 0x80) == 0) return out
        shift += 7
        require(shift < 64, "proto: varint too long")
      }
      out
    }
    /** Returns (fieldNumber, wireType). */
    def tag(): (Int, Int) = {
      val t = varint()
      ((t >>> 3).toInt, (t & 7).toInt)
    }
    /** A length-delimited field's (start, end) range, consuming it. */
    def lenRange(): (Int, Int) = {
      val len = varint().toInt
      require(len >= 0 && pos + len <= until, "proto: truncated field")
      val r = (pos, pos + len); pos += len; r
    }
    def str(): String = {
      val (s, e) = lenRange(); new String(b, s, e - s, UTF_8)
    }
    def sub(): Reader = { val (s, e) = lenRange(); new Reader(b, s, e) }
    def skip(wire: Int): Unit = wire match {
      case 0 => varint()
      case 1 => require(pos + 8 <= until, "proto: truncated"); pos += 8
      case 2 => lenRange()
      case 5 => require(pos + 4 <= until, "proto: truncated"); pos += 4
      case w => throw new IllegalArgumentException(s"proto: wire type $w")
    }
  }

  // ---- encode ---------------------------------------------------------

  def toBytes(m: KlioMessage): Array[Byte] = {
    val w = new Writer
    val md = encodeMetadata(m.metadata)
    if (md.bytes.nonEmpty || alwaysEmitMetadata(m)) w.msg(1, md)
    val data = new Writer
    data.str(2, m.payload) // Data.payload = 2
    data.str(3, m.element) // Data.element = 3
    w.msg(2, data)
    w.int(3, m.version.toLong) // Version enum: V2 = 2
    w.bytes
  }

  // proto3 omits empty submessages, but the reference always touches
  // intended_recipients (SetInParent) so a v2 message's metadata exists on
  // the wire even when all-default; match that for byte-level parity.
  private def alwaysEmitMetadata(m: KlioMessage): Boolean = m.version == 2

  private def encodeMetadata(md: KlioMetadata): Writer = {
    val w = new Writer
    md.jobAuditLog.foreach { item => w.msg(3, encodeAuditItem(item)) }
    w.bool(4, md.force)
    w.bool(5, md.ping)
    w.msg(6, encodeRecipients(md.intendedRecipients))
    w
  }

  private def encodeRecipients(r: KlioRecipients): Writer = {
    val w = new Writer
    if (r.mode == "limited") {
      val lim = new Writer
      r.recipients.foreach(j => lim.msg(1, encodeJob(j)))
      r.triggerChildrenOf.foreach(j => lim.msg(2, encodeJob(j)))
      w.msg(2, lim)
    } else {
      w.msg(1, new Writer) // Anyone{} — empty message, presence = routing
    }
    w
  }

  private def encodeJob(j: KlioJobRef): Writer = {
    val w = new Writer
    w.str(1, j.jobName)
    w.str(2, j.gcpProject)
    w
  }

  private def encodeAuditItem(a: KlioAuditItem): Writer = {
    val w = new Writer
    val ts = new Writer
    val ms = a.timestamp.getTime
    ts.int(1, Math.floorDiv(ms, 1000L))
    ts.int(2, Math.floorMod(ms, 1000L).toInt * 1000000L) // ms → ns
    w.msg(1, ts)
    w.msg(2, encodeJob(KlioJobRef(a.jobName, a.gcpProject)))
    w
  }

  // ---- decode ---------------------------------------------------------

  /** Parse wire bytes into a message, applying the reference's v1→v2
    * upgrade (serializer.py:23-53): `entity_id` becomes `element`, payload
    * and force/ping carry over, version becomes 2. Unknown fields skip.
    * Bytes that are not a KlioMessage at all: lifted to a fresh v2 message
    * with element = raw bytes when `allowNonKlio` (serializer.py:90-105),
    * else DecodeError.
    */
  def fromBytes(bytes: Array[Byte], allowNonKlio: Boolean = true)
      : KlioMessage =
    try {
      val m = parseMessage(new Reader(bytes, 0, bytes.length))
      // a parse that recovered neither identity field on non-empty input is
      // a false positive (proto parses many garbage strings "successfully")
      if (m.element.isEmpty && bytes.nonEmpty) lift(bytes, allowNonKlio)
      else m
    } catch {
      case _: IllegalArgumentException | _: RuntimeException =>
        lift(bytes, allowNonKlio)
    }

  private def lift(bytes: Array[Byte], allowNonKlio: Boolean): KlioMessage =
    if (allowNonKlio) KlioMessage(element = new String(bytes, UTF_8))
    else throw new IllegalArgumentException(
      "klio DecodeError: not a klio message")

  private def parseMessage(r: Reader): KlioMessage = {
    var metadata = KlioMetadata()
    var element = ""; var payload = ""; var entityId = ""
    var version = 0
    while (r.hasNext) r.tag() match {
      case (1, 2) => metadata = parseMetadata(r.sub())
      case (2, 2) =>
        val d = r.sub()
        while (d.hasNext) d.tag() match {
          case (1, 2) => entityId = d.str()
          case (2, 2) => payload = d.str()
          case (3, 2) => element = d.str()
          case (_, w) => d.skip(w)
        }
      case (3, 0) => version = r.varint().toInt
      case (_, w) => r.skip(w)
    }
    if (element.isEmpty && entityId.nonEmpty) { // v1 upgrade
      element = entityId; version = 2
    } else if (version == 0 && element.nonEmpty) version = 2
    KlioMessage(element, payload, version, metadata)
  }

  private def parseMetadata(r: Reader): KlioMetadata = {
    var force = false; var ping = false
    var recipients = KlioRecipients("anyone")
    val audit = Seq.newBuilder[KlioAuditItem]
    while (r.hasNext) r.tag() match {
      case (3, 2) => audit += parseAuditItem(r.sub())
      case (4, 0) => force = r.varint() != 0L
      case (5, 0) => ping = r.varint() != 0L
      case (6, 2) => recipients = parseRecipients(r.sub())
      case (_, w) => r.skip(w) // downstream=1 / visited=2 v1 leftovers
    }
    KlioMetadata(force, ping, recipients, audit.result())
  }

  private def parseRecipients(r: Reader): KlioRecipients = {
    var out = KlioRecipients("anyone")
    while (r.hasNext) r.tag() match {
      case (1, 2) => r.sub(); out = KlioRecipients("anyone")
      case (2, 2) =>
        val lim = r.sub()
        val recs = Seq.newBuilder[KlioJobRef]
        var trigger: Option[KlioJobRef] = None
        while (lim.hasNext) lim.tag() match {
          case (1, 2) => recs += parseJob(lim.sub())
          case (2, 2) => trigger = Some(parseJob(lim.sub()))
          case (_, w) => lim.skip(w)
        }
        out = KlioRecipients("limited", recs.result(), trigger)
      case (_, w) => r.skip(w)
    }
    out
  }

  private def parseJob(r: Reader): KlioJobRef = {
    var name = ""; var project = ""
    while (r.hasNext) r.tag() match {
      case (1, 2) => name = r.str()
      case (2, 2) => project = r.str()
      case (_, w) => r.skip(w)
    }
    KlioJobRef(name, project)
  }

  private def parseAuditItem(r: Reader): KlioAuditItem = {
    var ms = 0L; var job = KlioJobRef("", "")
    while (r.hasNext) r.tag() match {
      case (1, 2) =>
        val ts = r.sub()
        var sec = 0L; var nanos = 0L
        while (ts.hasNext) ts.tag() match {
          case (1, 0) => sec = ts.varint()
          case (2, 0) => nanos = ts.varint()
          case (_, w) => ts.skip(w)
        }
        ms = sec * 1000L + nanos / 1000000L
      case (2, 2) => job = parseJob(r.sub())
      case (_, w) => r.skip(w)
    }
    KlioAuditItem(new Timestamp(ms), job.jobName, job.gcpProject)
  }
}
