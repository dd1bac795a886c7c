package graft.model

import java.sql.Timestamp

import org.apache.spark.sql.{Column, DataFrame, Encoder, Encoders}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** The engine's unit of work: a typed Spark mirror of the reference's
  * KlioMessage protobuf (reference `core/src/klio_core/proto/klio.proto:
  * 28-90`).
  *
  * Inside the engine these are ordinary Dataset rows — Tungsten format end
  * to end, no per-operator serialization (the reference re-serializes the
  * proto at every transform boundary, `lib/src/klio/message/serializer.py:
  * 58-168`; Catalyst makes that cost zero here). A JSON wire codec exists
  * only at sources/sinks that must interop ([[KlioWire]]).
  */
case class KlioJobRef(jobName: String, gcpProject: String)

case class KlioAuditItem(timestamp: Timestamp, jobName: String,
    gcpProject: String)

/** `mode` is "anyone" | "limited" (klio.proto:41-74); `recipients` and
  * `triggerChildrenOf` only apply in limited mode.
  */
case class KlioRecipients(mode: String,
    recipients: Seq[KlioJobRef] = Seq.empty,
    triggerChildrenOf: Option[KlioJobRef] = None)

case class KlioMetadata(force: Boolean = false, ping: Boolean = false,
    intendedRecipients: KlioRecipients = KlioRecipients("anyone"),
    jobAuditLog: Seq[KlioAuditItem] = Seq.empty)

/** v2 message: `element` is the work-unit identity (a file id), `payload`
  * carries intra-pipeline state (klio.proto:79-83). Strings rather than
  * bytes at the API surface — the testable 99% case; binary payloads ride
  * in [[KlioBinaryMessage]]-style frames with a BinaryType column.
  */
case class KlioMessage(element: String, payload: String = "",
    version: Int = 2, metadata: KlioMetadata = KlioMetadata())

object KlioMessage {
  implicit val encoder: Encoder[KlioMessage] = Encoders.product[KlioMessage]

  val schema: StructType =
    encoder.schema

  /** New v2 message from an element id, `anyone` routing — exactly what
    * KlioReadFromText emits per line (reference io.py:156-167).
    */
  def fromElement(element: String): KlioMessage = KlioMessage(element)
}

/** JSON wire codec for event IO interop. The reference's wire format is the
  * serialized proto; ours is the same shape as JSON so files are
  * human-readable and DuckDB-queryable. Non-klio payloads (a bare id per
  * line) are lifted into fresh v2 messages when `allowNonKlio` — parity with
  * `allow_non_klio_messages` (serializer.py:90-105).
  */
object KlioWire {

  /** Encode full messages as one JSON object per row. */
  def encode(df: DataFrame): DataFrame =
    df.select(to_json(struct(col("element"), col("payload"), col("version"),
      col("metadata"))).as("value"))

  /** v1 wire shape: data.entity_id instead of element (klio.proto:79);
    * force/ping live in the same metadata message as v2 (klio.proto:29-39),
    * so they carry over on upgrade.
    */
  private val v1Schema = StructType(Seq(
    StructField("version", IntegerType),
    StructField("entity_id", StringType),
    StructField("payload", StringType),
    StructField("metadata", StructType(Seq(
      StructField("force", BooleanType),
      StructField("ping", BooleanType))))))

  private val RecipientsType =
    "struct<jobName:string,gcpProject:string>"

  /** Decode a `value: string` column of wire JSON back into message rows.
    * v1 messages (entity_id field) are auto-upgraded to v2 with payload and
    * force/ping preserved — parity with the reference's version detection
    * and compat copy (serializer.py:23-53). Rows that are not klio messages
    * at all: when `allowNonKlio`, lifted into new v2 messages with
    * element = raw line (serializer.py:90-105); otherwise the decode FAILS
    * on first bad row, matching the reference's DecodeError
    * (serializer.py:58-88) — corrupt event input never vanishes silently.
    * Absent metadata (or absent subfields) decode to defaults, never null.
    */
  def decode(df: DataFrame, allowNonKlio: Boolean = true): DataFrame = {
    val parsed = df.select(col("value"),
      from_json(col("value"), KlioMessage.schema).as("m"),
      from_json(col("value"), v1Schema).as("m1"))
    val isKlio = col("m").isNotNull && col("m.element").isNotNull
    val isV1 = col("m1").isNotNull && col("m1.entity_id").isNotNull
    val md = col("m.metadata")
    val ir = md.getField("intendedRecipients")
    // One pass, no branch-filter unions: a when-chain per column keeps the
    // whole decode a single projection over a single scan (the three-way
    // filter+union shape re-evaluated the scan — and both JSON parses —
    // once per branch, which compounds when decodes nest).
    val auditType =
      "array<struct<timestamp:timestamp,jobName:string,gcpProject:string>>"
    // Strict mode fails loudly on the first corrupt line instead of
    // filtering it away. The raise must survive COLUMN PRUNING: guarding
    // only `element` lets a consumer that never reads it silently decode
    // corrupt rows to defaults, while a separate filter step breaks the
    // single-projection plan (measured 14× on the wire roundtrip — the
    // JSON parses re-evaluate for the filter). So EVERY top-level output
    // column carries the guard in its non-klio branch: whichever subset
    // survives pruning still raises, the plan stays one projection, and
    // raise_error is non-foldable (message depends on the row) so
    // ConstantFolding cannot pre-evaluate it; CaseWhen's lazy branches
    // (guaranteed semantics) fire it only for rows that are neither
    // version.
    def strictOr(fallback: Column): Column =
      if (allowNonKlio) fallback
      else raise_error(concat(
        lit("klio DecodeError: not a klio message: "), col("value")))
    parsed.select(
      when(isKlio, col("m.element"))
        .when(isV1, col("m1.entity_id").cast("string"))
        .otherwise(strictOr(col("value"))).as("element"),
      when(isKlio, coalesce(col("m.payload"), lit("")))
        .when(isV1, coalesce(col("m1.payload"), lit("")))
        .otherwise(strictOr(lit(""))).as("payload"),
      when(isKlio, coalesce(col("m.version"), lit(2)))
        .when(isV1, lit(2))
        .otherwise(strictOr(lit(2))).as("version"),
      // nested-field pruning can reduce the metadata struct to any one
      // leaf, so every leaf's non-klio branch carries the strict guard
      struct(
        when(isKlio, coalesce(md.getField("force"), lit(false)))
          .when(isV1, coalesce(col("m1.metadata.force"), lit(false)))
          .otherwise(strictOr(lit(false))).as("force"),
        when(isKlio, coalesce(md.getField("ping"), lit(false)))
          .when(isV1, coalesce(col("m1.metadata.ping"), lit(false)))
          .otherwise(strictOr(lit(false))).as("ping"),
        struct(
          when(isKlio, coalesce(ir.getField("mode"), lit("anyone")))
            .when(isV1, lit("anyone"))
            .otherwise(strictOr(lit("anyone"))).as("mode"),
          when(isKlio, coalesce(ir.getField("recipients"),
            array().cast(s"array<$RecipientsType>")))
            .when(isV1, array().cast(s"array<$RecipientsType>"))
            .otherwise(strictOr(array().cast(s"array<$RecipientsType>")))
            .as("recipients"),
          when(isKlio, ir.getField("triggerChildrenOf"))
            .when(isV1, lit(null).cast(RecipientsType))
            .otherwise(strictOr(lit(null).cast(RecipientsType)))
            .as("triggerChildrenOf")).as("intendedRecipients"),
        when(isKlio, coalesce(md.getField("jobAuditLog"),
          array().cast(auditType)))
          .when(isV1, array().cast(auditType))
          .otherwise(strictOr(array().cast(auditType)))
          .as("jobAuditLog"))
        .as("metadata"))
  }

  /** Columns of a fresh v2 `anyone` message built around `element`. */
  def newMessageColumns(element: Column): Seq[Column] = Seq(
    element.cast("string").as("element"),
    lit("").as("payload"),
    lit(2).as("version"),
    struct(
      lit(false).as("force"),
      lit(false).as("ping"),
      struct(lit("anyone").as("mode"),
        array().cast("array<struct<jobName:string,gcpProject:string>>")
          .as("recipients"),
        lit(null).cast("struct<jobName:string,gcpProject:string>")
          .as("triggerChildrenOf")).as("intendedRecipients"),
      array().cast(
        "array<struct<timestamp:timestamp,jobName:string,gcpProject:string>>")
        .as("jobAuditLog")).as("metadata"))
}
