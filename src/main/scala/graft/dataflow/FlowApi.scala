package graft.dataflow

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** The engine's flow-service projections (src/service/flows.rs:1-256)
  * and per-row indexing status (src/execution/indexing_status.rs:
  * 1-65), in Jobs.trackerStatus style: small deterministic frames and
  * row tiers around state the engine already keeps, plus the exact
  * request-validation error ladders.
  */
object FlowApi {

  /** `GET /flows` (flows.rs:13-19): the registry's flow names. The
    * reference iterates a HashMap — arbitrary order — so the frame
    * sorts for determinism; the CONTENT is the contract. */
  def listFlows(flows: Seq[String]): Seq[String] = flows.sorted

  // -----------------------------------------------------------------
  // get_keys / source-row-key validation ladders
  // -----------------------------------------------------------------

  /** One schema field as the service sees it: does it carry a key
    * (KTable), and is it the output of an import op. */
  final case class FieldInfo(name: String, isTable: Boolean,
      hasKey: Boolean, isSource: Boolean)

  /** `GET /flows/{name}/keys?field=` (flows.rs:67-118): field must
    * exist, have a key type, and be a source output — three graded
    * BAD_REQUEST arms with the reference's messages. */
  def getKeysValidation(fields: Seq[FieldInfo], field: String)
      : Either[String, FieldInfo] =
    fields.find(_.name == field) match {
      case None => Left(s"field not found: $field")
      case Some(f) if !f.hasKey => Left(s"field has no key: $field")
      case Some(f) if !f.isSource => Left(s"field is not a source: $field")
      case Some(f) => Right(f)
    }

  /** SourceRowKeyContextHolder::create (flows.rs:142-176): the
    * evaluate/indexing-status endpoints' stricter ladder — the field
    * must name an IMPORT OP (not any field), be a table, and have a
    * key; then the key parts must parse with none left over
    * (KeyValue::from_strs, value.rs:283-289). */
  def sourceRowKeyValidation(fields: Seq[FieldInfo], field: String,
      keyParts: Int, expectedParts: Int): Either[String, FieldInfo] =
    fields.find(f => f.name == field && f.isSource) match {
      case None => Left(s"source field not found: $field")
      case Some(f) if !f.isTable => Left(s"field is not a table: $field")
      case Some(f) if !f.hasKey =>
        Left(s"field $field does not have a key")
      case Some(_) if keyParts > expectedParts =>
        Left("Key parts more than expected")
      case Some(_) if keyParts < expectedParts =>
        // parts_from_str runs out of iterator (value.rs:225-227)
        Left("Key parts less than expected")
      case Some(f) => Right(f)
    }

  /** evaluate_data's miss (flows.rs:208-213): the key renders in
    * Rust Debug form. [[keyDebug]] gives the derived-Debug text for
    * the key vocabulary. */
  def valueNotFound(keyDebug: String): String =
    s"value not found for source at the specified key: $keyDebug"

  /** Derived Debug of KeyValue (value.rs:85-95): variant name wrapping
    * the payload's Debug — strings escape_debug-quoted, structs as a
    * bracketed list. */
  def keyDebug(key: Vector[graft.incremental.EvaluateDump.KeyPart])
      : String = {
    import graft.incremental.EvaluateDump._
    def one(p: KeyPart): String = p match {
      case KBytes(v) =>
        // bytes::Bytes Debug: b".." with the named escapes for
        // \n \r \t \0 \" \\ and \x.. for other non-printables
        "Bytes(b\"" + v.map {
          case b if b == '\n' => "\\n"
          case b if b == '\r' => "\\r"
          case b if b == '\t' => "\\t"
          case b if b == 0 => "\\0"
          case b if b == '"' => "\\\""
          case b if b == '\\' => "\\\\"
          case b if b >= 0x20 && b < 0x7f => b.toChar.toString
          case b => f"\\x${b & 0xff}%02x"
        }.mkString + "\")"
      case KStr(v) =>
        // str escape_debug: named escapes, then \u{..} for other
        // control chars; printable unicode passes through
        "Str(\"" + v.flatMap {
          case '"' => "\\\""
          case '\\' => "\\\\"
          case '\n' => "\\n"
          case '\t' => "\\t"
          case '\r' => "\\r"
          case '\u0000' => "\\0"
          case c if Character.isISOControl(c) =>
            s"\\u{${Integer.toHexString(c.toInt)}}"
          case c => c.toString
        } + "\")"
      case KBool(v) => s"Bool($v)"
      case KInt(v) => s"Int64($v)"
      case KRange(s, e) => s"Range(RangeValue { start: $s, end: $e })"
      case KUuid(v) => s"Uuid(${v.toLowerCase(java.util.Locale.ROOT)})"
      case KDate(y, m, d) => f"Date($y%04d-$m%02d-$d%02d)"
    }
    if (key.length == 1) one(key.head)
    else key.map(one).mkString("Struct([", ", ", "])")
  }

  // -----------------------------------------------------------------
  // Indexing status (indexing_status.rs:1-65)
  // -----------------------------------------------------------------

  /** The per-row status frame: `current` rows (source_key, ordinal —
    * the live source listing) LEFT JOIN `tracking` (the incremental
    * tracking table: source_key, ordinal, logic_fp, optional
    * process_time_micros) →
    *
    *  - last_ordinal / processing_time: the tracking row's, null when
    *    the row was never processed (last_processed = None);
    *  - is_logic_current: stored fingerprint == the CURRENT plan's
    *    (indexing_status.rs:53-54), null when never processed;
    *  - current_ordinal: the live ordinal; a null live ordinal is the
    *    reference's "Ordinal is unavailable for the source" error,
    *    carried per-row in `err` (the API serves one row per call —
    *    the frame is the batch of those calls).
    *
    * One broadcast-able equi-join on source_key; both sides are
    * key-sized, and at 100 TB the tracking table is already
    * key-partitioned by the incremental tier. */
  def indexingStatus(current: DataFrame, tracking: DataFrame,
      planLogicFp: String): DataFrame = {
    val t = tracking.select(
      col("source_key"),
      col("ordinal").as("last_ordinal"),
      (if (tracking.columns.contains("process_time_micros"))
        timestamp_micros(col("process_time_micros"))
      else lit(null).cast("timestamp")).as("processing_time"),
      (col("logic_fp") === lit(planLogicFp)).as("is_logic_current"))
    current.select(col("source_key"), col("ordinal").as("current_ordinal"))
      .join(t, Seq("source_key"), "left")
      .select(col("source_key"), col("last_ordinal"), col("processing_time"),
        col("is_logic_current"), col("current_ordinal"),
        when(col("current_ordinal").isNull,
          lit("Ordinal is unavailable for the source"))
          .otherwise(lit(null).cast("string")).as("err"))
  }

  // -----------------------------------------------------------------
  // Server surface (src/server.rs:1-90)
  // -----------------------------------------------------------------

  /** The engine server's fixed vocabulary: the route table under
    * `/cocoindex/api`, the health banner, the CORS policy applied
    * only when origins are configured, and the bind/startup text. */
  object Server {
    val HealthRoute = "/cocoindex"
    val HealthBanner = "CocoIndex is running!"
    /** method → path (under /cocoindex/api), registration order. */
    val ApiRoutes: Seq[(String, String)] = Seq(
      "GET" -> "/flows",
      "GET" -> "/flows/{flowInstName}",
      "GET" -> "/flows/{flowInstName}/schema",
      "GET" -> "/flows/{flowInstName}/keys",
      "GET" -> "/flows/{flowInstName}/data",
      "GET" -> "/flows/{flowInstName}/rowStatus",
      "POST" -> "/flows/{flowInstName}/update")
    /** CORS applies ONLY with configured origins (server.rs:24-37). */
    val CorsAllowedMethods = Seq("GET", "POST", "DELETE")
    val CorsAllowedHeaders = Seq("content-type")
    def bindError(address: String): String =
      s"Failed to bind to address: $address"
    def startupBanner(localAddr: String): String =
      s"Server running at http://$localAddr/cocoindex"
  }

  // -----------------------------------------------------------------
  // Fingerprint faces (src/utils/fingerprint.rs:33-54)
  // -----------------------------------------------------------------

  /** The 128-bit flow fingerprint's codec faces. (The digest itself is
    * Blake2b-128 over a bespoke serde byte stream — the VALUE is not
    * re-derived here, only the encode/decode contract around it.) */
  object Fingerprint {
    def toBase64(bytes: Array[Byte]): String = {
      require(bytes.length == 16, "Fingerprint is 16 bytes")
      java.util.Base64.getEncoder.encodeToString(bytes)
    }

    /** from_base64 (fingerprint.rs:41-54): 24 chars → base64, 32 →
      * legacy hex (≤ v0.1.2), anything else the length error; a
      * decoded payload that is not 16 bytes is the bytes-length
      * error. */
    def fromBase64(s: String): Array[Byte] = {
      val bytes = s.length match {
        case 24 => java.util.Base64.getDecoder.decode(s)
        case 32 =>
          s.grouped(2).map(h => Integer.parseInt(h, 16).toByte).toArray
        case n => throw new IllegalArgumentException(
          s"Encoded fingerprint length is unexpected: $n")
      }
      if (bytes.length != 16)
        throw new IllegalArgumentException(
          s"Fingerprint bytes length is unexpected: ${bytes.length}")
      bytes
    }
  }
}
