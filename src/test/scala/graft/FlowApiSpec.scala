package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.dataflow.FlowApi
import graft.dataflow.FlowApi.FieldInfo
import graft.incremental.EvaluateDump._

/** Flow-service projections (flows.rs) + per-row indexing status
  * (indexing_status.rs) + the fingerprint codec faces. */
class FlowApiSpec extends AnyFunSuite {
  lazy val spark = TestSession.spark

  private val fields = Seq(
    FieldInfo("documents", isTable = true, hasKey = true, isSource = true),
    FieldInfo("chunks", isTable = true, hasKey = true, isSource = false),
    FieldInfo("summary", isTable = false, hasKey = false, isSource = false),
    FieldInfo("events", isTable = true, hasKey = false, isSource = true))

  test("list_flows returns the registry names (sorted for determinism)") {
    assert(FlowApi.listFlows(Seq("rag", "ingest", "archive")) ===
      Seq("archive", "ingest", "rag"))
  }

  test("get_keys ladder: not-found, no-key, not-a-source") {
    assert(FlowApi.getKeysValidation(fields, "nope") ===
      Left("field not found: nope"))
    assert(FlowApi.getKeysValidation(fields, "summary") ===
      Left("field has no key: summary"))
    assert(FlowApi.getKeysValidation(fields, "chunks") ===
      Left("field is not a source: chunks"))
    assert(FlowApi.getKeysValidation(fields, "documents") ===
      Right(fields.head))
  }

  test("source-row-key ladder: the stricter evaluate/status arms") {
    // the field search here is over IMPORT OPS: a non-source field is
    // "source field not found", not "not a source"
    assert(FlowApi.sourceRowKeyValidation(fields, "chunks", 1, 1) ===
      Left("source field not found: chunks"))
    assert(FlowApi.sourceRowKeyValidation(fields, "events", 1, 1) ===
      Left("field events does not have a key"))
    assert(FlowApi.sourceRowKeyValidation(fields, "documents", 2, 1) ===
      Left("Key parts more than expected"))
    // too FEW parts fail too — parts_from_str runs out (review r14 #5)
    assert(FlowApi.sourceRowKeyValidation(fields, "documents", 1, 2) ===
      Left("Key parts less than expected"))
    assert(FlowApi.sourceRowKeyValidation(fields, "documents", 1, 1) ===
      Right(fields.head))
  }

  test("value-not-found renders the key's Debug form") {
    assert(FlowApi.keyDebug(Vector(KInt(5))) === "Int64(5)")
    assert(FlowApi.keyDebug(Vector(KStr("a\"b"))) === "Str(\"a\\\"b\")")
    assert(FlowApi.keyDebug(Vector(KBool(true))) === "Bool(true)")
    assert(FlowApi.keyDebug(Vector(KRange(2, 9))) ===
      "Range(RangeValue { start: 2, end: 9 })")
    assert(FlowApi.keyDebug(Vector(KBytes(Seq('H'.toByte, 0.toByte)))) ===
      "Bytes(b\"H\\0\")")
    assert(FlowApi.keyDebug(Vector(KStr("d"), KInt(3))) ===
      "Struct([Str(\"d\"), Int64(3)])")
    assert(FlowApi.valueNotFound(FlowApi.keyDebug(Vector(KInt(5)))) ===
      "value not found for source at the specified key: Int64(5)")
    // review r14 #3: bytes Debug uses the NAMED escapes for
    // \n \r \t \0 \" \\ (not \x..); str escape_debug uses \u{..}
    assert(FlowApi.keyDebug(Vector(KBytes(Seq('\n'.toByte, '"'.toByte,
      0.toByte, '\t'.toByte, 0x7f.toByte)))) ===
      "Bytes(b\"\\n\\\"\\0\\t\\x7f\")")
    assert(FlowApi.keyDebug(Vector(KStr("a\u0001b\u0000"))) ===
      "Str(\"a\\u{1}b\\0\")")
  }

  test("fingerprint codec faces: 24=base64, 32=legacy hex, else error") {
    val bytes = (0 until 16).map(_.toByte).toArray
    val b64 = FlowApi.Fingerprint.toBase64(bytes)
    assert(b64.length === 24)
    assert(FlowApi.Fingerprint.fromBase64(b64).toSeq === bytes.toSeq)
    val hex = bytes.map(b => f"${b & 0xff}%02x").mkString
    assert(hex.length === 32)
    assert(FlowApi.Fingerprint.fromBase64(hex).toSeq === bytes.toSeq)
    val e = intercept[IllegalArgumentException](
      FlowApi.Fingerprint.fromBase64("short"))
    assert(e.getMessage === "Encoded fingerprint length is unexpected: 5")
    // 24 chars decoding to != 16 bytes can't happen with strict
    // padding; the bytes-length arm guards the hex path's impossible
    // twin and stays for fidelity
  }

  test("indexing status: left join, logic-current flag, ordinal error") {
    import spark.implicits._
    val current = Seq(("k1", Some(10L)), ("k2", Some(20L)),
      ("k3", None: Option[Long]))
      .toDF("source_key", "ordinal")
    val tracking = Seq(("k1", 9L, "fpA", 1700000000000001L),
      ("kX", 5L, "fpA", 1700000000000002L),
      ("k2", 20L, "fpB", 1700000000000003L))
      .toDF("source_key", "ordinal", "logic_fp", "process_time_micros")
    val out = FlowApi.indexingStatus(current, tracking, "fpA")
      .orderBy("source_key")
      .select(col("source_key"), col("last_ordinal"),
        unix_micros(col("processing_time")).as("pt"),
        col("is_logic_current"), col("current_ordinal"), col("err"))
      .collect()
      .map(r => (r.getString(0),
        if (r.isNullAt(1)) -1L else r.getLong(1),
        if (r.isNullAt(2)) -1L else r.getLong(2),
        if (r.isNullAt(3)) "null" else r.getBoolean(3).toString,
        if (r.isNullAt(4)) -1L else r.getLong(4),
        if (r.isNullAt(5)) "null" else r.getString(5)))
    assert(out.toSeq === Seq(
      ("k1", 9L, 1700000000000001L, "true", 10L, "null"),
      ("k2", 20L, 1700000000000003L, "false", 20L, "null"),
      // never-processed current row with no live ordinal: the
      // reference's per-row error, last_processed absent
      ("k3", -1L, -1L, "null", -1L, "Ordinal is unavailable for the source")))
  }

  test("server surface: routes, banner, CORS, bind text") {
    import FlowApi.Server
    assert(Server.HealthRoute === "/cocoindex")
    assert(Server.HealthBanner === "CocoIndex is running!")
    assert(Server.ApiRoutes === Seq(
      "GET" -> "/flows",
      "GET" -> "/flows/{flowInstName}",
      "GET" -> "/flows/{flowInstName}/schema",
      "GET" -> "/flows/{flowInstName}/keys",
      "GET" -> "/flows/{flowInstName}/data",
      "GET" -> "/flows/{flowInstName}/rowStatus",
      "POST" -> "/flows/{flowInstName}/update"))
    assert(Server.CorsAllowedMethods === Seq("GET", "POST", "DELETE"))
    assert(Server.CorsAllowedHeaders === Seq("content-type"))
    assert(Server.bindError("0.0.0.0:99999") ===
      "Failed to bind to address: 0.0.0.0:99999")
    assert(Server.startupBanner("127.0.0.1:49344") ===
      "Server running at http://127.0.0.1:49344/cocoindex")
  }

  test("indexing status without a process_time column stays null") {
    import spark.implicits._
    val current = Seq(("k1", 10L)).toDF("source_key", "ordinal")
    val tracking = Seq(("k1", 9L, "fpA", Array("t")))
      .toDF("source_key", "ordinal", "logic_fp", "target_keys")
    val r = FlowApi.indexingStatus(current, tracking, "fpA").collect().head
    assert(r.getAs[Any]("processing_time") === null)
    assert(r.getAs[Boolean]("is_logic_current") === true)
  }
}
