package graft

import org.scalatest.funsuite.AnyFunSuite

import graft.operators.JsonSchemaBuild
import graft.operators.JsonSchemaBuild._
import graft.operators.{AnthropicWire, OllamaWire}
import graft.operators.ProviderWires.JsonSchemaOptions

/** The output-schema builder (src/base/json_schema.rs): per-type
  * shapes, per-provider option behavior, the extracted-instructions
  * block, the value wrapper, and composition into the wire arms. */
class JsonSchemaBuildSpec extends AnyFunSuite {

  // provider option sets as the clients declare them
  private val anthropic = AnthropicWire.schemaOptions
  private val ollama = OllamaWire.schemaOptions
  private val openaiLike = JsonSchemaOptions(fieldsAlwaysRequired = true,
    supportsFormat = false, extractDescriptions = false,
    topLevelMustBeObject = true)
  private val plain = JsonSchemaOptions(fieldsAlwaysRequired = false,
    supportsFormat = true, extractDescriptions = false,
    topLevelMustBeObject = false)

  test("basic scalars: instance types, formats, builtin descriptions") {
    assert(build(TStr, plain).schemaJson === """{"type":"string"}""")
    assert(build(TBytes, plain).schemaJson === """{"type":"string"}""")
    assert(build(TBool, plain).schemaJson === """{"type":"boolean"}""")
    assert(build(TInt64, plain).schemaJson === """{"type":"integer"}""")
    assert(build(TFloat32, plain).schemaJson === """{"type":"number"}""")
    assert(build(TJson, plain).schemaJson === """{}""")
    // description streams FIRST (the metadata flatten), then type,
    // then format — and format only when the provider supports it
    assert(build(TUuid, plain).schemaJson ===
      """{"description":"A UUID, e.g. 123e4567-e89b-12d3-a456-426614174000","type":"string","format":"uuid"}""")
    assert(build(TDate, plain).schemaJson ===
      """{"description":"A date in YYYY-MM-DD format, e.g. 2025-03-27","type":"string","format":"date"}""")
    assert(build(TTimeDelta, plain).schemaJson ===
      """{"description":"A duration, e.g. 'PT1H2M3S' (ISO 8601) or '1 day 2 hours 3 seconds'","type":"string","format":"duration"}""")
    val noFmt = JsonSchemaOptions(fieldsAlwaysRequired = false,
      supportsFormat = false, extractDescriptions = false,
      topLevelMustBeObject = false)
    assert(build(TUuid, noFmt).schemaJson ===
      """{"description":"A UUID, e.g. 123e4567-e89b-12d3-a456-426614174000","type":"string"}""")
  }

  test("range, vector, union, table shapes") {
    assert(build(TRange, plain).schemaJson ===
      """{"description":"A range represented by a list of two positions, start pos (inclusive), end pos (exclusive).","type":"array","items":{"type":"integer"},"maxItems":2,"minItems":2}""")
    assert(build(TVector(TFloat32, Some(3)), plain).schemaJson ===
      """{"type":"array","items":{"type":"number"},"maxItems":3,"minItems":3}""")
    assert(build(TVector(TStr, None), plain).schemaJson ===
      """{"type":"array","items":{"type":"string"}}""")
    assert(build(TUnion(Seq(TStr, TInt64)), plain).schemaJson ===
      """{"oneOf":[{"type":"string"},{"type":"integer"}]}""")
    val table = TTable(TStruct(Seq(EField("id", TInt64),
      EField("name", TStr, nullable = true))))
    assert(build(table, plain).schemaJson ===
      """{"type":"array","items":{"type":"object","required":["id"],"properties":{"id":{"type":"integer"},"name":{"type":"string"}},"additionalProperties":false}}""")
  }

  test("struct: sorted properties/required, null widening per options") {
    val s = TStruct(Seq(
      EField("zeta", TStr),
      EField("alpha", TInt64, nullable = true)),
      description = Some("an extraction"))
    // anthropic options: nullable fields simply drop out of required
    assert(build(s, anthropic).schemaJson ===
      """{"description":"an extraction","type":"object","required":["zeta"],"properties":{"alpha":{"type":"integer"},"zeta":{"type":"string"}},"additionalProperties":false}""")
    // fields_always_required: everything required, nullables widen to
    // ["type","null"] in place
    assert(build(s, openaiLike).schemaJson ===
      """{"description":"an extraction","type":"object","required":["alpha","zeta"],"properties":{"alpha":{"type":["integer","null"]},"zeta":{"type":"string"}},"additionalProperties":false}""")
  }

  test("extract_descriptions diverts to the instructions block " +
    "in traversal order") {
    val s = TStruct(Seq(
      EField("when", TDate),
      EField("inner", TStruct(Seq(EField("id", TUuid)))),
      EField("span", TRange)))
    val out = build(s, ollama)
    // no description keys in the schema itself
    assert(!out.schemaJson.contains("description"))
    assert(out.schemaJson ===
      """{"type":"object","required":["inner","span","when"],"properties":{"inner":{"type":"object","required":["id"],"properties":{"id":{"type":"string","format":"uuid"}},"additionalProperties":false},"span":{"type":"array","items":{"type":"integer"},"maxItems":2,"minItems":2},"when":{"type":"string","format":"date"}},"additionalProperties":false}""")
    // insertion order = declaration order (when, inner.id, span) with
    // dotted root-first paths and the reference's exact framing
    assert(out.extraInstructions === Some(
      "Instructions for specific fields:\n\n" +
        "- when: A date in YYYY-MM-DD format, e.g. 2025-03-27\n\n" +
        "- inner.id: A UUID, e.g. 123e4567-e89b-12d3-a456-426614174000\n\n" +
        "- span: A range represented by a list of two positions, " +
        "start pos (inclusive), end pos (exclusive).\n\n"))
  }

  test("top-level object wrapper for non-struct outputs") {
    // a struct root never wraps
    assert(build(TStruct(Seq(EField("x", TStr))), openaiLike)
      .wrapperField === None)
    // a non-struct under top_level_must_be_object wraps in `value`
    val out = build(TVector(TStr, None), openaiLike)
    assert(out.wrapperField === Some("value"))
    assert(out.schemaJson ===
      """{"type":"object","required":["value"],"properties":{"value":{"type":"array","items":{"type":"string"}}},"additionalProperties":false}""")
    // without the option no wrap happens
    assert(build(TVector(TStr, None), plain).wrapperField === None)
    // extractor face: unwrap, missing → null, non-object → error
    assert(JsonSchemaBuild.unwrap("""{"value":[1,2]}""", Some("value")) ===
      "[1,2]")
    assert(JsonSchemaBuild.unwrap("""{"other":1}""", Some("value")) ===
      "null")
    assert(JsonSchemaBuild.unwrap("""{"value":[1]}""", None) ===
      """{"value":[1]}""")
    val e = intercept[IllegalStateException](
      JsonSchemaBuild.unwrap("[1,2]", Some("value")))
    assert(e.getMessage === "Field `value` not found")
  }

  test("composes into the wire arms") {
    val s = TStruct(Seq(EField("title", TStr),
      EField("score", TFloat64, nullable = true)))
    // anthropic: the built schema rides the report_result tool in its
    // own declaration order (preserve_order to_value)
    val req = AnthropicWire.renderMessages("claude-3", "extract",
      schemaJson = Some(build(s, anthropic).schemaJson))
    assert(req.body.contains(
      """"input_schema":{"type":"object","required":["title"],"properties":{"score":{"type":"number"},"title":{"type":"string"}},"additionalProperties":false}"""))
    // ollama: the format field embeds the streamed text order as-is
    val built = build(s, ollama).schemaJson
    val oreq = OllamaWire.renderGenerate(None, "llama3.2", "extract",
      formatSchemaJson = Some(built))
    assert(oreq.body.contains(""""format":""" + built))
  }

  test("top-level nullability flows into the value wrapper " +
    "(review r14 #2-5)") {
    // nullable non-struct under anthropic options: value drops out of
    // required entirely (empty required is omitted)
    val a = build(TVector(TStr, None), anthropic, topLevelNullable = true)
    assert(a.schemaJson ===
      """{"type":"object","properties":{"value":{"type":"array","items":{"type":"string"}}},"additionalProperties":false}""")
    // under OpenAI strict options it stays required but null-widens
    val o = build(TInt64, openaiLike, topLevelNullable = true)
    assert(o.schemaJson ===
      """{"type":"object","required":["value"],"properties":{"value":{"type":["integer","null"]}},"additionalProperties":false}""")
  }
}
