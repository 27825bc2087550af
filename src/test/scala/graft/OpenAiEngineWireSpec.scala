package graft

import org.scalatest.funsuite.AnyFunSuite

import graft.operators.{JsonSchemaBuild, OpenAiEngineWire}
import graft.operators.JsonSchemaBuild.{EField, TStr, TStruct, TInt64}
import graft.operators.ProviderWires.ApiError

/** The engine's OpenAI arm (openai.rs) — guards, the typed request
  * shapes with omitted Nones, the strict json_schema response format,
  * and both miss errors. */
class OpenAiEngineWireSpec extends AnyFunSuite {

  test("guards: config kind and env key") {
    val e1 = intercept[ApiError](
      OpenAiEngineWire.create(None, Some("VertexAi"), hasApiKey = true))
    assert(e1.getMessage === "unexpected config type, expected OpenAiConfig")
    val e2 = intercept[ApiError](
      OpenAiEngineWire.create(None, None, hasApiKey = false))
    assert(e2.getMessage === "OPENAI_API_KEY environment variable must be set")
    OpenAiEngineWire.create(Some("http://base"), Some("OpenAi"),
      hasApiKey = true)
  }

  test("chat render: plain text, system message, omitted Nones") {
    val bare = OpenAiEngineWire.renderChat("gpt-4o", "extract")
    assert(bare.path === "/v1/chat/completions")
    // no response_format key at all when no schema (skip_serializing_if)
    assert(bare.body ===
      """{"messages":[{"role":"user","content":"extract"}],"model":"gpt-4o"}""")
    val sys = OpenAiEngineWire.renderChat("gpt-4o", "q",
      systemPrompt = Some("terse"))
    assert(sys.body ===
      """{"messages":[{"role":"system","content":"terse"},{"role":"user","content":"q"}],"model":"gpt-4o"}""")
  }

  test("chat render: image part array and the data URL") {
    val png = Array[Byte](0x89.toByte, 'P', 'N', 'G', 0x0d, 0x0a, 0x1a, 0x0a)
    val b64 = java.util.Base64.getEncoder.encodeToString(png)
    assert(OpenAiEngineWire.imageDataUrl(png) ===
      s"data:image/png;base64,$b64")
    val req = OpenAiEngineWire.renderChat("gpt-4o", "what is this",
      image = Some(png))
    assert(req.body ===
      s"""{"messages":[{"role":"user","content":[{"type":"text","text":"what is this"},{"type":"image_url","image_url":{"url":"data:image/png;base64,$b64","detail":"auto"}}]}],"model":"gpt-4o"}""")
  }

  test("strict json_schema response format composes with the builder") {
    val schema = JsonSchemaBuild.build(
      TStruct(Seq(EField("title", TStr), EField("n", TInt64,
        nullable = true))),
      OpenAiEngineWire.schemaOptions)
    val req = OpenAiEngineWire.renderChat("gpt-4o", "extract",
      schemaName = Some("extraction"), schemaJson = Some(schema.schemaJson))
    // strict mode pairs with required-all + null widening; description
    // is omitted, strict is true; the schema keeps its declaration
    // order (preserve_order to_value — review r14 #2-2)
    assert(req.body.contains(
      """"response_format":{"type":"json_schema","json_schema":{"name":"extraction","schema":{"type":"object","required":["n","title"],"properties":{"n":{"type":["integer","null"]},"title":{"type":"string"}},"additionalProperties":false},"strict":true}}"""))
    val o = OpenAiEngineWire.schemaOptions
    assert(o.fieldsAlwaysRequired && !o.supportsFormat &&
      !o.extractDescriptions && o.topLevelMustBeObject)
  }

  test("embed render and both miss errors") {
    // async_openai's CreateEmbeddingRequest declares model first
    // (review r14 #2-3)
    assert(OpenAiEngineWire.renderEmbed("text-embedding-3-small", "t").body
      === """{"model":"text-embedding-3-small","input":"t"}""")
    assert(OpenAiEngineWire.renderEmbed("text-embedding-3-large", "t",
      Some(256)).body ===
      """{"model":"text-embedding-3-large","input":"t","dimensions":256}""")
    assert(OpenAiEngineWire.parseEmbed(
      """{"data":[{"embedding":[0.25]}]}""").toSeq === Seq(0.25f))
    val e = intercept[IllegalStateException](
      OpenAiEngineWire.parseEmbed("""{"data":[]}"""))
    assert(e.getMessage === "No embedding returned from OpenAI")
    assert(OpenAiEngineWire.parseChat(
      """{"choices":[{"message":{"content":"hi"}}]}""") === "hi")
    val e2 = intercept[IllegalStateException](
      OpenAiEngineWire.parseChat("""{"choices":[{"message":{}}]}"""))
    assert(e2.getMessage === "No response from OpenAI")
    assert(OpenAiEngineWire.defaultEmbeddingDimension(
      "text-embedding-3-small") === Some(1536))
    assert(OpenAiEngineWire.defaultEmbeddingDimension(
      "text-embedding-3-large") === Some(3072))
    assert(OpenAiEngineWire.defaultEmbeddingDimension(
      "text-embedding-ada-002") === Some(1536))
    assert(OpenAiEngineWire.defaultEmbeddingDimension("nomic") === None)
  }
}
