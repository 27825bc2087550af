package graft

import org.scalatest.funsuite.AnyFunSuite

import graft.operators.GeminiEngineWire
import graft.operators.GeminiEngineWire.VertexAi
import graft.operators.ProviderWires.ApiError

/** The engine's Gemini arms (gemini.rs) — the AI-Studio REST payloads
  * with the query-string key, the additionalProperties strip, the
  * Vertex path/instance shapes, and both extraction ladders. */
class GeminiEngineWireSpec extends AnyFunSuite {

  test("ai studio: guards and the query-string key url") {
    val e1 = intercept[ApiError](
      GeminiEngineWire.create(Some("http://proxy"), Some("k")))
    assert(e1.getMessage === "Gemini doesn't support custom API address")
    val e2 = intercept[ApiError](GeminiEngineWire.create(None, None))
    assert(e2.getMessage === "GEMINI_API_KEY environment variable must be set")
    // model and key both url-encode INTO the URL
    assert(GeminiEngineWire.apiUrl("gemini-2.0-flash", "generateContent",
      "k ey/1") ===
      "https://generativelanguage.googleapis.com/v1beta/models/" +
        "gemini-2.0-flash:generateContent?key=k%20ey%2F1")
  }

  test("ai studio: generateContent payload — insertion order, " +
    "swap-removed additionalProperties (review r14 #2-1)") {
    val req = GeminiEngineWire.renderGenerateContent("gemini-2.0-flash",
      "key", "extract this", systemPrompt = Some("be terse"),
      schemaJson = Some(
        """{"type":"object","properties":{"a":{"type":"string"}},"additionalProperties":false,"required":["a"]}"""))
    assert(req.path.endsWith("models/gemini-2.0-flash:generateContent?key=key"))
    // json! literal order (role, parts); systemInstruction appended
    // BEFORE generationConfig; additionalProperties swap-removed from
    // the middle — the LAST key ("required") moves into its slot
    assert(req.body ===
      """{"contents":[{"role":"user","parts":[{"text":"extract this"}]}],""" +
      """"systemInstruction":{"parts":[{"text":"be terse"}]},""" +
      """"generationConfig":{"responseMimeType":"application/json",""" +
      """"responseSchema":{"type":"object","properties":{"a":{"type":"string"}},"required":["a"]}}}""")
    // the swap-remove visibly reorders when additionalProperties sits
    // mid-map: {type, additionalProperties, required} → {type, required}
    // with required moved INTO the removed slot (order unchanged here),
    // but {additionalProperties, type, required} → {required, type}
    val swapped = GeminiEngineWire.renderGenerateContent("m", "k", "p",
      schemaJson = Some(
        """{"additionalProperties":false,"type":"object","required":[]}"""))
    assert(swapped.body.contains(
      """"responseSchema":{"required":[],"type":"object"}"""))
    // image part comes AFTER the text part (the reverse of Anthropic);
    // inlineData is mimeType-then-data
    val png = Array[Byte](0x89.toByte, 'P', 'N', 'G', 0x0d, 0x0a, 0x1a, 0x0a)
    val b64 = java.util.Base64.getEncoder.encodeToString(png)
    val imgReq = GeminiEngineWire.renderGenerateContent("m", "k", "what",
      image = Some(png))
    assert(imgReq.body ===
      s"""{"contents":[{"role":"user","parts":[{"text":"what"},{"inlineData":{"mimeType":"image/png","data":"$b64"}}]}]}""")
  }

  test("ai studio: extraction ladder and http error") {
    assert(GeminiEngineWire.parseGenerateContent(
      """{"candidates":[{"content":{"parts":[{"text":"answer"}]}}]}""") ===
      "answer")
    val err = intercept[IllegalStateException](
      GeminiEngineWire.parseGenerateContent(
        """{"error":{"code":429},"candidates":[]}"""))
    // the {:?} interpolation renders serde Value's Debug form
    assert(err.getMessage ===
      """Gemini API error: Object {"code": Number(429)}""")
    val none = intercept[IllegalStateException](
      GeminiEngineWire.parseGenerateContent(
        """{"candidates":[{"content":{"parts":[{"text":7}]}}]}"""))
    assert(none.getMessage === "No text in response")
    assert(GeminiEngineWire.httpError(500, "boom") ===
      "Gemini API error: 500\nboom\n")
    val o = GeminiEngineWire.schemaOptions
    assert(!o.fieldsAlwaysRequired && !o.supportsFormat &&
      !o.extractDescriptions && o.topLevelMustBeObject)
  }

  test("ai studio: embedContent payload, response, dimension ladder") {
    val req = GeminiEngineWire.renderEmbedContent("text-embedding-004",
      "key", "some text", Some("RETRIEVAL_DOCUMENT"))
    assert(req.path.endsWith("models/text-embedding-004:embedContent?key=key"))
    // json!({model, content}) + appended taskType — insertion order
    assert(req.body ===
      """{"model":"text-embedding-004","content":{"parts":[{"text":"some text"}]},"taskType":"RETRIEVAL_DOCUMENT"}""")
    assert(GeminiEngineWire.parseEmbedContent(
      """{"embedding":{"values":[0.5,-1.0]}}""").toSeq === Seq(0.5f, -1.0f))
    assert(GeminiEngineWire.defaultEmbeddingDimension(
      "gemini-embedding-001") === Some(3072))
    assert(GeminiEngineWire.defaultEmbeddingDimension(
      "Text-Embedding-004") === Some(768))
    assert(GeminiEngineWire.defaultEmbeddingDimension("embedding-001") ===
      Some(768))
    assert(GeminiEngineWire.defaultEmbeddingDimension(
      "text-multilingual-embedding-002") === Some(768))
    assert(GeminiEngineWire.defaultEmbeddingDimension("mxbai") === None)
  }

  test("vertex: guards, model path, instance/parameter shapes") {
    val e1 = intercept[ApiError](VertexAi.create(Some("addr"), true))
    assert(e1.getMessage ===
      "VertexAi API address is not supported for VertexAi API type")
    val e2 = intercept[ApiError](VertexAi.create(None, false))
    assert(e2.getMessage ===
      "VertexAi API config is required for VertexAi API type")
    VertexAi.create(None, true)
    assert(VertexAi.modelPath("proj-1", None, "gemini-2.0-flash") ===
      "projects/proj-1/locations/global/publishers/google/models/gemini-2.0-flash")
    assert(VertexAi.modelPath("p", Some("us-central1"), "m") ===
      "projects/p/locations/us-central1/publishers/google/models/m")
    // snake_case task_type here, camelCase taskType on AI Studio
    assert(VertexAi.embedInstance("txt", Some("RETRIEVAL_QUERY")) ===
      """{"content":"txt","task_type":"RETRIEVAL_QUERY"}""")
    assert(VertexAi.embedInstance("txt", None) === """{"content":"txt"}""")
    assert(VertexAi.embedParameters(Some(256)) ===
      """{"outputDimensionality":256}""")
    assert(VertexAi.embedParameters(None) === "{}")
    assert(VertexAi.parsePredictEmbeddings(
      """{"predictions":[{"embeddings":{"values":[1.5]}}]}""").toSeq ===
      Seq(1.5f))
    val miss = intercept[IllegalStateException](
      VertexAi.parsePredictEmbeddings("""{"predictions":[{}]}"""))
    assert(miss.getMessage === "No embeddings in response")
  }
}
