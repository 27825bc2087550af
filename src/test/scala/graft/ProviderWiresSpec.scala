package graft

import org.scalatest.funsuite.AnyFunSuite

import graft.operators.{AnthropicWire, LlmApiDispatch, OllamaWire,
  OpenAiCompatShims, ProviderWires, VoyageWire}
import graft.operators.ProviderWires.ApiError

/** The engine's remaining provider arms (anthropic.rs / ollama.rs /
  * voyage.rs / the three OpenAI-compatible shims / the mod.rs
  * dispatcher): payload bytes, constructor guards, extraction ladders,
  * schema options. serde_json without preserve_order sorts json!-map
  * keys; derive structs keep declaration order — both pinned here. */
class ProviderWiresSpec extends AnyFunSuite {

  // ----------------------------------------------------------------
  // Anthropic
  // ----------------------------------------------------------------

  test("anthropic: constructor guards and the url-encoded key header") {
    val e1 = intercept[ApiError](
      AnthropicWire.create(Some("http://proxy"), Some("k")))
    assert(e1.getMessage === "Anthropic doesn't support custom API address")
    val e2 = intercept[ApiError](AnthropicWire.create(None, None))
    assert(e2.getMessage ===
      "ANTHROPIC_API_KEY environment variable must be set")
    val headers = AnthropicWire.create(None, Some("sk-ant api/01+x~_."))
    // urlencoding::encode: unreserved [A-Za-z0-9-_.~] pass, the rest
    // percent-encode with uppercase hex
    assert(headers("x-api-key") === "sk-ant%20api%2F01%2Bx~_.")
    assert(headers("anthropic-version") === "2023-06-01")
  }

  test("anthropic: messages payload keeps json! insertion order " +
    "(preserve_order serde — review r14 #2-1)") {
    val req = AnthropicWire.renderMessages("claude-3-5-sonnet",
      "extract", systemPrompt = Some("be terse"),
      schemaJson = Some("""{"type":"object","properties":{"b":{},"a":{}}}"""))
    assert(req.path === "https://api.anthropic.com/v1/messages")
    // the json! literal's order (model, messages, max_tokens) with
    // system and tools APPENDED; the schema rides with ITS OWN order
    assert(req.body ===
      """{"model":"claude-3-5-sonnet","messages":[{"role":"user","content":[{"type":"text","text":"extract"}]}],"max_tokens":4096,"system":"be terse","tools":[{"type":"custom","name":"report_result","input_schema":{"type":"object","properties":{"b":{},"a":{}}}}]}""")
  }

  test("anthropic: image block precedes text, media_type sniffed") {
    val png = Array[Byte](0x89.toByte, 'P', 'N', 'G', 0x0d, 0x0a, 0x1a, 0x0a)
    val req = AnthropicWire.renderMessages("claude-3-haiku", "describe",
      image = Some(png), schemaJson = Some("""{"type":"object"}"""))
    val b64 = java.util.Base64.getEncoder.encodeToString(png)
    assert(req.body.contains(
      s"""{"role":"user","content":[{"type":"image","source":{"type":"base64","media_type":"image/png","data":"$b64"}},{"type":"text","text":"describe"}]}"""))
    // jpeg magic
    assert(ProviderWires.detectImageMime(
      Array[Byte](0xff.toByte, 0xd8.toByte, 0xff.toByte, 0xe0.toByte)) ===
      "image/jpeg")
    val bad = intercept[IllegalStateException](
      ProviderWires.detectImageMime(Array[Byte](1, 2, 3, 4)))
    assert(bad.getMessage === "Unknown or unsupported image format")
  }

  test("anthropic: missing JSON schema is the api_bail") {
    val e = intercept[ApiError](
      AnthropicWire.renderMessages("claude-3", "p"))
    assert(e.getMessage ===
      "Anthropic client expects OutputFormat::JsonSchema for all requests")
  }

  test("anthropic: tool_use input wins, re-serialized in ITS order") {
    val body =
      """{"content":[
        |  {"type":"text","text":"preamble"},
        |  {"type":"tool_use","name":"other_tool","input":{"x":1}},
        |  {"type":"tool_use","name":"report_result","input":{"b":2,"a":[1,2]}}
        |]}""".stripMargin
    // preserve_order serde keeps the response's own key order
    assert(AnthropicWire.parseResponse(body) === """{"b":2,"a":[1,2]}""")
  }

  test("anthropic: text fallback — strict JSON verbatim, json5 kept " +
    "in parse order") {
    // strict JSON passes through UNCHANGED (std::mem::take), key order
    // and spacing preserved
    val strict = """{"content":[{"type":"text","text":"{\"z\": 1, \"a\": 2}"}]}"""
    assert(AnthropicWire.parseResponse(strict) === """{"z": 1, "a": 2}""")
    // json5-only input re-serializes through the permissive parser,
    // keeping its own order
    val json5 =
      """{"content":[{"type":"text","text":"{z: 1, a: 2,}"}]}"""
    assert(AnthropicWire.parseResponse(json5) === """{"z":1,"a":2}""")
    // neither: the two-error frame
    val neither = """{"content":[{"type":"text","text":"not json at all"}]}"""
    val e = intercept[IllegalStateException](
      AnthropicWire.parseResponse(neither))
    assert(e.getMessage.startsWith("No structured tool output or text " +
      "found in response, and permissive JSON5 parsing also failed: "))
    // non-string text / empty content: the short error
    val short = intercept[IllegalStateException](
      AnthropicWire.parseResponse("""{"content":[{"type":"text","text":7}]}"""))
    assert(short.getMessage ===
      "No structured tool output or text found in response")
    // an error field raises the API-error arm before any extraction,
    // rendered as serde Value's Debug form (the {:?} interpolation)
    val err = intercept[IllegalStateException](AnthropicWire.parseResponse(
      """{"error":{"type":"overloaded_error"},"content":[]}"""))
    assert(err.getMessage ===
      """Anthropic API error: Object {"type": String("overloaded_error")}""")
  }

  test("rust Value debug rendering (the {:?} error interpolations)") {
    import graft.operators.ProviderWires.rustValueDebug
    assert(rustValueDebug("""{"code":429}""") ===
      """Object {"code": Number(429)}""")
    assert(rustValueDebug("""[1,"x",null,true,2.5]""") ===
      """Array [Number(1), String("x"), Null, Bool(true), Number(2.5)]""")
    assert(rustValueDebug(""""a\"b"""") === "String(\"a\\\"b\")")
  }

  test("anthropic: strict parse is whole-input (review r14 #2)") {
    // trailing prose after valid JSON: serde_json rejects, json5
    // rejects too → the two-error frame, NOT a verbatim passthrough
    val trailing =
      """{"content":[{"type":"text","text":"{\"a\":1} Hope this helps!"}]}"""
    val e = intercept[IllegalStateException](
      AnthropicWire.parseResponse(trailing))
    assert(e.getMessage.startsWith(
      "No structured tool output or text found in response, and "))
    // empty text is not strict JSON either
    val empty = """{"content":[{"type":"text","text":""}]}"""
    val e2 = intercept[IllegalStateException](
      AnthropicWire.parseResponse(empty))
    assert(e2.getMessage.startsWith(
      "No structured tool output or text found in response, and "))
  }

  test("anthropic: non-2xx raises the status+body error (review r14 #1)") {
    import graft.operators.OpenAiWire.{OpenAiHttp, OpenAiRequest,
      OpenAiResponse}
    final case class FixedApi(status: Int) extends OpenAiHttp {
      var posts = 0
      override def post(req: OpenAiRequest): OpenAiResponse = {
        posts += 1
        OpenAiResponse(status, Some(1), s"err-body-$status")
      }
    }
    // non-retryable 400: one post, the Anthropic-branded error
    val api400 = FixedApi(400)
    val c400 = AnthropicWire.AnthropicClient(() => api400, "claude-3",
      "key", schemaJson = Some("""{"type":"object"}"""), sleeper = _ => ())
    val e = intercept[IllegalStateException](c400.generate("p"))
    assert(e.getMessage === "Anthropic API error: 400\nerr-body-400\n")
    assert(api400.posts === 1)
    // retryable 429 exhausts the 3 attempts, then the same error shape
    val api429 = FixedApi(429)
    val c429 = AnthropicWire.AnthropicClient(() => api429, "claude-3",
      "key", schemaJson = Some("""{"type":"object"}"""), sleeper = _ => ())
    val e2 = intercept[IllegalStateException](c429.generate("p"))
    assert(e2.getMessage === "Anthropic API error: 429\nerr-body-429\n")
    assert(api429.posts === 3)
  }

  test("canonical re-serialization renders floats in serde_json text " +
    "(review r14 #4)") {
    import graft.operators.ProviderWires.serdeFloatText
    assert(serdeFloatText(1.0e9) === "1000000000.0")
    assert(serdeFloatText(1.0e7) === "10000000.0")
    assert(serdeFloatText(2.5) === "2.5")
    assert(serdeFloatText(0.001) === "0.001")
    assert(serdeFloatText(0.0) === "0.0")
    assert(serdeFloatText(-0.0) === "-0.0")
    assert(serdeFloatText(1.0e16) === "1e16")
    assert(serdeFloatText(1.23e20) === "1.23e20")
    assert(serdeFloatText(1.0e-6) === "1e-6")
    assert(serdeFloatText(-3.5e17) === "-3.5e17")
    // through the request render: no Java E-notation in the body and
    // the schema's key order kept
    val req = AnthropicWire.renderMessages("m", "p",
      schemaJson = Some("""{"x":2.5,"maximum":1e9}"""))
    assert(req.body.contains(""""input_schema":{"x":2.5,"maximum":1000000000.0}"""))
    // and through tool-input extraction
    val body =
      """{"content":[{"type":"tool_use","name":"report_result","input":{"count":10000000.0}}]}"""
    assert(AnthropicWire.parseResponse(body) === """{"count":10000000.0}""")
  }

  test("anthropic: schema options") {
    val o = AnthropicWire.schemaOptions
    assert(!o.fieldsAlwaysRequired && !o.supportsFormat &&
      !o.extractDescriptions && o.topLevelMustBeObject)
  }

  // ----------------------------------------------------------------
  // Ollama
  // ----------------------------------------------------------------

  test("ollama: address default and trailing-slash trim") {
    assert(OllamaWire.endpoints(None) ===
      ("http://localhost:11434/api/generate",
        "http://localhost:11434/api/embed"))
    assert(OllamaWire.endpoints(Some("http://gpu-box:11434///")) ===
      ("http://gpu-box:11434/api/generate", "http://gpu-box:11434/api/embed"))
  }

  test("ollama: generate payload is declaration-ordered with nulls") {
    val bare = OllamaWire.renderGenerate(None, "llama3.2", "hello")
    assert(bare.path === "http://localhost:11434/api/generate")
    assert(bare.body ===
      """{"model":"llama3.2","prompt":"hello","images":null,"format":null,"system":null,"stream":false}""")
    val img = Array[Byte](1, 2, 3)
    val full = OllamaWire.renderGenerate(Some("http://h:1/"), "llava",
      "what is this", images = Some(Seq(img)),
      formatSchemaJson = Some("""{"type":"object"}"""),
      system = Some("sys"))
    assert(full.body ===
      """{"model":"llava","prompt":"what is this","images":["AQID"],"format":{"type":"object"},"system":"sys","stream":false}""")
    assert(OllamaWire.parseGenerate("""{"response":"out","done":true}""") ===
      "out")
  }

  test("ollama: embed payload, response, and the dimension table") {
    val req = OllamaWire.renderEmbed(None, "nomic-embed-text", "txt")
    assert(req.path === "http://localhost:11434/api/embed")
    assert(req.body === """{"model":"nomic-embed-text","input":"txt"}""")
    assert(OllamaWire.parseEmbed("""{"embedding":[0.5,-1.25]}""").toSeq ===
      Seq(0.5f, -1.25f))
    assert(OllamaWire.defaultEmbeddingDimension("BGE-M3") === Some(1024))
    assert(OllamaWire.defaultEmbeddingDimension("granite-embedding:278m") ===
      Some(768))
    assert(OllamaWire.defaultEmbeddingDimension("granite-embedding") ===
      Some(384))
    assert(OllamaWire.defaultEmbeddingDimension("all-MiniLM") === Some(384))
    assert(OllamaWire.defaultEmbeddingDimension("gpt-oss") === None)
    val o = OllamaWire.schemaOptions
    assert(!o.fieldsAlwaysRequired && o.supportsFormat &&
      o.extractDescriptions && !o.topLevelMustBeObject)
  }

  // ----------------------------------------------------------------
  // Voyage
  // ----------------------------------------------------------------

  test("voyage: guards, sorted payload, data[0] extraction, dims") {
    val e1 = intercept[ApiError](VoyageWire.create(Some("http://x"), Some("k")))
    assert(e1.getMessage === "Voyage AI doesn't support custom API address")
    val e2 = intercept[ApiError](VoyageWire.create(None, None))
    assert(e2.getMessage === "VOYAGE_API_KEY environment variable must be set")
    assert(VoyageWire.create(None, Some("vk")) === "Bearer vk")

    val bare = VoyageWire.renderEmbed("voyage-3.5", "some text")
    assert(bare.path === "https://api.voyageai.com/v1/embeddings")
    assert(bare.body === """{"input":"some text","model":"voyage-3.5"}""")
    // input_type APPENDS after the json! literal (insertion order)
    val task = VoyageWire.renderEmbed("voyage-code-3", "q", Some("query"))
    assert(task.body ===
      """{"input":"q","model":"voyage-code-3","input_type":"query"}""")

    assert(VoyageWire.parseEmbed(
      """{"data":[{"embedding":[1.0,2.5]},{"embedding":[9.0]}]}""").toSeq ===
      Seq(1.0f, 2.5f))
    val empty = intercept[IllegalStateException](
      VoyageWire.parseEmbed("""{"data":[]}"""))
    assert(empty.getMessage === "No embedding data in response")

    assert(VoyageWire.defaultEmbeddingDimension("voyage-code-2") ===
      Some(1536))
    assert(VoyageWire.defaultEmbeddingDimension("voyage-3-lite") === Some(512))
    assert(VoyageWire.defaultEmbeddingDimension("voyage-large-2") ===
      Some(1536))
    assert(VoyageWire.DefaultDimensions.size === 18)
    assert(VoyageWire.DefaultDimensions.values.forall(
      v => v == 512 || v == 1024 || v == 1536))
    assert(VoyageWire.defaultEmbeddingDimension("Voyage-3.5") === None)
  }

  // ----------------------------------------------------------------
  // OpenAI-compatible shims + dispatcher
  // ----------------------------------------------------------------

  test("shims: base-URL defaults and env key names") {
    import OpenAiCompatShims._
    assert(litellm(None, Map.empty) ===
      CompatConfig("http://127.0.0.1:4000", None))
    assert(litellm(Some("http://lb:4000"), Map("LITELLM_API_KEY" -> "a")) ===
      CompatConfig("http://lb:4000", Some("a")))
    assert(openrouter(None, Map("OPENROUTER_API_KEY" -> "o")) ===
      CompatConfig("https://openrouter.ai/api/v1", Some("o")))
    assert(vllm(None, Map.empty) ===
      CompatConfig("http://127.0.0.1:8000/v1", None))
    // the wrong env var never leaks across shims
    assert(vllm(None, Map("LITELLM_API_KEY" -> "a")) ===
      CompatConfig("http://127.0.0.1:8000/v1", None))
  }

  test("dispatcher: the nine api types and the unsupported-pairing bails") {
    assert(LlmApiDispatch.ApiTypes === Seq("Ollama", "OpenAi", "Gemini",
      "Anthropic", "LiteLlm", "OpenRouter", "Voyage", "Vllm", "VertexAi"))
    // generation: everything but Voyage
    LlmApiDispatch.ApiTypes.filterNot(_ == "Voyage")
      .foreach(LlmApiDispatch.requireGeneration)
    val g = intercept[ApiError](LlmApiDispatch.requireGeneration("Voyage"))
    assert(g.getMessage === "Voyage is not supported for generation")
    // embedding: the five embedders pass; the four others bail with
    // the Debug-formatted type name
    Seq("Ollama", "Gemini", "OpenAi", "Voyage", "VertexAi")
      .foreach(LlmApiDispatch.requireEmbedding)
    Seq("OpenRouter", "LiteLlm", "Vllm", "Anthropic").foreach { t =>
      val e = intercept[ApiError](LlmApiDispatch.requireEmbedding(t))
      assert(e.getMessage === s"Embedding is not supported for API type $t")
    }
  }
}
