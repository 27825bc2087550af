package graft.operators

import com.fasterxml.jackson.core.JsonFactoryBuilder
import com.fasterxml.jackson.core.json.JsonReadFeature
import com.fasterxml.jackson.databind.node.{ArrayNode, ObjectNode}
import com.fasterxml.jackson.databind.{JsonNode, ObjectMapper}

import graft.operators.OpenAiWire.{OpenAiHttp, OpenAiRequest, mapper}

/** The engine's remaining LLM provider arms (src/llm/mod.rs:119-166
  * dispatches nine), modeled as deterministic request/response render
  * contracts behind [[OpenAiWire]]'s transport seam. The engine's
  * serde_json build has `preserve_order` ACTIVE (Cargo.lock:
  * serde_json 1.0.140 depends on indexmap 2.10.0, which only happens
  * under that feature; round-14 review #2-1 corrected the opposite
  * first read) — `Value::Object` is an IndexMap, so json!-built
  * payloads keep their literal INSERTION order, `to_value` keeps a
  * struct's declaration order, and re-serializing a parsed value
  * keeps the original key order. Derive-serialized structs (Ollama's
  * request types) likewise stream declaration order, and serialize
  * `None` fields as `null` when they lack skip_serializing_if. One
  * wrinkle: with preserve_order, `Map::remove` is a SWAP_remove —
  * the last entry moves into the removed slot (Gemini's
  * additionalProperties strip inherits that).
  */
object ProviderWires {

  /** The engine's `api_bail!` surface: a flow author passed a spec the
    * client constructor rejects. Message text is the reference's. */
  final class ApiError(msg: String) extends IllegalArgumentException(msg)

  /** ToJsonSchemaOptions (src/base/json_schema.rs) — how each provider
    * wants the output JSON schema rendered; returned per client
    * (anthropic.rs:170-177, ollama.rs:127-134). */
  final case class JsonSchemaOptions(fieldsAlwaysRequired: Boolean,
      supportsFormat: Boolean, extractDescriptions: Boolean,
      topLevelMustBeObject: Boolean)

  /** Re-serialize a JSON string the way preserve_order serde_json
    * does: key order PRESERVED at every level, minimal separators,
    * integer/string text kept; floats round-trip through f64 and
    * re-render in serde_json's ryu text (fixed notation with a
    * mandatory `.0` on integral values inside the 16-digit window,
    * bare `de±x` scientific outside it) — Java's E-notation never
    * leaks. */
  private[operators] def canonJson(json: String): String =
    mapper.writeValueAsString(canonNode(json))

  /** The canonical tree itself, for embedding into a larger payload
    * without a serialize→reparse round trip (which would put float
    * nodes back through Jackson's Double.toString). */
  private[operators] def canonNode(json: String): JsonNode =
    canon(mapper.readTree(json))

  /** serde_json float text (the ryu pretty printer): `0.0`/`-0.0`,
    * fixed notation while the leading digit sits in 10^-5..10^15,
    * otherwise `{mantissa}e{exp}` with no `+` and no forced `.0`. */
  private[graft] def serdeFloatText(d: Double): String = {
    if (d == 0.0) return if (1.0 / d < 0) "-0.0" else "0.0"
    val bd = new java.math.BigDecimal(java.lang.Double.toString(d))
      .stripTrailingZeros
    val kk = bd.precision - bd.scale // digits before the decimal point
    if (kk > 0 && kk <= 16) {
      val plain = bd.toPlainString
      if (bd.scale <= 0) plain + ".0" else plain
    } else if (kk > -5 && kk <= 0) bd.toPlainString
    else {
      val digits = bd.unscaledValue.abs.toString
      val sign = if (bd.signum < 0) "-" else ""
      val mantissa =
        if (digits.length == 1) digits
        else digits.head + "." + digits.tail
      s"$sign${mantissa}e${kk - 1}"
    }
  }

  private def canon(n: JsonNode): JsonNode = n match {
    case o: ObjectNode =>
      val out = mapper.createObjectNode()
      val names = new scala.collection.mutable.ArrayBuffer[String]
      o.fieldNames().forEachRemaining(names += _)
      names.foreach(k => out.set[JsonNode](k, canon(o.get(k))))
      out
    case a: ArrayNode =>
      val out = mapper.createArrayNode()
      (0 until a.size).foreach(i => out.add(canon(a.get(i))))
      out
    case f if f.isFloatingPointNumber =>
      // serde_json re-renders through ryu; RawValue keeps our text out
      // of Jackson's Double.toString E-notation
      mapper.getNodeFactory.rawValueNode(
        new com.fasterxml.jackson.databind.util.RawValue(
          serdeFloatText(f.doubleValue)))
    case other => other
  }

  /** Rust `{:?}` of a serde_json Value (the error-arm interpolation in
    * anthropic.rs:113 / gemini.rs:140): `Null`, `Bool(b)`,
    * `Number(n)`, `String("s")` with escape_debug quoting, `Array
    * [..]`, `Object {"k": V, ..}` — standard library debug list/map
    * framing around the variant names. */
  def rustValueDebug(json: String): String = valueDebug(mapper.readTree(json))

  private def valueDebug(n: JsonNode): String =
    if (n.isNull) "Null"
    else if (n.isBoolean) s"Bool(${n.booleanValue})"
    else if (n.isNumber)
      // serde_json Number Debug prints its canonical text
      if (n.isFloatingPointNumber) s"Number(${serdeFloatText(n.doubleValue)})"
      else s"Number(${n.asText})"
    else if (n.isTextual)
      "String(\"" + n.textValue.flatMap {
        case '"' => "\\\""
        case '\\' => "\\\\"
        case '\n' => "\\n"
        case '\t' => "\\t"
        case '\r' => "\\r"
        case c if Character.isISOControl(c) =>
          s"\\u{${Integer.toHexString(c.toInt)}}"
        case c => c.toString
      } + "\")"
    else if (n.isArray)
      "Array " + (0 until n.size).map(i => valueDebug(n.get(i)))
        .mkString("[", ", ", "]")
    else {
      val names = new scala.collection.mutable.ArrayBuffer[String]
      n.fieldNames().forEachRemaining(names += _)
      "Object " + names.map(k => "\"" + k + "\": " + valueDebug(n.get(k)))
        .mkString("{", ", ", "}")
    }

  /** `urlencoding::encode` (the x-api-key header transform,
    * anthropic.rs:89): percent-encode every byte outside RFC 3986
    * unreserved `A-Za-z0-9 - _ . ~`, uppercase hex, UTF-8 bytes. */
  def urlEncode(s: String): String = {
    val sb = new StringBuilder
    s.getBytes("UTF-8").foreach { b =>
      val c = (b & 0xff).toChar
      if (c.isLetterOrDigit && c < 128 || c == '-' || c == '_' || c == '.' ||
        c == '~') sb.append(c)
      else sb.append("%%%02X".format(b & 0xff))
    }
    sb.toString
  }

  /** `detect_image_mime_type` (mod.rs:175-181 over the `infer` crate):
    * magic-byte sniff, image mime types only, anything else is the reference's
    * "Unknown or unsupported image format" error. The matchers here
    * are the infer crate's image set that the app boundary can
    * actually produce (jpeg/png/gif/webp/bmp/tiff/ico). */
  def detectImageMime(bytes: Array[Byte]): String = {
    def at(i: Int): Int = if (i < bytes.length) bytes(i) & 0xff else -1
    val mime =
      if (at(0) == 0xff && at(1) == 0xd8 && at(2) == 0xff) "image/jpeg"
      else if (at(0) == 0x89 && at(1) == 'P' && at(2) == 'N' && at(3) == 'G')
        "image/png"
      else if (at(0) == 'G' && at(1) == 'I' && at(2) == 'F' && at(3) == '8')
        "image/gif"
      else if (at(0) == 'R' && at(1) == 'I' && at(2) == 'F' && at(3) == 'F' &&
        at(8) == 'W' && at(9) == 'E' && at(10) == 'B' && at(11) == 'P')
        "image/webp"
      else if (at(0) == 'B' && at(1) == 'M') "image/bmp"
      else if ((at(0) == 'I' && at(1) == 'I' && at(2) == 0x2a && at(3) == 0) ||
        (at(0) == 'M' && at(1) == 'M' && at(2) == 0 && at(3) == 0x2a))
        "image/tiff"
      else if (at(0) == 0 && at(1) == 0 && at(2) == 1 && at(3) == 0)
        "image/x-icon"
      else null
    if (mime == null)
      throw new IllegalStateException("Unknown or unsupported image format")
    mime
  }

  private[operators] def base64(bytes: Array[Byte]): String =
    java.util.Base64.getEncoder.encodeToString(bytes)
}

/** Anthropic messages-API arm (src/llm/anthropic.rs:1-178): generation
  * only. Constructor guards, the exact BTreeMap-ordered payload, the
  * tool_use-first / text-fallback extraction ladder with its
  * permissive-JSON second chance, and the provider's schema options.
  */
object AnthropicWire {
  import ProviderWires._

  val Url = "https://api.anthropic.com/v1/messages"
  val Version = "2023-06-01" // the anthropic-version header, :96
  val MaxTokens = 4096 // fixed in the payload, :68
  val ToolName = "report_result" // :84, :119

  /** Client construction (anthropic.rs:17-29): a custom address is an
    * api_bail; a missing ANTHROPIC_API_KEY is an api_bail. Returns the
    * header pair the transport sends: x-api-key is the URL-ENCODED key
    * (:89-95). */
  def create(address: Option[String], apiKey: Option[String])
      : Map[String, String] = {
    if (address.isDefined)
      throw new ApiError("Anthropic doesn't support custom API address")
    val key = apiKey.getOrElse(
      throw new ApiError("ANTHROPIC_API_KEY environment variable must be set"))
    Map("x-api-key" -> urlEncode(key), "anthropic-version" -> Version)
  }

  /** The messages payload (anthropic.rs:38-86). User content parts:
    * the image block first when present (base64 + sniffed media_type),
    * then the text block. System prompt is a TOP-LEVEL field appended
    * AFTER the json! literal. The output format MUST be a JSON schema
    * (api_bail otherwise), wired in as the single `report_result`
    * custom tool, its key order kept as authored (preserve_order
    * serde_json; review r14 #2-1 — the first cut sorted every
    * level). */
  def renderMessages(model: String, userPrompt: String,
      systemPrompt: Option[String] = None,
      image: Option[Array[Byte]] = None,
      schemaJson: Option[String] = None): OpenAiRequest = {
    val schema = schemaJson.getOrElse(throw new ApiError(
      "Anthropic client expects OutputFormat::JsonSchema for all requests"))
    val root = mapper.createObjectNode()
    // json!({model, messages, max_tokens}) then system then tools —
    // insertion order (anthropic.rs:65-85)
    root.put("model", model)
    val messages = root.putArray("messages")
    val msg = messages.addObject()
    msg.put("role", "user")
    val content = msg.putArray("content")
    image.foreach { bytes =>
      val part = content.addObject()
      part.put("type", "image")
      val source = part.putObject("source")
      source.put("type", "base64")
      source.put("media_type", detectImageMime(bytes))
      source.put("data", base64(bytes))
    }
    val text = content.addObject()
    text.put("type", "text")
    text.put("text", userPrompt)
    root.put("max_tokens", MaxTokens)
    systemPrompt.foreach(root.put("system", _))
    val tool = root.putArray("tools").addObject()
    tool.put("type", "custom")
    tool.put("name", ToolName)
    tool.set[JsonNode]("input_schema", canonNode(schema))
    OpenAiRequest(Url, mapper.writeValueAsString(root))
  }

  /** Jackson with the json5-ish relaxations the reference's fallback
    * parser accepts (comments, single quotes, unquoted keys, trailing
    * commas). */
  /** Strict parse in serde_json's sense: whole-input, non-empty. */
  private val strict: ObjectMapper = {
    val m = new ObjectMapper()
    m.enable(com.fasterxml.jackson.databind.DeserializationFeature
      .FAIL_ON_TRAILING_TOKENS)
    m
  }

  private val permissive: ObjectMapper = {
    val f = new JsonFactoryBuilder()
      .enable(JsonReadFeature.ALLOW_JAVA_COMMENTS)
      .enable(JsonReadFeature.ALLOW_SINGLE_QUOTES)
      .enable(JsonReadFeature.ALLOW_UNQUOTED_FIELD_NAMES)
      .enable(JsonReadFeature.ALLOW_TRAILING_COMMA)
      .build()
    val m = new ObjectMapper(f)
    // json5::from_str is whole-input too
    m.enable(com.fasterxml.jackson.databind.DeserializationFeature
      .FAIL_ON_TRAILING_TOKENS)
    m
  }

  /** Response extraction (anthropic.rs:110-167). An `error` field is
    * the API-error arm, rendered with serde Value's Debug form (the
    * `{:?}` interpolation). Otherwise scan `content` for the FIRST
    * tool_use item named report_result and return its input
    * re-serialized — preserve_order serde keeps the response's own
    * key order, floats re-render in ryu text. No tool output:
    * content[0].text must be a string — returned VERBATIM if it
    * parses as strict JSON, re-serialized (order kept) if only the
    * permissive parser accepts it, and the reference's two-error
    * message otherwise (the detail after each ':' is parser-specific
    * text; the frame is pinned). A non-string text is the short
    * no-output error. */
  def parseResponse(body: String): String = {
    val root = mapper.readTree(body)
    if (root.has("error"))
      throw new IllegalStateException("Anthropic API error: " +
        ProviderWires.rustValueDebug(
          mapper.writeValueAsString(root.get("error"))))
    val content = root.get("content")
    if (content != null && content.isArray) {
      var i = 0
      while (i < content.size) {
        val item = content.get(i)
        if (item.path("type").asText == "tool_use" &&
          item.path("name").asText == ToolName && item.has("input"))
          return canonJson(mapper.writeValueAsString(item.get("input")))
        i += 1
      }
    }
    val text = root.path("content").path(0).path("text")
    if (!text.isTextual)
      throw new IllegalStateException(
        "No structured tool output or text found in response")
    val s = text.asText
    // serde_json::from_str rejects trailing tokens and empty input —
    // plain readTree would accept both (review r14 #2)
    try { strict.readValue(s, classOf[JsonNode]); s }
    catch {
      case e1: Exception =>
        try canonJson(
          permissive.readValue(s, classOf[JsonNode]).toString)
        catch {
          case e2: Exception =>
            throw new IllegalStateException(
              "No structured tool output or text found in response, and " +
                s"permissive JSON5 parsing also failed: ${e1.getMessage}; " +
                s"${e2.getMessage}")
        }
    }
  }

  /** anthropic.rs:170-177. */
  val schemaOptions: JsonSchemaOptions =
    JsonSchemaOptions(fieldsAlwaysRequired = false, supportsFormat = false,
      extractDescriptions = false, topLevelMustBeObject = true)

  /** Generation client over the shared transport: renders, posts with
    * OpenAiWire's retry cadence on 429/5xx, but — unlike
    * sendWithRetry, which throws its own generic error — hands the
    * FINAL response back so a non-2xx raises the reference's
    * status+body error (anthropic.rs:103-109; review r14 #1: routing
    * through sendWithRetry made that arm unreachable). */
  final case class AnthropicClient(mkApi: () => OpenAiHttp, model: String,
      apiKey: String, systemPrompt: Option[String] = None,
      schemaJson: Option[String] = None,
      sleeper: Int => Unit = sec => Thread.sleep(sec * 1000L))
      extends Serializable {
    @transient private lazy val api = mkApi()
    def generate(prompt: String, image: Option[Array[Byte]] = None): String = {
      val req = renderMessages(model, prompt, systemPrompt, image, schemaJson)
      var attempt = 1
      var resp = api.post(req)
      while (resp.status / 100 != 2 &&
        (resp.status == 429 || resp.status / 100 == 5) &&
        attempt < OpenAiWire.MaxAttempts) {
        sleeper(resp.retryAfterSec.getOrElse(
          OpenAiWire.backoffSeconds(attempt + 1)))
        resp = api.post(req)
        attempt += 1
      }
      if (resp.status / 100 != 2)
        throw new IllegalStateException(
          s"Anthropic API error: ${resp.status}\n${resp.body}\n")
      parseResponse(resp.body)
    }
  }
}

/** Ollama arm (src/llm/ollama.rs:1-173): generation AND embedding
  * against a local daemon. Derive-serialized request structs —
  * declaration-ordered keys, explicit nulls for absent options. */
object OllamaWire {
  import ProviderWires._

  val DefaultAddress = "http://localhost:11434" // ollama.rs:70

  /** Address resolution (ollama.rs:73-83): default when absent, ALL
    * trailing slashes trimmed, then the two endpoint URLs. */
  def endpoints(address: Option[String]): (String, String) = {
    val addr = address.getOrElse(DefaultAddress)
      .reverse.dropWhile(_ == '/').reverse
    (s"$addr/api/generate", s"$addr/api/embed")
  }

  /** `OllamaRequest` (ollama.rs:42-52): model, prompt, images
    * (base64-encoded, null when absent), format (the raw JSON schema,
    * untagged; null when absent), system (null when absent), stream
    * false — declaration order, serde-derive style. */
  def renderGenerate(address: Option[String], model: String, prompt: String,
      images: Option[Seq[Array[Byte]]] = None,
      formatSchemaJson: Option[String] = None,
      system: Option[String] = None): OpenAiRequest = {
    val root = mapper.createObjectNode()
    root.put("model", model)
    root.put("prompt", prompt)
    images match {
      case Some(imgs) =>
        val arr = root.putArray("images")
        imgs.foreach(b => arr.add(base64(b)))
      case None => root.putNull("images")
    }
    formatSchemaJson match {
      case Some(s) => root.set[JsonNode]("format", mapper.readTree(s))
      case None => root.putNull("format")
    }
    system match {
      case Some(s) => root.put("system", s)
      case None => root.putNull("system")
    }
    root.put("stream", false)
    OpenAiRequest(endpoints(address)._1, mapper.writeValueAsString(root))
  }

  /** `OllamaResponse.response` (ollama.rs:54-57, :121-124). */
  def parseGenerate(body: String): String =
    mapper.readTree(body).get("response").asText

  /** `OllamaEmbeddingRequest` (ollama.rs:59-63): model then input. */
  def renderEmbed(address: Option[String], model: String, text: String)
      : OpenAiRequest = {
    val root = mapper.createObjectNode()
    root.put("model", model)
    root.put("input", text)
    OpenAiRequest(endpoints(address)._2, mapper.writeValueAsString(root))
  }

  /** `OllamaEmbeddingResponse.embedding` (ollama.rs:65-68). */
  def parseEmbed(body: String): Array[Float] = {
    val emb = mapper.readTree(body).get("embedding")
    val out = new Array[Float](emb.size)
    var i = 0
    while (i < out.length) { out(i) = emb.get(i).floatValue; i += 1 }
    out
  }

  /** The model→dimension table (ollama.rs:7-28): matched on the
    * ASCII-lowercased model name; unknown models return None. */
  def defaultEmbeddingDimension(model: String): Option[Int] =
    model.toLowerCase(java.util.Locale.ROOT) match {
      case "mxbai-embed-large" | "bge-m3" | "bge-large" |
          "snowflake-arctic-embed" | "snowflake-arctic-embed2" => Some(1024)
      case "nomic-embed-text" | "paraphrase-multilingual" |
          "snowflake-arctic-embed:110m" | "snowflake-arctic-embed:137m" |
          "granite-embedding:278m" => Some(768)
      case "all-minilm" | "snowflake-arctic-embed:22m" |
          "snowflake-arctic-embed:33m" | "granite-embedding" => Some(384)
      case _ => None
    }

  /** ollama.rs:127-134. */
  val schemaOptions: JsonSchemaOptions =
    JsonSchemaOptions(fieldsAlwaysRequired = false, supportsFormat = true,
      extractDescriptions = true, topLevelMustBeObject = false)
}

/** Voyage AI arm (src/llm/voyage.rs:1-112): embeddings only. */
object VoyageWire {
  import ProviderWires._

  val Url = "https://api.voyageai.com/v1/embeddings" // voyage.rs:67

  /** voyage.rs:6-28 — the phf dimension table, exact keys. */
  val DefaultDimensions: Map[String, Int] = Map(
    "voyage-3-large" -> 1024, "voyage-3.5" -> 1024,
    "voyage-3.5-lite" -> 1024, "voyage-code-3" -> 1024,
    "voyage-finance-2" -> 1024, "voyage-law-2" -> 1024,
    "voyage-code-2" -> 1536,
    "voyage-3" -> 1024, "voyage-3-lite" -> 512,
    "voyage-multilingual-2" -> 1024, "voyage-large-2-instruct" -> 1024,
    "voyage-large-2" -> 1536, "voyage-2" -> 1024,
    "voyage-lite-02-instruct" -> 1024, "voyage-02" -> 1024,
    "voyage-01" -> 1024, "voyage-lite-01" -> 1024,
    "voyage-lite-01-instruct" -> 1024)

  /** Construction guards (voyage.rs:36-48): no custom address; the
    * VOYAGE_API_KEY must be set. Returns the Bearer header value. */
  def create(address: Option[String], apiKey: Option[String]): String = {
    if (address.isDefined)
      throw new ApiError("Voyage AI doesn't support custom API address")
    val key = apiKey.getOrElse(
      throw new ApiError("VOYAGE_API_KEY environment variable must be set"))
    s"Bearer $key"
  }

  /** The embed payload (voyage.rs:69-76): json!({input, model}) with
    * input_type APPENDED when a task type is present — insertion
    * order under preserve_order serde (review r14 #2-1). */
  def renderEmbed(model: String, text: String,
      taskType: Option[String] = None): OpenAiRequest = {
    val root = mapper.createObjectNode()
    root.put("input", text)
    root.put("model", model)
    taskType.foreach(root.put("input_type", _))
    OpenAiRequest(Url, mapper.writeValueAsString(root))
  }

  /** data[0].embedding; an empty data array is the reference's "No
    * embedding data in response" bail (voyage.rs:98-106). */
  def parseEmbed(body: String): Array[Float] = {
    val data = mapper.readTree(body).get("data")
    if (data == null || data.size == 0)
      throw new IllegalStateException("No embedding data in response")
    val emb = data.get(0).get("embedding")
    val out = new Array[Float](emb.size)
    var i = 0
    while (i < out.length) { out(i) = emb.get(i).floatValue; i += 1 }
    out
  }

  def defaultEmbeddingDimension(model: String): Option[Int] =
    DefaultDimensions.get(model)
}

/** The OpenAI-compatible shims (litellm.rs / openrouter.rs / vllm.rs,
  * 16 lines each): the OpenAI client pointed at a different base URL
  * with a provider-specific optional env key. Requests themselves are
  * [[OpenAiWire]]'s renders against `base`. */
object OpenAiCompatShims {

  /** A shim resolves to (api_base, optional key). */
  final case class CompatConfig(apiBase: String, apiKey: Option[String])

  private def shim(default: String, envVar: String)(
      address: Option[String], env: Map[String, String]): CompatConfig =
    CompatConfig(address.getOrElse(default), env.get(envVar))

  /** litellm.rs:7-15. */
  val litellm: (Option[String], Map[String, String]) => CompatConfig =
    shim("http://127.0.0.1:4000", "LITELLM_API_KEY")

  /** openrouter.rs:7-15. */
  val openrouter: (Option[String], Map[String, String]) => CompatConfig =
    shim("https://openrouter.ai/api/v1", "OPENROUTER_API_KEY")

  /** vllm.rs:7-15. */
  val vllm: (Option[String], Map[String, String]) => CompatConfig =
    shim("http://127.0.0.1:8000/v1", "VLLM_API_KEY")
}

/** The dispatcher vocabulary (src/llm/mod.rs:113-173): which of the
  * nine `LlmApiType`s supports generation / embedding, with the exact
  * bail strings for the unsupported pairings. */
object LlmApiDispatch {
  import ProviderWires.ApiError

  /** Debug names of LlmApiType (mod.rs:11-21) — the {:?} text the
    * embedding bail interpolates. */
  val ApiTypes: Seq[String] = Seq("Ollama", "OpenAi", "Gemini", "Anthropic",
    "LiteLlm", "OpenRouter", "Voyage", "Vllm", "VertexAi")

  val GenerationTypes: Set[String] = ApiTypes.toSet - "Voyage"
  val EmbeddingTypes: Set[String] =
    Set("Ollama", "Gemini", "OpenAi", "Voyage", "VertexAi")

  /** mod.rs:138-140. */
  def requireGeneration(apiType: String): Unit =
    if (!GenerationTypes.contains(apiType)) {
      require(ApiTypes.contains(apiType), s"unknown api type $apiType")
      throw new ApiError("Voyage is not supported for generation")
    }

  /** mod.rs:168-170. */
  def requireEmbedding(apiType: String): Unit =
    if (!EmbeddingTypes.contains(apiType)) {
      require(ApiTypes.contains(apiType), s"unknown api type $apiType")
      throw new ApiError(s"Embedding is not supported for API type $apiType")
    }
}
