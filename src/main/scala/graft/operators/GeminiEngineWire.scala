package graft.operators

import com.fasterxml.jackson.databind.JsonNode
import com.fasterxml.jackson.databind.node.{ArrayNode, ObjectNode}

import graft.operators.OpenAiWire.{OpenAiRequest, mapper}
import graft.operators.ProviderWires.{ApiError, JsonSchemaOptions,
  detectImageMime, urlEncode}

/** The ENGINE's Gemini arms (src/llm/gemini.rs:1-370) — distinct from
  * [[GeminiWire]], which models the app's llm_service.py call shape.
  * The engine renders the AI-Studio REST payload (camelCase
  * generationConfig with responseMimeType/responseSchema, the API key
  * in the QUERY STRING, additionalProperties stripped recursively
  * from the schema) and the Vertex path/instance/parameter shapes;
  * both are json!-built → BTreeMap-sorted keys.
  */
object GeminiEngineWire {

  /** AiStudioClient::new (gemini.rs:33-45). */
  def create(address: Option[String], apiKey: Option[String]): String = {
    if (address.isDefined)
      throw new ApiError("Gemini doesn't support custom API address")
    apiKey.getOrElse(
      throw new ApiError("GEMINI_API_KEY environment variable must be set"))
  }

  /** get_api_url (gemini.rs:67-74): model AND key both url-encode into
    * the query string — the key rides the URL, not a header. */
  def apiUrl(model: String, apiName: String, apiKey: String): String =
    "https://generativelanguage.googleapis.com/v1beta/models/" +
      s"${urlEncode(model)}:$apiName?key=${urlEncode(apiKey)}"

  /** remove_additional_properties (gemini.rs:49-64): strip the key at
    * every object level (Gemini rejects it). Under preserve_order,
    * serde_json's `Map::remove` is a SWAP_remove — the LAST entry
    * moves into the removed slot — so the strip perturbs key order
    * exactly that way (a no-op when additionalProperties is already
    * last, as the schema builder emits it). */
  private[operators] def stripAdditionalProperties(n: JsonNode): JsonNode =
    n match {
      case o: ObjectNode =>
        val names = new scala.collection.mutable.ArrayBuffer[String]
        o.fieldNames().forEachRemaining(names += _)
        val idx = names.indexOf("additionalProperties")
        val reordered =
          if (idx < 0) names.toSeq
          else if (idx == names.size - 1) names.toSeq.dropRight(1)
          else names.toSeq.updated(idx, names.last).dropRight(1)
        val out = mapper.createObjectNode()
        reordered.foreach(k =>
          out.set[JsonNode](k, stripAdditionalProperties(o.get(k))))
        out
      case a: ArrayNode =>
        val out = mapper.createArrayNode()
        (0 until a.size).foreach(i =>
          out.add(stripAdditionalProperties(a.get(i))))
        out
      case other => other
    }

  /** generateContent payload (gemini.rs:79-124): text part FIRST then
    * the image inlineData part (the reverse of Anthropic's order),
    * systemInstruction as a parts block, and — when a schema rides —
    * generationConfig.responseMimeType/responseSchema with
    * additionalProperties swap-removed. Key order is preserve_order
    * insertion order (review r14 #2-1): the json! literal's
    * role-then-parts and mimeType-then-data, with systemInstruction
    * appended BEFORE generationConfig (the mutation order at
    * :108-122). */
  def renderGenerateContent(model: String, apiKey: String,
      userPrompt: String, systemPrompt: Option[String] = None,
      image: Option[Array[Byte]] = None,
      schemaJson: Option[String] = None): OpenAiRequest = {
    val root = mapper.createObjectNode()
    val contents = root.putArray("contents")
    val content = contents.addObject()
    content.put("role", "user")
    val parts = content.putArray("parts")
    parts.addObject().put("text", userPrompt)
    image.foreach { bytes =>
      val inline = parts.addObject().putObject("inlineData")
      inline.put("mimeType", detectImageMime(bytes))
      inline.put("data", ProviderWires.base64(bytes))
    }
    systemPrompt.foreach { sys =>
      root.putObject("systemInstruction").putArray("parts")
        .addObject().put("text", sys)
    }
    schemaJson.foreach { s =>
      val gen = root.putObject("generationConfig")
      gen.put("responseMimeType", "application/json")
      gen.set[JsonNode]("responseSchema",
        stripAdditionalProperties(ProviderWires.canonNode(s)))
    }
    OpenAiRequest(apiUrl(model, "generateContent", apiKey),
      mapper.writeValueAsString(root))
  }

  /** Response extraction (gemini.rs:137-148): an `error` field is the
    * API-error arm; otherwise candidates[0].content.parts[0].text must
    * be a string — anything else is "No text in response". */
  def parseGenerateContent(body: String): String = {
    val root = mapper.readTree(body)
    if (root.has("error"))
      // the {:?} interpolation — serde Value Debug form (review r14
      // #2-4)
      throw new IllegalStateException("Gemini API error: " +
        ProviderWires.rustValueDebug(
          mapper.writeValueAsString(root.get("error"))))
    val text = root.path("candidates").path(0).path("content").path("parts")
      .path(0).path("text")
    if (!text.isTextual)
      throw new IllegalStateException("No text in response")
    text.asText
  }

  /** The HTTP-level failure (gemini.rs:130-136). */
  def httpError(status: Int, body: String): String =
    s"Gemini API error: $status\n$body\n"

  /** gemini.rs:151-158 — identical for AI Studio and Vertex. */
  val schemaOptions: JsonSchemaOptions =
    JsonSchemaOptions(fieldsAlwaysRequired = false, supportsFormat = false,
      extractDescriptions = false, topLevelMustBeObject = true)

  /** embedContent payload (gemini.rs:176-183): json!({model, content})
    * with taskType appended — insertion order (review r14 #2-1). */
  def renderEmbedContent(model: String, apiKey: String, text: String,
      taskType: Option[String] = None): OpenAiRequest = {
    val root = mapper.createObjectNode()
    root.put("model", model)
    root.putObject("content").putArray("parts").addObject()
      .put("text", text)
    taskType.foreach(root.put("taskType", _))
    OpenAiRequest(apiUrl(model, "embedContent", apiKey),
      mapper.writeValueAsString(root))
  }

  /** `{"embedding":{"values":[...]}}` (gemini.rs:161-168). */
  def parseEmbedContent(body: String): Array[Float] = {
    val values = mapper.readTree(body).get("embedding").get("values")
    val out = new Array[Float](values.size)
    var i = 0
    while (i < out.length) { out(i) = values.get(i).floatValue; i += 1 }
    out
  }

  /** The prefix ladder (gemini.rs:12-25) on the lowercased model. */
  def defaultEmbeddingDimension(model: String): Option[Int] = {
    val m = model.toLowerCase(java.util.Locale.ROOT)
    if (m.startsWith("gemini-embedding-")) Some(3072)
    else if (m.startsWith("text-embedding-")) Some(768)
    else if (m.startsWith("embedding-")) Some(768)
    else if (m.startsWith("text-multilingual-embedding-")) Some(768)
    else None
  }

  /** VertexAiClient (gemini.rs:207-370): the SDK carries transport,
    * but the deterministic pieces — guards, the model path, the
    * embed instance/parameter shapes, the miss error — are pinned. */
  object VertexAi {

    /** gemini.rs:213-227. */
    def create(address: Option[String], hasConfig: Boolean): Unit = {
      if (address.isDefined)
        throw new ApiError(
          "VertexAi API address is not supported for VertexAi API type")
      if (!hasConfig)
        throw new ApiError(
          "VertexAi API config is required for VertexAi API type")
    }

    /** get_model_path (gemini.rs:229-236): region defaults global. */
    def modelPath(project: String, region: Option[String],
        model: String): String =
      s"projects/$project/locations/${region.getOrElse("global")}" +
        s"/publishers/google/models/$model"

    /** The predict instance (gemini.rs:328-336): content then
      * task_type (snake_case here, unlike AI Studio's camelCase). */
    def embedInstance(text: String, taskType: Option[String]): String = {
      val root = mapper.createObjectNode()
      root.put("content", text)
      taskType.foreach(root.put("task_type", _))
      mapper.writeValueAsString(root)
    }

    /** The predict parameters (gemini.rs:339-342). */
    def embedParameters(outputDimension: Option[Int]): String = {
      val root = mapper.createObjectNode()
      outputDimension.foreach(root.put("outputDimensionality", _))
      mapper.writeValueAsString(root)
    }

    /** predictions[0].embeddings.values; a missing embeddings node is
      * the reference's error (gemini.rs:355-360). */
    def parsePredictEmbeddings(body: String): Array[Float] = {
      val first = mapper.readTree(body).path("predictions").path(0)
      val emb = first.get("embeddings")
      if (emb == null)
        throw new IllegalStateException("No embeddings in response")
      val values = emb.get("values")
      val out = new Array[Float](values.size)
      var i = 0
      while (i < out.length) { out(i) = values.get(i).floatValue; i += 1 }
      out
    }
  }
}
