package graft.operators

import com.fasterxml.jackson.databind.JsonNode

import graft.operators.OpenAiWire.{OpenAiRequest, mapper}
import graft.operators.ProviderWires.{ApiError, JsonSchemaOptions,
  detectImageMime}

/** The ENGINE's OpenAI arm (src/llm/openai.rs:1-187) — distinct from
  * [[OpenAiWire]], which models the app's llm_service.py call shape.
  * The engine goes through async_openai's typed request structs:
  * `None` fields are OMITTED (skip_serializing_if), enums tag with
  * `role`/`type` first, and the request streams in struct declaration
  * order (messages before model). The schema rides as
  * `response_format: {type: json_schema}` with `strict: true` —
  * matching the provider's required-all/null-widened schema options —
  * rather than the app's plain max_tokens/temperature kwargs.
  */
object OpenAiEngineWire {

  /** openai.rs:21-25 — the engine's (smaller) dimension table. */
  val DefaultDimensions: Map[String, Int] = Map(
    "text-embedding-3-small" -> 1536,
    "text-embedding-3-large" -> 3072,
    "text-embedding-ada-002" -> 1536)

  /** Client::new (openai.rs:36-62): a non-OpenAi config is the
    * config-type bail; a missing OPENAI_API_KEY is the env bail. The
    * address/org/project simply configure the client. */
  def create(address: Option[String], configKind: Option[String],
      hasApiKey: Boolean): Unit = {
    configKind match {
      case Some(k) if k != "OpenAi" =>
        throw new ApiError("unexpected config type, expected OpenAiConfig")
      case _ => ()
    }
    if (!hasApiKey)
      throw new ApiError("OPENAI_API_KEY environment variable must be set")
  }

  /** The data-URL the image part carries (openai.rs:86-88). */
  def imageDataUrl(bytes: Array[Byte]): String =
    s"data:${detectImageMime(bytes)};base64,${ProviderWires.base64(bytes)}"

  /** CreateChatCompletionRequest (openai.rs:71-132): optional system
    * message first, then the user message — a plain string without an
    * image, a text+image_url part array (detail "auto") with one —
    * then the json_schema response format (name, schema, strict true;
    * description omitted). async_openai streams messages before
    * model. */
  def renderChat(model: String, userPrompt: String,
      systemPrompt: Option[String] = None,
      image: Option[Array[Byte]] = None,
      schemaName: Option[String] = None,
      schemaJson: Option[String] = None): OpenAiRequest = {
    val root = mapper.createObjectNode()
    val messages = root.putArray("messages")
    systemPrompt.foreach { sys =>
      val m = messages.addObject()
      m.put("role", "system")
      m.put("content", sys)
    }
    val user = messages.addObject()
    user.put("role", "user")
    image match {
      case None => user.put("content", userPrompt)
      case Some(bytes) =>
        val parts = user.putArray("content")
        val text = parts.addObject()
        text.put("type", "text")
        text.put("text", userPrompt)
        val img = parts.addObject()
        img.put("type", "image_url")
        val url = img.putObject("image_url")
        url.put("url", imageDataUrl(bytes))
        url.put("detail", "auto")
    }
    root.put("model", model)
    schemaJson.foreach { s =>
      val rf = root.putObject("response_format")
      rf.put("type", "json_schema")
      val js = rf.putObject("json_schema")
      js.put("name", schemaName.getOrElse("output"))
      // serde_json::to_value under preserve_order keeps the schema's
      // declaration order (review r14 #2-2 — no re-sort)
      js.set[JsonNode]("schema", ProviderWires.canonNode(s))
      js.put("strict", true)
    }
    OpenAiRequest("/v1/chat/completions", mapper.writeValueAsString(root))
  }

  /** choices[0].message.content, with the engine's miss error
    * (openai.rs:138-143). */
  def parseChat(body: String): String = {
    val content = mapper.readTree(body).path("choices").path(0)
      .path("message").path("content")
    if (!content.isTextual)
      throw new IllegalStateException("No response from OpenAI")
    content.asText
  }

  /** CreateEmbeddingRequest (openai.rs:167-172): async_openai 0.28
    * declares model before input; dimensions only when requested
    * (review r14 #2-3). */
  def renderEmbed(model: String, text: String,
      outputDimension: Option[Int] = None): OpenAiRequest = {
    val root = mapper.createObjectNode()
    root.put("model", model)
    root.put("input", text)
    outputDimension.foreach(root.put("dimensions", _))
    OpenAiRequest("/v1/embeddings", mapper.writeValueAsString(root))
  }

  /** data[0].embedding with the engine's miss error
    * (openai.rs:174-181). */
  def parseEmbed(body: String): Array[Float] = {
    val data = mapper.readTree(body).get("data")
    if (data == null || data.size == 0)
      throw new IllegalStateException("No embedding returned from OpenAI")
    val emb = data.get(0).get("embedding")
    val out = new Array[Float](emb.size)
    var i = 0
    while (i < out.length) { out(i) = emb.get(i).floatValue; i += 1 }
    out
  }

  def defaultEmbeddingDimension(model: String): Option[Int] =
    DefaultDimensions.get(model)

  /** openai.rs:148-155 — the only arm with fields_always_required
    * (strict mode rejects non-required fields). */
  val schemaOptions: JsonSchemaOptions =
    JsonSchemaOptions(fieldsAlwaysRequired = true, supportsFormat = false,
      extractDescriptions = false, topLevelMustBeObject = true)
}
