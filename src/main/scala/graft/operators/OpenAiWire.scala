package graft.operators

import com.fasterxml.jackson.databind.ObjectMapper
import com.fasterxml.jackson.databind.node.{ArrayNode, ObjectNode}

/** OpenAI-shaped request rendering for the embedding and LLM
  * boundaries — the generate-the-requests tier the Qdrant/Neo4j/Kuzu
  * connectors established ([[graft.sinks.QdrantSink]] precedent):
  * the EXACT wire payloads the reference's clients produce, behind a
  * transport seam, no network.
  *
  *  - batch embed (embedding_service.py:125-196
  *    `async_client.embeddings.create(input=batch, model=model)`):
  *    `POST /v1/embeddings` with `{"model": m, "input": [texts...]}`;
  *    batches cap at 2048 (the OpenAI limit the reference clamps to
  *    with a warning, :144-146).
  *  - chat completions (llm_service.py:188-262): `POST
  *    /v1/chat/completions` with model, messages (optional system +
  *    user), `max_tokens`, optional `temperature` and
  *    `reasoning_effort` — the exact kwargs insertion order.
  *  - gpt-5 models route to the responses API (llm_service.py:
  *    197-217): `POST /v1/responses` with `input` message blocks of
  *    `{"type": "input_text", "text": ...}`, `max_output_tokens`, and
  *    `reasoning.effort` defaulting `"minimal"`.
  *  - retry contract (tenacity `stop_after_attempt(3)` +
  *    `wait_exponential(multiplier=1, min=4, max=60)`,
  *    embedding_service.py:67-71/119-123): at most 3 attempts; the
  *    wait before re-attempt n is `clamp(2^(n-1), 4, 60)` seconds,
  *    except a 429 carrying Retry-After which waits the server's
  *    value (the openai client's own behavior). The SAME body is
  *    re-sent verbatim.
  *
  * Authorization is transport-level (`Bearer` header from
  * configuration, llm_service.py:213-216) and deliberately outside
  * the rendered body; the recording transport never sees a secret.
  */
object OpenAiWire {

  /** One HTTP call as it would go over the wire. */
  final case class OpenAiRequest(path: String, body: String)

  /** Transport outcome: HTTP status, optional Retry-After seconds
    * (429 responses), response body. */
  final case class OpenAiResponse(status: Int, retryAfterSec: Option[Int],
      body: String)

  /** The transport seam: a real deployment posts with an HTTP client;
    * the default records deterministically. One instance per
    * partition (constructed inside mapPartitions). */
  trait OpenAiHttp extends Serializable {
    def post(req: OpenAiRequest): OpenAiResponse
  }

  private[operators] val mapper = new ObjectMapper()

  /** tenacity wait_exponential(multiplier=1, min=4, max=60): the wait
    * before re-attempt `attempt` (2, 3, ...). */
  def backoffSeconds(attempt: Int): Int =
    math.min(60, math.max(4, 1 << (attempt - 2)))

  val MaxAttempts = 3
  val OpenAiBatchCap = 2048

  // -----------------------------------------------------------------
  // Embeddings
  // -----------------------------------------------------------------

  /** `POST /v1/embeddings` body for one batch — exactly what
    * `embeddings.create(input=batch, model=model)` serializes. */
  def renderEmbedBatch(model: String, texts: Seq[String]): OpenAiRequest = {
    val root = mapper.createObjectNode()
    root.put("model", model)
    val input = root.putArray("input")
    texts.foreach(input.add)
    OpenAiRequest("/v1/embeddings", mapper.writeValueAsString(root))
  }

  /** Parse `{"data":[{"embedding":[...]}, ...]}` in index order
    * (response.data is index-aligned with the input batch). */
  def parseEmbedResponse(body: String): Seq[Array[Float]] = {
    val data = mapper.readTree(body).get("data")
    (0 until data.size).map { i =>
      val emb = data.get(i).get("embedding").asInstanceOf[ArrayNode]
      val out = new Array[Float](emb.size)
      var k = 0
      while (k < out.length) { out(k) = emb.get(k).floatValue(); k += 1 }
      out
    }
  }

  /** Send with the reference's retry contract: up to [[MaxAttempts]]
    * sends of the SAME request; a 429 waits Retry-After (or the
    * exponential fallback), a 5xx waits the exponential backoff, any
    * other non-2xx raises immediately (the reference re-raises
    * non-retryable errors, embedding_service.py:115-117). `sleeper`
    * is injectable so specs assert the sequencing without sleeping. */
  def sendWithRetry(api: OpenAiHttp, req: OpenAiRequest,
      sleeper: Int => Unit = defaultSleeper): OpenAiResponse = {
    var attempt = 1
    var last: OpenAiResponse = null
    while (attempt <= MaxAttempts) {
      last = api.post(req)
      if (last.status / 100 == 2) return last
      val retryable = last.status == 429 || last.status / 100 == 5
      if (!retryable || attempt == MaxAttempts)
        throw new IllegalStateException(
          s"openai request failed after $attempt attempt(s): HTTP ${last.status}")
      val wait = last.retryAfterSec.getOrElse(backoffSeconds(attempt + 1))
      sleeper(wait)
      attempt += 1
    }
    last
  }

  private def defaultSleeper(sec: Int): Unit = Thread.sleep(sec * 1000L)

  /** [[Embedder]] over the wire tier: renders the batch request,
    * sends through the transport with the retry contract, parses the
    * vectors. Plugs straight into [[EmbedText.embed]] — the operator
    * keeps its one-client-per-partition, 100-per-call shape, and a
    * recording transport makes the whole path runnable offline. */
  final case class OpenAiEmbedder(mkApi: () => OpenAiHttp, model: String,
      override val dim: Int, sleeper: Int => Unit = defaultSleeper)
      extends Embedder {
    @transient private lazy val api = mkApi()
    def embedBatch(texts: Seq[String]): Seq[Array[Float]] = {
      require(texts.size <= OpenAiBatchCap,
        s"batch ${texts.size} exceeds the OpenAI limit $OpenAiBatchCap " +
          "(the reference clamps batch_size before batching, so a batch " +
          "this size can never reach the client)")
      val resp = sendWithRetry(api, renderEmbedBatch(model, texts), sleeper)
      parseEmbedResponse(resp.body)
    }
  }

  // -----------------------------------------------------------------
  // Chat / responses
  // -----------------------------------------------------------------

  /** Chat-completions body (llm_service.py:188-262). gpt-5* models
    * render the responses-API shape instead, as the reference
    * branches on the model prefix (:197). */
  def renderChat(model: String, prompt: String,
      systemPrompt: Option[String] = None, maxTokens: Int = 2000,
      temperature: Option[Double] = Some(0.7),
      reasoningEffort: Option[String] = None): OpenAiRequest =
    if (model.startsWith("gpt-5"))
      renderResponses(model, prompt, systemPrompt, maxTokens, reasoningEffort)
    else {
      val root = mapper.createObjectNode()
      root.put("model", model)
      val messages = root.putArray("messages")
      systemPrompt.foreach(sp => message(messages, "system", sp))
      message(messages, "user", prompt)
      root.put("max_tokens", maxTokens)
      temperature.foreach(t => root.put("temperature", t))
      reasoningEffort.foreach(e => root.put("reasoning_effort", e))
      OpenAiRequest("/v1/chat/completions", mapper.writeValueAsString(root))
    }

  private def message(arr: ArrayNode, role: String, content: String): Unit = {
    val m = arr.addObject()
    m.put("role", role)
    m.put("content", content)
  }

  /** The gpt-5 responses-API payload (llm_service.py:197-217):
    * messages re-shaped into `input_text` blocks, `max_output_tokens`,
    * reasoning effort defaulting "minimal". */
  def renderResponses(model: String, prompt: String,
      systemPrompt: Option[String], maxTokens: Int,
      reasoningEffort: Option[String]): OpenAiRequest = {
    val root = mapper.createObjectNode()
    root.put("model", model)
    val input = root.putArray("input")
    def block(role: String, content: String): Unit = {
      val m = input.addObject()
      m.put("role", role)
      val c = m.putArray("content")
      val t = c.addObject()
      t.put("type", "input_text")
      t.put("text", content)
    }
    systemPrompt.foreach(block("system", _))
    block("user", prompt)
    root.put("max_output_tokens", maxTokens)
    val reasoning = root.putObject("reasoning")
    reasoning.put("effort", reasoningEffort.getOrElse("minimal"))
    OpenAiRequest("/v1/responses", mapper.writeValueAsString(root))
  }

  /** Parse the chat-completions answer text
    * (`choices[0].message.content`, llm_service.py:264). */
  def parseChatResponse(body: String): String =
    mapper.readTree(body).get("choices").get(0).get("message")
      .get("content").asText()

  /** Chat client over the wire tier — the completion side of
    * [[graft.operators.ExtractByLlm]]'s client boundary: renders the
    * exact request, sends with the retry contract, returns the answer
    * text (which then flows through LlmResponse.parseMetadata /
    * stripFence exactly as the reference pipes
    * `response.content` into its parse fallbacks). One instance per
    * partition, like [[OpenAiEmbedder]]. */
  final case class OpenAiChatClient(mkApi: () => OpenAiHttp, model: String,
      systemPrompt: Option[String] = None, maxTokens: Int = 2000,
      temperature: Option[Double] = Some(0.7),
      reasoningEffort: Option[String] = None,
      sleeper: Int => Unit = defaultSleeper) extends Serializable {
    @transient private lazy val api = mkApi()
    def complete(prompt: String): String = {
      val req = renderChat(model, prompt, systemPrompt, maxTokens,
        temperature, reasoningEffort)
      parseChatResponse(sendWithRetry(api, req, sleeper).body)
    }
  }

  // -----------------------------------------------------------------
  // Vision (image caption ladder)
  // -----------------------------------------------------------------

  /** The caption prompt (image_intelligence_service.py:242-262):
    * fixed lead, optional `Document context:` (truthy, capped 500)
    * and `OCR detected text:` (truthy, capped 200) lines, fixed
    * focus tail, newline-joined. */
  def visionPrompt(context: Option[String] = None,
      ocrText: Option[String] = None): String = {
    val parts = Seq.newBuilder[String]
    parts += "Analyze this image and provide a detailed, searchable description."
    context.filter(_.nonEmpty).foreach(c =>
      parts += s"Document context: ${c.take(500)}")
    ocrText.filter(_.nonEmpty).foreach(o =>
      parts += s"OCR detected text: ${o.take(200)}")
    parts += "Focus on:"
    parts += "1. What the image shows (diagrams, charts, photos, illustrations)"
    parts += "2. Key information conveyed"
    parts += "3. Relevant technical details"
    parts += "4. How it relates to the document context"
    parts += "Keep the description concise but comprehensive for search purposes."
    parts.result().mkString("\n")
  }

  /** The caption fallback ladder (image_intelligence_service.py:
    * 264-363): gpt-5 and gpt-5-mini with `max_completion_tokens`
    * 2000, gpt-5-nano with 300, then the gpt-4o arm. */
  val VisionLadder: Seq[(String, Int)] =
    Seq("gpt-5" -> 2000, "gpt-5-mini" -> 2000, "gpt-5-nano" -> 300)

  /** Per-arm caption confidence (image_intelligence_service.py:
    * 367-373); unknown models score 0.7. */
  val VisionConfidence: Map[String, Double] = Map(
    "gpt-5" -> 0.98, "gpt-5-mini" -> 0.95, "gpt-5-nano" -> 0.93,
    "gpt-4o-fallback" -> 0.85)

  private val visionTokens: Map[String, Int] = VisionLadder.toMap

  /** Vision chat-completions body: the user message is a CONTENT
    * ARRAY — a text block plus an `image_url` block whose url is the
    * jpeg data-URL with `"detail": "high"`. Unlike [[renderChat]],
    * gpt-5 models stay on `/v1/chat/completions` (the reference
    * calls `chat.completions.create` for vision with the
    * `reasoning_effort` kwarg, image_intelligence_service.py:266-286,
    * not the responses API) and carry `max_completion_tokens`,
    * `temperature` 1.0 and `reasoning_effort` "minimal"; the gpt-4o
    * fallback sends plain `max_tokens` 2000 and nothing else
    * (:344-362). */
  def renderVisionChat(model: String, prompt: String,
      base64Image: String): OpenAiRequest = {
    val root = mapper.createObjectNode()
    root.put("model", model)
    val content = root.putArray("messages").addObject()
      .put("role", "user").putArray("content")
    val text = content.addObject()
    text.put("type", "text")
    text.put("text", prompt)
    val img = content.addObject()
    img.put("type", "image_url")
    val url = img.putObject("image_url")
    url.put("url", s"data:image/jpeg;base64,$base64Image")
    url.put("detail", "high")
    if (model.startsWith("gpt-5")) {
      root.put("max_completion_tokens", visionTokens.getOrElse(model, 2000))
      root.put("temperature", 1.0)
      root.put("reasoning_effort", "minimal")
    } else {
      root.put("max_tokens", 2000)
    }
    OpenAiRequest("/v1/chat/completions", mapper.writeValueAsString(root))
  }

  /** One caption outcome: text (stripped), ladder confidence, the
    * model arm that answered. */
  final case class VisionCaption(caption: String, confidence: Double,
      model: String)

  /** Run the caption ladder: each arm posts ONCE (the reference's
    * per-arm `try` has no retry — a failed create falls straight to
    * the next model, :323/:343); the first 2xx answer wins with its
    * arm's confidence; the gpt-4o arm reports as "gpt-4o-fallback";
    * total failure returns the empty caption with confidence 0.0 and
    * model "none" (:383-388). */
  def captionImage(api: OpenAiHttp, base64Image: String,
      context: Option[String] = None, ocrText: Option[String] = None)
      : VisionCaption = {
    val prompt = visionPrompt(context, ocrText)
    val arms = VisionLadder.map(_._1) :+ "gpt-4o"
    arms.foreach { model =>
      val answered =
        try {
          val resp = api.post(renderVisionChat(model, prompt, base64Image))
          if (resp.status / 100 == 2)
            // Python str.strip() semantics (NBSP/NEL/LS/PS included) —
            // the shared set, so caption trimming can't drift from the
            // other response-trim sites (the r8 review's bug class)
            Some(graft.functions.LlmResponse.pyStrip(
              parseChatResponse(resp.body)))
          else None
        } catch { case scala.util.control.NonFatal(_) => None }
      answered match {
        case Some(caption) =>
          val used = if (model == "gpt-4o") "gpt-4o-fallback" else model
          return VisionCaption(caption, VisionConfidence.getOrElse(used, 0.7),
            used)
        case None => ()
      }
    }
    VisionCaption("", 0.0, "none")
  }

  // -----------------------------------------------------------------
  // Recording transport (the offline default)
  // -----------------------------------------------------------------

  /** Bounded in-process recording transport (single-JVM, like
    * [[graft.sinks.RecordingQdrantApi]]): records every request and
    * answers deterministically — embeddings from the [[StubEmbedder]]
    * projection of each input text (so the wire path and the stub
    * path produce identical vectors), chat with a canned completion.
    * `failFirst` makes the first `n` posts return 429 with a
    * Retry-After, for retry-sequencing specs. */
  final case class RecordingOpenAiApi(logId: String, dim: Int = 8,
      failFirst: Int = 0, retryAfterSec: Option[Int] = Some(7))
      extends OpenAiHttp {
    override def post(req: OpenAiRequest): OpenAiResponse = {
      val n = RecordingOpenAiApi.append(logId, req)
      if (n <= failFirst) return OpenAiResponse(429, retryAfterSec, "")
      if (req.path == "/v1/embeddings") {
        val root = mapper.readTree(req.body)
        val input = root.get("input")
        val data = mapper.createObjectNode()
        val arr = data.putArray("data")
        (0 until input.size).foreach { i =>
          val vec = StubEmbedder(dim).embedBatch(Seq(input.get(i).asText())).head
          val row = arr.addObject()
          val emb = row.putArray("embedding")
          vec.foreach(emb.add)
        }
        OpenAiResponse(200, None, mapper.writeValueAsString(data))
      } else if (req.path.endsWith(":generateContent")) {
        val root = mapper.createObjectNode()
        val cand = root.putArray("candidates").addObject()
        cand.putObject("content").putArray("parts")
          .addObject().put("text", "{}")
        cand.put("finishReason", "STOP")
        OpenAiResponse(200, None, mapper.writeValueAsString(root))
      } else {
        val root = mapper.createObjectNode()
        val choices = root.putArray("choices")
        val msg = choices.addObject().putObject("message")
        msg.put("content", "{}")
        OpenAiResponse(200, None, mapper.writeValueAsString(root))
      }
    }
  }

  object RecordingOpenAiApi {
    val maxRequests = 10000
    private val log =
      graft.sinks.BoundedRecordingLog.registry[OpenAiRequest](maxRequests)
    /** Appends and returns the running request count for `id`. */
    private[operators] def append(id: String, req: OpenAiRequest): Int = {
      log(id).add(req)
      log(id).items.size + log(id).dropped.toInt
    }
    def requests(id: String): Seq[OpenAiRequest] = log(id).items
    def clear(id: String): Unit = log(id).clear()
  }
}
