package graft.operators

import com.fasterxml.jackson.databind.JsonNode

import graft.operators.OpenAiWire.{OpenAiHttp, OpenAiRequest, mapper,
  sendWithRetry}

/** Gemini-shaped request rendering — the second provider arm of the
  * reference's LLM boundary (llm_service.py:275-395 `_call_gemini`),
  * rendered as the `generateContent` REST payload the SDK call
  * serializes to, behind the same transport seam as [[OpenAiWire]]:
  *
  *  - the system prompt folds INTO the user prompt
  *    (`f"{system_prompt}\n\n{prompt}"`, :289-291) — Gemini gets one
  *    combined text part, not a messages array;
  *  - `max_output_tokens` floors at 1000 ("Gemini requires minimum
  *    1000 tokens to generate any output", :293-297);
  *  - four fixed safety settings at BLOCK_ONLY_HIGH (:305-311);
  *  - the response's finish reason grades the failure arms
  *    (:326-376): SAFETY and RECITATION raise, MAX_TOKENS keeps
  *    partial content when parts exist, any other empty response
  *    raises with the block reason;
  *  - token usage is ESTIMATED at whitespace-words × 1.3 truncated to
  *    int (:380-383) — Gemini reports no exact counts.
  */
object GeminiWire {

  private val safetyCategories = Seq(
    "HARM_CATEGORY_HARASSMENT", "HARM_CATEGORY_HATE_SPEECH",
    "HARM_CATEGORY_SEXUALLY_EXPLICIT", "HARM_CATEGORY_DANGEROUS_CONTENT")

  val MinOutputTokens = 1000

  /** The reference's prompt fold: system prompt prepends with a blank
    * line; Gemini has no system role in this call shape. */
  def foldPrompt(prompt: String, systemPrompt: Option[String]): String =
    systemPrompt.map(sp => s"$sp\n\n$prompt").getOrElse(prompt)

  /** `POST /v1beta/models/{model}:generateContent` body. */
  def renderGenerateContent(model: String, prompt: String,
      systemPrompt: Option[String] = None, maxTokens: Int = 2000,
      temperature: Double = 0.7): OpenAiRequest = {
    val root = mapper.createObjectNode()
    val contents = root.putArray("contents")
    val parts = contents.addObject().putArray("parts")
    parts.addObject().put("text", foldPrompt(prompt, systemPrompt))
    val gen = root.putObject("generationConfig")
    gen.put("temperature", temperature)
    gen.put("maxOutputTokens", math.max(maxTokens, MinOutputTokens))
    val safety = root.putArray("safetySettings")
    safetyCategories.foreach { cat =>
      val s = safety.addObject()
      s.put("category", cat)
      s.put("threshold", "BLOCK_ONLY_HIGH")
    }
    OpenAiRequest(s"/v1beta/models/$model:generateContent",
      mapper.writeValueAsString(root))
  }

  /** Extract the answer text with the reference's graded finish-reason
    * arms (llm_service.py:326-376). Throws IllegalStateException with
    * the reference's reason strings on the blocked/empty arms. */
  def parseGenerateResponse(body: String): String = {
    val root = mapper.readTree(body)
    val candidates = root.get("candidates")
    val first =
      if (candidates != null && candidates.size > 0) candidates.get(0) else null
    val parts =
      if (first == null) null
      else {
        val content = first.get("content")
        if (content == null) null else content.get("parts")
      }
    if (parts != null && parts.size > 0) {
      // response.text = the parts' text joined
      (0 until parts.size).map(k => text(parts.get(k))).mkString
    } else {
      val reason =
        if (first == null) "Unknown"
        else Option(first.get("finishReason")).map(_.asText).getOrElse("Unknown")
      reason match {
        case "SAFETY" =>
          throw new IllegalStateException(
            "Content blocked by safety filters. Finish reason: SAFETY")
        case "RECITATION" =>
          throw new IllegalStateException(
            "Content blocked due to potential copyright/recitation issues")
        case "MAX_TOKENS" =>
          throw new IllegalStateException(
            "Hit max token limit with no content generated")
        case other =>
          val blocked = Option(root.get("promptFeedback"))
            .flatMap(pf => Option(pf.get("blockReason")))
            .map(br => s"PROMPT_BLOCKED (${br.asText})")
          throw new IllegalStateException(
            s"Gemini returned empty response. Reason: ${blocked.getOrElse(other)}")
      }
    }
  }

  private def text(part: JsonNode): String =
    Option(part.get("text")).map(_.asText).getOrElse("")

  /** The reference's usage estimate (no exact counts from Gemini):
    * whitespace words × 1.3 truncated to int, for prompt and
    * completion alike. Word count is Python str.split() — unicode
    * whitespace, so NBSP-joined words count as one, like the
    * reference's len(text.split()). */
  def estimateTokens(s: String): Int =
    (graft.functions.LlmResponse.pySplit(s).length * 1.3).toInt

  /** Chat client over the Gemini wire shape, sharing [[OpenAiWire]]'s
    * transport and retry contract — `(text, promptTokens,
    * completionTokens)` like the reference's LLMResponse usage. */
  final case class GeminiChatClient(mkApi: () => OpenAiHttp, model: String,
      systemPrompt: Option[String] = None, maxTokens: Int = 2000,
      temperature: Double = 0.7,
      sleeper: Int => Unit = sec => Thread.sleep(sec * 1000L))
      extends Serializable {
    @transient private lazy val api = mkApi()
    def complete(prompt: String): (String, Int, Int) = {
      val req = renderGenerateContent(model, prompt, systemPrompt,
        maxTokens, temperature)
      val answer = parseGenerateResponse(sendWithRetry(api, req, sleeper).body)
      (answer, estimateTokens(foldPrompt(prompt, systemPrompt)),
        estimateTokens(answer))
    }
  }
}
