package graft

import org.scalatest.funsuite.AnyFunSuite

import graft.operators.GeminiWire._
import graft.operators.OpenAiWire.RecordingOpenAiApi

/** The Gemini wire arm (llm_service.py:275-395): prompt fold, token
  * floor, safety settings, graded finish-reason parsing, estimated
  * usage. */
class GeminiWireSpec extends AnyFunSuite {

  test("generateContent renders fold, floor, and the four safety settings") {
    val req = renderGenerateContent("gemini-2.5-flash", "extract things",
      systemPrompt = Some("be terse"), maxTokens = 200, temperature = 0.3)
    assert(req.path === "/v1beta/models/gemini-2.5-flash:generateContent")
    // system prompt folds into the single text part; max_output_tokens
    // floors at 1000 (the reference's minimum working value)
    assert(req.body ===
      """{"contents":[{"parts":[{"text":"be terse\n\nextract things"}]}],""" +
      """"generationConfig":{"temperature":0.3,"maxOutputTokens":1000},""" +
      """"safetySettings":[""" +
      """{"category":"HARM_CATEGORY_HARASSMENT","threshold":"BLOCK_ONLY_HIGH"},""" +
      """{"category":"HARM_CATEGORY_HATE_SPEECH","threshold":"BLOCK_ONLY_HIGH"},""" +
      """{"category":"HARM_CATEGORY_SEXUALLY_EXPLICIT","threshold":"BLOCK_ONLY_HIGH"},""" +
      """{"category":"HARM_CATEGORY_DANGEROUS_CONTENT","threshold":"BLOCK_ONLY_HIGH"}]}""")
    // above the floor the caller's budget passes through
    assert(renderGenerateContent("m", "p", maxTokens = 4096).body
      .contains(""""maxOutputTokens":4096"""))
  }

  test("finish-reason arms: parts join, SAFETY/RECITATION/empty raise") {
    assert(parseGenerateResponse(
      """{"candidates":[{"content":{"parts":[{"text":"a"},{"text":"b"}]},"finishReason":"STOP"}]}""")
      === "ab")
    // MAX_TOKENS with partial parts keeps the partial content
    assert(parseGenerateResponse(
      """{"candidates":[{"content":{"parts":[{"text":"partial"}]},"finishReason":"MAX_TOKENS"}]}""")
      === "partial")
    val safety = intercept[IllegalStateException] { parseGenerateResponse(
      """{"candidates":[{"content":{"parts":[]},"finishReason":"SAFETY"}]}""") }
    assert(safety.getMessage.contains("SAFETY"))
    val recit = intercept[IllegalStateException] { parseGenerateResponse(
      """{"candidates":[{"finishReason":"RECITATION"}]}""") }
    assert(recit.getMessage.contains("recitation"))
    val maxed = intercept[IllegalStateException] { parseGenerateResponse(
      """{"candidates":[{"finishReason":"MAX_TOKENS"}]}""") }
    assert(maxed.getMessage.contains("max token limit"))
    val blocked = intercept[IllegalStateException] { parseGenerateResponse(
      """{"candidates":[],"promptFeedback":{"blockReason":"SAFETY"}}""") }
    assert(blocked.getMessage.contains("PROMPT_BLOCKED (SAFETY)"))
  }

  test("client drives render -> retry -> parse with estimated usage") {
    val id = "gem-" + System.nanoTime()
    val waits = scala.collection.mutable.ArrayBuffer[Int]()
    val client = GeminiChatClient(
      () => RecordingOpenAiApi(id, failFirst = 1, retryAfterSec = None),
      "gemini-2.5-flash", systemPrompt = Some("sys prompt here"),
      sleeper = waits += _)
    val (text, pTok, cTok) = client.complete("four words of prompt")
    assert(text === "{}")
    assert(waits.toSeq === Seq(4)) // tenacity floor
    // words x 1.3 truncated: 3 (sys) + 4 (prompt) = 7 -> 9; "{}" -> 1
    assert(pTok === 9 && cTok === 1)
    val sent = RecordingOpenAiApi.requests(id)
    assert(sent.size === 2 && sent.map(_.body).distinct.size === 1)
    assert(sent.head.body.contains("sys prompt here\\n\\nfour words of prompt"))
    RecordingOpenAiApi.clear(id)
  }
}
