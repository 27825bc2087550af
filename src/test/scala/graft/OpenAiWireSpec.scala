package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.operators.OpenAiWire._
import graft.operators.{EmbedText, StubEmbedder}

/** The OpenAI wire tier: exact request bodies, the tenacity retry
  * contract (3 attempts, exponential 4..60 with Retry-After taking
  * precedence on 429), and the Embedder plumbing end-to-end. */
class OpenAiWireSpec extends AnyFunSuite {
  lazy val spark = TestSession.spark

  test("batch embed renders the exact embeddings.create payload") {
    val req = renderEmbedBatch("text-embedding-3-small",
      Seq("alpha", "beta \"quoted\"", "line\nbreak"))
    assert(req.path === "/v1/embeddings")
    assert(req.body ===
      """{"model":"text-embedding-3-small","input":["alpha","beta \"quoted\"","line\nbreak"]}""")
  }

  test("chat render: kwargs order, optional system/temperature/effort") {
    val plain = renderChat("gpt-4o-mini", "extract things")
    assert(plain.path === "/v1/chat/completions")
    assert(plain.body ===
      """{"model":"gpt-4o-mini","messages":[{"role":"user","content":"extract things"}],"max_tokens":2000,"temperature":0.7}""")
    val full = renderChat("gpt-4o", "q", Some("you are terse"),
      maxTokens = 512, temperature = Some(0.2), reasoningEffort = Some("low"))
    assert(full.body ===
      """{"model":"gpt-4o","messages":[{"role":"system","content":"you are terse"},{"role":"user","content":"q"}],"max_tokens":512,"temperature":0.2,"reasoning_effort":"low"}""")
  }

  test("gpt-5 models route to the responses API shape") {
    val req = renderChat("gpt-5-mini", "summarize", Some("sys"),
      maxTokens = 128)
    assert(req.path === "/v1/responses")
    assert(req.body ===
      """{"model":"gpt-5-mini","input":[{"role":"system","content":[{"type":"input_text","text":"sys"}]},{"role":"user","content":[{"type":"input_text","text":"summarize"}]}],"max_output_tokens":128,"reasoning":{"effort":"minimal"}}""")
  }

  test("429 retries wait Retry-After and re-send the same body verbatim") {
    val id = "oai-" + System.nanoTime()
    val waits = scala.collection.mutable.ArrayBuffer[Int]()
    val embedder = OpenAiEmbedder(() => RecordingOpenAiApi(id, dim = 8,
      failFirst = 2, retryAfterSec = Some(7)), "text-embedding-3-small", 8,
      sleeper = waits += _)
    val vecs = embedder.embedBatch(Seq("alpha", "beta"))
    // two 429s then success: the server's Retry-After wins both times
    assert(waits.toSeq === Seq(7, 7))
    val sent = RecordingOpenAiApi.requests(id)
    assert(sent.size === 3)
    assert(sent.map(_.body).distinct.size === 1) // same body, verbatim
    // vectors identical to the stub projection: the wire tier is a
    // transparent transport around the same embedding
    assert(vecs.map(_.toSeq) ===
      StubEmbedder(8).embedBatch(Seq("alpha", "beta")).map(_.toSeq))
    RecordingOpenAiApi.clear(id)
  }

  test("429 without Retry-After falls back to tenacity's exponential") {
    val id = "oai-" + System.nanoTime()
    val waits = scala.collection.mutable.ArrayBuffer[Int]()
    val embedder = OpenAiEmbedder(() => RecordingOpenAiApi(id, dim = 8,
      failFirst = 2, retryAfterSec = None), "text-embedding-3-small", 8,
      sleeper = waits += _)
    embedder.embedBatch(Seq("alpha"))
    // wait_exponential(multiplier=1, min=4, max=60): attempts 2 and 3
    // both clamp to the 4s floor
    assert(waits.toSeq === Seq(4, 4))
    assert(backoffSeconds(5) === 8 && backoffSeconds(9) === 60) // clamp top
    RecordingOpenAiApi.clear(id)
  }

  test("the third failure is terminal; non-retryable status is immediate") {
    val id = "oai-" + System.nanoTime()
    val exhausted = intercept[IllegalStateException] {
      OpenAiEmbedder(() => RecordingOpenAiApi(id, failFirst = 3),
        "text-embedding-3-small", 8, sleeper = _ => ())
        .embedBatch(Seq("x"))
    }
    assert(exhausted.getMessage.contains("after 3 attempt"))
    assert(RecordingOpenAiApi.requests(id).size === 3)
    RecordingOpenAiApi.clear(id)
    var posts = 0
    val badRequest = new OpenAiHttp {
      override def post(req: OpenAiRequest) = {
        posts += 1; OpenAiResponse(400, None, "")
      }
    }
    intercept[IllegalStateException] {
      sendWithRetry(badRequest, renderEmbedBatch("m", Seq("x")), _ => ())
    }
    assert(posts === 1) // no retry on a 4xx other than 429
  }

  test("batches beyond the OpenAI cap are a loud error") {
    val e = intercept[IllegalArgumentException] {
      OpenAiEmbedder(() => RecordingOpenAiApi("never"), "m", 8, _ => ())
        .embedBatch(Seq.fill(2049)("x"))
    }
    assert(e.getMessage.contains("2048"))
  }

  test("the chat client drives render -> retry -> parse end to end") {
    val id = "oai-" + System.nanoTime()
    val waits = scala.collection.mutable.ArrayBuffer[Int]()
    val client = OpenAiChatClient(
      () => RecordingOpenAiApi(id, failFirst = 1, retryAfterSec = Some(3)),
      "gpt-4o-mini", systemPrompt = Some("sys"), sleeper = waits += _)
    assert(client.complete("hello") === "{}")
    assert(waits.toSeq === Seq(3))
    val sent = RecordingOpenAiApi.requests(id)
    assert(sent.size === 2 && sent.map(_.body).distinct.size === 1)
    assert(sent.head.body.contains(""""role":"system","content":"sys""""))
    RecordingOpenAiApi.clear(id)
  }

  test("vision prompt: truthy context/ocr arms with their caps") {
    assert(visionPrompt() ===
      Seq("Analyze this image and provide a detailed, searchable description.",
        "Focus on:",
        "1. What the image shows (diagrams, charts, photos, illustrations)",
        "2. Key information conveyed",
        "3. Relevant technical details",
        "4. How it relates to the document context",
        "Keep the description concise but comprehensive for search purposes.")
        .mkString("\n"))
    // empty strings are falsy (`if context:`), present values cap at
    // 500 / 200 chars
    assert(visionPrompt(Some(""), Some("")) === visionPrompt())
    val long = "c" * 600
    val p = visionPrompt(Some(long), Some("OCRTEXT" * 40))
    assert(p.contains("Document context: " + "c" * 500))
    assert(!p.contains("c" * 501))
    assert(p.contains("OCR detected text: " + ("OCRTEXT" * 40).take(200)))
  }

  test("vision chat render: gpt-5 arm vs gpt-4o fallback arm") {
    val five = renderVisionChat("gpt-5-nano", "look", "QUJD")
    // gpt-5 vision stays on chat/completions (NOT the responses API)
    assert(five.path === "/v1/chat/completions")
    assert(five.body ===
      """{"model":"gpt-5-nano","messages":[{"role":"user","content":[{"type":"text","text":"look"},{"type":"image_url","image_url":{"url":"data:image/jpeg;base64,QUJD","detail":"high"}}]}],"max_completion_tokens":300,"temperature":1.0,"reasoning_effort":"minimal"}""")
    val four = renderVisionChat("gpt-4o", "look", "QUJD")
    assert(four.body ===
      """{"model":"gpt-4o","messages":[{"role":"user","content":[{"type":"text","text":"look"},{"type":"image_url","image_url":{"url":"data:image/jpeg;base64,QUJD","detail":"high"}}]}],"max_tokens":2000}""")
  }

  test("vision ladder: arms fall through once each, confidence map") {
    // first two arms fail (429) -> gpt-5-nano answers
    val id = "oai-" + System.nanoTime()
    val got = captionImage(RecordingOpenAiApi(id, failFirst = 2), "QUJD")
    assert(got === VisionCaption("{}", 0.93, "gpt-5-nano"))
    val sent = RecordingOpenAiApi.requests(id)
    assert(sent.map(b => mapperModel(b.body)) ===
      Seq("gpt-5", "gpt-5-mini", "gpt-5-nano"))
    RecordingOpenAiApi.clear(id)
    // all gpt-5 arms fail -> gpt-4o answers as "gpt-4o-fallback"
    val id2 = "oai-" + System.nanoTime()
    val fb = captionImage(RecordingOpenAiApi(id2, failFirst = 3), "QUJD")
    assert(fb === VisionCaption("{}", 0.85, "gpt-4o-fallback"))
    assert(RecordingOpenAiApi.requests(id2).size === 4)
    RecordingOpenAiApi.clear(id2)
    // every arm fails -> empty caption, zero confidence, model "none"
    val id3 = "oai-" + System.nanoTime()
    val none = captionImage(RecordingOpenAiApi(id3, failFirst = 4), "QUJD")
    assert(none === VisionCaption("", 0.0, "none"))
    RecordingOpenAiApi.clear(id3)
  }

  test("caption trims with Python strip semantics (NBSP included)") {
    val api = new OpenAiHttp {
      def post(req: OpenAiRequest): OpenAiResponse = OpenAiResponse(200, None,
        """{"choices":[{"message":{"content":"  a diagram  "}}]}""")
    }
    // Java String.strip would keep neither; Character.isWhitespace
    // misses NBSP/U+2007 — the shared pyStrip set must be in force
    assert(captionImage(api, "QUJD").caption === "a diagram")
  }

  private def mapperModel(body: String): String =
    com.fasterxml.jackson.databind.json.JsonMapper.builder().build()
      .readTree(body).get("model").asText()

  test("EmbedText.embed over the wire tier equals the stub path") {
    import spark.implicits._
    val id = "oai-" + System.nanoTime()
    val docs = (1L to 50L).map(i => (i, s"text $i")).toDF("id", "text")
    val wire = EmbedText.embed(docs, "id", "text",
      () => OpenAiEmbedder(() => RecordingOpenAiApi(id, dim = 8),
        "text-embedding-3-small", 8, _ => ()), batchSize = 20)
      .as[(Long, Seq[Float])].collect().toMap
    val stub = EmbedText.embed(docs, "id", "text",
      () => StubEmbedder(8), batchSize = 20)
      .as[(Long, Seq[Float])].collect().toMap
    assert(wire === stub)
    // every recorded request is a well-formed embeddings payload
    assert(RecordingOpenAiApi.requests(id).forall(r =>
      r.path == "/v1/embeddings" &&
        r.body.startsWith("""{"model":"text-embedding-3-small","input":[""")))
    RecordingOpenAiApi.clear(id)
  }
}
