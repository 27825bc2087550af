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
