package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.functions.LlmResponse

/** LLM response-content contracts (llm_service.py:396-512). */
class LlmResponseSpec extends AnyFunSuite {
  lazy val spark = TestSession.spark
  import spark.implicits._

  private def strip(s: String): String =
    Seq(Tuple1(s)).toDF("c")
      .select(LlmResponse.stripFence(col("c")).as("s")).as[String].head()

  test("fence stripping follows the reference branch order") {
    assert(strip("```json\n{\"a\": 1}\n```") === "{\"a\": 1}")
    assert(strip("```\nhello world\n```") === "hello world")
    // no closing fence: prefix still drops
    assert(strip("```json\n{\"a\": 1}") === "{\"a\": 1}")
    assert(strip("  plain text  ") === "plain text")
    // ```json wins over the bare ``` tier (never strips twice)
    assert(strip("```json```") === "")
    assert(strip("``````") === "")
  }

  private def parse(s: String): (String, String, Double, Int) =
    Seq(Tuple1(s)).toDF("c")
      .select(LlmResponse.parseMetadata(col("c")).as("m"))
      .select(col("m.title"), col("m.summary"), col("m.confidence"),
        size(col("m.tags")).as("n"))
      .as[(String, String, Double, Int)].head()

  test("graded parse fallbacks: object, garbage, non-object JSON") {
    assert(parse("""{"title": "T", "confidence": 0.9, "tags": ["a","b"]}""") ===
      (("T", null, 0.9, 2)))
    // missing confidence defaults 0.5; missing lists default empty
    assert(parse("""{"summary": "S"}""") === ((null, "S", 0.5, 0)))
    // fenced object parses the same
    assert(parse("```json\n{\"title\": \"F\"}\n```") === (("F", null, 0.5, 0)))
    // unparseable: summary = first 200 chars of the RAW content, 0.3
    val junk = "the model rambled " + ("x" * 300)
    assert(parse(junk) === ((null, junk.take(200), 0.3, 0)))
    // valid JSON but not an object (the .get AttributeError arm): 0.0
    assert(parse("[1, 2, 3]") === ((null, null, 0.0, 0)))
    assert(parse("\"just a string\"") === ((null, null, 0.0, 0)))
    // JSON null parses but is not an object: 0.0, not the 0.3 arm
    assert(parse("null") === ((null, null, 0.0, 0)))
    // trailing garbage after a well-formed object = json.loads
    // Extra-data: the 0.3 degrade arm, NOT a successful parse
    val trailing = "{\"title\": \"X\"}\nLet me know if you need more"
    assert(parse(trailing) === ((null, trailing.take(200), 0.3, 0)))
    // malformed object body: 0.3 arm
    assert(parse("{\"title\": }") === ((null, "{\"title\": }", 0.3, 0)))
    // malformed array: 0.3 arm (shape guard)
    assert(parse("[1, 2") === ((null, "[1, 2", 0.3, 0)))
  }

  test("pySplit/pyStrip cover the U+001C-U+001F separators like CPython") {
    // Py_UNICODE_ISSPACE includes FS/GS/RS/US, which Java's (?U)\s
    // (Unicode White_Space) does not — they must still split/strip
    assert(LlmResponse.pySplit("ab cd").toSeq ===
      Seq("a", "b", "c", "d"))
    assert(LlmResponse.pyStrip("  x y ") === "x y")
    // and no empty tokens on leading/trailing runs
    assert(LlmResponse.pySplit(" lead trail ").toSeq ===
      Seq("lead", "trail"))
  }

  test("cost estimation matches the pricing table; unknown models are free") {
    val got = Seq(
      ("openai", "gpt-4o-mini", 2000L, 1000L),
      ("OpenAI", "gpt-4o", 1000L, 1000L), // provider lowercases
      ("gemini", "gemini-2.5-flash", 10000L, 2000L),
      ("openai", "mystery-model", 999999L, 999999L))
      .toDF("p", "m", "in", "out")
      .select(LlmResponse.estimateCost(col("p"), col("m"), col("in"),
        col("out")).as("c"))
      .as[Double].collect().toSeq
    assert(got(0) === 0.0009) // 2*0.00015 + 1*0.0006
    assert(got(1) === 0.02)   // 0.005 + 0.015
    assert(got(2) === 0.0056) // 10*0.00035 + 2*0.00105
    assert(got(3) === 0.0)
  }

  test("embedding cost: word-count x 1.3 token estimate times the model rate") {
    import graft.operators.EmbedText
    val got = Seq(
      ("text-embedding-3-small", "ten words here padding out to exactly ten words total"),
      ("text-embedding-3-large", "  two   words  "),
      ("no-such-model", "whatever"))
      .toDF("m", "t")
      .select(EmbedText.embedCost(col("m"), col("t")).as("c"))
      .as[Option[Double]].collect().toSeq
    assert(math.abs(got(0).get - (10 * 1.3 / 1000.0) * 0.00002) < 1e-15)
    assert(math.abs(got(1).get - (2 * 1.3 / 1000.0) * 0.00013) < 1e-15)
    assert(got(2) === None) // unknown model: null, not a silent 0
  }
}
