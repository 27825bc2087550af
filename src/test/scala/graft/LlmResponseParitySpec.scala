package graft

import com.fasterxml.jackson.databind.{DeserializationFeature, ObjectMapper}
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.functions.LlmResponse

/** Verbatim port of llm_service.py:474-512 (fence strip + json.loads
  * with the graded fallback arms) compared against the Spark
  * implementation over generated response shapes. json.loads-strict
  * parsing is stood in by Jackson with FAIL_ON_TRAILING_TOKENS. */
object PyLlmResponse {

  // Python str.strip() semantics: str.isspace() is Java isWhitespace
  // PLUS the no-break spaces (NBSP, figure space, narrow NBSP) and
  // NEL, which Java classifies as non-space
  private def isPySpace(ch: Char): Boolean =
    Character.isWhitespace(ch) || ch == '\u00A0' || ch == '\u2007' ||
      ch == '\u202F' || ch == '\u0085'

  private def pyStrip(s: String): String = {
    var a = 0
    var b = s.length
    while (a < b && isPySpace(s.charAt(a))) a += 1
    while (b > a && isPySpace(s.charAt(b - 1))) b -= 1
    s.substring(a, b)
  }

  def stripFence(c0: String): String = {
    var content = pyStrip(c0)
    if (content.startsWith("```json")) {
      content = content.substring(7)
      if (content.endsWith("```"))
        content = content.substring(0, content.length - 3)
      content = pyStrip(content)
    } else if (content.startsWith("```")) {
      content = content.substring(3)
      if (content.endsWith("```"))
        content = content.substring(0, content.length - 3)
      content = pyStrip(content)
    }
    content
  }

  private val mapper = new ObjectMapper()
    .configure(DeserializationFeature.FAIL_ON_TRAILING_TOKENS, true)
    // json.loads accepts NaN/Infinity/-Infinity by default
    .configure(com.fasterxml.jackson.core.JsonParser.Feature
      .ALLOW_NON_NUMERIC_NUMBERS, true)

  /** (title, summary, confidence, n_tags) — the three arms. */
  def parse(raw: String): (Option[String], Option[String], Double, Int) = {
    val cleaned = stripFence(raw)
    // json.loads('') raises; Jackson's readTree('') returns null
    // without throwing, so empty input must route to the decode arm
    // explicitly
    if (cleaned.isEmpty) return (None, Some(raw.take(200)), 0.3, 0)
    val node =
      try mapper.readTree(cleaned)
      catch { case _: Exception =>
        return (None, Some(raw.take(200)), 0.3, 0) // JSONDecodeError arm
      }
    // json.loads' scanner special-cases exactly NaN/Infinity/-Infinity;
    // Jackson's ALLOW_NON_NUMERIC_NUMBERS also takes INF/+INF/+Infinity,
    // which json.loads raises on (the 0.3 arm)
    if (node != null && node.isNumber && node.isDouble &&
      (node.doubleValue.isNaN || node.doubleValue.isInfinite) &&
      cleaned != "NaN" && cleaned != "Infinity" && cleaned != "-Infinity")
      return (None, Some(raw.take(200)), 0.3, 0)
    if (node == null || !node.isObject)
      return (None, None, 0.0, 0) // .get AttributeError arm
    val title = Option(node.get("title")).filter(_.isTextual).map(_.asText)
    val summary = Option(node.get("summary")).filter(_.isTextual).map(_.asText)
    val conf = Option(node.get("confidence")).filter(_.isNumber)
      .map(_.asDouble).getOrElse(0.5)
    val nTags = Option(node.get("tags")).filter(_.isArray).map(_.size).getOrElse(0)
    (title, summary, conf, nTags)
  }
}

class LlmResponseParitySpec extends AnyFunSuite {
  lazy val spark = TestSession.spark
  import spark.implicits._

  private val rng = new scala.util.Random(20260814L)

  // shapes chosen inside the declared parity scope (bare scalars with
  // trailing garbage are the documented residual leniency)
  private val shapes = Seq(
    """{"title": "A", "confidence": 0.7, "tags": ["x"]}""",
    """{"title": "B"}""",
    """{"summary": "S", "tags": ["a", "b", "c"]}""",
    """{}""",
    """{"tags": []}""",
    """{"title": "X"} trailing prose after the object""",
    """{"a": 1}{"b": 2}""", // object + }-suffixed garbage: 0.3 arm
    """{"a": 1} {"b": 2} {"c": 3}""",
    """{"broken": }""",
    """{"unclosed": "v" """,
    "[1, 2]", "[1, 2", "null", "\"str\"", "42", "true",
    "NaN", "Infinity", "-Infinity",
    // Jackson-only non-numeric tokens: json.loads raises on all of
    // these (its scanner special-cases only the three above)
    "+Infinity", "INF", "+INF", "-INF",
    "the model rambled on without any json at all",
    "```json\n[1, 2]\n```",
    "```json\n{\"title\": \"F\", \"confidence\": 0.25}\n```",
    "```\n{\"summary\": \"fenced bare\"}\n```",
    "```json{\"title\": \"tight\"}```",
    "``````", "```json```", "``` loose text fence ```")

  private def gen(): String = {
    val s = shapes(rng.nextInt(shapes.size))
    rng.nextInt(5) match {
      case 0 => s
      case 1 => "  " + s + "\n"
      case 2 => "\t" + s + "  "
      case 3 => "\u000B" + s + "\f" // \v padding: Python strips it too
      case 4 => "\u00A0" + s + "\u0085" // NBSP/NEL: unicode whitespace
    }
  }

  test("parseMetadata matches the strict-json port on 300 generated responses") {
    val rows = Seq.fill(300)(gen())
    val got = rows.toDF("c")
      .select(LlmResponse.parseMetadata(col("c")).as("m"))
      .select(col("m.title"), col("m.summary"), col("m.confidence"),
        size(col("m.tags")).as("n"))
      .as[(Option[String], Option[String], Double, Int)].collect()
    rows.zip(got).foreach { case (in, sp) =>
      val expected = PyLlmResponse.parse(in)
      assert(sp === expected, s"\nin=${in.replace("\n", "\\n")}")
    }
  }

  test("stripFence matches the port on every shape") {
    val rows = shapes ++ Seq.fill(100)(gen())
    val got = rows.toDF("c")
      .select(LlmResponse.stripFence(col("c")).as("s")).as[String].collect()
    rows.zip(got).foreach { case (in, sp) =>
      assert(sp === PyLlmResponse.stripFence(in),
        s"\nin=${in.replace("\n", "\\n")}")
    }
  }
}
