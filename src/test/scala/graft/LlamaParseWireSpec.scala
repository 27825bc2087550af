package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.operators.LlamaParseWire

/** Pins the LlamaParse client's deterministic contracts
  * (llamaparse_service.py:26-409): endpoint base-form resolution,
  * the mime table's missing-.md quirk, legacy tier folding, and the
  * Python-or markdown pick. */
class LlamaParseWireSpec extends AnyFunSuite {
  lazy val spark = TestSession.spark
  import spark.implicits._

  private def one(c: org.apache.spark.sql.Column): Option[String] =
    Seq(1).toDF("x").select(c.cast("string")).as[Option[String]].head()

  test("endpoint: all four base forms land on /api/v1/parsing") {
    val cases = Seq(
      "https://h/api/parsing" -> "https://h/api/parsing/upload",
      "https://h/api/v1" -> "https://h/api/v1/parsing/upload",
      "https://h/api" -> "https://h/api/v1/parsing/upload",
      "https://h" -> "https://h/api/v1/parsing/upload",
      // rstrip removes ALL trailing slashes before the form check
      "https://h/api/v1///" -> "https://h/api/v1/parsing/upload")
    for ((base, want) <- cases)
      assert(one(LlamaParseWire.parsingEndpoint(lit(base),
        lit("/upload"))) === Some(want), base)
  }

  test("mime: case-insensitive table; .md is NOT in it") {
    assert(one(LlamaParseWire.inferMime(lit("A.DOCX"))) ===
      Some("application/vnd.openxmlformats-officedocument" +
        ".wordprocessingml.document"))
    // the service's own native format has no mime arm
    assert(one(LlamaParseWire.inferMime(lit("readme.md"))) ===
      Some("application/octet-stream"))
    assert(one(LlamaParseWire.inferMime(lit("x.htm"))) ===
      Some("text/html"))
  }

  test("tiers: legacy names fold, unknown defaults to balanced") {
    assert(one(LlamaParseWire.parsingMode(lit("simple"))) ===
      Some("cost_effective"))
    assert(one(LlamaParseWire.parsingMode(lit("PREMIUM"))) ===
      Some("agentic"))
    assert(one(LlamaParseWire.parsingMode(lit("nonsense"))) ===
      Some("balanced"))
  }

  test("markdown pick is Python or: empty falls through, all-falsy null") {
    assert(one(LlamaParseWire.normalizedMarkdown(lit(""), lit(""),
      lit("from md"))) === Some("from md"))
    assert(one(LlamaParseWire.normalizedMarkdown(lit(""), lit(""),
      lit(""))) === None)
  }
}
