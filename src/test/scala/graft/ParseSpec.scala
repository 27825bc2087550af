package graft

import java.util.concurrent.atomic.AtomicInteger

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.operators.{Parse, ParserClient, StubParserClient}

/** Counts client batches and rows; marks output so bypass rows are
  * provably untouched by the client. */
object CountingParser {
  val batches = new AtomicInteger(0)
  val rows = new AtomicInteger(0)
}
final case class CountingParser() extends ParserClient {
  def parseBatch(docs: Seq[(String, String)],
      config: Map[String, String]): Seq[String] = {
    CountingParser.batches.incrementAndGet()
    CountingParser.rows.addAndGet(docs.size)
    docs.map { case (_, c) => "LLP:" + config("parsing_instruction").take(7) + ":" + c }
  }
}

class ParseSpec extends AnyFunSuite {
  lazy val spark = TestSession.spark
  import spark.implicits._

  private def frame(rows: (Long, String, String, String, String)*) =
    rows.toDF("id", "name", "url", "content", "tier")

  test("routing precedence: inline beats simple beats llamaparse") {
    // doc 1: no url + content → inline even though the name is .txt
    // (document_tasks.py checks source_url before any parser runs)
    val df = frame(
      (1L, "a.txt", null, "inline body", "balanced"),
      (2L, "b.md", "s3://x/b.md", "md body", "balanced"),
      (3L, "c.pdf", "s3://x/c.pdf", "pdf body", "agentic"))
    val got = Parse.parse(df, "id", "name", "url", "content", "tier",
        () => StubParserClient())
      .orderBy($"id")
      .select($"parser", $"parse_tier", $"parsed_text").as[(String, String, String)]
      .collect().toSeq
    assert(got === Seq(
      ("inline_content", null, "inline body"),
      ("simple", null, "md body"),
      ("llamaparse", "agentic", "pdf body")))
  }

  test("confidence: tier bases, length bumps, cap, fixed routes") {
    val short = "x" * 100
    val mid = "x" * 2000
    val long = "x" * 6000
    val df = frame(
      (1L, "a.pdf", "u", short, "balanced"),       // 0.7
      (2L, "b.pdf", "u", mid, "balanced"),         // 0.7 + 0.05
      (3L, "c.pdf", "u", long, "balanced"),        // 0.7 + 0.05 + 0.05
      (4L, "d.pdf", "u", long, "agentic"),         // 0.85 + 0.10
      (5L, "e.pdf", "u", long, "agentic_plus"),    // 0.95 + 0.10 → capped 1.0
      (6L, "f.txt", "u", short, "balanced"),       // simple → 1.0
      (7L, "g.pdf", null, short, "balanced"))      // inline → 0.9
    val got = Parse.parse(df, "id", "name", "url", "content", "tier",
        () => StubParserClient())
      .orderBy($"id").select($"parse_confidence").as[Double].collect().toSeq
    assert(got(0) === 0.7)
    assert(got(1) === 0.7 + 0.05)
    assert(got(2) === 0.7 + 0.05 + 0.05)
    assert(got(3) === 0.85 + 0.05 + 0.05)
    assert(got(4) === 1.0)
    assert(got(5) === 1.0)
    assert(got(6) === 0.9)
  }

  test("client sees only llamaparse rows, one call per tier per batch") {
    CountingParser.batches.set(0)
    CountingParser.rows.set(0)
    val rows = (1L to 20L).map { i =>
      val tier = if (i % 2 == 0) "balanced" else "agentic"
      if (i <= 4) (i, s"d$i.txt", s"u$i", s"body$i", tier)       // simple ×4
      else (i, s"d$i.pdf", s"u$i", s"body$i", tier)              // llamaparse ×16
    }
    val out = Parse.parse(frame(rows: _*).coalesce(1), "id", "name", "url",
      "content", "tier", () => CountingParser(), batchSize = 8)
    // no orderBy here: a global sort samples its child first, running
    // the side-effecting map stage twice and double-counting batches
    val parsed = out
      .select($"id", $"parser", $"parsed_text").as[(Long, String, String)]
      .collect().sortBy(_._1).map(r => (r._2, r._3))
    // the client saw exactly the llamaparse rows — bypass rows never
    // cross the boundary (Partitioning.spread scatters rows, so the
    // call count only bounds above by the row count)
    assert(CountingParser.rows.get() === 16)
    assert(CountingParser.batches.get() <= 16)
    parsed.foreach { case (route, text) =>
      if (route == "llamaparse") assert(text.startsWith("LLP:"))
      else assert(!text.startsWith("LLP:"))
    }
    // tier config reaches the client (parsing_instruction differs by tier)
    assert(parsed.collect { case ("llamaparse", t) => t.split(":")(1) }.toSet
      === Set("Extract"))
  }

  test("parsed_text_length tracks the parsed output, not the input") {
    val df = frame((1L, "a.pdf", "u", "abc", "balanced"))
    val got = Parse.parse(df, "id", "name", "url", "content", "tier",
        () => CountingParser())
      .select($"parsed_text_length").as[Long].head()
    assert(got === "LLP:Extract:abc".length.toLong)
  }
}
