package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.operators.QueryStream

/** Streaming-answer request glue (app/api/query.py:38-57, 104-119,
  * 164-166). */
class QueryStreamSpec extends AnyFunSuite {
  lazy val spark = TestSession.spark
  import spark.implicits._

  test("providerFromModel: prefixes case-insensitive, null/other default OPENAI") {
    val got = Seq(Some("gpt-4o"), Some("GPT-5"), Some("gemini-2.5-pro"),
      Some("Gemini-Flash"), Some("claude-3"), Some(""), None)
      .toDF("m")
      .select(QueryStream.providerFromModel(col("m")))
      .as[String].collect().toSeq
    assert(got === Seq("OPENAI", "OPENAI", "GEMINI", "GEMINI", "OPENAI",
      "OPENAI", "OPENAI"))
  }

  test("filterEntries: multi wins, EMPTY multi falls back to single, absent drops") {
    def run(deps: Option[Seq[String]], dep: Option[String],
        trs: Option[Seq[String]], tr: Option[String]) =
      Seq((deps, dep, trs, tr)).toDF("deps", "dep", "trs", "tr")
        .select(explode_outer(QueryStream.filterEntries(col("deps"),
          col("dep"), col("trs"), col("tr"))).as("f"))
        .select(col("f.filter_key"), col("f.filter_value"))
        .as[(String, String)].collect().toSeq
    // multi-select present: wins over the deprecated single
    assert(run(Some(Seq("eng", "hr")), Some("legacy"), None, None) ===
      Seq(("metadata.department", "eng"), ("metadata.department", "hr")))
    // present-but-EMPTY multi is falsy in Python -> single applies
    assert(run(Some(Seq()), Some("legacy"), None, None) ===
      Seq(("metadata.department", "legacy")))
    // both keys render together, dot-notation payload paths
    assert(run(None, Some("eng"), Some(Seq("internal")), Some("ignored")) ===
      Seq(("metadata.department", "eng"),
        ("metadata.security_level", "internal")))
    // nothing set: no entries (explode_outer keeps one null row)
    assert(run(None, None, None, None) === Seq((null, null)))
    // an EMPTY-STRING single-select still emits its entry: the
    // reference's truthiness test is on the fallback LIST ([""] is
    // truthy), not the string (query.py:41-45) — pinned so nobody
    // "fixes" this into a string-truthiness check
    assert(run(None, Some(""), None, None) ===
      Seq(("metadata.department", "")))
  }

  test("streamFrames: 200-char frames, exact multiples, empty yields none") {
    val got = Seq("a" * 450, "b" * 400, "c" * 12, "", null)
      .toDF("t")
      .select(QueryStream.streamFrames(col("t")).as("f"))
      .select(size(col("f")).as("n"),
        transform(col("f"), x => length(x)).as("lens"))
      .as[(Int, Seq[Int])].collect().toSeq
    assert(got === Seq(
      (3, Seq(200, 200, 50)), // 450 -> 200/200/50
      (2, Seq(200, 200)),     // exact multiple: NO empty trailing frame
      (1, Seq(12)),
      (0, Seq()),             // empty answer yields zero frames
      (0, Seq())))            // null answer = `content or ""`
  }

  test("streamFrames preserves content and boundaries") {
    val text = (1 to 90).map(i => f"$i%04d").mkString // 360 chars
    val frames = Seq(text).toDF("t")
      .select(QueryStream.streamFrames(col("t")))
      .as[Seq[String]].head()
    assert(frames.mkString === text)
    assert(frames.map(_.length) === Seq(200, 160))
  }

  test("errorTrailer renders the stream's final error frame") {
    val got = Seq(Some("boom"), None).toDF("m")
      .select(QueryStream.errorTrailer(col("m")))
      .as[String].collect().toSeq
    assert(got === Seq("\n[error] boom", "\n[error] "))
  }
}
