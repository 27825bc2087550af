package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.operators.Sections

/** preprocess_text + extract_sections parity
  * (document_processor.py:204-252). */
class SectionsSpec extends AnyFunSuite {
  lazy val spark = TestSession.spark
  import spark.implicits._

  private def pre(s: String): String =
    Seq(Tuple1(s)).toDF("t")
      .select(Sections.preprocessText(col("t")).as("p")).as[String].head()

  test("preprocess: collapse whitespace, drop specials, keep punctuation") {
    assert(pre("a  b\t\nc") === "a b c")
    assert(pre("keep .,;:!?-()\"'/ drop @#$%^&*[]{}<>=+~`|\\") ===
      "keep .,;:!?-()\"'/ drop")
    assert(pre("  padded  ") === "padded")
    // Python \w is unicode-aware: letters with diacritics survive
    assert(pre("café résumé") === "café résumé")
    // Python \s is unicode-aware too: NBSP collapses like a space
    assert(pre("a  b") === "a b")
  }

  private def secs(md: String): Seq[(Int, String, Int, String)] =
    Sections.sections(Seq((1L, md)).toDF("id", "text"), "id", "text")
      .select(col("section_index").cast("int"), col("title"), col("level"),
        col("content"))
      .as[(Int, String, Int, String)].collect().sortBy(_._1).toSeq

  test("sections: levels, preamble dropped, raw titles, stripped content") {
    val md = Seq(
      "preamble line one",   // dropped: before the first header
      "",                    //
      "# Top Title",
      "top body a",
      "top body b",
      "## Sub  ",            // title keeps its trailing spaces (raw .+)
      "",
      "sub body",
      "",
      "###### Deep",
      "####### not a header",// 7 hashes: not a header line
      "#nospace not a header",
      "final").mkString("\n")
    assert(secs(md) === Seq(
      (1, "Top Title", 1, "top body a\ntop body b"),
      (2, "Sub  ", 2, "sub body"),
      (3, "Deep", 6, "####### not a header\n#nospace not a header\nfinal")))
  }

  test("sections: no headers means no rows; header-only docs have empty content") {
    assert(secs("just text\nno headers") === Nil)
    assert(secs("# Lonely") === Seq((1, "Lonely", 1, "")))
  }

  test("CRLF lines keep the trailing \\r in titles (Python re semantics)") {
    // split('\n') on CRLF text leaves '\r' on each line; re.match's
    // `.` includes \r and `$` only yields before a final \n, so the
    // title captures 'Title\r' — (?d) pins Java to the same
    val got = secs("# Title\r\nbody\r\n# Next\r\nmore")
    assert(got.map(_._2) === Seq("Title\r", "Next\r"))
    // content lines keep their \r except where strip removes edges
    assert(got.map(_._4) === Seq("body", "more"))
  }
}
