package graft

import org.apache.spark.sql.Row
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.functions.RecursiveSplit.split_recursively

/** Mirrors the reference's inline splitter tests
  * (split_recursively.rs:1044-1359): separator hierarchy, offset
  * reconstruction, overlap, oversize leaves, unicode.
  */
class RecursiveSplitSpec extends AnyFunSuite {
  lazy val spark = TestSession.spark
  import spark.implicits._

  private def chunksOf(text: String, size: Int, overlap: Int = 0): Seq[Row] =
    Seq(text).toDF("t")
      .select(explode(split_recursively($"t", size, 1, overlap)).as("c"))
      .select($"c.start", $"c.end", $"c.line", $"c.column", $"c.text")
      .collect().toSeq

  test("paragraph separator splits first; offsets reconstruct the text") {
    val text = "para one here.\n\npara two is a bit longer.\n\nshort."
    val cs = chunksOf(text, 30)
    assert(cs.nonEmpty)
    cs.foreach { r =>
      assert(text.substring(r.getInt(0), r.getInt(1)) === r.getString(4))
    }
    // no chunk crosses a paragraph boundary at this size
    assert(cs.exists(_.getString(4) === "para one here."))
    assert(cs.exists(_.getString(4) === "para two is a bit longer."))
  }

  test("oversize paragraph descends to line then word tier") {
    val longPara = ("word " * 60).trim // 299 chars, no newlines
    val cs = chunksOf(longPara, 50)
    assert(cs.forall(r => r.getString(4).length <= 50))
    assert(cs.forall(r => !r.getString(4).startsWith(" ")))
    // word boundaries respected
    assert(cs.forall(r => r.getString(4).split(" ").forall(_ == "word")))
  }

  test("an unsplittable oversize token stays one atom") {
    val giant = "x" * 500
    val cs = chunksOf(s"small words $giant more", 100)
    assert(cs.exists(_.getString(4) === giant))
  }

  test("line/column are 1-based and correct across newlines") {
    val text = "ab\ncd\n\nefgh"
    val cs = chunksOf(text, 4)
    val byText = cs.map(r => r.getString(4) -> (r.getInt(2), r.getInt(3))).toMap
    assert(byText("ab") === (1, 1))
    assert(byText("cd") === (2, 1))
    assert(byText("efgh") === (4, 1))
  }

  test("overlap re-includes whole-atom suffix of the previous chunk") {
    val text = "aaaa bbbb cccc dddd eeee"
    val cs = chunksOf(text, 10, overlap = 5).sortBy(_.getInt(0))
    // chunks overlap by one 4-char atom (+separator)
    assert(cs.length >= 2)
    val first = cs(0)
    val second = cs(1)
    assert(second.getInt(0) < first.getInt(1)) // genuine overlap
    cs.foreach(r => assert(text.substring(r.getInt(0), r.getInt(1)) === r.getString(4)))
  }

  test("unicode text reconstructs exactly (CJK + emoji)") {
    val text = "日本語のテキスト 🙂🙂🙂 and ascii words here\n\nsecond 段落 content"
    val cs = chunksOf(text, 20)
    cs.foreach { r =>
      assert(text.substring(r.getInt(0), r.getInt(1)) === r.getString(4))
    }
  }

  test("empty and whitespace-only inputs yield no chunks") {
    assert(chunksOf("", 10).isEmpty)
    assert(chunksOf("   \n\n  ", 10).isEmpty)
  }

  private def langChunks(text: String, size: Int, lang: String): Seq[String] =
    Seq(text).toDF("t")
      .select(explode(split_recursively($"t", size, 1, 0, lang)).as("c"))
      .select($"c.text").as[String].collect().toSeq

  test("markdown tier splits at heading boundaries before paragraphs") {
    val md = "# One\nalpha beta gamma.\n# Two\ndelta epsilon zeta.\n# Three\neta theta."
    val cs = langChunks(md, 40, "markdown")
    assert(cs.length === 3)
    assert(cs.forall(_.startsWith("# ")))
    // plain tier has no heading boundary: single-newline tier splits lines
    val plain = langChunks(md, 40, "plain")
    assert(plain !== cs)
  }

  test("python tier keeps def headers with their bodies") {
    val py = "def alpha():\n    return 1\ndef beta():\n    return 2\ndef gamma():\n    return 3"
    val cs = langChunks(py, 40, "python")
    assert(cs.length === 3)
    assert(cs.forall(_.startsWith("def ")))
  }

  test("sql tier splits on statement starts") {
    val sql = "CREATE TABLE t (a INT);\nINSERT INTO t VALUES (1);\nSELECT * FROM t WHERE a > 0"
    val cs = langChunks(sql, 40, "sql")
    assert(cs.length === 3)
  }

  test("unknown language falls back to the universal tiers") {
    val text = "para one here.\n\npara two is longer text."
    assert(langChunks(text, 30, "klingon") === langChunks(text, 30, "plain"))
  }

  test("ruby tier splits at def/class; html at block tags; yaml at top keys") {
    val rb = "def alpha\n  1\nend\ndef beta\n  2\nend\ndef gamma\n  3\nend"
    val rcs = langChunks(rb, 25, "ruby")
    assert(rcs.length === 3 && rcs.forall(_.startsWith("def ")))

    val html = "<div>\n  <p>alpha</p>\n</div>\n<div>\n  <p>beta</p>\n</div>\n<div>\n  <p>gamma</p>\n</div>"
    val hcs = langChunks(html, 30, "html")
    assert(hcs.length === 3 && hcs.forall(_.startsWith("<div>")))

    val yaml = "alpha:\n  x: 1\n  y: 2\nbeta:\n  z: 3\ngamma:\n  w: 4"
    val ycs = langChunks(yaml, 22, "yaml")
    assert(ycs.length === 3)
    assert(ycs.map(_.takeWhile(_ != ':')) === Seq("alpha", "beta", "gamma"))
  }

  test("toml tier splits at table headers; css after rule close") {
    val toml = "[server]\nhost = \"a\"\nport = 1\n[client]\nhost = \"b\"\n[misc]\nflag = true"
    val tcs = langChunks(toml, 30, "toml")
    assert(tcs.length === 3 && tcs.forall(_.startsWith("[")))

    val css = ".a {\n  color: red;\n}\n.b {\n  color: blue;\n}\n.c {\n  color: green;\n}"
    val ccs = langChunks(css, 25, "css")
    assert(ccs.length === 3 && ccs.forall(_.contains("color")))
    // the lookbehind separator must keep every rule's closing brace
    assert(ccs.forall(_.endsWith("}")))
  }
}
