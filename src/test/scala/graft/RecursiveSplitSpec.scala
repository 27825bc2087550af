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

  // ---- syntax tier (the tree-sitter stand-in, SyntaxSplit) ----
  // every case here is one a regex boundary tier CANNOT pass: the
  // boundary-shaped text sits inside a string/comment, or the item
  // needs nesting/continuation awareness

  test("python: a def inside a docstring never becomes a boundary") {
    val py =
      "def alpha():\n" +
        "    \"\"\"doc line\n" +
        "def fake_boundary(y):\n" +
        "    \"\"\"\n" +
        "    return 1\n" +
        "def beta():\n" +
        "    return 2\n" +
        "def gamma():\n" +
        "    return 3\n"
    val cs = langChunks(py, 75, "python")
    // alpha (with its trap docstring) stays whole; no chunk starts at
    // the fake def
    assert(cs.exists(_.contains("def fake_boundary")))
    assert(!cs.exists(_.startsWith("def fake_boundary")))
    // alpha (71 chars, docstring intact) is one chunk; beta + gamma
    // (50 chars together) pack into the next
    assert(cs === Seq(
      py.substring(0, py.indexOf("def beta")).trim,
      py.substring(py.indexOf("def beta")).trim))
  }

  test("python: decorators attach to the definition they decorate") {
    val py =
      "@first\n@second(arg='x')\ndef alpha():\n    return 1\n\n" +
        "def beta():\n    return 2\n\n" +
        "@third\ndef gamma():\n    return 3\n"
    val cs = langChunks(py, 45, "python")
    assert(cs.length === 3)
    assert(cs(0).startsWith("@first\n@second(arg='x')\ndef alpha"))
    assert(cs(2).startsWith("@third\ndef gamma"))
  }

  test("python: an oversized class opens at its methods, header first") {
    val py =
      "class Gamma:\n" +
        "    def m1(self):\n        return 'one one one one'\n" +
        "    def m2(self):\n        return 'two two two two'\n" +
        "    def m3(self):\n        return 'three three three'\n"
    val cs = langChunks(py, 70, "python")
    assert(cs.head.startsWith("class Gamma:"))
    // methods are the atoms one level in: chunks after the first
    // start at method boundaries, never mid-statement
    assert(cs.tail.forall(_.startsWith("def m")))
  }

  test("python: bracket continuation keeps one statement together") {
    val py =
      "xs = [\n    1, 2, 3,\n    4, 5, 6,\n]\n" +
        "ys = 'def not_a_def(z):'\n" +
        "def real():\n    return xs\n"
    val cs = langChunks(py, 42, "python")
    // the list literal spans lines but is ONE atom; the string trap
    // never starts a chunk
    assert(cs.exists(_.startsWith("xs = [")))
    assert(cs.find(_.startsWith("xs")).get.contains("]"))
    assert(!cs.exists(_.startsWith("def not_a_def")))
    assert(cs.exists(_.startsWith("def real")))
  }

  test("js: braces in strings, template literals and regexes don't split") {
    val js =
      "function alpha(x) {\n  const s = \"} not a close {\";\n  return s + x;\n}\n" +
        "function beta(y) {\n  const t = `tpl ${y} with } brace`;\n  return t;\n}\n" +
        "function gamma(z) {\n  const re = /}{/g;\n  return re.test(z);\n}\n"
    val cs = langChunks(js, 80, "js")
    assert(cs.length === 3)
    assert(cs.forall(_.startsWith("function ")))
    assert(cs.forall(_.endsWith("}")))
  }

  test("js: if/else and try/catch stay one item; semicolon items split") {
    val js =
      "if (a) {\n  one();\n} else {\n  two();\n}\n" +
        "try {\n  three();\n} catch (e) {\n  four();\n}\n" +
        "const x = { a: 1, b: 2 };\n"
    val cs = langChunks(js, 45, "js")
    assert(cs.length === 3)
    assert(cs(0).contains("else"))
    assert(cs(1).contains("catch"))
    assert(cs(2).startsWith("const x"))
  }

  test("js: an oversized class opens at its methods") {
    val js =
      "class Gamma {\n" +
        "  m1() { return 'one one one one one'; }\n" +
        "  m2() { return 'two two two two two'; }\n" +
        "  m3() { return 'three three three'; }\n" +
        "}\n"
    val cs = langChunks(js, 80, "js")
    assert(cs.head.startsWith("class Gamma {"))
    assert(cs.tail.exists(c => c.startsWith("m2") || c.startsWith("m3")))
  }

  test("js: for-header semicolons and keyword-prefixed regexes don't split items") {
    val js =
      "function alpha(n) {\n  for (let i = 0; i < n; i++) { work(i); }\n  return n;\n}\n" +
        "function beta(s) {\n  return /[}]/.test(s);\n}\n" +
        "function gamma(x) {\n  return x + 1;\n}\n"
    val cs = langChunks(js, 90, "js")
    // the for-header ';' at brace depth 0 of the descended body, and
    // the '}' inside the regex class after `return`, are not
    // boundaries: every chunk starts at a function
    assert(cs.forall(_.startsWith("function ")))
    assert(cs.exists(c => c.startsWith("function alpha") && c.contains("i++")))
    assert(cs.exists(c => c.startsWith("function beta") && c.endsWith("}")))
  }

  test("rust: array types with ';' and a while after a block stay intact") {
    val rs =
      "static TABLE: [u8; 4] = [1, 2, 3, 4];\n" +
        "fn alpha(n: u64) -> u64 {\n    if n > 2 { init(); }\n    while check() { tick(); }\n    n\n}\n" +
        "fn beta() -> u64 { 7 }\n"
    val cs = langChunks(rs, 60, "rust")
    // '[u8; 4]' never splits; the static is one item
    assert(cs.exists(_.startsWith("static TABLE: [u8; 4]")))
    // rust has no do-while: the while inside alpha's descended body is
    // its own atom, not glued to the if-block
    assert(cs.exists(_.startsWith("while check")))
    assert(!cs.exists(c => c.contains("if n > 2") && c.contains("while check")))
    assert(cs.exists(_.contains("fn beta")))
  }

  test("js: an oversized item with a braced template literal descends sanely") {
    val js = "function alpha() {\n" +
      "  const q = `select { a, b } from ${table} where x`;\n" +
      "  const r = `another { braced } template literal body`;\n" +
      "  return q + r;\n}\n"
    val cs = langChunks(js, 60, "js")
    // body atoms are the three statements; no chunk starts inside a
    // template literal's braces
    assert(cs.head.startsWith("function alpha() {"))
    assert(!cs.exists(_.startsWith("a, b")))
    assert(!cs.exists(_.startsWith("braced")))
    assert(cs.exists(_.startsWith("const q")))
  }

  test("python: comments and blank lines between decorator and def stay attached") {
    val py =
      "@wrap\n# disabled until r9\n\ndef alpha():\n    return 1\n\n" +
        "def beta():\n    return 2\n"
    val cs = langChunks(py, 55, "python")
    assert(cs.length === 2)
    assert(cs(0).startsWith("@wrap"))
    assert(cs(0).contains("def alpha"))
    assert(cs(1).startsWith("def beta"))
  }

  test("rust: raw strings, nested comments and lifetimes don't split") {
    val rs =
      "fn alpha() -> String {\n    let s = r#\"} fn fake() { \"#;\n    s.to_string()\n}\n" +
        "/* outer /* nested } */ still comment */\n" +
        "fn beta<'a>(x: &'a str) -> &'a str {\n    x\n}\n" +
        "fn gamma() -> char {\n    '}'\n}\n"
    val cs = langChunks(rs, 78, "rust")
    // alpha keeps its raw-string trap whole; no boundary inside it
    assert(cs.exists(c => c.startsWith("fn alpha") && c.contains("fn fake")))
    assert(!cs.exists(_.startsWith("fn fake")))
    // beta + gamma pack into one 76-char chunk at size 78 (the merge
    // is the point: atoms are the three fns, never fragments)
    assert(cs.exists(_.startsWith("fn beta")))
    assert(cs.exists(_.contains("fn gamma")))
    assert(cs.filter(_.startsWith("fn ")).forall(_.endsWith("}")))
  }

  test("rust: attributes and doc comments pack with their item") {
    val rs =
      "#[derive(Debug, Clone)]\nstruct Alpha { x: i64 }\n" +
        "/// beta doc\nfn beta() -> i64 { 42 }\n" +
        "const GAMMA: &str = \"fn trap() {\";\n"
    val cs = langChunks(rs, 50, "rust")
    assert(cs.exists(c => c.startsWith("#[derive") && c.contains("struct Alpha")))
    assert(cs.exists(c => c.startsWith("/// beta doc") && c.contains("fn beta")))
    assert(!cs.exists(_.startsWith("fn trap")))
  }

  test("rust: an oversized impl opens at its fns") {
    val rs =
      "impl Gamma {\n" +
        "    fn m1(&self) -> &str { \"one one one one\" }\n" +
        "    fn m2(&self) -> &str { \"two two two two\" }\n" +
        "    fn m3(&self) -> &str { \"three three three\" }\n" +
        "}\n"
    val cs = langChunks(rs, 95, "rust")
    assert(cs.head.startsWith("impl Gamma {"))
    assert(cs.tail.exists(_.startsWith("fn m")))
  }

  test("go: newline termination, raw strings, func items") {
    val go =
      "package main\n\n" +
        "var table = `raw { braced } func fake() {`\n\n" +
        "func alpha(n int) int {\n\tif n > 2 {\n\t\treturn n\n\t}\n\treturn 0\n}\n\n" +
        "func beta() string {\n\treturn \"x\"\n}\n"
    val cs = langChunks(go, 60, "go")
    // newline ends package/var statements (no semicolons in Go); the
    // raw string's braces and fake func never split
    assert(cs.exists(_.startsWith("package main")))
    assert(!cs.exists(_.startsWith("func fake")))
    assert(cs.exists(_.startsWith("func alpha")))
    assert(cs.exists(c => c.contains("func beta") && c.endsWith("}")))
  }

  test("scala: newline termination, annotations attach, chains continue") {
    val sc =
      "val alpha = 1\n" +
        "val beta = items\n  .map(x => x + 1)\n  .filter(_ > 0)\n\n" +
        "@tailrec\ndef gamma(n: Int): Int =\n  if (n <= 0) 0 else gamma(n - 1)\n\n" +
        "def delta(): String = \"def fake() {\"\n"
    val cs = langChunks(sc, 60, "scala")
    // the builder chain is ONE item (leading-dot lines continue);
    // @tailrec stays with gamma; the string trap never splits
    assert(cs.exists(c => c.startsWith("val beta") && c.contains(".filter")))
    assert(cs.exists(c => c.startsWith("@tailrec") && c.contains("def gamma")))
    assert(!cs.exists(_.startsWith("def fake")))
  }

  test("c: preprocessor lines are their own items; semicolon rules hold") {
    val c =
      "#include <stdio.h>\n#define MAX 10\n\n" +
        "int alpha(int n) {\n    for (int i = 0; i < n; i++) { work(i); }\n    return n;\n}\n\n" +
        "static const char *s = \"} int fake() {\";\n"
    val cs = langChunks(c, 60, "c")
    // the EOL-terminated preproc atoms pack with alpha's header; the
    // descended body keeps the for-header (its ';'s are not
    // boundaries) and closes its own brace
    assert(cs.head.startsWith("#include") && cs.head.endsWith("int alpha(int n) {"))
    assert(cs.exists(c0 => c0.startsWith("for (int i = 0;") &&
      c0.contains("i++") && c0.endsWith("}")))
    assert(!cs.exists(_.startsWith("int fake")))
    assert(cs.exists(_.startsWith("static const char")))
  }

  test("java: annotations attach and methods split inside an oversized class") {
    val j =
      "public class Alpha {\n" +
        "    @Override\n    public int m1() { return 11111; }\n" +
        "    public int m2() { return 22222; }\n" +
        "    public int m3() { return 33333; }\n" +
        "}\n"
    val cs = langChunks(j, 75, "java")
    // the class header packs with the annotated m1 (annotation and
    // method are one atom); m2/m3 start the next chunk at a method
    // boundary
    assert(cs.head.startsWith("public class Alpha {"))
    assert(cs.head.contains("@Override\n    public int m1"))
    assert(cs.tail.exists(_.startsWith("public int m2")))
  }

  test("go/c: a trailing line comment does not swallow the newline boundary") {
    // the comment skip used to jump past '\n', so the ASI/preproc
    // newline-termination check never fired on commented lines
    val go = "x := 1 // note\ny := 2\n"
    val gcs = langChunks(go, 15, "go")
    assert(gcs.exists(_.startsWith("x := 1")) && gcs.exists(_.startsWith("y := 2")))
    assert(!gcs.exists(c => c.contains("x := 1") && c.contains("y := 2")))
    val c = "#define MAX 10 // limit\nint alpha;\n"
    val ccs = langChunks(c, 25, "c")
    assert(ccs.exists(_.startsWith("#define")) &&
      ccs.exists(_.startsWith("int alpha")))
    assert(!ccs.exists(x => x.contains("#define") && x.contains("int alpha")))
  }

  test("scala: triple-quoted strings hide quotes and braces from the lexer") {
    val sc = "val s = \"\"\"a \" b { c\"\"\"\nval t = 1\nval u = 2\n"
    val cs = langChunks(sc, 24, "scala")
    // the triple-quoted item closes at its newline (the embedded
    // quote no longer flips string parity, the '{' no longer corrupts
    // depth); val t / val u pack into the next chunk
    assert(cs.exists(_.startsWith("val t")))
    assert(!cs.exists(c => c.contains("val s") && c.contains("val u")))
  }

  test("csharp: verbatim strings treat backslash as literal") {
    val cs0 = "string p = @\"C:\\dir\\\";\nint alpha = 1;\n"
    val cs = langChunks(cs0, 24, "csharp")
    assert(cs.exists(_.startsWith("string p")))
    assert(cs.exists(_.startsWith("int alpha")))
    assert(!cs.exists(c => c.contains("string p") && c.contains("int alpha")))
  }

  test("scala: an annotated one-liner still newline-terminates") {
    // only an annotation-ONLY line awaits its definition; the @-guard
    // used to disable ASI for the whole item forever
    val sc = "@volatile var counter = 0\nval a = 1\nval b = 2\n"
    val cs = langChunks(sc, 28, "scala")
    assert(cs.exists(_.startsWith("@volatile var counter")))
    assert(cs.exists(_.startsWith("val a")))
    assert(!cs.exists(c => c.contains("counter") && c.contains("val a")))
  }

  test("scala: a standalone while loop is not a do-while continuation") {
    val sc = "var i = 0\nwhile (i < 10) { i += 1 }\nval z = 5\n"
    val cs = langChunks(sc, 26, "scala")
    assert(cs.exists(_.startsWith("var i = 0")))
    assert(cs.exists(_.startsWith("while (i < 10)")))
    assert(!cs.exists(c => c.contains("var i = 0") && c.contains("while")))
  }

  test("syntax tier: offsets still reconstruct the original text") {
    val py = "def a():\n    return '}'\n\ndef b():\n    return \"def c():\"\n"
    val rows = Seq(py).toDF("t")
      .select(explode(split_recursively($"t", 30, 1, 0, "python")).as("c"))
      .select($"c.start", $"c.end", $"c.text")
      .as[(Int, Int, String)].collect()
    rows.foreach { case (s, e, txt) => assert(py.substring(s, e) === txt) }
  }

  test("line/column stay correct across MANY chunks with overlap — " +
      "the incremental newline scan agrees with a per-chunk brute " +
      "recompute on a long multi-line document") {
    val text = (1 to 120).map(i => s"para $i line a\npara $i line b")
      .mkString("\n\n")
    val rows = chunksOf(text, 60, overlap = 20)
    assert(rows.length > 50, s"fixture must produce many chunks: ${rows.length}")
    rows.foreach { r =>
      val s = r.getInt(0)
      val brute = text.substring(0, s)
      val line = 1 + brute.count(_ == '\n')
      val colFrom = brute.lastIndexOf('\n')
      assert(r.getInt(2) === line, s"line at start $s")
      assert(r.getInt(3) === s - colFrom, s"column at start $s")
      assert(text.substring(s, r.getInt(1)) === r.getString(4))
    }
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
