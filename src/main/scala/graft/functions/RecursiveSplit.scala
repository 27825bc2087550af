package graft.functions

import scala.collection.mutable.ArrayBuffer
import scala.util.matching.Regex

import org.apache.spark.sql.{Column, GraftColumnBridge}
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Recursive structure-aware splitting — the Spark re-expression of
  * the reference's SplitRecursively (split_recursively.rs:22-1042):
  *
  *  - syntax tier (:96-247, :313-374): Python/JS/TS/Rust split at
  *    top-level item boundaries via the lexer-accurate scanners in
  *    [[SyntaxSplit]] (the tree-sitter stand-in); other languages
  *    contribute regex boundary tiers ([[separatorsFor]]).
  *  - separator hierarchy (regex tier, :46-54): paragraph (`\n\n+`) →
  *    line (`\n`) → whitespace (`\s+`); a piece longer than
  *    `chunkSize` is re-split at the next level — the universal
  *    fallback below both syntax and language-regex tiers.
  *  - bottom-up merge (:597-743): adjacent atoms pack greedily into
  *    chunks of at most `chunkSize` chars. The reference's packer is
  *    a cost-minimizing DP where `min_chunk_size` is a soft penalty
  *    (TOO_SMALL_CHUNK_COST, :659); this greedy twin does NOT weigh
  *    it — `minChunkSize` is retained for API parity and validation
  *    only, and small trailing chunks can occur (the q47 oracle pins
  *    the greedy law).
  *  - overlap: the next chunk re-includes the largest whole-atom
  *    suffix of the previous chunk totalling <= `overlap` chars.
  *  - offset fidelity (:818-866): each chunk carries (start, end) char
  *    offsets into the ORIGINAL text plus 1-based line/column of the
  *    start — `text.substring(start, end) == chunk` always holds.
  *
  * Imperative expression (CodegenFallback — one substantial eval per
  * row, nothing left for wholestage codegen to fuse).
  */
object RecursiveSplit {

  val chunkType: StructType = StructType(Seq(
    StructField("start", IntegerType, nullable = false),
    StructField("end", IntegerType, nullable = false),
    StructField("line", IntegerType, nullable = false),
    StructField("column", IntegerType, nullable = false),
    StructField("text", StringType, nullable = false)))

  def split_recursively(text: Column, chunkSize: Int,
      minChunkSize: Int = 1, overlap: Int = 0,
      language: String = "plain"): Column =
    GraftColumnBridge.column(RecursiveSplitExpr(
      GraftColumnBridge.expression(text), chunkSize, minChunkSize, overlap,
      language))

  private[functions] val separators: Array[Regex] =
    Array("\n{2,}".r, "\n".r, "\\s+".r)

  /** Language tier (split_recursively.rs:96-247 uses tree-sitter
    * grammars per language; here each language contributes regex
    * BOUNDARY tiers above the universal paragraph/line/space fallback
    * — the boundaries the grammars would find: headings and fences for
    * markdown, top-level definition starts for code). Lookahead
    * patterns split BEFORE the construct while consuming only the
    * newline, so chunk texts keep the definition header.
    *
    * Languages with a [[SyntaxSplit]] scanner (Python, JS/TS, Rust,
    * Go, C/C++/Java/C#, Scala/Kotlin/Swift) have NO entries here —
    * the scanners intercept them in [[chunkOffsets]] (a regex cannot
    * know that a `def` sits inside a docstring), so a regex tier for
    * them would be unreachable code.
    */
  private[functions] def separatorsFor(language: String): Array[Regex] = {
    val tiers: Seq[String] = language.toLowerCase match {
      case "markdown" | "md" =>
        Seq("\n(?=#{1,6} )", "\n(?=```)")
      case "sql" =>
        Seq("(?i)\n(?=(?:create|alter|drop|insert|select|with|update|delete)\\b)", ";\\s*\n")
      case "php" =>
        Seq("\n(?=\\s*(?:(?:public|private|protected|internal|static|final|abstract|open|sealed)\\s+)*(?:namespace|class|struct|interface|enum|func|function)\\b)")
      case "ruby" | "rb" =>
        Seq("\n(?=(?:class|module|def) )", "\n(?=  def )")
      case "r" =>
        Seq("\n(?=[A-Za-z_.][A-Za-z0-9_.]*\\s*(?:<-|=)\\s*function)")
      case "html" | "xml" =>
        Seq("\n(?=\\s*<(?:h[1-6]|div|section|article|table|head|body|ul|ol)\\b)",
          "\n(?=\\s*<[A-Za-z])")
      case "css" =>
        // lookbehind keeps the closing brace with its rule; only the
        // newline is consumed (the class contract for language tiers)
        Seq("(?<=\\})\n")
      case "json" =>
        Seq("\n(?=\\s{0,2}[\"{\\[])")
      case "toml" | "ini" =>
        Seq("\n(?=\\[)")
      case "yaml" | "yml" =>
        Seq("\n(?=[A-Za-z_][^:\n]*:)", "\n(?=- )")
      case "fortran" =>
        Seq("(?i)\n(?=\\s*(?:subroutine|function|module|program)\\b)")
      case "pascal" =>
        Seq("(?i)\n(?=\\s*(?:procedure|function|unit|program|begin)\\b)")
      case _ => Seq.empty
    }
    (tiers.map(_.r) ++ separators).toArray
  }

  /** Recursively split [s,e) of `text` into atoms of <= chunkSize
    * where separators allow; an unsplittable oversize piece stays one
    * atom (reference keeps oversize leaves intact).
    */
  private def atomize(text: String, s: Int, e: Int, level: Int,
      chunkSize: Int, seps: Array[Regex], out: ArrayBuffer[(Int, Int)]): Unit = {
    if (e - s <= chunkSize) {
      emitTrimmed(text, s, e, out)
      return
    }
    if (level >= seps.length) {
      emitTrimmed(text, s, e, out) // oversize unsplittable leaf stays intact
      return
    }
    val seg = text.substring(s, e)
    val pieces = new ArrayBuffer[(Int, Int)]() // seg-relative content spans
    var last = 0
    for (m <- seps(level).findAllMatchIn(seg)) {
      if (m.start > last) pieces += ((last, m.start))
      last = math.max(last, m.end)
    }
    if (last < seg.length) pieces += ((last, seg.length))
    if (pieces.length == 1 && pieces(0) == ((0, seg.length))) {
      atomize(text, s, e, level + 1, chunkSize, seps, out) // no split: next tier
    } else {
      // a piece holds no separator of this level, so recursion on it
      // either emits it (fits) or descends a tier
      for ((ps, pe) <- pieces)
        atomize(text, s + ps, s + pe, level, chunkSize, seps, out)
    }
  }

  /** Emit a span with surrounding whitespace stripped (content-only
    * atoms — whitespace lives between chunks, never inside offsets'
    * edges). */
  private def emitTrimmed(text: String, s0: Int, e0: Int,
      out: ArrayBuffer[(Int, Int)]): Unit = {
    var s = s0
    var e = e0
    while (s < e && Character.isWhitespace(text.charAt(s))) s += 1
    while (e > s && Character.isWhitespace(text.charAt(e - 1))) e -= 1
    if (e > s) out += ((s, e))
  }

  /** Syntax tier (split_recursively.rs:313-374): top-level items of
    * the span become atoms; an oversized single item opens like the
    * reference's cursor walk — header tokens, the body split one
    * level in, closing tokens — and a span no syntax rule can split
    * falls back to the DEFAULT paragraph/line/space config, exactly
    * the reference's gap behavior (fill_gap uses
    * DEFAULT_LANGUAGE_CONFIG, not the language's own regex tiers). */
  private def syntaxAtomize(text: String, s: Int, e: Int, chunkSize: Int,
      language: String, out: ArrayBuffer[(Int, Int)]): Unit = {
    if (e - s <= chunkSize) {
      emitTrimmed(text, s, e, out)
      return
    }
    val items = SyntaxSplit.items(language, text, s, e)
    if (items.length > 1) {
      for ((is, ie) <- items) syntaxAtomize(text, is, ie, chunkSize, language, out)
    } else {
      // one item (or none): descend into its body
      val (is, ie) = if (items.isEmpty) (s, e) else items(0)
      SyntaxSplit.descend(language, text, is, ie) match {
        case Some((bs, be)) if bs > is || be < ie =>
          atomize(text, is, bs, 0, chunkSize, separators, out) // header tokens
          syntaxAtomize(text, bs, be, chunkSize, language, out)
          atomize(text, be, ie, 0, chunkSize, separators, out) // closing tokens
        case _ =>
          atomize(text, is, ie, 0, chunkSize, separators, out)
      }
    }
  }

  /** Pack atoms into chunks; returns (start, end) offsets. */
  private[functions] def chunkOffsets(text: String, chunkSize: Int,
      minChunkSize: Int, overlap: Int,
      language: String = "plain"): Seq[(Int, Int)] = {
    val atoms = new ArrayBuffer[(Int, Int)]()
    if (SyntaxSplit.supports(language))
      syntaxAtomize(text, 0, text.length, chunkSize, language, atoms)
    else
      atomize(text, 0, text.length, 0, chunkSize, separatorsFor(language), atoms)
    if (atoms.isEmpty) return Seq.empty
    val chunks = new ArrayBuffer[(Int, Int)]()
    var i = 0
    var curStart = atoms(0)._1
    var curEnd = atoms(0)._2
    i = 1
    while (i < atoms.length) {
      val (as, ae) = atoms(i)
      if (ae - curStart <= chunkSize) {
        curEnd = ae
      } else {
        chunks += ((curStart, curEnd))
        // overlap: largest whole-atom suffix of the closed chunk
        // totalling <= overlap chars
        var j = i - 1
        var newStart = as
        while (j >= 0 && atoms(j)._1 >= curStart &&
            curEnd - atoms(j)._1 <= overlap) {
          newStart = atoms(j)._1
          j -= 1
        }
        curStart = newStart
        curEnd = ae
      }
      i += 1
    }
    if (curEnd > curStart) chunks += ((curStart, curEnd))
    chunks.toSeq
  }
}

case class RecursiveSplitExpr(child: Expression, chunkSize: Int,
    minChunkSize: Int, overlap: Int, language: String = "plain")
    extends UnaryExpression with CodegenFallback {
  require(chunkSize > 0 && overlap < chunkSize)

  override def dataType: DataType =
    ArrayType(RecursiveSplit.chunkType, containsNull = false)

  override def nullSafeEval(input: Any): Any = {
    val text = input.asInstanceOf[UTF8String].toString
    val offsets = RecursiveSplit.chunkOffsets(text, chunkSize, minChunkSize,
      overlap, language)
    // line/column of each chunk start via ONE incremental newline
    // scan: chunk starts are non-decreasing (overlap rewinds within
    // the previous chunk, never before its start), so the scan
    // resumes where it left off — the per-chunk restart-from-zero
    // form was O(len·chunks) on long documents (r19 continuation
    // fresh-eyes pass)
    val rows = new Array[Any](offsets.length)
    var line = 1
    var lastNl = -1
    var p = 0
    var k = 0
    while (k < offsets.length) {
      val (s, e) = offsets(k)
      if (s < p) {
        // correctness backstop, unreachable under the monotonic-start
        // invariant above: restart the scan from zero (NOT a tail
        // rescan — a future packer that rewinds starts would reopen
        // the quadratic path and should revisit this)
        line = 1; lastNl = -1; p = 0
      }
      while (p < s) {
        if (text.charAt(p) == '\n') { line += 1; lastNl = p }
        p += 1
      }
      rows(k) = InternalRow(s, e, line, s - lastNl,
        UTF8String.fromString(text.substring(s, e)))
      k += 1
    }
    new GenericArrayData(rows)
  }

  override protected def withNewChildInternal(c: Expression): RecursiveSplitExpr =
    copy(child = c)
  override def prettyName: String = "split_recursively"
}
