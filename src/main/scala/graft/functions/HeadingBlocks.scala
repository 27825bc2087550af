package graft.functions

import java.util.regex.Pattern

import org.apache.spark.sql.Column
import org.apache.spark.sql.GraftColumnBridge
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Markdown heading-block split — the two-tier chunker's structural
  * pre-pass (reference two_tier_chunker.py:94-133
  * `_split_into_heading_blocks`), semantics carried exactly:
  *
  *  - blocks are delimited by `^#{1,6}\s+...` heading lines
  *    (multiline);
  *  - each block is (heading line, body-until-next-heading), both
  *    trimmed;
  *  - text before the first heading (the preamble) is merged into the
  *    FIRST heading block's body as `preamble \n\n body` so a
  *    document's intro stays attached to its first section;
  *  - no headings at all → one (null, trimmed text) block; blank text
  *    → empty array.
  *
  * Line endings: input is normalized to LF first (\r\n, lone \r, NEL,
  * LS, PS → \n — the union of Python splitlines() terminators and
  * Java's MULTILINE `^` set), so a \r-only heading line separates from
  * its body and CRLF bodies re-join with \n, matching the reference's
  * splitlines()/'\n'.join round-trip. Python's \v and \f splitlines
  * terminators are deliberately NOT treated as line breaks (neither
  * engine's `^` matches after them; they never delimit headings).
  */
object HeadingBlocks {

  def headingBlocksOf(text: Column): Column =
    GraftColumnBridge.column(
      HeadingBlocksExpr(GraftColumnBridge.expression(text)))

  private val headingPattern =
    Pattern.compile("^(#{1,6})\\s+.*$", Pattern.MULTILINE)

  // strip set pinned to exactly space/tab/LF/CR so the DuckDB oracle's
  // trim(x, ' '||chr(9)||chr(10)||chr(13)) is character-identical
  // (Java trim strips every char <= U+0020, which SQL trim can't say)
  private def strip(s: String): String = {
    var a = 0
    var b = s.length
    def ws(c: Char) = c == ' ' || c == '\t' || c == '\n' || c == '\r'
    while (a < b && ws(s.charAt(a))) a += 1
    while (b > a && ws(s.charAt(b - 1))) b -= 1
    s.substring(a, b)
  }

  // \r\n then the remaining single-char terminators → \n; keeps the
  // regex split and the strip set line-ending-agnostic
  private def normalizeNewlines(s: String): String = {
    def needsWork(str: String): Boolean = {
      var i = 0
      while (i < str.length) {
        val c = str.charAt(i)
        if (c == '\r' || c == '\u0085' || c == '\u2028' || c == '\u2029') return true
        i += 1
      }
      false
    }
    // LF-only text (the overwhelming case) returns the SAME instance —
    // no per-document copy on the hot path
    if (!needsWork(s)) s
    else s.replace("\r\n", "\n").map {
      case '\r' | '\u0085' | '\u2028' | '\u2029' => '\n'
      case c => c
    }
  }

  /** The pure split (heading is null for the no-heading block) —
    * shared by [[HeadingBlocksExpr]] and the faithful two-tier row
    * tier ([[graft.operators.TwoTierRow]]). */
  def split(textRaw: String): Vector[(String, String)] = {
    val text = normalizeNewlines(textRaw)
    val m = headingPattern.matcher(text)
    val starts = Iterator.continually(m)
      .takeWhile(_.find()).map(_.start()).toVector
    if (starts.isEmpty) {
      val t = strip(text)
      if (t.isEmpty) Vector.empty else Vector((null, t))
    } else {
      val preamble = strip(text.substring(0, starts(0)))
      starts.zipWithIndex.map { case (s, i) =>
        val end = if (i < starts.length - 1) starts(i + 1) else text.length
        val blockText = strip(text.substring(s, end))
        val nl = blockText.indexOf('\n')
        val headingLine = strip(if (nl < 0) blockText else blockText.substring(0, nl))
        val bodyTxt = strip(if (nl < 0) "" else blockText.substring(nl + 1))
        val merged =
          if (i == 0 && preamble.nonEmpty)
            preamble + (if (bodyTxt.nonEmpty) "\n\n" + bodyTxt else "")
          else bodyTxt
        (headingLine, merged)
      }
    }
  }
}

case class HeadingBlocksExpr(child: Expression)
    extends UnaryExpression with CodegenFallback {

  override def dataType: DataType = ArrayType(StructType(Seq(
    StructField("heading", StringType, nullable = true),
    StructField("body", StringType, nullable = false))),
    containsNull = false)
  override def nullable: Boolean = true

  override def nullSafeEval(input: Any): Any = {
    val blocks = HeadingBlocks.split(input.asInstanceOf[UTF8String].toString)
    new GenericArrayData(blocks.map { case (h, b) =>
      InternalRow(
        if (h == null) null else UTF8String.fromString(h),
        UTF8String.fromString(b)): Any
    }.toArray)
  }

  override protected def withNewChildInternal(c: Expression): HeadingBlocksExpr =
    copy(child = c)
  override def prettyName: String = "graft_heading_blocks"
}
