package graft.functions

import scala.collection.mutable.ArrayBuffer

/** Syntax-aware top-level item detection for code chunking — the
  * stand-in for the reference's tree-sitter tier
  * (split_recursively.rs:96-247 registers real grammars per language;
  * :313-374 iterates the root's children as chunk candidates, filling
  * inter-node gaps with the DEFAULT regex config, and recurses into a
  * node's children when it exceeds the chunk size).
  *
  * A full parser is out of reach without the grammar libraries (zero
  * new dependencies), but the OBSERVABLE contract of that tier is
  * narrower than parsing: the chunker only consumes top-level item
  * BOUNDARIES, recursively. Those are reproducible with a faithful
  * lexer (strings, comments, raw/triple quotes, template literals,
  * bracket nesting, indentation) plus per-language item rules:
  *
  *  - Python: an item is one logical statement at the span's base
  *    indentation — bracket- and backslash-continuations and triple
  *    quotes keep a statement open, an indented suite attaches to its
  *    header line, decorators attach to the definition they decorate
  *    (tree-sitter's `decorated_definition` is ONE node). A
  *    base-indent comment line is its own item (`comment` is its own
  *    node in the grammar).
  *  - JavaScript/TypeScript: items end at `;` at depth 0 or at a `}`
  *    closing to depth 0 (unless the statement continues — else /
  *    catch / finally / do-while / operator chains). The lexer
  *    understands line/block comments, both quotes, template literals
  *    with nested `${}`, and division-vs-regex disambiguation by the
  *    preceding significant token.
  *  - Rust: items end at `;` or a depth-0-closing `}`; the lexer
  *    understands nested block comments, raw strings `r#".."#`,
  *    lifetimes vs char literals, and attribute lines (their own
  *    `attribute_item`/`line_comment` nodes, as in the grammar).
  *  - Go / Scala / Kotlin / Swift: the same brace rules plus newline
  *    statement termination (a newline at depth 0 ends a complete
  *    statement — Go's semicolon insertion, Scala/Kotlin/Swift line
  *    syntax); annotations (`@...`) attach forward like decorators.
  *    Go adds backtick raw strings; Scala/Kotlin/Swift nest block
  *    comments.
  *  - C / C++ / Java / C#: plain brace rules (`;`-terminated), with
  *    preprocessor `#...` lines as their own EOL-terminated items
  *    (backslash-continued), like the grammar's preproc nodes.
  *
  * Descending into an oversized item mirrors the reference's cursor
  * walk into the node's children: the header tokens before the body
  * become a small leading atom, the body splits by the same rules one
  * level in, and the closing tokens trail (the merge pass then packs
  * header + leading body atoms together exactly as the reference's
  * merge packs the child tokens).
  *
  * Everything here is per-row, allocation-light and shuffle-free; it
  * runs inside [[RecursiveSplitExpr]]'s eval.
  */
object SyntaxSplit {

  /** Per-language lexer/item-rule flags for the brace scanner. */
  private final case class BraceStyle(
      js: Boolean = false, // template literals + regex literals
      rust: Boolean = false, // raw strings, lifetimes, #[attr] items
      goRaw: Boolean = false, // backtick raw strings
      asi: Boolean = false, // newline ends a complete statement
      hashLine: Boolean = false, // preprocessor '#...' EOL items
      nestedComments: Boolean = false,
      tripleQ: Boolean = false, // \"\"\"...\"\"\" raw/multiline strings
      verbatim: Boolean = false) // C# @"..." ("" = quote, \ literal)

  private val JsStyle = BraceStyle(js = true)
  private val RustStyle = BraceStyle(rust = true, nestedComments = true)
  private val GoStyle = BraceStyle(goRaw = true, asi = true)
  private val ScalaStyle =
    BraceStyle(asi = true, nestedComments = true, tripleQ = true)
  private val CStyle = BraceStyle(hashLine = true, verbatim = true)

  /** Style by language name/alias (aliases per
    * split_recursively.rs:96-247's alias lists); None = no syntax
    * tier (regex tiers apply). */
  private def styleFor(language: String): Option[BraceStyle] =
    language.toLowerCase match {
      case "javascript" | "js" | ".js" | "typescript" | "ts" | ".ts" |
          "tsx" | ".tsx" => Some(JsStyle)
      case "rust" | "rs" | ".rs" => Some(RustStyle)
      case "go" | ".go" | "golang" => Some(GoStyle)
      case "scala" | ".scala" | "kotlin" | ".kt" | ".kts" | "kt" |
          "swift" | ".swift" => Some(ScalaStyle)
      case "c" | ".c" | "c++" | "cpp" | ".cpp" | ".cc" | ".cxx" | ".h" |
          ".hpp" | "java" | ".java" | "c#" | "cs" | ".cs" | "csharp" =>
        Some(CStyle)
      case _ => None
    }

  private def isPython(language: String): Boolean =
    language.toLowerCase match {
      case "python" | "py" | ".py" => true
      case _ => false
    }

  /** Languages with a syntax tier. */
  def supports(language: String): Boolean =
    isPython(language) || styleFor(language).isDefined

  /** Top-level item spans covering the significant content of
    * `[s, e)`; whitespace between items is not covered (the chunker
    * trims atoms anyway). Returns a single span (or none) when the
    * span holds one item — callers then [[descend]]. */
  def items(language: String, text: String, s: Int, e: Int): IndexedSeq[(Int, Int)] =
    if (isPython(language)) pythonItems(text, s, e)
    else braceItems(text, s, e, styleFor(language).getOrElse(JsStyle))

  /** The body span of a single block item, for recursion one level in:
    * Python returns the indented suite after the (last) header line;
    * brace languages return the interior of the item's outermost
    * brace block. None when the item has no splittable body. */
  def descend(language: String, text: String, s: Int, e: Int): Option[(Int, Int)] =
    if (isPython(language)) pythonBody(text, s, e)
    else braceBody(text, s, e, styleFor(language).getOrElse(JsStyle))

  // ---------------------------------------------------------------
  // Python
  // ---------------------------------------------------------------

  /** Indentation of the line starting at `ls` (spaces; tabs count 8 to
    * a stop, like the tokenizer), or -1 for blank/whitespace lines. */
  private def indentOf(text: String, ls: Int, e: Int): Int = {
    var i = ls
    var col = 0
    while (i < e && text.charAt(i) != '\n') {
      val c = text.charAt(i)
      if (c == ' ') col += 1
      else if (c == '\t') col = (col / 8 + 1) * 8
      else return col
      i += 1
    }
    -1
  }

  private def lineEnd(text: String, i: Int, e: Int): Int = {
    var j = i
    while (j < e && text.charAt(j) != '\n') j += 1
    j
  }

  /** Consume one LOGICAL line from `ls`: bracket depth, backslash
    * continuation and triple quotes keep it open across physical
    * lines. Returns the exclusive end (past the final newline when
    * present). */
  private def pythonLogicalEnd(text: String, ls: Int, e: Int): Int = {
    var i = ls
    var depth = 0
    var quote = 0.toChar // active short-string quote, 0 none
    var triple: String = null
    var backslashEol = false
    while (i < e) {
      val c = text.charAt(i)
      if (triple != null) {
        if (c == '\\' && i + 1 < e) i += 1
        else if (c == triple.charAt(0) && i + 2 < e &&
          text.charAt(i + 1) == c && text.charAt(i + 2) == c) {
          triple = null; i += 2
        }
      } else if (quote != 0) {
        if (c == '\\' && i + 1 < e) i += 1
        else if (c == quote || c == '\n') quote = 0.toChar
      } else c match {
        case '#' => i = lineEnd(text, i, e) - 1
        case '\'' | '"' =>
          if (i + 2 < e && text.charAt(i + 1) == c && text.charAt(i + 2) == c) {
            triple = c.toString; i += 2
          } else quote = c
        case '(' | '[' | '{' => depth += 1
        case ')' | ']' | '}' => if (depth > 0) depth -= 1
        case '\\' if i + 1 < e && text.charAt(i + 1) == '\n' =>
          backslashEol = true
        case '\n' =>
          if (depth == 0 && triple == null && !backslashEol) return i + 1
          backslashEol = false
        case _ => ()
      }
      i += 1
    }
    e
  }

  private def pythonItems(text: String, s: Int, e: Int): IndexedSeq[(Int, Int)] = {
    val out = new ArrayBuffer[(Int, Int)]()
    // base indent = the first non-blank line's indent
    var ls = s
    var base = -1
    while (ls < e && base < 0) {
      base = indentOf(text, ls, e)
      if (base < 0) ls = lineEnd(text, ls, e) + 1
    }
    if (base < 0) return out.toIndexedSeq
    while (ls < e) {
      val ind = indentOf(text, ls, e)
      if (ind < 0) ls = lineEnd(text, ls, e) + 1 // blank: between items
      else {
        val start = ls
        var decorated = true
        var cur = ls
        while (decorated && cur < e) {
          // the statement's logical header line(s)
          var j = cur
          while (j < e && (text.charAt(j) == ' ' || text.charAt(j) == '\t')) j += 1
          val isDecorator = j < e && text.charAt(j) == '@'
          cur = pythonLogicalEnd(text, cur, e)
          // attach the indented suite: every following LOGICAL line
          // starting deeper than base (logical, so a docstring whose
          // interior lines sit at column 0 cannot fake a boundary;
          // blank lines attach only if deeper content follows)
          var scan = cur
          var attachedEnd = cur
          var done = false
          while (!done && scan < e) {
            val li = indentOf(text, scan, e)
            if (li < 0) scan = lineEnd(text, scan, e) + 1
            else if (li > base) {
              val le = pythonLogicalEnd(text, scan, e)
              attachedEnd = le; scan = le
            } else done = true
          }
          cur = attachedEnd
          decorated = isDecorator // a decorator line binds to what follows
          if (decorated) {
            // blank and comment lines between a decorator and its
            // definition sit INSIDE the decorated_definition node's
            // span — consume them so the def stays attached
            var gap = true
            while (gap && cur < e) {
              var j2 = cur
              while (j2 < e && (text.charAt(j2) == ' ' || text.charAt(j2) == '\t'))
                j2 += 1
              if (indentOf(text, cur, e) < 0 ||
                (j2 < e && text.charAt(j2) == '#'))
                cur = lineEnd(text, cur, e) + 1
              else gap = false
            }
          }
        }
        out += ((start, math.min(cur, e)))
        ls = cur
      }
    }
    out.toIndexedSeq
  }

  /** Suite of a single Python block item: the lines after the last
    * base-indent header line (decorators + the def/class line). */
  private def pythonBody(text: String, s: Int, e: Int): Option[(Int, Int)] = {
    val base = indentOf(text, s, e)
    if (base < 0) return None
    var ls = s
    var bodyStart = -1
    while (ls < e && bodyStart < 0) {
      val ind = indentOf(text, ls, e)
      if (ind >= 0 && ind > base) bodyStart = ls
      else ls = if (ind < 0) lineEnd(text, ls, e) + 1
        else pythonLogicalEnd(text, ls, e)
    }
    if (bodyStart < 0 || bodyStart <= s || bodyStart >= e) None
    else Some((bodyStart, e))
  }

  // ---------------------------------------------------------------
  // JS/TS + Rust (shared brace-language lexer)
  // ---------------------------------------------------------------

  /** Can a `/` at this point start a regex literal? True after
    * operators/keywords, false after value-ending tokens (the classic
    * JS lexing rule, keyed by the last significant character). */
  private def regexCanFollow(prevSig: Char): Boolean = prevSig match {
    case 0 => true
    case c if Character.isLetterOrDigit(c) || c == '_' || c == '$' ||
      c == ')' || c == ']' || c == '}' || c == '"' || c == '\'' || c == '`' => false
    case _ => true
  }

  /** JS positions where a `/` after an identifier still starts a
    * regex: the identifier is a keyword that cannot end a value. */
  private val regexKeywords = Set("return", "typeof", "case", "in", "of",
    "delete", "void", "instanceof", "new", "do", "else", "yield", "await",
    "throw")

  private def isWordChar(ch: Char): Boolean =
    Character.isLetterOrDigit(ch) || ch == '_' || ch == '$'

  /** Does the identifier ending just before position `j` (skipping
    * whitespace) belong to [[regexKeywords]]? Backward-scan twin of
    * braceItems' rolling word, for the single-probe braceBody path. */
  private def kwBefore(text: String, s: Int, j0: Int): Boolean = {
    var j = j0
    while (j > s && Character.isWhitespace(text.charAt(j - 1))) j -= 1
    val end = j
    while (j > s && isWordChar(text.charAt(j - 1))) j -= 1
    j < end && regexKeywords.contains(text.substring(j, end))
  }

  /** One pass over `[s, e)` emitting top-level item spans. */
  private def braceItems(text: String, s: Int, e: Int,
      style: BraceStyle): IndexedSeq[(Int, Int)] = {
    val rust = style.rust
    val out = new ArrayBuffer[(Int, Int)]()
    var i = s
    var depth = 0 // braces
    var pdepth = 0 // parens + square brackets: a ';' inside is never a boundary
    var itemStart = -1
    var prevSig: Char = 0

    def closeItem(endExcl: Int): Unit = {
      if (itemStart >= 0 && endExcl > itemStart) out += ((itemStart, endExcl))
      itemStart = -1
      prevSig = 0
    }
    def skipBlockComment(): Unit = {
      // Rust/Scala/Kotlin/Swift block comments nest
      var d = 1
      i += 2
      while (i < e && d > 0) {
        if (style.nestedComments && i + 1 < e && text.charAt(i) == '/' && text.charAt(i + 1) == '*') {
          d += 1; i += 2
        } else if (i + 1 < e && text.charAt(i) == '*' && text.charAt(i + 1) == '/') {
          d -= 1; i += 2
        } else i += 1
      }
      i -= 1 // main loop advances
    }
    def skipString(q: Char): Unit = {
      i += 1
      while (i < e && text.charAt(i) != q) {
        if (text.charAt(i) == '\\' && i + 1 < e) i += 1
        i += 1
      }
    }
    /** At the first quote of a `"""` literal: scan to the closing
      * `"""` with no escape processing (Scala/Kotlin raw semantics;
      * Swift multiline is close enough for boundary purposes). Leaves
      * i at the last closing quote. */
    def skipTripleString(): Unit = {
      i += 3
      while (i + 2 < e && !(text.charAt(i) == '"' &&
        text.charAt(i + 1) == '"' && text.charAt(i + 2) == '"')) i += 1
      i = math.min(i + 2, e - 1)
    }
    /** At the quote of a C# `@"..."`: backslash is literal, `""` is an
      * escaped quote. Leaves i at the closing quote. */
    def skipVerbatimString(): Unit = {
      i += 1
      var closed = false
      while (i < e && !closed) {
        if (text.charAt(i) == '"') {
          if (i + 1 < e && text.charAt(i + 1) == '"') i += 2
          else closed = true
        } else i += 1
      }
    }
    def skipRawString(): Unit = {
      // at 'r' of r"..." / r#"..."# (possibly after b); count hashes
      i += 1
      var hashes = 0
      while (i < e && text.charAt(i) == '#') { hashes += 1; i += 1 }
      if (i < e && text.charAt(i) == '"') {
        i += 1
        var closed = false
        while (i < e && !closed) {
          if (text.charAt(i) == '"') {
            var h = 0
            while (h < hashes && i + 1 + h < e && text.charAt(i + 1 + h) == '#') h += 1
            if (h == hashes) { i += hashes; closed = true }
          }
          if (!closed) i += 1
        }
      } else i -= 1
    }
    def skipRegex(): Unit = {
      i += 1
      var inClass = false
      while (i < e && (inClass || text.charAt(i) != '/') && text.charAt(i) != '\n') {
        val c = text.charAt(i)
        if (c == '\\' && i + 1 < e) i += 1
        else if (c == '[') inClass = true
        else if (c == ']') inClass = false
        i += 1
      }
    }
    /** After a depth-0 `}` (afterBrace) or at a newline (ASI): does
      * the statement continue (else/catch/finally/do-while, or an
      * operator/call chain)? The catch/finally/do-while keywords are
      * continuations ONLY directly after a closing brace — from the
      * newline check a line starting with `while` is a new while
      * loop, not the tail of a do-while. */
    def continuesAfterBrace(j0: Int, afterBrace: Boolean = true): Boolean = {
      var j = j0
      while (j < e && Character.isWhitespace(text.charAt(j))) j += 1
      if (j >= e) return false
      val c = text.charAt(j)
      if (c == ';' || c == ',' || c == ')' || c == ']' || c == '.' ||
        c == ':' || c == '?' || c == '=' || c == '+' || c == '-' ||
        c == '*' || c == '&' || c == '|' || c == '(' || c == '`') return true
      def kw(w: String): Boolean =
        text.regionMatches(j, w, 0, w.length) &&
          (j + w.length >= e || !Character.isLetterOrDigit(text.charAt(j + w.length)))
      // do-while / catch / finally are JS-only continuations; Rust has
      // no do-while, so a `while` after `}` starts a NEW statement
      kw("else") ||
        (afterBrace && !rust && (kw("catch") || kw("finally") || kw("while")))
    }
    // rolling identifier ending at prevSig, for regex-vs-division: a
    // `/` after `return`/`typeof`/... starts a regex even though the
    // last significant CHAR is a letter
    val word = new java.lang.StringBuilder
    def regexStartOk: Boolean =
      if (isWordChar(prevSig)) regexKeywords.contains(word.toString)
      else regexCanFollow(prevSig)

    def asiCloses(ch: Char): Boolean =
      Character.isLetterOrDigit(ch) || ch == ')' || ch == ']' ||
        ch == '"' || ch == '\'' || ch == '`'

    while (i < e) {
      val c = text.charAt(i)
      if (c == '\n' && itemStart >= 0 && depth == 0 && pdepth == 0 &&
        (style.asi || style.hashLine)) {
        if (style.hashLine) {
          // preprocessor lines are their own items, ending at an
          // uncontinued EOL; everything else in C-family needs ';'/'}'
          if (itemStartsWith(text, itemStart, "#") &&
            i > s && text.charAt(i - 1) != '\\') closeItem(i)
        } else if (asiCloses(prevSig) &&
          !annotationOnlyLine(text,
            math.max(itemStart, text.lastIndexOf('\n', i - 1) + 1), i) &&
          !continuesAfterBrace(i + 1, afterBrace = false))
          // newline statement termination (Go semicolon insertion,
          // Scala/Kotlin/Swift line syntax): a complete statement
          // ends unless the next line continues it (else/./operator)
          // or the CURRENT line is only annotations awaiting their
          // definition (`@tailrec\ndef f...` stays one item, while a
          // decorated one-liner `@volatile var x = 0` still closes)
          closeItem(i)
      } else if (c == '/' && i + 1 < e && text.charAt(i + 1) == '/') {
        val nl = lineEnd(text, i, e) // index of '\n', or e
        if (itemStart < 0) { // a standalone comment line is its own item
          itemStart = i
          if (depth == 0) closeItem(nl) else prevSig = '/'
          i = nl
        } else
          // trailing comment: leave the '\n' for the main loop so the
          // ASI/preproc newline termination still sees it
          i = if (nl < e) nl - 1 else nl
      } else if (c == '/' && i + 1 < e && text.charAt(i + 1) == '*') {
        val st = i
        skipBlockComment()
        if (itemStart < 0 && depth == 0) { itemStart = st; closeItem(i + 1) }
      } else if (!Character.isWhitespace(c)) {
        if (itemStart < 0) itemStart = i
        c match {
          case '"' | '\'' =>
            // Rust: 'a lifetime vs 'c' char literal
            if (rust && c == '\'' && i + 2 < e &&
              (Character.isLetter(text.charAt(i + 1)) || text.charAt(i + 1) == '_') &&
              text.charAt(i + 2) != '\'') {
              // lifetime: consume the tick only
            } else if (style.tripleQ && c == '"' && i + 2 < e &&
              text.charAt(i + 1) == '"' && text.charAt(i + 2) == '"') {
              skipTripleString()
            } else if (style.verbatim && c == '"' && i > s &&
              text.charAt(i - 1) == '@') {
              skipVerbatimString()
            } else skipString(c)
            prevSig = c
          case '`' if style.goRaw =>
            // Go raw string: no escapes, runs to the next backtick
            i += 1
            while (i < e && text.charAt(i) != '`') i += 1
            prevSig = '`'
          case '`' if style.js =>
            // template literal; ${ } re-enters code
            i += 1
            var open = true
            while (i < e && open) {
              val t = text.charAt(i)
              if (t == '\\' && i + 1 < e) i += 1
              else if (t == '`') open = false
              else if (t == '$' && i + 1 < e && text.charAt(i + 1) == '{') {
                // lex the interpolation inline (rare in fixtures):
                // track braces until balance returns
                var d2 = 1
                i += 1
                while (i + 1 < e && d2 > 0) {
                  i += 1
                  val u = text.charAt(i)
                  if (u == '{') d2 += 1
                  else if (u == '}') d2 -= 1
                  else if (u == '"' || u == '\'') skipString(u)
                }
              }
              i += 1
            }
            i -= 1
            prevSig = '`'
          case 'r' if rust && (prevSig == 0 || !Character.isLetterOrDigit(prevSig)) &&
            i + 1 < e && (text.charAt(i + 1) == '"' || text.charAt(i + 1) == '#') =>
            skipRawString()
            prevSig = '"'
          case '/' if style.js && regexStartOk =>
            skipRegex()
            prevSig = '/'
          case '{' =>
            depth += 1
            prevSig = '{'
          case '}' =>
            if (depth > 0) depth -= 1
            if (depth == 0 && pdepth == 0 &&
              !(rust && itemStartsWith(text, itemStart, "#")) &&
              !continuesAfterBrace(i + 1))
              closeItem(i + 1)
            else prevSig = '}'
          case '(' | '[' =>
            pdepth += 1
            prevSig = c
          case ')' | ']' =>
            if (pdepth > 0) pdepth -= 1
            prevSig = c
          case ';' if depth == 0 && pdepth == 0 =>
            // a ';' inside parens/brackets (for-headers, [T; N]) never
            // ends an item
            closeItem(i + 1)
          case '\n' => () // unreachable (whitespace)
          case _ =>
            prevSig = c
        }
        // prevSig == c exactly when the char flowed through the
        // default arm (strings/comments/regexes set prevSig to their
        // delimiter instead); a whitespace gap starts a new word
        if (isWordChar(c) && prevSig == c) {
          if (word.length > 0 && i > s && !isWordChar(text.charAt(i - 1)))
            word.setLength(0)
          word.append(c)
        } else if (!Character.isWhitespace(c)) word.setLength(0)
        // Rust attribute / JS decorator lines end at EOL at depth 0
        if (itemStart >= 0 && depth == 0 && (c == ']' || c == ')')) {
          if (rust && itemStartsWith(text, itemStart, "#") &&
            bracketBalancedLine(text, itemStart, i + 1))
            closeItem(i + 1)
        }
      }
      i += 1
    }
    if (itemStart >= 0) closeItem(e)
    out.toIndexedSeq
  }

  private def itemStartsWith(text: String, itemStart: Int, p: String): Boolean =
    itemStart >= 0 && text.regionMatches(itemStart, p, 0, p.length)

  /** Is `[ls, i)` nothing but annotations (`@Word` / `@Word(...)`
    * groups)? Such a line awaits the definition it decorates, so the
    * newline must not terminate the item — but a line with content
    * after its annotations (`@volatile var x = 0`) terminates
    * normally. */
  private def annotationOnlyLine(text: String, ls: Int, i: Int): Boolean = {
    var j = ls
    def skipWs(): Unit =
      while (j < i && Character.isWhitespace(text.charAt(j))) j += 1
    skipWs()
    if (j >= i || text.charAt(j) != '@') return false
    while (j < i && text.charAt(j) == '@') {
      j += 1
      while (j < i && (Character.isLetterOrDigit(text.charAt(j)) ||
        text.charAt(j) == '_' || text.charAt(j) == '.')) j += 1
      if (j < i && text.charAt(j) == '(') {
        var d = 0
        var go = true
        while (j < i && go) {
          val c = text.charAt(j)
          if (c == '(') d += 1
          else if (c == ')') { d -= 1; if (d == 0) go = false }
          j += 1
        }
      }
      skipWs()
    }
    j >= i
  }

  private def bracketBalancedLine(text: String, s: Int, e: Int): Boolean = {
    var d = 0
    var i = s
    while (i < e) {
      val c = text.charAt(i)
      if (c == '[' || c == '(') d += 1
      else if (c == ']' || c == ')') d -= 1
      i += 1
    }
    d == 0
  }

  /** Interior of the item's outermost brace block (the function/class/
    * impl body): from after the first depth-1 `{` to before its
    * matching `}`. The lexer rules match [[braceItems]] so a `{` in a
    * string or comment can't open a body. */
  private def braceBody(text: String, s: Int, e: Int,
      style: BraceStyle): Option[(Int, Int)] = {
    val rust = style.rust
    var i = s
    var open = -1
    var depth = 0
    var prevSig: Char = 0
    while (i < e && open < 0) {
      val c = text.charAt(i)
      if (c == '/' && i + 1 < e && text.charAt(i + 1) == '/') i = lineEnd(text, i, e)
      else if (c == '/' && i + 1 < e && text.charAt(i + 1) == '*') {
        var d = 1
        i += 2
        while (i < e && d > 0) {
          if (style.nestedComments && i + 1 < e && text.charAt(i) == '/' && text.charAt(i + 1) == '*') {
            d += 1; i += 2
          } else if (i + 1 < e && text.charAt(i) == '*' && text.charAt(i + 1) == '/') {
            d -= 1; i += 2
          } else i += 1
        }
        i -= 1
      } else if (c == '"' || c == '\'') {
        if (style.tripleQ && c == '"' && i + 2 < e &&
          text.charAt(i + 1) == '"' && text.charAt(i + 2) == '"') {
          // """...""": no escapes; a '{' inside must not open a body
          i += 3
          while (i + 2 < e && !(text.charAt(i) == '"' &&
            text.charAt(i + 1) == '"' && text.charAt(i + 2) == '"')) i += 1
          i = math.min(i + 2, e - 1)
        } else if (style.verbatim && c == '"' && i > s &&
          text.charAt(i - 1) == '@') {
          // C# @"...": backslash literal, "" = escaped quote
          i += 1
          var closed = false
          while (i < e && !closed) {
            if (text.charAt(i) == '"') {
              if (i + 1 < e && text.charAt(i + 1) == '"') i += 2
              else closed = true
            } else i += 1
          }
        } else if (!(rust && c == '\'' && i + 2 < e &&
          (Character.isLetter(text.charAt(i + 1)) || text.charAt(i + 1) == '_') &&
          text.charAt(i + 2) != '\'')) {
          i += 1
          while (i < e && text.charAt(i) != c) {
            if (text.charAt(i) == '\\' && i + 1 < e) i += 1
            i += 1
          }
        }
      } else if ((style.js || style.goRaw) && c == '`') {
        // template literal / Go raw string: a '{' inside must not open
        // a fake body; Go raw strings have NO escapes (a trailing
        // backslash is literal), JS templates do
        i += 1
        while (i < e && text.charAt(i) != '`') {
          if (style.js && text.charAt(i) == '\\' && i + 1 < e) i += 1
          i += 1
        }
      } else if (rust && c == 'r' && !isWordChar(prevSig) && i + 1 < e &&
        (text.charAt(i + 1) == '"' || text.charAt(i + 1) == '#')) {
        // raw string: same reason
        i += 1
        var hashes = 0
        while (i < e && text.charAt(i) == '#') { hashes += 1; i += 1 }
        if (i < e && text.charAt(i) == '"') {
          i += 1
          var closed = false
          while (i < e && !closed) {
            if (text.charAt(i) == '"') {
              var h = 0
              while (h < hashes && i + 1 + h < e && text.charAt(i + 1 + h) == '#') h += 1
              if (h == hashes) { i += hashes; closed = true }
            }
            if (!closed) i += 1
          }
        } else i -= 1
      } else if (style.js && c == '/' && (regexCanFollow(prevSig) || kwBefore(text, s, i))) {
        i += 1
        var inClass = false
        while (i < e && (inClass || text.charAt(i) != '/') && text.charAt(i) != '\n') {
          if (text.charAt(i) == '\\' && i + 1 < e) i += 1
          else if (text.charAt(i) == '[') inClass = true
          else if (text.charAt(i) == ']') inClass = false
          i += 1
        }
      } else if (c == '{') open = i
      if (!Character.isWhitespace(c)) prevSig = text.charAt(math.min(i, e - 1))
      i += 1
    }
    if (open < 0) return None
    // matching close: scan back from the end (the body's `}` is the
    // last significant char of a block item)
    var close = e - 1
    while (close > open && text.charAt(close) != '}') close -= 1
    if (close <= open + 1) None else Some((open + 1, close))
  }
}
