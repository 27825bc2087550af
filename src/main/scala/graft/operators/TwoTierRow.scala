package graft.operators

import java.util.Locale
import java.util.regex.Pattern

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions.col

import graft.Partitioning
import graft.functions.HeadingBlocks

/** Faithful row-level twin of the reference's two-tier chunker
  * (app/processors/two_tier_chunker.py:46-495): the page tier's
  * paragraph accumulation, the heading-aware semantic tier (both the
  * SemanticChunker arm and the ImportError sentence-accumulation
  * fallback), BM25 tokenization, the extended-guard sentence split,
  * deterministic md5-UUID chunk ids, and the full process_document
  * assembly through the LLM boundary.
  *
  * Two injectable stand-ins, both recorded in the parity fixtures
  * (tools/gen_parity_fixtures2.py) so ReferenceParity2Spec replays
  * the reference's OWN outputs:
  *  - `count`: the reference counts tokens with tiktoken cl100k_base,
  *    unavailable off-network; the stand-in is the whitespace word
  *    count ([[wordCount]]). Real deployments plug a BPE counter.
  *  - `encode`: the SentenceTransformer boundary, same md5-feature
  *    stand-in as [[SemanticChunkerRow.stubEncode]].
  *
  * Complements [[TwoTier]] (the declarative token-window DataFrame
  * shape behind the oracle gates q34/q77): this twin carries the
  * reference's exact chunk BOUNDARIES (paragraph-packed pages,
  * heading-hard semantic blocks); [[processDocuments]] is its
  * distributed face.
  */
object TwoTierRow {

  type CountTokens = String => Int

  /** Python-semantics helpers: str.strip() over the ASCII whitespace
    * set, and len() by code points. */
  private def pyStrip(s: String, chars: String = " \t\n\r\f"): String = {
    var a = 0
    var b = s.length
    while (a < b && chars.indexOf(s.charAt(a)) >= 0) a += 1
    while (b > a && chars.indexOf(s.charAt(b - 1)) >= 0) b -= 1
    s.substring(a, b)
  }
  private def cpLen(s: String): Int = s.codePointCount(0, s.length)

  /** count_tokens stand-in (:65-67 counts tiktoken cl100k tokens):
    * whitespace word count, the parity fixtures' recorded stand-in. */
  val wordCount: CountTokens =
    s => s.split("(?U)\\s+").count(_.nonEmpty)

  private val Bm25TokenRe = Pattern.compile("(?U)\\w+")
  private val Bm25Stop = Set("the", "a", "an", "and", "or", "but", "in",
    "on", "at", "to", "for", "of", "with", "by", "as", "is", "was",
    "are", "were")

  /** tokenize_for_bm25 (:69-76): lowercase, `\b\w+\b` (unicode word
    * runs, underscores kept), stopword drop, len > 2 code points.
    * [[graft.functions.NativeText]]'s codegen'd TokenizeExpr is the
    * scale tier; it deviates on `_` and non-ASCII letters (ASCII-run
    * tokens) — this twin carries the reference's exact semantics. */
  def tokenizeForBm25(text: String): Vector[String] = {
    val m = Bm25TokenRe.matcher(text.toLowerCase(Locale.ROOT))
    val out = Vector.newBuilder[String]
    while (m.find()) {
      val t = m.group()
      if (!Bm25Stop.contains(t) && cpLen(t) > 2) out += t
    }
    out.result()
  }

  // the two-tier guard set (:78-93) — wider than the semantic
  // chunker's: corporate suffixes and latin abbreviations too
  private val TitleRe =
    Pattern.compile("(?U)\\b(Mr|Mrs|Ms|Dr|Prof|Sr|Jr)\\.\\s*")
  private val CorpRe = Pattern.compile("(?U)\\b(Inc|Ltd|Corp|Co)\\.\\s*")
  private val LatinRe = Pattern.compile("(?U)\\b(etc|vs|i\\.e|e\\.g)\\.\\s*")
  private val InitialRe = Pattern.compile("(?U)\\b([A-Z])\\.\\s*")
  private val SentSplitRe = Pattern.compile("(?U)(?<=[.!?])\\s+(?=[A-Z])")

  /** split_into_sentences (:78-93). */
  def splitIntoSentences(text: String): Vector[String] = {
    var t = TitleRe.matcher(text).replaceAll("$1<DOT> ")
    t = CorpRe.matcher(t).replaceAll("$1<DOT> ")
    t = LatinRe.matcher(t).replaceAll("$1<DOT> ")
    t = InitialRe.matcher(t).replaceAll("$1<DOT> ")
    SentSplitRe.split(t, -1).iterator
      .map(s => pyStrip(s.replace("<DOT>", ".")))
      .filter(_.nonEmpty).toVector
  }

  /** generate_chunk_id (:377-389): md5 of `{parent|document}_{level}_
    * {index}` rendered as a dashed UUID. */
  def generateChunkId(documentId: String, level: String, index: Int,
      parentId: Option[String] = None): String = {
    val base = s"${parentId.getOrElse(documentId)}_${level}_$index"
    val d = java.security.MessageDigest.getInstance("MD5")
      .digest(base.getBytes("UTF-8"))
    val hex = d.map(b => f"${b & 0xff}%02x").mkString
    s"${hex.substring(0, 8)}-${hex.substring(8, 12)}-" +
      s"${hex.substring(12, 16)}-${hex.substring(16, 20)}-" +
      s"${hex.substring(20)}"
  }

  /** create_page_chunks (:292-319): greedy paragraph accumulation on
    * `\n\n` splits against the token budget; a paragraph that
    * overflows the budget starts the next page (never split itself —
    * a single oversize paragraph IS a page). String-truthiness
    * carried: empty accumulations are never emitted. */
  def createPageChunks(text: String, pageTokenSize: Int = 1200,
      count: CountTokens = wordCount): Vector[String] = {
    val chunks = Vector.newBuilder[String]
    var cur = ""
    var tok = 0
    text.split(Pattern.quote("\n\n"), -1).foreach { para =>
      val pt = count(para)
      if (tok + pt > pageTokenSize) {
        if (cur.nonEmpty) chunks += cur
        cur = para
        tok = pt
      } else {
        cur = if (cur.nonEmpty) cur + "\n\n" + para else para
        tok += pt
      }
    }
    if (cur.nonEmpty) chunks += cur
    chunks.result()
  }

  private val HeaderLineRe =
    Pattern.compile("(?U)^(#{1,6}\\s+.*)$", Pattern.MULTILINE)

  /** create_section_chunks (:216-290) — a LIVE ERROR in the
    * reference: the loop reads `self.section_token_size`, an
    * attribute the constructor no longer sets (":60 Removed
    * paragraph/section tier"), so ANY text with non-header content
    * raises AttributeError before a single chunk can be emitted;
    * header-only or blank text returns []. None models the error
    * arm (same convention as DocProcessorChunker.sentenceChunks). */
  def createSectionChunks(text: String): Option[Vector[String]] = {
    // python re.split with two capture groups interleaves both group
    // copies of each header; for the reachable behavior only the
    // non-header segments matter
    val m = HeaderLineRe.matcher(text)
    var last = 0
    val segments = Vector.newBuilder[String]
    while (m.find()) {
      segments += text.substring(last, m.start())
      last = m.end()
    }
    segments += text.substring(last)
    val hasContent = segments.result().exists { seg =>
      val s = pyStrip(seg)
      s.nonEmpty && !HeaderLineRe.matcher(s).lookingAt()
    }
    if (hasContent) None else Some(Vector.empty)
  }

  /** create_semantic_chunks (:134-214): heading blocks are hard
    * boundaries; each block is chunked independently and the block's
    * heading is prefixed onto its FIRST chunk (`heading\n\nchunk`).
    * `encode = Some(...)` takes the SemanticChunker arm (threshold
    * 0.5, no min size, max = maxTokens); `None` takes the reference's
    * ImportError fallback: sentence accumulation bounded by both
    * maxSentences and the token budget. Returns (chunk_text,
    * sentence_count). */
  def createSemanticChunks(text: String,
      encode: Option[SemanticChunkerRow.Encoder],
      count: CountTokens = wordCount, maxSentences: Int = 3,
      maxTokens: Int = 100): Vector[(String, Int)] = {
    val blocks = HeadingBlocks.split(text)
    val out = Vector.newBuilder[(String, Int)]
    encode match {
      case Some(enc) =>
        blocks.foreach { case (heading, body) =>
          if (body.isEmpty && heading != null) out += ((heading, 0))
          else {
            val results = SemanticChunkerRow.createSemanticChunks(
              body, enc, threshold = 0.5, minChunkSize = 0,
              maxChunkSize = maxTokens, maintainContext = true)
            var first = true
            results.foreach { c =>
              val textOut =
                if (first && heading != null) {
                  first = false
                  if (c.text.nonEmpty) s"$heading\n\n${c.text}" else heading
                } else c.text
              out += ((textOut, c.sentenceCount))
            }
          }
        }
      case None =>
        blocks.foreach { case (heading, body) =>
          val sentences =
            if (body.nonEmpty) splitIntoSentences(body) else Vector.empty
          var cur = Vector.empty[String]
          var curTokens = 0
          var first = true
          sentences.foreach { sentence =>
            val st = count(sentence)
            if (cur.nonEmpty &&
                (cur.length >= maxSentences || curTokens + st > maxTokens)) {
              var chunkText = cur.mkString(" ")
              if (first && heading != null) {
                chunkText =
                  if (chunkText.nonEmpty) s"$heading\n\n$chunkText"
                  else heading
                first = false
              }
              out += ((chunkText, cur.length))
              cur = Vector.empty
              curTokens = 0
            }
            cur = cur :+ sentence
            curTokens += st
          }
          if (cur.nonEmpty || heading != null) {
            var chunkText = cur.mkString(" ")
            if (first && heading != null)
              chunkText =
                if (chunkText.nonEmpty) s"$heading\n\n$chunkText"
                else heading
            out += ((chunkText, cur.length))
          }
        }
    }
    out.result()
  }

  /** generate_contextual_summary (:321-355): the exact per-level
    * prompts through the LLM boundary, response stripped. */
  def generateContextualSummary(chunkText: String, parentContext: String,
      docTitle: String, chunkLevel: String, llm: LlmClient): String = {
    val prompt =
      if (chunkLevel == "semantic")
        s"""Document: $docTitle
           |
           |Context: ${pyCpTake(parentContext, 200)}
           |
           |Sentence(s): $chunkText
           |
           |Write a single sentence that explains the specific fact or concept in this text. Be precise and factual.""".stripMargin
      else
        s"""Document: $docTitle
           |
           |Parent Content Summary: ${pyCpTake(chunkText, 600)}
           |
           |Write 2-3 sentences summarizing the key topics and themes covered in this part of the document.""".stripMargin
    pyStrip(llm.complete(prompt))
  }

  /** identify_semantic_focus (:357-375). */
  def identifySemanticFocus(chunkText: String, llm: LlmClient): String = {
    val prompt =
      s"""Text: $chunkText
         |
         |In 2-5 words, identify the main topic or concept discussed in this text. Examples:
         |- "carbon emission reduction"
         |- "customer satisfaction metrics"
         |- "regulatory compliance requirements"
         |
         |Topic:""".stripMargin
    pyStrip(pyStrip(pyStrip(llm.complete(prompt)), "\""), "'")
  }

  private def pyCpTake(s: String, n: Int): String = {
    val end = s.offsetByCodePoints(0, math.min(n, cpLen(s)))
    s.substring(0, end)
  }

  final case class ChunkRow(documentId: String, id: String,
      chunkLevel: String, chunkIndex: Int, chunkText: String,
      chunkSize: Int, contextualSummary: String,
      contextualizedText: String, parentChunkId: Option[String],
      bm25Tokens: Vector[String], sentenceCount: Option[Int],
      semanticFocus: Option[String], tier: String)

  /** process_document (:390-495): page tier + per-page semantic tier,
    * md5-UUID ids, contextual summaries and BM25 tokens over the
    * CONTEXTUALIZED text. One flat list, parents interleaved before
    * their children, exactly the reference's emission order. */
  def processDocument(documentId: String, content: String,
      title: String = "Document", llm: LlmClient = StubLlm(),
      encode: Option[SemanticChunkerRow.Encoder] =
        Some(SemanticChunkerRow.stubEncode),
      count: CountTokens = wordCount,
      pageTokenSize: Int = 1200): Vector[ChunkRow] = {
    val out = Vector.newBuilder[ChunkRow]
    val pages = createPageChunks(content, pageTokenSize, count)
    pages.zipWithIndex.foreach { case (pageText, pageIdx) =>
      val parentId = generateChunkId(documentId, "parent", pageIdx)
      val parentSummary =
        generateContextualSummary(pageText, title, title, "parent", llm)
      val parentCtx = s"$parentSummary\n\n$pageText"
      out += ChunkRow(documentId, parentId, "page", pageIdx, pageText,
        count(pageText), parentSummary, parentCtx, None,
        tokenizeForBm25(parentCtx), None, None, "parent")
      val semantic = createSemanticChunks(pageText, encode, count)
      semantic.zipWithIndex.foreach {
        case ((semText, sentCount), semIdx) =>
          val semId =
            generateChunkId(documentId, "semantic", semIdx, Some(parentId))
          val semSummary = generateContextualSummary(
            semText, parentSummary, title, "semantic", llm)
          val focus = identifySemanticFocus(semText, llm)
          val semCtx = s"$semSummary\n\n$semText"
          out += ChunkRow(documentId, semId, "semantic", semIdx, semText,
            count(semText), semSummary, semCtx, Some(parentId),
            tokenizeForBm25(semCtx), Some(sentCount), Some(focus),
            "semantic")
      }
    }
    out.result()
  }

  /** Distributed face: the full process_document frame, one output
    * row per chunk. Per-document row logic, clients constructed once
    * per partition ([[Embedder]] shape); documents are independent so
    * this scales linearly with executors. */
  def processDocuments(df: DataFrame, idCol: String, textCol: String,
      titleCol: String, mkLlm: () => LlmClient = () => StubLlm(),
      mkEncode: () => Option[SemanticChunkerRow.Encoder] =
        () => Some(SemanticChunkerRow.stubEncode),
      pageTokenSize: Int = 1200): DataFrame = {
    val spark = df.sparkSession
    import spark.implicits._
    Partitioning.spread(
        df.select(col(idCol).cast("string"), col(textCol), col(titleCol)))
      .as[(String, String, String)]
      .mapPartitions { it =>
        val llm = mkLlm()
        val enc = mkEncode()
        it.flatMap { case (id, text, title) =>
          processDocument(id, text, title, llm, enc,
            pageTokenSize = pageTokenSize)
        }
      }
      .toDF()
  }
}
