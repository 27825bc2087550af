package graft.operators

import org.apache.spark.sql.DataFrame

import graft.functions.LlmResponse

/** The processors-tier chunker family
  * (app/processors/chunker.py:8-233) — the OTHER chunker stack next
  * to the DocumentProcessor one (services/document_processor.py →
  * DocProcessorChunker.scala); this file is the faithful port of the
  * `DocumentChunker` class the processors package exposes, with its
  * own distinct semantics:
  *
  *   - fixed (:92-113): [start, start+size) windows advancing by
  *     size−overlap, WHITESPACE-ONLY WINDOWS DROPPED (`if
  *     chunk.strip()`), the final window never re-overlapped;
  *   - sentence (:114-156): terminator splitting via the literal
  *     replace chain '! '→'!|', '? '→'?|', '. '→'.|' then split('|')
  *     — a terminator at text end (no trailing space) does NOT split;
  *     greedy packing counts sentence+1 (the joining space) but the
  *     overlap CARRY re-seeds with the last sentence counted WITHOUT
  *     the +1, and only when the flushed chunk had ≥2 sentences;
  *   - recursive (:157-221): paragraphs on '\n\n' (+2 accounting),
  *     oversize paragraphs flush the current chunk then cascade into
  *     sentence chunking, the overlap carry trims the previous
  *     paragraph to its LAST `overlap` characters;
  *   - semantic (:222-233): recursive with overlap hardcoded to 50;
  *   - chunk_text (:11-59): metadata wrapper locating each chunk by
  *     `text.find(chunk, current_position)` with the
  *     `current_position = max(current_position, start+1)` advance —
  *     a repeated chunk text resolves to its next occurrence, and a
  *     find miss (possible once chunks overlap-rewrite) falls back to
  *     current_position.
  *
  * All indices/lengths count CODE POINTS (Python str), as in
  * DocProcessorChunker. Scale: pure per-document functions behind one
  * mapPartitions pass — no shuffle; parallelism is input-split-bound.
  * Parity: ReferenceParitySpec compares every strategy against
  * outputs recorded from running the reference class itself
  * (tools/gen_parity_fixtures.py).
  */
object ProcessorChunker {

  private def cps(s: String): Array[Int] = s.codePoints().toArray

  private def cpStr(a: Array[Int], from: Int, until: Int): String =
    new String(a.slice(from, until), 0, until - from)

  private def pyStrip(s: String): String = LlmResponse.pyStrip(s)

  /** _fixed_chunking (:92-113). */
  def fixedChunking(text: String, chunkSize: Int,
      chunkOverlap: Int): List[String] = {
    val a = cps(text)
    val out = List.newBuilder[String]
    var start = 0
    while (start < a.length) {
      val end = math.min(start + chunkSize, a.length)
      val chunk = cpStr(a, start, end)
      if (pyStrip(chunk).nonEmpty) out += chunk
      start = if (end < a.length) end - chunkOverlap else end
    }
    out.result()
  }

  /** The :121 replace-chain sentence split, shared by sentence and
    * recursive. */
  private def splitSentences(text: String): Array[String] =
    text.replace("! ", "!|").replace("? ", "?|").replace(". ", ".|")
      .split('|')

  /** _sentence_chunking (:114-156). */
  def sentenceChunking(text: String, chunkSize: Int,
      chunkOverlap: Int): List[String] = {
    val chunks = List.newBuilder[String]
    var current = Vector.empty[String]
    var currentSize = 0
    splitSentences(text).foreach { raw =>
      val sentence = pyStrip(raw)
      if (sentence.nonEmpty) {
        val sentenceSize = sentence.codePointCount(0, sentence.length)
        if (currentSize + sentenceSize > chunkSize && current.nonEmpty) {
          chunks += current.mkString(" ")
          if (chunkOverlap > 0 && current.length > 1) {
            current = Vector(current.last)
            // the carry seeds WITHOUT the +1 space accounting (:143)
            currentSize =
              current.head.codePointCount(0, current.head.length)
          } else {
            current = Vector.empty
            currentSize = 0
          }
        }
        current :+= sentence
        currentSize += sentenceSize + 1
      }
    }
    if (current.nonEmpty) chunks += current.mkString(" ")
    chunks.result()
  }

  /** _recursive_chunking (:157-221). */
  def recursiveChunking(text: String, chunkSize: Int,
      chunkOverlap: Int): List[String] = {
    val chunks = List.newBuilder[String]
    var current = Vector.empty[String]
    var currentSize = 0
    text.split("\n\n", -1).foreach { raw =>
      val para = pyStrip(raw)
      if (para.nonEmpty) {
        val paraSize = para.codePointCount(0, para.length)
        if (paraSize > chunkSize) {
          if (current.nonEmpty) {
            chunks += current.mkString("\n\n")
            current = Vector.empty
            currentSize = 0
          }
          chunks ++= sentenceChunking(para, chunkSize, chunkOverlap)
        } else if (currentSize + paraSize > chunkSize && current.nonEmpty) {
          chunks += current.mkString("\n\n")
          if (chunkOverlap > 0) {
            val prev = current.last
            val prevCp = cps(prev)
            val overlapText =
              if (prevCp.length > chunkOverlap)
                cpStr(prevCp, prevCp.length - chunkOverlap, prevCp.length)
              else prev
            current = Vector(overlapText, para)
            currentSize =
              overlapText.codePointCount(0, overlapText.length) + paraSize
          } else {
            current = Vector(para)
            currentSize = paraSize
          }
        } else {
          current :+= para
          currentSize += paraSize + 2
        }
      }
    }
    if (current.nonEmpty) chunks += current.mkString("\n\n")
    chunks.result()
  }

  /** chunk (:60-91): the strategy dispatch, semantic → recursive with
    * overlap 50 (:233). */
  def chunk(text: String, strategy: String, chunkSize: Int = 500,
      chunkOverlap: Int = 50): List[String] = strategy match {
    case "fixed" => fixedChunking(text, chunkSize, chunkOverlap)
    case "sentence" => sentenceChunking(text, chunkSize, chunkOverlap)
    case "recursive" => recursiveChunking(text, chunkSize, chunkOverlap)
    case "semantic" => recursiveChunking(text, chunkSize, 50)
    case other =>
      throw new IllegalArgumentException(
        s"Unknown chunking strategy: $other")
  }

  final case class ChunkMeta(text: String, chunkIndex: Int,
      chunkSize: Int, startIndex: Int, endIndex: Int, strategy: String)

  /** Python str.find(sub, start) over code points. */
  private def cpFind(hay: Array[Int], needle: Array[Int],
      from: Int): Int = {
    if (needle.isEmpty) return math.min(from, hay.length)
    var i = math.max(from, 0)
    while (i <= hay.length - needle.length) {
      var j = 0
      while (j < needle.length && hay(i + j) == needle(j)) j += 1
      if (j == needle.length) return i
      i += 1
    }
    -1
  }

  /** chunk_text (:11-59): find-based start/end metadata with the
    * max(current_position, start+1) advance. */
  def chunkText(text: String, strategy: String, chunkSize: Int = 500,
      chunkOverlap: Int = 50): List[ChunkMeta] = {
    val hay = cps(text)
    var currentPosition = 0
    chunk(text, strategy, chunkSize, chunkOverlap).zipWithIndex.map {
      case (c, i) =>
        val needle = cps(c)
        val found = cpFind(hay, needle, currentPosition)
        val start = if (found == -1) currentPosition else found
        val end = start + needle.length
        currentPosition = math.max(currentPosition, start + 1)
        ChunkMeta(c, i, needle.length, start, end, strategy)
    }
  }

  final case class ChunkRow(document_id: Long, chunk_text: String,
      chunk_index: Int, chunk_size: Int, start_index: Int,
      end_index: Int, strategy: String)

  /** DataFrame face: one mapPartitions pass over
    * (document_id, content) — the per-document loops never cross
    * rows, so this scales with input splits and shuffles nothing. */
  def chunkDocuments(docs: DataFrame, strategy: String,
      chunkSize: Int = 500, chunkOverlap: Int = 50): DataFrame = {
    val spark = docs.sparkSession
    import spark.implicits._
    docs.select(org.apache.spark.sql.functions.col("document_id")
        .cast("long"),
        org.apache.spark.sql.functions.col("content").cast("string"))
      .as[(Long, String)]
      .mapPartitions { rows =>
        rows.flatMap { case (id, content) =>
          chunkText(Option(content).getOrElse(""), strategy, chunkSize,
            chunkOverlap)
            .map(c => ChunkRow(id, c.text, c.chunkIndex, c.chunkSize,
              c.startIndex, c.endIndex, c.strategy))
        }
      }.toDF()
  }
}
