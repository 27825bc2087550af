package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.functions.LlmResponse

/** The DocumentProcessor chunker family behind POST
  * /chunks/{document_id}/rechunk (app/services/document_processor.py
  * :13-202, app/api/chunks.py:293-350, :516-594) — a SECOND, simpler
  * chunker stack, separate from the main processors/chunker.py family
  * (Chunker/TwoTier/SemanticChunker, q10/q11/q34/q44).
  *
  * Faithful quirks preserved:
  *   - routing is recursive | sentence | ELSE→fixed
  *     (document_processor.py:36-54): the rechunk endpoint advertises
  *     "recursive or semantic" (chunks.py:297) but "semantic" falls
  *     through to the FIXED chunker;
  *   - recursive: the separator search tests membership in the tail
  *     20% slice (`chunk_text[int(chunk_size*0.8):]`) but then rfind()s
  *     over the WHOLE chunk (:92-95), so a separator present early but
  *     not late still breaks at its LAST early occurrence; the ""
  *     separator always matches, making the search total; the stored
  *     text is stripped but chunk_id hashes the UNstripped text and
  *     `end` spans its unstripped length (:100-106); sub-min chunks
  *     are dropped but still advance the cursor;
  *   - fixed: end clamps to len(content), and a non-positive step
  *     (overlap >= size) snaps the cursor to the last chunk's end — the
  *     infinite-loop guard (:196-200);
  *   - sentence: the mid-loop flush computes `start` via
  *     `" ".join(chunks)` where `chunks` is a list of DICTS
  *     (:138-139) — a live TypeError on the SECOND mid-loop flush, so
  *     any content producing 3+ sentence chunks fails the whole task
  *     and the rechunk error path marks the document FAILED
  *     (chunks.py:584-594). One mid-flush plus the final flush is fine,
  *     but then the final chunk's `start` is computed over
  *     `chunks[:-1]` — the empty prefix — so it reports 0 (:166);
  *   - chunk ids are md5(text)[:8], chunk metadata echoes the request
  *     params, the old chunk set is replaced wholesale, and the
  *     document lands in pending_review with a last_chunking summary
  *     (chunks.py:546-580).
  *
  * Scale: one mapPartitions pass over (document_id, content) — the
  * loops are per-document and bounded by content length; no shuffle.
  * Cites document_processor.py:13-202 as the contract source.
  */
object DocProcessorChunker {

  final case class RawChunk(text: String, start: Long, end: Long,
      chunkId: String)

  private def md5_8(s: String): String = {
    val d = java.security.MessageDigest.getInstance("MD5")
      .digest(s.getBytes("UTF-8"))
    d.map("%02x".format(_)).mkString.substring(0, 8)
  }

  // All offsets/lengths below are CODE POINTS, matching Python's len()
  // and slicing (and the engine's Spark length/substr + the DuckDB
  // oracle) — Java String indices count UTF-16 units and drift on
  // non-BMP content (and can split a surrogate pair mid-window).
  private def cps(s: String): Array[Int] = s.codePoints().toArray

  private def cpSlice(a: Array[Int], from: Int, until: Int): String =
    new String(a, from, until - from)

  private def cpLen(s: String): Int = s.codePointCount(0, s.length)

  /** document_processor.py:174-202. */
  def fixedChunks(content: String, chunkSize: Int,
      chunkOverlap: Int): Seq[RawChunk] = {
    val a = cps(content)
    val out = scala.collection.mutable.ArrayBuffer.empty[RawChunk]
    var pos = 0
    while (pos < a.length) {
      val end = math.min(pos + chunkSize, a.length)
      val text = cpSlice(a, pos, end)
      out += RawChunk(text, pos, end, md5_8(text))
      pos += chunkSize - chunkOverlap
      if (pos <= out.last.start.toInt) pos = out.last.end.toInt
    }
    out.toSeq
  }

  private val separators = Seq("\n## ", "\n### ", "\n#### ", "\n\n",
    "\n", ". ", " ", "")

  /** document_processor.py:56-114.
    *
    * Divergence from the reference, on purpose: when a separator break
    * shrinks the chunk to <= chunk_overlap code points, the Python
    * advance `pos + len(text) - overlap` stops moving (or goes
    * negative) and the task spins forever / corrupts its slice. A
    * distributed operator must not hang an executor, so the cursor
    * snaps to the pre-break window end instead — the same guard the
    * reference's OWN fixed chunker applies (:199-200). */
  def recursiveChunks(content: String, chunkSize: Int, chunkOverlap: Int,
      minChunkSize: Int): Seq[RawChunk] = {
    val a = cps(content)
    val out = scala.collection.mutable.ArrayBuffer.empty[RawChunk]
    var pos = 0
    var done = false
    while (!done && pos < a.length) {
      val chunkEnd = math.min(pos + chunkSize, a.length)
      var text = cpSlice(a, pos, chunkEnd)
      if (chunkEnd < a.length) {
        val tailFrom = math.min((chunkSize * 0.8).toInt, cpLen(text))
        val tail = cpSlice(cps(text), tailFrom, cpLen(text))
        // membership tested in the tail slice, rfind over the WHOLE
        // chunk — and "" always matches (a no-op break), so the
        // search always terminates on some separator
        separators.find(tail.contains).foreach { sep =>
          val lastSepUtf16 = text.lastIndexOf(sep)
          if (lastSepUtf16 > 0) {
            // convert the UTF-16 index to code points (sep is ASCII)
            val lastSep = text.codePointCount(0, lastSepUtf16)
            text = cpSlice(a, pos, pos + lastSep + sep.length)
          }
        }
      }
      if (cpLen(LlmResponse.pyStrip(text)) >= minChunkSize)
        out += RawChunk(LlmResponse.pyStrip(text), pos,
          pos + cpLen(text), md5_8(text))
      if (chunkEnd < a.length) {
        val next = pos + cpLen(text) - chunkOverlap
        pos = if (next <= pos) chunkEnd else next
      } else done = true
    }
    out.toSeq
  }

  /** document_processor.py:116-172. Returns None when the reference
    * raises its join-of-dicts TypeError — any input needing a second
    * mid-loop flush (3+ chunks). */
  // re.split parity: keep trailing empties (Java's default split drops
  // them; Python never does) — a content ending in "x! " yields a
  // trailing "" sentence that the join then renders as a dangling space
  private val sentenceSplit =
    java.util.regex.Pattern.compile("(?<=[.!?])\\s+")

  def sentenceChunks(content: String, chunkSize: Int,
      chunkOverlap: Int): Option[Seq[RawChunk]] = {
    val sentences = sentenceSplit.split(content, -1)
    val out = scala.collection.mutable.ArrayBuffer.empty[RawChunk]
    var cur = scala.collection.mutable.ArrayBuffer.empty[String]
    var curSize = 0
    var crashed = false
    val it = sentences.iterator
    while (it.hasNext && !crashed) {
      val s = it.next()
      if (curSize + cpLen(s) > chunkSize && cur.nonEmpty) {
        if (out.nonEmpty) crashed = true // " ".join(list-of-dicts) TypeError
        else {
          val text = cur.mkString(" ")
          out += RawChunk(text, 0L, cpLen(text).toLong, md5_8(text))
          if (chunkOverlap > 0) {
            val keep = scala.collection.mutable.ArrayBuffer.empty[String]
            var overlapSize = 0
            var i = cur.length - 1
            var stop = false
            while (i >= 0 && !stop) {
              overlapSize += cpLen(cur(i))
              if (overlapSize >= chunkOverlap) stop = true
              else keep.insert(0, cur(i))
              i -= 1
            }
            cur = keep
            curSize = overlapSize
          } else {
            cur = scala.collection.mutable.ArrayBuffer.empty
            curSize = 0
          }
        }
      }
      if (!crashed) {
        cur += s
        curSize += cpLen(s)
      }
    }
    if (crashed) None
    else {
      if (cur.nonEmpty) {
        val text = cur.mkString(" ")
        // start over chunks[:-1] — the prefix EXCLUDING the chunk being
        // appended, i.e. everything flushed so far minus the last one:
        // with at most one prior chunk this is always the empty prefix
        out += RawChunk(text, 0L, cpLen(content).toLong, md5_8(text))
      }
      Some(out.toSeq)
    }
  }

  final case class RechunkRow(document_id: String, arm: String,
      chunk_number: Option[Int], chunk_text: Option[String],
      chunk_size: Option[Int], start_position: Option[Long],
      end_position: Option[Long], chunk_id: Option[String],
      method: String, doc_status: String, total_chunks: Option[Int])

  /** The rechunk task over a (document_id, content) frame: routes the
    * method (semantic→fixed fallback), replaces the chunk set, and
    * emits per-chunk rows plus the document outcome — pending_review
    * with the last_chunking total on success, or a single 'failed' row
    * (no chunks) when the sentence arm hits its TypeError. */
  def rechunk(docs: DataFrame, method: String, chunkSize: Int,
      chunkOverlap: Int, minChunkSize: Int = 100): DataFrame = {
    val spark = docs.sparkSession
    import spark.implicits._
    docs.select(col("document_id").cast("string"),
        col("content").cast("string"))
      .as[(String, String)]
      .mapPartitions { rows =>
        rows.flatMap { case (docId, content) =>
          val result: Option[Seq[RawChunk]] = method match {
            case "recursive" =>
              Some(recursiveChunks(content, chunkSize, chunkOverlap,
                minChunkSize))
            case "sentence" => sentenceChunks(content, chunkSize,
              chunkOverlap)
            case _ => Some(fixedChunks(content, chunkSize, chunkOverlap))
          }
          result match {
            case None =>
              Iterator(RechunkRow(docId, "failed", None, None, None, None,
                None, None, method, "failed", None))
            case Some(chunks) =>
              chunks.iterator.zipWithIndex.map { case (c, i) =>
                RechunkRow(docId, "chunk", Some(i), Some(c.text),
                  Some(cpLen(c.text)), Some(c.start), Some(c.end),
                  Some(c.chunkId), method, "pending_review",
                  Some(chunks.length))
              }
          }
        }
      }.toDF()
  }
}
