package graft.operators

import java.util.Locale
import java.util.regex.Pattern

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions.col

import graft.Partitioning

/** Faithful row-level twin of the reference's semantic chunker
  * (app/processors/semantic_chunker.py:15-316): regex sentence split
  * with abbreviation guards, consecutive-similarity boundaries,
  * short-chunk merge (scan with skip), large-chunk split, and the
  * per-chunk metadata frame (semantic focus = most-representative
  * sentence, previous/next context windows).
  *
  * The embedding model is an injectable `encode` boundary (the
  * reference holds a SentenceTransformer); [[stubEncode]] is the
  * deterministic md5-feature stand-in shared byte-for-byte with the
  * parity fixtures (tools/gen_parity_fixtures2.py), so
  * ReferenceParity2Spec replays the reference's OWN outputs through
  * this twin. Real deployments plug a batched client here, same as
  * [[Embedder]].
  *
  * Complements [[SemanticChunker]] (the declarative DataFrame shape
  * used by the oracle gates): this twin carries the reference's exact
  * sentence tier and metadata; [[chunkDocuments]] is its distributed
  * face — per-document row logic, embarrassingly parallel, no
  * shuffle beyond the initial spread.
  *
  * All character slicing counts CODE POINTS (Python string slicing),
  * not UTF-16 units.
  */
object SemanticChunkerRow {

  type Encoder = Seq[String] => Seq[Array[Double]]

  /** Deterministic embedding stand-in: 16 dims; per lowercase
    * whitespace token, dim i accumulates (md5_byte_i - 127.5); a
    * token-free sentence encodes as [1,0,...]. Values are exact
    * multiples of 0.5, so sums are exact in double on both sides of
    * the parity fixture. */
  def stubEncode(sentences: Seq[String]): Seq[Array[Double]] =
    sentences.map { s =>
      val toks = s.toLowerCase(Locale.ROOT).split("(?U)\\s+")
        .filter(_.nonEmpty)
      val v = new Array[Double](16)
      if (toks.isEmpty) { v(0) = 1.0; v }
      else {
        val md = java.security.MessageDigest.getInstance("MD5")
        toks.foreach { t =>
          val d = md.digest(t.getBytes("UTF-8"))
          var i = 0
          while (i < 16) { v(i) += (d(i) & 0xff) - 127.5; i += 1 }
        }
        v
      }
    }

  /** Cosine with the exact operation order of the parity stand-in:
    * dot / (sqrt(na) * sqrt(nb)), sequential accumulation. */
  def cosine(a: Array[Double], b: Array[Double]): Double = {
    var dot = 0.0; var na = 0.0; var nb = 0.0
    var i = 0
    while (i < a.length) {
      dot += a(i) * b(i); na += a(i) * a(i); nb += b(i) * b(i); i += 1
    }
    dot / (math.sqrt(na) * math.sqrt(nb))
  }

  // (?U) = UNICODE_CHARACTER_CLASS so \b and \s match Python's
  // unicode-aware str regex semantics
  private val AbbrevRe =
    Pattern.compile("(?U)\\b(Dr|Mr|Mrs|Ms|Prof|Sr|Jr)\\.\\s*")
  private val InitialRe = Pattern.compile("(?U)\\b([A-Z])\\.\\s*")
  private val SentSplitRe = Pattern.compile("(?U)(?<=[.!?])\\s+(?=[A-Z])")

  /** split_into_sentences (:48-59): abbreviation and single-initial
    * dots are masked (consuming trailing whitespace, re-emitting one
    * space), text splits on terminator + whitespace + capital, dots
    * are restored and blanks dropped. */
  def splitIntoSentences(text: String): Vector[String] = {
    val masked = InitialRe.matcher(
      AbbrevRe.matcher(text).replaceAll("$1<DOT> "))
      .replaceAll("$1<DOT> ")
    SentSplitRe.split(masked, -1).iterator
      .map(_.replace("<DOT>", ".").trim)
      .filter(_.nonEmpty).toVector
  }

  /** find_semantic_boundaries (:79-103): boundary after sentence i
    * when sim(i, i+1) < threshold. */
  def findBoundaries(sim: Array[Array[Double]],
      threshold: Double): Vector[Int] =
    (0 until sim.length - 1).collect {
      case i if sim(i)(i + 1) < threshold => i + 1
    }.toVector

  private def wordCount(s: String): Int =
    s.split("(?U)\\s+").count(_.nonEmpty)

  /** merge_short_chunks (:105-142), the reference's exact scan: a
    * chunk under `minChunkSize` words (and not last) merges with its
    * NEXT chunk when the mean pairwise similarity between the two
    * blocks is >= 0.8 * threshold; the pair is then skipped. */
  def mergeShortChunks(chunks: Vector[Vector[String]],
      sim: Array[Array[Double]], idx: Vector[(Int, Int)],
      threshold: Double, minChunkSize: Int): Vector[Vector[String]] = {
    val merged = Vector.newBuilder[Vector[String]]
    var i = 0
    while (i < chunks.length) {
      val cur = chunks(i)
      val size = cur.iterator.map(wordCount).sum
      var consumed = false
      if (size < minChunkSize && i < chunks.length - 1) {
        val (cs, ce) = idx(i)
        val (ns, ne) = idx(i + 1)
        var sum = 0.0
        var r = cs
        while (r < ce) {
          var c = ns
          while (c < ne) { sum += sim(r)(c); c += 1 }
          r += 1
        }
        val avg = sum / ((ce - cs).toLong * (ne - ns))
        if (avg >= threshold * 0.8) {
          merged += cur ++ chunks(i + 1)
          i += 2
          consumed = true
        }
      }
      if (!consumed) { merged += cur; i += 1 }
    }
    merged.result()
  }

  /** _split_large_chunk (:239-263): greedy word-count packing. */
  def splitLargeChunk(sentences: Vector[String],
      maxSize: Int): Vector[Vector[String]] = {
    val out = Vector.newBuilder[Vector[String]]
    var cur = Vector.empty[String]
    var curSize = 0
    sentences.foreach { s =>
      val n = wordCount(s)
      if (curSize + n > maxSize && cur.nonEmpty) {
        out += cur; cur = Vector(s); curSize = n
      } else { cur = cur :+ s; curSize += n }
    }
    if (cur.nonEmpty) out += cur
    out.result()
  }

  // Python-slicing helpers: code points, clamped
  private def cpTake(s: String, n: Int): String = {
    val end = s.offsetByCodePoints(0,
      math.min(n, s.codePointCount(0, s.length)))
    s.substring(0, end)
  }
  private def cpTakeRight(s: String, n: Int): String = {
    val total = s.codePointCount(0, s.length)
    s.substring(s.offsetByCodePoints(0, math.max(0, total - n)))
  }

  private val LeadWordRe =
    Pattern.compile("(?U)^(The|This|These|Those|It|They|We|You|I)\\s+")

  /** _extract_key_phrase (:303-316). */
  def extractKeyPhrase(sentence: String): String = {
    val s = LeadWordRe.matcher(sentence).replaceFirst("")
    val head = cpTake(s, 50)
    (if (head.contains(",")) head.split(",", -1)(0) else head).trim
  }

  final case class SemChunk(text: String, sentenceCount: Int,
      tokenCount: Int, semanticFocus: String, chunkIndex: Int,
      totalChunks: Int, previousContext: Option[String],
      nextContext: Option[String])

  /** create_semantic_chunks (:144-237) end to end. */
  def createSemanticChunks(text: String, encode: Encoder = stubEncode,
      threshold: Double = 0.5, minChunkSize: Int = 50,
      maxChunkSize: Int = 200,
      maintainContext: Boolean = true): Vector[SemChunk] = {
    val sentences = splitIntoSentences(text)
    if (sentences.isEmpty) return Vector.empty

    val emb = encode(sentences).toArray
    val sim = Array.tabulate(emb.length, emb.length) {
      (i, j) => cosine(emb(i), emb(j))
    }
    val boundaries = findBoundaries(sim, threshold)

    val chunks0 = Vector.newBuilder[Vector[String]]
    val idx0 = Vector.newBuilder[(Int, Int)]
    var start = 0
    boundaries.foreach { b =>
      chunks0 += sentences.slice(start, b); idx0 += ((start, b))
      start = b
    }
    if (start < sentences.length) {
      chunks0 += sentences.drop(start)
      idx0 += ((start, sentences.length))
    }

    val merged = mergeShortChunks(chunks0.result(), sim, idx0.result(),
      threshold, minChunkSize)

    val finalChunks = merged.flatMap { chunk =>
      // the reference counts words of the JOINED text (:192-193)
      if (wordCount(chunk.mkString(" ")) > maxChunkSize)
        splitLargeChunk(chunk, maxChunkSize)
      else Vector(chunk)
    }

    finalChunks.zipWithIndex.map { case (cs, i) =>
      val chunkText = cs.mkString(" ")
      val focus =
        if (cs.length > 1) {
          val ce = encode(cs).toArray
          val means = Array.tabulate(ce.length) { r =>
            var s = 0.0
            var c = 0
            while (c < ce.length) { s += cosine(ce(r), ce(c)); c += 1 }
            s / ce.length
          }
          // np.argmax: first index of the maximum
          var best = 0
          var bi = 1
          while (bi < means.length) {
            if (means(bi) > means(best)) best = bi
            bi += 1
          }
          cpTake(cs(best), 100)
        } else if (cs.nonEmpty) cpTake(cs.head, 100)
        else ""
      val prev =
        if (maintainContext && finalChunks.length > 1 && i > 0)
          Some(cpTakeRight(finalChunks(i - 1).mkString(" "), 200))
        else None
      val next =
        if (maintainContext && finalChunks.length > 1 &&
            i < finalChunks.length - 1)
          Some(cpTake(finalChunks(i + 1).mkString(" "), 200))
        else None
      SemChunk(chunkText, cs.length, wordCount(chunkText), focus, i,
        finalChunks.length, prev, next)
    }
  }

  /** identify_key_concepts (:265-301): top-k most-representative
    * sentences (by mean similarity), key phrase of each. Tie order
    * follows value-ascending-take-last-reversed, the reference's
    * argsort shape (ties are encoder-measure-zero). */
  def identifyKeyConcepts(text: String, encode: Encoder = stubEncode,
      topK: Int = 5): Vector[String] = {
    val sentences = splitIntoSentences(text)
    if (sentences.isEmpty) return Vector.empty
    val emb = encode(sentences).toArray
    val means = Array.tabulate(emb.length) { r =>
      var s = 0.0
      var c = 0
      while (c < emb.length) { s += cosine(emb(r), emb(c)); c += 1 }
      s / emb.length
    }
    val top = means.zipWithIndex.sortBy(_._1)
      .takeRight(topK).reverse.map(_._2)
    top.toVector.map(i => extractKeyPhrase(sentences(i)))
      .filter(_.nonEmpty).take(topK)
  }

  /** Distributed face: one output row per chunk. Per-document row
    * logic through a per-partition encoder — the same
    * prepare-once-per-partition shape as [[Embedder]]; documents are
    * independent so this scales linearly with executors. */
  def chunkDocuments(df: DataFrame, idCol: String, textCol: String,
      mkEncode: () => Encoder = () => stubEncode,
      threshold: Double = 0.5, minChunkSize: Int = 50,
      maxChunkSize: Int = 200,
      maintainContext: Boolean = true): DataFrame = {
    val spark = df.sparkSession
    import spark.implicits._
    Partitioning.spread(
        df.select(col(idCol).cast("long"), col(textCol)))
      .as[(Long, String)]
      .mapPartitions { it =>
        val enc = mkEncode()
        it.flatMap { case (id, text) =>
          createSemanticChunks(text, enc, threshold, minChunkSize,
            maxChunkSize, maintainContext).map(c => (id, c.chunkIndex,
            c.text, c.sentenceCount, c.tokenCount, c.semanticFocus,
            c.totalChunks, c.previousContext, c.nextContext))
        }
      }
      .toDF("doc_id", "chunk_index", "chunk_text", "sentence_count",
        "token_count", "semantic_focus", "total_chunks",
        "previous_context", "next_context")
  }
}
