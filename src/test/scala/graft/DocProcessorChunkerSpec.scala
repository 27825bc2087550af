package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.operators.DocProcessorChunker
import graft.operators.DocProcessorChunker.RawChunk

/** Pins the DocumentProcessor chunker family behind /rechunk
  * (document_processor.py:13-202) against vectors computed by running
  * the reference's exact algorithms: the semantic→fixed routing
  * fallback, the tail-membership/whole-rfind recursive break search,
  * the md5-of-unstripped ids, and the sentence arm's live TypeError
  * on a second mid-loop flush. */
class DocProcessorChunkerSpec extends AnyFunSuite {
  lazy val spark = TestSession.spark

  test("fixed windows clamp the last end and overlap the step") {
    val got = DocProcessorChunker.fixedChunks(
      "alpha beta gamma delta epsilon zeta eta theta iota kappa", 20, 5)
    assert(got === Seq(
      RawChunk("alpha beta gamma del", 0, 20, "1eb0e64c"),
      RawChunk("a delta epsilon zeta", 15, 35, "7e3646fe"),
      RawChunk(" zeta eta theta iota", 30, 50, "e32726ea"),
      RawChunk(" iota kappa", 45, 56, "a47e7492")))
  }

  test("fixed: overlap >= size trips the infinite-loop guard") {
    // step = 0: the guard snaps the cursor to the last chunk's end —
    // contiguous windows instead of a hang (document_processor.py:199)
    val got = DocProcessorChunker.fixedChunks("abcdefghij", 4, 4)
    assert(got === Seq(
      RawChunk("abcd", 0, 4, "e2fc714c"),
      RawChunk("efgh", 4, 8, "1f7690eb"),
      RawChunk("ij", 8, 10, "7bed657a")))
  }

  test("recursive: break at last separator, strip stored, hash unstripped") {
    val c = "Intro line one.\n\nPara two is here with words. " +
      "More text follows now.\nTail line ends here padded padded padded."
    val got = DocProcessorChunker.recursiveChunks(c, 40, 5, 10)
    // the \n\n separator is absent from the tail 20% slice, so ". "
    // wins via whole-chunk rfind; ids hash the UNstripped text, end
    // spans the unstripped length, text stores the stripped form
    assert(got === Seq(
      RawChunk("Intro line one.\n\nPara two is here with", 0, 39,
        "1641013a"),
      RawChunk("with words. More text follows now.", 34, 69, "6070dd7e"),
      RawChunk("now.\nTail line ends here padded padded", 64, 103,
        "5cd9a663"),
      RawChunk("dded padded.", 98, 110, "c4f07218")))
  }

  test("sentence: one mid flush + final is fine; final start is 0") {
    val got = DocProcessorChunker.sentenceChunks("Aaaa bbbb. Cccc dddd.",
      12, 0)
    // the final chunk's start computes over chunks[:-1] — the empty
    // prefix — so it reports 0 despite following the first chunk
    assert(got === Some(Seq(
      RawChunk("Aaaa bbbb.", 0, 10, "13f04ae6"),
      RawChunk("Cccc dddd.", 0, 21, "b9539493"))))
  }

  test("sentence: a second mid flush is the reference's TypeError") {
    val got = DocProcessorChunker.sentenceChunks(
      "Aaaa bbbb. Cccc dddd. Eeee ffff.", 12, 0)
    assert(got === None)
  }

  test("sentence: overlap retention matches the reversed-scan quirk") {
    // the first retained sentence already reaches the overlap budget,
    // so nothing is kept but curSize still counts it (cs=6)
    val got = DocProcessorChunker.sentenceChunks(
      "Aa bb. Cc dd. Ee ff gg hh iijj.", 14, 6)
    assert(got === Some(Seq(
      RawChunk("Aa bb. Cc dd.", 0, 13, "5e076649"),
      RawChunk("Ee ff gg hh iijj.", 0, 31, "819a61b5"))))
  }

  test("offsets count code points, not UTF-16 units (non-BMP parity)") {
    // vectors computed with the reference algorithm in Python, whose
    // len()/slices count code points; two astral emoji = 4 UTF-16
    // units but 2 code points
    val c = "ab😀cdef😁gh"
    val got = DocProcessorChunker.fixedChunks(c, 4, 1)
    assert(got === Seq(
      RawChunk("ab😀c", 0, 4, "e154999c"),
      RawChunk("cdef", 3, 7, "5bede326"),
      RawChunk("f😁gh", 6, 10, "0416772c"),
      RawChunk("h", 9, 10, "2510c390")))
  }

  test("rechunk chunk_size counts code points on non-BMP content") {
    val spark2 = spark
    import spark2.implicits._
    // same astral-emoji content as the fixedChunks vector above: Python
    // len(chunk["text"]) counts code points, so chunk_size must too —
    // UTF-16 .length would report 5/4/5/1 instead of 4/4/4/1
    val docs = Seq(("d1", "ab😀cdef😁gh")).toDF("document_id", "content")
    val got = DocProcessorChunker.rechunk(docs, "fixed", 4, 1)
      .orderBy("chunk_number")
      .select("chunk_text", "chunk_size")
      .as[(String, Int)].collect().toSeq
    assert(got === Seq(("ab😀c", 4), ("cdef", 4), ("f😁gh", 4), ("h", 1)))
  }

  test("recursive cursor guard: a shrunken break still advances") {
    // the Python reference loops forever here (advance = len(text) -
    // overlap = 0 after the separator break); the operator documents
    // the divergence and snaps to the pre-break window end instead
    val c = "a" * 49 + " " + "b" * 60
    val got = DocProcessorChunker.recursiveChunks(c, 60, 50, 10)
    assert(got.nonEmpty)          // terminates
    assert(got.map(_.start).distinct.length === got.length)
  }

  test("rechunk routes semantic to the FIXED chunker and frames rows") {
    val spark2 = spark
    import spark2.implicits._
    val docs = Seq(("d1", "alpha beta gamma delta epsilon zeta"))
      .toDF("document_id", "content")
    val got = DocProcessorChunker.rechunk(docs, "semantic", 20, 5)
      .orderBy("chunk_number")
      .select("arm", "chunk_number", "chunk_text", "start_position",
        "end_position", "chunk_id", "method", "doc_status", "total_chunks")
      .as[(String, Int, String, Long, Long, String, String, String, Int)]
      .collect().toSeq
    assert(got.map(_._3) === Seq("alpha beta gamma del",
      "a delta epsilon zeta", " zeta"))
    assert(got.forall(r => r._1 === "chunk" && r._7 === "semantic" &&
      r._8 === "pending_review" && r._9 === 3))
  }

  test("rechunk sentence crash marks the document failed with no chunks") {
    val spark2 = spark
    import spark2.implicits._
    val docs = Seq(
      ("ok", "Aaaa bbbb. Cccc dddd."),
      ("bad", "Aaaa bbbb. Cccc dddd. Eeee ffff."))
      .toDF("document_id", "content")
    val got = DocProcessorChunker.rechunk(docs, "sentence", 12, 0)
      .groupBy("document_id", "arm", "doc_status")
      .agg(count(lit(1)).as("n"))
      .orderBy("document_id")
      .as[(String, String, String, Long)].collect().toSeq
    assert(got === Seq(
      ("bad", "failed", "failed", 1L),
      ("ok", "chunk", "pending_review", 2L)))
  }
}
