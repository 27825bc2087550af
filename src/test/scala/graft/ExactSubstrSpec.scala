package graft

import org.scalatest.funsuite.AnyFunSuite

import org.apache.spark.sql.Row
import org.apache.spark.sql.functions.col

import graft.operators.Dedup

/** Exact-substring span removal (Dedup.removeSharedSpans — q200's
  * operator; Lee et al. 2022 "ExactSubstr"): keep-first law on a
  * hand-built corpus where every covered window is known, plus the
  * degenerate shapes (short doc, internal-only repeat, null text)
  * the sf gate can't guarantee it exercises. */
class ExactSubstrSpec extends AnyFunSuite {
  lazy val spark = TestSession.spark
  import spark.implicits._

  private def run(rows: Seq[(Long, String)], n: Int): Map[Long, Row] =
    Dedup.removeSharedSpans(
        rows.toDF("doc_id", "text"), "doc_id", "text", n)
      .collect().map(r => r.getLong(0) -> r).toMap

  test("keep-first: the min-id doc keeps every token; later docs " +
      "lose exactly the covered windows") {
    // doc 1 owns "a b c"; doc 2 repeats it at positions 0 and 4 —
    // covered tokens {0,1,2} ∪ {4,5,6}; position 3 ("x") survives.
    val out = run(Seq(
      1L -> "a b c q r",
      2L -> "a b c x a b c"), n = 3)
    assert(out(1L).getLong(1) === 5L && out(1L).getLong(2) === 0L)
    assert(out(1L).getString(3) === "a b c q r")
    assert(out(2L).getLong(2) === 6L)
    assert(out(2L).getString(3) === "x")
  }

  test("overlapping windows union, not double-count: a 2n-long " +
      "repeat drops 2n tokens once") {
    // doc 2's first 6 tokens replay doc 1 verbatim — four 3-gram
    // hits at positions 0..3, whose [p, p+3) windows union to {0..5}
    val out = run(Seq(
      1L -> "a b c d e f",
      2L -> "a b c d e f tail only here"), n = 3)
    assert(out(2L).getLong(2) === 6L)
    assert(out(2L).getString(3) === "tail only here")
  }

  test("internal-only repeats survive (the doc owns its own grams); " +
      "docs shorter than n pass untouched; null text yields 0/0/''") {
    val out = run(Seq(
      1L -> "x y z x y z x y z",  // owner of "x y z" — keeps all
      2L -> "p q",                // < n tokens: no grams, untouched
      3L -> (null: String)), n = 3)
    assert(out(1L).getLong(2) === 0L)
    assert(out(1L).getString(3) === "x y z x y z x y z")
    assert(out(2L).getLong(1) === 2L && out(2L).getLong(2) === 0L)
    assert(out(2L).getString(3) === "p q")
    assert(out(3L).getLong(1) === 0L && out(3L).getLong(2) === 0L)
    assert(out(3L).getString(3) === "")
  }

  test("tokenizer is the corpus tokenizer: case and punctuation " +
      "cannot hide a shared span") {
    val out = run(Seq(
      1L -> "the quick brown fox",
      2L -> "The, QUICK; brown... FOX!"), n = 4)
    assert(out(2L).getLong(2) === 4L)
    assert(out(2L).getString(3) === "")
  }

  test("sf0.001 sanity: output is one row per doc, drops are " +
      "window-aligned (n_dropped >= n whenever > 0), and the first " +
      "doc of every shared gram keeps it") {
    val docs = Tables.load(spark, "/root/testdata/sf0.001", "documents")
    val out = Dedup.removeSharedSpans(docs, "doc_id", "text", 8).cache()
    try {
      assert(out.count() === docs.count())
      val bad = out.where(col("n_dropped") > 0 && col("n_dropped") < 8)
      assert(bad.count() === 0L, "a hit covers at least one full window")
      val hit = out.where(col("n_dropped") > 0).count()
      assert(hit > 0L, "sf0.001 is known to contain cross-doc 8-grams")
      // the smallest doc_id among the affected docs must itself be
      // clean only if it owns every gram it shares — spot the global
      // minimum id: it can never lose tokens (nothing precedes it)
      val minId = docs.agg(org.apache.spark.sql.functions.min("doc_id"))
        .head().getLong(0)
      assert(out.where(col("doc_id") === minId)
        .head().getAs[Long]("n_dropped") === 0L)
    } finally out.unpersist()
  }

  test("r19 incremental span owners: merged-over-OVERLAPPING batches " +
      "equals one-shot (min distributes); unknown grams never " +
      "convict; null-id docs never convict (strict > on a null id)") {
    val rows = Seq(
      1L -> "a b c q r",
      2L -> "a b c x a b c",
      3L -> "q r s t u")
    val docs = rows.toDF("doc_id", "text")
    val oneShot = Dedup.removeSharedSpans(docs, "doc_id", "text", 3)
    // overlapping split: doc 2 appears in BOTH batches (replayed delta)
    val a = Dedup.spanGramOwners(
      docs.where(col("doc_id") <= 2), "doc_id", "text", 3)
    val b = Dedup.spanGramOwners(
      docs.where(col("doc_id") >= 2), "doc_id", "text", 3)
    val merged = Dedup.mergeSpanGramOwners(a, b)
    val viaMerge = Dedup.removeSharedSpansWithOwners(
      docs, "doc_id", "text", 3, merged)
    assert(viaMerge.collect().toSet === oneShot.collect().toSet)
    // a delta with an unseen gram keeps it; the snapshot-owned span drops
    val delta = Seq(9L -> "a b c z z z").toDF("doc_id", "text")
    val out = Dedup.removeSharedSpansWithOwners(
        delta, "doc_id", "text", 3, merged)
      .collect().map(r => r.getLong(0) ->
        ((r.getLong(1), r.getLong(2), r.getString(3)))).toMap
    assert(out(9L) === ((6L, 3L, "z z z")))
    // null-id delta row: nothing convicts (null > owner is never true)
    val nullDelta = Seq((null.asInstanceOf[java.lang.Long], "a b c q r"))
      .toDF("doc_id", "text")
    val outNull = Dedup.removeSharedSpansWithOwners(
      nullDelta, "doc_id", "text", 3, merged).collect()
    assert(outNull.length === 1 && outNull(0).getLong(2) === 0L &&
      outNull(0).getString(3) === "a b c q r")
  }
}
