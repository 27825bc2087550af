package graft

import org.scalatest.funsuite.AnyFunSuite

import org.apache.spark.sql.Row
import org.apache.spark.sql.functions.col

import graft.operators.Dedup

/** Cross-document boilerplate line removal
  * (Dedup.removeBoilerplateLines — q211's operator; RefinedWeb-style
  * line dedup): the distinct-df conviction law on hand corpora where
  * every df is known, plus the edges the sf gate synthesizes but
  * cannot isolate (threshold boundary, trim-empty immunity,
  * within-doc repeats, null text, order preservation). */
class BoilerplateLinesSpec extends AnyFunSuite {
  lazy val spark = TestSession.spark
  import spark.implicits._

  private def run(rows: Seq[(Long, String)], minDf: Long): Map[Long, Row] =
    Dedup.removeBoilerplateLines(
        rows.toDF("doc_id", "text"), "doc_id", "text", minDf)
      .collect().map(r => r.getLong(0) -> r).toMap

  test("a line at df >= minDf drops from EVERY doc (no owner); " +
      "df = minDf - 1 is kept; order of survivors is preserved") {
    val banner = "accept all cookies"
    val out = run(Seq(
      1L -> s"alpha\n$banner\nbeta",
      2L -> s"$banner\ngamma",
      3L -> s"delta\nepsilon zeta\n$banner",
      // "near miss" appears in only 2 of 3 docs with minDf = 3
      4L -> "near miss\nunique four",
      5L -> "near miss\nunique five"), minDf = 3L)
    assert(out(1L).getString(3) === "alpha\nbeta")
    assert(out(1L).getLong(1) === 3L && out(1L).getLong(2) === 1L)
    assert(out(2L).getString(3) === "gamma")
    assert(out(3L).getString(3) === "delta\nepsilon zeta")
    assert(out(4L).getString(3) === "near miss\nunique four")
    assert(out(4L).getLong(2) === 0L)
    assert(out(5L).getLong(2) === 0L)
  }

  test("trim-empty lines never convict (df = corpus) and are kept; " +
      "within-doc repeats are df 1, not boilerplate") {
    val out = run(Seq(
      1L -> "a\n   \nrepeat me\nrepeat me",
      2L -> "b\n   \nc",
      3L -> "d\n   ",
      4L -> "e\n   "), minDf = 2L)
    assert(out(1L).getString(3) === "a\n   \nrepeat me\nrepeat me")
    assert(out(1L).getLong(2) === 0L)
    assert(out(2L).getString(3) === "b\n   \nc")
  }

  test("a doc losing every non-blank line renders ''; null text " +
      "behaves as one kept empty line") {
    val out = run(Seq(
      1L -> "shared one\nshared two",
      2L -> "shared one\nshared two",
      3L -> (null: String)), minDf = 2L)
    assert(out(1L).getLong(1) === 2L && out(1L).getLong(2) === 2L)
    assert(out(1L).getString(3) === "")
    assert(out(2L).getString(3) === "")
    assert(out(3L).getLong(1) === 1L && out(3L).getLong(2) === 0L)
    assert(out(3L).getString(3) === "")
  }

  test("line identity is the exact raw line: differing indentation " +
      "or case does NOT pool df") {
    val out = run(Seq(
      1L -> "Menu Home About",
      2L -> "  Menu Home About",
      3L -> "menu home about"), minDf = 2L)
    assert(out.values.forall(_.getLong(2) === 0L),
      "three raw-distinct variants each have df 1")
  }

  private def runWithin(rows: Seq[(Long, String)]): Map[Long, Row] =
    Dedup.dedupLinesWithinDoc(rows.toDF("doc_id", "text"),
        "doc_id", "text")
      .collect().map(r => r.getLong(0) -> r).toMap

  test("dedupLinesWithinDoc: first occurrence kept, later exact " +
      "repeats drop, blank separators always survive, and docs " +
      "never influence one another") {
    val out = runWithin(Seq(
      1L -> "a\nb\na\n   \nb\n   \nc",
      2L -> "a\na\na",
      3L -> "only one line",
      4L -> (null: String)))
    assert(out(1L).getLong(1) === 7L && out(1L).getLong(2) === 2L)
    assert(out(1L).getString(3) === "a\nb\n   \n   \nc")
    assert(out(2L).getLong(2) === 2L && out(2L).getString(3) === "a")
    // doc 3 repeats doc 1's alphabet but is untouched (within-doc law)
    assert(out(3L).getLong(2) === 0L)
    assert(out(4L).getLong(1) === 1L && out(4L).getLong(2) === 0L)
    assert(out(4L).getString(3) === "")
  }

  test("incremental conviction (q222 law): disjoint-snapshot counts " +
      "merge to EXACTLY the one-shot counts; overlapping ids are the " +
      "documented double-count hazard") {
    val rows = Seq(
      1L -> "banner\nalpha", 2L -> "banner\nbeta",
      3L -> "banner\ngamma", 4L -> "delta\nbanner")
    val df = rows.toDF("doc_id", "text")
    val oneShot = Dedup.boilerplateLineCounts(df, "doc_id", "text")
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    val merged = (0 to 1).map(i =>
        Dedup.boilerplateLineCounts(
          df.where(col("doc_id") % 2 === i), "doc_id", "text"))
      .reduce(Dedup.mergeBoilerplateLineCounts(_, _))
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(merged === oneShot)
    assert(merged("banner") === 4L)
    // conviction equality at the threshold
    val conv = Dedup.convictedFromCounts(
      (0 to 1).map(i => Dedup.boilerplateLineCounts(
          df.where(col("doc_id") % 2 === i), "doc_id", "text"))
        .reduce(Dedup.mergeBoilerplateLineCounts(_, _)), 4L)
      .collect().map(_.getString(0)).toSet
    assert(conv === Set("banner"))
    // the append-only contract: merging a batch that REPLAYS doc 1
    // double-counts its lines (distinct-doc df is not mergeable
    // across overlapping id sets — the scaladoc's stated assumption)
    val overlapped = Dedup.mergeBoilerplateLineCounts(
        Dedup.boilerplateLineCounts(df, "doc_id", "text"),
        Dedup.boilerplateLineCounts(
          df.where(col("doc_id") === 1L), "doc_id", "text"))
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(overlapped("banner") === 5L, "double-count, by contract")
  }

  test("dedupLinesWithinDoc: trim-blank variants are distinct " +
      "SEPARATORS (all kept) while identical non-blank lines drop " +
      "even when far apart") {
    val out = runWithin(Seq(
      1L -> "x\n   \nx\n \nx\n\nx"))
    // every x after the first drops; all three blank variants stay
    assert(out(1L).getLong(1) === 7L && out(1L).getLong(2) === 3L)
    assert(out(1L).getString(3) === "x\n   \n \n")
  }

  test("r18 dedupParagraphsAcrossDocs: keep-first by min doc id — the " +
      "owner keeps ALL its copies (incl. internal repeats), later " +
      "docs lose the paragraph; trimmed identity; blanks survive") {
    val docs = Seq(
      (1L, "shared para\n\nown one\n\nshared para"), // owner: keeps both copies
      (2L, "  shared para  \n\nown two"),            // trimmed identity: drops
      (3L, "own three\n\n   \n\nshared para"),       // blank kept, shared drops
      (4L, null.asInstanceOf[String]))               // null -> one empty para, kept
      .toDF("doc_id", "text")
    val out = Dedup.dedupParagraphsAcrossDocs(docs, "doc_id", "text")
      .collect().map(r => r.getLong(0) ->
        ((r.getLong(1), r.getLong(2), r.getString(3)))).toMap
    assert(out(1L) === ((3L, 0L, "shared para\n\nown one\n\nshared para")))
    assert(out(2L) === ((2L, 1L, "own two")))
    assert(out(3L) === ((3L, 1L, "own three\n\n   ")))
    assert(out(4L) === ((1L, 0L, "")))
  }

  test("r18 pass 11: a null-id doc keeps its paragraphs (unadjudicable " +
      "occurrences never convict) and its output row is internally " +
      "consistent — never vanished-but-uncounted") {
    val docs = Seq(
      (java.lang.Long.valueOf(1L), "shared\n\nmine"),
      (null.asInstanceOf[java.lang.Long], "shared\n\nnull own"))
      .toDF("doc_id", "text")
    val out = Dedup.dedupParagraphsAcrossDocs(docs, "doc_id", "text")
      .collect().map(r => (if (r.isNullAt(0)) -1L else r.getLong(0)) ->
        ((r.getLong(1), r.getLong(2), r.getString(3)))).toMap
    assert(out(1L) === ((2L, 0L, "shared\n\nmine")),
      "doc 1 owns 'shared' (min ignores null ids)")
    assert(out(-1L) === ((2L, 0L, "shared\n\nnull own")),
      "the null-id doc keeps everything, counted consistently")
  }

  test("r19 incremental paragraph owners: merged-over-OVERLAPPING " +
      "batches equals one-shot (min distributes — stronger than the " +
      "lines df-sum, which requires disjoint snapshots); unknown " +
      "paragraphs never convict; composition equals the batch law") {
    val docs = Seq(
      (1L, "shared para\n\nown one"),
      (2L, "shared para\n\nown two"),
      (3L, "own three\n\nshared para"))
      .toDF("doc_id", "text")
    val oneShot = Dedup.dedupParagraphsAcrossDocs(docs, "doc_id", "text")
    // overlapping split: doc 2 appears in BOTH batches (a replayed
    // delta) — the lines family's sum would double-count; min doesn't
    val a = Dedup.paragraphOwners(
      docs.where(col("doc_id") <= 2), "doc_id", "text")
    val b = Dedup.paragraphOwners(
      docs.where(col("doc_id") >= 2), "doc_id", "text")
    val merged = Dedup.mergeParagraphOwners(a, b)
    val viaMerge = Dedup.dedupParagraphsWithOwners(docs, "doc_id", "text", merged)
    assert(viaMerge.collect().toSet === oneShot.collect().toSet)
    // a batch with a paragraph the snapshot never saw: keeps (the
    // conservative incremental arm), while the snapshot-owned one drops
    val delta = Seq((9L, "shared para\n\nbrand new para"))
      .toDF("doc_id", "text")
    val out = Dedup.dedupParagraphsWithOwners(delta, "doc_id", "text", merged)
      .collect().map(r => r.getLong(0) ->
        ((r.getLong(1), r.getLong(2), r.getString(3)))).toMap
    assert(out(9L) === ((2L, 1L, "brand new para")))
  }

  test("r18 dedupParagraphsAcrossDocs: a doc losing every paragraph " +
      "keeps its row with clean_text '' and blank-run splitting " +
      "handles 3+ newlines as one separator") {
    val docs = Seq(
      (1L, "only para"),
      (2L, "only para\n\n\n\nonly para")) // 4 newlines = one separator
      .toDF("doc_id", "text")
    val out = Dedup.dedupParagraphsAcrossDocs(docs, "doc_id", "text")
      .collect().map(r => r.getLong(0) ->
        ((r.getLong(1), r.getLong(2), r.getString(3)))).toMap
    assert(out(1L) === ((1L, 0L, "only para")))
    assert(out(2L) === ((2L, 2L, "")))
  }
}
