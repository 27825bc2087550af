package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.operators.ChunkCuration

/** Pins the split/merge endpoint semantics (chunks.py:351-516),
  * including the reference's faithful quirks: discarded original
  * end_position on split, space-joined non-contiguous merges, and
  * renumbering only past the group's LAST member. */
class ChunkCurationSpec extends AnyFunSuite {
  lazy val spark = TestSession.spark

  // doc 1: "alpha beta" / "gamma delta epsilon" / "zeta" / "eta theta"
  private def chunksDf = {
    val spark2 = spark
    import spark2.implicits._
    Seq(
      ("c0", 1L, 0, "alpha beta", 10, 0L, 10L),
      ("c1", 1L, 1, "gamma delta epsilon", 19, 10L, 29L),
      ("c2", 1L, 2, "zeta", 4, 29L, 33L),
      ("c3", 1L, 3, "eta theta", 9, 33L, 42L),
      ("d0", 2L, 0, "iota kappa", 10, 0L, 10L),
      ("d1", 2L, 1, "lambda", 6, 10L, 16L))
      .toDF("chunk_id", "document_id", "chunk_number", "chunk_text",
        "chunk_size", "start_position", "end_position")
  }

  test("split halves the chunk, renumbers the tail, keeps other docs") {
    val spark2 = spark
    import spark2.implicits._
    val splits = Seq(("c1", 6)).toDF("chunk_id", "split_position")
    val out = ChunkCuration.splitChunks(chunksDf, splits)
      .orderBy("document_id", "chunk_number")
      .as[(String, Long, Int, String, Int, Long, Long, Option[String])]
      .collect().toSeq
    assert(out === Seq(
      ("c0", 1L, 0, "alpha beta", 10, 0L, 10L, None),
      ("c1", 1L, 1, "gamma ", 6, 10L, 16L, None),
      ("c1:s", 1L, 2, "delta epsilon", 13, 16L, 29L, Some("c1")),
      ("c2", 1L, 3, "zeta", 4, 29L, 33L, None),
      ("c3", 1L, 4, "eta theta", 9, 33L, 42L, None),
      ("d0", 2L, 0, "iota kappa", 10, 0L, 10L, None),
      ("d1", 2L, 1, "lambda", 6, 10L, 16L, None)))
  }

  test("two splits in one document compose their shifts") {
    val spark2 = spark
    import spark2.implicits._
    val splits = Seq(("c0", 5), ("c2", 2)).toDF("chunk_id", "split_position")
    val out = ChunkCuration.splitChunks(chunksDf, splits)
      .where(col("document_id") === 1)
      .orderBy("chunk_number")
      .select("chunk_id", "chunk_number", "chunk_text")
      .as[(String, Int, String)].collect().toSeq
    assert(out === Seq(
      ("c0", 0, "alpha"), ("c0:s", 1, " beta"),
      ("c1", 2, "gamma delta epsilon"),
      ("c2", 3, "ze"), ("c2:s", 4, "ta"),
      ("c3", 5, "eta theta")))
  }

  test("out-of-range positions pass through and are censused") {
    val spark2 = spark
    import spark2.implicits._
    val splits = Seq(("c2", 6), ("c0", 0)).toDF("chunk_id", "split_position")
    val out = ChunkCuration.splitChunks(chunksDf, splits)
    assert(out.count() === 6) // nothing split
    assert(out.where(col("chunk_id") === "c2")
      .select("chunk_text").as[String].head() === "zeta")
    val bad = ChunkCuration.invalidSplits(chunksDf, splits)
      .orderBy("chunk_id")
      .select("chunk_id", "detail").as[(String, String)].collect().toSeq
    assert(bad === Seq(
      ("c0", "Invalid split position. Must be between 1 and 9"),
      ("c2", "Invalid split position. Must be between 1 and 3")))
  }

  test("merge collapses contiguous members and shifts the tail down") {
    val spark2 = spark
    import spark2.implicits._
    val groups = Seq(("c0", "g1"), ("c1", "g1")).toDF("chunk_id", "group_key")
    val out = ChunkCuration.mergeChunks(chunksDf, groups)
      .where(col("document_id") === 1)
      .orderBy("chunk_number")
      .as[(String, Long, Int, String, Int, Long, Long, Option[String])]
      .collect().toSeq
    assert(out === Seq(
      ("c0", 1L, 0, "alpha beta gamma delta epsilon", 30, 0L, 29L, Some("c1")),
      ("c2", 1L, 1, "zeta", 4, 29L, 33L, None),
      ("c3", 1L, 2, "eta theta", 9, 33L, 42L, None)))
  }

  test("non-contiguous merge leaves the middle chunk's number alone") {
    val spark2 = spark
    import spark2.implicits._
    val groups = Seq(("c1", "g1"), ("c3", "g1")).toDF("chunk_id", "group_key")
    val out = ChunkCuration.mergeChunks(chunksDf, groups)
      .where(col("document_id") === 1)
      .orderBy("chunk_number", "chunk_id")
      .select("chunk_id", "chunk_number", "chunk_text", "end_position")
      .as[(String, Int, String, Long)].collect().toSeq
    // chunks.py:478-487 renumbers only number > LAST member (3): c2
    // keeps 2, the merged chunk sits at c1's number with c3's end
    assert(out === Seq(
      ("c0", 0, "alpha beta", 10L),
      ("c1", 1, "gamma delta epsilon eta theta", 42L),
      ("c2", 2, "zeta", 33L)))
  }

  test("cross-document groups are the endpoint's 400: members untouched") {
    val spark2 = spark
    import spark2.implicits._
    val groups = Seq(("c0", "bad"), ("d0", "bad")).toDF("chunk_id", "group_key")
    val out = ChunkCuration.mergeChunks(chunksDf, groups)
    assert(out.count() === 6)
    assert(out.where(col("merged_from").isNotNull).count() === 0)
  }

  // doc 1 content reconstructed from its chunks' spans
  private def docsDf = {
    val spark2 = spark
    import spark2.implicits._
    Seq((1L, "alpha betagamma delta epsilonzetaeta theta"),
      (2L, "iota kappalambda"))
      .toDF("document_id", "content")
  }

  test("context windows clamp to the document bounds (chunks.py:146-161)") {
    val spark2 = spark
    import spark2.implicits._
    val out = ChunkCuration.chunkContext(chunksDf, docsDf, 5)
      .orderBy("chunk_id")
      .select("chunk_id", "context_before", "context_after")
      .as[(String, String, String)].collect().toSeq
    assert(out === Seq(
      // c0 starts at 0: before clamps empty; after = 5 chars past end
      ("c0", "", "gamma"),
      ("c1", " beta", "zetae"),
      ("c2", "silon", "eta t"),
      // c3 ends at the doc's last char: after clamps empty
      ("c3", "nzeta", ""),
      ("d0", "", "lambd"),
      ("d1", "kappa", "")))
  }

  test("update replaces text, recomputes size, keeps offsets, flags the doc") {
    val spark2 = spark
    import spark2.implicits._
    val updates = Seq(("c1", "edited text")).toDF("chunk_id", "new_text")
    val out = ChunkCuration.updateChunks(chunksDf, updates)
      .orderBy("chunk_id")
      .select("chunk_id", "chunk_text", "chunk_size", "start_position",
        "end_position", "old_length", "new_length", "manually_edited",
        "doc_status")
      .as[(String, String, Int, Long, Long, Option[Int], Option[Int],
        Option[Boolean], Option[String])].collect().toSeq
    // chunks.py:186-199: size = len(new text), offsets untouched (the
    // edited chunk's span may now disagree with its size — faithful),
    // edit history carries old/new lengths, manually_edited set
    assert(out.head === ("c0", "alpha beta", 10, 0L, 10L, None, None,
      None, Some("pending_review")))
    assert(out(1) === ("c1", "edited text", 11, 10L, 29L, Some(19),
      Some(11), Some(true), Some("pending_review")))
    // doc 2 untouched: no status side effect
    assert(out.filter(_._1.startsWith("d")).forall(_._9.isEmpty))
  }

  test("delete renumbers survivors and censuses affected chunks") {
    val spark2 = spark
    import spark2.implicits._
    val deletes = Seq("c1", "c3", "d0").toDF("chunk_id")
    val out = ChunkCuration.deleteChunks(chunksDf, deletes)
      .orderBy("document_id", "chunk_number")
      .select("chunk_id", "chunk_number", "doc_status")
      .as[(String, Int, Option[String])].collect().toSeq
    assert(out === Seq(
      ("c0", 0, Some("pending_review")),
      ("c2", 1, Some("pending_review")),
      ("d1", 0, Some("pending_review"))))
    // chunks.py:283-288: affected = chunks past the deleted number at
    // call time (ascending order: later-deleted chunks still count)
    val census = ChunkCuration.deleteCensus(chunksDf, deletes)
      .orderBy("chunk_id")
      .select("chunk_id", "affected_chunks")
      .as[(String, Int)].collect().toSeq
    assert(census === Seq(("c1", 2), ("c3", 0), ("d0", 1)))
  }

  test("renumber=false leaves surviving numbers as-is") {
    val spark2 = spark
    import spark2.implicits._
    val deletes = Seq("c1").toDF("chunk_id")
    val out = ChunkCuration.deleteChunks(chunksDf, deletes, renumber = false)
      .where(col("document_id") === 1).orderBy("chunk_number")
      .select("chunk_id", "chunk_number")
      .as[(String, Int)].collect().toSeq
    assert(out === Seq(("c0", 0), ("c2", 2), ("c3", 3)))
  }

  test("duplicate update ids collapse to one row, never multiply") {
    val spark2 = spark
    import spark2.implicits._
    val updates = Seq(("c1", "AAA"), ("c1", "ZZZ"))
      .toDF("chunk_id", "new_text")
    val out = ChunkCuration.updateChunks(chunksDf, updates)
    assert(out.count() === 6) // same cardinality as the input chunks
    assert(out.where(col("chunk_id") === "c1")
      .select("chunk_text").as[String].collect().toSeq === Seq("ZZZ"))
  }

  test("r19 review: duplicate delete rows never over-shift survivors; " +
      "duplicate splits collapse to the min VALID position; contested " +
      "merge groups ALL pass through untouched; old_length reads the " +
      "ACTUAL old text, not a stale chunk_size (chunks.py:204)") {
    val spark2 = spark
    import spark2.implicits._
    // c1 deleted twice: survivors shift by ONE, not two
    val dupDel = Seq("c1", "c1").toDF("chunk_id")
    val afterDel = ChunkCuration.deleteChunks(chunksDf, dupDel)
      .where(col("document_id") === 1).orderBy("chunk_number")
      .select("chunk_id", "chunk_number").as[(String, Int)].collect().toSeq
    assert(afterDel === Seq(("c0", 0), ("c2", 1), ("c3", 2)))
    assert(ChunkCuration.deleteCensus(chunksDf, dupDel).count() === 1)
    // two split rows for c1: one split at the MIN position, no dup ids
    val dupSplit = Seq(("c1", 12), ("c1", 6)).toDF("chunk_id", "split_position")
    val afterSplit = ChunkCuration.splitChunks(chunksDf, dupSplit)
    assert(afterSplit.count() === 7)
    assert(afterSplit.where(col("chunk_id") === "c1")
      .select("chunk_text").as[String].head() === "gamma ")
    // an INVALID duplicate (position 0) must not cancel its valid
    // sibling — the reference 400s the 0 and applies the 6
    val cancelSplit = Seq(("c1", 0), ("c1", 6)).toDF("chunk_id", "split_position")
    val afterCancel = ChunkCuration.splitChunks(chunksDf, cancelSplit)
    assert(afterCancel.count() === 7)
    assert(afterCancel.where(col("chunk_id") === "c1")
      .select("chunk_text").as[String].head() === "gamma ")
    // c1 mapped to two groups: BOTH groups are contested and pass
    // through untouched (the reference sequence 404s mid-call in an
    // order the batch can't replay — merging either side would invent
    // an outcome; the conservative law is the cross-document 400 arm)
    val dupGroup = Seq(("c0", "g1"), ("c1", "g1"), ("c1", "g2"), ("c2", "g2"))
      .toDF("chunk_id", "group_key")
    val afterMerge = ChunkCuration.mergeChunks(chunksDf, dupGroup)
    assert(afterMerge.count() === 6, "nothing merges, nothing drops")
    assert(afterMerge.where(col("chunk_id") === "c0")
      .select("chunk_text").as[String].head() === "alpha beta")
    assert(afterMerge.where(col("chunk_id") === "c2")
      .select("chunk_text").as[String].head() === "zeta")
    // an uncontested group alongside the contested ones still MERGES
    // (r19 pass 8: the earlier arm's uncontested group was
    // cross-document, so it couldn't detect an over-broad
    // invalidation) — g3 is same-document (doc 2), and exact
    // duplicate (chunk_id, group_key) rows collapse
    val mixed = Seq(("c0", "g1"), ("c1", "g1"), ("c1", "g2"), ("c2", "g2"),
      ("d0", "g3"), ("d1", "g3"), ("d0", "g3"))
      .toDF("chunk_id", "group_key")
    val afterMixed = ChunkCuration.mergeChunks(chunksDf, mixed)
    assert(afterMixed.count() === 5, "g3 merges (6 chunks - 1)")
    assert(afterMixed.where(col("chunk_id") === "d0")
      .select("chunk_text").as[String].head() === "iota kappa lambda")
    // a NULL group_key row is malformed noise: it neither contests
    // its chunk's real group nor duplicates the chunk (r19 pass 8:
    // countDistinct ignores nulls and the anti-join never matches a
    // null key — unfiltered, the null row rode into the roster)
    val withNull = Seq(("c0", "g1"), ("c1", "g1"),
      ("c0", null.asInstanceOf[String]))
      .toDF("chunk_id", "group_key")
    val afterNull = ChunkCuration.mergeChunks(chunksDf, withNull)
    assert(afterNull.count() === 5, "c0+c1 merge once; no duplicate c0")
    assert(afterNull.where(col("chunk_id") === "c0")
      .select("chunk_text").as[String].head()
      === "alpha beta gamma delta epsilon")
    // stale-size row: stored size 99, actual text 4 chars — the edit
    // history's old_length is len(old_text)
    val stale = chunksDf.withColumn("chunk_size",
      when(col("chunk_id") === "c2", lit(99)).otherwise(col("chunk_size")))
    val upd = ChunkCuration.updateChunks(stale,
      Seq(("c2", "x")).toDF("chunk_id", "new_text"))
    assert(upd.where(col("chunk_id") === "c2")
      .select("old_length").as[Int].head() === 4)
  }

  test("supabase twins: falsy text beats existence, no renumber, stale size") {
    val spark2 = spark
    import spark2.implicits._
    // empty text on a MISSING chunk: the route 400s before the lookup,
    // so missing_text wins over not_found (chunks.py:40-42)
    val updates = Seq(("nope", ""), ("c1", "edited"))
      .toDF("chunk_id", "text")
    val deletes = Seq("c2").toDF("chunk_id")
    val resp = ChunkCuration
      .supabaseChunkResponses(chunksDf, updates, deletes)
      .orderBy("op", "chunk_id")
      .select("op", "chunk_id", "arm", "success")
      .as[(String, String, String, Boolean)].collect().toSeq
    assert(resp === Seq(
      ("delete", "c2", "deleted", true),
      ("update", "c1", "updated", true),
      ("update", "nope", "missing_text", false)))
    val state = ChunkCuration
      .supabaseChunkApply(chunksDf, updates, deletes, "T9")
      .where(col("document_id") === 1L).orderBy("chunk_number")
      .select("chunk_id", "chunk_number", "chunk_text", "chunk_size",
        "updated_at")
      .as[(String, Int, String, Int, Option[String])].collect().toSeq
    // c1's size stays 19 (stale — the twin never recomputes it);
    // c3 keeps number 3 after c2's delete (no renumbering)
    assert(state === Seq(
      ("c0", 0, "alpha beta", 10, None),
      ("c1", 1, "edited", 19, Some("T9")),
      ("c3", 3, "eta theta", 9, None)))
  }

  test("supabase listing ranks by chunk_index within the requested docs") {
    val spark2 = spark
    import spark2.implicits._
    val got = ChunkCuration.supabaseChunkListing(chunksDf,
        Seq(2L).toDF("document_id"))
      .orderBy("order_rank")
      .select("chunk_id", "order_rank")
      .as[(String, Int)].collect().toSeq
    assert(got === Seq(("d0", 1), ("d1", 2)))
  }

  test("batch update counts Python-truthy requests that hit a chunk") {
    val spark2 = spark
    import spark2.implicits._
    val updates = Seq(
      ("c0", "new a"),           // counts
      ("c1", ""),                // falsy text: skipped, not an error
      ("", "text"),              // falsy id: skipped
      (null: String, "text"),    // null id: skipped
      ("nope", "text"),          // unknown chunk: update fails
      ("c0", "again"))           // duplicate id: counts again
      .toDF("chunk_id", "new_text")
    val out = ChunkCuration.batchUpdateCensus(chunksDf, updates)
      .as[(Int, Int)].head()
    // chunks.py:98-106: updated_count=2 (c0 twice), total=6
    assert(out === ((2, 6)))
  }
}
