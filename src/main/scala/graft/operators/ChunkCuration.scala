package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** The chunk-curation tier: the review UI's split / merge endpoints
  * (app/api/chunks.py:351-434 split, :434-516 merge) as distributed
  * batch transforms over the chunks frame.
  *
  * The reference mutates one chunk per HTTP call; the batch forms here
  * are defined as "equivalent to applying the endpoint calls in
  * ascending chunk_number order within each document", which the
  * window-sum renumbering reproduces exactly for the reference's own
  * single-call case and composes for many calls at once.
  *
  * Faithful quirks preserved:
  *   - split discards the original end_position: the second half ends
  *     at start + len(text), not at the stored end (chunks.py:374-397
  *     recomputes both halves from the first's updated end);
  *   - merge joins texts with a single space regardless of the gap
  *     between members (chunks.py:459);
  *   - merge does NOT require contiguous members: chunks numbered
  *     between two merged members keep their numbers, and only chunks
  *     past the LAST member shift down (chunks.py:478-487) — merging
  *     (1, 3) leaves 2 where it was;
  *   - an out-of-range split position is a 400 in the reference; the
  *     batch form passes the chunk through untouched (see
  *     [[invalidSplits]] for the reject census).
  *
  * Scale: one window per document for renumbering (single shuffle on
  * document_id); the split/merge request frames are curation-sized
  * (human review actions) and broadcast.
  */
object ChunkCuration {

  private val chunkCols = Seq("chunk_id", "document_id", "chunk_number",
    "chunk_text", "chunk_size", "start_position", "end_position")

  /** Split requests that the endpoint would 400: position outside
    * (0, len(chunk_text)) — detail string mirrors chunks.py:366-370. */
  def invalidSplits(chunks: DataFrame, splits: DataFrame): DataFrame =
    chunks.join(splits.select(col("chunk_id"),
        col("split_position").cast("int")), Seq("chunk_id"))
      .where(col("split_position") <= 0 ||
        col("split_position") >= length(col("chunk_text")))
      .select(col("chunk_id"), col("split_position"),
        concat(lit("Invalid split position. Must be between 1 and "),
          length(col("chunk_text")) - 1).as("detail"))

  /** POST /chunks/{id}/split (chunks.py:351-434), batched: each valid
    * (chunk_id, split_position) request halves its chunk — the first
    * half keeps the id and number, the second gets id + ":s", number
    * + 1, and `split_from` = the original id — and every chunk after
    * a split point in the same document shifts up by the number of
    * preceding splits. */
  def splitChunks(chunks: DataFrame, splits: DataFrame): DataFrame = {
    // collapse duplicate requests per chunk (r19 review — the
    // budgetSelectByGroup duplicate-row class): two split rows for one
    // chunk would multiply its joined row, emitting DUPLICATE chunk
    // ids. The reference applied call-by-call splits the first half
    // again under the SAME id — unrepresentable in one batch; the
    // deterministic collapse keeps the minimum POSITIVE position
    // (exact dups collapse; conflicts resolve to the earliest
    // boundary). Non-positive positions filter BEFORE the min — they
    // are invalid regardless of the chunk's text, and min would let
    // one silently cancel a valid sibling request (the too-large
    // class can't cancel: if the min positive is >= len, every
    // request was). invalidSplits still censuses the raw frame.
    val sp = splits.select(col("chunk_id"), col("split_position").cast("int"))
      .where(col("split_position") > 0)
      .groupBy(col("chunk_id"))
      .agg(min(col("split_position")).as("split_position"))
    val j = chunks.join(broadcast(sp), Seq("chunk_id"), "left")
      .withColumn("_valid", col("split_position").isNotNull &&
        col("split_position") > 0 &&
        col("split_position") < length(col("chunk_text")))
    // renumber shift: splits strictly before this chunk in number order
    val w = Window.partitionBy(col("document_id")).orderBy(col("chunk_number"))
      .rowsBetween(Window.unboundedPreceding, -1)
    val shifted = j.withColumn("_shift",
      coalesce(sum(when(col("_valid"), 1).otherwise(0)).over(w), lit(0))
        .cast("int"))
    val parts = shifted.withColumn("_part",
      explode(when(col("_valid"), array(lit(0), lit(1)))
        .otherwise(array(lit(0)))))
    val pos = col("split_position")
    val text = col("chunk_text")
    val newText = when(!col("_valid"), text)
      .when(col("_part") === 0, text.substr(lit(1), pos))
      .otherwise(text.substr(pos + 1, length(text) - pos))
    parts.select(
      when(col("_part") === 1, concat(col("chunk_id"), lit(":s")))
        .otherwise(col("chunk_id")).as("chunk_id"),
      col("document_id"),
      (col("chunk_number") + col("_shift") + col("_part"))
        .as("chunk_number"),
      newText.as("chunk_text"),
      length(newText).as("chunk_size"),
      when(!col("_valid"), col("start_position"))
        .when(col("_part") === 0, col("start_position"))
        .otherwise(col("start_position") + pos).as("start_position"),
      when(!col("_valid"), col("end_position"))
        .when(col("_part") === 0, col("start_position") + pos)
        .otherwise(col("start_position") + length(text)).as("end_position"),
      when(col("_part") === 1, col("chunk_id")).as("split_from"))
  }

  /** POST /chunks/merge (chunks.py:434-516), batched: `groups` maps
    * chunk_id -> group_key; each valid group (>= 2 members, one
    * document) collapses into its lowest-numbered member — text joined
    * with " ", end = last member's end, `merged_from` = the other ids
    * in number order — and chunks past the group's last member shift
    * down by (members - 1). Cross-document groups are the endpoint's
    * 400: their members pass through untouched. */
  def mergeChunks(chunks: DataFrame, groups: DataFrame): DataFrame = {
    // contested members invalidate EVERY group they touch (r19 review,
    // twice): a chunk_id mapped to two group_keys would join into
    // both groups — consumed twice and double-counted in the shifts.
    // Assigning it to one group (the first collapse attempt) is also
    // wrong: the residual group would still merge its remaining
    // members, an outcome the reference call sequence can never
    // produce (its second call 404s on the consumed id and the WHOLE
    // call fails — the batch can't replay which call ran first). The
    // conservative law: groups sharing ANY member all pass through
    // untouched, like the cross-document 400 arm.
    // null keys first (r19 review, third pass over this face): a null
    // group_key identifies no group — countDistinct IGNORES nulls (so
    // (c,'g1')+(c,null) read uncontested) and a null never matches
    // the anti-join below, so the null row would ride into `g` and
    // duplicate its chunk in the output. Null-keyed (or null-chunk)
    // request rows are malformed — dropped; their chunks pass through
    // via the non-member path unless another row groups them.
    val gRaw = groups.select(col("chunk_id"), col("group_key"))
      .where(col("chunk_id").isNotNull && col("group_key").isNotNull)
    val contested = gRaw.groupBy(col("chunk_id"))
      .agg(countDistinct(col("group_key")).as("_ng"))
      .where(col("_ng") > 1).select(col("chunk_id"))
    val contestedGroups = gRaw
      .join(contested, Seq("chunk_id"), "left_semi")
      .select(col("group_key")).distinct()
    val g = broadcast(gRaw
      .join(contestedGroups, Seq("group_key"), "left_anti")
      .distinct())
    val members = chunks.join(g, Seq("chunk_id"))
    val gstats = members.groupBy(col("group_key")).agg(
      countDistinct(col("document_id")).as("_ndocs"),
      count(lit(1)).cast("int").as("_k"),
      first(col("document_id")).as("document_id"),
      array_sort(collect_list(struct(col("chunk_number"), col("chunk_id"),
        col("chunk_text"), col("start_position")))).as("_mems"),
      max(struct(col("chunk_number"), col("end_position"))).as("_last"))
      .withColumn("_valid", col("_ndocs") === 1 && col("_k") >= 2)
    val validStats = gstats.where(col("_valid"))
    val mergedText =
      array_join(col("_mems").getField("chunk_text"), " ")
    val merged = validStats.select(
      element_at(col("_mems"), 1).getField("chunk_id").as("chunk_id"),
      col("document_id"),
      element_at(col("_mems"), 1).getField("chunk_number")
        .as("chunk_number"),
      mergedText.as("chunk_text"),
      length(mergedText).as("chunk_size"),
      element_at(col("_mems"), 1).getField("start_position")
        .as("start_position"),
      col("_last.end_position").as("end_position"),
      array_join(slice(col("_mems").getField("chunk_id"), lit(2),
        size(col("_mems")) - 1), "|").as("merged_from"))
    // members of invalid (cross-document / singleton) groups survive;
    // validStats is curation-sized — broadcast the anti-join side
    val invalidMembers = members.join(
      broadcast(validStats.select(col("group_key"))),
      Seq("group_key"), "left_anti")
      .select(chunkCols.map(col): _*)
    val nonMembers = chunks.join(g.select(col("chunk_id")),
      Seq("chunk_id"), "left_anti")
    val surviving = nonMembers.unionByName(invalidMembers)
      .withColumn("merged_from", lit(null: String))
      .unionByName(merged)
    // shift: (k-1) for every valid group fully before this chunk; a
    // merged row never counts its own group (last >= its number)
    val perDoc = validStats.groupBy(col("document_id"))
      .agg(collect_list(struct(col("_last.chunk_number").as("last"),
        col("_k").as("k"))).as("_groups"))
    surviving.join(broadcast(perDoc), Seq("document_id"), "left")
      .withColumn("_shift", coalesce(aggregate(
        filter(col("_groups"), gr => gr.getField("last") < col("chunk_number")),
        lit(0), (acc, gr) => acc + gr.getField("k") - 1), lit(0)))
      .select(col("chunk_id"), col("document_id"),
        (col("chunk_number") - col("_shift")).as("chunk_number"),
        col("chunk_text"), col("chunk_size"),
        col("start_position"), col("end_position"), col("merged_from"))
  }

  /** GET /chunks/{id}?include_context (chunks.py:119-169): the chunk
    * row plus `context_size` characters of the parent document's
    * content on each side, clamped to the document bounds exactly as
    * the reference's Python slices do (before starts at
    * max(0, start - context_size); after ends at
    * min(len(content), end + context_size)).
    *
    * `docs` carries (document_id, content). Positions are character
    * offsets, matching the reference's in-memory `document.content`
    * slicing. Scale: one equi-join on document_id; chunks and
    * documents co-partition on the same key, and the projection only
    * materializes the two context windows, never a second copy of the
    * content column. */
  def chunkContext(chunks: DataFrame, docs: DataFrame,
      contextSize: Int): DataFrame = {
    val content = col("content")
    val beforeStart = greatest(lit(0L),
      col("start_position").cast("long") - contextSize)
    val afterEnd = least(length(content).cast("long"),
      col("end_position").cast("long") + contextSize)
    chunks.join(docs.select(col("document_id"), content), Seq("document_id"))
      .select(col("chunk_id"), col("document_id"), col("chunk_number"),
        col("chunk_text"), col("chunk_size"),
        col("start_position"), col("end_position"),
        content.substr((beforeStart + 1).cast("int"),
          (col("start_position") - beforeStart).cast("int"))
          .as("context_before"),
        content.substr((col("end_position") + 1).cast("int"),
          (afterEnd - col("end_position")).cast("int"))
          .as("context_after"))
  }

  /** PUT /chunks/{id} (chunks.py:172-239), batched: each
    * (chunk_id, text) request replaces the chunk's text, recomputes
    * chunk_size = len(text), flags `manually_edited`, and appends an
    * edit-history entry carrying the old and new lengths (the
    * reference stores `{edited_at, old_length, new_length}` in
    * chunk.metadata["edit_history"]; the batch frame surfaces the
    * lengths as columns). Offsets are NOT recomputed — the reference
    * leaves start/end_position untouched, so an edited chunk's size
    * can disagree with its span; that quirk is preserved.
    *
    * Every touched document goes to pending_review (the document
    * side-effect rides along as `doc_status`; untouched chunks carry
    * null). Requests for unknown chunk_ids are the endpoint's 404 —
    * the batch form ignores them (see the spec's census). */
  def updateChunks(chunks: DataFrame, updates: DataFrame): DataFrame = {
    // collapse duplicate chunk_ids BEFORE the join — two updates for
    // one chunk must not multiply its row. The reference applied
    // call-by-call keeps the last write; the batch frame carries no
    // call order, so the collapse is deterministic on the text value
    // (callers wanting true call-order semantics submit one update
    // per chunk, the reference's own usage).
    val up = broadcast(updates.select(col("chunk_id"), col("new_text"))
      .where(col("new_text").isNotNull)
      .groupBy(col("chunk_id")).agg(max(col("new_text")).as("new_text")))
    val j = chunks.join(up, Seq("chunk_id"), "left")
    val touched = Window.partitionBy(col("document_id"))
    val edited = col("new_text").isNotNull
    j.withColumn("_doc_touched",
        max(when(edited, 1).otherwise(0)).over(touched))
      .select(col("chunk_id"), col("document_id"), col("chunk_number"),
        when(edited, col("new_text")).otherwise(col("chunk_text"))
          .as("chunk_text"),
        when(edited, length(col("new_text"))).otherwise(col("chunk_size"))
          .as("chunk_size"),
        col("start_position"), col("end_position"),
        // len(old_text), NOT the stored chunk_size (chunks.py:204 —
        // the supabase-twin PUT leaves chunk_size stale, so the two
        // can disagree; r19 review)
        when(edited, length(col("chunk_text"))).as("old_length"),
        when(edited, length(col("new_text"))).as("new_length"),
        when(edited, lit(true)).as("manually_edited"),
        when(col("_doc_touched") === 1, lit("pending_review"))
          .as("doc_status"))
  }

  /** DELETE /chunks/{id}?renumber=true (chunks.py:240-290), batched:
    * deleted chunks drop out, each survivor's number shifts down by
    * the count of deleted chunks before it in its document, and the
    * touched documents go to pending_review. Batch semantics =
    * applying the endpoint calls in ascending chunk_number order,
    * which reduces to the reference's single-call case exactly.
    * With renumber=false numbers are left as-is (the reference's
    * optional arm). */
  def deleteChunks(chunks: DataFrame, deletes: DataFrame,
      renumber: Boolean = true): DataFrame = {
    // distinct (r19 review): a duplicated delete row would join the
    // chunk twice and count TWICE in the renumber window sum —
    // over-shifting every survivor after it
    val del = broadcast(deletes.select(col("chunk_id"),
      lit(true).as("_del")).distinct())
    val j = chunks.join(del, Seq("chunk_id"), "left")
    val w = Window.partitionBy(col("document_id")).orderBy(col("chunk_number"))
      .rowsBetween(Window.unboundedPreceding, -1)
    val touched = Window.partitionBy(col("document_id"))
    val shift = (if (renumber)
      coalesce(sum(when(col("_del"), 1).otherwise(0)).over(w), lit(0))
    else lit(0)).cast("int")
    j.withColumn("_shift", shift)
      .withColumn("_doc_touched",
        max(when(col("_del"), 1).otherwise(0)).over(touched))
      .where(col("_del").isNull)
      .select(col("chunk_id"), col("document_id"),
        (col("chunk_number") - col("_shift")).as("chunk_number"),
        col("chunk_text"), col("chunk_size"),
        col("start_position"), col("end_position"),
        when(col("_doc_touched") === 1, lit("pending_review"))
          .as("doc_status"))
  }

  /** The delete endpoint's response census (chunks.py:283-288): for
    * each deleted chunk, `affected_chunks` = how many chunks ranked
    * after it were renumbered. Applying the batch in ascending
    * chunk_number order, no chunk numbered above the current delete
    * has been removed yet, so the count is simply the document's
    * original chunks strictly past the deleted number — including
    * other chunks that a later call will itself delete. */
  def deleteCensus(chunks: DataFrame, deletes: DataFrame): DataFrame = {
    // distinct for the same duplicate-request reason as [[deleteChunks]]
    val del = broadcast(deletes.select(col("chunk_id"), lit(true).as("_del"))
      .distinct())
    val w = Window.partitionBy(col("document_id")).orderBy(col("chunk_number"))
      .rowsBetween(1, Window.unboundedFollowing)
    chunks.join(del, Seq("chunk_id"), "left")
      .withColumn("_after", coalesce(count(lit(1)).over(w), lit(0)))
      .where(col("_del"))
      .select(col("chunk_id"), col("document_id"),
        col("chunk_number"), col("_after").cast("int").as("affected_chunks"))
  }

  // ---- the supabase-client CRUD twins (chunks.py:21-82) ----
  // A SECOND, simpler trio of chunk routes alongside the richer
  // SQLAlchemy siblings above, delegating to SupabaseChunkService
  // (supabase_client_db.py:206-271). Deliberate contrasts, each a
  // faithful quirk of the twin:
  //   - PUT /{id}: `if not text` is Python truthiness — an EMPTY text
  //     is the same 400 as a missing field, checked before existence;
  //     the update writes chunk_text + updated_at ONLY, so chunk_size
  //     goes stale (the richer PUT recomputes it), nothing flags
  //     manually_edited, and no document flips to pending_review;
  //   - DELETE /{id}: the row just disappears — survivors keep their
  //     chunk_number (the richer DELETE renumbers), and again no
  //     document status side-effect;
  //   - GET /document/{id}: the raw rows ordered by chunk_index.

  /** The twins' response census over batched update + delete request
    * frames: one row per request with the route's arm and payload.
    * `updates` carries (chunk_id, text); `deletes` carries (chunk_id).
    * Scale: existence is a broadcast left join of the request sets
    * against a semi-reduced chunk-id roster; nothing large moves. */
  def supabaseChunkResponses(chunks: DataFrame, updates: DataFrame,
      deletes: DataFrame): DataFrame = {
    val allIds = updates.select(col("chunk_id"))
      .unionByName(deletes.select(col("chunk_id"))).distinct()
    val roster = broadcast(chunks.select(col("chunk_id"))
      .join(broadcast(allIds), Seq("chunk_id"), "left_semi")
      .withColumn("_hit", lit(true)))
    val up = updates.select(col("chunk_id"), col("text"))
      .join(roster, Seq("chunk_id"), "left")
      .select(lit("update").as("op"), col("chunk_id"),
        when(col("text").isNull || length(col("text")) === 0,
            lit("missing_text"))
          .when(col("_hit").isNull, lit("not_found"))
          .otherwise(lit("updated")).as("arm"))
    val del = deletes.select(col("chunk_id"))
      .join(roster, Seq("chunk_id"), "left")
      .select(lit("delete").as("op"), col("chunk_id"),
        when(col("_hit").isNull, lit("not_found"))
          .otherwise(lit("deleted")).as("arm"))
    up.unionByName(del).select(col("op"), col("chunk_id"), col("arm"),
      (col("arm").isin("updated", "deleted")).as("success"),
      when(col("arm") === "updated",
          concat(lit("Chunk "), col("chunk_id"), lit(" updated successfully")))
        .when(col("arm") === "deleted",
          concat(lit("Chunk "), col("chunk_id"), lit(" deleted successfully")))
        .as("message"),
      when(col("arm") === "missing_text", lit("Text field is required"))
        .when(col("op") === "update" && col("arm") === "not_found",
          concat(lit("Chunk "), col("chunk_id"),
            lit(" not found or update failed")))
        .when(col("op") === "delete" && col("arm") === "not_found",
          concat(lit("Chunk "), col("chunk_id"), lit(" not found")))
        .as("detail"))
  }

  /** The twins' post-state: valid updates (truthy text, existing row)
    * replace chunk_text and stamp updated_at — chunk_size and the
    * offsets stay STALE — then valid deletes drop their rows with NO
    * renumbering. A chunk both updated and deleted in one batch ends
    * deleted (the delete lands last, as sequential calls would).
    * Duplicate updates for one chunk collapse to max(text) — the same
    * documented deterministic tie-break as [[updateChunks]]: the batch
    * frame carries no call order, so the reference's sequential
    * last-write-wins is unrepresentable; callers wanting it submit
    * one update per chunk. */
  def supabaseChunkApply(chunks: DataFrame, updates: DataFrame,
      deletes: DataFrame, now: String): DataFrame = {
    val up = broadcast(updates
      .where(col("text").isNotNull && length(col("text")) > 0)
      .groupBy(col("chunk_id")).agg(max(col("text")).as("_new_text")))
    val del = broadcast(deletes.select(col("chunk_id"),
      lit(true).as("_del")).distinct())
    chunks.join(up, Seq("chunk_id"), "left")
      .join(del, Seq("chunk_id"), "left")
      .where(col("_del").isNull)
      .select(col("chunk_id"), col("document_id"), col("chunk_number"),
        coalesce(col("_new_text"), col("chunk_text")).as("chunk_text"),
        col("chunk_size"), col("start_position"), col("end_position"),
        when(col("_new_text").isNotNull, lit(now)).as("updated_at"))
  }

  /** GET /chunks/document/{id} (chunks.py:21-32 →
    * supabase_client_db.py:206-218): the raw chunk rows for the
    * requested documents, ranked by chunk_index (the supabase column
    * name for chunk_number) — no context windows, no renumbering. */
  def supabaseChunkListing(chunks: DataFrame, docIds: DataFrame): DataFrame =
    chunks.join(broadcast(docIds.select(col("document_id"))),
        Seq("document_id"), "left_semi")
      .withColumn("order_rank",
        row_number().over(Window.partitionBy(col("document_id"))
          .orderBy(col("chunk_number"), col("chunk_id"))))

  /** PUT /chunks/batch (chunks.py:83-117): the batch-update response
    * counts. `updated_count` increments only when the request carries
    * a truthy id AND truthy text (Python truthiness — empty strings
    * are skipped, not errors) and the chunk actually exists;
    * `total_requested` counts every entry, skipped or not. */
  def batchUpdateCensus(chunks: DataFrame, updates: DataFrame): DataFrame = {
    val truthy = (c: Column) => c.isNotNull && length(c) > 0
    // chunks is the big side: semi-join it down to the requested ids
    // (bounded by the curation-sized update batch) before the flagging
    // join, so nothing large is ever broadcast or re-shuffled.
    val existing = chunks.join(
        broadcast(updates.select(col("chunk_id")).where(truthy(col("chunk_id")))
          .distinct()), Seq("chunk_id"), "left_semi")
      .select(col("chunk_id"), lit(true).as("_hit"))
    updates.join(broadcast(existing), Seq("chunk_id"), "left")
      .agg(
        sum(when(truthy(col("chunk_id")) && truthy(col("new_text")) &&
          col("_hit"), 1).otherwise(0)).cast("int").as("updated_count"),
        count(lit(1)).cast("int").as("total_requested"))
  }
}
