package graft.streaming

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Document status-update events — the deterministic core of the SSE
  * stream (app/api/sse.py:81-165): poll the current snapshot, emit an
  * event for every document whose state is NEW or CHANGED versus the
  * last-seen snapshot, typed by the status→event mapping, framed as
  * `data: <json>\n\n`.
  *
  * The HTTP/asyncio plumbing (connection registry, ping keepalive) is
  * serving-tier; what the engine owns is the diff, the mapping, and
  * the frame. [[changes]] is the batch form of the poll loop's
  * `last_states` dict — at scale the diff is one join keyed by id, so
  * a snapshot-vs-snapshot comparison over the whole corpus stays a
  * single co-partitioned shuffle; with Structured Streaming the same
  * semantics fall out of `dropDuplicates` on (id, status) per the
  * LiveUpdater path. */
object StatusEvents {

  /** Status → event type (sse.py:133-143). */
  def eventType(status: Column): Column =
    when(status === "processing", lit("processing_started"))
      .when(status === "complete", lit("processing_complete"))
      .when(status === "failed", lit("processing_failed"))
      .when(status === "pending_review", lit("review_required"))
      .otherwise(lit("status_update"))

  /** The poll-loop diff (sse.py:117-147): rows of `cur` whose id is
    * absent from `prev` (first sighting emits, like a missing
    * last_states entry) or whose status moved — with Python `!=`
    * null semantics (a null status is a VALUE: null→"x" and x→null
    * emit, null→null suppresses), carried by a presence marker plus
    * a null-safe compare. Documents present only in `prev` emit
    * nothing — the reference iterates the CURRENT snapshot only. */
  def changes(cur: DataFrame, prev: DataFrame, idCol: String,
      statusCol: String): DataFrame = {
    val (p, seen) = ("_graft_prev_status", "_graft_prev_seen")
    require(!cur.columns.contains(p) && !cur.columns.contains(seen),
      s"changes(): input may not carry reserved columns $p/$seen")
    cur.join(prev.select(col(idCol), col(statusCol).as(p),
        lit(true).as(seen)), Seq(idCol), "left")
      .where(col(seen).isNull || !(col(p) <=> col(statusCol)))
      .drop(p, seen)
  }

  /** One SSE frame (sse.py:52-76): `data: {"type": ..., "document":
    * ..., ...extra}\n\n`. `document` is any struct column; null
    * fields serialize as JSON null like json.dumps (to_json drops
    * them by default). */
  def frame(eventType: Column, document: Column): Column =
    concat(lit("data: "),
      to_json(struct(eventType.as("type"), document.as("document")),
        Map("ignoreNullFields" -> "false")),
      lit("\n\n"))
}
