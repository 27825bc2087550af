package graft.streaming

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** The per-document progress SSE stream of GET
  * /documents/{id}/progress (app/api/documents.py:148-248) — the
  * OTHER event family next to the corpus-wide status stream
  * (api/sse.py, [[StatusEvents]]): connected / progress / job_update /
  * heartbeat / complete / timeout / error frames.
  *
  * What the engine owns is the deterministic frame rendering and the
  * poll-loop's emission schedule; the asyncio queue plumbing is
  * serving-tier. JSON frames render via to_json (engine-canonical
  * compact separators, same convention as [[StatusEvents.frame]]).
  *
  * Faithful quirk: the completion check (`percentage == 100` or a
  * terminal status → 'complete' frame, :189-191) reads ONLY in-process
  * queue events. A Celery-driven run — where progress arrives solely
  * through the job-status poll in the timeout branch (:198-216) —
  * never emits 'complete': it heartbeats every 5th silent second and
  * dies at the 30-timeout 'timeout' frame even if the job finished.
  * [[pollTimeline]] reproduces exactly that poll-only schedule.
  */
object ProgressStream {

  private def sse(json: Column): Column =
    concat(lit("data: "), json, lit("\n\n"))

  /** documents.py:175. */
  def connected(docId: Column): Column =
    sse(to_json(struct(lit("connected").as("event"),
      docId.as("document_id")), Map("ignoreNullFields" -> "false")))

  /** documents.py:205-212 — the job poll's event, reference key
    * order. */
  def jobUpdate(docId: Column, jobId: Column, status: Column,
      progress: Column, currentStep: Column): Column =
    sse(to_json(struct(lit("job_update").as("event"),
      docId.as("document_id"), jobId.as("job_id"), status.as("status"),
      progress.as("progress"), currentStep.as("current_step")),
      Map("ignoreNullFields" -> "false")))

  /** documents.py:219-220. */
  def heartbeat(docId: Column): Column =
    sse(to_json(struct(lit("heartbeat").as("event"),
      docId.as("document_id")), Map("ignoreNullFields" -> "false")))

  /** documents.py:190-191 — only reachable from queue events. */
  def complete(finalStatus: Column): Column =
    sse(to_json(struct(lit("complete").as("event"),
      coalesce(finalStatus, lit("completed")).as("final_status")),
      Map("ignoreNullFields" -> "false")))

  /** documents.py:223-224. */
  def timeoutFrame: Column =
    sse(to_json(struct(lit("timeout").as("event"),
      lit("No updates received for 30 seconds").as("message")),
      Map("ignoreNullFields" -> "false")))

  /** documents.py:227-228. */
  def error(message: Column): Column =
    sse(to_json(struct(lit("error").as("event"), message.as("message")),
      Map("ignoreNullFields" -> "false")))

  /** The Celery-driven (poll-only) emission schedule over a
    * (document_id, job_id, status, progress, current_step) frame:
    * seq 0 = connected, then per silent tick 1..ticks a job_update
    * plus a heartbeat every 5th tick, and the timeout frame last —
    * never a 'complete', however finished the job is (see the class
    * doc). One generator per document row, no shuffle. */
  def pollTimeline(jobs: DataFrame, ticks: Int = 30): DataFrame = {
    // Spark's sequence(1, 0) yields a DESCENDING [1, 0], not an empty
    // range — guard both generators so ticks < 5 emits no phantom
    // heartbeats and ticks = 0 no job updates
    def upTo(n: Int) =
      if (n >= 1) sequence(lit(1), lit(n))
      else array().cast("array<int>")
    val ticked = jobs.select(col("document_id"), col("job_id"),
        col("status"), col("progress"), col("current_step"),
        explode(upTo(ticks)).as("tick"))
      .select(col("document_id"), (col("tick") * 10).as("seq"),
        jobUpdate(col("document_id"), col("job_id"), col("status"),
          col("progress"), col("current_step")).as("frame"))
      .unionByName(jobs
        .select(col("document_id"), explode(upTo(ticks / 5)).as("hb"))
        .select(col("document_id"), (col("hb") * 50 + 1).as("seq"),
          heartbeat(col("document_id")).as("frame")))
    jobs.select(col("document_id"), lit(0).as("seq"),
        connected(col("document_id")).as("frame"))
      .unionByName(ticked)
      .unionByName(jobs.select(col("document_id"),
        lit(10 * ticks + 2).as("seq"), timeoutFrame.as("frame")))
  }
}
