package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** The processing-jobs tier as a frame (job_tracker.py:12-120 +
  * api/processing.py:359-443): the create/update lifecycle, the
  * listing endpoint's filter→sort→page order, and the retry arm with
  * its update-before-dispatch quirk.
  *
  * The reference tracker is an in-memory dict; the frame analogue is
  * a jobs table mutated by joins — the same shape as
  * [[RelationshipCuration]]'s mutation tiers. At scale every
  * mutation is one equi-join on `id` (the update/retry side is an
  * endpoint batch — broadcast-sized) and the listing plans as a
  * top-K (TakeOrderedAndProject), never a global sort.
  */
object Jobs {

  val Queued = "queued"
  val Running = "running"
  val Completed = "completed"
  val Failed = "failed"
  val Cancelled = "cancelled"

  /** Terminal statuses stamp completed_at (job_tracker.py:74-77). */
  val Terminal: Set[String] = Set(Completed, Failed, Cancelled)

  /** Job types the retry endpoint can re-queue
    * (processing.py:404-427). */
  val RetryableTypes: Set[String] = Set("notion_scan", "gdrive_scan")

  /** New jobs with the tracker's defaults (job_tracker.py:29-46):
    * queued, progress 0, "Job queued", empty error/completed_at.
    *
    * @param requests (id, type, metadata)
    * @param now      creation timestamp column (the reference stamps
    *                 utcnow; a column so batch fixtures can carry
    *                 per-row times)
    */
  def create(requests: DataFrame, now: Column): DataFrame =
    requests.select(col("id"), col("type"),
      lit(Queued).as("status"),
      lit(0).as("progress"),
      lit("Job queued").as("message"),
      coalesce(col("metadata"), map().cast("map<string,string>"))
        .as("metadata"),
      now.as("created_at"), now.as("updated_at"),
      lit(null).cast("string").as("completed_at"),
      lit(null).cast("string").as("error"))

  /** Apply an update batch (job_tracker.py:48-81): unknown ids are
    * dropped (update_job returns None), status and updated_at always
    * set, message/error only when present, progress clamps to 0..100,
    * terminal statuses stamp completed_at, and `completed` forces
    * progress 100 AFTER the clamp.
    *
    * @param updates (id, to_status, message, progress, error) with
    *                nullable message/progress/error
    */
  def applyUpdates(jobs: DataFrame, updates: DataFrame,
      now: Column): DataFrame = {
    // collapse duplicate ids BEFORE the join (r19 review — the
    // curation-tier duplicate-request class): two update rows for one
    // job would multiply its row. The reference applied call-by-call
    // keeps the last write; a batch has no call order, so the
    // deterministic collapse takes the max struct (ONE request's
    // fields together, never a mix of two) — with TERMINAL statuses
    // leading the ordering (r19 pass 12: a plain lexical max let
    // 'running' beat 'completed'/'failed'/'cancelled', silently
    // discarding a lifecycle-ending update that no later batch will
    // ever re-send; terminal absorbs, matching the tracker's
    // end-state semantics).
    val u = updates.select(col("id"), col("to_status"),
      col("message").as("_msg"), col("progress").as("_prog"),
      col("error").as("_err"))
      .groupBy(col("id"))
      .agg(max(struct(
        col("to_status").isin(Terminal.toSeq.map(x => x: Any): _*)
          .as("_terminal"),
        col("to_status"), col("_msg"), col("_prog"),
        col("_err"))).as("_u"))
      .select(col("id"), col("_u.to_status").as("to_status"),
        col("_u._msg").as("_msg"), col("_u._prog").as("_prog"),
        col("_u._err").as("_err"))
    val clamped = least(lit(100), greatest(lit(0), col("_prog")))
    jobs.join(u, Seq("id"), "left")
      .withColumn("status", coalesce(col("to_status"), col("status")))
      .withColumn("updated_at",
        when(col("to_status").isNotNull, now).otherwise(col("updated_at")))
      .withColumn("message",
        when(col("to_status").isNotNull && col("_msg").isNotNull,
          col("_msg")).otherwise(col("message")))
      .withColumn("error",
        when(col("to_status").isNotNull && col("_err").isNotNull,
          col("_err")).otherwise(col("error")))
      .withColumn("progress",
        when(col("to_status") === Completed, lit(100))
          .when(col("to_status").isNotNull && col("_prog").isNotNull, clamped)
          .otherwise(col("progress")))
      .withColumn("completed_at",
        when(col("to_status").isin(Terminal.toSeq.map(x => x: Any): _*), now)
          .otherwise(col("completed_at")))
      .drop("to_status", "_msg", "_prog", "_err")
  }

  /** The listing endpoint (job_tracker.py:87-110): status/type
    * filters FIRST, then created_at-descending sort, then the
    * offset/limit page — unlike the document listing's post-limit
    * source filter, both filters precede pagination here. Plans as a
    * bounded top-K: filters push to the scan, `limit(offset+limit)`
    * caps the sort, and the offset window runs on the bounded page. */
  def listJobs(jobs: DataFrame, status: Option[String] = None,
      jobType: Option[String] = None, limit: Int = 50,
      offset: Int = 0): DataFrame = {
    var filtered = jobs
    status.foreach(s => filtered = filtered.where(col("status") === lit(s)))
    jobType.foreach(t => filtered = filtered.where(col("type") === lit(t)))
    val top = filtered.orderBy(col("created_at").desc).limit(offset + limit)
    Paging.dropOffset(top, col("created_at").desc, offset)
  }

  /** Celery AsyncResult ready states (celery.states.READY_STATES). */
  val CeleryReady: Set[String] = Set("SUCCESS", "FAILURE", "REVOKED")

  /** GET /jobs/{job_id}/status (processing.py:171-205) — the Celery
    * AsyncResult projection, batched over a (job_id) request frame
    * against a (job_id, celery_state, result, error, traceback)
    * backend frame.
    *
    * Faithful quirks: an UNKNOWN job id never 404s — AsyncResult
    * reports state PENDING for any id it has never seen, so the
    * missing-join arm answers PENDING with every ready field null;
    * `successful`/`failed` are NULL (not false) until ready — the
    * reference only evaluates them inside `if result.ready()`; the
    * payload carries `result` only on success and `error`+`traceback`
    * only on failure. */
  def celeryStatus(requests: DataFrame, states: DataFrame): DataFrame = {
    val st = broadcast(states.select(col("job_id"),
      col("celery_state"), col("result").as("_res"),
      col("error").as("_err"), col("traceback").as("_tb")))
    val state = coalesce(col("celery_state"), lit("PENDING"))
    val ready = state.isInCollection(CeleryReady)
    requests.select(col("job_id"))
      .join(st, Seq("job_id"), "left")
      .select(col("job_id"), state.as("status"), ready.as("ready"),
        when(ready, state === "SUCCESS").as("successful"),
        when(ready, state === "FAILURE").as("failed"),
        when(ready && state === "SUCCESS", col("_res")).as("result"),
        when(ready && state === "FAILURE", col("_err")).as("error"),
        when(ready && state === "FAILURE", col("_tb")).as("traceback"))
  }

  /** GET /process/jobs/{job_id}/status (processing.py:328-358) — the
    * tracker projection, batched: 'not_found' (404) for ids the
    * tracker doesn't hold, else 'ok' with the route's defaulted
    * payload — progress 0, message "", metadata {} and result {} (all
    * four are `.get(..., default)` lookups, :341-347) — plus the
    * tracker row's timestamps and error as stored. A `jobs` frame
    * without a result column reads as result {} on every hit. */
  def trackerStatus(jobs: DataFrame, requests: DataFrame): DataFrame = {
    val emptyMap = map().cast("map<string,string>")
    val resCol =
      if (jobs.columns.contains("result")) col("result")
      else lit(null).cast("map<string,string>")
    val reqIds = broadcast(requests.select(col("job_id")))
    val sub = jobs.withColumnRenamed("id", "job_id")
      .join(reqIds, Seq("job_id"), "left_semi")
      .withColumn("_hit", lit(true))
    requests.select(col("job_id"))
      .join(broadcast(sub), Seq("job_id"), "left")
      .select(col("job_id"),
        when(col("_hit").isNull, lit("not_found")).otherwise(lit("ok"))
          .as("arm"),
        col("type"), col("status"),
        when(col("_hit").isNotNull, coalesce(col("progress"), lit(0)))
          .as("progress"),
        when(col("_hit").isNotNull, coalesce(col("message"), lit("")))
          .as("message"),
        when(col("_hit").isNotNull, coalesce(col("metadata"), emptyMap))
          .as("metadata"),
        col("created_at"), col("updated_at"),
        col("completed_at"), col("error"),
        when(col("_hit").isNotNull, coalesce(resCol, emptyMap))
          .as("result"),
        when(col("_hit").isNull,
          concat(lit("Job "), col("job_id"), lit(" not found")))
          .as("detail"))
  }

  /** Cancel a batch (job_tracker.py:112-126): only non-terminal jobs
    * cancel (missing/terminal ids answer false); a cancel stamps
    * completed_at and "Job cancelled by user" but — unlike
    * update_job — does NOT touch updated_at (the reference mutates
    * the three fields directly).
    *
    * @return (updated jobs, outcomes (id, cancelled))
    */
  def cancel(jobs: DataFrame, cancelIds: DataFrame,
      now: Column): (DataFrame, DataFrame) = {
    // distinct (r19 review): a duplicated cancel id would duplicate
    // the JOB ROW in the updated frame through the left join
    val ids = cancelIds.select(col("id")).distinct()
      .withColumn("_req", lit(true))
    val joined = jobs.join(ids, Seq("id"), "left")
    val hit = col("_req").isNotNull &&
      !col("status").isin(Terminal.toSeq: _*)
    val updated = joined
      .withColumn("completed_at", when(hit, now).otherwise(col("completed_at")))
      .withColumn("message",
        when(hit, lit("Job cancelled by user")).otherwise(col("message")))
      .withColumn("status", when(hit, Cancelled).otherwise(col("status")))
      .drop("_req")
    val outcomes = ids.join(jobs.select(col("id"), col("status").as("_st")),
        Seq("id"), "left")
      .select(col("id"),
        (col("_st").isNotNull && !col("_st").isin(Terminal.toSeq: _*))
          .as("cancelled"))
    (updated, outcomes)
  }

  /** Drop terminal jobs whose completed_at is before the cutoff
    * (job_tracker.py:128-145); a terminal job with a NULL
    * completed_at is kept — the reference's `job.get("completed_at")`
    * guard. Timestamps compare as strings (ISO order). */
  def cleanupOldJobs(jobs: DataFrame, cutoff: Column): DataFrame =
    jobs.where(!(col("status").isin(Terminal.toSeq: _*) &&
      col("completed_at").isNotNull && col("completed_at") < cutoff))

  /** Retry outcome per requested id (processing.py:384-443):
    * `not_found` 404, `not_failed` 400, `unknown_type` 400, `queued`
    * 200. The reference re-queues (status→queued, message "Retrying
    * job") BEFORE dispatching on type, so an unknown-type job is left
    * queued even though the endpoint answers 400 — the quirk is
    * reproduced: only `not_found`/`not_failed` leave the job
    * untouched.
    *
    * @return (updated jobs, outcomes (id, outcome, http_status))
    */
  def retry(jobs: DataFrame, retryIds: DataFrame,
      now: Column): (DataFrame, DataFrame) = {
    // distinct for the same duplicate-request reason as [[cancel]]
    val ids = retryIds.select(col("id")).distinct()
      .withColumn("_req", lit(true))
    val joined = jobs.join(ids, Seq("id"), "left")
    val requeue = col("_req").isNotNull && col("status") === Failed
    val updated = joined
      .withColumn("message",
        when(requeue, lit("Retrying job")).otherwise(col("message")))
      .withColumn("updated_at", when(requeue, now).otherwise(col("updated_at")))
      .withColumn("status", when(requeue, Queued).otherwise(col("status")))
      .drop("_req")
    val outcomes = ids.join(jobs.select(col("id"), col("type"),
        col("status").as("_st")), Seq("id"), "left")
      .select(col("id"),
        when(col("_st").isNull, "not_found")
          .when(col("_st") =!= Failed, "not_failed")
          .when(!col("type").isin(RetryableTypes.toSeq.map(x => x: Any): _*),
            "unknown_type")
          .otherwise("queued").as("outcome"))
      .withColumn("http_status",
        when(col("outcome") === "not_found", 404)
          .when(col("outcome") === "queued", 200).otherwise(400))
    (updated, outcomes)
  }
}
