package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.operators.Jobs

/** The processing-jobs tier (job_tracker.py:12-120,
  * processing.py:359-443): lifecycle defaults, clamp/terminal
  * semantics, listing order, and the retry quirks. */
class JobsSpec extends AnyFunSuite {
  lazy val spark = TestSession.spark
  import spark.implicits._

  private def mkJobs(rows: (String, String)*) =
    Jobs.create(rows.toSeq.toDF("id", "type")
      .withColumn("metadata", lit(null).cast("map<string,string>")),
      lit("T0"))

  test("create stamps the tracker's defaults") {
    val got = mkJobs("j1" -> "notion_scan").collect().head
    assert(got.getAs[String]("status") === "queued")
    assert(got.getAs[Int]("progress") === 0)
    assert(got.getAs[String]("message") === "Job queued")
    assert(got.getAs[Map[String, String]]("metadata") === Map())
    assert(got.getAs[String]("created_at") === "T0")
    assert(got.getAs[String]("completed_at") === null)
    assert(got.getAs[String]("error") === null)
  }

  test("updates: clamp, terminal completed_at, completed forces 100") {
    val jobs = mkJobs("j1" -> "a", "j2" -> "a", "j3" -> "a", "j4" -> "a",
      "j5" -> "a")
    val updates = Seq(
      ("j1", "running", Some("halfway"), Some(150), None),
      ("j2", "running", None, Some(-5), None),
      ("j3", "completed", None, Some(40), None),
      ("j4", "failed", None, None, Some("boom")),
      ("jX", "running", None, None, None)) // unknown id: dropped
      .toDF("id", "to_status", "message", "progress", "error")
    val got = Jobs.applyUpdates(jobs, updates, lit("T1"))
      .collect().map(r => r.getAs[String]("id") -> r).toMap
    assert(got.size === 5) // jX added nothing
    assert(got("j1").getAs[Int]("progress") === 100) // clamped down
    assert(got("j1").getAs[String]("message") === "halfway")
    assert(got("j1").getAs[String]("completed_at") === null)
    assert(got("j2").getAs[Int]("progress") === 0) // clamped up
    assert(got("j2").getAs[String]("message") === "Job queued") // kept
    assert(got("j3").getAs[Int]("progress") === 100) // forced, not 40
    assert(got("j3").getAs[String]("completed_at") === "T1")
    assert(got("j4").getAs[String]("error") === "boom")
    assert(got("j4").getAs[String]("completed_at") === "T1")
    assert(got("j5").getAs[String]("updated_at") === "T0") // untouched
  }

  test("listing filters first, sorts created_at desc, then pages") {
    val jobs = Jobs.create(
      (1 to 9).map(i => (s"j$i", if (i % 2 == 0) "a" else "b")).toDF("id", "type")
        .withColumn("metadata", lit(null).cast("map<string,string>")),
      concat(lit("T"), lpad(regexp_extract(col("id"), "\\d+", 0), 3, "0")))
    // type filter before pagination: page 2 of type-a jobs
    val got = Jobs.listJobs(jobs, jobType = Some("a"), limit = 2, offset = 1)
      .select("id").as[String].collect()
    // type a = j2,j4,j6,j8; desc by created_at = j8,j6,j4,j2; skip 1 take 2
    assert(got.toSeq === Seq("j6", "j4"))
    val byStatus = Jobs.listJobs(jobs, status = Some("running"))
    assert(byStatus.count() === 0)
  }

  test("cancel: non-terminal only; stamps but leaves updated_at stale") {
    val jobs = Jobs.applyUpdates(
      mkJobs("j1" -> "a", "j2" -> "a", "j3" -> "a"),
      Seq(("j1", "running"), ("j2", "completed")).toDF("id", "to_status")
        .withColumn("message", lit(null).cast("string"))
        .withColumn("progress", lit(null).cast("int"))
        .withColumn("error", lit(null).cast("string")),
      lit("T1"))
    val (updated, outcomes) = Jobs.cancel(jobs,
      Seq("j1", "j2", "missing").toDF("id"), lit("T2"))
    val o = outcomes.as[(String, Boolean)].collect().toMap
    assert(o === Map("j1" -> true, "j2" -> false, "missing" -> false))
    val u = updated.collect().map(r => r.getAs[String]("id") -> r).toMap
    assert(u("j1").getAs[String]("status") === "cancelled")
    assert(u("j1").getAs[String]("message") === "Job cancelled by user")
    assert(u("j1").getAs[String]("completed_at") === "T2")
    // the reference mutates fields directly: updated_at is NOT bumped
    assert(u("j1").getAs[String]("updated_at") === "T1")
    assert(u("j2").getAs[String]("status") === "completed") // terminal kept
    assert(u("j3").getAs[String]("status") === "queued")
  }

  test("r19 review: duplicate update/cancel/retry ids never multiply " +
      "job rows — updates collapse to one deterministic request, " +
      "cancel/retry rosters dedup") {
    val jobs = mkJobs("j1" -> "a", "j2" -> "notion_scan")
    // two updates for j1 in one batch: ONE row out, the max-struct pick
    val dup = Seq(("j1", "running", "m-aaa"), ("j1", "running", "m-zzz"))
      .toDF("id", "to_status", "message")
      .withColumn("progress", lit(null).cast("int"))
      .withColumn("error", lit(null).cast("string"))
    val upd = Jobs.applyUpdates(jobs, dup, lit("T1"))
    assert(upd.count() === 2, "same cardinality as the jobs frame")
    assert(upd.where(col("id") === "j1")
      .select("message").as[String].head() === "m-zzz")
    // a TERMINAL update in the same batch beats a non-terminal one
    // (r19 pass 12: lexical max alone let 'running' > 'completed'
    // discard the lifecycle end, which no later batch re-sends) —
    // and the winning request's fields travel TOGETHER
    val mixed = Seq(("j2", "running", "mid-flight"),
        ("j2", "completed", null.asInstanceOf[String]))
      .toDF("id", "to_status", "message")
      .withColumn("progress", when(col("to_status") === "running", 50))
      .withColumn("error", lit(null).cast("string"))
    val term = Jobs.applyUpdates(jobs, mixed, lit("T1"))
      .where(col("id") === "j2")
    assert(term.select("status").as[String].head() === "completed")
    assert(term.select("progress").as[Int].head() === 100,
      "completed forces 100")
    assert(term.select("completed_at").as[String].head() === "T1")
    assert(term.select("message").as[String].head() === "Job queued",
      "the losing request's message must not leak into the winner")
    // duplicated cancel ids: one job row out, one cancel applied
    val (afterCancel, cOut) = Jobs.cancel(upd,
      Seq("j1", "j1").toDF("id"), lit("T2"))
    assert(afterCancel.count() === 2)
    assert(afterCancel.where(col("id") === "j1")
      .select("status").as[String].head() === "cancelled")
    assert(cOut.count() === 1)
    // duplicated retry ids after a failure: one job row out
    val failed = Jobs.applyUpdates(upd,
      Seq(("j2", "failed")).toDF("id", "to_status")
        .withColumn("message", lit(null).cast("string"))
        .withColumn("progress", lit(null).cast("int"))
        .withColumn("error", lit(null).cast("string")),
      lit("T3"))
    val (afterRetry, rOut) = Jobs.retry(failed,
      Seq("j2", "j2").toDF("id"), lit("T4"))
    assert(afterRetry.count() === 2)
    assert(afterRetry.where(col("id") === "j2")
      .select("status").as[String].head() === "queued")
    assert(rOut.count() === 1)
  }

  test("cleanup drops old terminal jobs; null completed_at survives") {
    val jobs = mkJobs("j1" -> "a", "j2" -> "a", "j3" -> "a", "j4" -> "a")
    val staged = Jobs.applyUpdates(jobs,
      Seq(("j1", "completed"), ("j2", "failed")).toDF("id", "to_status")
        .withColumn("message", lit(null).cast("string"))
        .withColumn("progress", lit(null).cast("int"))
        .withColumn("error", lit(null).cast("string")),
      lit("T1"))
      // j3: terminal status but completed_at nulled (the .get guard)
      .withColumn("status",
        when(col("id") === "j3", "cancelled").otherwise(col("status")))
    val kept = Jobs.cleanupOldJobs(staged, lit("T5"))
      .select("id").as[String].collect().toSet
    assert(kept === Set("j3", "j4")) // j1/j2 old+terminal dropped
    val keptRecent = Jobs.cleanupOldJobs(staged, lit("T0"))
      .select("id").as[String].collect().toSet
    assert(keptRecent === Set("j1", "j2", "j3", "j4")) // T1 >= T0 cutoff
  }

  test("celery status: unknown id is PENDING; ready gates the verdicts") {
    val states = Seq(
      ("j1", "SUCCESS", Some("r"), None: Option[String], None: Option[String]),
      ("j2", "FAILURE", None, Some("err"), Some("tb")),
      ("j3", "RETRY", None, None, None))
      .toDF("job_id", "celery_state", "result", "error", "traceback")
    val requests = Seq("j1", "j2", "j3", "jX").toDF("job_id")
    val out = Jobs.celeryStatus(requests, states)
      .orderBy("job_id")
      .select("job_id", "status", "ready", "successful", "failed",
        "result", "error")
      .as[(String, String, Boolean, Option[Boolean], Option[Boolean],
        Option[String], Option[String])].collect().toSeq
    assert(out === Seq(
      ("j1", "SUCCESS", true, Some(true), Some(false), Some("r"), None),
      ("j2", "FAILURE", true, Some(false), Some(true), None, Some("err")),
      // RETRY is not a ready state: verdicts stay NULL, not false
      ("j3", "RETRY", false, None, None, None, None),
      // AsyncResult never 404s — an id Celery has never seen is PENDING
      ("jX", "PENDING", false, None, None, None, None)))
  }

  test("tracker status: defaults fill, missing id is the 404 arm") {
    val jobs = mkJobs("t1" -> "notion_scan")
      .withColumn("message", lit(null).cast("string"))
      .withColumn("metadata", lit(null).cast("map<string,string>"))
    val out = Jobs.trackerStatus(jobs, Seq("t1", "t9").toDF("job_id"))
      .orderBy("job_id")
      .select(col("job_id"), col("arm"), col("type"), col("progress"),
        col("message"), size(col("metadata")).as("mn"),
        size(col("result")).as("rn"), col("detail"))
      .as[(String, String, Option[String], Option[Int], Option[String],
        Option[Int], Option[Int], Option[String])].collect().toSeq
    assert(out === Seq(
      // the route's .get defaults: null message answers "", null
      // metadata answers {}, and a tracker without a result column
      // answers result {} — all size 0, never null, on the ok arm
      ("t1", "ok", Some("notion_scan"), Some(0), Some(""), Some(0),
        Some(0), None),
      ("t9", "not_found", None, None, None, None, None,
        Some("Job t9 not found"))))
  }

  test("retry: 404/400 arms, unknown type answers 400 but stays queued") {
    val jobs = Jobs.applyUpdates(
      mkJobs("j1" -> "notion_scan", "j2" -> "embed_rebuild",
        "j3" -> "gdrive_scan", "j4" -> "notion_scan"),
      Seq(("j1", "failed"), ("j2", "failed"), ("j3", "completed"))
        .toDF("id", "to_status")
        .withColumn("message", lit(null).cast("string"))
        .withColumn("progress", lit(null).cast("int"))
        .withColumn("error", lit(null).cast("string")),
      lit("T1"))
    val (updated, outcomes) = Jobs.retry(jobs,
      Seq("j1", "j2", "j3", "missing").toDF("id"), lit("T2"))
    val o = outcomes.select("id", "outcome", "http_status")
      .as[(String, String, Int)].collect()
      .map(t => t._1 -> ((t._2, t._3))).toMap
    assert(o("j1") === (("queued", 200)))
    assert(o("j2") === (("unknown_type", 400))) // dispatch failed...
    assert(o("j3") === (("not_failed", 400)))
    assert(o("missing") === (("not_found", 404)))
    val u = updated.collect().map(r => r.getAs[String]("id") -> r).toMap
    assert(u("j1").getAs[String]("status") === "queued")
    assert(u("j1").getAs[String]("message") === "Retrying job")
    // ...but the update-before-dispatch quirk left j2 queued anyway
    assert(u("j2").getAs[String]("status") === "queued")
    assert(u("j2").getAs[String]("message") === "Retrying job")
    assert(u("j3").getAs[String]("status") === "completed") // untouched
    assert(u("j4").getAs[String]("status") === "queued")
    assert(u("j4").getAs[String]("message") === "Job queued") // not requested
  }
}
