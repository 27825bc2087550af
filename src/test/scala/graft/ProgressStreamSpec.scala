package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.streaming.ProgressStream

/** Pins the /documents/{id}/progress SSE frame family
  * (documents.py:148-248): exact frames, the poll schedule with
  * heartbeats every 5th silent tick, and the faithful quirk that the
  * poll-only (Celery) path never emits 'complete'. */
class ProgressStreamSpec extends AnyFunSuite {
  lazy val spark = TestSession.spark

  private def jobs = {
    val spark2 = spark
    import spark2.implicits._
    Seq(("D1", "j1", "success", 100, "done"))
      .toDF("document_id", "job_id", "status", "progress", "current_step")
  }

  test("frames render the reference payloads") {
    val spark2 = spark
    import spark2.implicits._
    val got = jobs.select(
      ProgressStream.connected(col("document_id")).as("c"),
      ProgressStream.jobUpdate(col("document_id"), col("job_id"),
        col("status"), col("progress"), col("current_step")).as("j"),
      ProgressStream.heartbeat(col("document_id")).as("h"),
      ProgressStream.complete(lit(null).cast("string")).as("done"),
      ProgressStream.timeoutFrame.as("t"))
      .as[(String, String, String, String, String)].head()
    assert(got._1 ===
      "data: {\"event\":\"connected\",\"document_id\":\"D1\"}\n\n")
    assert(got._2 === "data: {\"event\":\"job_update\"," +
      "\"document_id\":\"D1\",\"job_id\":\"j1\",\"status\":\"success\"," +
      "\"progress\":100,\"current_step\":\"done\"}\n\n")
    assert(got._3 ===
      "data: {\"event\":\"heartbeat\",\"document_id\":\"D1\"}\n\n")
    // documents.py:190: final_status defaults to 'completed'
    assert(got._4 ===
      "data: {\"event\":\"complete\",\"final_status\":\"completed\"}\n\n")
    assert(got._5 === "data: {\"event\":\"timeout\",\"message\":" +
      "\"No updates received for 30 seconds\"}\n\n")
  }

  test("poll timeline: 30 updates, 6 heartbeats, timeout, NO complete") {
    val spark2 = spark
    import spark2.implicits._
    val frames = ProgressStream.pollTimeline(jobs)
      .orderBy("seq").select("seq", "frame")
      .as[(Int, String)].collect().toSeq
    assert(frames.length === 1 + 30 + 6 + 1)
    assert(frames.head._2.contains("\"event\":\"connected\""))
    assert(frames.last._2.contains("\"event\":\"timeout\""))
    // heartbeat lands right after every 5th tick's job_update
    val hbSeqs = frames.filter(_._2.contains("heartbeat")).map(_._1)
    assert(hbSeqs === Seq(51, 101, 151, 201, 251, 301))
    // the job is success/100 yet no 'complete' frame ever fires on
    // the poll path — the completion check reads only queue events
    assert(!frames.exists(_._2.contains("\"event\":\"complete\"")))
  }

  test("short timelines emit no phantom frames (sequence(1,0) guard)") {
    val spark2 = spark
    import spark2.implicits._
    val f4 = ProgressStream.pollTimeline(jobs, ticks = 4)
      .select("frame").as[String].collect().toSeq
    // connected + 4 job_updates + timeout; zero heartbeats
    assert(f4.length === 6)
    assert(!f4.exists(_.contains("heartbeat")))
    val f0 = ProgressStream.pollTimeline(jobs, ticks = 0)
      .select("frame").as[String].collect().toSeq
    assert(f0.length === 2) // connected + timeout only
  }
}
