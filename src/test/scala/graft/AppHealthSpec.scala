package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.operators.AppHealth

/** Pins the app-level /health census (app/main.py:150-221),
  * especially the quirk that an UNHEALTHY neo4j leaves the overall
  * status healthy — only exception/timeout arms degrade. */
class AppHealthSpec extends AnyFunSuite {
  lazy val spark = TestSession.spark
  import spark.implicits._

  test("unhealthy neo4j stays healthy overall; errors and no workers degrade") {
    val probes = Seq(
      ("c1", true, None: Option[String], None: Option[String],
        None: Option[String], Some(3)),
      // neo4j probe answers False: service string flips but the
      // status variable is never touched on that branch (main.py:162)
      ("c2", false, None, None, None, Some(3)),
      ("c3", true, Some("conn"), None, None, Some(3)),
      ("c4", true, None, None, Some("rd"), Some(0)))
      .toDF("check_id", "neo4j_up", "neo4j_error", "qdrant_error",
        "redis_error", "celery_workers")
    val got = AppHealth.healthCensus(probes)
      .orderBy("check_id")
      .select("status", "svc_neo4j", "svc_celery")
      .as[(String, String, String)].collect().toSeq
    assert(got === Seq(
      ("healthy", "healthy", "healthy (3 workers)"),
      ("healthy", "unhealthy", "healthy (3 workers)"),
      ("degraded", "error: conn", "healthy (3 workers)"),
      // zero workers and the redis error both degrade
      ("degraded", "healthy", "no workers running")))
  }
}
