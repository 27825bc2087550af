package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.dataflow.ServiceInit

/** Pins the service-initialization census
  * (dependency_manager.py:34-127): the asymmetric failure statuses
  * (database→error, others→unavailable; UNHEALTHY is a dead enum
  * member), the fixed healthy messages, and the redis
  * never-registered quirk. */
class ServiceInitSpec extends AnyFunSuite {
  lazy val spark = TestSession.spark
  import spark.implicits._

  test("census: asymmetric failure statuses, redis never registers") {
    val probes = Seq(
      ("b1", "database", false, Some("pg down")),
      ("b1", "neo4j", false, Some("bolt refused")),
      ("b1", "qdrant", true, None),
      ("b1", "redis", true, None))
      .toDF("boot_id", "service", "ok", "error")
    val got = ServiceInit.initCensus(probes)
      .orderBy("service")
      .select("service", "status", "message", "registered")
      .as[(String, String, String, Boolean)].collect().toSeq
    assert(got === Seq(
      // database is the ONLY service whose failure is ERROR
      ("database", "error", "pg down", false),
      ("neo4j", "unavailable", "bolt refused", false),
      ("qdrant", "healthy", "Qdrant connected", true),
      // healthy redis: health_status yes, services dict NO —
      // get_service("redis") is always None (dependency_manager
      // :138-145 never assigns self.services["redis"])
      ("redis", "healthy", "Redis connected", false)))
  }

  test("summary counts healthy over total per boot") {
    val probes = Seq(
      ("b1", "database", true, None: Option[String]),
      ("b1", "neo4j", false, Some("x")),
      ("b2", "qdrant", true, None))
      .toDF("boot_id", "service", "ok", "error")
    val got = ServiceInit.initSummary(ServiceInit.initCensus(probes))
      .orderBy("boot_id")
      .as[(String, Long, Long)].collect().toSeq
    assert(got === Seq(("b1", 1L, 2L), ("b2", 1L, 1L)))
  }

  test("main_improved health: all/some/none tiers + one-decimal pct") {
    val probes = Seq(
      ("b1", "database", true, None: Option[String]),
      ("b1", "neo4j", true, None),
      ("b2", "database", true, None),
      ("b2", "neo4j", false, Some("x")),
      ("b2", "qdrant", false, Some("y")),
      ("b3", "redis", false, Some("z")))
      .toDF("boot_id", "service", "ok", "error")
    val got = ServiceInit.healthSummary(ServiceInit.initCensus(probes))
      .orderBy("boot_id")
      .select("boot_id", "overall", "percentage")
      .as[(String, String, Double)].collect().toSeq
    assert(got === Seq(
      ("b1", "healthy", 100.0),
      ("b2", "degraded", 33.3),   // 1/3 rounds to one decimal
      ("b3", "unhealthy", 0.0)))
  }

  test("per-service probe: census projection, redis answers, unknown 404s") {
    val census = ServiceInit.initCensus(Seq(
      ("b1", "database", true, None: Option[String]),
      ("b1", "redis", true, None),
      ("b1", "neo4j", false, Some("down")))
      .toDF("boot_id", "service", "ok", "error"))
    val got = ServiceInit.serviceHealth(census, Seq(
      ("b1", "database"), ("b1", "redis"), ("b1", "neo4j"),
      ("b1", "celery"))
      .toDF("boot_id", "service_name"))
      .select("service", "http_status", "status", "message", "detail")
      .as[(String, Int, String, String, String)].collect()
      .map(r => r._1 -> ((r._2, r._3, r._4, r._5))).toMap
    assert(got("database") === ((200, "healthy", "PostgreSQL connected", null)))
    // redis is absent from the services dict but PRESENT in
    // health_status — the probe answers (main_improved.py:159-161)
    assert(got("redis") === ((200, "healthy", "Redis connected", null)))
    assert(got("neo4j") === ((200, "unavailable", "down", null)))
    assert(got("celery") === ((404, null, null,
      "Service 'celery' not found")))
  }

  test("supabase url fork: env DATABASE_URL containing 'supabase' " +
      "wins; else the pooler template (supabase_database.py:20-49)") {
    assert(ServiceInit.supabaseDatabaseUrl(
      Some("postgresql://u:p@db.x.supabase.co:5432/postgres"),
      "ref", "pw") === "postgresql://u:p@db.x.supabase.co:5432/postgres")
    // a non-supabase env url is IGNORED, not used
    assert(ServiceInit.supabaseDatabaseUrl(
      Some("postgresql://u:p@other-host:5432/db"), "ref", "pw") ===
      "postgresql://postgres.ref:pw@aws-0-us-east-1.pooler." +
        "supabase.com:5432/postgres?pgbouncer=true")
    assert(ServiceInit.supabaseDatabaseUrl(None, "myref", "secret",
      host = "h", port = 6543, database = "d") ===
      "postgresql://postgres.myref:secret@h:6543/d?pgbouncer=true")
  }
}
