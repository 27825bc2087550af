package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.dataflow.MainMinimal

/** The main_minimal variant entrypoint (app/main_minimal.py). */
class MainMinimalSpec extends AnyFunSuite {
  lazy val spark = TestSession.spark
  import spark.implicits._

  test("root and health payload constants (:59-92)") {
    assert(MainMinimal.root("name") === "Data Ingestion Portal API")
    assert(MainMinimal.root("version") === "1.0.0")
    assert(MainMinimal.root("status") === "running")
    assert(MainMinimal.root("mode") === "minimal")
    assert(MainMinimal.endpoints === Map(
      "documents" -> "/api/documents", "processing" -> "/api/process",
      "chunks" -> "/api/chunks", "entities" -> "/api/entities"))
    // every store reads skipped — this variant never initializes them
    assert(MainMinimal.health("api") === "healthy")
    assert(Seq("database", "neo4j", "qdrant", "redis")
      .forall(MainMinimal.health(_) === "skipped"))
  }

  test("error handler shapes (:95-110)") {
    assert(MainMinimal.notFoundBody("http://h/x")
      === (("Not found", Some("http://h/x"))))
    assert(MainMinimal.internalErrorBody === (("Internal server error", None)))
  }

  test("timing middleware: %.2f header, strict 200 ms slow boundary (:38-50)") {
    val out = MainMinimal.processTimeCensus(
      Seq(("r1", "GET", "/api/documents", 12.25),
        ("r2", "POST", "/api/process", 300.5),
        ("r3", "GET", "/api/chunks", 200.0),
        ("r4", "GET", "/api/chunks", 200.01),
        ("r5", "GET", "/api/chunks", 200.625),
        ("r6", "GET", "/api/chunks", 2.675))
        .toDF("request_id", "method", "path", "duration_ms"))
      .as[(String, String, Boolean, String)].collect()
      .map(r => r._1 -> ((r._2, r._3, r._4))).toMap
    assert(out("r1") === (("12.25ms", false, null)))
    assert(out("r2") === (("300.50ms", true,
      "Slow request: POST /api/process took 300.50ms")))
    // exactly 200 ms is NOT slow — the middleware tests strictly >
    assert(out("r3") === (("200.00ms", false, null)))
    assert(out("r4") === (("200.01ms", true,
      "Slow request: GET /api/chunks took 200.01ms")))
    // Python rounding, not Java's: an exact binary tie goes
    // half-to-even (.625 → .62, where %.2f says .63) and 2.675's
    // exact value 2.67499… rounds DOWN (where bround says 2.68)
    assert(out("r5") === (("200.62ms", true,
      "Slow request: GET /api/chunks took 200.62ms")))
    assert(out("r6") === (("2.67ms", false, null)))
  }

  test("auth placeholder: the constant mock user (auth_service.py:7-12)") {
    assert(graft.dataflow.AuthService.currentUser === Map(
      "id" -> "test-user", "email" -> "test@example.com",
      "security_level" -> "employee", "access_level" -> 4))
  }
}
