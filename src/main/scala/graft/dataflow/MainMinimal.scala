package graft.dataflow

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** The main_minimal variant entrypoint (app/main_minimal.py) — the
  * no-database API shell: constant root/health payloads (:59-92), the
  * 404/500 handler shapes (:95-110), and the X-Process-Time timing
  * middleware with its 200 ms slow-request warning (:38-50). The
  * fourth and last `main*` variant; the other three are modeled by
  * AppHealth (main.py), ServiceInit.healthSummary (main_improved.py)
  * and ConnectorScans.sourcesScanCompat (main_fixed.py).
  */
object MainMinimal {

  /** GET / (:59-75): the constant root payload. */
  val root: Map[String, String] = Map(
    "name" -> "Data Ingestion Portal API",
    "version" -> "1.0.0",
    "status" -> "running",
    "mode" -> "minimal",
    "docs" -> "/docs",
    "health" -> "/health")

  /** The root payload's endpoints map (:68-73). */
  val endpoints: Map[String, String] = Map(
    "documents" -> "/api/documents",
    "processing" -> "/api/process",
    "chunks" -> "/api/chunks",
    "entities" -> "/api/entities")

  /** GET /health (:78-90): everything but the API shell reports
    * `skipped` — this variant never initializes the stores. */
  val health: Map[String, String] = Map(
    "status" -> "healthy",
    "mode" -> "minimal",
    "api" -> "healthy",
    "database" -> "skipped",
    "neo4j" -> "skipped",
    "qdrant" -> "skipped",
    "redis" -> "skipped")

  /** The 404 handler body (:95-101): the requested URL echoes in
    * `path`; the 500 handler body (:103-110) carries no detail. */
  def notFoundBody(url: String): (String, Option[String]) =
    ("Not found", Some(url))
  val internalErrorBody: (String, Option[String]) =
    ("Internal server error", None)

  /** Python f'{x:.2f}': the correctly-rounded decimal of the EXACT
    * binary double, half-to-even at true ties. No builtin matches —
    * %.2f alone is HALF_UP at exact ties (200.625 → '200.63') and
    * bround rounds the shortest-repr BigDecimal (2.675 → 2.68 where
    * Python's exact 2.67499… prints '2.67') — so the exact-BigDecimal
    * path runs as a udf; request-sized frames, never a hot path. */
  private val py2f = udf { (x: Double) =>
    new java.math.BigDecimal(x)
      .setScale(2, java.math.RoundingMode.HALF_EVEN).toPlainString
  }

  /** The timing middleware (:38-50) over a (request_id, method, path,
    * duration_ms) frame: every response gets the X-Process-Time
    * header rendered at two decimals ([[py2f]] — Python formatting,
    * not Java's), and requests STRICTLY over 200 ms flag slow with
    * the logged warning line. Pure per-row projection — no shuffle at
    * any scale. */
  def processTimeCensus(requests: DataFrame): DataFrame = {
    val rendered = concat(py2f(col("duration_ms")), lit("ms"))
    requests.select(col("request_id"),
      rendered.as("process_time_header"),
      (col("duration_ms") > 200.0).as("slow"),
      when(col("duration_ms") > 200.0,
        concat(lit("Slow request: "), col("method"), lit(" "),
          col("path"), lit(" took "), rendered)).as("warning"))
  }
}

/** The auth placeholder (app/services/auth_service.py:7-12): every
  * caller gets the same mock user. Its one import site
  * (api/search.py:11) never uses it — the Depends() lines are
  * commented out — so this constant is the module's entire surface. */
object AuthService {
  val currentUser: Map[String, Any] = Map(
    "id" -> "test-user",
    "email" -> "test@example.com",
    "security_level" -> "employee",
    "access_level" -> 4)
}
