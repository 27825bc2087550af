package graft.dataflow

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** The service-initialization census
  * (app/services/dependency_manager.py:34-127) — the deterministic
  * core of DependencyManager.initialize_all over probe outcomes for
  * the four external stores, batched over a (boot_id, service, ok,
  * error) frame.
  *
  * Faithful quirks:
  *   - the failure status is ASYMMETRIC: a database failure lands
  *     ServiceStatus.ERROR (:68-73) while neo4j/qdrant/redis failures
  *     all land UNAVAILABLE (:93-99, :123-129, :147-153); the enum's
  *     UNHEALTHY member is never assigned anywhere — dead;
  *   - healthy messages are fixed per service ("PostgreSQL connected",
  *     "<Name> connected"); failure messages are str(e) verbatim;
  *   - redis NEVER lands in the services dict — only health_status
  *     (:138-145) — so get_service("redis") is None even when healthy,
  *     and is_service_healthy reads health_status so it still answers
  *     true; `registered` models the services-dict membership;
  *   - the init summary counts healthy/total over health_status.
  *
  * Scale: a narrow projection over a boot-sized probe frame; the
  * summary is one map-side-combinable aggregation keyed by boot_id. */
object ServiceInit {

  private val healthyMessage = Map(
    "database" -> "PostgreSQL connected",
    "neo4j" -> "Neo4j connected",
    "qdrant" -> "Qdrant connected",
    "redis" -> "Redis connected")

  /** One census row per probe: status / message / services-dict
    * membership. */
  def initCensus(probes: DataFrame): DataFrame = {
    val msg = healthyMessage.foldLeft(lit(null).cast("string")) {
      case (acc, (k, v)) => when(col("service") === k, lit(v)).otherwise(acc)
    }
    probes.select(col("boot_id"), col("service"),
      when(col("ok"), lit("healthy"))
        .when(col("service") === "database", lit("error"))
        .otherwise(lit("unavailable")).as("status"),
      when(col("ok"), msg).otherwise(col("error")).as("message"),
      (col("ok") && col("service") =!= "redis").as("registered"))
  }

  /** The "Service initialization complete: h/t services healthy"
    * summary (:43-46), one row per boot. */
  def initSummary(census: DataFrame): DataFrame =
    census.groupBy(col("boot_id")).agg(
      sum(when(col("status") === "healthy", 1L).otherwise(0L))
        .as("healthy_n"),
      count(lit(1)).as("total_n"))

  /** The main_improved entrypoint's /health over this census
    * (app/main_improved.py:122-153): overall = healthy when ALL are,
    * degraded when SOME are, unhealthy when none; percentage rounds
    * to one decimal (0 when the census is empty — unreachable here
    * since groupBy only yields non-empty boots, kept for the
    * contract). */
  def healthSummary(census: DataFrame): DataFrame =
    initSummary(census).select(col("boot_id"),
      when(col("healthy_n") === col("total_n"), lit("healthy"))
        .when(col("healthy_n") > 0, lit("degraded"))
        .otherwise(lit("unhealthy")).as("overall"),
      col("healthy_n"), col("total_n"),
      when(col("total_n") > 0,
        round(col("healthy_n").cast("double") / col("total_n") * 100, 1))
        .otherwise(lit(0.0)).as("percentage"))

  /** The per-service health probe (app/main_improved.py:156-170) over
    * a (boot_id, service_name) request frame: names absent from
    * health_status 404 with the quoted detail string; known ones
    * project service/status/message off the census — redis answers
    * here even though it never registers in the services dict
    * (health_status carries it, :138-145). */
  def serviceHealth(census: DataFrame, requests: DataFrame): DataFrame =
    requests.join(
        census.withColumnRenamed("service", "service_name"),
        Seq("boot_id", "service_name"), "left")
      .select(col("boot_id"), col("service_name").as("service"),
        when(col("status").isNull, lit(404)).otherwise(lit(200))
          .as("http_status"),
        col("status"), col("message"),
        when(col("status").isNull,
          concat(lit("Service '"), col("service_name"),
            lit("' not found"))).as("detail"))

  /** get_supabase_database_url's fork
    * (app/services/supabase_database.py:20-49): an env DATABASE_URL
    * containing the substring "supabase" wins verbatim; otherwise the
    * pooler URL is assembled as
    * `postgresql://postgres.{projectRef}:{password}@{host}:{port}/
    * {database}?pgbouncer=true`. The reference hardcodes its own
    * project/credential literals as the component defaults — secrets
    * by construction, so this face takes them as parameters and the
    * spec pins only the TEMPLATE. */
  def supabaseDatabaseUrl(envDatabaseUrl: Option[String],
      projectRef: String, password: String,
      host: String = "aws-0-us-east-1.pooler.supabase.com",
      port: Int = 5432, database: String = "postgres"): String =
    envDatabaseUrl.filter(_.contains("supabase")).getOrElse(
      s"postgresql://postgres.$projectRef:$password@$host:$port/" +
        s"$database?pgbouncer=true")
}
