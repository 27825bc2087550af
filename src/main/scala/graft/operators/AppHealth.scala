package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** The app-level GET /health census (app/main.py:150-221) — distinct
  * from /search/health (q141, [[Search.healthCheck]]) and the
  * boot-time init census (q142, graft.dataflow.ServiceInit): four
  * probes with per-service strings and a `degraded` escalation.
  *
  * Faithful quirks:
  *   - neo4j reports "healthy"/"unhealthy" off its boolean probe, and
  *     an UNHEALTHY neo4j does NOT degrade the overall status — only
  *     the exception arm ("error: <e>") sets degraded (:158-165; the
  *     `neo4j_healthy` False branch never touches status);
  *   - qdrant and redis have no boolean form: they are "healthy" or
  *     "error: <e>" + degraded (:167-184);
  *   - celery reports "healthy (N workers)" only for a positive
  *     worker count; zero workers, inspect failures, and the 1-second
  *     timeout all collapse to "no workers running" + degraded
  *     (:186-220).
  *
  * Probe frame: (check_id, neo4j_up: bool, neo4j_error, qdrant_error,
  * redis_error: nullable strings, celery_workers: nullable int — null
  * or <=0 means no workers). A non-null *_error wins over the
  * corresponding up/count column. Narrow projection; probe frames are
  * monitoring-sized. */
object AppHealth {

  def healthCensus(probes: DataFrame): DataFrame = {
    val neoErr = col("neo4j_error").isNotNull
    val qdErr = col("qdrant_error").isNotNull
    val rdErr = col("redis_error").isNotNull
    val workersUp = col("celery_workers").isNotNull &&
      col("celery_workers") > 0
    val degraded = neoErr || qdErr || rdErr || !workersUp
    probes.select(col("check_id"),
      when(degraded, lit("degraded")).otherwise(lit("healthy"))
        .as("status"),
      when(neoErr, concat(lit("error: "), col("neo4j_error")))
        .when(col("neo4j_up"), lit("healthy"))
        .otherwise(lit("unhealthy")).as("svc_neo4j"),
      when(qdErr, concat(lit("error: "), col("qdrant_error")))
        .otherwise(lit("healthy")).as("svc_qdrant"),
      when(rdErr, concat(lit("error: "), col("redis_error")))
        .otherwise(lit("healthy")).as("svc_redis"),
      when(workersUp, concat(lit("healthy ("), col("celery_workers"),
          lit(" workers)")))
        .otherwise(lit("no workers running")).as("svc_celery"))
  }
}
