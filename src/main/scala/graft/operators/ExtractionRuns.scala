package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Run-level audit bookkeeping for the entity pipeline — the
  * reference's `extraction_runs` table (entity_v2.py:8-19;
  * supabase_service.py:284-309 create/complete;
  * document_tasks.py:818-824, 1527-1532 lifecycle): one row per
  * document extraction run, created `running` with the pipeline/model
  * provenance, completed with the mention/canonical/relationship
  * counters.
  *
  * Spark shape: [[start]] is a narrow projection over the documents
  * frame (run ids derive deterministically from the document and the
  * start ordinal — no driver-side id allocation); [[complete]] joins
  * three map-side-combinable per-document counts back to the runs
  * frame — three small aggregations, one broadcast-or-shuffle join
  * each, nothing driver-side. Timestamps come from caller-supplied
  * ordinal columns/values, as everywhere else in graft.incremental.
  */
object ExtractionRuns {

  /** Create one `running` row per document
    * (create_extraction_run, supabase_service.py:284-298): run id =
    * md5(document_id:pipeline_version:started_at) — stable across
    * retries of the same ordinal, distinct across re-runs. */
  def start(docs: DataFrame, idCol: String, startedAtCol: String,
      pipelineVersion: String = "v2", model: String = "gpt-4o-mini",
      promptVersion: Option[String] = None,
      inputHashCol: Option[String] = None): DataFrame =
    docs.select(
      md5(concat_ws(":", col(idCol).cast("string"), lit(pipelineVersion),
        col(startedAtCol).cast("string"))).as("run_id"),
      col(idCol).cast("string").as("document_id"),
      lit(pipelineVersion).as("pipeline_version"),
      promptVersion.map(lit(_)).getOrElse(lit(null).cast("string"))
        .as("prompt_version"),
      lit(model).as("model"),
      lit("running").as("status"),
      inputHashCol.map(col).getOrElse(lit(null).cast("string"))
        .as("input_hash"),
      lit(0L).as("cache_hits"),
      lit(0L).as("mentions_extracted"),
      lit(0L).as("entities_canonicalized"),
      lit(0L).as("relationships_inferred"),
      col(startedAtCol).cast("long").as("started_at"),
      lit(null).cast("long").as("completed_at"))

  /** Mark runs completed with their counters
    * (complete_extraction_run, supabase_service.py:300-309): per-
    * document counts of mentions, canonical entities and
    * relationships join back; documents absent from a frame count 0
    * (the pipeline ran and extracted nothing). `failedDocs` rows keep
    * zero counters and land `failed` — the status override arm of the
    * reference's API. */
  def complete(runs: DataFrame,
      mentions: DataFrame, mentionDocCol: String,
      canonical: DataFrame, canonicalDocCol: String,
      relationships: DataFrame, relationshipDocCol: String,
      completedAt: Long,
      failedDocs: Option[DataFrame] = None,
      failedDocCol: String = "document_id"): DataFrame = {
    def countBy(df: DataFrame, c: String, as: String): DataFrame =
      df.groupBy(col(c).cast("string").as("document_id"))
        .agg(count(lit(1)).as(as))
    val m = countBy(mentions, mentionDocCol, "_m")
    val e = countBy(canonical, canonicalDocCol, "_e")
    val r = countBy(relationships, relationshipDocCol, "_r")
    val failed = failedDocs.map(_.select(
      col(failedDocCol).cast("string").as("document_id"),
      lit(true).as("_failed")).distinct())
    val joined = runs
      .drop("mentions_extracted", "entities_canonicalized",
        "relationships_inferred", "status", "completed_at")
      .join(m, Seq("document_id"), "left")
      .join(e, Seq("document_id"), "left")
      .join(r, Seq("document_id"), "left")
    val withFail = failed.map(f => joined.join(f, Seq("document_id"), "left"))
      .getOrElse(joined.withColumn("_failed", lit(null).cast("boolean")))
    val isFailed = coalesce(col("_failed"), lit(false))
    withFail.select(
      col("run_id"), col("document_id"), col("pipeline_version"),
      col("prompt_version"), col("model"),
      when(isFailed, lit("failed")).otherwise(lit("completed")).as("status"),
      col("input_hash"), col("cache_hits"),
      when(isFailed, lit(0L))
        .otherwise(coalesce(col("_m"), lit(0L))).as("mentions_extracted"),
      when(isFailed, lit(0L))
        .otherwise(coalesce(col("_e"), lit(0L))).as("entities_canonicalized"),
      when(isFailed, lit(0L))
        .otherwise(coalesce(col("_r"), lit(0L))).as("relationships_inferred"),
      col("started_at"),
      lit(completedAt).as("completed_at"))
  }
}
