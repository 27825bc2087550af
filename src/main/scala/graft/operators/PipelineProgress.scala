package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** The Celery chain's job-progress ladder
  * (app/tasks/document_tasks.py): every step of
  * parse → chunk → embed → extract (v2) → finalize writes a
  * (progress, current_step) pair to the job row, with exact
  * percentages and count-parameterized messages:
  *
  *   1  Queued for processing                      (:181)
  *   10 Parsing document with LlamaParse           (:232)
  *   25 parsed — inline-content vs parsed-successfully arms (:274, :310)
  *   35 Chunking document (two-tier)               (:355)
  *   50 Created {n} two-tier chunks                (:494)
  *   60 Generating embeddings                      (:539)
  *   75 Generated {n} embeddings                   (:585)
  *   85 Extracting entities                        (:644)
  *   88 Extracting entity mentions (v2 pipeline)   (:794)
  *   90 Persisting {m} mentions / {c} canonical entities (:1046)
  *   92 Canonicalized {c} entities; inferring relationships (:1206)
  *   94 Finalising entity metrics ({c} canonical / {r} relationships) (:1447)
  *   95 Entities ready for review ({c} canonical / {r} relationships) (:1543)
  *   100 finalize: Job.complete() forces progress 100 WITHOUT touching
  *       current_step (models/job.py:60-65) — the completed frame
  *       carries the 95-step's message; the document lands in
  *       pending_review (:740).
  *
  * One generator per outcome row (explode of 14 literal structs) — a
  * narrow projection, no shuffle; the frames join the Jobs tier's
  * update clamp downstream. */
object PipelineProgress {

  /** `outcomes` carries per-document pipeline results:
    * (document_id, inline: boolean, chunk_count, embeddings_generated,
    * mention_count, canonical_count, relationships_inserted). */
  def ladder(outcomes: DataFrame): DataFrame = {
    val c = (n: String) => col(n).cast("string")
    def step(seq: Int, progress: Int, msg: Column): Column =
      struct(lit(seq).as("seq"), lit(progress).as("progress"),
        msg.as("current_step"), lit("running").as("job_status"))
    val readyMsg = concat(lit("Entities ready for review ("),
      c("canonical_count"), lit(" canonical / "),
      c("relationships_inserted"), lit(" relationships)"))
    val steps = array(
      step(0, 1, lit("Queued for processing")),
      step(1, 10, lit("Parsing document with LlamaParse")),
      step(2, 25, when(col("inline"),
          lit("Document parsed using inline content"))
        .otherwise(lit("Document parsed successfully"))),
      step(3, 35, lit("Chunking document (two-tier)")),
      step(4, 50, concat(lit("Created "), c("chunk_count"),
        lit(" two-tier chunks"))),
      step(5, 60, lit("Generating embeddings")),
      step(6, 75, concat(lit("Generated "), c("embeddings_generated"),
        lit(" embeddings"))),
      step(7, 85, lit("Extracting entities")),
      step(8, 88, lit("Extracting entity mentions (v2 pipeline)")),
      step(9, 90, concat(lit("Persisting "), c("mention_count"),
        lit(" mentions / "), c("canonical_count"),
        lit(" canonical entities"))),
      step(10, 92, concat(lit("Canonicalized "), c("canonical_count"),
        lit(" entities; inferring relationships"))),
      step(11, 94, concat(lit("Finalising entity metrics ("),
        c("canonical_count"), lit(" canonical / "),
        c("relationships_inserted"), lit(" relationships)"))),
      step(12, 95, readyMsg),
      // Job.complete(): progress 100, status flips, message UNCHANGED
      struct(lit(13).as("seq"), lit(100).as("progress"),
        readyMsg.as("current_step"), lit("completed").as("job_status")))
    outcomes.select(col("document_id"), explode(steps).as("s"))
      .select(col("document_id"), col("s.seq").as("seq"),
        col("s.progress").as("progress"),
        col("s.current_step").as("current_step"),
        col("s.job_status").as("job_status"))
  }
}
