package graft

import org.scalatest.funsuite.AnyFunSuite

import graft.operators.PipelineProgress

/** Pins the Celery chain's progress ladder (document_tasks.py):
  * exact percentages, count-parameterized messages, the inline-parse
  * arm, and the Job.complete() quirk that the 100% frame keeps the
  * 95-step's message. */
class PipelineProgressSpec extends AnyFunSuite {
  lazy val spark = TestSession.spark

  test("the 14-frame ladder renders exact messages in order") {
    val spark2 = spark
    import spark2.implicits._
    val outcomes = Seq(("d1", false, 7L, 7L, 12L, 5L, 3L))
      .toDF("document_id", "inline", "chunk_count",
        "embeddings_generated", "mention_count", "canonical_count",
        "relationships_inserted")
    val got = PipelineProgress.ladder(outcomes).orderBy("seq")
      .select("progress", "current_step", "job_status")
      .as[(Int, String, String)].collect().toSeq
    assert(got === Seq(
      (1, "Queued for processing", "running"),
      (10, "Parsing document with LlamaParse", "running"),
      (25, "Document parsed successfully", "running"),
      (35, "Chunking document (two-tier)", "running"),
      (50, "Created 7 two-tier chunks", "running"),
      (60, "Generating embeddings", "running"),
      (75, "Generated 7 embeddings", "running"),
      (85, "Extracting entities", "running"),
      (88, "Extracting entity mentions (v2 pipeline)", "running"),
      (90, "Persisting 12 mentions / 5 canonical entities", "running"),
      (92, "Canonicalized 5 entities; inferring relationships",
        "running"),
      (94, "Finalising entity metrics (5 canonical / 3 relationships)",
        "running"),
      (95, "Entities ready for review (5 canonical / 3 relationships)",
        "running"),
      // models/job.py:60-65: complete() forces 100 but never touches
      // current_step — the completed frame repeats the 95 message
      (100, "Entities ready for review (5 canonical / 3 relationships)",
        "completed")))
  }

  test("inline parse takes the inline-content arm at 25") {
    val spark2 = spark
    import spark2.implicits._
    val outcomes = Seq(("d2", true, 1L, 1L, 0L, 0L, 0L))
      .toDF("document_id", "inline", "chunk_count",
        "embeddings_generated", "mention_count", "canonical_count",
        "relationships_inserted")
    val msg = PipelineProgress.ladder(outcomes)
      .where($"progress" === 25)
      .select("current_step").as[String].head()
    assert(msg === "Document parsed using inline content")
  }
}
