package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.operators.ExtractionRuns

/** extraction_runs bookkeeping (entity_v2.py:8-19,
  * supabase_service.py:284-309): create running -> complete with
  * per-document counters, failed override, deterministic run ids. */
class ExtractionRunsSpec extends AnyFunSuite {
  lazy val spark = TestSession.spark
  import spark.implicits._

  private def docs = Seq((1L, 100L), (2L, 100L), (3L, 100L), (4L, 100L))
    .toDF("doc_id", "ord")

  test("start creates one running row per document with provenance") {
    val runs = ExtractionRuns.start(docs, "doc_id", "ord",
      promptVersion = Some("p7"))
    val rows = runs.collect()
    assert(rows.length === 4)
    assert(rows.forall(_.getAs[String]("status") == "running"))
    assert(rows.forall(_.getAs[String]("pipeline_version") == "v2"))
    assert(rows.forall(_.getAs[String]("model") == "gpt-4o-mini"))
    assert(rows.forall(_.getAs[String]("prompt_version") == "p7"))
    assert(rows.forall(_.getAs[Long]("started_at") == 100L))
    assert(rows.forall(r => r.isNullAt(r.fieldIndex("completed_at"))))
    // deterministic ids: same doc + version + ordinal => same run id;
    // a new ordinal is a NEW run
    val again = ExtractionRuns.start(docs, "doc_id", "ord")
      .select("run_id").as[String].collect().toSet
    val ids = runs.select("run_id").as[String].collect().toSet
    assert(ids === again && ids.size === 4)
    val rerun = ExtractionRuns.start(
        docs.withColumn("ord", lit(200L)), "doc_id", "ord")
      .select("run_id").as[String].collect().toSet
    assert((ids & rerun).isEmpty)
  }

  test("complete joins the three counters; absent docs count zero") {
    val runs = ExtractionRuns.start(docs, "doc_id", "ord")
    val mentions = Seq((1L, "a"), (1L, "b"), (2L, "c")).toDF("doc_id", "m")
    val canonical = Seq((1L, "X"), (2L, "Y"), (2L, "Z")).toDF("doc_id", "e")
    val rels = Seq((2L, "r1")).toDF("doc_id", "r")
    val done = ExtractionRuns.complete(runs, mentions, "doc_id",
      canonical, "doc_id", rels, "doc_id", completedAt = 111L)
    val byDoc = done.collect()
      .map(r => r.getAs[String]("document_id") ->
        ((r.getAs[Long]("mentions_extracted"),
          r.getAs[Long]("entities_canonicalized"),
          r.getAs[Long]("relationships_inferred"),
          r.getAs[String]("status")))).toMap
    assert(byDoc("1") === ((2L, 1L, 0L, "completed")))
    assert(byDoc("2") === ((1L, 2L, 1L, "completed")))
    assert(byDoc("3") === ((0L, 0L, 0L, "completed"))) // ran, found nothing
    assert(done.collect().forall(_.getAs[Long]("completed_at") == 111L))
  }

  test("failed docs land failed with zero counters, like the status override") {
    val runs = ExtractionRuns.start(docs, "doc_id", "ord")
    val mentions = Seq((1L, "a"), (4L, "b")).toDF("doc_id", "m")
    val empty = Seq.empty[(Long, String)].toDF("doc_id", "x")
    val failed = Seq(Tuple1(4L)).toDF("document_id")
    val done = ExtractionRuns.complete(runs, mentions, "doc_id",
      empty, "doc_id", empty, "doc_id", completedAt = 5L,
      failedDocs = Some(failed))
    val m = done.collect().map(r => r.getAs[String]("document_id") ->
      ((r.getAs[String]("status"), r.getAs[Long]("mentions_extracted")))).toMap
    // doc 4 extracted mentions before its run failed: the counters
    // still read zero, as the reference's failed arm records
    assert(m("4") === (("failed", 0L)))
    assert(m("1") === (("completed", 1L)))
  }
}
