package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.operators.{MetadataStateStore, StateCensus}

/** The state-manager read/maintenance surface
  * (state_manager_simple.py:237-397, document_state.py:40-53,
  * 131-150). */
class StateCensusSpec extends AnyFunSuite {
  lazy val spark = TestSession.spark
  import spark.implicits._

  private def docs(rows: (String, String)*) =
    rows.toSeq.toDF("id", "status")
      .withColumn("metadata",
        MetadataStateStore.initialMetadata(lit(null).cast("map<string,string>")))

  test("requiring-action and by-state listings filter + bound") {
    val d = docs("d1" -> "pending_review", "d2" -> "ingested",
      "d3" -> "failed", "d4" -> "rejected", "d5" -> "processing")
    assert(StateCensus.requiringAction(d).select("id").as[String]
      .collect().toSet === Set("d1", "d3", "d4"))
    assert(StateCensus.requiringAction(d, limit = 2).count() === 2)
    assert(StateCensus.documentsByState(d, "ingested").select("id")
      .as[String].collect().toSeq === Seq("d2"))
  }

  test("statistics zero-fill the full state list") {
    val d = docs("d1" -> "failed", "d2" -> "failed", "d3" -> "ingested")
    val got = StateCensus.stateStatistics(d)
      .as[(String, Long)].collect().toMap
    assert(got === Map("discovered" -> 0L, "processing" -> 0L,
      "pending_review" -> 0L, "approved" -> 0L, "ingested" -> 1L,
      "failed" -> 2L, "rejected" -> 0L))
  }

  test("reset: error states only, reset markers on the record") {
    val d = docs("d1" -> "failed", "d2" -> "rejected",
      "d3" -> "processing")
    val (updated, outcomes) = StateCensus.resetFailed(d,
      Seq("d1", "d2", "d3", "dX").toDF("id"), lit("T3"))
    val o = outcomes.as[(String, Boolean, Option[String])].collect()
      .map(t => t._1 -> ((t._2, t._3))).toMap
    assert(o("d1") === ((true, None)))
    assert(o("d2") === ((true, None)))
    assert(o("d3") ===
      ((false, Some("Document is not in error state (current: processing)"))))
    assert(o("dX") === ((false, Some("not found"))))
    val st = updated.select("id", "status").as[(String, String)]
      .collect().toMap
    assert(st === Map("d1" -> "discovered", "d2" -> "discovered",
      "d3" -> "processing"))
    // the applied transition carries the reset markers and the
    // default reason in its per-transition metadata
    val hist = updated.where(col("id") === "d1")
      .select(explode(MetadataStateStore.history(col("metadata"))).as("t"))
      .select("t.to_state", "t.reason", "t.metadata")
      .as[(String, String, Map[String, String])].collect().head
    assert(hist === (("discovered", "Manual retry",
      Map("reset" -> "true", "previous_state" -> "failed"))))
  }

  test("processing duration: first-processing to last-ingested") {
    val hist =
      """[{"from_state":"discovered","to_state":"processing","timestamp":"100"},
        |{"from_state":"processing","to_state":"failed","timestamp":"150"},
        |{"from_state":"failed","to_state":"processing","timestamp":"200"},
        |{"from_state":"processing","to_state":"pending_review","timestamp":"230"},
        |{"from_state":"pending_review","to_state":"approved","timestamp":"240"},
        |{"from_state":"approved","to_state":"ingested","timestamp":"260"}]"""
        .stripMargin.replace("\n", "")
    val d = Seq(("d1", "ingested", hist), ("d2", "processing", hist))
      .toDF("id", "status", "h")
      .withColumn("metadata", map(lit("state_transitions"), col("h")))
    val got = d.select(col("id"),
      StateCensus.processingDuration(col("status"), col("metadata"))
        .as("dur")).as[(String, Option[Double])].collect().toMap
    assert(got("d1") === Some(160.0)) // 260 - 100 (FIRST processing)
    assert(got("d2") === None) // not ingested
  }

  test("metrics average drops falsy 0.0 durations (`if duration:`)") {
    val fast = // processing and ingested at the same second: dur 0.0
      """[{"from_state":"discovered","to_state":"processing","timestamp":"100"},
        |{"from_state":"processing","to_state":"ingested","timestamp":"100"}]"""
        .stripMargin.replace("\n", "")
    val slow =
      """[{"from_state":"discovered","to_state":"processing","timestamp":"100"},
        |{"from_state":"processing","to_state":"ingested","timestamp":"200"}]"""
        .stripMargin.replace("\n", "")
    val d = Seq(("d1", "ingested", fast), ("d2", "ingested", slow))
      .toDF("id", "status", "h")
      .withColumn("metadata", map(lit("state_transitions"), col("h")))
    val m = StateCensus.processingMetrics(d).collect().head
    // the 0.0 duration is falsy in the reference and excluded: the
    // average is 100.0, not 50.0
    assert(m.getAs[Double]("average_processing_time") === 100.0)
  }

  test("metrics: rates over max(total,1), zero average when none") {
    val d = docs("d1" -> "ingested", "d2" -> "failed", "d3" -> "failed",
      "d4" -> "pending_review")
    val m = StateCensus.processingMetrics(d).collect().head
    assert(m.getAs[Long]("total_documents") === 4L)
    assert(m.getAs[Double]("success_rate") === 0.25)
    assert(m.getAs[Double]("failure_rate") === 0.5)
    assert(m.getAs[Double]("average_processing_time") === 0.0)
    assert(m.getAs[Long]("documents_pending_review") === 1L)
    assert(m.getAs[Long]("documents_failed") === 2L)
    // empty frame: the max(total, 1) guard
    val e = StateCensus.processingMetrics(docs()).collect().head
    assert(e.getAs[Long]("total_documents") === 0L)
    assert(e.getAs[Double]("success_rate") === 0.0)
  }
}
