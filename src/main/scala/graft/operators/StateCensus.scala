package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** The state-manager read/maintenance surface around the transition
  * stores (state_manager_simple.py:237-397, document_state.py:40-53,
  * 131-150): by-state listings, the zero-filled statistics census,
  * the failed-document reset, and the processing metrics.
  *
  * Scale: listings are predicate + limit (pushed filters, no
  * shuffle); the statistics census is one map-side-combinable
  * groupBy joined to the broadcast 7-row state list; metrics reuse
  * the census plus one bounded by-state scan.
  */
object StateCensus {

  /** States that require user action (document_state.py:50-53). */
  val ActionStates: Seq[String] = Seq("pending_review", "failed", "rejected")

  /** Error states eligible for reset (document_state.py:45-48). */
  val ErrorStates: Seq[String] = Seq("failed", "rejected")

  /** Documents in one state, bounded (:237-243). */
  def documentsByState(docs: DataFrame, state: String,
      limit: Int = 100): DataFrame =
    docs.where(col("status") === lit(state)).limit(limit)

  /** Documents awaiting user action (:273-288). */
  def requiringAction(docs: DataFrame, limit: Int = 100): DataFrame =
    docs.where(col("status").isin(ActionStates: _*)).limit(limit)

  /** Count per state, ZERO-FILLED over the full state list — the
    * reference pre-seeds `{state: 0 for state in DocumentState}`
    * (:314-324), so empty states appear with 0. */
  def stateStatistics(docs: DataFrame,
      states: Seq[String] = StateMachine.simpleStates): DataFrame = {
    val spark = docs.sparkSession
    import spark.implicits._
    val all = states.toDF("status")
    // the aggregated counts (≤ one row per distinct status) are the
    // BUILD side — a broadcast hint on the row-preserving left side
    // of a left join would be silently dropped
    val counts = broadcast(
      docs.groupBy(col("status")).agg(count(lit(1)).as("n")))
    all.join(counts, Seq("status"), "left")
      .select(col("status"), coalesce(col("n"), lit(0L)).as("n"))
  }

  /** Reset failed documents back to `discovered` (:334-358): only
    * error states reset (others answer the not-in-error-state
    * validation error); the transition records the reset markers
    * `{reset, previous_state}` in its per-transition metadata and the
    * default "Manual retry" reason.
    *
    * @return (updated docs, outcomes (id, ok, error)) — the
    *         underlying transition also enforces the map, so an
    *         error-state doc whose edge is somehow absent falls into
    *         the store's own rejected frame
    */
  def resetFailed(docs: DataFrame, resetIds: DataFrame, now: Column,
      reason: String = "Manual retry",
      idCol: String = "id"): (DataFrame, DataFrame) = {
    val ids = resetIds.select(col(idCol))
    val statuses = docs.select(col(idCol), col("status").as("_st"))
    val eligible = ids.join(statuses, Seq(idCol), "left")
    val requests = eligible
      .where(col("_st").isin(ErrorStates: _*))
      .select(col(idCol), lit("discovered").as("to_status"),
        lit(null).cast("string").as("user_id"), lit(reason).as("reason"),
        map(lit("reset"), lit("true"),
          lit("previous_state"), col("_st")).as("t_metadata"))
    val outcomes = eligible.select(col(idCol),
      coalesce(col("_st").isin(ErrorStates: _*), lit(false)).as("ok"),
      when(col("_st").isNull, lit("not found"))
        .when(!col("_st").isin(ErrorStates: _*),
          concat(lit("Document is not in error state (current: "),
            col("_st"), lit(")")))
        .as("error"))
    val result = MetadataStateStore.transition(docs, requests, now, idCol)
    (result.updated, outcomes)
  }

  /** Processing duration per document (document_state.py:131-150):
    * only `ingested` documents report; start = the FIRST transition
    * into processing, end = the LAST transition into ingested;
    * timestamps are numeric strings (epoch seconds). */
  def processingDuration(status: Column, metadata: Column): Column = {
    val hist = MetadataStateStore.history(metadata)
    val starts = filter(hist, t => t.getField("to_state") === "processing")
    val ends = filter(hist, t => t.getField("to_state") === "ingested")
    when(status === "ingested" && size(starts) > 0 && size(ends) > 0,
      element_at(ends, -1).getField("timestamp").cast("double") -
        element_at(starts, 1).getField("timestamp").cast("double"))
  }

  /** The monitoring metrics frame (:361-388), one row: total,
    * success/failure rates over max(total, 1), and the average
    * processing duration (0.0 when none). Two reference quirks: `if
    * duration:` truthiness EXCLUDES exact-0.0 durations from the
    * average (:371-373), and the reference samples at most 1000
    * ingested docs for it (an arbitrary subset — irreproducible, so
    * the average here runs over ALL ingested docs, a superset). The
    * per-state counts component is [[stateStatistics]]. */
  def processingMetrics(docs: DataFrame): DataFrame = {
    val total = greatest(sum(lit(1L)), lit(1L))
    val dur = processingDuration(col("status"), col("metadata"))
    // `if duration:` — 0.0 is falsy and drops out of the average
    val durations = when(dur =!= 0.0, dur)
    docs.agg(
      count(lit(1)).as("total_documents"),
      coalesce(
        sum(when(col("status") === "ingested", 1L).otherwise(0L)) / total,
        lit(0.0)).as("success_rate"),
      coalesce(
        sum(when(col("status") === "failed", 1L).otherwise(0L)) / total,
        lit(0.0)).as("failure_rate"),
      coalesce(avg(durations), lit(0.0)).as("average_processing_time"),
      coalesce(sum(when(col("status") === "pending_review", 1L)
        .otherwise(0L)), lit(0L)).as("documents_pending_review"),
      coalesce(sum(when(col("status") === "failed", 1L).otherwise(0L)),
        lit(0L)).as("documents_failed"))
  }
}
