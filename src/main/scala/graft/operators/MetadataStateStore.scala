package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** The no-transitions-table state-manager variant
  * (state_manager_simple.py:41-74, 165-243): the transition log lives
  * INSIDE each document's metadata — a JSON array under the
  * `state_transitions` key — instead of a separate audit table, so
  * the deployment "works with the existing schema".
  *
  * Frame shape: document metadata is the map<string,string> the other
  * tiers use; this store keeps the history as a JSON-encoded array
  * string under [[TransitionsKey]] and appends on every transition.
  * Arbitrary other metadata keys pass through untouched (the
  * reference copies the whole dict and rewrites only the state keys,
  * :194-200). Validation defaults to the EXACT document_state.py map
  * ([[StateMachine.simpleAllowed]] — what `can_transition_to`
  * checks, :180); pass `allowedMap` to validate against another map,
  * e.g. the same map as a co-deployed table-backed
  * [[StateMachine.applyTransitions]]. An invalid request lands in the
  * rejected frame (the frame analogue of StateValidationError,
  * :180-183).
  *
  * Scale: one broadcast join against the 12-edge transition table
  * plus a left join of the request batch — identical plan shape to
  * [[StateMachine.applyTransitions]]; the JSON append is a per-row
  * projection, no extra shuffle, and the history stays O(transitions
  * per document), not O(corpus).
  */
object MetadataStateStore {

  /** Metadata key holding the serialized history. */
  val TransitionsKey = "state_transitions"

  /** One logged transition (the storable dict, :82-93), including the
    * per-transition extras dict (`metadata`) — reset markers like
    * `{"reset": true, "previous_state": ...}` live there (:355). */
  val transitionType: ArrayType = ArrayType(new StructType()
    .add("from_state", StringType).add("to_state", StringType)
    .add("timestamp", StringType).add("user_id", StringType)
    .add("reason", StringType)
    .add("metadata", MapType(StringType, StringType)))

  /** Parsed history (oldest first) from a metadata map; a missing key
    * or malformed JSON parses to an empty array (the reference's
    * per-record try/except keeps going, :53-58). */
  def history(metadata: Column): Column =
    coalesce(from_json(element_at(metadata, TransitionsKey), transitionType),
      array().cast(transitionType))

  /** Initial metadata of a fresh document (create_state, :120-123):
    * empty history and zero error_count merged over any caller keys. */
  def initialMetadata(extra: Column): Column =
    map_concat(
      map_filter(coalesce(extra, map().cast("map<string,string>")),
        (k, _) => k =!= TransitionsKey && k =!= "error_count"),
      map(lit(TransitionsKey), lit("[]"), lit("error_count"), lit("0")))

  /** Apply a request batch, appending each applied transition to the
    * document's own metadata. The returned audit frame is the history
    * RE-READ from metadata (all transitions ever applied, exploded) —
    * the round-trip surface the table-backed audit is compared to.
    *
    * @param docs     (id, status, metadata, ...) — extra columns pass
    *                 through; updated_at/processed_at/approved_at are
    *                 stamped (added if absent, :203-212)
    * @param requests (id, to_status, user_id, reason [, t_metadata])
    *                 — at most one per id; user_id/reason nullable;
    *                 the optional t_metadata map is the reference's
    *                 per-transition extras dict, stored on the record
    * @param now      timestamp column evaluated against the joined
    *                 frame
    * @param allowedMap the transition map — defaults to the EXACT
    *                 document_state.py map this manager validates
    *                 with (`can_transition_to`, :180)
    */
  def transition(docs: DataFrame, requests: DataFrame, now: Column,
      idCol: String = "id",
      allowedMap: Seq[(String, String)] = StateMachine.simpleAllowed)
      : StateMachine.TransitionResult = {
    val spark = docs.sparkSession
    val allowedDf = broadcast(
      spark.createDataFrame(allowedMap).toDF("_from", "_to"))
    val reqCols = Seq(col(idCol), col("to_status"), col("user_id"),
      col("reason")) ++
      (if (requests.columns.contains("t_metadata")) Seq(col("t_metadata"))
       else Nil)
    val base = docs.join(requests.select(reqCols: _*), Seq(idCol), "left")
      .join(allowedDf,
        col("status") === col("_from") && col("to_status") === col("_to"),
        "left")
      .withColumn("_valid", col("_to").isNotNull)
      .withColumn("_now", now)
      // a NULL metadata map reads as empty (`document.metadata or {}`,
      // :196) FOR THE TRANSITIONING DOC ONLY — _meta0 feeds the valid
      // arm; a doc with no (or an invalid) request keeps its
      // original, possibly-NULL metadata untouched, like the
      // reference, which only writes the requested document
      .withColumn("_meta0",
        coalesce(col("metadata"), map().cast("map<string,string>")))
      .withColumn("_oldlog",
        trim(coalesce(element_at(col("_meta0"), TransitionsKey),
          lit("[]")), " \t\n\r"))
      .withColumn("_oldparsed", from_json(col("_oldlog"), transitionType))
      // canonical array text to append to: the trimmed log when it is
      // array-shaped; otherwise (Spark's from_json leniently reads a
      // bare object as a 1-element array) the re-serialized parse
      .withColumn("_canon",
        when(col("_oldlog").startsWith("[") && col("_oldlog").endsWith("]"),
          col("_oldlog")).otherwise(to_json(col("_oldparsed"))))
    // the record to_json drops null user_id/reason/metadata fields
    // (the reference stores None verbatim; the parsed read-back is
    // identical either way, and dropped nulls keep the surgery text
    // compact); t_metadata (the per-transition extras dict, e.g.
    // reset markers) rides on the record when the request carries it
    val recMeta =
      if (requests.columns.contains("t_metadata")) col("t_metadata")
      else lit(null).cast("map<string,string>")
    val record = to_json(struct(
      col("status").as("from_state"), col("to_status").as("to_state"),
      col("_now").as("timestamp"), col("user_id"), col("reason"),
      recMeta.as("metadata")))
    // append by string surgery on the canonical array text ("[a]" +
    // rec -> "[a,rec]") — no parse->re-serialize round-trip in the
    // common arm, so unknown record fields written by other
    // deployments survive verbatim. An EMPTY or malformed log is
    // REPLACED by the fresh one-record array: the reference parses
    // (empty on failure), appends, re-serializes. The empty guard is
    // on the PARSED size, not the "[]" literal, so "[ ]"/"[]\n"
    // variants can't corrupt the surgery.
    val appended = when(
        col("_oldparsed").isNull || size(col("_oldparsed")) === 0,
        concat(lit("["), record, lit("]")))
      .otherwise(concat(
        expr("substring(_canon, 1, length(_canon) - 1)"),
        lit(","), record, lit("]")))
    // approve with a user stamps approved_by_user (:213-218); only
    // then is any previous value replaced
    val stampApproved =
      col("to_status") === "approved" && col("user_id").isNotNull
    // add_transition bumps error_count on every transition INTO
    // failed (document_state.py:113-114), and the manager writes the
    // (possibly unchanged) value back on EVERY valid transition
    // (:199-200) — so a doc that never had the key gains "0" on its
    // first valid non-failed transition, like the reference
    val bumpError = col("to_status") === "failed"
    val errorCount = coalesce(
      expr("try_cast(element_at(_meta0, 'error_count') AS INT)"), lit(0))
    val newErrorCount =
      when(bumpError, errorCount + 1).otherwise(errorCount)
    val newMeta = map_concat(
      map_filter(col("_meta0"), (k, _) =>
        k =!= TransitionsKey && k =!= "error_count" &&
          !(k === "approved_by_user" && stampApproved)),
      map(lit(TransitionsKey), appended),
      when(stampApproved, map(lit("approved_by_user"), col("user_id")))
        .otherwise(map().cast("map<string,string>")),
      map(lit("error_count"), newErrorCount.cast("string")))
    val stamped = base
      .withColumn("metadata",
        when(col("_valid"), newMeta).otherwise(col("metadata")))
      .withColumn("status",
        when(col("_valid"), col("to_status")).otherwise(col("status")))
      .withColumn("updated_at",
        when(col("_valid"), col("_now"))
          .otherwise(colOr(docs, "updated_at")))
      .withColumn("processed_at",
        when(col("_valid") && col("to_status") === "processing", col("_now"))
          .otherwise(colOr(docs, "processed_at")))
      .withColumn("approved_at",
        when(col("_valid") && col("to_status") === "approved", col("_now"))
          .otherwise(colOr(docs, "approved_at")))
    val rejected = base
      .where(col("to_status").isNotNull && !col("_valid"))
      .select(col(idCol), col("status").as("from_status"), col("to_status"),
        lit("transition not allowed").as("reason"))
    val updated = stamped.drop("to_status", "user_id", "reason",
      "t_metadata", "_from", "_to", "_valid", "_now", "_meta0",
      "_oldlog", "_oldparsed", "_canon")
    val audit = updated
      .select(col(idCol), explode(history(col("metadata"))).as("t"))
      .select(col(idCol), col("t.from_state").as("from_status"),
        col("t.to_state").as("to_status"), col("t.timestamp"),
        col("t.user_id"), col("t.reason"),
        col("t.metadata").as("t_metadata"))
    StateMachine.TransitionResult(updated, rejected, audit)
  }

  private def colOr(df: DataFrame, name: String): Column =
    if (df.columns.contains(name)) col(name) else lit(null).cast("string")
}
