package graft.incremental

import graft.operators.ProviderWires.ApiError

/** Source/target id assignment at flow-build time
  * (src/builder/exec_ctx.rs:1-275): how a re-analyzed flow decides to
  * REUSE the numeric ids that key the tracking table and target rows
  * versus allocating fresh ones — the contract that makes incremental
  * processing survive schema evolution.
  */
object ExecContext {

  /** SourceSetupState (states.rs:148-151); the key schema compares
    * attribute-stripped (exec_ctx.rs:39-44). */
  final case class SourceState(sourceId: Int, keySchema: String)

  /** build_import_op_exec_ctx (exec_ctx.rs:33-74): ids of existing
    * states with the SAME key schema form a set — exactly one reuses
    * it; zero or several (ambiguity) allocate last+1. Returns
    * (sourceId, newLastSourceId). */
  def assignSourceId(existing: Seq[SourceState], keySchema: String,
      lastSourceId: Int): (Int, Int) = {
    val matching = existing.filter(_.keySchema == keySchema)
      .map(_.sourceId).toSet
    if (matching.size == 1) (matching.head, lastSourceId)
    else (lastSourceId + 1, lastSourceId + 1)
  }

  /** exec_ctx.rs:42. */
  def requireKeyedSource(hasKey: Boolean): Unit =
    if (!hasKey) throw new ApiError("Source must produce a type with key")

  /** TargetSetupState + common (states.rs:166-186). */
  final case class TargetState(targetId: Int, schemaVersionId: Int,
      maxSchemaVersionId: Int, setupByUser: Boolean, state: String)

  final case class TargetAssignment(targetId: Int, schemaVersionId: Int,
      maxSchemaVersionId: Int, newLastTargetId: Int)

  /** build_target_id (exec_ctx.rs:76-167). Per existing version:
    * a setup_by_user flip is NotCompatible outright; otherwise the
    * target factory grades. Compatible/Partial versions contribute
    * their target id (and, when FULLY compatible, their schema
    * version) to reuse sets; incompatible versions contribute the
    * ambiguity marker. A singleton target-id set reuses (unless it is
    * the marker); anything else allocates last+1. The schema version
    * reuses only from a singleton fully-compatible set, else bumps
    * past the existing max; the stored max covers the chosen version.
    *
    * `compat` is the target-kind grading — TableColumns.
    * checkCompatibility for table targets. */
  def assignTargetId(existing: Seq[TargetState], desiredState: String,
      setupByUser: Boolean, lastTargetId: Int,
      compat: (String, String) => String): TargetAssignment = {
    val compatibleTargetIds = scala.collection.mutable.Set.empty[Option[Int]]
    val reusableSchemaVersions = scala.collection.mutable.Set
      .empty[Option[Int]]
    existing.foreach { ex =>
      val compatibility =
        if (setupByUser == ex.setupByUser) compat(desiredState, ex.state)
        else "NotCompatible"
      if (compatibility != "NotCompatible") {
        reusableSchemaVersions += (if (compatibility == "Compatible")
          Some(ex.schemaVersionId) else None)
        compatibleTargetIds += Some(ex.targetId)
      } else compatibleTargetIds += None
    }
    val reused =
      if (compatibleTargetIds.size == 1) compatibleTargetIds.head else None
    val (targetId, newLast) = reused match {
      case Some(id) => (id, lastTargetId)
      case None => (lastTargetId + 1, lastTargetId + 1)
    }
    val maxExisting = existing.map(_.maxSchemaVersionId).maxOption
      .getOrElse(0)
    val schemaVersion =
      if (reusableSchemaVersions.size == 1)
        reusableSchemaVersions.head.getOrElse(maxExisting + 1)
      else maxExisting + 1
    TargetAssignment(targetId, schemaVersion,
      math.max(maxExisting, schemaVersion), newLast)
  }

  /** exec_ctx.rs:146-153 — a flow exporting twice to one resource. */
  def duplicateTargetError(targetKind: String, keyJson: String): String =
    s"Target resource already exists: kind = $targetKind, key = $keyJson"

  /** exec_ctx.rs:84-88 — the reference's own grammar kept. */
  def notExportTargetError(kind: String): String =
    s"`$kind` is not a export target op"

  /** The flow-level seeds (exec_ctx.rs:202-229): last ids are maxima
    * over every possible metadata version; the tracking-table name
    * carries over from the existing CURRENT state (staged versions
    * don't rename), defaulting to the sanitized flow name. */
  def flowSeeds(flowName: String,
      possibleLastSourceIds: Seq[Int], possibleLastTargetIds: Seq[Int],
      currentTrackingTableName: Option[String])
      : (Int, Int, SetupStates.TrackingTableState) = {
    (possibleLastSourceIds.maxOption.getOrElse(0),
      possibleLastTargetIds.maxOption.getOrElse(0),
      SetupStates.TrackingTableState(
        currentTrackingTableName.getOrElse(
          SetupStates.defaultTrackingTableName(flowName)),
        SetupStates.CurrentTrackingTableVersion))
  }
}
