package graft.incremental

import graft.incremental.SetupStates.{Action, ChangeDescription, Create,
  NoChange, SetupChangeType, StateChange, Upsert, Delete => DeleteStaged}

/** The setup-metadata store contract (src/setup/db_metadata.rs:1-375):
  * the `cocoindex_setup_metadata` table's shape, the optimistic
  * version fence, and the two-phase stage→commit protocol every
  * `cocoindex setup` run drives. Modeled as pure transformations over
  * an in-memory record store; the SQL text the reference executes is
  * pinned alongside so a real Postgres path issues identical
  * statements.
  */
object SetupMetadata {

  val TableName = "cocoindex_setup_metadata" // db_metadata.rs:8
  val FlowVersionResourceType = "__FlowVersion" // db_metadata.rs:9

  /** One row of the metadata table. `state`/`key` carry JSON text. */
  final case class Record(state: Option[String],
      stagingChanges: Vector[StateChange[String]])

  /** (resource_type, key_json) — the per-flow resource identity. */
  final case class ResourceTypeKey(resourceType: String, keyJson: String)

  val VersionKey: ResourceTypeKey =
    ResourceTypeKey(FlowVersionResourceType, "null")

  /** A flow's slice of the table. */
  type Store = Map[ResourceTypeKey, Record]

  /** parse_flow_version (db_metadata.rs:21-26): a bare JSON number;
    * anything else is no version. */
  def parseFlowVersion(state: Option[String]): Option[Long] =
    state.flatMap(s => s.toLongOption.filter(_ >= 0))

  /** The update intent for one resource: desired state (None =
    * delete) and an optional legacy identity to absorb. */
  final case class StateUpdateInfo(desiredState: Option[String],
      legacyKey: Option[ResourceTypeKey] = None)

  val ConflictError = "seen newer version in the metadata table" // :215/:282

  /** stage_changes_for_flow (db_metadata.rs:203-278): fence on the
    * version (Rust Option ordering — a None `seen` against ANY stored
    * version conflicts), bump it, and append each resource's intended
    * change to its staging list unless an identical change is already
    * staged; a legacy record's staging is absorbed ahead of the new
    * change and its row deleted. Brand-new resources stage only
    * upserts (staging a delete of nothing is skipped). Returns the
    * new store and version, or the CONFLICT error. */
  def stageChanges(store: Store, seenVersion: Option[Long],
      updates: Seq[(ResourceTypeKey, StateUpdateInfo)])
      : Either[String, (Store, Long)] = {
    val latest = parseFlowVersion(store.get(VersionKey).flatMap(_.state))
    // Rust: Option<u64> ordering — None < Some(_)
    val conflict = (seenVersion, latest) match {
      case (None, Some(_)) => true
      case (Some(a), Some(b)) => a < b
      case _ => false
    }
    if (conflict) return Left(ConflictError)
    val newVersion = seenVersion.getOrElse(0L) + 1
    var s: Store = store.updated(VersionKey,
      Record(Some(newVersion.toString), Vector.empty))
    // the read snapshot the reference mutates with remove() — a key
    // consumed as an earlier update's legacy no longer resolves
    var snapshot: Store = store
    updates.foreach { case (typeId, info) =>
      val change: StateChange[String] = info.desiredState match {
        case Some(d) => Upsert(d)
        case None => DeleteStaged
      }
      val existingOpt = snapshot.get(typeId)
      snapshot -= typeId
      var newStaging = Vector.empty[StateChange[String]]
      info.legacyKey.foreach { legacy =>
        snapshot.get(legacy).foreach { legacyRecord =>
          newStaging ++= legacyRecord.stagingChanges
          snapshot -= legacy
          s -= legacy
        }
      }
      existingOpt match {
        case Some(existing) =>
          if (!existing.stagingChanges.contains(change))
            newStaging :+= change
          if (newStaging.nonEmpty)
            s = s.updated(typeId, existing.copy(
              stagingChanges = existing.stagingChanges ++ newStaging))
        case None =>
          if (info.desiredState.isDefined) newStaging :+= change
          if (newStaging.nonEmpty)
            s = s.updated(typeId, Record(None, newStaging))
      }
    }
    Right((s, newVersion))
  }

  /** commit_changes_for_flow (db_metadata.rs:281-319): fence on the
    * EXACT staged version, then confirm each resource — an upsert
    * writes the state and clears staging, a delete removes the row —
    * optionally deleting the version row itself (flow drop). */
  def commitChanges(store: Store, currVersion: Long,
      updates: Seq[(ResourceTypeKey, StateUpdateInfo)],
      deleteVersion: Boolean): Either[String, Store] = {
    val latest = parseFlowVersion(store.get(VersionKey).flatMap(_.state))
    if (!latest.contains(currVersion)) return Left(ConflictError)
    var s: Store = store
    updates.foreach { case (typeId, info) =>
      info.desiredState match {
        case Some(d) => s = s.updated(typeId, Record(Some(d), Vector.empty))
        case None => s -= typeId
      }
    }
    if (deleteVersion) s -= VersionKey
    Right(s)
  }

  // -----------------------------------------------------------------
  // The statements the real path executes (pinned text)
  // -----------------------------------------------------------------

  val ReadAllSql: String =
    s"SELECT flow_name, resource_type, key, state, staging_changes " +
      s"FROM $TableName"

  val ReadForFlowSql: String = ReadAllSql + " WHERE flow_name = $1"

  def upsertStagingSql(insert: Boolean): String =
    if (insert)
      s"INSERT INTO $TableName (flow_name, resource_type, key, " +
        "staging_changes) VALUES ($1, $2, $3, $4)"
    else
      s"UPDATE $TableName SET staging_changes = $$4 WHERE flow_name = $$1 " +
        "AND resource_type = $2 AND key = $3"

  def upsertStateSql(insert: Boolean): String =
    if (insert)
      s"INSERT INTO $TableName (flow_name, resource_type, key, state, " +
        "staging_changes) VALUES ($1, $2, $3, $4, $5)"
    else
      s"UPDATE $TableName SET state = $$4, staging_changes = $$5 WHERE " +
        "flow_name = $1 AND resource_type = $2 AND key = $3"

  val DeleteStateSql: String =
    s"DELETE FROM $TableName WHERE flow_name = $$1 AND resource_type = " +
      "$2 AND key = $3"

  /** The metadata-table DDL (db_metadata.rs:355-372). */
  val CreateTableSql: String =
    s"""CREATE TABLE IF NOT EXISTS $TableName (
       |                flow_name TEXT NOT NULL,
       |                resource_type TEXT NOT NULL,
       |                key JSONB NOT NULL,
       |                state JSONB,
       |                staging_changes JSONB NOT NULL,
       |
       |                PRIMARY KEY (flow_name, resource_type, key)
       |            )
       |        """.stripMargin

  /** MetadataTableSetup (db_metadata.rs:322-353). */
  final case class MetadataTableSetup(metadataTableMissing: Boolean) {
    def describeChanges: Seq[ChangeDescription] =
      if (metadataTableMissing)
        Seq(Action(s"Create the cocoindex metadata table $TableName"))
      else Nil
    def changeType: SetupChangeType =
      if (metadataTableMissing) Create else NoChange
    val description = "CocoIndex Metadata Table"
  }
}
