package graft.incremental

import graft.incremental.SetupStates.{Action, ChangeDescription,
  CombinedState, SetupChangeType}

/** The shared table-target setup grading (src/ops/targets/shared/
  * table_columns.rs:1-183) — how Postgres-style table targets decide
  * between CREATE / ALTER / DROP from the desired vs combined-existing
  * column schemas. Column maps are insertion-ordered but compare
  * ORDER-INDEPENDENTLY (IndexMap equality), and the drop decision is
  * deliberately conservative: any possible existing version with
  * different KEY columns, any staged delete, or an explicit
  * invalidation forces drop-and-recreate; only value columns migrate
  * in place.
  */
object TableColumns {

  /** TableColumnsSchema (table_columns.rs:7-14): ordered (name, type)
    * pairs for key and value columns. */
  final case class ColumnsSchema(keyColumns: Seq[(String, String)],
      valueColumns: Seq[(String, String)]) {
    private[TableColumns] def keyMap = keyColumns.toMap
    private[TableColumns] def valueMap = valueColumns.toMap
  }

  /** IndexMap equality: same pairs, any order. */
  private def sameColumns(a: Seq[(String, String)],
      b: Seq[(String, String)]): Boolean =
    a.size == b.size && a.toMap == b.toMap

  sealed trait UpsertionAction {
    /** table_columns.rs:28-38. */
    def isEmpty: Boolean
  }
  final case class CreateTable(keys: Seq[(String, String)],
      values: Seq[(String, String)]) extends UpsertionAction {
    def isEmpty = false
  }
  final case class UpdateTable(columnsToDelete: Seq[String],
      columnsToUpsert: Seq[(String, String)]) extends UpsertionAction {
    def isEmpty = columnsToDelete.isEmpty && columnsToUpsert.isEmpty
  }

  /** TableMainSetupAction (table_columns.rs:40-105). */
  final case class MainSetupAction(dropExisting: Boolean,
      tableUpsertion: Option[UpsertionAction]) {

    /** table_columns.rs:107-147 — the two-space joins and the Create
      * block's trailing newline are the reference's. */
    def describeChanges: Seq[ChangeDescription] = {
      val out = Seq.newBuilder[ChangeDescription]
      if (dropExisting) out += Action("Drop table")
      tableUpsertion.foreach {
        case CreateTable(keys, values) =>
          out += Action(
            "Create table:\n  key columns: " +
              keys.map { case (k, v) => s"$k $v" }.mkString(",  ") +
              "\n  value columns: " +
              values.map { case (k, v) => s"$k $v" }.mkString(",  ") + "\n")
        case UpdateTable(del, up) =>
          if (del.nonEmpty)
            out += Action(
              s"Delete column from table: ${del.mkString(",  ")}")
          if (up.nonEmpty)
            out += Action("Add / update columns in table: " +
              up.map { case (k, v) => s"$k $v" }.mkString(",  "))
      }
      out.result()
    }

    /** table_columns.rs:149-162. */
    def changeType(hasOtherUpdate: Boolean): SetupChangeType =
      tableUpsertion match {
        case Some(_: CreateTable) => SetupStates.Create
        case Some(_: UpdateTable) => SetupStates.Update
        case None if dropExisting => SetupStates.DeleteChange
        case None =>
          if (hasOtherUpdate) SetupStates.Update else SetupStates.NoChange
      }
  }

  object MainSetupAction {

    /** from_states (table_columns.rs:46-105): no desired state drops
      * whatever may exist; key-column drift or staged deletes or
      * invalidation force drop+Create; a stable table migrates value
      * columns — deletes in existing-version order (deduped), upserts
      * in desired order for columns not identical across EVERY
      * possible version. */
    def fromStates(desired: Option[ColumnsSchema],
        existing: CombinedState[ColumnsSchema],
        existingInvalidated: Boolean = false): MainSetupAction = {
      val versions = existing.possibleVersions
      val mayExist = versions.nonEmpty
      desired match {
        case None => MainSetupAction(dropExisting = mayExist, None)
        case Some(want) =>
          val dropExisting = existingInvalidated ||
            versions.exists(v => !sameColumns(v.keyColumns,
              want.keyColumns)) ||
            (mayExist && !existing.alwaysExists)
          val upsertion =
            if (existing.alwaysExists && !dropExisting) {
              val desiredValueNames = want.valueMap
              val toDelete = versions.flatMap(_.valueColumns.map(_._1))
                .distinct.filterNot(desiredValueNames.contains)
              val toUpsert = want.valueColumns.filter { case (name, tpe) =>
                !versions.forall(_.valueMap.get(name).contains(tpe))
              }
              UpdateTable(toDelete, toUpsert)
            } else CreateTable(want.keyColumns, want.valueColumns)
          MainSetupAction(dropExisting,
            Some(upsertion).filterNot(_.isEmpty))
      }
    }
  }

  /** check_table_compatibility (table_columns.rs:165-183): identical
    * keys grade Compatible unless an existing value column is missing
    * or retyped in the desired schema (data loss → Partial);
    * different keys are NotCompatible. */
  def checkCompatibility(desired: ColumnsSchema,
      existing: ColumnsSchema): String = {
    if (sameColumns(existing.keyColumns, desired.keyColumns)) {
      val lossy = existing.valueColumns.exists { case (k, v) =>
        !desired.valueMap.get(k).contains(v)
      }
      if (lossy) "PartialCompatible" else "Compatible"
    } else "NotCompatible"
  }
}
