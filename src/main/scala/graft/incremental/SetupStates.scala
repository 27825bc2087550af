package graft.incremental

/** The setup-state algebra (src/setup/states.rs:1-471) and the
  * tracking-table setup contract (src/execution/db_tracking_setup.rs:
  * 1-196): how the engine grades "what exists" against "what the flow
  * wants" into CREATE/UPDATE/DELETE/INVALID plans, and the exact plan
  * text the CLI prints. Everything here is pure state arithmetic —
  * the apply side is the SetupDriver/JdbcSink tier.
  */
object SetupStates {

  /** StateChange (states.rs:121-145). */
  sealed trait StateChange[+T] {
    def isDelete: Boolean
    def state: Option[T]
  }
  final case class Upsert[T](value: T) extends StateChange[T] {
    def isDelete = false
    def state = Some(value)
  }
  case object Delete extends StateChange[Nothing] {
    def isDelete = true
    def state = None
  }

  /** CombinedState (states.rs:42-112): the possibly-staged view of a
    * resource — current state plus not-yet-confirmed changes. */
  final case class CombinedState[T](current: Option[T],
      staging: Seq[StateChange[T]] = Nil,
      legacyStateKey: Option[String] = None) {

    /** Every version that may exist: current + staged upserts. */
    def possibleVersions: Seq[T] =
      current.toSeq ++ staging.flatMap(_.state)

    /** The resource surely exists: has a current state and no staged
      * delete (states.rs:81-83). */
    def alwaysExists: Boolean = current.isDefined && !staging.exists(_.isDelete)

    /** Values across versions that differ from the desired one —
      * sorted set, as the BTreeSet collects (states.rs:85-95). */
    def legacyValues[V: Ordering](desired: Option[T], f: T => V): Seq[V] = {
      val desiredValue = desired.map(f)
      possibleVersions.map(f).filter(v => !desiredValue.contains(v))
        .distinct.sorted
    }
  }

  object CombinedState {
    def fromDesired[T](desired: T): CombinedState[T] =
      CombinedState(Some(desired))

    /** states.rs:60-73: Some(Some(s)) sets, Some(None) clears, None
      * carries the previous current forward; staging always clears. */
    def fromChange[T](prev: Option[CombinedState[T]],
        change: Option[Option[T]]): CombinedState[T] =
      CombinedState(change match {
        case Some(some) => some
        case None => prev.flatMap(_.current)
      })
  }

  /** SetupChangeType (states.rs:238-245) with the status codes the
    * renderer prints (states.rs:292-299); None = user-managed. */
  sealed abstract class SetupChangeType(val code: String)
  case object NoChange extends SetupChangeType("READY")
  case object Create extends SetupChangeType("TO CREATE")
  case object Update extends SetupChangeType("TO UPDATE")
  case object DeleteChange extends SetupChangeType("TO DELETE")
  case object Invalid extends SetupChangeType("INVALID")

  /** Rust's `{:^9}` centering inside brackets: left pad floor, right
    * pad ceil; wider strings pass through. */
  def statusBox(code: String): String = {
    val pad = math.max(0, 9 - code.length)
    val left = pad / 2
    "[ " + (" " * left) + code + (" " * (pad - left)) + " ]"
  }

  /** ObjectStatus → code (states.rs:410-432): Existing grades by
    * up-to-dateness. */
  def objectStatusCode(status: String, isUpToDate: Boolean): String =
    status match {
      case "New" => "TO CREATE"
      case "Existing" => if (isUpToDate) "READY" else "TO UPDATE"
      case "Deleted" => "TO DELETE"
      case "Invalid" => "INVALID"
      case other => throw new IllegalArgumentException(other)
    }

  /** One TODO:/NOTE: plan line (states.rs:247-250). */
  sealed trait ChangeDescription { def text: String }
  final case class Action(text: String) extends ChangeDescription
  final case class Note(text: String) extends ChangeDescription

  /** ResourceSetupInfo's printed form (states.rs:290-334, ANSI colors
    * dropped): the status box + description line, then — only when
    * there are changes — a blank line, the 4-space-indented TODO:/
    * NOTE: lines, and a closing blank line. */
  def renderResource(changeType: Option[SetupChangeType],
      description: String, changes: Seq[ChangeDescription]): String = {
    val code = changeType.map(_.code).getOrElse("USER MANAGED")
    val sb = new StringBuilder(statusBox(code)).append(" ")
      .append(description).append("\n")
    if (changeType.isDefined && changes.nonEmpty) {
      sb.append("\n")
      changes.foreach {
        case Action(t) => sb.append("    TODO: ").append(t).append("\n")
        case Note(t) => sb.append("    NOTE: ").append(t).append("\n")
      }
      sb.append("\n")
    }
    sb.toString
  }

  /** ResourceIdentifier Display: `{target_kind}:{key_json}`
    * (states.rs:159-163). */
  def resourceIdentifier(targetKind: String, keyJson: String): String =
    s"$targetKind:$keyJson"

  /** FlowSetupStatus::is_up_to_date (states.rs:377-388). */
  def flowUpToDate(hasMetadataChange: Boolean,
      trackingTableChange: Option[SetupChangeType],
      targetChanges: Seq[Option[SetupChangeType]]): Boolean =
    !hasMetadataChange &&
      trackingTableChange.forall(_ == NoChange) &&
      targetChanges.forall(_.forall(_ == NoChange))

  // -----------------------------------------------------------------
  // Identifier sanitization (src/utils/db.rs)
  // -----------------------------------------------------------------

  /** Rust `char::is_alphanumeric` over a CODE POINT: Alphabetic plus
    * the Nd/Nl/No number categories (so '²' and Roman numerals count,
    * and supplementary-plane letters don't split into surrogates —
    * review r14 #2-7). */
  private def isRustAlphanumeric(cp: Int): Boolean =
    Character.isLetter(cp) || {
      val t = Character.getType(cp)
      t == Character.DECIMAL_DIGIT_NUMBER ||
        t == Character.LETTER_NUMBER || t == Character.OTHER_NUMBER
    }

  /** sanitize_identifier (db.rs:35-45): every non-alphanumeric,
    * non-underscore char becomes TWO underscores. */
  def sanitizeIdentifier(s: String): String = {
    val sb = new StringBuilder
    var i = 0
    while (i < s.length) {
      val cp = s.codePointAt(i)
      if (isRustAlphanumeric(cp) || cp == '_')
        sb.appendAll(Character.toChars(cp))
      else sb.append("__")
      i += Character.charCount(cp)
    }
    sb.toString
  }

  /** ValidIdentifier (db.rs:4-14): non-empty, alphanumeric/underscore
    * only; the reference formats the offender in Rust {:?} quotes. */
  def validIdentifier(s: String): String = {
    val ok = s.nonEmpty && {
      var i = 0
      var all = true
      while (i < s.length && all) {
        val cp = s.codePointAt(i)
        all = isRustAlphanumeric(cp) || cp == '_'
        i += Character.charCount(cp)
      }
      all
    }
    if (ok) s
    else throw new IllegalArgumentException("Invalid identifier: \"" + s +
      "\"")
  }

  // -----------------------------------------------------------------
  // Tracking-table setup (db_tracking_setup.rs)
  // -----------------------------------------------------------------

  val CurrentTrackingTableVersion = 1

  /** default_tracking_table_name (db_tracking_setup.rs:7-12). */
  def defaultTrackingTableName(flowName: String): String =
    s"${sanitizeIdentifier(flowName)}__cocoindex_tracking"

  final case class TrackingTableState(tableName: String, versionId: Int)

  /** TrackingTableSetupStatus (db_tracking_setup.rs:56-103): derived
    * from the desired state, the combined existing state, and the
    * source ids being dropped. None when nothing exists and nothing
    * is wanted. */
  final case class TrackingTableStatus(
      desiredState: Option[TrackingTableState],
      legacyTableNames: Seq[String],
      minExistingVersionId: Option[Int],
      sourceIdsToDelete: Seq[Int]) {

    /** db_tracking_setup.rs:106-145 — note every action's trailing
      * ". " survives from the reference format strings. */
    def describeChanges: Seq[ChangeDescription] = {
      val out = Seq.newBuilder[ChangeDescription]
      if (desiredState.isDefined && legacyTableNames.nonEmpty)
        out += Action(
          s"Rename legacy tracking tables: ${legacyTableNames.mkString(", ")}. ")
      (minExistingVersionId, desiredState) match {
        case (None, Some(state)) =>
          out += Action(s"Create the tracking table: ${state.tableName}. ")
        case (Some(min), Some(desired)) if min < desired.versionId =>
          out += Action("Update the tracking table. ")
        case (Some(_), None) =>
          out += Action(
            s"Drop existing tracking table: ${legacyTableNames.mkString(", ")}. ")
        case _ => ()
      }
      if (sourceIdsToDelete.nonEmpty)
        out += Action(
          s"Delete source IDs: ${sourceIdsToDelete.mkString(", ")}. ")
      out.result()
    }

    /** db_tracking_setup.rs:147-162. */
    def changeType: SetupChangeType =
      (minExistingVersionId, desiredState) match {
        case (None, Some(_)) => Create
        case (Some(min), Some(desired)) =>
          if (min == desired.versionId && legacyTableNames.isEmpty) NoChange
          else if (min < desired.versionId) Update
          else Invalid
        case (Some(_), None) => DeleteChange
        case (None, None) => NoChange
      }
  }

  object TrackingTableStatus {
    /** db_tracking_setup.rs:66-90. */
    def apply(desired: Option[TrackingTableState],
        existing: CombinedState[TrackingTableState],
        sourceIdsToDelete: Seq[Int]): Option[TrackingTableStatus] = {
      val legacy = existing.legacyValues(desired, (_: TrackingTableState)
        .tableName)
      val minVersion =
        if (existing.alwaysExists)
          existing.possibleVersions.map(_.versionId).minOption
        else None
      if (desired.isDefined || minVersion.isDefined)
        Some(new TrackingTableStatus(desired, legacy, minVersion,
          sourceIdsToDelete))
      else None
    }
  }

  /** The tracking-table DDL (db_tracking_setup.rs:22-44): rendered
    * verbatim so a real Postgres target receives the reference's own
    * statement. Only the 0→1 upgrade exists today. */
  def createTrackingTableSql(tableName: String): String =
    s"""CREATE TABLE IF NOT EXISTS $tableName (
       |                source_id INTEGER NOT NULL,
       |                source_key JSONB NOT NULL,
       |
       |                -- Update in the precommit phase: after evaluation done, before really applying the changes to the target storage.
       |                max_process_ordinal BIGINT NOT NULL,
       |                staging_target_keys JSONB NOT NULL,
       |                memoization_info JSONB,
       |
       |                -- Update after applying the changes to the target storage.
       |                processed_source_ordinal BIGINT,
       |                process_logic_fingerprint BYTEA,
       |                process_ordinal BIGINT,
       |                process_time_micros BIGINT,
       |                target_keys JSONB,
       |
       |                PRIMARY KEY (source_id, source_key)
       |            );""".stripMargin

  /** apply_change's statement plan (db_tracking_setup.rs:166-195):
    * with a desired state, rename every legacy table to it, then
    * upgrade when the version differs; without one, drop the legacy
    * tables. */
  def applyChangeSql(status: TrackingTableStatus): Seq[String] =
    status.desiredState match {
      case Some(desired) =>
        val renames = status.legacyTableNames.map(l =>
          s"ALTER TABLE IF EXISTS $l RENAME TO ${desired.tableName}")
        val upgrade =
          if (status.minExistingVersionId != Some(desired.versionId) &&
            status.minExistingVersionId.getOrElse(0) < 1 &&
            desired.versionId >= 1)
            Seq(createTrackingTableSql(desired.tableName))
          else Nil
        renames ++ upgrade
      case None =>
        status.legacyTableNames.map(l => s"DROP TABLE IF EXISTS $l")
    }
}
