package graft

import org.scalatest.funsuite.AnyFunSuite

import graft.incremental.SetupStates
import graft.incremental.SetupStates._

/** The setup-state algebra (states.rs) and the tracking-table setup
  * grading + plan text (db_tracking_setup.rs). */
class SetupStatesSpec extends AnyFunSuite {

  test("combined state: versions, existence, legacy values") {
    val cs = CombinedState(Some(TrackingTableState("t_v2", 1)),
      Seq(Upsert(TrackingTableState("t_old", 1)), Delete))
    assert(cs.possibleVersions.map(_.tableName) === Seq("t_v2", "t_old"))
    // a staged delete breaks always-exists
    assert(!cs.alwaysExists)
    assert(CombinedState(Some(TrackingTableState("t", 1))).alwaysExists)
    assert(CombinedState[TrackingTableState](None).alwaysExists === false)
    // legacy values: everything differing from desired, sorted set
    val legacy = cs.legacyValues(Some(TrackingTableState("t_v2", 1)),
      (_: TrackingTableState).tableName)
    assert(legacy === Seq("t_old"))
    // from_change: set / clear / carry
    val prev = Some(CombinedState(Some(1)))
    assert(CombinedState.fromChange(prev, Some(Some(2))).current === Some(2))
    assert(CombinedState.fromChange(prev, Some(None)).current === None)
    assert(CombinedState.fromChange(prev, None).current === Some(1))
    assert(CombinedState.fromChange[Int](None, None).current === None)
    assert(CombinedState.fromDesired(7) === CombinedState(Some(7)))
  }

  test("status boxes center in 9 with floor-left padding") {
    assert(statusBox("READY") === "[   READY   ]")
    assert(statusBox("TO CREATE") === "[ TO CREATE ]")
    assert(statusBox("TO UPDATE") === "[ TO UPDATE ]")
    assert(statusBox("TO DELETE") === "[ TO DELETE ]")
    assert(statusBox("INVALID") === "[  INVALID  ]")
    assert(statusBox("USER MANAGED") === "[ USER MANAGED ]")
    assert(objectStatusCode("New", isUpToDate = false) === "TO CREATE")
    assert(objectStatusCode("Existing", isUpToDate = true) === "READY")
    assert(objectStatusCode("Existing", isUpToDate = false) === "TO UPDATE")
    assert(objectStatusCode("Deleted", isUpToDate = true) === "TO DELETE")
    assert(objectStatusCode("Invalid", isUpToDate = true) === "INVALID")
  }

  test("resource rendering: status line, TODO/NOTE block, user-managed") {
    assert(renderResource(Some(NoChange), "Tracking Table", Nil) ===
      "[   READY   ] Tracking Table\n")
    assert(renderResource(None, "postgres table main", Nil) ===
      "[ USER MANAGED ] postgres table main\n")
    assert(renderResource(Some(Update), "Tracking Table",
      Seq(Action("Update the tracking table. "),
        Note("data will be rebuilt"))) ===
      "[ TO UPDATE ] Tracking Table\n" +
        "\n" +
        "    TODO: Update the tracking table. \n" +
        "    NOTE: data will be rebuilt\n" +
        "\n")
    assert(resourceIdentifier("postgres", """{"table":"docs"}""") ===
      """postgres:{"table":"docs"}""")
  }

  test("flow up-to-dateness") {
    assert(flowUpToDate(hasMetadataChange = false, Some(NoChange),
      Seq(Some(NoChange), None)))
    assert(!flowUpToDate(hasMetadataChange = true, Some(NoChange), Nil))
    assert(!flowUpToDate(hasMetadataChange = false, Some(Update), Nil))
    assert(!flowUpToDate(hasMetadataChange = false, None,
      Seq(Some(Create))))
    assert(flowUpToDate(hasMetadataChange = false, None, Nil))
  }

  test("identifier sanitization and validation") {
    assert(sanitizeIdentifier("my-flow.v2") === "my__flow__v2")
    assert(sanitizeIdentifier("ok_name1") === "ok_name1")
    // Rust char::is_alphanumeric semantics (review r14 #2-7):
    // superscript two (No), Roman numeral (Nl), and supplementary-
    // plane letters all KEEP; surrogates never split
    assert(sanitizeIdentifier("a²b") === "a²b")
    assert(sanitizeIdentifier("xⅫy") === "xⅫy")
    val supp = new String(Character.toChars(0x1D49C)) // 𝒜
    assert(sanitizeIdentifier("f" + supp) === "f" + supp)
    assert(validIdentifier("a²" + supp) === "a²" + supp)
    assert(defaultTrackingTableName("demo-flow") ===
      "demo__flow__cocoindex_tracking")
    assert(validIdentifier("t_1") === "t_1")
    val e = intercept[IllegalArgumentException](validIdentifier("bad name"))
    assert(e.getMessage === "Invalid identifier: \"bad name\"")
    intercept[IllegalArgumentException](validIdentifier(""))
  }

  test("tracking-table status grading and plan text") {
    val desired = TrackingTableState("flow__cocoindex_tracking", 1)
    // fresh create
    val create = TrackingTableStatus(Some(desired),
      CombinedState[TrackingTableState](None), Nil).get
    assert(create.changeType === Create)
    assert(create.describeChanges === Seq(Action(
      "Create the tracking table: flow__cocoindex_tracking. ")))
    // up to date
    val ready = TrackingTableStatus(Some(desired),
      CombinedState(Some(desired)), Nil).get
    assert(ready.changeType === NoChange)
    assert(ready.describeChanges === Nil)
    // legacy rename + same version: a rename forces Invalid? no —
    // legacy names break NoChange; min == desired version but legacy
    // nonempty → falls to the min<desired check → Invalid
    val legacy = TrackingTableStatus(Some(desired),
      CombinedState(Some(TrackingTableState("old_name", 1))), Nil).get
    assert(legacy.legacyTableNames === Seq("old_name"))
    assert(legacy.changeType === Invalid)
    assert(legacy.describeChanges.head === Action(
      "Rename legacy tracking tables: old_name. "))
    // version upgrade
    val upgrade = TrackingTableStatus(Some(TrackingTableState("t", 2)),
      CombinedState(Some(TrackingTableState("t", 1))), Nil).get
    assert(upgrade.changeType === Update)
    assert(upgrade.describeChanges === Seq(Action(
      "Update the tracking table. ")))
    // drop
    val drop = TrackingTableStatus(None,
      CombinedState(Some(TrackingTableState("t", 1))), Seq(3, 7)).get
    assert(drop.changeType === DeleteChange)
    assert(drop.describeChanges === Seq(
      Action("Drop existing tracking table: t. "),
      Action("Delete source IDs: 3, 7. ")))
    // nothing wanted, nothing exists
    assert(TrackingTableStatus(None,
      CombinedState[TrackingTableState](None), Nil) === None)
    // a staged delete suppresses min version → desired present → Create
    val staged = TrackingTableStatus(Some(desired),
      CombinedState(Some(desired), Seq(Delete)), Nil).get
    assert(staged.minExistingVersionId === None)
    assert(staged.changeType === Create)
  }

  test("apply-change statement plans and the verbatim DDL") {
    val desired = TrackingTableState("t_new", 1)
    val renamePlan = applyChangeSql(new TrackingTableStatus(Some(desired),
      Seq("t_old1", "t_old2"), Some(1), Nil))
    // same version: renames only, no upgrade
    assert(renamePlan === Seq(
      "ALTER TABLE IF EXISTS t_old1 RENAME TO t_new",
      "ALTER TABLE IF EXISTS t_old2 RENAME TO t_new"))
    val createPlan = applyChangeSql(new TrackingTableStatus(Some(desired),
      Nil, None, Nil))
    assert(createPlan.size === 1)
    assert(createPlan.head.startsWith(
      "CREATE TABLE IF NOT EXISTS t_new (\n" +
        "                source_id INTEGER NOT NULL,"))
    assert(createPlan.head.contains("PRIMARY KEY (source_id, source_key)"))
    val dropPlan = applyChangeSql(new TrackingTableStatus(None,
      Seq("t_old"), Some(1), Nil))
    assert(dropPlan === Seq("DROP TABLE IF EXISTS t_old"))
  }
}
