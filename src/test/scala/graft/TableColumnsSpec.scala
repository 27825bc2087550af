package graft

import org.scalatest.funsuite.AnyFunSuite

import graft.incremental.SetupStates
import graft.incremental.SetupStates.{Action, CombinedState, Delete, Upsert}
import graft.incremental.TableColumns
import graft.incremental.TableColumns._

/** The shared table-target setup grading (table_columns.rs). */
class TableColumnsSpec extends AnyFunSuite {

  private val keyId = Seq("id" -> "bigint")
  private def schema(values: (String, String)*): ColumnsSchema =
    ColumnsSchema(keyId, values.toSeq)

  test("no desired state: drop whatever may exist") {
    val gone = MainSetupAction.fromStates(None,
      CombinedState(Some(schema("text" -> "text"))))
    assert(gone === MainSetupAction(dropExisting = true, None))
    assert(gone.changeType(hasOtherUpdate = false) === SetupStates.DeleteChange)
    val never = MainSetupAction.fromStates(None,
      CombinedState[ColumnsSchema](None))
    assert(never === MainSetupAction(dropExisting = false, None))
    assert(never.changeType(hasOtherUpdate = false) === SetupStates.NoChange)
    assert(never.changeType(hasOtherUpdate = true) === SetupStates.Update)
  }

  test("fresh create and the create block text") {
    val a = MainSetupAction.fromStates(
      Some(schema("text" -> "text", "embedding" -> "vector(768)")),
      CombinedState[ColumnsSchema](None))
    assert(!a.dropExisting)
    assert(a.tableUpsertion === Some(CreateTable(keyId,
      Seq("text" -> "text", "embedding" -> "vector(768)"))))
    assert(a.changeType(hasOtherUpdate = false) === SetupStates.Create)
    assert(a.describeChanges === Seq(Action(
      "Create table:\n  key columns: id bigint\n" +
        "  value columns: text text,  embedding vector(768)\n")))
  }

  test("stable table migrates value columns in place") {
    val existing = CombinedState(Some(
      schema("text" -> "text", "old_col" -> "int", "retyped" -> "int")))
    val a = MainSetupAction.fromStates(
      Some(schema("text" -> "text", "retyped" -> "bigint",
        "new_col" -> "jsonb")),
      existing)
    assert(!a.dropExisting)
    assert(a.tableUpsertion === Some(UpdateTable(
      Seq("old_col"), // existing-order, absent from desired
      Seq("retyped" -> "bigint", "new_col" -> "jsonb")))) // desired order
    assert(a.changeType(hasOtherUpdate = false) === SetupStates.Update)
    assert(a.describeChanges === Seq(
      Action("Delete column from table: old_col"),
      Action("Add / update columns in table: retyped bigint,  new_col jsonb")))
    // identical schemas: the empty update filters to None → NoChange
    val same = MainSetupAction.fromStates(Some(schema("text" -> "text")),
      CombinedState(Some(schema("text" -> "text"))))
    assert(same === MainSetupAction(dropExisting = false, None))
    assert(same.changeType(hasOtherUpdate = false) === SetupStates.NoChange)
  }

  test("key drift, staged deletes, and invalidation force drop+create") {
    val want = schema("text" -> "text")
    // different key columns on ANY possible version
    val keyDrift = MainSetupAction.fromStates(Some(want),
      CombinedState(Some(ColumnsSchema(Seq("uuid" -> "uuid"),
        Seq("text" -> "text")))))
    assert(keyDrift.dropExisting)
    assert(keyDrift.tableUpsertion ===
      Some(CreateTable(keyId, Seq("text" -> "text"))))
    assert(keyDrift.describeChanges.head === Action("Drop table"))
    // key order does NOT matter (IndexMap equality)
    val reordered = MainSetupAction.fromStates(
      Some(ColumnsSchema(Seq("a" -> "int", "b" -> "int"), Nil)),
      CombinedState(Some(ColumnsSchema(Seq("b" -> "int", "a" -> "int"),
        Nil))))
    assert(!reordered.dropExisting)
    // a staged delete breaks always-exists → drop + recreate
    val staged = MainSetupAction.fromStates(Some(want),
      CombinedState(Some(want), Seq(Delete)))
    assert(staged.dropExisting)
    assert(staged.tableUpsertion.exists(_.isInstanceOf[CreateTable]))
    // explicit invalidation
    val invalidated = MainSetupAction.fromStates(Some(want),
      CombinedState(Some(want)), existingInvalidated = true)
    assert(invalidated.dropExisting)
    // a staged upsert with a different value column joins the
    // possible versions: its column must be deleted/upserted
    val multi = MainSetupAction.fromStates(
      Some(schema("text" -> "text")),
      CombinedState(Some(schema("text" -> "text")),
        Seq(Upsert(schema("extra" -> "int")))))
    assert(multi.tableUpsertion === Some(UpdateTable(Seq("extra"),
      Seq("text" -> "text"))))
  }

  test("compatibility grading") {
    val base = schema("text" -> "text", "score" -> "real")
    assert(checkCompatibility(base, base) === "Compatible")
    // desired ADDS a column: nothing existing is lost
    assert(checkCompatibility(schema("text" -> "text", "score" -> "real",
      "extra" -> "int"), base) === "Compatible")
    // desired drops or retypes an existing value column: Partial
    assert(checkCompatibility(schema("text" -> "text"), base) ===
      "PartialCompatible")
    assert(checkCompatibility(schema("text" -> "text", "score" -> "int"),
      base) === "PartialCompatible")
    // key change: NotCompatible
    assert(checkCompatibility(
      ColumnsSchema(Seq("uuid" -> "uuid"), Seq("text" -> "text")), base) ===
      "NotCompatible")
  }
}
