package graft

import org.scalatest.funsuite.AnyFunSuite

import graft.incremental.ExecContext
import graft.incremental.ExecContext._
import graft.incremental.SetupStates
import graft.operators.ProviderWires.ApiError

/** Source/target id assignment at flow-build time (exec_ctx.rs). */
class ExecContextSpec extends AnyFunSuite {

  test("source ids: reuse on unique schema match, allocate otherwise") {
    // no existing states → allocate
    assert(assignSourceId(Nil, "Str", 0) === (1, 1))
    // unique match reuses without bumping
    assert(assignSourceId(Seq(SourceState(3, "Str"),
      SourceState(9, "Int64")), "Str", 9) === (3, 9))
    // AMBIGUOUS matches (two different ids, same schema) allocate
    assert(assignSourceId(Seq(SourceState(3, "Str"),
      SourceState(4, "Str")), "Str", 9) === (10, 10))
    // the same id across versions is one set element → reuse
    assert(assignSourceId(Seq(SourceState(3, "Str"),
      SourceState(3, "Str")), "Str", 9) === (3, 9))
    // schema drift → allocate
    assert(assignSourceId(Seq(SourceState(3, "Int64")), "Str", 3) === (4, 4))
    val e = intercept[ApiError](requireKeyedSource(false))
    assert(e.getMessage === "Source must produce a type with key")
    requireKeyedSource(true)
  }

  private def ts(id: Int, sv: Int, maxSv: Int, byUser: Boolean = false,
      state: String = "A") =
    TargetState(id, sv, maxSv, byUser, state)
  private val gradeEq: (String, String) => String =
    (d, e) => if (d == e) "Compatible"
      else if (d.startsWith(e.take(1))) "PartialCompatible"
      else "NotCompatible"

  test("target ids: fresh, full reuse, partial bump, user-flip") {
    // nothing existing: target 1, schema version 1
    assert(assignTargetId(Nil, "A", setupByUser = false, 0, gradeEq) ===
      TargetAssignment(1, 1, 1, 1))
    // fully compatible single version: reuse id AND schema version
    assert(assignTargetId(Seq(ts(5, 2, 3)), "A", setupByUser = false, 7,
      gradeEq) === TargetAssignment(5, 2, 3, 7))
    // partially compatible: reuse id, bump schema version past max
    assert(assignTargetId(Seq(ts(5, 2, 3, state = "AB")), "A",
      setupByUser = false, 7, gradeEq) === TargetAssignment(5, 4, 4, 7))
    // setup_by_user flip forces NotCompatible → new id
    assert(assignTargetId(Seq(ts(5, 2, 3, byUser = true)), "A",
      setupByUser = false, 7, gradeEq) === TargetAssignment(8, 4, 4, 8))
    // incompatible state → new id, bumped schema version
    assert(assignTargetId(Seq(ts(5, 2, 3, state = "Z")), "A",
      setupByUser = false, 7, gradeEq) === TargetAssignment(8, 4, 4, 8))
  }

  test("target ids: ambiguity across versions") {
    // one compatible, one incompatible version → two set elements →
    // allocate a fresh id
    val mixed = assignTargetId(Seq(ts(5, 2, 3), ts(6, 1, 3, state = "Z")),
      "A", setupByUser = false, 7, gradeEq)
    assert(mixed === TargetAssignment(8, 2, 3, 8))
    // two fully-compatible versions with the SAME id and schema
    // version collapse to singletons → reuse both
    assert(assignTargetId(Seq(ts(5, 2, 3), ts(5, 2, 3)), "A",
      setupByUser = false, 7, gradeEq) === TargetAssignment(5, 2, 3, 7))
    // same id but different reusable schema versions → bump version
    assert(assignTargetId(Seq(ts(5, 2, 3), ts(5, 1, 3)), "A",
      setupByUser = false, 7, gradeEq) === TargetAssignment(5, 4, 4, 7))
    // full + partial on one id: reusable set {Some(2), None} → bump
    assert(assignTargetId(Seq(ts(5, 2, 3), ts(5, 2, 3, state = "AB")),
      "A", setupByUser = false, 7, gradeEq) === TargetAssignment(5, 4, 4, 7))
  }

  test("error vocabulary and flow seeds") {
    assert(duplicateTargetError("postgres", """{"table":"docs"}""") ===
      """Target resource already exists: kind = postgres, key = {"table":"docs"}""")
    assert(notExportTargetError("SplitRecursively") ===
      "`SplitRecursively` is not a export target op")
    val (ls, lt, tt) = flowSeeds("my-flow", Seq(2, 5), Seq(3), None)
    assert(ls === 5 && lt === 3)
    assert(tt === SetupStates.TrackingTableState(
      "my__flow__cocoindex_tracking", 1))
    // the existing current name carries over
    val (_, _, kept) = flowSeeds("my-flow", Nil, Nil, Some("legacy_name"))
    assert(kept === SetupStates.TrackingTableState("legacy_name", 1))
  }
}
