package graft

import org.scalatest.funsuite.AnyFunSuite

import graft.dataflow.FlowBuilderFaces
import graft.dataflow.FlowBuilderFaces.{Errors, Scope}

/** The FlowBuilder's builder-time validation faces
  * (src/builder/flow_builder.rs:283-730) — scope algebra, error
  * vocabulary, Display frames. */
class FlowBuilderFacesSpec extends AnyFunSuite {

  private def root() = FlowBuilderFaces.rootScope()
  private def child(p: Scope, path: String*) =
    FlowBuilderFaces.forEachChildScope(p, path.toSeq)

  test("scope display: [_root] root, ' [path AS name]' chain, '*' " +
      "for the empty field path (analyzer.rs:531-539, spec.rs:52-59)") {
    val r = root()
    assert(r.display === "[_root]")
    val c1 = child(r, "documents")
    assert(c1.display === "[_root] [documents AS documents_1]")
    val c2 = child(c1, "chunks", "items")
    assert(c2.display ===
      "[_root] [documents AS documents_1] [chunks.items AS items_2]")
    assert(child(r).display === "[_root] [* AS _1]")
  }

  test("for-each scope naming: last field + SELF-INCLUSIVE parent " +
      "layer count (flow_builder.rs:388-393)") {
    val r = root()
    assert(FlowBuilderFaces.forEachScopeName(r, Seq("docs")) === "docs_1")
    val c = child(r, "docs")
    assert(FlowBuilderFaces.forEachScopeName(c, Seq("a", "b")) === "b_2")
    assert(FlowBuilderFaces.forEachScopeName(r, Nil) === "_1")
  }

  test("descendant check is reflexive and reference-based " +
      "(analyzer.rs:498-506, :542-546)") {
    val r = root()
    val c = child(r, "f")
    assert(c.isDescendantOf(c) && c.isDescendantOf(r))
    assert(!r.isDescendantOf(c))
    // same shape, different object: NOT the same scope (ptr_eq)
    val c2 = child(r, "f")
    assert(!c.isDescendantOf(c2) && !c2.isDescendantOf(c))
  }

  test("minimum common scope: deepest input wins; exclusive scopes " +
      "and bad target carry the exact messages (:745-776)") {
    val r = root()
    val c = child(r, "docs")
    val g = child(c, "chunks")
    assert(FlowBuilderFaces.minimumCommonScope(Seq(r, c, g), None) ===
      Right(g))
    assert(FlowBuilderFaces.minimumCommonScope(Seq(g, r), None) ===
      Right(g))
    assert(FlowBuilderFaces.minimumCommonScope(Nil, None) ===
      Left("expect at least one input"))
    val other = child(r, "imgs")
    assert(FlowBuilderFaces.minimumCommonScope(Seq(c, other), None) ===
      Left("expect all arguments share the common scope, got " +
        "[_root] [docs AS docs_1] and [_root] [imgs AS imgs_1] " +
        "exclusive to each other"))
    // target at or below the common scope wins
    assert(FlowBuilderFaces.minimumCommonScope(Seq(r, c), Some(g)) ===
      Right(g))
    assert(FlowBuilderFaces.minimumCommonScope(Seq(g), Some(other)) ===
      Left("the field can only be attached to a scope or sub-scope of " +
        "the input value. Target scope: [_root] [imgs AS imgs_1], " +
        "input scope: [_root] [docs AS docs_1] [chunks AS chunks_2]"))
  }

  test("reuse-last-foreach append rule: field path AND scope name " +
      "must match the parent's last op (:784-812)") {
    val ok = FlowBuilderFaces.checkScopeAppend(
      Some((Seq("docs"), "docs_1")), Seq("docs"), "docs_1")
    assert(ok === Right(()))
    assert(FlowBuilderFaces.checkScopeAppend(
      Some((Seq("docs"), "docs_1")), Seq("imgs"), "docs_1") ===
      Left("already out of op scope `docs_1`"))
    assert(FlowBuilderFaces.checkScopeAppend(None, Seq("docs"),
      "docs_1") === Left("already out of op scope `docs_1`"))
  }

  test("generated op names share the .kind.id grammar (:386, :483)") {
    assert(FlowBuilderFaces.generatedOpName("for_each", 0) ===
      ".for_each.0")
    assert(FlowBuilderFaces.generatedOpName("collect", 3) === ".collect.3")
  }

  test("builder error vocabulary, verbatim") {
    assert(Errors.sourceNotRootScope ===
      "source can only be added to the root scope")
    assert(Errors.directOutputNotRoot ===
      "direct output must be value in the root scope")
    assert(Errors.expectFieldPath === "expect field path")
    assert(Errors.exportNotRootCollector ===
      "Export can only work on collectors belonging to the root scope.")
    assert(Errors.flowNameExists("demo") ===
      "flow instance name already exists: demo")
    assert(Errors.expectDirectInput === "expect at least one direct input")
    assert(Errors.expectDirectOutput === "expect direct output")
    assert(Errors.fieldNotFound("text") === "field text not found")
    assert(Errors.fieldAccessLiteral ===
      "field access not supported for literal")
    assert(Errors.expectStructType === "expect struct type in field path")
    assert(Errors.forEachNotCollection(Seq("a", "b")) ===
      "ForEach only works on collection, field a.b is not")
  }

  test("FlowBuilder Display frames (:690-729)") {
    import FlowBuilderFaces.Display
    assert(Display.header("demo") === "Flow instance name: demo\n\n")
    assert(Display.sourceOp("docs", "{}") === "Source op docs\n{}\n")
    assert(Display.directInput("text", "Str") === "Direct input text: Str\n")
    assert(Display.directInputBlockSuffix === "\n")
    assert(Display.reactiveOp(".collect.0", "{}") ===
      "Reactive op .collect.0\n{}\n")
    assert(Display.exportOp("out", "{}") === "Export op out\n{}\n")
    assert(Display.directOutput("f") === "Direct output: f\n\n")
  }
}
