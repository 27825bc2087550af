package graft.dataflow

/** The engine FlowBuilder's builder-time validation and render faces
  * (src/builder/flow_builder.rs:283-730) — the scope algebra and the
  * exact error vocabulary the Python DSL calls hit before analysis.
  * The analyzed semantics behind the builder are already modeled
  * ([[graft.dataflow]] Flow, [[graft.incremental.ExecContext]],
  * [[Naming]]); this object carries the residue: the
  * minimum-common-scope law, the for-each scope naming, the generated
  * op-id grammar, the reuse-last-foreach append rule, and the Display
  * frames. All pure row-level; FlowBuilderFacesSpec pins each string.
  */
object FlowBuilderFaces {

  /** base/spec.rs:39 — the root op scope's name. */
  val rootScopeName = "_root"

  /** FieldPath Display (base/spec.rs:52-59): `*` for the empty path,
    * dot-joined otherwise. */
  def fieldPathDisplay(path: Seq[String]): String =
    if (path.isEmpty) "*" else path.mkString(".")

  /** An op scope (builder/analyzer.rs:463-546). Equality is REFERENCE
    * equality, mirroring the Rust `ptr::eq` impl — two scopes with the
    * same name are distinct unless they are the same object. */
  final class Scope(val name: String,
      val parent: Option[(Scope, Seq[String])]) {

    /** Self-inclusive ancestor chain (analyzer.rs:446-496): root has
      * one ancestor (itself). */
    def ancestors: List[Scope] =
      this :: parent.map(_._1.ancestors).getOrElse(Nil)

    /** is_op_scope_descendant (analyzer.rs:498-506): reflexive. */
    def isDescendantOf(other: Scope): Boolean =
      (this eq other) || parent.exists(_._1.isDescendantOf(other))

    /** OpScope Display (analyzer.rs:531-539): root renders `[_root]`,
      * a child appends ` [{field_path} AS {name}]` to its parent. */
    def display: String = parent match {
      case Some((p, path)) =>
        s"${p.display} [${fieldPathDisplay(path)} AS $name]"
      case None => s"[$name]"
    }
  }

  def rootScope(): Scope = new Scope(rootScopeName, None)

  /** `new_foreach_op_scope`'s child (analyzer.rs:508-529) under the
    * builder's naming (flow_builder.rs:388-393). */
  def forEachChildScope(parent: Scope, fieldPath: Seq[String]): Scope =
    new Scope(forEachScopeName(parent, fieldPath), Some((parent, fieldPath)))

  /** for_each's scope name (flow_builder.rs:388-393):
    * `{last field}_{num parent layers}` where the layer count is the
    * parent's SELF-INCLUSIVE ancestor count (root-scope for-each →
    * `field_1`) and an empty field path contributes an empty name
    * part (`_1`). */
  def forEachScopeName(parent: Scope, fieldPath: Seq[String]): String =
    s"${fieldPath.lastOption.getOrElse("")}_${parent.ancestors.size}"

  /** Generated op names (flow_builder.rs:386, :483): `.for_each.{id}`
    * and `.collect.{id}` share one per-builder counter. */
  def generatedOpName(kind: String, nextGeneratedOpId: Int): String =
    s".$kind.$nextGeneratedOpId"

  /** The builder's error vocabulary, verbatim. */
  object Errors {
    /** add_source with a non-root target scope (flow_builder.rs:295). */
    val sourceNotRootScope = "source can only be added to the root scope"
    /** set_direct_output outside the root scope (:368). */
    val directOutputNotRoot = "direct output must be value in the root scope"
    /** for_each over a constant mapping (:385). */
    val expectFieldPath = "expect field path"
    /** minimum_common_scope with zero inputs (:752). */
    val expectAtLeastOneInput = "expect at least one input"
    /** transform/collect args in exclusive scopes (:757-761). */
    def exclusiveScopes(a: Scope, b: Scope): String =
      s"expect all arguments share the common scope, got ${a.display} " +
        s"and ${b.display} exclusive to each other"
    /** target scope not under the inputs' common scope (:765-770). */
    def targetScopeNotDescendant(target: Scope, input: Scope): String =
      "the field can only be attached to a scope or sub-scope of the " +
        s"input value. Target scope: ${target.display}, input scope: " +
        s"${input.display}"
    /** export over a non-root collector (:558). */
    val exportNotRootCollector =
      "Export can only work on collectors belonging to the root scope."
    /** build_flow name collision (:633-636). */
    def flowNameExists(name: String): String =
      s"flow instance name already exists: $name"
    /** build_transient_flow without inputs / output (:653, :658). */
    val expectDirectInput = "expect at least one direct input"
    val expectDirectOutput = "expect direct output"
    /** scope_field miss (:583-585). */
    def fieldNotFound(fieldName: String): String =
      s"field $fieldName not found"
    /** DataSlice.field on a constant (:144-146). */
    val fieldAccessLiteral = "field access not supported for literal"
    /** DataSlice.field through a non-struct (:125). */
    val expectStructType = "expect struct type in field path"
    /** appending to a closed for-each scope (:802). */
    def alreadyOutOfScope(scopeName: String): String =
      s"already out of op scope `$scopeName`"
    /** for-each over a non-collection field (analyzer.rs:518). */
    def forEachNotCollection(fieldPath: Seq[String]): String =
      s"ForEach only works on collection, field " +
        s"${fieldPathDisplay(fieldPath)} is not"
  }

  /** minimum_common_scope (flow_builder.rs:745-776): the common scope
    * is the DEEPEST input scope, provided every input scope lies on
    * one ancestor chain; a target scope must be at or below that
    * common scope and then wins. */
  def minimumCommonScope(scopes: Seq[Scope],
      targetScope: Option[Scope]): Either[String, Scope] = {
    if (scopes.isEmpty) return Left(Errors.expectAtLeastOneInput)
    var common = scopes.head
    for (s <- scopes.tail) {
      if (s.isDescendantOf(common)) common = s
      else if (!common.isDescendantOf(s))
        return Left(Errors.exclusiveScopes(common, s))
    }
    targetScope match {
      case Some(t) if !t.isDescendantOf(common) =>
        Left(Errors.targetScopeNotDescendant(t, common))
      case Some(t) => Right(t)
      case None => Right(common)
    }
  }

  /** The reuse-last-foreach append rule
    * (flow_builder.rs:784-812): ops append into a child scope only
    * while that scope's for-each is still the LAST reactive op of its
    * parent (matched on both field path and scope name); anything
    * else means the scope was closed by a later op. */
  def checkScopeAppend(parentLastForeach: Option[(Seq[String], String)],
      fieldPath: Seq[String], scopeName: String): Either[String, Unit] =
    parentLastForeach match {
      case Some((fp, n)) if fp == fieldPath && n == scopeName => Right(())
      case _ => Left(Errors.alreadyOutOfScope(scopeName))
    }

  /** FlowBuilder Display frames (flow_builder.rs:690-729): header,
    * per-op blocks around the pretty-printed spec JSON, the direct
    * input/output lines, and the blank line after a non-empty
    * direct-input block. */
  object Display {
    def header(flowInstanceName: String): String =
      s"Flow instance name: $flowInstanceName\n\n"
    def sourceOp(name: String, prettySpecJson: String): String =
      s"Source op $name\n$prettySpecJson\n"
    def directInput(name: String, valueType: String): String =
      s"Direct input $name: $valueType\n"
    val directInputBlockSuffix = "\n"
    def reactiveOp(name: String, prettySpecJson: String): String =
      s"Reactive op $name\n$prettySpecJson\n"
    def exportOp(name: String, prettySpecJson: String): String =
      s"Export op $name\n$prettySpecJson\n"
    def directOutput(valueMapping: String): String =
      s"Direct output: $valueMapping\n\n"
  }
}
