package graft.dataflow

/** The python-side flow-builder faces (python/cocoindex/flow.py) —
  * the DSL layer's own deterministic laws in front of the engine
  * builder (whose Rust-side algebra is [[FlowBuilderFaces]]): the
  * generated-name law, the spec-kind snake_case prefix rule, the full
  * flow name, the registry duplicate error, the type-guard error
  * vocabulary, the GeneratedField UUID validation, and the
  * transform_flow decorator's parameter checks. Pinned by the wave-9
  * reference-run fixtures (py_flow_faces.json / PyFlowFacesSpec). */
object PyFlowFaces {

  /** _to_snake_case (flow.py:77-81): an underscore BEFORE every
    * non-leading uppercase letter, then lowercase — the naive
    * word-boundary regex, so acronyms explode ("HTTPServer" →
    * "h_t_t_p_server"). Generated op field names use
    * `{snake(specKind)}_` as their prefix (flow.py:123, :505). */
  def toSnakeCase(name: String): String =
    name.replaceAll("(?<!^)(?=[A-Z])", "_")
      .toLowerCase(java.util.Locale.ROOT)

  /** _NameBuilder (flow.py:50-74): explicit names register verbatim;
    * a generated name takes `{prefix}{n}` from a PER-PREFIX counter
    * that never rewinds, skipping names already taken (explicitly
    * registered names collide ACROSS prefixes — the reference's
    * single `_existing_names` set). */
  final class NameBuilder {
    private val existing = scala.collection.mutable.Set.empty[String]
    private val nextIdx = scala.collection.mutable.Map.empty[String, Int]
    def buildName(name: Option[String], prefix: String): String =
      name match {
        case Some(n) => existing += n; n
        case None =>
          var idx = nextIdx.getOrElse(prefix, 0)
          var out = s"$prefix$idx"
          idx += 1
          while (existing.contains(out)) {
            out = s"$prefix$idx"
            idx += 1
          }
          nextIdx(prefix) = idx
          existing += out
          out
      }
  }

  /** get_flow_full_name (flow.py:853-857): namespace-with-dot +
    * name. */
  def fullFlowName(appNamespace: String, name: String): String =
    Naming.appNamespaceWithDelimiter(appNamespace, Some(".")) + name

  /** The DSL's pre-engine error vocabulary, verbatim. */
  object Errors {
    /** open_flow on a taken name (flow.py:866) — note the PYTHON
      * registry's phrasing vs the engine builder's
      * "flow instance name already exists: {name}"
      * ([[FlowBuilderFaces.Errors.flowNameExists]]). */
    def flowExists(name: String): String =
      s"Flow with name $name already exists"
    val transformNotFunction =
      "transform() can only be called on a CocoIndex function"
    val addSourceNotSource =
      "add_source() can only be called on a CocoIndex source"
    val exportNotTarget =
      "export() can only be called on a CocoIndex target storage"
    val transformNoInputs =
      "At least one input is required for transformation"
    val sliceNotInitialized = "Data slice is not initialized"
    val creatorNotInitialized = "Data slice creator is not initialized"
    val alreadyAttached = "DataSlice is already attached to a field"
    val onlyOneUuid = "Only one generated UUID field is allowed"
    def unexpectedGeneratedField(v: String): String =
      s"Unexpected generated field: $v"
    def paramNotByName(paramName: String): String =
      s"Parameter `$paramName` is not a parameter can be passed by name"
    def paramNoValueType(paramName: String, fnRepr: String): String =
      s"Parameter `$paramName` for $fnRepr has no value type " +
        "annotation. Please use `cocoindex.DataSlice[T]` where T is " +
        "the type of the value."
  }

  /** GeneratedField (flow.py:336-341): the one generated field and
    * its wire value. */
  val generatedFields: Seq[(String, String)] = Seq("UUID" -> "Uuid")

  /** DataCollector.collect's generated-field scan (flow.py:361-372):
    * at most one UUID field; any other GeneratedField value is
    * unexpected. Returns the auto-uuid field name if any. */
  def validateGeneratedFields(kwargs: Seq[(String, Option[String])])
      : Either[String, Option[String]] = {
    var autoUuid: Option[String] = None
    for ((k, gen) <- kwargs) gen match {
      case Some("Uuid") =>
        if (autoUuid.isDefined) return Left(Errors.onlyOneUuid)
        autoUuid = Some(k)
      case Some(other) =>
        return Left(Errors.unexpectedGeneratedField(other))
      case None => ()
    }
    Right(autoUuid)
  }
}
