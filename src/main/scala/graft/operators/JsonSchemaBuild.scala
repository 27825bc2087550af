package graft.operators

import com.fasterxml.jackson.databind.ObjectMapper
import com.fasterxml.jackson.databind.node.ObjectNode

import graft.operators.ProviderWires.JsonSchemaOptions

/** The engine's output-schema builder (src/base/json_schema.rs:1-354):
  * `build_json_schema(value_type, options)` renders the JSON schema a
  * provider's constrained decode receives, per that provider's
  * [[JsonSchemaOptions]] — the exact per-type instance types, the
  * builtin format strings and descriptions, null-widened types under
  * `fields_always_required`, the `oneOf` union shape, the
  * additionalProperties:false closure, and the top-level `value`
  * object wrapper for non-struct outputs.
  *
  * Serialization fidelity: schemars' SchemaObject streams its
  * serde-flattened fields in declaration order — description (from
  * the metadata flatten) first, then `type`, `format`, `oneOf`,
  * (`items`, `maxItems`, `minItems`), (`required`, `properties`,
  * `additionalProperties`) — while `properties` and `required`
  * themselves are BTreeMap/BTreeSet-SORTED (schemars 0.8 without
  * preserve_order). The builder emits exactly that order, so
  * OllamaWire can embed the text verbatim (Ollama's derive-serialized
  * request streams the schema as-is) and AnthropicWire's
  * serde_json::to_value sort reorders it the same way the engine
  * does.
  *
  * With `extract_descriptions` (Ollama), descriptions divert into the
  * extra-instructions block in TRAVERSAL (insertion) order —
  * json_schema.rs:266-286's IndexMap — instead of the schema.
  */
object JsonSchemaBuild {

  /** The engine type tree (schema.rs §1.1) as the builder consumes
    * it. Descriptions live on structs (StructSchema.description). */
  sealed trait EType
  case object TStr extends EType
  case object TBytes extends EType
  case object TBool extends EType
  case object TInt64 extends EType
  case object TFloat32 extends EType
  case object TFloat64 extends EType
  case object TRange extends EType
  case object TUuid extends EType
  case object TDate extends EType
  case object TTime extends EType
  case object TLocalDateTime extends EType
  case object TOffsetDateTime extends EType
  case object TTimeDelta extends EType
  case object TJson extends EType
  final case class TVector(elem: EType, dim: Option[Int]) extends EType
  final case class TUnion(types: Seq[EType]) extends EType
  final case class TStruct(fields: Seq[EField],
      description: Option[String] = None) extends EType
  /** `kind` ∈ UTable/KTable/LTable — the schema builder is kind-blind
    * (every table renders as an array) but the value codec decodes per
    * kind (value.rs from_json matches on s.kind). */
  final case class TTable(row: TStruct, kind: String = "LTable")
      extends EType

  final case class EField(name: String, typ: EType,
      nullable: Boolean = false)

  /** build_json_schema's output: the schema text, the diverted
    * instructions, and the wrapper field the extractor must unwrap. */
  final case class BuildOutput(schemaJson: String,
      extraInstructions: Option[String], wrapperField: Option[String])

  private val mapper = new ObjectMapper()

  /** json_schema.rs:320-354: wrap a non-struct top level in a
    * single-field `value` object when the provider demands an object
    * root (Anthropic; OpenAI's strict mode). The wrapper field CLONES
    * the enriched type including its nullability (json_schema.rs:
    * 329-335; review r14 #2-5) — a nullable top level drops out of
    * `required` or null-widens per the provider's options. */
  def build(valueType: EType, options: JsonSchemaOptions,
      topLevelNullable: Boolean = false): BuildOutput = {
    val b = new Builder(options)
    val (schema, wrapper) = valueType match {
      case _: TStruct => (b.forType(valueType, Nil), None)
      case other if options.topLevelMustBeObject =>
        (b.forType(TStruct(Seq(
          EField("value", other, nullable = topLevelNullable))), Nil),
          Some("value"))
      case other => (b.forType(other, Nil), None)
    }
    BuildOutput(mapper.writeValueAsString(schema), b.extraInstructions,
      wrapper)
  }

  /** ValueExtractor's wrapper arm (json_schema.rs:295-311): unwrap
    * the `value` field (absent → JSON null); a non-object payload
    * under a wrapper is the reference's error. Typed decoding past
    * this point is the §1.1 codec's job. */
  def unwrap(json: String, wrapperField: Option[String]): String =
    wrapperField match {
      case None => json
      case Some(f) =>
        val root = mapper.readTree(json)
        if (!root.isObject)
          throw new IllegalStateException(s"Field `$f` not found")
        val v = root.get(f)
        if (v == null) "null" else mapper.writeValueAsString(v)
    }

  private final class Builder(options: JsonSchemaOptions) {
    private val extra =
      scala.collection.mutable.LinkedHashMap.empty[String, String]

    def extraInstructions: Option[String] =
      if (extra.isEmpty) None
      else Some("Instructions for specific fields:\n\n" +
        extra.map { case (path, instr) =>
          val label = if (path.isEmpty) "(root object)" else path
          s"- $label: $instr\n\n"
        }.mkString)

    /** set_description (json_schema.rs:39-53): divert to the
      * instructions block, or set in-schema. `path` is root-first. */
    private def describe(node: ObjectNode, description: String,
        path: List[String]): Unit =
      if (options.extractDescriptions)
        extra(path.mkString(".")) = description
      else node.put("description", description)

    private def typed(node: ObjectNode, t: String): Unit =
      node.put("type", t)

    def forType(typ: EType, path: List[String]): ObjectNode = {
      val n = mapper.createObjectNode()
      typ match {
        case TStr | TBytes => typed(n, "string")
        case TBool => typed(n, "boolean")
        case TInt64 => typed(n, "integer")
        case TFloat32 | TFloat64 => typed(n, "number")
        case TRange =>
          describe(n, "A range represented by a list of two positions, " +
            "start pos (inclusive), end pos (exclusive).", path)
          typed(n, "array")
          val items = mapper.createObjectNode()
          items.put("type", "integer")
          n.set[ObjectNode]("items", items)
          n.put("maxItems", 2)
          n.put("minItems", 2)
        case TUuid =>
          describe(n, "A UUID, e.g. 123e4567-e89b-12d3-a456-426614174000",
            path)
          typed(n, "string")
          if (options.supportsFormat) n.put("format", "uuid")
        case TDate =>
          describe(n, "A date in YYYY-MM-DD format, e.g. 2025-03-27", path)
          typed(n, "string")
          if (options.supportsFormat) n.put("format", "date")
        case TTime =>
          describe(n, "A time in HH:MM:SS format, e.g. 13:32:12", path)
          typed(n, "string")
          if (options.supportsFormat) n.put("format", "time")
        case TLocalDateTime =>
          describe(n, "Date time without timezone offset in " +
            "YYYY-MM-DDTHH:MM:SS format, e.g. 2025-03-27T13:32:12", path)
          typed(n, "string")
          if (options.supportsFormat) n.put("format", "date-time")
        case TOffsetDateTime =>
          describe(n, "Date time with timezone offset in RFC3339, e.g. " +
            "2025-03-27T13:32:12Z, 2025-03-27T07:32:12.313-06:00", path)
          typed(n, "string")
          if (options.supportsFormat) n.put("format", "date-time")
        case TTimeDelta =>
          describe(n, "A duration, e.g. 'PT1H2M3S' (ISO 8601) or " +
            "'1 day 2 hours 3 seconds'", path)
          typed(n, "string")
          if (options.supportsFormat) n.put("format", "duration")
        case TJson => // any value — no constraints (json_schema.rs:165-167)
        case TVector(elem, dim) =>
          typed(n, "array")
          n.set[ObjectNode]("items", forType(elem, path))
          dim.foreach { d => n.put("maxItems", d); n.put("minItems", d) }
        case TUnion(types) =>
          val arr = n.putArray("oneOf")
          types.foreach(t => arr.add(forType(t, path)))
        case s: TStruct => forStruct(n, s, path)
        case TTable(row, _) =>
          typed(n, "array")
          val items = mapper.createObjectNode()
          forStruct(items, row, path)
          n.set[ObjectNode]("items", items)
      }
      n
    }

    /** for_struct_schema (json_schema.rs:195-235): properties and
      * required BOTH sort (BTreeMap/BTreeSet); nullable fields under
      * fields_always_required widen to ["type","null"] and join
      * required; additionalProperties always false. The serialized
      * order is required → properties → additionalProperties
      * (ObjectValidation's declaration order). */
    private def forStruct(n: ObjectNode, s: TStruct,
        path: List[String]): Unit = {
      s.description.foreach(describe(n, _, path))
      typed(n, "object")
      val required = s.fields
        .filter(f => options.fieldsAlwaysRequired || !f.nullable)
        .map(_.name).sorted
      if (required.nonEmpty) {
        val arr = n.putArray("required")
        required.foreach(arr.add)
      }
      // traverse in DECLARATION order (drives the extracted-
      // instructions insertion order), then emit properties sorted
      // (the BTreeMap)
      val built = s.fields.map { f =>
        val fs = forType(f.typ, path :+ f.name)
        if (options.fieldsAlwaysRequired && f.nullable && fs.has("type")) {
          val t = fs.get("type").asText
          val arr = mapper.createArrayNode()
          arr.add(t)
          arr.add("null")
          fs.set[ObjectNode]("type", arr)
        }
        f.name -> fs
      }
      val props = n.putObject("properties")
      built.sortBy(_._1).foreach { case (name, fs) =>
        props.set[ObjectNode](name, fs)
      }
      n.put("additionalProperties", false)
    }
  }
}
