package graft.types

import com.fasterxml.jackson.databind.ObjectMapper
import com.fasterxml.jackson.databind.node.ObjectNode

/** The Python-side type encoding (python/cocoindex/typing.py
  * `analyze_type_info` + `encode_enriched_type`) — how a flow
  * author's annotations become the engine's JSON type tree. The
  * SURVEY §1.3 mapping as executable rules, replayed against fixtures
  * recorded from the reference module itself
  * (tools/gen_parity_fixtures3.py → refparity/py_type_encoding.json):
  *
  *  - scalars map per the §1.1 table (`int`→Int64 — the only int
  *    width — `float`→Float64, numpy scalars to their widths,
  *    `datetime.datetime`→OffsetDateTime with the `LocalDateTime`
  *    annotation alias for naive);
  *  - `T | None` marks `nullable` rather than widening the type; a
  *    multi-variant union drops None variants into that flag;
  *  - `Vector[dtype, Literal[n]]` / NDArray carry element type and
  *    optional dimension; a bare `list[basic]`/`Sequence[basic]` is a
  *    dimensionless Vector;
  *  - `list[dataclass]` is an LTable, `dict[K, dataclass]` a KTable
  *    whose row PREPENDS the `_key` field (KEY_FIELD_NAME); a
  *    non-struct dict value is the KTable error;
  *  - dataclasses/NamedTuples become Structs with the auto-generated
  *    signature as `description`; `TypeAttr` annotations ride an
  *    `attrs` map;
  *  - everything else is the "Unsupported type annotation: {repr}" /
  *    "Specific type annotation is expected" error vocabulary
  *    (python reprs ride the descriptor as data).
  */
object PyTypeEncoding {

  val KeyFieldName = "_key" // typing.py KEY_FIELD_NAME

  /** A Python annotation, as the encoder sees it. */
  sealed trait PyType
  case object PyBytes extends PyType
  case object PyStr extends PyType
  case object PyBool extends PyType
  case object PyInt extends PyType
  case object PyFloat extends PyType
  case object PyUuid extends PyType
  case object PyDate extends PyType
  case object PyTime extends PyType
  case object PyLocalDateTime extends PyType
  case object PyDatetime extends PyType
  case object PyTimedelta extends PyType
  case object PyRange extends PyType
  case object PyJson extends PyType
  case object PyNpInt64 extends PyType
  case object PyNpFloat32 extends PyType
  case object PyNpFloat64 extends PyType
  case object PyNone extends PyType
  /** `A | B | ...` as written, None variants included. */
  final case class PyUnion(variants: Seq[PyType]) extends PyType
  /** Vector[...]/NDArray annotations. */
  final case class PyVector(elem: PyType, dim: Option[Int]) extends PyType
  /** list[T] / Sequence[T]. */
  final case class PyList(elem: PyType) extends PyType
  /** dict[K, V]; `valueRepr` renders the error for non-struct V. */
  final case class PyDict(key: PyType, value: PyType, valueRepr: String)
      extends PyType
  /** dataclass / NamedTuple with its auto-generated signature doc. */
  final case class PyStruct(description: String,
      fields: Seq[(String, PyType)]) extends PyType
  /** Annotated[T, TypeAttr(name, value)] — value is raw JSON text. */
  final case class PyAttr(inner: PyType, attrs: Seq[(String, String)])
      extends PyType
  /** Anything the encoder rejects, with its Python repr. */
  final case class PyUnsupported(repr: String, bare: Boolean = false)
      extends PyType

  final class EncodeError(msg: String) extends IllegalArgumentException(msg)
  private def fail(msg: String): Nothing = throw new EncodeError(msg)

  private val mapper = new ObjectMapper()

  private def basicKind(t: PyType): Option[String] = t match {
    case PyBytes => Some("Bytes")
    case PyStr => Some("Str")
    case PyBool => Some("Bool")
    case PyInt | PyNpInt64 => Some("Int64")
    case PyFloat | PyNpFloat64 => Some("Float64")
    case PyNpFloat32 => Some("Float32")
    case PyUuid => Some("Uuid")
    case PyDate => Some("Date")
    case PyTime => Some("Time")
    case PyLocalDateTime => Some("LocalDateTime")
    case PyDatetime => Some("OffsetDateTime")
    case PyTimedelta => Some("TimeDelta")
    case PyRange => Some("Range")
    case PyJson => Some("Json")
    case _ => None
  }

  private def isStruct(t: PyType): Boolean = t.isInstanceOf[PyStruct]

  /** encode_enriched_type: `{"type": ..., "nullable"?: true,
    * "attrs"?: {...}}`. */
  def encode(t: PyType): String = {
    val root = mapper.createObjectNode()
    val (inner, nullable, attrs) = split(t)
    root.set[ObjectNode]("type", encodeType(inner))
    if (nullable) root.put("nullable", true)
    if (attrs.nonEmpty) {
      val a = root.putObject("attrs")
      attrs.foreach { case (k, v) =>
        a.set[com.fasterxml.jackson.databind.JsonNode](k,
          mapper.readTree(v))
      }
    }
    mapper.writeValueAsString(root)
  }

  /** Strip Optional/attrs wrappers: (core type, nullable, attrs).
    * Two reference quirks carried (review r14 #4-1/#4-5, verified
    * against typing.py under CPython): `Optional[Annotated[T, a]]`
    * KEEPS the attrs (the single surviving variant re-analyzes), but
    * `Annotated[T | None, a]` DROPS them — analyze_type_info's union
    * branch early-returns without merging the outer Annotated. */
  private def split(t: PyType)
      : (PyType, Boolean, Seq[(String, String)]) = t match {
    case PyAttr(inner, attrs) =>
      val (core, n, innerAttrs) = split(inner)
      inner match {
        case _: PyUnion => (core, n, innerAttrs) // outer attrs dropped
        case _ => (core, n, attrs ++ innerAttrs)
      }
    case PyUnion(variants) =>
      val nonNone = variants.filterNot(_ == PyNone)
      val nullable = nonNone.size != variants.size
      nonNone match {
        case Seq() => fail("Unsupported type annotation: <class 'NoneType'>")
        case Seq(one) =>
          val (core, n2, innerAttrs) = split(one)
          (core, nullable || n2, innerAttrs)
        case many => (PyUnion(many), nullable, Nil)
      }
    case other => (other, false, Nil)
  }

  private def encodeType(t: PyType): ObjectNode = t match {
    case PyUnion(variants) =>
      val n = mapper.createObjectNode()
      n.put("kind", "Union")
      val arr = n.putArray("types")
      // an Annotated member strips to its core inside a union variant
      variants.foreach {
        case PyAttr(inner, _) => arr.add(encodeType(inner))
        case v => arr.add(encodeType(v))
      }
      n
    case PyAttr(inner, _) => encodeType(inner)
    case PyVector(elem, dim) =>
      if (isStruct(elem)) fail("LTable type must not have a vector info")
      val n = mapper.createObjectNode()
      n.put("kind", "Vector")
      n.set[ObjectNode]("element_type", encodeType(elem))
      dim match {
        case Some(d) => n.put("dimension", d)
        case None => n.putNull("dimension")
      }
      n
    case PyList(elem) => elem match {
      case s: PyStruct =>
        val n = mapper.createObjectNode()
        n.put("kind", "LTable")
        n.set[ObjectNode]("row", structRow(s, keyed = None))
        n
      case basic =>
        // list[basic] / Sequence[basic] = dimensionless Vector
        encodeType(PyVector(basic, None))
    }
    case PyDict(key, value, valueRepr) => value match {
      case s: PyStruct =>
        val n = mapper.createObjectNode()
        n.put("kind", "KTable")
        n.set[ObjectNode]("row", structRow(s, keyed = Some(key)))
        n
      case _ =>
        fail(s"KTable value must have a Struct type, got $valueRepr")
    }
    case s: PyStruct =>
      val n = structRow(s, keyed = None)
      n.put("kind", "Struct")
      n
    case PyUnsupported(_, true) =>
      fail("Specific type annotation is expected")
    case PyUnsupported(repr, _) =>
      fail(s"Unsupported type annotation: $repr")
    case basic => basicKind(basic) match {
      case Some(kind) =>
        val n = mapper.createObjectNode()
        n.put("kind", kind)
        n
      case None => fail(s"Unsupported type annotation: $basic")
    }
  }

  /** The struct row shape: fields (each `{"type":…, "nullable"?:…,
    * "name":…}`), then the signature description; a KTable prepends
    * the `_key` field from the dict's key type. */
  private def structRow(s: PyStruct, keyed: Option[PyType]): ObjectNode = {
    val n = mapper.createObjectNode()
    val fields = n.putArray("fields")
    keyed.foreach { keyType =>
      val f = fields.addObject()
      f.set[ObjectNode]("type", encodeType(keyType))
      f.put("name", KeyFieldName)
    }
    s.fields.foreach { case (name, typ) =>
      val f = fields.addObject()
      val (core, nullable, attrs) = split(typ)
      f.set[ObjectNode]("type", encodeType(core))
      // fields carry their attrs (review r14 #4-4)
      if (attrs.nonEmpty) {
        val a = f.putObject("attrs")
        attrs.foreach { case (k, v) =>
          a.set[com.fasterxml.jackson.databind.JsonNode](k,
            mapper.readTree(v))
        }
      }
      if (nullable) f.put("nullable", true)
      f.put("name", name)
    }
    // inspect.getdoc falsy → the key is omitted (review r14 #4-8)
    if (s.description.nonEmpty) n.put("description", s.description)
    n
  }
}
