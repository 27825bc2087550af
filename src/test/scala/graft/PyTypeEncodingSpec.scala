package graft

import com.fasterxml.jackson.databind.ObjectMapper
import org.scalatest.funsuite.AnyFunSuite

import graft.types.PyTypeEncoding
import graft.types.PyTypeEncoding._

/** Replays the wave-3 parity fixture (tools/gen_parity_fixtures3.py —
  * the reference's typing.py executed standalone under CPython) case
  * for case through the Scala twin. Tree comparison (ObjectNode
  * equality), so key order can't mask a value mismatch. */
class PyTypeEncodingSpec extends AnyFunSuite {

  private val mapper = new ObjectMapper()
  private val fixture = mapper.readTree(
    getClass.getResourceAsStream("/refparity/py_type_encoding.json"))

  private val chunk = PyStruct(
    "Chunk(start: int, text: str, score: float | None = None)",
    Seq("start" -> PyInt, "text" -> PyStr,
      "score" -> PyUnion(Seq(PyFloat, PyNone))))
  private val row = PyStruct("Row(id: int, v: str)",
    Seq("id" -> PyInt, "v" -> PyStr))

  private val descriptors: Map[String, PyType] = Map(
    "bytes" -> PyBytes, "str" -> PyStr, "bool" -> PyBool, "int" -> PyInt,
    "float" -> PyFloat, "uuid" -> PyUuid, "date" -> PyDate,
    "time" -> PyTime, "local_datetime" -> PyLocalDateTime,
    "datetime" -> PyDatetime, "timedelta" -> PyTimedelta,
    "range" -> PyRange, "json" -> PyJson, "np_int64" -> PyNpInt64,
    "np_float32" -> PyNpFloat32, "np_float64" -> PyNpFloat64,
    "opt_str" -> PyUnion(Seq(PyStr, PyNone)),
    "union_int_str" -> PyUnion(Seq(PyInt, PyStr)),
    "opt_union" -> PyUnion(Seq(PyInt, PyStr, PyNone)),
    "vector_f32_dim3" -> PyVector(PyNpFloat32, Some(3)),
    "vector_f64_nodim" -> PyVector(PyNpFloat64, None),
    "ndarray_f32" -> PyVector(PyNpFloat32, None),
    "list_int" -> PyList(PyInt),
    "seq_int" -> PyList(PyInt),
    "dataclass" -> chunk,
    "namedtuple" -> PyStruct("Pt(x, y)",
      Seq("x" -> PyFloat, "y" -> PyFloat)),
    "list_struct" -> PyList(chunk),
    "dict_str_struct" -> PyDict(PyStr, row, "<class 'str'>"),
    "dict_int_struct" -> PyDict(PyInt, row, "<class 'int'>"),
    "attr_annotated" -> PyAttr(PyStr,
      Seq("cocoindex.io/content_filename" -> "true")),
    "vector_of_struct" -> PyVector(chunk, None),
    "docstring_dataclass" -> PyStruct("A custom docstring.",
      Seq("id" -> PyInt)),
    "float32_alias" -> PyNpFloat32,
    "float64_alias" -> PyNpFloat64,
    "offsetdt_alias" -> PyDatetime,
    "annotated_list_vector" -> PyVector(PyNpFloat32, Some(4)),
    "opt_struct" -> PyUnion(Seq(PyStruct("A custom docstring.",
      Seq("id" -> PyInt)), PyNone)),
    "nested_vec_vec" -> PyVector(PyVector(PyNpFloat32, Some(2)), Some(3)),
    "opt_annotated" -> PyUnion(Seq(PyAttr(PyStr, Seq("k" -> "1")),
      PyNone)),
    "annotated_opt" -> PyAttr(PyUnion(Seq(PyStr, PyNone)),
      Seq("k" -> "1")),
    "field_attrs" -> PyStruct("Attr carrier.",
      Seq("f" -> PyAttr(PyStr, Seq("cocoindex.io/x" -> "1")))),
    "blank_doc" -> PyStruct("", Seq("x" -> PyInt)),
    "err_enum" -> PyUnsupported("<enum 'Color'>"),
    "err_set" -> PyUnsupported("set[int]"),
    "err_any" -> PyUnsupported("typing.Any", bare = true),
    "err_bare_list" -> PyUnsupported("list", bare = true),
    "err_bare_dict" -> PyDict(PyStr, PyUnsupported("typing.Any"),
      "typing.Any"),
    "err_dict_str_str" -> PyDict(PyStr, PyStr, "<class 'str'>"),
    "err_tuple" -> PyUnsupported("tuple[int, str]"),
    "err_literal" -> PyUnsupported("typing.Literal['a', 'b']"),
    "err_none" -> PyUnion(Seq(PyNone)))

  test("every fixture case replays through the twin") {
    val names = scala.collection.mutable.ArrayBuffer.empty[String]
    fixture.fieldNames().forEachRemaining(names += _)
    assert(names.size === 51)
    var checked = 0
    names.foreach { name =>
      val expected = fixture.get(name)
      val desc = descriptors.getOrElse(name,
        fail(s"no descriptor for fixture case $name"))
      if (expected.has("ok")) {
        val got = mapper.readTree(PyTypeEncoding.encode(desc))
        assert(got === expected.get("ok"), s"case $name")
      } else {
        val e = intercept[EncodeError](PyTypeEncoding.encode(desc))
        assert(e.getMessage === expected.get("error").asText, s"case $name")
        assert(expected.get("error_type").asText === "ValueError")
      }
      checked += 1
    }
    assert(checked === 51)
  }

  test("ktable rows prepend _key; nullability stays a field flag") {
    val enc = mapper.readTree(PyTypeEncoding.encode(
      PyDict(PyInt, chunk, "x")))
    val fields = enc.get("type").get("row").get("fields")
    assert(fields.get(0).get("name").asText === "_key")
    assert(fields.get(0).get("type").get("kind").asText === "Int64")
    assert(!fields.get(0).has("nullable"))
    // the nullable dataclass field carries the flag, not a widened type
    assert(fields.get(3).get("name").asText === "score")
    assert(fields.get(3).get("nullable").asBoolean)
    assert(fields.get(3).get("type").get("kind").asText === "Float64")
  }
}
