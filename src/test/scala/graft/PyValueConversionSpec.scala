package graft

import com.fasterxml.jackson.databind.{JsonNode, ObjectMapper}
import org.scalatest.funsuite.AnyFunSuite

import graft.types.PyValueConversion
import graft.types.PyValueConversion._

/** Replays the wave-4 parity fixture (convert.py under CPython):
  * every encode case through the twin, and the decoder error
  * vocabulary against the recorded strings. */
class PyValueConversionSpec extends AnyFunSuite {

  private val mapper = new ObjectMapper()
  private val fixture = mapper.readTree(
    getClass.getResourceAsStream("/refparity/py_value_conversion.json"))

  private def toNode(v: PyVal): JsonNode = v match {
    case VInt(i) => mapper.getNodeFactory.numberNode(i)
    case VFloat(d) => mapper.getNodeFactory.numberNode(d)
    case VStr(s) => mapper.getNodeFactory.textNode(s)
    case VBool(b) => mapper.getNodeFactory.booleanNode(b)
    case VNone => mapper.getNodeFactory.nullNode()
    case VBytes(bs) =>
      val o = mapper.createObjectNode()
      val arr = o.putArray("__bytes__")
      bs.foreach(arr.add)
      o
    case VTagged(s, t) =>
      val o = mapper.createObjectNode()
      o.put("__str__", s)
      o.put("type", t)
      o
    case VNdArray(vs, dtype) =>
      val o = mapper.createObjectNode()
      val arr = o.putArray("__ndarray__")
      vs.foreach(arr.add)
      o.put("dtype", dtype)
      o
    case VTuple(items) =>
      val o = mapper.createObjectNode()
      val arr = o.putArray("__tuple__")
      items.foreach(i => arr.add(toNode(i)))
      o
    case VList(items) =>
      val arr = mapper.createArrayNode()
      items.foreach(i => arr.add(toNode(i)))
      arr
    case VDict(entries) =>
      // a passthrough dict (non-struct values); keys must be strings
      val o = mapper.createObjectNode()
      entries.foreach {
        case (VStr(k), value) => o.set[JsonNode](k, toNode(value))
        case (k, _) => fail(s"non-string dict key in passthrough: $k")
      }
      o
    case VStruct(_) =>
      fail("encode() should have flattened structs")
  }

  private val chunk1 = VStruct(Seq(VInt(1), VStr("a"), VNone))
  private val chunk2 = VStruct(Seq(VInt(2), VStr("b"), VNone))

  private val encodeCases: Map[String, PyVal] = Map(
    "int" -> VInt(5),
    "str" -> VStr("x"),
    "float" -> VFloat(2.5),
    "bool" -> VBool(true),
    "none" -> VNone,
    "bytes" -> VBytes(Seq(104, 105)),
    "uuid" -> VTagged("12345678-1234-5678-1234-567812345678", "UUID"),
    "date" -> VTagged("2024-03-07", "date"),
    "time" -> VTagged("01:02:03", "time"),
    "timedelta" -> VTagged("1 day, 0:00:02", "timedelta"),
    "dataclass" -> chunk1,
    "dataclass_default" -> VStruct(Seq(VInt(1), VStr("a"), VFloat(0.5))),
    "namedtuple" -> VStruct(Seq(VFloat(1.0), VFloat(2.0))),
    "ltable" -> VList(Seq(chunk1, chunk2)),
    "ktable" -> VDict(Seq(VStr("k1") -> chunk1, VStr("k2") -> chunk2)),
    "ktable_tuplekey" -> VDict(Seq(
      VTuple(Seq(VStr("a"), VInt(1))) ->
        VStruct(Seq(VInt(1), VStr("x"), VNone)))),
    "list_int" -> VList(Seq(VInt(1), VInt(2), VInt(3))),
    "ndarray_f32" -> VNdArray(Seq(1.0, 2.0), "float32"),
    "nested_list" -> VList(Seq(VList(Seq(chunk1)), VList(Nil))),
    "np_scalar" -> VInt(9),
    // review r14 #4-2/#4-3: non-struct dicts pass through (empty dict
    // included); tuples become lists everywhere
    "plain_dict" -> VDict(Seq(VStr("a") -> VInt(1))),
    "empty_dict" -> VDict(Nil),
    "tuple" -> VTuple(Seq(VInt(1), VInt(2))),
    "nested_tuple" -> VList(Seq(VTuple(Seq(VInt(1), VInt(2))))))

  test("every encode fixture case replays through the twin") {
    val enc = fixture.get("encode")
    val names = scala.collection.mutable.ArrayBuffer.empty[String]
    enc.fieldNames().forEachRemaining(names += _)
    assert(names.size === 24)
    names.foreach { name =>
      val expected = enc.get(name).get("ok")
      val desc = encodeCases.getOrElse(name,
        fail(s"no descriptor for encode case $name"))
      // string-compare: Jackson's IntNode/LongNode inequality would
      // otherwise flag equal values
      assert(mapper.writeValueAsString(
        toNode(PyValueConversion.encode(desc))) ===
        mapper.writeValueAsString(expected), s"case $name")
    }
  }

  test("decode faces replay the recorded success arms") {
    val ok = fixture.get("decode_ok")
    val names = Seq("start", "text")
    // struct: positional row → named fields
    val struct = decodeStructRow(Seq(VInt(5), VStr("hello")), names)
    assert(struct.map { case (n, VInt(i)) => n -> i.toString
      case (n, VStr(s)) => n -> s }.toMap ===
      Map("start" -> "5", "text" -> "hello"))
    assert(ok.get("struct").get("start").asLong === 5)
    assert(ok.get("struct").get("text").asText === "hello")
    // ltable keeps order
    val lt = decodeLTable(Seq(Seq(VInt(1), VStr("a")),
      Seq(VInt(2), VStr("b"))), names)
    assert(lt.map(_.head._2) === Seq(VInt(1), VInt(2)))
    assert(ok.get("ltable").get(0).get("text").asText === "a")
    assert(ok.get("ltable").get(1).get("text").asText === "b")
    // ktable: key first, rest named
    val kt = decodeKTable(Seq(Seq(VStr("k"), VInt(5), VStr("x")),
      Seq(VStr("j"), VInt(1), VStr("y"))), names)
    assert(kt.toMap.apply(VStr("k")) ===
      Seq("start" -> VInt(5), "text" -> VStr("x")))
    assert(ok.get("ktable").get("k").get("start").asLong === 5)
    assert(ok.get("ktable").get("j").get("text").asText === "y")
    // vector decodes to the dtype'd ndarray
    assert(decodeVector(Seq(1.0, 2.0), "float32") ===
      VNdArray(Seq(1.0, 2.0), "float32"))
    assert(ok.get("vector").get("dtype").asText === "float32")
    assert(ok.get("vector").get("__ndarray__").size === 2)
  }

  test("decoder error vocabulary matches the recorded strings") {
    val errs = fixture.get("decode_errors")
    assert(errs.get("null_nonnull_vector").get("error").asText ===
      nullNonNullVector("$root"))
    assert(errs.get("vector_dim_mismatch").get("error").asText ===
      vectorDimMismatch("$root", 3, 2))
    assert(errs.get("struct_for_scalar").get("error").asText ===
      structExpected("$root", "<class 'int'>"))
    assert(errs.get("ltable_needs_list").get("error").asText ===
      listTypeExpected(childPath("$root", "[*]"), "<class 'int'>"))
    val types = scala.collection.mutable.ArrayBuffer.empty[String]
    errs.fieldNames().forEachRemaining(n =>
      types += errs.get(n).get("error_type").asText)
    assert(types.forall(_ == "ValueError"))
  }
}
