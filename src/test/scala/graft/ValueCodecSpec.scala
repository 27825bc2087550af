package graft

import org.scalatest.funsuite.AnyFunSuite

import graft.incremental.EvaluateDump._
import graft.operators.JsonSchemaBuild._
import graft.types.ValueCodec
import graft.types.ValueCodec.{DecodeError, KTable}

/** The decode side of the §1.1 codec (value.rs from_json ladders),
  * paired with EvaluateDump's serialize direction. */
class ValueCodecSpec extends AnyFunSuite {

  private def dec(json: String, t: EType) = ValueCodec.decodeJson(json, t)
  private def err(json: String, t: EType): String =
    intercept[DecodeError](ValueCodec.decodeJson(json, t)).getMessage

  test("scalar decodes and their canonical shapes") {
    assert(dec("\"SGVsbG8=\"", TBytes) === YStr("SGVsbG8="))
    assert(dec("\"hi\"", TStr) === YStr("hi"))
    assert(dec("true", TBool) === YBool(true))
    assert(dec("42", TInt64) === YInt(42))
    assert(dec("2.5", TFloat64) === YReal("2.5"))
    assert(dec("[3,9]", TRange) === YArr(Seq(YReal("3"), YReal("9"))))
    assert(dec("\"ABCDEF00-0000-4000-8000-000000000001\"", TUuid) ===
      YStr("abcdef00-0000-4000-8000-000000000001"))
    assert(dec("\"2024-03-07\"", TDate) === YStr("2024-03-07"))
    assert(dec("\"01:02:03.5\"", TTime) === YStr("01:02:03.500"))
    assert(dec("\"2024-03-07T01:02:03\"", TLocalDateTime) ===
      YStr("2024-03-07T01:02:03.000000"))
    // a float can't be an int64 — the serde as_i64 error with the
    // Number's display text
    assert(err("5.5", TInt64) === "invalid int64 value 5.5")
    assert(err("5.0", TInt64) === "invalid int64 value 5.0")
    // json null decodes Null under any type
    assert(dec("null", TInt64) === YNull)
  }

  test("offset datetimes: rfc3339, then naive-assume-UTC fallback") {
    assert(dec("\"2024-03-07T01:02:03Z\"", TOffsetDateTime) ===
      YStr("2024-03-07T01:02:03Z"))
    assert(dec("\"2024-03-07T01:02:03+01:00\"", TOffsetDateTime) ===
      YStr("2024-03-07T01:02:03+01:00"))
    // naive input assumes UTC (value.rs:1060-1071)
    assert(dec("\"2024-03-07T01:02:03\"", TOffsetDateTime) ===
      YStr("2024-03-07T01:02:03Z"))
  }

  test("time deltas decode through both duration grammars") {
    assert(dec("\"PT1.5S\"", TTimeDelta) === YStr("PT1.500S"))
    assert(dec("\"1 day 2 hours\"", TTimeDelta) === YStr("P1DT7200S"))
    assert(dec("\"P1D\"", TTimeDelta) === YStr("P1D"))
  }

  test("json passthrough keeps its own key order (preserve_order)") {
    assert(dec("""{"z":1,"a":2}""", TJson) ===
      YHash(Seq("z" -> YInt(1), "a" -> YInt(2))))
    assert(dec("""[1,"x",2.5]""", TJson) ===
      YArr(Seq(YInt(1), YStr("x"), YReal("2.5"))))
  }

  test("unions: tuple decode, bad-tag panic, out-of-range tag") {
    val u = TUnion(Seq(TStr, TInt64))
    assert(dec("""[0,"s"]""", u) === YStr("s"))
    assert(dec("""[1,7]""", u) === YInt(7))
    assert(err("""{"tag":0}""", u) ===
      "Invalid JSON value for union, expect array")
    assert(err("""[0,"s",9]""", u) ===
      "Invalid union tuple: expect 2 values, received 3")
    assert(err("""[5,"s"]""", u) === """No type in `tag_id` "5" found""")
    // the reference's bare unwrap on a non-number tag — a LIVE PANIC
    val panic = intercept[IllegalStateException](
      ValueCodec.decodeJson("""["str",7]""", u))
    assert(panic.getMessage ===
      "called `Option::unwrap()` on a `None` value")
  }

  test("structs: positional arity, object defaults, nullability") {
    val s = TStruct(Seq(EField("id", TInt64),
      EField("note", TStr, nullable = true)))
    assert(dec("""[5,"x"]""", s) ===
      YHash(Seq("id" -> YInt(5), "note" -> YStr("x"))))
    // objects fill missing fields with Null — legal only when nullable
    assert(dec("""{"id":5}""", s) ===
      YHash(Seq("id" -> YInt(5), "note" -> YNull)))
    assert(err("""{"note":"x"}""", s) ===
      "expected non-null value for `id`")
    assert(err("""[5]""", s) === "unmatched value length")
    assert(err(""""nope"""", s) === "invalid value type")
  }

  test("ktables sort by key with last-wins duplicates; utable " +
    "decodes as an ordered list") {
    val row = TStruct(Seq(EField("id", TInt64), EField("v", TStr)))
    val t = TTable(row)
    val sorted = ValueCodec.decodeJson(
      """[[3,"c"],[1,"a-old"],[2,"b"],[1,"a-new"]]""", t, KTable)
    assert(sorted === YArr(Seq(
      YHash(Seq("id" -> YInt(1), "v" -> YStr("a-new"))),
      YHash(Seq("id" -> YInt(2), "v" -> YStr("b"))),
      YHash(Seq("id" -> YInt(3), "v" -> YStr("c"))))))
    // object rows take the key by field name; a missing key errors
    val objRows = ValueCodec.decodeJson(
      """[{"id":2,"v":"b"},{"id":1,"v":"a"}]""", t, KTable)
    assert(objRows === YArr(Seq(
      YHash(Seq("id" -> YInt(1), "v" -> YStr("a"))),
      YHash(Seq("id" -> YInt(2), "v" -> YStr("b"))))))
    val e = intercept[DecodeError](ValueCodec.decodeJson(
      """[{"v":"b"}]""", t, KTable))
    assert(e.getMessage === "key field `id` doesn't exist in value")
    val e2 = intercept[DecodeError](ValueCodec.decodeJson(
      """["x"]""", t, KTable))
    assert(e2.getMessage === "Table value must be a JSON array or object")
    // UTable/LTable keep row order
    assert(ValueCodec.decodeJson("""[[2,"b"],[1,"a"]]""", t,
      ValueCodec.UTable) === YArr(Seq(
      YHash(Seq("id" -> YInt(2), "v" -> YStr("b"))),
      YHash(Seq("id" -> YInt(1), "v" -> YStr("a"))))))
  }

  test("decode∘serialize round-trip on the typed shapes") {
    // a struct's typed serialization (field-name hash) decodes back
    // to the identical Yml tree
    val s = TStruct(Seq(EField("id", TInt64), EField("vec",
      TVector(TFloat32, Some(2))), EField("when", TDate)))
    val value = YHash(Seq("id" -> YInt(7),
      "vec" -> YArr(Seq(YReal("0.5"), YReal("1.5"))),
      "when" -> YStr("2024-03-07")))
    // serialize via the dump emitter's JSON twin: build the JSON by
    // hand in the same shape and decode
    val json = """{"id":7,"vec":[0.5,1.5],"when":"2024-03-07"}"""
    assert(ValueCodec.decodeJson(json, s) === value)
  }
}
