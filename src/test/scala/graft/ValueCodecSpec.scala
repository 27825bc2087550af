package graft

import org.scalatest.funsuite.AnyFunSuite

import graft.incremental.EvaluateDump._
import graft.operators.JsonSchemaBuild._
import graft.types.ValueCodec
import graft.types.ValueCodec.DecodeError

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

  test("bytes: base64 0.22 STANDARD strictness (review r14 #3-8)") {
    // canonical padding is REQUIRED
    assert(err("\"SGVsbG8\"", TBytes) === "Invalid padding")
    // illegal characters carry the crate's symbol/offset error
    assert(err("\"SG!sbG8=\"", TBytes) === "Invalid symbol 33, offset 2.")
    // nothing may follow padding
    assert(err("\"SG==a b=\"", TBytes) === "Invalid symbol 97, offset 4.")
  }

  test("uuid: all four parse_str forms canonicalize (review r14 #3-6)") {
    val canon = "67e55044-10b1-426f-9247-bb680e5fe0c8"
    assert(dec("\"67E55044-10B1-426F-9247-BB680E5FE0C8\"", TUuid) ===
      YStr(canon))
    assert(dec("\"67e5504410b1426f9247bb680e5fe0c8\"", TUuid) ===
      YStr(canon))
    assert(dec("\"{67e55044-10b1-426f-9247-bb680e5fe0c8}\"", TUuid) ===
      YStr(canon))
    assert(dec("\"urn:uuid:67e55044-10b1-426f-9247-bb680e5fe0c8\"",
      TUuid) === YStr(canon))
    intercept[DecodeError](dec("\"not-a-uuid\"", TUuid))
  }

  test("temporal strictness: chrono requires seconds; failures are " +
    "DecodeErrors (review r14 #3-4/#3-5)") {
    assert(err("\"01:02\"", TTime) === "invalid time: 01:02")
    assert(err("\"2024-03-07T01:02\"", TLocalDateTime) ===
      "invalid datetime: 2024-03-07T01:02")
    intercept[DecodeError](dec("\"not-a-date\"", TDate))
    intercept[DecodeError](dec("\"2024-13-40\"", TDate))
    // the offset fallback re-raises a decode error on garbage
    assert(err("\"garbage\"", TOffsetDateTime) ===
      "invalid RFC 3339 datetime: garbage")
    assert(err("\"2024-03-07T01:02\"", TOffsetDateTime) ===
      "invalid RFC 3339 datetime: 2024-03-07T01:02")
  }

  test("range endpoints are usize (review r14 #3-7)") {
    assert(err("[-1,5]", TRange) ===
      "invalid value: integer `-1`, expected usize")
    assert(err("[0,-5]", TRange) ===
      "invalid value: integer `-5`, expected usize")
    assert(dec("[0,0]", TRange) === YArr(Seq(YReal("0"), YReal("0"))))
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

  test("unions: tuple decode, full u64 tags, bad-tag panic") {
    val u = TUnion(Seq(TStr, TInt64))
    assert(dec("""[0,"s"]""", u) === YStr("s"))
    assert(dec("""[1,7]""", u) === YInt(7))
    assert(err("""{"tag":0}""", u) ===
      "Invalid JSON value for union, expect array")
    assert(err("""[0,"s",9]""", u) ===
      "Invalid union tuple: expect 2 values, received 3")
    assert(err("""[5,"s"]""", u) === """No type in `tag_id` "5" found""")
    // u64-range tags do NOT wrap to 32 bits (review r14 #3-1): both
    // 2^31 and 2^32 are simply out of range
    assert(err("""[2147483648,"s"]""", u) ===
      """No type in `tag_id` "2147483648" found""")
    assert(err("""[4294967296,"s"]""", u) ===
      """No type in `tag_id` "4294967296" found""")
    assert(err("""[18446744073709551615,"s"]""", u) ===
      """No type in `tag_id` "18446744073709551615" found""")
    // the reference's bare unwrap on a non-u64 tag — a LIVE PANIC
    // (negative and beyond-u64 included)
    for (bad <- Seq("""["str",7]""", """[-1,7]""",
      """[18446744073709551616,7]""")) {
      val panic = intercept[IllegalStateException](
        ValueCodec.decodeJson(bad, u))
      assert(panic.getMessage ===
        "called `Option::unwrap()` on a `None` value")
    }
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

  test("ktables sort by key with last-wins duplicates; short rows " +
    "zip-truncate; utable keeps order") {
    val row = TStruct(Seq(EField("id", TInt64), EField("v", TStr)))
    val kt = TTable(row, "KTable")
    val sorted = dec("""[[3,"c"],[1,"a-old"],[2,"b"],[1,"a-new"]]""", kt)
    assert(sorted === YArr(Seq(
      YHash(Seq("id" -> YInt(1), "v" -> YStr("a-new"))),
      YHash(Seq("id" -> YInt(2), "v" -> YStr("b"))),
      YHash(Seq("id" -> YInt(3), "v" -> YStr("c"))))))
    // a SHORT positional row zip-truncates: trailing fields absent,
    // NOT a null error (review r14 #3-3)
    assert(dec("""[[1]]""", kt) === YArr(Seq(YHash(Seq("id" -> YInt(1))))))
    // object rows take the key by field name; a missing key errors
    assert(dec("""[{"id":2,"v":"b"},{"id":1,"v":"a"}]""", kt) ===
      YArr(Seq(
        YHash(Seq("id" -> YInt(1), "v" -> YStr("a"))),
        YHash(Seq("id" -> YInt(2), "v" -> YStr("b"))))))
    assert(err("""[{"v":"b"}]""", kt) ===
      "key field `id` doesn't exist in value")
    assert(err("""["x"]""", kt) ===
      "Table value must be a JSON array or object")
    // UTable/LTable keep row order
    assert(dec("""[[2,"b"],[1,"a"]]""", TTable(row, "UTable")) ===
      YArr(Seq(
        YHash(Seq("id" -> YInt(2), "v" -> YStr("b"))),
        YHash(Seq("id" -> YInt(1), "v" -> YStr("a"))))))
  }

  test("nested tables decode by THEIR OWN kind (review r14 #3-2)") {
    // a KTable whose rows carry a child LTable: the child keeps row
    // order and duplicates
    val child = TTable(TStruct(Seq(EField("x", TInt64))), "LTable")
    val outer = TTable(TStruct(Seq(EField("id", TInt64),
      EField("items", child))), "KTable")
    val decoded = dec("""[[2,[[9],[9],[1]]],[1,[[5]]]]""", outer)
    assert(decoded === YArr(Seq(
      YHash(Seq("id" -> YInt(1),
        "items" -> YArr(Seq(YHash(Seq("x" -> YInt(5))))))),
      YHash(Seq("id" -> YInt(2),
        "items" -> YArr(Seq(YHash(Seq("x" -> YInt(9))),
          YHash(Seq("x" -> YInt(9))), YHash(Seq("x" -> YInt(1))))))))))
  }

  test("composite struct keys and the lowercase key error " +
    "(review r14 #3-9)") {
    val keyStruct = TStruct(Seq(EField("a", TStr), EField("b", TInt64)))
    val t = TTable(TStruct(Seq(EField("k", keyStruct),
      EField("v", TStr))), "KTable")
    // rows sort by the COMPOSITE key part-wise
    val decoded = dec(
      """[[["z",1],"second"],[["a",9],"first"]]""", t)
    assert(decoded === YArr(Seq(
      YHash(Seq("k" -> YHash(Seq("a" -> YStr("a"), "b" -> YInt(9))),
        "v" -> YStr("first"))),
      YHash(Seq("k" -> YHash(Seq("a" -> YStr("z"), "b" -> YInt(1))),
        "v" -> YStr("second"))))))
    // an unkeyable key type errors lowercase, per the Value ladder
    val bad = TTable(TStruct(Seq(EField("k", TFloat64),
      EField("v", TStr))), "KTable")
    assert(err("""[[1.5,"x"]]""", bad) === "invalid key value type")
  }

  test("decode∘serialize round-trip on the typed shapes") {
    val s = TStruct(Seq(EField("id", TInt64), EField("vec",
      TVector(TFloat32, Some(2))), EField("when", TDate)))
    val value = YHash(Seq("id" -> YInt(7),
      "vec" -> YArr(Seq(YReal("0.5"), YReal("1.5"))),
      "when" -> YStr("2024-03-07")))
    val json = """{"id":7,"vec":[0.5,1.5],"when":"2024-03-07"}"""
    assert(ValueCodec.decodeJson(json, s) === value)
  }
}
