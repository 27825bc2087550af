package graft

import org.scalatest.funsuite.AnyFunSuite

import graft.incremental.EvaluateDump
import graft.incremental.EvaluateDump._

/** The evaluate-and-dump contract (dumper.rs + yaml_ser.rs +
  * value.rs's typed serialization): file naming, key ordering, row
  * ordering, per-type YAML shapes, document assembly, emitter. */
class EvaluateDumpSpec extends AnyFunSuite {

  // ----------------------------------------------------------------
  // File naming
  // ----------------------------------------------------------------

  test("prefix: encode each part, join ':', cap strictly under 128-len") {
    // no truncation when short
    assert(fileNamePrefix(Seq("a b", "c/d"), "src") === "a%20b:c%2Fd")
    // the cap is EXCLUSIVE: a 4-byte name allows at most 123 prefix
    // bytes (128-4-1), not 124
    val name4 = "srcx"
    val long = "x" * 200
    assert(fileNamePrefix(Seq(long), name4).length === 123)
    // a 118-byte name allows 9 bytes
    val name118 = "s" * 118
    assert(fileNamePrefix(Seq("d 5", "1234"), name118) === "d%205:123")
    // a name of 128+ bytes empties the prefix
    assert(fileNamePrefix(Seq("abc"), "n" * 128) === "")
    assert(fileNamePrefix(Seq("abc"), "n" * 130) === "")
    // multi-byte input is percent-encoded to ASCII before the cap, so
    // truncation lands mid-escape rather than mid-char: a 122-byte
    // name caps at 5 bytes, splitting é's "%C3%A9"
    assert(fileNamePrefix(Seq("é"), "s" * 121) === "%C3%A9")
    assert(fileNamePrefix(Seq("é"), "s" * 122) === "%C3%A")
  }

  test("file names: source-order extra ids only within collision groups") {
    val name = "s" * 118 // prefix cap 9 bytes
    val keys = Seq(Seq("d 5", "1234"), Seq("d 5", "1230"), Seq("d 7", "9"))
    // first two collide on "d%205:123"; third is singleton
    assert(fileNames(keys, name) === Seq(
      s"$name@d%205:123.0.yaml",
      s"$name@d%205:123.1.yaml",
      s"$name@d%207:9.yaml"))
  }

  test("key parts stringify like KeyValue::to_strs") {
    assert(KBytes("Hi".getBytes.toSeq).strParts === Seq("SGk="))
    assert(KStr("x y").strParts === Seq("x y"))
    assert(KBool(true).strParts === Seq("true"))
    assert(KInt(-7).strParts === Seq("-7"))
    // Range contributes TWO parts
    assert(KRange(3, 9).strParts === Seq("3", "9"))
    assert(KUuid("00000000-0000-0000-0000-0000000000AB").strParts ===
      Seq("00000000-0000-0000-0000-0000000000ab"))
    assert(KDate(2024, 3, 7).strParts === Seq("2024-03-07"))
  }

  // ----------------------------------------------------------------
  // Key ordering (BTreeMap) + row ordering
  // ----------------------------------------------------------------

  test("key ordering: variant rank first, utf8 byte order for strings") {
    val o = keyPartOrdering
    // enum variant order: Bytes < Str < Bool < Int64 < Range < Uuid < Date
    assert(o.compare(KBytes(Seq(0xff.toByte)), KStr("")) < 0)
    assert(o.compare(KStr("zzz"), KBool(false)) < 0)
    assert(o.compare(KBool(true), KInt(Long.MinValue)) < 0)
    // Rust String Ord is UTF-8 byte order: U+10000 sorts after U+FFFF
    // even though Java's UTF-16 compareTo says otherwise
    val supp = new String(Character.toChars(0x10000))
    assert(supp.compareTo("￿") < 0) // the Java trap
    assert(o.compare(KStr(supp), KStr("￿")) > 0) // the Rust order
    assert(o.compare(KStr("a"), KStr("ab")) < 0)
    assert(o.compare(KRange(1, 5), KRange(1, 6)) < 0)
  }

  test("export rows sort by key; duplicate keys keep the LAST row") {
    val rows = Seq(
      Vector[KeyPart](KInt(3)) -> (YStr("three"): Yml),
      Vector[KeyPart](KInt(1)) -> (YStr("one-old"): Yml),
      Vector[KeyPart](KInt(2)) -> (YStr("two"): Yml),
      Vector[KeyPart](KInt(1)) -> (YStr("one-new"): Yml))
    assert(exportData(rows) ===
      YArr(Seq(YStr("one-new"), YStr("two"), YStr("three"))))
  }

  // ----------------------------------------------------------------
  // Scalar shapes
  // ----------------------------------------------------------------

  test("u64 and Range land on Real, not Integer (yaml_ser.rs:84-86)") {
    assert(yU64(5) === YReal("5"))
    assert(yU64(-1L) === YReal("18446744073709551615")) // u64::MAX
    assert(yRange(3, 9) === YArr(Seq(YReal("3"), YReal("9"))))
  }

  test("floats carry Rust Display text") {
    assert(rustFloatDisplay(3.14) === "3.14")
    assert(rustFloatDisplay(-0.001) === "-0.001")
    assert(rustFloatDisplay(1.0e10) === "10000000000")
    assert(rustFloatDisplay(1.0) === "1")
    assert(rustFloatDisplay(0.0) === "0")
    assert(rustFloatDisplay(1.0e-5) === "0.00001")
    assert(rustFloatDisplay(Double.NaN) === "NaN")
    assert(rustFloatDisplay(Double.PositiveInfinity) === "inf")
    assert(rustFloatDisplay(3.14f) === "3.14")
    assert(yFloat64(2.5) === YReal("2.5"))
  }

  test("temporal shapes") {
    assert(yDate(2024, 3, 7) === YStr("2024-03-07"))
    // NaiveTime: AutoSi fraction — none, millis, micros, nanos
    assert(yTime(3723L * 1000000000L) === YStr("01:02:03"))
    assert(yTime(3723L * 1000000000L + 500000000L) === YStr("01:02:03.500"))
    assert(yTime(1000L) === YStr("00:00:00.000001"))
    assert(yTime(1L) === YStr("00:00:00.000000001"))
    // LocalDateTime: ALWAYS 6 fraction digits
    assert(yLocalDateTime(2024, 3, 7, 3723L * 1000000000L) ===
      YStr("2024-03-07T01:02:03.000000"))
    assert(yLocalDateTime(2024, 3, 7, 1500L) ===
      YStr("2024-03-07T00:00:00.000001")) // truncated from nanos
    // OffsetDateTime: rfc3339 AutoSi with Z / ±hh:mm
    assert(yOffsetDateTime(2024, 3, 7, 3723L * 1000000000L, 0) ===
      YStr("2024-03-07T01:02:03Z"))
    assert(yOffsetDateTime(2024, 3, 7, 0, 3600) ===
      YStr("2024-03-07T00:00:00+01:00"))
    assert(yOffsetDateTime(2024, 3, 7, 250000000L, -19800) ===
      YStr("2024-03-07T00:00:00.250-05:30"))
  }

  test("TimeDelta renders chrono's Display") {
    assert(yTimeDelta(0L) === YStr("PT0S"))
    assert(yTimeDelta(86400L * 1000000000L) === YStr("P1D"))
    assert(yTimeDelta(90000L * 1000000000L) === YStr("P1DT3600S"))
    assert(yTimeDelta(1500000000L) === YStr("PT1.500S"))
    assert(yTimeDelta(-1500000000L) === YStr("-PT1.500S"))
    assert(yTimeDelta(1000L) === YStr("PT0.000001S"))
    assert(yTimeDelta(500L) === YStr("PT0.000000500S"))
  }

  test("bytes/uuid/json shapes") {
    assert(yBytes("Hello".getBytes) === YStr("SGVsbG8="))
    assert(yUuid("ABCDEF00-0000-4000-8000-000000000001") ===
      YStr("abcdef00-0000-4000-8000-000000000001"))
    // serde_json object keys are BTreeMap-sorted; arrays keep order
    assert(yJson("""{"z":1,"a":[true,null,"s",2.5],"m":{"y":1,"x":2}}""") ===
      YHash(Seq(
        "a" -> YArr(Seq(YBool(true), YNull, YStr("s"), YReal("2.5"))),
        "m" -> YHash(Seq("x" -> YInt(2), "y" -> YInt(1))),
        "z" -> YInt(1))))
    // review r14 #7: u64-range integers keep their exact digits (the
    // serde_json u64 path), not a double round-trip
    assert(yJson("18446744073709551615") === YReal("18446744073709551615"))
    assert(yJson("9223372036854775808") === YReal("9223372036854775808"))
    assert(yJson("9223372036854775807") === YInt(Long.MaxValue))
    // beyond u64 serde_json falls back to f64
    assert(yJson("18446744073709551616") ===
      YReal(rustFloatDisplay(1.8446744073709552e19)))
  }

  // ----------------------------------------------------------------
  // Document assembly + emitter
  // ----------------------------------------------------------------

  test("exports and error are OMITTED when absent, never null") {
    assert(sourceOutputData(YInt(5), None, None) ===
      YHash(Seq("key" -> YInt(5))))
    assert(sourceOutputData(YInt(5), None, Some("boom")) ===
      YHash(Seq("key" -> YInt(5), "error" -> YStr("boom"))))
    val full = sourceOutputData(YInt(5),
      Some(Seq("chunks" -> YArr(Seq(YHash(Seq("id" -> YInt(0))))))), None)
    assert(full.entries.map(_._1) === Seq("key", "exports"))
  }

  test("output-dir guard") {
    outputDirGuard(exists = false, isDir = false)
    outputDirGuard(exists = true, isDir = true)
    val e = intercept[IllegalStateException](
      outputDirGuard(exists = true, isDir = false))
    assert(e.getMessage === "The path exists and is not a directory")
  }

  test("emitter: block style, compact seq rows, literal multiline") {
    val doc = sourceOutputData(YInt(5),
      Some(Seq("chunks" -> exportData(Seq(
        Vector[KeyPart](KInt(2)) ->
          (YHash(Seq("id" -> YInt(2), "text" -> YStr("t2"))): Yml),
        Vector[KeyPart](KInt(0)) ->
          (YHash(Seq("id" -> YInt(0), "text" -> YStr("line1\nline2"))): Yml)
      )))), None)
    assert(emit(doc) ===
      """---
        |key: 5
        |exports:
        |  chunks:
        |    - id: 0
        |      text: |-
        |        line1
        |        line2
        |    - id: 2
        |      text: t2""".stripMargin)
    assert(emit(sourceOutputData(YInt(7), None, Some("boom 7"))) ===
      "---\nkey: 7\nerror: boom 7")
    // ambiguous scalars quote; empty containers inline
    assert(emit(YHash(Seq("a" -> YStr("true"), "b" -> YStr(" x"),
      "c" -> YHash(Seq()), "d" -> YArr(Seq())))) ===
      "---\na: \"true\"\nb: \" x\"\nc: {}\nd: []")
  }

  test("literal-block chomping round-trips trailing newlines " +
    "(review r14 #6)") {
    // none → |-, exactly one → |, two-plus → |+ with blank lines kept
    assert(emit(YHash(Seq("t" -> YStr("a\nb")))) ===
      "---\nt: |-\n  a\n  b")
    assert(emit(YHash(Seq("t" -> YStr("a\nb\n")))) ===
      "---\nt: |\n  a\n  b")
    assert(emit(YHash(Seq("t" -> YStr("a\n\n")))) ===
      "---\nt: |+\n  a\n")
    assert(emit(YHash(Seq("t" -> YStr("a\n\n\n")))) ===
      "---\nt: |+\n  a\n\n")
    // interior empty lines emit bare (no trailing-space padding)
    assert(emit(YHash(Seq("t" -> YStr("a\n\nb")))) ===
      "---\nt: |-\n  a\n\n  b")
  }
}
