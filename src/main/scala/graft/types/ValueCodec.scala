package graft.types

import com.fasterxml.jackson.databind.JsonNode
import com.fasterxml.jackson.databind.ObjectMapper

import graft.dataflow.Durations
import graft.incremental.EvaluateDump
import graft.incremental.EvaluateDump._
import graft.operators.JsonSchemaBuild._

/** The DECODE side of the §1.1 value codec (value.rs:1030-1240
  * `BasicValue::from_json` / `Value::from_json` /
  * `FieldValues::from_json`) — the ladder every LLM output, key
  * string, and API payload walks back into typed engine values.
  * Pairs with [[graft.incremental.EvaluateDump]]'s serialize
  * direction: decoded values land directly in that module's Yml
  * shapes (the typed serialization), so decode∘serialize is the
  * round-trip the reference's test_convert.py exercises.
  *
  * Pinned behavior beyond the happy path (sharpened by review r14
  * pass 3):
  *  - JSON `null` decodes to Null under ANY type; nullability is
  *    enforced per STRUCT FIELD ("expected non-null value for
  *    `{name}`"), never at the top level.
  *  - Tables decode by THEIR OWN `kind` (nested tables never inherit
  *    an outer kind); a UTable literally decodes as an LTable
  *    (value.rs:1171-1177's own quirk); KTable rows collect into a
  *    BTreeMap — sorted by key, duplicate keys last-wins — and a
  *    SHORT positional row zip-truncates (trailing fields absent, NOT
  *    a null error).
  *  - Bytes decode under base64 0.22's STANDARD engine: canonical
  *    padding required ("Invalid padding"), illegal characters carry
  *    "Invalid symbol {byte}, offset {i}.".
  *  - Uuid accepts hyphenated/simple/braced/urn forms (the uuid
  *    crate's parse_str).
  *  - Time/LocalDateTime require the full seconds component (chrono
  *    FromStr); OffsetDateTime falls back to naive parse + assume-UTC
  *    (with the reference's warning) and re-raises the ORIGINAL
  *    rfc3339 error when the fallback also fails. Every parse failure
  *    is a [[DecodeError]].
  *  - TimeDelta decodes through the duration parser — both grammars.
  *  - A union decodes from a `[tag, value]` tuple with a FULL u64
  *    tag; a non-u64 tag hits the reference's bare `.unwrap()` — a
  *    LIVE PANIC (value.rs:1102-1106) carried as its panic message.
  *  - Range endpoints are usize: a negative bound is the serde error.
  */
object ValueCodec {

  private val mapper = new ObjectMapper()

  final class DecodeError(msg: String) extends IllegalArgumentException(msg)
  private def fail(msg: String): Nothing = throw new DecodeError(msg)

  def decodeJson(json: String, typ: EType): Yml =
    decode(mapper.readTree(json), typ)

  private def mismatch(t: EType, v: JsonNode): Nothing =
    fail(s"Value and type not matched.\nTarget type $t\nJSON value: $v\n")

  private def decode(v: JsonNode, typ: EType): Yml = {
    if (v.isNull) return YNull
    typ match {
      case s: TStruct => YHash(decodeFields(v, s.fields))
      case t @ TTable(row, kind) =>
        if (!v.isArray) mismatch(typ, v)
        kind match {
          case "KTable" =>
            val rows = (0 until v.size).map(i =>
              decodeKTableRow(v.get(i), row))
            // BTreeMap collect: sorted by key, last duplicate wins
            val m = scala.collection.mutable.LinkedHashMap
              .empty[Vector[KeyPart], Yml]
            rows.foreach { case (k, r) => m(k) = r }
            YArr(m.toSeq.sortBy(_._1)(EvaluateDump.keyOrdering).map(_._2))
          case _ =>
            // UTable and LTable both decode to ordered rows
            // (value.rs:1171-1177 literally builds LTable for UTable)
            YArr((0 until v.size).map(i =>
              YHash(decodeFields(v.get(i), row.fields))))
        }
      case basic => decodeBasic(v, basic)
    }
  }

  /** base64 0.22 STANDARD decode: canonical padding, the crate's own
    * error vocabulary. */
  private def decodeBase64(s: String): Array[Byte] = {
    val alphabet =
      "ABCDEFGHIJKLMNOPQRSTUVWXYZabcdefghijklmnopqrstuvwxyz0123456789+/"
    var i = 0
    var padStart = -1
    while (i < s.length) {
      val c = s.charAt(i)
      if (c == '=') { if (padStart < 0) padStart = i }
      else if (padStart >= 0 || alphabet.indexOf(c) < 0)
        fail(s"Invalid symbol ${c.toInt}, offset $i.")
      i += 1
    }
    if (s.length % 4 != 0) fail("Invalid padding")
    try java.util.Base64.getDecoder.decode(s)
    catch { case _: IllegalArgumentException => fail("Invalid padding") }
  }

  private val UuidHyphenated =
    "[0-9a-fA-F]{8}-[0-9a-fA-F]{4}-[0-9a-fA-F]{4}-[0-9a-fA-F]{4}-" +
      "[0-9a-fA-F]{12}"

  /** uuid::Uuid::parse_str — hyphenated, simple 32-hex, braced, and
    * urn:uuid: forms all canonicalize to hyphenated lowercase. */
  private def parseUuid(u: String): String = {
    val inner =
      if (u.startsWith("urn:uuid:")) u.substring(9)
      else if (u.startsWith("{") && u.endsWith("}"))
        u.substring(1, u.length - 1)
      else u
    if (inner.matches(UuidHyphenated))
      inner.toLowerCase(java.util.Locale.ROOT)
    else if (inner.matches("[0-9a-fA-F]{32}")) {
      val h = inner.toLowerCase(java.util.Locale.ROOT)
      Seq(h.substring(0, 8), h.substring(8, 12), h.substring(12, 16),
        h.substring(16, 20), h.substring(20)).mkString("-")
    } else fail(s"invalid UUID: $u")
  }

  private def parseOrFail[T](what: String, s: String)(p: => T): T =
    try p
    catch {
      case e: java.time.format.DateTimeParseException =>
        fail(s"invalid $what: $s")
    }

  private def decodeBasic(v: JsonNode, t: EType): Yml =
    (t, v) match {
      case (TBytes, s) if s.isTextual => yBytes(decodeBase64(s.textValue))
      case (TStr, s) if s.isTextual => YStr(s.textValue)
      case (TBool, b) if b.isBoolean => YBool(b.booleanValue)
      case (TInt64, n) if n.isNumber =>
        // as_i64: whole integers in range only
        if (n.isIntegralNumber && n.canConvertToLong) YInt(n.longValue)
        else fail(s"invalid int64 value ${numberText(n)}")
      case (TFloat32, n) if n.isNumber => yFloat32(n.doubleValue.toFloat)
      case (TFloat64, n) if n.isNumber => yFloat64(n.doubleValue)
      case (TRange, r) if r.isArray && r.size == 2 &&
        r.get(0).canConvertToLong && r.get(1).canConvertToLong =>
        // RangeValue is (usize, usize): negatives are serde errors
        if (r.get(0).longValue < 0 || r.get(1).longValue < 0) {
          val bad = if (r.get(0).longValue < 0) r.get(0) else r.get(1)
          fail(s"invalid value: integer `${bad.longValue}`, expected usize")
        } else yRange(r.get(0).longValue, r.get(1).longValue)
      case (TUuid, s) if s.isTextual => YStr(parseUuid(s.textValue))
      case (TDate, s) if s.isTextual =>
        val d = parseOrFail("date", s.textValue)(
          java.time.LocalDate.parse(s.textValue))
        yDate(d.getYear, d.getMonthValue, d.getDayOfMonth)
      case (TTime, s) if s.isTextual =>
        // chrono NaiveTime FromStr requires the seconds component
        if (!s.textValue.matches("""\d{2}:\d{2}:\d{2}(\.\d+)?"""))
          fail(s"invalid time: ${s.textValue}")
        val tm = parseOrFail("time", s.textValue)(
          java.time.LocalTime.parse(s.textValue))
        yTime(tm.toNanoOfDay)
      case (TLocalDateTime, s) if s.isTextual =>
        yLocal(parseNaiveDateTime(s.textValue))
      case (TOffsetDateTime, s) if s.isTextual =>
        try {
          val odt = java.time.OffsetDateTime.parse(s.textValue)
          yOffsetDateTime(odt.getYear, odt.getMonthValue,
            odt.getDayOfMonth, odt.toLocalTime.toNanoOfDay,
            odt.getOffset.getTotalSeconds)
        } catch {
          case _: java.time.format.DateTimeParseException =>
            // value.rs:1060-1071: naive datetime assumes UTC (warn);
            // a failed fallback re-raises as a decode error
            val dt = try parseNaiveDateTime(s.textValue)
            catch {
              case _: DecodeError =>
                fail(s"invalid RFC 3339 datetime: ${s.textValue}")
            }
            yOffsetDateTime(dt.getYear, dt.getMonthValue,
              dt.getDayOfMonth, dt.toLocalTime.toNanoOfDay, 0)
        }
      case (TTimeDelta, s) if s.isTextual =>
        yTimeDelta(Durations.parseNanos(s.textValue))
      case (TJson, any) =>
        yJsonPreserveOrder(any)
      case (TVector(elem, _), a) if a.isArray =>
        YArr((0 until a.size).map(i => decodeBasic(a.get(i), elem)))
      case (TUnion(types), u) =>
        if (!u.isArray) fail("Invalid JSON value for union, expect array")
        if (u.size != 2)
          fail(s"Invalid union tuple: expect 2 values, received ${u.size}")
        val tagNode = u.get(0)
        // as_u64: any non-negative integer up to u64::MAX succeeds
        val tag: Option[java.math.BigInteger] =
          if (tagNode.isIntegralNumber &&
            tagNode.bigIntegerValue.signum >= 0 &&
            tagNode.bigIntegerValue.bitLength <= 64)
            Some(tagNode.bigIntegerValue)
          else None
        val tagId = tag.getOrElse(
          // value.rs:1102-1106's bare unwrap — a live panic
          throw new IllegalStateException(
            "called `Option::unwrap()` on a `None` value"))
        if (tagId.compareTo(
          java.math.BigInteger.valueOf(types.size)) >= 0)
          fail(s"""No type in `tag_id` "$tagId" found""")
        decodeBasic(u.get(1), types(tagId.intValue))
      case (tt, vv) => mismatch(tt, vv)
    }

  private def yLocal(dt: java.time.LocalDateTime): Yml =
    yLocalDateTime(dt.getYear, dt.getMonthValue, dt.getDayOfMonth,
      dt.toLocalTime.toNanoOfDay)

  /** chrono NaiveDateTime FromStr: date, 'T', time WITH seconds. */
  private def parseNaiveDateTime(s: String): java.time.LocalDateTime = {
    if (!s.matches("""\d{4}-\d{2}-\d{2}T\d{2}:\d{2}:\d{2}(\.\d+)?"""))
      fail(s"invalid datetime: $s")
    parseOrFail("datetime", s)(java.time.LocalDateTime.parse(s))
  }

  /** With preserve_order serde, Json values keep their own key order
    * (unlike [[EvaluateDump.yJson]]'s sorted convention, which models
    * the BTreeMap-era YAML dump; the live engine's Json passthrough
    * is insertion-ordered). */
  private def yJsonPreserveOrder(n: JsonNode): Yml =
    if (n.isNull) YNull
    else if (n.isBoolean) YBool(n.booleanValue)
    else if (n.isIntegralNumber && n.canConvertToLong) YInt(n.longValue)
    else if (n.isIntegralNumber &&
      n.bigIntegerValue.signum >= 0 && n.bigIntegerValue.bitLength <= 64)
      YReal(n.bigIntegerValue.toString)
    else if (n.isNumber) YReal(rustFloatDisplay(n.doubleValue))
    else if (n.isTextual) YStr(n.textValue)
    else if (n.isArray)
      YArr((0 until n.size).map(i => yJsonPreserveOrder(n.get(i))))
    else {
      val names = new scala.collection.mutable.ArrayBuffer[String]
      n.fieldNames().forEachRemaining(names += _)
      YHash(names.map(k => k -> yJsonPreserveOrder(n.get(k))).toSeq)
    }

  private def numberText(n: JsonNode): String =
    if (n.isFloatingPointNumber)
      graft.operators.ProviderWires.serdeFloatText(n.doubleValue)
    else n.asText

  /** FieldValues::from_json (value.rs:962-975): positional arrays
    * must match arity exactly; objects fill by name with Null
    * defaults; null lands only on nullable fields. */
  private def decodeFields(v: JsonNode,
      fields: Seq[EField]): Seq[(String, Yml)] =
    if (v.isArray) {
      if (v.size != fields.size) fail("unmatched value length")
      fields.zipWithIndex.map { case (f, i) =>
        f.name -> checkedField(f, decode(v.get(i), f.typ))
      }
    } else if (v.isObject) {
      fields.map { f =>
        val fv = v.get(f.name)
        val decoded =
          if (fv == null) YNull else decode(fv, f.typ)
        f.name -> checkedField(f, decoded)
      }
    } else fail("invalid value type")

  private def checkedField(f: EField, decoded: Yml): Yml = {
    if (decoded == YNull && !f.nullable)
      fail(s"expected non-null value for `${f.name}`")
    decoded
  }

  /** One KTable row (value.rs:1178-1227): array form takes the key
    * positionally and ZIP-TRUNCATES the rest — a short row's trailing
    * fields are simply absent (review r14 #3-3); object form takes
    * the key field by name. */
  private def decodeKTableRow(v: JsonNode,
      row: TStruct): (Vector[KeyPart], Yml) = {
    val keyField = row.fields.headOption.getOrElse(
      fail("Empty struct field values"))
    if (v.isArray) {
      if (v.size == 0) fail("Empty struct field values")
      val keyVal = decode(v.get(0), keyField.typ)
      val key = toKey(keyVal, keyField.typ)
      // fields_iter.zip(field_vals_iter): stops at the shorter side
      val n = math.min(row.fields.size - 1, v.size - 1)
      val rest = (0 until n).map { i =>
        val f = row.fields(i + 1)
        f.name -> checkedField(f, decode(v.get(i + 1), f.typ))
      }
      (key, YHash((keyField.name -> keyVal) +: rest))
    } else if (v.isObject) {
      val kv = v.get(keyField.name)
      if (kv == null)
        fail(s"key field `${keyField.name}` doesn't exist in value")
      val keyVal = decode(kv, keyField.typ)
      val key = toKey(keyVal, keyField.typ)
      val rest = row.fields.tail.map { f =>
        val fv = v.get(f.name)
        val decoded = if (fv == null) YNull else decode(fv, f.typ)
        f.name -> checkedField(f, decoded)
      }
      (key, YHash((keyField.name -> keyVal) +: rest))
    } else fail("Table value must be a JSON array or object")
  }

  /** into_key over the decoded shape (value.rs:525-560 as_key/
    * into_key — the keyable subset incl. composite struct keys;
    * lowercase error per the Value ladder, review r14 #3-9). */
  private def toKey(y: Yml, typ: EType): Vector[KeyPart] = (typ, y) match {
    case (TStr, YStr(s)) => Vector(KStr(s))
    case (TInt64, YInt(i)) => Vector(KInt(i))
    case (TBool, YBool(b)) => Vector(KBool(b))
    case (TBytes, YStr(b64)) =>
      Vector(KBytes(java.util.Base64.getDecoder.decode(b64).toSeq))
    case (TUuid, YStr(u)) => Vector(KUuid(u))
    case (TDate, YStr(d)) =>
      val p = java.time.LocalDate.parse(d)
      Vector(KDate(p.getYear, p.getMonthValue, p.getDayOfMonth))
    case (TRange, YArr(Seq(YReal(s), YReal(e)))) =>
      Vector(KRange(s.toLong, e.toLong))
    case (TStruct(fields, _), YHash(entries)) =>
      val byName = entries.toMap
      fields.toVector.flatMap(f => toKey(byName(f.name), f.typ))
    case _ => fail("invalid key value type")
  }
}
