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
  * Pinned behavior beyond the happy path:
  *  - JSON `null` decodes to Null under ANY type; nullability is
  *    enforced per STRUCT FIELD ("expected non-null value for
  *    `{name}`"), never at the top level.
  *  - OffsetDateTime falls back to naive parse + assume-UTC (with
  *    the reference's warning) before erroring.
  *  - TimeDelta decodes through the duration parser — both grammars.
  *  - A union decodes from a `[tag, value]` tuple; a NON-NUMBER tag
  *    hits the reference's bare `.unwrap()` — a LIVE PANIC
  *    (value.rs:1102-1106) carried faithfully as its panic message.
  *  - KTable rows decode from arrays (key first) or objects (key
  *    field by name), collect into a BTreeMap — rows SORT by key and
  *    a duplicate key keeps the LAST row; UTable decodes to an
  *    LTable (value.rs:1171-1177's own quirk).
  */
object ValueCodec {

  private val mapper = new ObjectMapper()

  final class DecodeError(msg: String) extends IllegalArgumentException(msg)
  private def fail(msg: String): Nothing = throw new DecodeError(msg)

  /** Table kinds for decode; the schema builder's TTable is
    * kind-blind (all tables render as arrays). */
  sealed trait TableKind
  case object UTable extends TableKind
  case object KTable extends TableKind
  case object LTable extends TableKind

  def decodeJson(json: String, typ: EType,
      tableKind: TableKind = LTable): Yml =
    decode(mapper.readTree(json), typ, tableKind)

  private def mismatch(t: EType, v: JsonNode): Nothing =
    fail(s"Value and type not matched.\nTarget type $t\nJSON value: $v\n")

  private def decode(v: JsonNode, typ: EType, kind: TableKind): Yml = {
    if (v.isNull) return YNull
    typ match {
      case s: TStruct => YHash(decodeFields(v, s.fields, kind))
      case TTable(row) =>
        if (!v.isArray) mismatch(typ, v)
        kind match {
          case KTable =>
            val rows = (0 until v.size).map(i =>
              decodeKTableRow(v.get(i), row, kind))
            // BTreeMap collect: sorted by key, last duplicate wins
            val m = scala.collection.mutable.LinkedHashMap
              .empty[Vector[KeyPart], Yml]
            rows.foreach { case (k, r) => m(k) = r }
            YArr(m.toSeq.sortBy(_._1)(EvaluateDump.keyOrdering).map(_._2))
          case _ =>
            // UTable and LTable both decode to ordered rows
            // (value.rs:1171-1177 literally builds LTable for UTable)
            YArr((0 until v.size).map(i =>
              YHash(decodeFields(v.get(i), row.fields, kind))))
        }
      case basic => decodeBasic(v, basic, kind)
    }
  }

  private def decodeBasic(v: JsonNode, t: EType, kind: TableKind): Yml =
    (t, v) match {
      case (TBytes, s) if s.isTextual =>
        try yBytes(java.util.Base64.getDecoder.decode(s.textValue))
        catch {
          case e: IllegalArgumentException => fail(e.getMessage)
        }
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
        yRange(r.get(0).longValue, r.get(1).longValue)
      case (TUuid, s) if s.isTextual =>
        val u = s.textValue
        if (u.matches(
          "[0-9a-fA-F]{8}-[0-9a-fA-F]{4}-[0-9a-fA-F]{4}-" +
            "[0-9a-fA-F]{4}-[0-9a-fA-F]{12}")) yUuid(u)
        else fail(s"invalid UUID: $u")
      case (TDate, s) if s.isTextual =>
        val d = java.time.LocalDate.parse(s.textValue)
        yDate(d.getYear, d.getMonthValue, d.getDayOfMonth)
      case (TTime, s) if s.isTextual =>
        val tm = java.time.LocalTime.parse(s.textValue)
        yTime(tm.toNanoOfDay)
      case (TLocalDateTime, s) if s.isTextual =>
        val dt = java.time.LocalDateTime.parse(s.textValue)
        yLocalDateTime(dt.getYear, dt.getMonthValue, dt.getDayOfMonth,
          dt.toLocalTime.toNanoOfDay)
      case (TOffsetDateTime, s) if s.isTextual =>
        try {
          val odt = java.time.OffsetDateTime.parse(s.textValue)
          yOffsetDateTime(odt.getYear, odt.getMonthValue,
            odt.getDayOfMonth, odt.toLocalTime.toNanoOfDay,
            odt.getOffset.getTotalSeconds)
        } catch {
          case _: java.time.format.DateTimeParseException =>
            // value.rs:1060-1071: naive datetime assumes UTC (warn)
            val dt = java.time.LocalDateTime.parse(s.textValue)
            yOffsetDateTime(dt.getYear, dt.getMonthValue,
              dt.getDayOfMonth, dt.toLocalTime.toNanoOfDay, 0)
        }
      case (TTimeDelta, s) if s.isTextual =>
        yTimeDelta(Durations.parseNanos(s.textValue))
      case (TJson, any) =>
        yJsonPreserveOrder(any)
      case (TVector(elem, _), a) if a.isArray =>
        YArr((0 until a.size).map(i => decodeBasic(a.get(i), elem, kind)))
      case (TUnion(types), u) =>
        if (!u.isArray) fail("Invalid JSON value for union, expect array")
        if (u.size != 2)
          fail(s"Invalid union tuple: expect 2 values, received ${u.size}")
        val tagNode = u.get(0)
        if (!tagNode.isIntegralNumber || !tagNode.canConvertToLong ||
          tagNode.longValue < 0)
          // value.rs:1102-1106's bare unwrap — a live panic
          throw new IllegalStateException(
            "called `Option::unwrap()` on a `None` value")
        val tagId = tagNode.longValue.toInt
        if (tagId >= types.size)
          fail(s"""No type in `tag_id` "$tagId" found""")
        decodeBasic(u.get(1), types(tagId), kind)
      case (tt, vv) => mismatch(tt, vv)
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
  private def decodeFields(v: JsonNode, fields: Seq[EField],
      kind: TableKind): Seq[(String, Yml)] =
    if (v.isArray) {
      if (v.size != fields.size) fail("unmatched value length")
      fields.zipWithIndex.map { case (f, i) =>
        f.name -> checkedField(f, decode(v.get(i), f.typ, kind))
      }
    } else if (v.isObject) {
      fields.map { f =>
        val fv = v.get(f.name)
        val decoded =
          if (fv == null) YNull else decode(fv, f.typ, kind)
        f.name -> checkedField(f, decoded)
      }
    } else fail("invalid value type")

  private def checkedField(f: EField, decoded: Yml): Yml = {
    if (decoded == YNull && !f.nullable)
      fail(s"expected non-null value for `${f.name}`")
    decoded
  }

  /** One KTable row (value.rs:1178-1227): array form takes the key
    * positionally, object form by the key field's name. */
  private def decodeKTableRow(v: JsonNode, row: TStruct,
      kind: TableKind): (Vector[KeyPart], Yml) = {
    val keyField = row.fields.headOption.getOrElse(
      fail("Empty struct field values"))
    if (v.isArray) {
      if (v.size == 0) fail("Empty struct field values")
      val key = toKey(decode(v.get(0), keyField.typ, kind), keyField.typ)
      val rest = row.fields.tail.zipWithIndex.map { case (f, i) =>
        val fv = if (i + 1 < v.size) decode(v.get(i + 1), f.typ, kind)
          else YNull
        f.name -> checkedField(f, fv)
      }
      (key, YHash((keyField.name -> decode(v.get(0), keyField.typ,
        kind)) +: rest))
    } else if (v.isObject) {
      val kv = v.get(keyField.name)
      if (kv == null)
        fail(s"key field `${keyField.name}` doesn't exist in value")
      val key = toKey(decode(kv, keyField.typ, kind), keyField.typ)
      val rest = row.fields.tail.map { f =>
        val fv = v.get(f.name)
        val decoded = if (fv == null) YNull else decode(fv, f.typ, kind)
        f.name -> checkedField(f, decoded)
      }
      (key, YHash((keyField.name -> decode(kv, keyField.typ,
        kind)) +: rest))
    } else fail("Table value must be a JSON array or object")
  }

  /** into_key over the decoded shape (value.rs as_key: the keyable
    * subset). */
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
    case _ => fail("Invalid key value type")
  }
}
