package graft.incremental

import java.nio.charset.StandardCharsets.UTF_8

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** The `cocoindex evaluate` dump contract (src/execution/dumper.rs:
  * 1-284 + src/utils/yaml_ser.rs:1-728): run the flow cacheless
  * without touching targets and write one YAML file per source row.
  * Three deterministic tiers, each pinned against the reference:
  *
  *  1. **File naming** (dumper.rs:189-242): key parts stringified
  *     (KeyValue::to_strs, value.rs:260-281), each part URL-encoded
  *     (the urlencoding crate — RFC 3986 unreserved passthrough),
  *     joined with `:`, truncated to the largest UTF-8 char boundary
  *     STRICTLY UNDER `128 - len(source_name)` bytes (the reference's
  *     `(0..cap).rev().find(is_char_boundary)` — an exclusive range,
  *     so the prefix caps at 127-len bytes; a name of 128+ bytes
  *     empties the prefix). Keys sharing a truncated prefix get `.0`,
  *     `.1`, … suffixes in SOURCE LIST ORDER; a singleton gets none.
  *     Full name: `{source}@{prefix}{extra}.yaml`. (Post-encoding the
  *     prefix is pure ASCII, so the boundary walk can never actually
  *     step — kept for fidelity.)
  *  2. **Document shape** (dumper.rs:26-57): a hash of `key` (the
  *     typed key value), `exports` (one entry per export op, rows
  *     sorted by extracted primary key — a BTreeMap, so a duplicate
  *     primary key keeps the LAST row), and `error` — the two
  *     Options are OMITTED when absent (skip_serializing_if), never
  *     null.
  *  3. **Scalar mapping** (yaml_ser.rs + value.rs:998-1027
  *     BasicValue::serialize): i8..i64/u8..u32 → Integer; u64 → Real
  *     carrying the decimal string (yaml_ser.rs:84-86 — so a Range's
  *     usize endpoints emit as Reals); f32/f64 → Real with Rust's
  *     Display text; bytes → base64 string; uuid/date/time →
  *     canonical strings; LocalDateTime → `%Y-%m-%dT%H:%M:%S%.6f`
  *     (always 6 fraction digits); OffsetDateTime → RFC 3339 AutoSi
  *     with `Z`; TimeDelta → chrono's ISO-ish Display; Json → its
  *     serde tree (object keys BTreeMap-SORTED); None → Null; unit →
  *     empty hash; struct/table rows → field-name hashes in schema
  *     order (KTable rows get the key prepended as field 0).
  *
  * The node tree above is the pinned contract. [[emit]] renders it in
  * yaml_rust2's block style (document header, 2-space indent, compact
  * sequence items, literal blocks for multiline strings) as our
  * emitter — byte parity with yaml_rust2's quoting heuristics is not
  * claimed beyond the shapes the specs pin.
  */
object EvaluateDump {

  val FilenamePrefixMaxLength = 128 // dumper.rs:24

  /** EvaluateAndDumpOptions (dumper.rs:18-22). `useCache` maps to
    * EvaluationMemoryOptions.enable_cache with evaluation_only=true —
    * reuse memoized LLM calls, never write targets. */
  final case class DumpOptions(outputDir: String, useCache: Boolean)

  /** The output-dir precondition (dumper.rs:267-274): an existing
    * non-directory is an error; an existing directory is reused; a
    * missing path is created (by the caller). */
  def outputDirGuard(exists: Boolean, isDir: Boolean): Unit =
    if (exists && !isDir)
      throw new IllegalStateException("The path exists and is not a directory")

  // -----------------------------------------------------------------
  // Key vocabulary (value.rs KeyValue)
  // -----------------------------------------------------------------

  /** KeyValue (value.rs:85-95): the key-able subset of the type
    * system, with the derived Ord the BTreeMap sorts by — variant
    * index first, then value. */
  sealed trait KeyPart {
    private[EvaluateDump] def variant: Int
    /** parts_to_strs (value.rs:260-281) — note Range contributes TWO
      * parts. */
    def strParts: Seq[String]
  }
  final case class KBytes(v: Seq[Byte]) extends KeyPart {
    private[EvaluateDump] def variant = 0
    def strParts = Seq(java.util.Base64.getEncoder.encodeToString(v.toArray))
  }
  final case class KStr(v: String) extends KeyPart {
    private[EvaluateDump] def variant = 1
    def strParts = Seq(v)
  }
  final case class KBool(v: Boolean) extends KeyPart {
    private[EvaluateDump] def variant = 2
    def strParts = Seq(v.toString)
  }
  final case class KInt(v: Long) extends KeyPart {
    private[EvaluateDump] def variant = 3
    def strParts = Seq(v.toString)
  }
  final case class KRange(start: Long, end: Long) extends KeyPart {
    private[EvaluateDump] def variant = 4
    def strParts = Seq(start.toString, end.toString)
  }
  final case class KUuid(v: String) extends KeyPart {
    private[EvaluateDump] def variant = 5
    def strParts = Seq(v.toLowerCase(java.util.Locale.ROOT))
  }
  final case class KDate(year: Int, month: Int, day: Int) extends KeyPart {
    private[EvaluateDump] def variant = 6
    def strParts = Seq(f"$year%04d-$month%02d-$day%02d")
  }

  /** Rust's derived Ord: discriminant first, then the payload.
    * Bytes/Str compare bytewise; Uuid compares as its 128-bit value
    * (== bytewise on the canonical hex form); Range (start, end). */
  implicit val keyPartOrdering: Ordering[KeyPart] = (a: KeyPart, b: KeyPart) =>
    if (a.variant != b.variant) Integer.compare(a.variant, b.variant)
    else (a, b) match {
      case (KBytes(x), KBytes(y)) =>
        val n = math.min(x.length, y.length)
        var i = 0
        while (i < n && x(i) == y(i)) i += 1
        if (i < n) Integer.compare(x(i) & 0xff, y(i) & 0xff)
        else Integer.compare(x.length, y.length)
      case (KStr(x), KStr(y)) => compareUtf8(x, y)
      case (KBool(x), KBool(y)) => java.lang.Boolean.compare(x, y)
      case (KInt(x), KInt(y)) => java.lang.Long.compare(x, y)
      case (KRange(s1, e1), KRange(s2, e2)) =>
        val c = java.lang.Long.compare(s1, s2)
        if (c != 0) c else java.lang.Long.compare(e1, e2)
      case (KUuid(x), KUuid(y)) =>
        x.toLowerCase(java.util.Locale.ROOT)
          .compareTo(y.toLowerCase(java.util.Locale.ROOT))
      case (KDate(y1, m1, d1), KDate(y2, m2, d2)) =>
        val c1 = Integer.compare(y1, y2)
        if (c1 != 0) c1
        else {
          val c2 = Integer.compare(m1, m2)
          if (c2 != 0) c2 else Integer.compare(d1, d2)
        }
      case _ => 0
    }

  /** Rust String Ord is byte order of the UTF-8 encoding — which
    * differs from Java's UTF-16 compareTo above U+FFFF. */
  private def compareUtf8(a: String, b: String): Int = {
    val x = a.getBytes(UTF_8)
    val y = b.getBytes(UTF_8)
    val n = math.min(x.length, y.length)
    var i = 0
    while (i < n && x(i) == y(i)) i += 1
    if (i < n) Integer.compare(x(i) & 0xff, y(i) & 0xff)
    else Integer.compare(x.length, y.length)
  }

  /** A full key (possibly composite); ordered part-wise. */
  implicit val keyOrdering: Ordering[Vector[KeyPart]] =
    (a: Vector[KeyPart], b: Vector[KeyPart]) => {
      val n = math.min(a.length, b.length)
      var i = 0
      var c = 0
      while (i < n && c == 0) { c = keyPartOrdering.compare(a(i), b(i)); i += 1 }
      if (c != 0) c else Integer.compare(a.length, b.length)
    }

  // -----------------------------------------------------------------
  // File naming
  // -----------------------------------------------------------------

  /** dumper.rs:198-210: encode each part, join ":", truncate at the
    * largest char boundary strictly under `128 - len(name)` bytes. */
  def fileNamePrefix(parts: Seq[String], sourceName: String): String = {
    val joined =
      parts.map(graft.operators.ProviderWires.urlEncode).mkString(":")
    val bytes = joined.getBytes(UTF_8)
    val cap = FilenamePrefixMaxLength - sourceName.getBytes(UTF_8).length
    if (cap <= 0) return ""
    var i = math.min(cap - 1, bytes.length)
    while (i > 0 && i < bytes.length && (bytes(i) & 0xc0) == 0x80) i -= 1
    new String(bytes, 0, i, UTF_8)
  }

  /** dumper.rs:217-242 over a local key list: group by prefix in list
    * order, append `.{i}` within multi-key groups, render the full
    * file name. */
  def fileNames(keys: Seq[Seq[String]], sourceName: String): Seq[String] = {
    val prefixes = keys.map(fileNamePrefix(_, sourceName))
    val sizes = prefixes.groupBy(identity).view.mapValues(_.size).toMap
    val seen = scala.collection.mutable.Map.empty[String, Int]
    prefixes.map { p =>
      val i = seen.getOrElse(p, 0)
      seen(p) = i + 1
      val extra = if (sizes(p) > 1) s".$i" else ""
      s"$sourceName@$p$extra.yaml"
    }
  }

  /** The same naming as a distributed frame: `prefixCol` is the
    * already-derived prefix, `orderCol` the source list order. One
    * shuffle on the prefix — collision groups are tiny (same first
    * 127-len(name) encoded bytes), so the window never skews. */
  def withFileNames(df: DataFrame, sourceName: String, prefixCol: Column,
      orderCol: Column): DataFrame = {
    val byPrefix = Window.partitionBy(prefixCol)
    val extra = when(count(lit(1)).over(byPrefix) > 1,
      concat(lit("."),
        (row_number().over(byPrefix.orderBy(orderCol)) - 1).cast("string")))
      .otherwise(lit(""))
    df.withColumn("file_name",
      concat(lit(sourceName + "@"), prefixCol, extra, lit(".yaml")))
  }

  // -----------------------------------------------------------------
  // YAML node tree (yaml_rust2::Yaml through YamlSerializer)
  // -----------------------------------------------------------------

  sealed trait Yml
  case object YNull extends Yml
  final case class YBool(v: Boolean) extends Yml
  final case class YInt(v: Long) extends Yml
  /** Yaml::Real — a STRING payload (u64s and floats land here). */
  final case class YReal(v: String) extends Yml
  final case class YStr(v: String) extends Yml
  final case class YArr(items: Seq[Yml]) extends Yml
  /** Insertion-ordered hash (yaml Hash = LinkedHashMap). */
  final case class YHash(entries: Seq[(String, Yml)]) extends Yml

  /** Rust `{}` Display for floats: shortest round-trip digits in
    * positional notation, no trailing `.0` on integral values. Java's
    * repr detours through E-notation — normalize via BigDecimal. */
  def rustFloatDisplay(d: Double): String =
    if (d.isNaN) "NaN"
    else if (d.isPosInfinity) "inf"
    else if (d.isNegInfinity) "-inf"
    else plain(java.lang.Double.toString(d))

  def rustFloatDisplay(f: Float): String =
    if (f.isNaN) "NaN"
    else if (f.isPosInfinity) "inf"
    else if (f.isNegInfinity) "-inf"
    else plain(java.lang.Float.toString(f))

  private def plain(repr: String): String = {
    val bd = new java.math.BigDecimal(repr).stripTrailingZeros
    bd.toPlainString
  }

  /** u64 (source ordinals, Range endpoints): yaml_ser.rs:84-86. */
  def yU64(v: Long): Yml = YReal(java.lang.Long.toUnsignedString(v))
  def yFloat32(v: Float): Yml = YReal(rustFloatDisplay(v))
  def yFloat64(v: Double): Yml = YReal(rustFloatDisplay(v))
  def yBytes(v: Array[Byte]): Yml =
    YStr(java.util.Base64.getEncoder.encodeToString(v))
  /** Range serializes as a 2-tuple of usize → [Real, Real]. */
  def yRange(start: Long, end: Long): Yml = YArr(Seq(yU64(start), yU64(end)))
  def yUuid(v: String): Yml = YStr(v.toLowerCase(java.util.Locale.ROOT))
  def yDate(year: Int, month: Int, day: Int): Yml =
    YStr(f"$year%04d-$month%02d-$day%02d")

  /** chrono sub-second AutoSi: no fraction, or exactly 3/6/9 digits. */
  private def si(nanos: Long): String =
    if (nanos == 0) ""
    else if (nanos % 1000000 == 0) f".${nanos / 1000000}%03d"
    else if (nanos % 1000 == 0) f".${nanos / 1000}%06d"
    else f".$nanos%09d"

  private def hms(nanosOfDay: Long): (Long, Long, Long, Long) = {
    val secs = nanosOfDay / 1000000000L
    (secs / 3600, secs / 60 % 60, secs % 60, nanosOfDay % 1000000000L)
  }

  /** NaiveTime Display: HH:MM:SS + AutoSi fraction. */
  def yTime(nanosOfDay: Long): Yml = {
    val (h, m, s, n) = hms(nanosOfDay)
    YStr(f"$h%02d:$m%02d:$s%02d${si(n)}")
  }

  /** LocalDateTime: `%Y-%m-%dT%H:%M:%S%.6f` — ALWAYS 6 fraction
    * digits (truncated from nanos), value.rs:1011-1013. */
  def yLocalDateTime(year: Int, month: Int, day: Int, nanosOfDay: Long)
      : Yml = {
    val (h, m, s, n) = hms(nanosOfDay)
    YStr(f"$year%04d-$month%02d-$day%02dT$h%02d:$m%02d:$s%02d" +
      f".${n / 1000}%06d")
  }

  /** OffsetDateTime: RFC 3339, AutoSi fraction, `Z` for UTC else
    * ±hh:mm (value.rs:1014-1016). Fields are the LOCAL wall-clock
    * parts at the carried offset. */
  def yOffsetDateTime(year: Int, month: Int, day: Int, nanosOfDay: Long,
      offsetSeconds: Int): Yml = {
    val (h, m, s, n) = hms(nanosOfDay)
    val off =
      if (offsetSeconds == 0) "Z"
      else {
        val sign = if (offsetSeconds < 0) "-" else "+"
        val a = math.abs(offsetSeconds)
        f"$sign${a / 3600}%02d:${a / 60 % 60}%02d"
      }
    YStr(f"$year%04d-$month%02d-$day%02dT$h%02d:$m%02d:$s%02d${si(n)}$off")
  }

  /** chrono TimeDelta Display (time_delta.rs): sign, `P`, days when
    * nonzero, and a T-section with whole seconds plus a 3/6/9-digit
    * fraction — present whenever there is sub-day time OR no date
    * part at all (`P0D` never happens; zero is `PT0S`). */
  def yTimeDelta(totalNanos: Long): Yml = {
    val sign = if (totalNanos < 0) "-" else ""
    val abs = math.abs(totalNanos)
    val days = abs / 86400000000000L
    val rest = abs % 86400000000000L
    val secs = rest / 1000000000L
    val nanos = rest % 1000000000L
    val hasDate = days != 0
    val hasTime = secs != 0 || nanos != 0 || !hasDate
    val sb = new StringBuilder(sign).append("P")
    if (hasDate) sb.append(days).append("D")
    if (hasTime) {
      sb.append("T").append(secs)
      if (nanos != 0) {
        if (nanos % 1000000 == 0) sb.append(f".${nanos / 1000000}%03d")
        else if (nanos % 1000 == 0) sb.append(f".${nanos / 1000}%06d")
        else sb.append(f".$nanos%09d")
      }
      sb.append("S")
    }
    YStr(sb.toString)
  }

  /** Json values pass through serde: serde_json::Map is a BTreeMap,
    * so OBJECT KEYS SORT; arrays keep order; numbers split int/real. */
  private val mapper = new com.fasterxml.jackson.databind.ObjectMapper()

  def yJson(json: String): Yml = fromJackson(mapper.readTree(json))

  private def fromJackson(n: com.fasterxml.jackson.databind.JsonNode): Yml =
    if (n.isNull) YNull
    else if (n.isBoolean) YBool(n.booleanValue)
    else if (n.isIntegralNumber && n.canConvertToLong) YInt(n.longValue)
    else if (n.isIntegralNumber &&
      n.bigIntegerValue.signum >= 0 && n.bigIntegerValue.bitLength <= 64)
      // serde_json parses (i64::MAX, u64::MAX] as u64 → Real with the
      // EXACT decimal digits (review r14 #7: the double detour was off
      // by one at u64::MAX)
      YReal(n.bigIntegerValue.toString)
    else if (n.isNumber) YReal(rustFloatDisplay(n.doubleValue))
    else if (n.isTextual) YStr(n.textValue)
    else if (n.isArray)
      YArr((0 until n.size).map(i => fromJackson(n.get(i))))
    else {
      val names = new scala.collection.mutable.ArrayBuffer[String]
      n.fieldNames().forEachRemaining(names += _)
      YHash(names.sorted.map(k => k -> fromJackson(n.get(k))).toSeq)
    }

  // -----------------------------------------------------------------
  // Document assembly
  // -----------------------------------------------------------------

  /** TargetExportData (dumper.rs:26-46): rows sorted by primary key;
    * equal keys collapse BTreeMap-style, LAST write wins. */
  def exportData(rows: Seq[(Vector[KeyPart], Yml)]): Yml = {
    val m = scala.collection.mutable.LinkedHashMap.empty[Vector[KeyPart], Yml]
    rows.foreach { case (k, v) => m(k) = v }
    YArr(m.toSeq.sortBy(_._1)(keyOrdering).map(_._2))
  }

  /** SourceOutputData (dumper.rs:48-57): `key` always, `exports` and
    * `error` omitted (not null) when absent. */
  def sourceOutputData(key: Yml, exports: Option[Seq[(String, Yml)]],
      error: Option[String]): YHash =
    YHash(Seq("key" -> key) ++
      exports.map(e => "exports" -> (YHash(e): Yml)) ++
      error.map(e => "error" -> (YStr(e): Yml)))

  // -----------------------------------------------------------------
  // Emitter (yaml_rust2 block style, multiline_strings + compact)
  // -----------------------------------------------------------------

  /** Render the node tree: `---` document header, block style,
    * 2-space indent, compact sequence entries, literal blocks (`|` /
    * `|-`) for strings containing newlines, `~` for null, `{}`/`[]`
    * for empty containers. Scalars that would be ambiguous unquoted
    * (empty, leading/trailing space, numeric-looking, `true`-like, or
    * containing YAML indicators) double-quote with \\-escapes. */
  def emit(y: Yml): String = {
    val sb = new StringBuilder("---")
    emitNode(y, sb, 0, inline = false)
    sb.toString
  }

  private def pad(sb: StringBuilder, indent: Int): Unit = {
    var i = 0
    while (i < indent) { sb.append("  "); i += 1 }
  }

  private def emitNode(y: Yml, sb: StringBuilder, indent: Int,
      inline: Boolean): Unit = y match {
    case YHash(Seq()) => sb.append(if (inline) "{}" else "\n{}")
    case YArr(Seq()) => sb.append(if (inline) "[]" else "\n[]")
    case YHash(entries) =>
      entries.zipWithIndex.foreach { case ((k, v), i) =>
        if (!(inline && i == 0)) { sb.append("\n"); pad(sb, indent) }
        sb.append(scalarText(k)).append(":")
        v match {
          case YHash(es) if es.nonEmpty => emitNode(v, sb, indent + 1,
            inline = false)
          case YArr(is) if is.nonEmpty => emitNode(v, sb, indent + 1,
            inline = false)
          case _ => sb.append(" "); emitScalar(v, sb, indent)
        }
      }
    case YArr(items) =>
      items.zipWithIndex.foreach { case (item, i) =>
        if (!(inline && i == 0)) { sb.append("\n"); pad(sb, indent) }
        sb.append("- ")
        item match {
          case YHash(es) if es.nonEmpty =>
            // compact: first entry shares the "- " line
            emitNode(item, sb, indent + 1, inline = true)
          case YArr(is) if is.nonEmpty =>
            emitNode(item, sb, indent + 1, inline = true)
          case _ => emitScalar(item, sb, indent)
        }
      }
    case scalar => sb.append("\n"); emitScalar(scalar, sb, indent)
  }

  private def emitScalar(y: Yml, sb: StringBuilder, indent: Int): Unit =
    y match {
      case YHash(Seq()) => sb.append("{}")
      case YArr(Seq()) => sb.append("[]")
      case YNull => sb.append("~")
      case YBool(b) => sb.append(if (b) "true" else "false")
      case YInt(v) => sb.append(v)
      case YReal(s) => sb.append(s)
      case YStr(s) if s.contains("\n") =>
        // multiline_strings(true): literal block. Chomping by trailing
        // newline count (review r14 #6: clip `|` keeps exactly ONE
        // trailing newline, so two-plus need keep `|+`): none → `|-`,
        // one → `|`, more → `|+` with the extra blank lines emitted.
        val trailing = s.length - s.reverse.dropWhile(_ == '\n').length
        val header =
          if (trailing == 0) "|-" else if (trailing == 1) "|" else "|+"
        val body = if (trailing == 0) s else s.dropRight(1)
        sb.append(header)
        body.split("\n", -1).foreach { line =>
          sb.append("\n")
          if (line.nonEmpty) { pad(sb, indent + 1); sb.append(line) }
        }
      case YStr(s) => sb.append(scalarText(s))
      case other =>
        throw new IllegalArgumentException(s"not a scalar: $other")
    }

  private val bareSafe = "^[A-Za-z_][A-Za-z0-9_ .,/@+()-]*$".r
  private val trueLike = Set("true", "false", "null", "yes", "no", "on",
    "off", "~")

  private def scalarText(s: String): String =
    if (s.nonEmpty && !s.startsWith(" ") && !s.endsWith(" ") &&
      bareSafe.matches(s) &&
      !trueLike.contains(s.toLowerCase(java.util.Locale.ROOT))) s
    else {
      val sb = new StringBuilder("\"")
      s.foreach {
        case '"' => sb.append("\\\"")
        case '\\' => sb.append("\\\\")
        case '\n' => sb.append("\\n")
        case '\t' => sb.append("\\t")
        case '\r' => sb.append("\\r")
        case c if c < 0x20 => sb.append(f"\\x${c.toInt}%02x")
        case c => sb.append(c)
      }
      sb.append("\"").toString
    }
}
