package graft.dataflow

/** Duration-spec parsing (src/base/duration.rs:1-188) — the parser
  * behind every `refresh_interval` string in a flow spec. Two
  * grammars, tried by sniffing the first character:
  *
  *  - **ISO 8601** (`P1DT2H`, leading `-` negates): date components
  *    Y/M/W/D before the `T`, time components H/M/S after. Numbers
  *    are digit runs with at most one `.`; units are single UPPERCASE
  *    chars validated against the part's allowed set. Y=365 days,
  *    M=30, W=7. Date components accumulate as `(days × 86_400e6) as
  *    i64` MICROseconds (truncated per component); H and M accumulate
  *    as `round(num × unit_nanos)` nanoseconds; S accumulates whole
  *    seconds plus `round(fract × 1e9)` nanoseconds — duration.rs:
  *    94-127 verbatim, including the float pathway.
  *  - **human-readable** (`1 day 2 hours`): whitespace-split
  *    number-unit pairs, i64 numbers (so `-1 day` works and `1.5
  *    hours` is the invalid-number error), case-insensitive
  *    day/hour/minute/second/millisecond/microsecond (+plural).
  *
  * The sniff (duration.rs:177-181) is case-INsensitive on `P`, but the
  * ISO parser then requires the uppercase literal — `p1h` reaches the
  * ISO arm only to fail "Duration must start with 'P'", the
  * reference's own asymmetry. Error strings interpolate the ORIGINAL
  * (untrimmed) input and are pinned verbatim (the reference's inline
  * tests mirror into DurationsSpec; q159 replays a case table through
  * the distributed row path).
  */
object Durations {

  /** The parse-failure surface (`bail!`/`anyhow!` in duration.rs). */
  final class DurationError(msg: String) extends IllegalArgumentException(msg)

  private def fail(msg: String): Nothing = throw new DurationError(msg)

  /** Rust `str::trim` trims the Unicode White_Space set — wider than
    * Java's `String.trim` (NBSP, NEL, ideographic space) and subtly
    * different from `Character.isWhitespace` (which adds 1C–1F and
    * drops NBSP/NEL). Exact set, so trim can't drift by host stdlib. */
  private[dataflow] def isRustWhitespace(c: Char): Boolean =
    (c >= 0x09 && c <= 0x0d) || c == 0x20 || c == 0x85 || c == 0xa0 ||
      c == 0x1680 || (c >= 0x2000 && c <= 0x200a) || c == 0x2028 ||
      c == 0x2029 || c == 0x202f || c == 0x205f || c == 0x3000

  private def rustTrim(s: String): String = {
    var a = 0
    var b = s.length
    while (a < b && isRustWhitespace(s.charAt(a))) a += 1
    while (b > a && isRustWhitespace(s.charAt(b - 1))) b -= 1
    s.substring(a, b)
  }

  /** parse_components (duration.rs:8-52): number-unit pairs where a
    * number is a digit run with at most one '.', the unit must be in
    * `allowed`, and all three error arms carry the original input. */
  private def parseComponents(s: String, allowed: Set[Char],
      orig: String): List[(Double, Char)] = {
    val out = List.newBuilder[(Double, Char)]
    var i = 0
    val n = s.length
    while (i < n) {
      val start = i
      var hasDecimal = false
      var done = false
      while (i < n && !done) {
        val c = s.charAt(i)
        if (c >= '0' && c <= '9') i += 1
        else if (c == '.' && !hasDecimal) { hasDecimal = true; i += 1 }
        else done = true
      }
      val numStr = s.substring(start, i)
      if (numStr.isEmpty) fail(s"Expected number in: $orig")
      val num =
        try java.lang.Double.parseDouble(numStr)
        catch {
          case _: NumberFormatException =>
            fail(s"Invalid number '$numStr' in: $orig")
        }
      if (i < n) {
        val unit = s.charAt(i)
        if (allowed.contains(unit)) { out += ((num, unit)); i += 1 }
        else fail(s"Invalid unit '$unit' in: $orig")
      } else fail(s"Missing unit after number '$numStr' in: $orig")
    }
    out.result()
  }

  private val DateUnits = Set('Y', 'M', 'W', 'D')
  private val TimeUnits = Set('H', 'M', 'S')

  /** Rust f64::round — half away from zero. Operands here are
    * non-negative (the sign is stripped up front), where
    * `math.round`'s half-up coincides. */
  private def rustRound(x: Double): Long = math.round(x)

  private def parseIso(s: String, orig: String): Long = {
    val (negative, afterSign) =
      if (s.startsWith("-")) (true, s.substring(1)) else (false, s)
    if (!afterSign.startsWith("P"))
      fail(s"Duration must start with 'P' in: $orig")
    val afterP = afterSign.substring(1)
    val tPos = afterP.indexOf('T')
    val (datePart, timePart) =
      if (tPos >= 0) (afterP.substring(0, tPos),
        Some(afterP.substring(tPos + 1)))
      else (afterP, None)

    val dateComponents = parseComponents(datePart, DateUnits, orig)
    val timeComponents = timePart match {
      case Some(t) =>
        val comps = parseComponents(t, TimeUnits, orig)
        if (comps.isEmpty)
          fail(s"Time part present but no time components in: $orig")
        comps
      case None => Nil
    }
    if (dateComponents.isEmpty && timeComponents.isEmpty)
      fail(s"No components in duration: $orig")

    // date: days × 86_400e6 truncated to whole MICROseconds per
    // component (duration.rs:94-107)
    val dateNanos = dateComponents.foldLeft(0L) { case (acc, (num, unit)) =>
      val days = unit match {
        case 'Y' => num * 365.0
        case 'M' => num * 30.0
        case 'W' => num * 7.0
        case 'D' => num
      }
      acc + (days * 86_400_000_000.0).toLong * 1000L
    }
    // time: H/M round to nanos; S keeps whole seconds exact and
    // rounds only the fraction (duration.rs:109-127)
    val timeNanos = timeComponents.foldLeft(0L) { case (acc, (num, unit)) =>
      unit match {
        case 'H' => acc + rustRound(num * 3_600_000_000_000.0)
        case 'M' => acc + rustRound(num * 60_000_000_000.0)
        case 'S' =>
          val whole = num.toLong
          acc + whole * 1_000_000_000L + rustRound((num - whole) * 1e9)
      }
    }
    val total = dateNanos + timeNanos
    if (negative) -total else total
  }

  private def parseHuman(s: String, orig: String): Long = {
    // split_whitespace: split on the same Unicode set, drop empties
    val parts = {
      val buf = Vector.newBuilder[String]
      val sb = new StringBuilder
      s.foreach { c =>
        if (isRustWhitespace(c)) {
          if (sb.nonEmpty) { buf += sb.toString; sb.clear() }
        } else sb.append(c)
      }
      if (sb.nonEmpty) buf += sb.toString
      buf.result()
    }
    if (parts.isEmpty || parts.length % 2 != 0)
      fail(s"Invalid human-readable duration format in: $orig")
    parts.grouped(2).map { chunk =>
      val num =
        try java.lang.Long.parseLong(chunk(0))
        catch {
          case _: NumberFormatException =>
            fail(s"Invalid number '${chunk(0)}' in: $orig")
        }
      chunk(1).toLowerCase(java.util.Locale.ROOT) match {
        case "day" | "days" => num * 86_400_000_000_000L
        case "hour" | "hours" => num * 3_600_000_000_000L
        case "minute" | "minutes" => num * 60_000_000_000L
        case "second" | "seconds" => num * 1_000_000_000L
        case "millisecond" | "milliseconds" => num * 1_000_000L
        case "microsecond" | "microseconds" => num * 1_000L
        case other => fail(s"Invalid unit '$other' in: $orig")
      }
    }.sum
  }

  /** parse_duration (duration.rs:170-188): trim, empty check, sniff
    * `P`/`-P` case-insensitively, dispatch. Returns total NANOseconds
    * (chrono::Duration's precision). */
  def parseNanos(input: String): Long = {
    val s = rustTrim(input)
    if (s.isEmpty) fail("Empty duration string")
    val likelyIso =
      (s.charAt(0) == 'P' || s.charAt(0) == 'p') ||
        (s.charAt(0) == '-' && s.length > 1 &&
          (s.charAt(1) == 'P' || s.charAt(1) == 'p'))
    if (likelyIso) parseIso(s, input) else parseHuman(s, input)
  }

  /** chrono `num_microseconds` — nanos/1000 truncated toward zero
    * (Long division already truncates toward zero in both). */
  def parseMicros(input: String): Long = parseNanos(input) / 1000L

  /** Total-function face for the gate and for spec tables:
    * Right(micros) or Left(the reference's error string). */
  def tryParseMicros(input: String): Either[String, Long] =
    try Right(parseMicros(input))
    catch { case e: DurationError => Left(e.getMessage) }
}
