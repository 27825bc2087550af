package graft

import org.scalatest.funsuite.AnyFunSuite

import graft.dataflow.Durations
import graft.dataflow.Durations.DurationError

/** Mirrors src/base/duration.rs's inline test suite (duration.rs:
  * 190-768) case for case: every ok-arm value (as total nanos) and
  * every error string, verbatim. */
class DurationsSpec extends AnyFunSuite {

  private val Us = 1000L
  private val Ms = 1000L * Us
  private val Sec = 1000L * Ms
  private val Min = 60L * Sec
  private val Hour = 60L * Min
  private val Day = 24L * Hour

  private def ok(input: String, expectedNanos: Long): Unit =
    assert(Durations.parseNanos(input) === expectedNanos, s"input '$input'")

  private def err(input: String, expected: String): Unit = {
    val e = intercept[DurationError](Durations.parseNanos(input))
    assert(e.getMessage === expected, s"input '$input'")
  }

  test("empty / whitespace") {
    err("", "Empty duration string")
    err("   ", "Empty duration string")
    err(" 　", "Empty duration string") // NBSP + ideographic space
  }

  test("iso error arms") {
    err("P", "No components in duration: P")
    err("PT", "Time part present but no time components in: PT")
    err("PD", "Expected number in: PD")
    err("PTM", "Expected number in: PTM")
    err("P1H", "Invalid unit 'H' in: P1H")
    err("P1S", "Invalid unit 'S' in: P1S")
    err("P1X", "Invalid unit 'X' in: P1X")
    err("PT1X", "Invalid unit 'X' in: PT1X")
    // lowercase p reaches the ISO arm (case-insensitive sniff) only to
    // fail the uppercase-literal check; a lowercase unit is invalid
    err("p1h", "Duration must start with 'P' in: p1h")
    err("PT1h", "Invalid unit 'h' in: PT1h")
    err("P1D2", "Missing unit after number '2' in: P1D2")
    err("PT1..5S", "Invalid unit '.' in: PT1..5S")
    err("PT1.5.5S", "Invalid unit '.' in: PT1.5.5S")
    err("P1..5D", "Invalid unit '.' in: P1..5D")
    err("P1DT2H T3M", "Expected number in: P1DT2H T3M")
    err("P1T2H", "Missing unit after number '1' in: P1T2H")
    err("P-1D", "Expected number in: P-1D")
  }

  test("iso valid single units") {
    ok("P1M", 30 * Day)
    ok(" P13M", 13 * 30 * Day) // trimmed; errors carry the original
    ok("P1W", 7 * Day)
    ok("      P1W ", 7 * Day)
    ok("P1D", Day)
    ok("PT2H", 2 * Hour)
    ok("PT3M", 3 * Min)
    ok("PT4S", 4 * Sec)
  }

  test("iso combined / duplicated / out-of-order units") {
    ok("P1Y2M3W4DT5H6M7S",
      (365 + 60 + 21 + 4) * Day + 5 * Hour + 6 * Min + 7 * Sec)
    ok("P1DT2H3M4S", Day + 2 * Hour + 3 * Min + 4 * Sec)
    ok("P1D1D", 2 * Day)
    ok("PT1H1H", 2 * Hour)
    ok("P1W1Y", (365 + 7) * Day)
    ok("PT2S1H", Hour + 2 * Sec)
    ok("P3M", 90 * Day)
    ok("PT3M", 3 * Min)
    err("P1H2D", "Invalid unit 'H' in: P1H2D") // time unit without T
  }

  test("iso negative and zero") {
    ok("-P1D", -Day)
    ok("P0D", 0L)
    ok("PT0S", 0L)
    ok("PT0H0M0S", 0L)
  }

  test("iso fractional seconds") {
    ok("PT1.5S", Sec + 500 * Ms)
    ok("PT441010.456123S", 441010 * Sec + 456123 * Us)
    ok("PT0.000001S", Us)
  }

  test("iso fractional date units (micros truncation per component)") {
    ok("P1.5D", (1.5 * 86_400_000_000.0).toLong * 1000)
    ok("P1.25Y", (1.25 * 365.0 * 86_400_000_000.0).toLong * 1000)
    ok("P2.75M", (2.75 * 30.0 * 86_400_000_000.0).toLong * 1000)
    ok("P0.5W", (0.5 * 7.0 * 86_400_000_000.0).toLong * 1000)
    ok("-P1.5D", -(1.5 * 86_400_000_000.0).toLong * 1000)
    ok("-P0.25Y", -(0.25 * 365.0 * 86_400_000_000.0).toLong * 1000)
  }

  test("iso combined and multiple fractional units") {
    // the reference's own expectations: micros for the date part,
    // whole units + rounded remainders for the time part
    ok("P1.5DT2.5H3.5M4.5S",
      (1.5 * 86_400_000_000.0).toLong * 1000 +
        (2.5 * 3_600_000_000.0).toLong * 1000 +
        (3.5 * 60_000_000.0).toLong * 1000 +
        4 * Sec + 500 * Ms)
    ok("PT1.5S2.5S", 3 * Sec + 500 * Ms + 500 * Ms)
    // 1.1H rounds to hours(1)+seconds(360); 2.2M to minutes(2)+
    // seconds(12); 3.3S to seconds(3)+millis(300) — duration.rs:497-513
    ok("PT1.1H2.2M3.3S",
      Hour + 360 * Sec + 2 * Min + 12 * Sec + 3 * Sec + 300 * Ms)
  }

  test("human error arms") {
    err("1", "Invalid human-readable duration format in: 1")
    err("day", "Invalid human-readable duration format in: day")
    err("1 day 2", "Invalid human-readable duration format in: 1 day 2")
    err("one day", "Invalid number 'one' in: one day")
    err("1 hour 2 minutes 3 seconds four seconds",
      "Invalid number 'four' in: 1 hour 2 minutes 3 seconds four seconds")
    err("1.5 hours", "Invalid number '1.5' in: 1.5 hours")
    err("just some words",
      "Invalid human-readable duration format in: just some words")
    err("1 year", "Invalid unit 'year' in: 1 year")
    err("1day", "Invalid human-readable duration format in: 1day")
  }

  test("human valid units, all twelve spellings") {
    ok("1 day", Day)
    ok("2 DAYS", 2 * Day)
    ok("3 hour", 3 * Hour)
    ok("4 HoUrS", 4 * Hour)
    ok("5 minute", 5 * Min)
    ok("6 minutes", 6 * Min)
    ok("7 second", 7 * Sec)
    ok("8 seconds", 8 * Sec)
    ok("9 millisecond", 9 * Ms)
    ok("10 milliseconds", 10 * Ms)
    ok("11 microsecond", 11 * Us)
    ok("12 microseconds", 12 * Us)
  }

  test("human combined, whitespace, negatives, zero") {
    ok("1 day 2 hours 3 minutes 4 seconds",
      Day + 2 * Hour + 3 * Min + 4 * Sec)
    ok("1 second 2 hours", 2 * Hour + Sec)
    ok("7 minutes 6 hours 5 days", 5 * Day + 6 * Hour + 7 * Min)
    ok("0 seconds", 0L)
    ok("0 day 0 hour", 0L)
    ok("0 days 0 hours 0 minutes 0 seconds", 0L)
    ok(" 1 day ", Day)
    ok("  1  day   2  hours ", Day + 2 * Hour)
    ok("-1 day 2 hours", -Day + 2 * Hour)
    ok("1 day -2 hours", Day - 2 * Hour)
  }

  test("micros face truncates toward zero") {
    assert(Durations.parseMicros("PT1.5S") === 1_500_000L)
    assert(Durations.parseMicros("-P1D") === -86_400_000_000L)
    assert(Durations.tryParseMicros("P1D") === Right(86_400_000_000L))
    assert(Durations.tryParseMicros("P1X") ===
      Left("Invalid unit 'X' in: P1X"))
  }
}
