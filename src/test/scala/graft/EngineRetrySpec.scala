package graft

import org.scalatest.funsuite.AnyFunSuite

import graft.dataflow.EngineRetry
import graft.dataflow.EngineRetry.RetryOptions

/** The engine's retryable::run law and the service-error faces. */
class EngineRetrySpec extends AnyFunSuite {

  test("options: default and heavy-loaded") {
    assert(EngineRetry.DefaultOptions ===
      RetryOptions(Some(10), 100_000L, 10_000_000L))
    assert(EngineRetry.HeavyLoadedOptions ===
      RetryOptions(Some(10), 1_000_000L, 60_000_000L))
  }

  test("transport retryability is 429-only (the engine, not tenacity)") {
    assert(EngineRetry.isRetryableHttp(429))
    assert(!EngineRetry.isRetryableHttp(500))
    assert(!EngineRetry.isRetryableHttp(503))
    assert(!EngineRetry.isRetryableHttp(400))
  }

  test("backoff evolution: multiplier band, cap, stickiness at cap") {
    // doubling edge from heavy-loaded initial: 1s, 2s, 4s ... 60s cap
    var b = 1_000_000L
    val seq = (1 to 7).map { _ =>
      b = EngineRetry.nextBackoffMicros(b, 60_000_000L, 2000); b
    }
    assert(seq === Seq(2_000_000L, 4_000_000L, 8_000_000L, 16_000_000L,
      32_000_000L, 60_000_000L, 60_000_000L))
    // golden-ratio edge in integer micros arithmetic
    assert(EngineRetry.nextBackoffMicros(1_000_000L, 60_000_000L, 1618) ===
      1_618_000L)
    assert(EngineRetry.nextBackoffMicros(1_618_000L, 60_000_000L, 1618) ===
      2_617_924L)
    // at the cap the step is a no-op (backoff < max guard)
    assert(EngineRetry.nextBackoffMicros(60_000_000L, 60_000_000L, 1618) ===
      60_000_000L)
    intercept[IllegalArgumentException](
      EngineRetry.nextBackoffMicros(1L, 2L, 1617))
  }

  test("run: success, fail-fast, exhausted retries, sleep schedule") {
    // non-retryable fails on the FIRST call, no sleeps
    var calls = 0
    val sleeps = scala.collection.mutable.ArrayBuffer[Long]()
    val r1 = EngineRetry.run[Int, String](
      () => { calls += 1; Left(("bad request", false)) },
      EngineRetry.HeavyLoadedOptions, sleeps += _)
    assert(r1 === Left("bad request") && calls === 1 && sleeps.isEmpty)
    // retryable succeeds on call 4: three sleeps at 1s, 2s, 4s
    calls = 0
    sleeps.clear()
    val r2 = EngineRetry.run[Int, String](
      () => { calls += 1; if (calls == 4) Right(42)
        else Left(("overloaded", true)) },
      EngineRetry.HeavyLoadedOptions, sleeps += _)
    assert(r2 === Right(42) && calls === 4)
    assert(sleeps.toSeq === Seq(1_000_000L, 2_000_000L, 4_000_000L))
    // max_retries bounds RETRIES, not attempts: 10 retries = 11 calls,
    // and the LAST error comes back
    calls = 0
    sleeps.clear()
    val r3 = EngineRetry.run[Int, String](
      () => { calls += 1; Left((s"err$calls", true)) },
      EngineRetry.HeavyLoadedOptions, sleeps += _)
    assert(r3 === Left("err11") && calls === 11 && sleeps.size === 10)
    // capped tail of the heavy-loaded doubling schedule
    assert(sleeps.toSeq === Seq(1, 2, 4, 8, 16, 32, 60, 60, 60, 60)
      .map(_ * 1_000_000L))
    // unbounded options never exhaust
    calls = 0
    val r4 = EngineRetry.run[Int, String](
      () => { calls += 1; if (calls == 30) Right(1)
        else Left(("again", true)) },
      RetryOptions(None, 1L, 2L), _ => ())
    assert(r4 === Right(1) && calls === 30)
    // the RNG draws ONLY while under the cap (review r14 #2-8): with
    // initial == max, zero draws happen across any number of retries
    var draws = 0
    calls = 0
    EngineRetry.run[Int, String](
      () => { calls += 1; if (calls == 5) Right(1)
        else Left(("again", true)) },
      RetryOptions(Some(10), 60_000_000L, 60_000_000L), _ => (),
      () => { draws += 1; 2000 })
    assert(draws === 0)
    // and with heavy-loaded options the draw count stops at the
    // capped step: 1→2→4→8→16→32→60 takes six draws, further
    // retries draw nothing
    draws = 0
    calls = 0
    EngineRetry.run[Int, String](
      () => { calls += 1; if (calls == 11) Right(1)
        else Left(("again", true)) },
      EngineRetry.HeavyLoadedOptions, _ => (), () => { draws += 1; 2000 })
    assert(draws === 6)
  }

  test("service-error faces") {
    assert(EngineRetry.errorResponseJson("field not found: x") ===
      """{"error":"field not found: x"}""")
    assert(EngineRetry.statusFor(isApiError = true, None) === 400)
    assert(EngineRetry.statusFor(isApiError = false, None) === 500)
    assert(EngineRetry.statusFor(isApiError = false, Some(404)) === 404)
    assert(EngineRetry.InvarianceViolation === "Invariance violation")
  }
}
