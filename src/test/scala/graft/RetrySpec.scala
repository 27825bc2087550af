package graft

import org.scalatest.funsuite.AnyFunSuite

import graft.operators.Throttle

/** Exponential-backoff retry parity (utils/retry.py:24-114). */
class RetrySpec extends AnyFunSuite {

  test("succeeds after transient failures with the exponential schedule") {
    val waits = scala.collection.mutable.ArrayBuffer.empty[Long]
    var calls = 0
    val got = Throttle.withRetry[String](maxAttempts = 4,
      initialWaitMillis = 100, backoffFactor = 2.0,
      sleep = waits.append(_)) {
      calls += 1
      if (calls < 3) throw new RuntimeException(s"boom $calls")
      "ok"
    }
    assert(got === "ok")
    assert(calls === 3)
    assert(waits.toSeq === Seq(100L, 200L)) // 100 * 2^(n-1)
  }

  test("waits cap at maxWaitMillis") {
    val waits = scala.collection.mutable.ArrayBuffer.empty[Long]
    var calls = 0
    intercept[RuntimeException](
      Throttle.withRetry[Unit](maxAttempts = 5, initialWaitMillis = 1000,
        backoffFactor = 10.0, maxWaitMillis = 3000,
        sleep = waits.append(_)) {
        calls += 1
        throw new RuntimeException("always")
      })
    assert(calls === 5) // exhausted; the final failure propagates
    assert(waits.toSeq === Seq(1000L, 3000L, 3000L, 3000L))
  }

  test("non-retryable exceptions propagate immediately") {
    var calls = 0
    val e = intercept[IllegalStateException](
      Throttle.withRetry[Unit](maxAttempts = 5,
        retryable = !_.isInstanceOf[IllegalStateException],
        sleep = _ => ()) {
        calls += 1
        throw new IllegalStateException("fatal")
      })
    assert(e.getMessage === "fatal")
    assert(calls === 1)
  }

  test("first-try success never sleeps") {
    var slept = false
    assert(Throttle.withRetry[Int](sleep = _ => slept = true)(42) === 42)
    assert(!slept)
  }

  test("fatal throwables propagate without a retry even when 'retryable'") {
    var calls = 0
    intercept[InterruptedException](
      Throttle.withRetry[Unit](maxAttempts = 5, sleep = _ => ()) {
        calls += 1
        throw new InterruptedException("cancelled")
      })
    assert(calls === 1) // NonFatal guard: cancellation is not retried
  }
}
