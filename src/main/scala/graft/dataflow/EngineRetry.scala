package graft.dataflow

/** The engine's retry machinery (src/utils/retryable.rs:1-141) and
  * service-error faces (src/service/error.rs:1-184) — the law every
  * engine wire arm (openai/gemini/anthropic/ollama/voyage) posts
  * under.
  *
  *  - Retryability is an ERROR property, not a policy knob: a
  *    transport error is retryable iff its HTTP status is 429
  *    (retryable.rs:31-35); everything else fails fast. (The APP's
  *    tenacity tier in OpenAiWire also retries 5xx — that difference
  *    is the two codebases', not ours.)
  *  - Backoff starts at `initial_backoff` and, after each retry,
  *    multiplies by a RANDOM factor in [1.618, 2.000] (the
  *    golden-ratio-to-doubling band, retryable.rs:130-137) in integer
  *    MICROsecond arithmetic, clamped to `max_backoff`; once at the
  *    cap it stays there. The multiplier is injectable here so specs
  *    can pin both band edges.
  *  - `max_retries` bounds RETRIES, not attempts: Some(10) allows 11
  *    calls. DEFAULT = 10 retries / 100 ms / 10 s; HEAVY_LOADED (all
  *    LLM arms) = 10 retries / 1 s / 60 s.
  */
object EngineRetry {

  final case class RetryOptions(maxRetries: Option[Int],
      initialBackoffMicros: Long, maxBackoffMicros: Long)

  /** RetryOptions::default (retryable.rs:83-91). */
  val DefaultOptions: RetryOptions =
    RetryOptions(Some(10), 100_000L, 10_000_000L)

  /** HEAVY_LOADED_OPTIONS (retryable.rs:93-97). */
  val HeavyLoadedOptions: RetryOptions =
    RetryOptions(Some(10), 1_000_000L, 60_000_000L)

  /** reqwest::Error::is_retryable (retryable.rs:31-35): 429 only. */
  def isRetryableHttp(status: Int): Boolean = status == 429

  /** One backoff step (retryable.rs:130-137): only grows while under
    * the cap; integer micros times a per-mille factor in 1618..=2000. */
  def nextBackoffMicros(currentMicros: Long, maxMicros: Long,
      factorPerMille: Int): Long = {
    require(factorPerMille >= 1618 && factorPerMille <= 2000,
      s"multiplier $factorPerMille outside rand range 1618..=2000")
    if (currentMicros < maxMicros)
      math.min(currentMicros * factorPerMille / 1000, maxMicros)
    else currentMicros
  }

  /** retryable::run (retryable.rs:99-141): call, return on success or
    * non-retryable error or exhausted retries; otherwise sleep the
    * CURRENT backoff then evolve it. Returns Right(value) or
    * Left(last error). `factor` draws the per-retry multiplier (the
    * reference's rand::random_range(1618..=2000)). */
  def run[T, E](f: () => Either[(E, Boolean), T], options: RetryOptions,
      sleepMicros: Long => Unit,
      factor: () => Int = () => 2000): Either[E, T] = {
    var retries = 0
    var backoff = options.initialBackoffMicros
    while (true) {
      f() match {
        case Right(v) => return Right(v)
        case Left((err, retryable)) =>
          if (!retryable || options.maxRetries.exists(retries >= _))
            return Left(err)
          retries += 1
          sleepMicros(backoff)
          // the reference samples rand ONLY while under the cap
          // (retryable.rs:130-137; review r14 #2-8) — a pinned factor
          // stream must not desynchronize once capped
          if (backoff < options.maxBackoffMicros)
            backoff = nextBackoffMicros(backoff, options.maxBackoffMicros,
              factor())
      }
    }
    throw new IllegalStateException("unreachable")
  }

  // -----------------------------------------------------------------
  // Service error faces (src/service/error.rs)
  // -----------------------------------------------------------------

  private val mapper = new com.fasterxml.jackson.databind.ObjectMapper()

  /** The HTTP error body every endpoint returns (error.rs:41-53):
    * `{"error": <message>}`. */
  def errorResponseJson(message: String): String = {
    val root = mapper.createObjectNode()
    root.put("error", message)
    mapper.writeValueAsString(root)
  }

  /** Status mapping: api_bail!/api_error! mint BAD_REQUEST (400,
    * error.rs:172-184); any other error surfaces as 500 unless it
    * already carries a status (error.rs:56-66). */
  def statusFor(isApiError: Boolean, carried: Option[Int]): Int =
    carried.getOrElse(if (isApiError) 400 else 500)

  /** error.rs:168-170. */
  val InvarianceViolation = "Invariance violation"
}
