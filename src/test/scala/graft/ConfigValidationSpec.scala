package graft

import org.scalatest.funsuite.AnyFunSuite

import graft.dataflow.ConfigValidation
import graft.dataflow.ConfigValidation.Settings

/** Pins the config-validation ladder (config_validator.py:10-60):
  * exact error strings in declaration order, Python truthiness
  * (empty string = missing), the either-LLM-key rule, and the paired
  * status booleans. */
class ConfigValidationSpec extends AnyFunSuite {

  private val full = Settings(
    environment = "production",
    databaseUrl = Some("db"), redisUrl = Some("r"),
    supabaseUrl = Some("su"), supabaseKey = Some("sk"),
    qdrantUrl = Some("q"), neo4jUri = Some("n"),
    neo4jUser = Some("u"), neo4jPassword = Some("p"),
    llamaparseApiKey = Some("l"), openaiApiKey = Some("o"))

  test("a full configuration validates clean") {
    assert(ConfigValidation.validationErrors(full) === Nil)
    assert(ConfigValidation.validationFailure(full).isEmpty)
  }

  test("errors collect in ladder order with exact strings") {
    val s = Settings(openaiApiKey = Some("o"))
    val errs = ConfigValidation.validationErrors(s)
    assert(errs === Seq(
      "Missing required environment variable: DATABASE_URL",
      "Missing required environment variable: REDIS_URL",
      "Missing required environment variable: SUPABASE_URL",
      "Missing required environment variable: SUPABASE_KEY",
      "Missing required environment variable: QDRANT_URL",
      "Missing required environment variable: NEO4J_URI",
      "Missing required environment variable: NEO4J_USER",
      "Missing required environment variable: NEO4J_PASSWORD",
      "Missing LLAMA_CLOUD_API_KEY for document parsing"))
    val msg = ConfigValidation.validationFailure(s).get
    assert(msg.startsWith("Configuration validation failed:\n  - Missing"))
    assert(msg.linesIterator.size === 10) // header + 9 bullet lines
  }

  test("empty string is missing; either LLM key satisfies the rule") {
    val s = full.copy(openaiApiKey = Some(""),
      googleAiApiKey = Some("g"))
    assert(ConfigValidation.validationErrors(s) === Nil)
    val none = full.copy(openaiApiKey = None, googleAiApiKey = Some(""))
    assert(ConfigValidation.validationErrors(none) === Seq(
      "At least one LLM API key required: OPENAI_API_KEY or " +
        "GOOGLE_AI_API_KEY"))
  }

  test("status frame: paired settings require every member") {
    val s = full.copy(supabaseKey = None, neo4jPassword = Some(""))
    val st = ConfigValidation.configStatus(s)
    assert(st("supabase_configured") === false)
    assert(st("neo4j_configured") === false)
    assert(st("database_configured") === true)
    assert(st("openai_configured") === true)
    assert(st("google_ai_configured") === false)
    assert(st("environment") === "production")
  }
}
