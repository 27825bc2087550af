package graft.dataflow

/** Configuration validation (app/config_validator.py:10-67): the
  * required-settings ladder with the reference's exact error strings,
  * the at-least-one-LLM-key rule, and the debugging status frame.
  * Values are Python-truthiness-checked (`if not value`): None and ""
  * both count as missing.
  *
  * Driver-side scalar logic by nature (it guards session startup, not
  * data) — no DataFrame involved.
  */
object ConfigValidation {

  final case class Settings(
      environment: String = "development",
      databaseUrl: Option[String] = None,
      redisUrl: Option[String] = None,
      supabaseUrl: Option[String] = None,
      supabaseKey: Option[String] = None,
      qdrantUrl: Option[String] = None,
      neo4jUri: Option[String] = None,
      neo4jUser: Option[String] = None,
      neo4jPassword: Option[String] = None,
      llamaparseApiKey: Option[String] = None,
      openaiApiKey: Option[String] = None,
      googleAiApiKey: Option[String] = None)

  private def truthy(v: Option[String]): Boolean =
    v.exists(_.nonEmpty)

  /** The (attr, env-var) ladder in the reference's declaration order
    * (config_validator.py:18-27) — error lines keep this order. */
  private def requiredConfigs(s: Settings): Seq[(Option[String], String)] =
    Seq(
      s.databaseUrl -> "DATABASE_URL",
      s.redisUrl -> "REDIS_URL",
      s.supabaseUrl -> "SUPABASE_URL",
      s.supabaseKey -> "SUPABASE_KEY",
      s.qdrantUrl -> "QDRANT_URL",
      s.neo4jUri -> "NEO4J_URI",
      s.neo4jUser -> "NEO4J_USER",
      s.neo4jPassword -> "NEO4J_PASSWORD")

  /** validate_config (:10-46): every missing required var collects an
    * error line, then the parsing key, then the at-least-one-LLM-key
    * rule; empty result = valid. */
  def validationErrors(s: Settings): Seq[String] = {
    val required = requiredConfigs(s).collect {
      case (v, env) if !truthy(v) =>
        s"Missing required environment variable: $env"
    }
    val parsing =
      if (!truthy(s.llamaparseApiKey))
        Seq("Missing LLAMA_CLOUD_API_KEY for document parsing")
      else Nil
    val llm =
      if (!truthy(s.openaiApiKey) && !truthy(s.googleAiApiKey))
        Seq("At least one LLM API key required: OPENAI_API_KEY or " +
          "GOOGLE_AI_API_KEY")
      else Nil
    required ++ parsing ++ llm
  }

  /** The aggregated ConfigurationError message (:44-46). */
  def validationFailure(s: Settings): Option[String] = {
    val errors = validationErrors(s)
    if (errors.isEmpty) None
    else Some("Configuration validation failed:\n" +
      errors.map(e => s"  - $e").mkString("\n"))
  }

  /** get_config_status (:48-60): the boolean status frame — paired
    * settings (supabase, neo4j) require EVERY member truthy. */
  def configStatus(s: Settings): Map[String, Any] = Map(
    "environment" -> s.environment,
    "database_configured" -> truthy(s.databaseUrl),
    "redis_configured" -> truthy(s.redisUrl),
    "supabase_configured" ->
      (truthy(s.supabaseUrl) && truthy(s.supabaseKey)),
    "qdrant_configured" -> truthy(s.qdrantUrl),
    "neo4j_configured" -> (truthy(s.neo4jUri) && truthy(s.neo4jUser) &&
      truthy(s.neo4jPassword)),
    "llamaparse_configured" -> truthy(s.llamaparseApiKey),
    "openai_configured" -> truthy(s.openaiApiKey),
    "google_ai_configured" -> truthy(s.googleAiApiKey))
}
