package graft.dataflow

import com.fasterxml.jackson.databind.ObjectMapper

import graft.operators.ProviderWires.ApiError

/** The engine's registries and settings shell: the executor-factory
  * registry with its builtin roster (src/ops/registration.rs:1-49,
  * registry.rs:1-38), the auth registry with its long recovery hint
  * (src/setup/auth_registry.rs:1-48), and the Settings JSON shape
  * with serde defaults (src/settings.rs:1-120, inline tests
  * mirrored). */
object EngineRegistry {

  /** The builtin factory roster in registration order
    * (registration.rs:8-28; each op's `fn name`). */
  val BuiltinFactories: Seq[String] = Seq(
    "LocalFile", "GoogleDrive", "AmazonS3", "AzureBlob",
    "ParseJson", "SplitRecursively", "ExtractByLlm", "EmbedText",
    "Postgres", "Qdrant", "Kuzu", "Neo4j")

  /** ExecutorFactoryRegistry (registry.rs:15-38): first write wins,
    * the duplicate is the error. */
  final class FactoryRegistry {
    private val factories =
      scala.collection.mutable.Map.empty[String, String]
    def register(name: String, kind: String): Unit =
      if (factories.contains(name))
        throw new IllegalStateException(
          s"Factory with name already exists: $name")
      else factories(name) = kind
    def get(name: String): Option[String] = factories.get(name)
    /** get_executor_factory (registration.rs:41-44). */
    def require(name: String): String = get(name).getOrElse(
      throw new IllegalStateException(
        s"Executor factory not found for op kind: $name"))
  }

  def builtinRegistry(): FactoryRegistry = {
    val r = new FactoryRegistry
    Seq("LocalFile" -> "source", "GoogleDrive" -> "source",
      "AmazonS3" -> "source", "AzureBlob" -> "source",
      "ParseJson" -> "function", "SplitRecursively" -> "function",
      "ExtractByLlm" -> "function", "EmbedText" -> "function",
      "Postgres" -> "target", "Qdrant" -> "target", "Kuzu" -> "target",
      "Neo4j" -> "target").foreach { case (n, k) => r.register(n, k) }
    r
  }

  /** The Python side's transient auth key grammar
    * (python/cocoindex/auth_registry.py:19-24): a process-global
    * 1-based counter renders `__auth_{n}` — the key
    * `add_transient_auth_entry` registers under. */
  def transientAuthKey(counter: Int): String = s"__auth_$counter"

  /** AuthRegistry (auth_registry.rs:15-48): duplicate adds bail; a
    * missing entry raises the reference's full recovery hint. */
  final class AuthRegistry {
    private val entries = scala.collection.mutable.Map.empty[String, String]
    def add(key: String, valueJson: String): Unit =
      if (entries.contains(key))
        throw new ApiError(s"Auth entry already exists: $key")
      else entries(key) = valueJson
    def get(key: String): String = entries.getOrElse(key,
      throw new ApiError(authEntryNotFound(key)))
  }

  /** auth_registry.rs:39-45 verbatim (the \ line-continuations in the
    * Rust source splice the lines with no extra whitespace). */
  def authEntryNotFound(key: String): String =
    s"Auth entry `$key` not found.\n" +
      s"Hint: If you're not referencing `$key` in your flow, it will " +
      "likely be caused by a previously persisted target using it. " +
      s"You need to bring back the definition for the auth entry `$key`, " +
      "so that CocoIndex will be able to do a cleanup in the next " +
      "`setup` run. " +
      "See https://cocoindex.io/docs/core/flow_def#auth-registry for " +
      "more details."

  // -----------------------------------------------------------------
  // Settings (src/settings.rs)
  // -----------------------------------------------------------------

  final case class DatabaseConnectionSpec(url: String,
      user: Option[String], password: Option[String],
      maxConnections: Int, minConnections: Int)

  final case class GlobalExecutionOptions(
      sourceMaxInflightRows: Option[Long] = None,
      sourceMaxInflightBytes: Option[Long] = None)

  final case class Settings(database: Option[DatabaseConnectionSpec],
      appNamespace: String, globalExecutionOptions: GlobalExecutionOptions)

  private val mapper = new ObjectMapper()

  /** The serde shape (settings.rs:3-27): `database` optional (an
    * explicit null is fine — it's an Option), `app_namespace`
    * defaults empty, execution options default-empty; but
    * `#[serde(default)]` only covers MISSING fields — an explicit
    * null for the string or the struct is serde's invalid-type error
    * (review r14 #2-6). Inside a database spec
    * `url`/`max_connections`/`min_connections` are REQUIRED
    * (missing-field error) while user/password are optional. */
  def parseSettings(json: String): Settings = {
    val root = mapper.readTree(json)
    val db = Option(root.get("database")).filterNot(_.isNull).map { d =>
      def req(f: String, expected: String) = {
        val v = d.get(f)
        if (v == null) throw new IllegalArgumentException(
          s"missing field `$f`")
        if (v.isNull) throw new IllegalArgumentException(
          s"invalid type: null, expected $expected")
        v
      }
      DatabaseConnectionSpec(
        req("url", "a string").asText,
        Option(d.get("user")).filterNot(_.isNull).map(_.asText),
        Option(d.get("password")).filterNot(_.isNull).map(_.asText),
        req("max_connections", "u32").intValue,
        req("min_connections", "u32").intValue)
    }
    val execNode = root.get("global_execution_options")
    if (execNode != null && execNode.isNull)
      throw new IllegalArgumentException(
        "invalid type: null, expected struct GlobalExecutionOptions")
    val exec = Option(execNode).map { g =>
      GlobalExecutionOptions(
        Option(g.get("source_max_inflight_rows")).filterNot(_.isNull)
          .map(_.longValue),
        Option(g.get("source_max_inflight_bytes")).filterNot(_.isNull)
          .map(_.longValue))
    }.getOrElse(GlobalExecutionOptions())
    val nsNode = root.get("app_namespace")
    if (nsNode != null && nsNode.isNull)
      throw new IllegalArgumentException(
        "invalid type: null, expected a string")
    Settings(db, Option(nsNode).map(_.asText).getOrElse(""), exec)
  }
}
