package graft.dataflow

/** The python-side Settings/ServerSettings environment ladder
  * (python/cocoindex/setting.py:36-190) — the `COCOINDEX_*` env
  * parsing behind `cocoindex.init` and the CLI's in-process
  * initialization. Distinct from the Rust settings serde shape
  * (EngineRegistry.settingsFromJson): this is the layer that BUILDS
  * that payload from the environment.
  *
  * Semantics pinned by the wave-7 reference-run fixtures
  * (py_settings.json / PySettingsSpec): dataclass defaults apply only
  * when an env var is ABSENT; the database fork hangs entirely off
  * COCOINDEX_DATABASE_URL's presence (user/password without it are
  * ignored); int fields parse with Python `int()`'s grammar
  * (surrounding whitespace, optional sign, single underscores between
  * digits — "64.0"/"lots"/"" fail with the exact error text). */
object PySettings {

  final case class DatabaseConnectionSpec(url: String,
      user: Option[String] = None, password: Option[String] = None,
      maxConnections: Long = 64, minConnections: Long = 16)

  final case class GlobalExecutionOptions(
      sourceMaxInflightRows: Option[Long] = Some(1024L),
      sourceMaxInflightBytes: Option[Long] = None)

  final case class Settings(database: Option[DatabaseConnectionSpec],
      appNamespace: String,
      globalExecutionOptions: GlobalExecutionOptions)

  final case class ServerSettings(address: String = "127.0.0.1:49344",
      corsOrigins: Option[Seq[String]] = None)

  /** _load_field's required-miss arm (setting.py:66). Unreachable
    * from from_env's own ladder (the url presence is pre-checked) but
    * part of the helper's contract. */
  def notSet(envName: String): String = s"$envName is not set"

  /** _load_field's parse-failure wrap (setting.py:73-75): the `from e`
    * chain surfaces this message. */
  def parseFailed(envName: String, value: String): String =
    s"failed to parse environment variable $envName: $value"

  /** Python `int(str)`: optional surrounding whitespace (UNICODE
    * whitespace — str.strip semantics, incl. NBSP), optional sign,
    * decimal digits — ANY Unicode Nd digit, not just ASCII — with
    * single underscores strictly between digits. Floats, empty
    * strings, and stray underscores raise. */
  def pythonInt(s: String): Option[Long] = {
    def isPySpace(cp: Int): Boolean =
      Character.isWhitespace(cp) || Character.isSpaceChar(cp)
    val cps = s.codePoints().toArray
    var lo = 0
    var hi = cps.length
    while (lo < hi && isPySpace(cps(lo))) lo += 1
    while (hi > lo && isPySpace(cps(hi - 1))) hi -= 1
    if (lo >= hi) return None
    var i = lo
    var sign = 1L
    if (cps(i) == '+' || cps(i) == '-') {
      if (cps(i) == '-') sign = -1L
      i += 1
    }
    if (i >= hi) return None
    var value = 0L
    var expectDigit = true
    while (i < hi) {
      val cp = cps(i)
      if (cp == '_') {
        if (expectDigit) return None // leading/doubled underscore
        expectDigit = true
      } else {
        val d = Character.digit(cp, 10)
        if (d < 0 || !Character.isDigit(cp)) return None
        value = value * 10 + d
        expectDigit = false
      }
      i += 1
    }
    if (expectDigit) None // trailing underscore (or sign only)
    else Some(sign * value)
  }

  private def intField(env: Map[String, String], name: String)
      : Either[String, Option[Long]] =
    env.get(name) match {
      case None => Right(None)
      case Some(v) =>
        pythonInt(v).toRight(parseFailed(name, v)).map(Some(_))
    }

  /** Settings.from_env (setting.py:94-136). */
  def fromEnv(env: Map[String, String]): Either[String, Settings] =
    for {
      database <- env.get("COCOINDEX_DATABASE_URL") match {
        case None => Right(None)
        case Some(url) =>
          for {
            maxC <- intField(env, "COCOINDEX_DATABASE_MAX_CONNECTIONS")
            minC <- intField(env, "COCOINDEX_DATABASE_MIN_CONNECTIONS")
          } yield Some(DatabaseConnectionSpec(url,
            user = env.get("COCOINDEX_DATABASE_USER"),
            password = env.get("COCOINDEX_DATABASE_PASSWORD"),
            maxConnections = maxC.getOrElse(64L),
            minConnections = minC.getOrElse(16L)))
      }
      rows <- intField(env, "COCOINDEX_SOURCE_MAX_INFLIGHT_ROWS")
      bytes <- intField(env, "COCOINDEX_SOURCE_MAX_INFLIGHT_BYTES")
    } yield Settings(database,
      appNamespace = env.getOrElse("COCOINDEX_APP_NAMESPACE", ""),
      globalExecutionOptions = GlobalExecutionOptions(
        sourceMaxInflightRows = rows.orElse(Some(1024L)),
        sourceMaxInflightBytes = bytes))

  /** ServerSettings.from_env (setting.py:149-163): the address
    * default, CORS parsed through the shared splitter — an env var
    * set to "" reads an EMPTY list, absent reads None. */
  def serverFromEnv(env: Map[String, String])
      : Either[String, ServerSettings] =
    Right(ServerSettings(
      address = env.getOrElse("COCOINDEX_SERVER_ADDRESS",
        "127.0.0.1:49344"),
      corsOrigins = env.get("COCOINDEX_SERVER_CORS_ORIGINS")
        .flatMap(Naming.parseCorsOrigins)))
}
