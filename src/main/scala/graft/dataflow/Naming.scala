package graft.dataflow

/** An identifier violated the naming rules
  * (python/cocoindex/validation.py:16-19 NamingError). */
final class NamingException(msg: String) extends IllegalArgumentException(msg)

/** Identifier naming rules for flow / field / target / namespace
  * names (python/cocoindex/validation.py:12-105): non-empty, ≤64
  * chars, no leading double-underscore (reserved), and
  * `[a-zA-Z_][a-zA-Z0-9_]*` — dots additionally allowed only in FULL
  * flow names (`namespace.flow`). Applied at the same build-time
  * points as the reference (flow.py:311-313 transform fields,
  * flow.py:396 export targets, flow.py:676-677 flow names). */
object Naming {

  private val identifier = "^[a-zA-Z_][a-zA-Z0-9_]*$".r
  private val identifierWithDots = "^[a-zA-Z_][a-zA-Z0-9_.]*$".r

  /** None if valid; the error message otherwise
    * (validation.py:21-58). */
  def validateIdentifier(name: String, maxLength: Int = 64,
      allowDots: Boolean = false,
      identifierType: String = "identifier"): Option[String] = {
    if (name == null || name.isEmpty)
      Some(s"$identifierType name cannot be empty")
    else if (name.length > maxLength)
      Some(s"$identifierType name '$name' exceeds maximum length of " +
        s"$maxLength characters")
    else if (name.startsWith("__"))
      Some(s"$identifierType name '$name' cannot start with double " +
        "underscores (reserved for internal usage)")
    else {
      val (pattern, allowed) =
        if (allowDots) (identifierWithDots,
          "letters, digits, underscores, and dots")
        else (identifier, "letters, digits, and underscores")
      // full-string match, not findFirstIn: Java's $ would accept a
      // trailing newline, leaking it into column/target identifiers
      if (!pattern.matches(name))
        Some(s"$identifierType name '$name' must start with a letter or " +
          s"underscore and contain only $allowed")
      else None
    }
  }

  private def enforce(name: String, allowDots: Boolean, tpe: String): String = {
    validateIdentifier(name, allowDots = allowDots, identifierType = tpe)
      .foreach(msg => throw new NamingException(msg))
    name
  }

  def validateFieldName(name: String): String = enforce(name, false, "Field")
  def validateFlowName(name: String): String = enforce(name, false, "Flow")
  def validateFullFlowName(name: String): String = enforce(name, true, "Full flow")
  def validateAppNamespaceName(name: String): String =
    enforce(name, false, "App namespace")
  def validateTargetName(name: String): String = enforce(name, false, "Target")

  // ---- app-namespace helpers (python/cocoindex/setting.py:14-36) ----

  /** get_app_namespace: the trailing delimiter appends ONLY when the
    * namespace is non-empty AND a delimiter was asked for. */
  def appNamespaceWithDelimiter(namespace: String,
      trailingDelimiter: Option[String]): String =
    if (namespace.isEmpty || trailingDelimiter.isEmpty) namespace
    else namespace + trailingDelimiter.get

  /** split_app_namespace: split on the FIRST delimiter only; a name
    * without one is all-rest with an empty namespace. */
  def splitAppNamespace(fullName: String,
      delimiter: String): (String, String) = {
    val idx = fullName.indexOf(delimiter)
    if (idx < 0) ("", fullName)
    else (fullName.substring(0, idx),
      fullName.substring(idx + delimiter.length))
  }

  /** ServerSettings.parse_cors_origins (setting.py:173-181): split on
    * commas, strip each entry, drop empties; null stays null. */
  def parseCorsOrigins(s: String): Option[Seq[String]] =
    Option(s).map(_.split(",", -1).toSeq
      .map(_.strip).filter(_.nonEmpty))
}
