package graft.operators

/** The app settings shell's deterministic wiring (app/config.py:1-99)
  * — the environment fallback chains and behavioral defaults the
  * operator tiers consume (the declarations themselves are pydantic
  * plumbing; what is modeled here is every arm with an observable
  * fork or a default another component depends on). */
object AppConfig {

  /** The security-token env map in INSERTION ORDER (config.py:52-58)
    * — the order [[LegacyIngestion.inferSecurityLevel]] scans. */
  val notionTokenEnvVars: Seq[(String, String)] = Seq(
    "public" -> "NOTION_API_KEY_PUBLIC_ACCESS",
    "client" -> "NOTION_API_KEY_CLIENT_ACCESS",
    "partner" -> "NOTION_API_KEY_PARTNER_ACCESS",
    "employee" -> "NOTION_API_KEY_EMPLOYEE_ACCESS",
    "management" -> "NOTION_API_KEY_MANAGEMENT_ACCESS")

  /** config.py:60 — `NOTION_API_KEY or NOTION_API_KEY_EMPLOYEE_ACCESS`
    * with Python `or` truthiness: an empty general key falls back to
    * the EMPLOYEE token specifically (not the scan order). */
  def notionApiKey(general: Option[String],
      employeeToken: Option[String]): String =
    general.filter(_.nonEmpty)
      .orElse(employeeToken.filter(_.nonEmpty)).getOrElse("")

  /** config.py:61 — `json.loads(env, default "[]")`: the id list is a
    * JSON ARRAY in the env var; a malformed value raises at import
    * time (modeled as Left with the JSON error). */
  def notionDatabaseIds(env: Option[String])
      : Either[String, Seq[String]] = {
    val raw = env.getOrElse("[]")
    try {
      val node = new com.fasterxml.jackson.databind.ObjectMapper()
        .readTree(raw)
      if (!node.isArray) Left(s"not a JSON array: $raw")
      else {
        val b = Seq.newBuilder[String]
        node.forEach(n => b += n.asText())
        Right(b.result())
      }
    } catch {
      case e: Exception => Left(e.getMessage)
    }
  }

  /** Behavioral defaults other tiers consume (config.py:44-50, :24):
    * the chunker defaults, the embedding model/dimension pair, the
    * Qdrant collection name, the "development"-implies-debug flag. */
  val defaultChunkSize = 500
  val defaultChunkOverlap = 50
  val embeddingModel = "text-embedding-3-small"
  val embeddingDimension = 1536
  val qdrantCollection = "document_embeddings"
  def debug(environment: String): Boolean = environment == "development"

  /** app/processors/embedder.py:11-19 — the placeholder embedding-id
    * grammar. */
  def placeholderEmbeddingId(chunkId: String): String = s"emb_$chunkId"
}
