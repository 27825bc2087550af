package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Document-parsing boundary (the reference pipeline's front door):
  * LlamaParse tier routing + confidence heuristic + inline-content
  * fast path (app/processors/parser.py:18-244,
  * app/tasks/document_tasks.py:253-287).
  *
  * Routing precedence (faithful to the reference's control flow):
  *  1. no source URL but inline content → `inline_content`
  *     (document_tasks.py:253-287 — the fast path runs before any
  *     parser is constructed);
  *  2. `.txt` / `.md` name → `simple` (parser.py:50-72 — plain read,
  *     no LlamaParse call);
  *  3. otherwise → `llamaparse` through a [[ParserClient]] with the
  *     tier's config (parser.py:189-212).
  *
  * Spark shape: ONE narrow `mapPartitions` pass — the client is only
  * invoked for llamaparse-routed rows, bypass rows stream through the
  * same iterator, so there is no split/union/join in the plan and the
  * operator scales as a map over the corpus. The client is constructed
  * once per partition (the EmbedText / Rerank boundary pattern).
  */
trait ParserClient extends Serializable {
  /** Parse one batch of (documentName, rawContent) under a tier config
    * (one batch = one provider round-trip). Returns markdown text per
    * document (`result_type="markdown"`, parser.py:122). */
  def parseBatch(docs: Seq[(String, String)],
      config: Map[String, String]): Seq[String]
}

/** Deterministic stub: markdown passthrough — the parse contract
  * without the network (the container has no LlamaParse service); the
  * Spark-side plumbing (routing, batching, tier configs, confidence)
  * is real and oracle-checked. */
final case class StubParserClient() extends ParserClient {
  def parseBatch(docs: Seq[(String, String)],
      config: Map[String, String]): Seq[String] = docs.map(_._2)
}

object Parse {

  val TierBalanced = "balanced"
  val TierAgentic = "agentic"
  val TierAgenticPlus = "agentic_plus"

  /** Per-tier LlamaParse configuration (parser.py:189-212). */
  val tierConfigs: Map[String, Map[String, String]] = Map(
    TierBalanced -> Map(
      "parsing_instruction" -> "Extract all text content maintaining structure",
      "skip_diagonal_text" -> "true",
      "invalidate_cache" -> "false"),
    TierAgentic -> Map(
      "parsing_instruction" -> "Extract and structure all content with high accuracy",
      "skip_diagonal_text" -> "false",
      "invalidate_cache" -> "false",
      "premium_mode" -> "true"),
    TierAgenticPlus -> Map(
      "parsing_instruction" -> "Extract all content with maximum accuracy and detail",
      "skip_diagonal_text" -> "false",
      "invalidate_cache" -> "true",
      "premium_mode" -> "true",
      "extract_tables" -> "true"))

  /** Route a document to its parser (see class doc for precedence). */
  def route(urlCol: Column, contentCol: Column, nameCol: Column): Column =
    when((urlCol.isNull || urlCol === "") && contentCol.isNotNull,
        lit("inline_content"))
      .when(lower(nameCol).rlike("\\.(txt|md)$"), lit("simple"))
      .otherwise(lit("llamaparse"))

  /** Parse confidence (parser.py:227-244: tier base 0.7/0.85/0.95,
    * +0.05 for >1000 chars, +0.05 for >5000 chars, capped at 1.0;
    * inline fast path fixed 0.9, document_tasks.py:255; simple reader
    * 1.0, parser.py:61). Plain double arithmetic in a fixed order so
    * the DuckDB oracle is bit-identical. */
  def confidence(parserCol: Column, tierCol: Column, textLen: Column): Column = {
    val base = when(tierCol === TierAgenticPlus, lit(0.95))
      .when(tierCol === TierAgentic, lit(0.85))
      .otherwise(lit(0.7))
    when(parserCol === "inline_content", lit(0.9))
      .when(parserCol === "simple", lit(1.0))
      .otherwise(least(
        base + when(textLen > 1000, lit(0.05)).otherwise(lit(0.0))
             + when(textLen > 5000, lit(0.05)).otherwise(lit(0.0)),
        lit(1.0)))
  }

  /** Parse a document frame. Input columns: `idCol` (long-castable
    * key), `nameCol` (file name — drives the simple-reader route),
    * `urlCol` (source URL, null/empty → inline fast path),
    * `contentCol` (raw content: the landed file body, or the inline
    * content for the fast path), `tierCol` (requested LlamaParse tier,
    * used only on the llamaparse route).
    *
    * Output: (id, parser, parse_tier, parsed_text, parse_confidence,
    * parsed_text_length) — parse_tier is null off the llamaparse route
    * (the reference records `parser: inline_content` with no tier,
    * document_tasks.py:258-263). Join back on `id` for the original
    * columns.
    */
  def parse(docs: DataFrame, idCol: String, nameCol: String, urlCol: String,
      contentCol: String, tierCol: String, mkClient: () => ParserClient,
      batchSize: Int = 8): DataFrame = {
    val spark = docs.sparkSession
    import spark.implicits._
    val routed = graft.Partitioning.spread(docs.select(
        col(idCol).cast("long"), col(nameCol).cast("string"),
        col(urlCol).cast("string"), col(contentCol).cast("string"),
        col(tierCol).cast("string"))
      .withColumn("_route",
        route(col(urlCol), col(contentCol), col(nameCol))))
      .as[(Long, String, String, String, String, String)]
    val parsed = routed.mapPartitions { it =>
      val client = mkClient()
      it.grouped(batchSize).flatMap { batch =>
        // client round-trips only for llamaparse rows, one call per
        // tier present in the batch; bypass rows pass through untouched
        val llp = batch.zipWithIndex.filter(_._1._6 == "llamaparse")
        val parsedByIdx: Map[Int, String] = llp.groupBy(_._1._5).iterator.flatMap {
          case (tier, rows) =>
            val cfg = tierConfigs.getOrElse(tier, tierConfigs(TierBalanced))
            val out = client.parseBatch(
              rows.map(r => (r._1._2, Option(r._1._4).getOrElse(""))), cfg)
            rows.map(_._2).zip(out)
        }.toMap
        batch.zipWithIndex.map { case ((id, _, _, content, tier, route), i) =>
          val text = parsedByIdx.getOrElse(i, content)
          (id, route, if (route == "llamaparse") tier else null, text)
        }
      }
    }.toDF("id", "parser", "parse_tier", "parsed_text")
    parsed
      .withColumn("parse_confidence",
        confidence(col("parser"), col("parse_tier"),
          length(col("parsed_text"))))
      .withColumn("parsed_text_length",
        length(col("parsed_text")).cast("long"))
  }
}
