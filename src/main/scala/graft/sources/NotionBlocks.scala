package graft.sources

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Notion-connector document assembly (reference
  * app/services/notion_connector.py:30-708): a page is a list of typed
  * blocks; ingestion renders blocks → markdown (headings, lists, code,
  * quotes, and tables — :220-340) and detects change by a hash of the
  * rendered content (:624-634).
  *
  * Spark-first: blocks arrive as a JSON column (the connector's raw
  * payload landed by a fetcher job); rendering is one native
  * `from_json` + `transform` + `array_join` expression — per-row,
  * no shuffle, fully codegen-compatible inputs — and the content hash
  * is `md5` of the rendered text, joined against the tracking table by
  * graft.incremental.Incremental for the skip-unchanged tier.
  */
object NotionBlocks {

  /** Raw block schema: type, rich text, heading level, table cells. */
  val blockSchema: ArrayType = ArrayType(StructType(Seq(
    StructField("block_type", StringType),
    StructField("text", StringType),
    StructField("level", IntegerType),
    StructField("cells", ArrayType(ArrayType(StringType))))))

  /** Render a JSON block array to markdown. Unknown types pass their
    * text through (the reference's fallback, notion_connector.py:330). */
  def blocksToMarkdown(blocksJson: Column): Column = {
    val rendered = transform(from_json(blocksJson, blockSchema), b => {
      val t = b.getField("block_type")
      val tx = coalesce(b.getField("text"), lit(""))
      when(t === "heading",
          concat(repeat(lit("#"), coalesce(b.getField("level"), lit(1))),
            lit(" "), tx))
        .when(t === "bulleted_list_item", concat(lit("- "), tx))
        .when(t === "numbered_list_item", concat(lit("1. "), tx))
        .when(t === "code", concat(lit("```\n"), tx, lit("\n```")))
        .when(t === "quote", concat(lit("> "), tx))
        .when(t === "table",
          array_join(transform(b.getField("cells"),
            r => concat(lit("| "), array_join(r, " | "), lit(" |"))), "\n"))
        .otherwise(tx)
    })
    array_join(rendered, "\n\n")
  }

  /** Content hash for change detection (md5 of rendered markdown —
    * notion_connector.py:624-634). */
  def contentHash(markdown: Column): Column = md5(markdown)
}
