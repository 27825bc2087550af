package graft.sources

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** One blocks.children.list page: block JSON objects + continuation
  * cursor (notion_connector.py:305-345's has_more/next_cursor loop). */
case class NotionBlockPage(blocks: Seq[String], nextCursor: Option[String])

/** The Notion API boundary. A real implementation wraps the HTTP
  * client (with the per-security-level API key selection of
  * notion_connector.py:33-56); tests use a deterministic fixture. */
trait NotionClient extends Serializable {
  /** One page of a Notion page's block children. */
  def listBlocks(pageId: String, startCursor: Option[String]): NotionBlockPage
}

/** Notion connector tier (app/connectors/notion_connector.py:30-708)
  * on top of [[NotionBlocks]]'s block→markdown rendering: the
  * paginated block fetch boundary, security tagging, and content-hash
  * change detection.
  *
  * Spark shape: the page list is the DataFrame; the block fetch is a
  * `mapPartitions` with one client per partition running the
  * cursor loop per page (the reference's per-page async fetch);
  * rendering/hash/tagging are native column expressions; change
  * detection is a left join against the stored-hash table.
  */
object NotionConnector {

  /** security level → numeric access level
    * (notion_connector.py:660-676); canonical map lives in
    * [[graft.operators.Security]] — document-level security is wider
    * than the Notion tier. */
  val accessLevels: Seq[(String, Int)] = graft.operators.Security.accessLevels
  val DefaultAccessLevel: Int = graft.operators.Security.DefaultAccessLevel

  def accessLevelFor(securityLevel: Column): Column =
    graft.operators.Security.accessLevelFor(securityLevel)

  /** Paginated block fetch: for each page row, loop the cursor until
    * has_more is false, concatenating block objects into one JSON
    * array (the _fetch_page_content loop, notion_connector.py:308-345).
    * Output: input columns + `blocks_json`. */
  def fetchBlocks(pages: DataFrame, idCol: String,
      mkClient: () => NotionClient): DataFrame = {
    val spark = pages.sparkSession
    import spark.implicits._
    val fetched = graft.Partitioning.spread(
        pages.select(col(idCol).cast("string")))
      .as[String]
      .mapPartitions { it =>
        val client = mkClient()
        it.map { pageId =>
          val all = Seq.newBuilder[String]
          var cursor: Option[String] = None
          var more = true
          while (more) {
            val page = client.listBlocks(pageId, cursor)
            all ++= page.blocks
            cursor = page.nextCursor
            more = cursor.isDefined
          }
          (pageId, all.result().mkString("[", ",", "]"))
        }
      }
      .toDF(idCol, "blocks_json")
    pages.join(fetched, Seq(idCol))
  }

  /** Full scan_workspace shape (notion_connector.py:678-708): fetch →
    * render markdown → content hash → access tagging. `securityCol`
    * is the page's security level string (SECURITY_LEVELS.md tiering,
    * document.py:76-77). */
  def scanWorkspace(pages: DataFrame, idCol: String, securityCol: String,
      mkClient: () => NotionClient): DataFrame =
    fetchBlocks(pages, idCol, mkClient)
      .withColumn("markdown", NotionBlocks.blocksToMarkdown(col("blocks_json")))
      .withColumn("content_hash", NotionBlocks.contentHash(col("markdown")))
      .withColumn("access_level", accessLevelFor(col(securityCol)))

  /** detect_changes (notion_connector.py:635-658): pages whose current
    * content hash differs from the stored hash; pages with NO stored
    * hash count as changed (stored_hashes.get(id) != current). */
  def detectChanges(current: DataFrame, idCol: String, hashCol: String,
      stored: DataFrame, storedIdCol: String, storedHashCol: String): DataFrame = {
    val s = stored.select(col(storedIdCol).as(idCol),
      col(storedHashCol).as("_stored_hash"))
    current.join(s, Seq(idCol), "left")
      .where(col("_stored_hash").isNull || col(hashCol) =!= col("_stored_hash"))
      .drop("_stored_hash")
  }
}
