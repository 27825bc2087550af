package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.sources.{NotionBlockPage, NotionClient, NotionConnector}

/** Fixture Notion API: per-page block lists served 2 blocks per
  * cursor page (the has_more/next_cursor loop). */
final case class FixtureNotion(pages: Map[String, Seq[String]]) extends NotionClient {
  def listBlocks(pageId: String, startCursor: Option[String]): NotionBlockPage = {
    val blocks = pages.getOrElse(pageId, Nil)
    val off = startCursor.map(_.toInt).getOrElse(0)
    val out = blocks.slice(off, off + 2)
    val next = if (off + 2 < blocks.size) Some((off + 2).toString) else None
    NotionBlockPage(out, next)
  }
}

class NotionConnectorSpec extends AnyFunSuite {
  lazy val spark = TestSession.spark
  import spark.implicits._

  private def block(t: String, text: String, level: Int = 1): String =
    s"""{"block_type":"$t","text":"$text","level":$level}"""

  val p1Blocks = Seq(
    block("heading", "Title", 2), block("paragraph", "intro"),
    block("bulleted_list_item", "item"))

  test("paginated fetch renders markdown across cursor pages, tags access") {
    val client = FixtureNotion(Map(
      "p1" -> p1Blocks,
      "p2" -> Seq(block("quote", "wise words"))))
    val pages = Seq(("p1", "management"), ("p2", "mystery"))
      .toDF("page_id", "security_level")
    val got = NotionConnector.scanWorkspace(pages, "page_id",
        "security_level", () => client)
      .select($"page_id", $"markdown", $"access_level")
      .as[(String, String, Int)].collect().sortBy(_._1)
    // three blocks over two cursor pages concatenate in order
    assert(got(0) === ("p1", "## Title\n\nintro\n\n- item", 5))
    assert(got(1) === ("p2", "> wise words", NotionConnector.DefaultAccessLevel))
  }

  test("change detection: changed block reprocesses, unchanged content-hash skips") {
    val run1 = FixtureNotion(Map(
      "p1" -> p1Blocks, "p2" -> Seq(block("paragraph", "v1"))))
    val pages = Seq(("p1", "employee"), ("p2", "employee"))
      .toDF("page_id", "security_level")
    val stored = NotionConnector.scanWorkspace(pages, "page_id",
        "security_level", () => run1)
      .select($"page_id", $"content_hash".as("stored_hash"))
    // rerun: p2's block edited, p1 untouched, p3 brand new
    val run2 = FixtureNotion(Map(
      "p1" -> p1Blocks, "p2" -> Seq(block("paragraph", "v2")),
      "p3" -> Seq(block("paragraph", "new page"))))
    val pages2 = pages.unionByName(
      Seq(("p3", "client")).toDF("page_id", "security_level"))
    val cur = NotionConnector.scanWorkspace(pages2, "page_id",
      "security_level", () => run2)
    val changed = NotionConnector.detectChanges(cur, "page_id",
        "content_hash", stored, "page_id", "stored_hash")
      .select($"page_id").as[String].collect().sorted
    assert(changed.toSeq === Seq("p2", "p3"))
  }
}
