package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.incremental.Incremental
import graft.sources.{DriveClient, DriveFile, DrivePage, GoogleDrive}

/** In-memory Drive fixture: folders, pagination (2 files/page), a
  * trashed file, a file reachable via two folders (seen-dedup), an
  * unsupported google-apps mime, and export routing. */
object FixtureDrive {
  def file(id: String, mime: String, mtime: Long, trashed: Boolean = false,
      parents: Seq[String] = Nil): DriveFile =
    DriveFile(id, s"name-$id", mime, trashed, mtime, s"md5-$id", parents)

  val gdoc = "application/vnd.google-apps.document"
  val sheet = "application/vnd.google-apps.spreadsheet"
  val unsupported = "application/vnd.google-apps.shortcut"

  def tree(extraRoot: Seq[DriveFile] = Nil): Map[String, Seq[DriveFile]] = Map(
    "root" -> (Seq(
      file("fA", GoogleDrive.FolderMime, 0L),
      file("f1", gdoc, 1000000000L),
      file("f2", gdoc, 1500000000L, trashed = true),
      file("f3", unsupported, 1600000000L)) ++ extraRoot),
    "fA" -> Seq(
      file("f4", sheet, 2000000000L),
      file("f1", gdoc, 1000000000L), // duplicate — dedups
      file("fB", GoogleDrive.FolderMime, 0L)),
    "fB" -> Seq(file("f5", "text/plain", 3000000000L)))
}

final case class FixtureDrive(tree: Map[String, Seq[DriveFile]],
    bodies: Map[String, String]) extends DriveClient {
  def listFolder(folderId: String, pageToken: Option[String]): DrivePage = {
    val files = tree.getOrElse(folderId, Nil)
    val off = pageToken.map(_.toInt).getOrElse(0)
    val page = files.slice(off, off + 2)
    val next = if (off + 2 < files.size) Some((off + 2).toString) else None
    DrivePage(page, next)
  }
  def fetch(fileId: String, mime: String): String =
    bodies.getOrElse(fileId, s"content:$fileId:$mime")
}

class GoogleDriveSpec extends AnyFunSuite {
  lazy val spark = TestSession.spark
  import spark.implicits._

  val client = FixtureDrive(FixtureDrive.tree(), Map.empty)

  test("listing: recursion, pagination, trashed/unsupported/dup skip, export routing") {
    val got = GoogleDrive.listing(spark, client, Seq("root"))
      .select($"file_id", $"mime_type", $"export_mime", $"ordinal")
      .as[(String, String, String, Long)].collect().sortBy(_._1)
    assert(got.toSeq === Seq(
      ("f1", FixtureDrive.gdoc, "text/markdown", 1000000000L),
      ("f4", FixtureDrive.sheet, "text/csv", 2000000000L),
      ("f5", "text/plain", "text/plain", 3000000000L)))
  }

  test("fetchContent routes exports and hashes content") {
    val c = client // local capture — the closure must not drag the suite in
    val listing = GoogleDrive.listing(spark, c, Seq("root"))
    val got = GoogleDrive.fetchContent(listing, () => c)
      .select($"source_key", $"content", $"content_hash")
      .as[(String, String, String)].collect().sortBy(_._1)
    assert(got.map(r => (r._1, r._2)).toSeq === Seq(
      ("f1", "content:f1:text/markdown"),
      ("f4", "content:f4:text/csv"),
      ("f5", "content:f5:text/plain")))
    assert(got.forall(_._3.length == 64))
  }

  test("change cutoff: poll filter + 1s safe-upper-bound buffer") {
    val listing = GoogleDrive.listing(spark, client, Seq("root"))
    val changed = GoogleDrive.recentChanges(listing, 1500000000L)
      .select($"file_id").as[String].collect().sorted
    assert(changed.toSeq === Seq("f4", "f5"))
    // poll started 0.5s after the newest file: buffer clamps the cutoff
    val clamped = GoogleDrive.nextCutoff(listing, 3000500000L)
      .as[Long].head()
    assert(clamped === 3000500000L - 1000000L)
    // poll started much later: newest modifiedTime wins
    val recent = GoogleDrive.nextCutoff(listing, 5000000000L).as[Long].head()
    assert(recent === 3000000000L)
    // empty listing: safe upper bound alone
    val empty = GoogleDrive.nextCutoff(
      listing.where(lit(false)), 5000000000L).as[Long].head()
    assert(empty === 4999000000L)
  }

  test("listing feeds Incremental.diff: changed/new evaluate, vanished delete") {
    def source(c0: DriveClient) = {
      val c = c0 // local capture for the fetch closure
      GoogleDrive.fetchContent(GoogleDrive.listing(spark, c, Seq("root")), () => c)
        .select($"source_key", $"ordinal", $"content_hash")
    }
    val tracked = source(client)
      .withColumn("logic_fp", lit("fp1"))
      .withColumn("target_keys", array($"source_key"))
    // second poll: f4 touched with new content, f5 vanished, f6 new
    val t2 = FixtureDrive.tree(
      extraRoot = Seq(FixtureDrive.file("f6", FixtureDrive.gdoc, 4000000000L)))
      .map { case (k, files) =>
        k -> files.filterNot(_.id == "f5").map(f =>
          if (f.id == "f4") f.copy(modifiedTimeMicros = 4100000000L) else f)
      }
    val client2 = FixtureDrive(t2, Map("f4" -> "changed body"))
    val d = Incremental.diff(source(client2), tracked, "fp1")
    assert(d.toEvaluate.select($"source_key").as[String].collect().sorted.toSeq
      === Seq("f4", "f6"))
    assert(d.toDelete.select($"source_key").as[String].collect().toSeq === Seq("f5"))
    assert(d.ordinalOnly.count() === 0)
  }
}
