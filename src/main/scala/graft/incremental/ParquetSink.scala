package graft.incremental

import java.nio.file.{Files, Path, Paths}
import java.util.Comparator

import org.apache.spark.sql.{DataFrame, SaveMode, SparkSession}
import org.apache.spark.sql.functions._

/** Primary-key MERGE onto a parquet path by rewrite-and-swap.
  *
  * Semantics of the reference's export mutation (interface.rs:306-309,
  * postgres.rs:742-780): upserts replace rows with equal primary key,
  * `deletes` removes rows by key, everything else is preserved.
  *
  * Plain parquet has no transactional MERGE, so this rewrites into a
  * staging dir and swaps. That is correct single-writer behavior (the
  * incremental driver is single-writer per sink, like the reference's
  * per-source indexing loop). On a cluster deployment the same call
  * maps 1:1 onto Delta Lake `MERGE INTO` / JDBC upsert — only this
  * file changes; rewrite cost then becomes O(delta), not O(table).
  */
object ParquetSink {

  def exists(path: String): Boolean = Files.exists(Paths.get(path))

  def read(spark: SparkSession, path: String): Option[DataFrame] =
    if (exists(path)) Some(spark.read.parquet(path)) else None

  /** Upsert `rows` on `primaryKey`; additionally drop keys present in
    * `deletes` (a DataFrame holding the primary-key columns).
    */
  def merge(spark: SparkSession, path: String, rows: DataFrame,
      primaryKey: Seq[String], deletes: Option[DataFrame]): Unit = {
    val result = read(spark, path) match {
      case None =>
        deletes match {
          case Some(d) => rows.join(d, primaryKey, "left_anti")
          case None => rows
        }
      case Some(existing) =>
        val upsertKeys = rows.select(primaryKey.map(col): _*).distinct()
        val removed = deletes
          .map(d => upsertKeys.unionByName(d.select(primaryKey.map(col): _*)).distinct())
          .getOrElse(upsertKeys)
        val kept = existing.join(removed, primaryKey, "left_anti")
        val newRows = deletes match {
          case Some(d) => rows.join(d, primaryKey, "left_anti")
          case None => rows
        }
        kept.unionByName(newRows)
    }
    swapWrite(spark, path, result)
  }

  /** Write `df` to `path` via a staging dir + atomic-ish swap; safe to
    * call when `df`'s plan reads from `path` itself.
    */
  def swapWrite(spark: SparkSession, path: String, df: DataFrame): Unit = {
    val staging = path + ".staging"
    df.write.mode(SaveMode.Overwrite).parquet(staging)
    val old = Paths.get(path)
    if (Files.exists(old)) deleteRecursively(old)
    Files.move(Paths.get(staging), old)
  }

  private def deleteRecursively(p: Path): Unit =
    Files.walk(p).sorted(Comparator.reverseOrder[Path]()).forEach(f => Files.delete(f))
}
