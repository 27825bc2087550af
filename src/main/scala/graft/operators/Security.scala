package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Document security / access levels (reference
  * app/models/document.py:76-77; SECURITY_LEVELS.md:5-99).
  *
  * Every document carries a `security_level` name and its numeric
  * `access_level`; a user at level L sees exactly the documents with
  * `access_level <= L` (higher levels see everything below —
  * SECURITY_LEVELS.md "Access Rules"). The filter is a plain
  * comparison on a top-level INT column, so it reaches the parquet
  * scan as a pushed filter + row-group min/max prune — at 100 TB a
  * level-1 query over a corpus partitioned or sorted by access level
  * skips the restricted bulk entirely (SecuritySpec proves the
  * pushdown).
  */
object Security {

  /** security level name → numeric access level
    * (SECURITY_LEVELS.md hierarchy; notion_connector.py:660-676).
    * Unknown levels default to employee (4) — fail closed-ish: an
    * untagged document is never public. */
  val accessLevels: Seq[(String, Int)] = Seq(
    "public" -> 1, "client" -> 2, "partner" -> 3,
    "employee" -> 4, "management" -> 5)
  val DefaultAccessLevel = 4

  def accessLevelFor(securityLevel: Column): Column =
    accessLevels.foldRight(lit(DefaultAccessLevel): Column) {
      case ((name, lvl), acc) =>
        when(securityLevel === name, lit(lvl)).otherwise(acc)
    }

  /** Tag rows with `access_level` derived from a security-level name
    * column (ingestion-side tagging, document.py:76-77). */
  def tag(df: DataFrame, securityCol: String): DataFrame =
    df.withColumn("access_level", accessLevelFor(col(securityCol)))

  /** Rows visible to a user at `userLevel` (search-side filter,
    * SECURITY_LEVELS.md "Search Filtering"). */
  def accessibleTo(df: DataFrame, userLevel: Int): DataFrame =
    df.where(col("access_level") <= userLevel)

  def accessibleTo(df: DataFrame, userLevel: Column): DataFrame =
    df.where(col("access_level") <= userLevel)
}
