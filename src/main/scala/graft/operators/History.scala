package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Change-log → validity-interval history (SCD type 2): turn an
  * append-only event/change log into one row per (key, version) with
  * [valid_from, valid_to) intervals — the document-version-history
  * face of a snapshot-crawl corpus (which text did source_key carry
  * between crawl t and crawl t+1?). Beyond-reference tier; the
  * reference's nearest surface is the tracking table's ordinal chain
  * (row_indexer.rs:110-133), which keeps only the LATEST version —
  * SCD2 keeps them all, which is what a release needs to answer
  * "what did the corpus look like at cut time T".
  *
  * Laws (oracle-pinned by the q239 gate, spec-pinned edge cases):
  *  - Total order per key: (tsCol, tieBreakCols...) ascending — the
  *    tie-break makes same-timestamp rows deterministic, the same
  *    requirement lastWinsPerKey documents.
  *  - Change compaction: a row whose payload is unchanged from its
  *    predecessor (null-safe, column-wise — NULL equals NULL, the
  *    <=> convention) opens no new version; equality is transitive,
  *    so lag-against-immediate-predecessor keeps exactly the first
  *    row of every equal-payload run. A REVERT (A B A) is three
  *    versions — SCD2 history is positional, not set-like.
  *  - Intervals: valid_from = the surviving row's ts, valid_to =
  *    the NEXT surviving row's ts (NULL on the open current row),
  *    version = 1-based per key in order, is_current = open row.
  *
  * Scale: one hash-partition by key for the two windows (compaction
  * lag + interval lead share the same partitioning, so Catalyst
  * plans ONE exchange); no join, no driver state. Key cardinality is
  * the parallelism unit — per-key history length only bounds the
  * within-partition sort, which spills. 100 TB posture: this is a
  * single shuffle of the change log, the floor for any
  * order-dependent per-key law.
  */
object History {

  /** See object doc. Output: key, version, valid_from, valid_to,
    * is_current, followed by the payload columns. */
  def scd2(df: DataFrame, keyCol: String, tsCol: String,
      payloadCols: Seq[String], tieBreakCols: Seq[String] = Nil): DataFrame = {
    require(payloadCols.nonEmpty, "scd2 needs at least one payload column")
    val ord = col(tsCol).asc +: tieBreakCols.map(col(_).asc)
    val w = Window.partitionBy(col(keyCol)).orderBy(ord: _*)
    val unchanged = payloadCols
      .map(c => col(c) <=> lag(col(c), 1).over(w))
      .reduce(_ && _)
    // first row per key: lag is null on every column; a payload of
    // all-NULLs would null-safe-equal it, so anchor on row_number
    val changed = row_number().over(w) === 1 || !unchanged
    val survivors = df
      .withColumn("_chg", changed)
      .where(col("_chg"))
      .drop("_chg")
    val w2 = Window.partitionBy(col(keyCol)).orderBy(ord: _*)
    survivors
      .withColumn("version", row_number().over(w2))
      .withColumn("valid_from", col(tsCol))
      .withColumn("valid_to", lead(col(tsCol), 1).over(w2))
      .withColumn("is_current", col("valid_to").isNull)
      .select((col(keyCol) +: col("version") +: col("valid_from") +:
        col("valid_to") +: col("is_current") +:
        payloadCols.map(col)): _*)
  }
}
