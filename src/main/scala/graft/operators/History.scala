package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DataType

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

  /** Incremental SCD2 (the streaming foreachBatch posture): fold an
    * APPEND-ONLY micro-batch of change-log rows into an existing
    * [[scd2]] history, touching only the keys the batch carries.
    *
    * Append-only contract (the lines family's df-sum analogue —
    * weaker than the owner-table merges, which is inherent: change
    * compaction is order-dependent, so a batch may not interleave
    * BEFORE rows already folded): every batch row for an existing
    * key must sit at-or-after the key's open version's valid_from in
    * the (ts, tie-break) total order; rows strictly earlier are LATE
    * and are dropped (the watermark discipline — count them upstream
    * if they must be audited). Under that contract, folding any
    * batch split equals the one-shot [[scd2]] of the whole log —
    * the q240 gate replays a 3-way split against the one-shot
    * oracle verbatim.
    *
    * Mechanics: closed versions of touched keys pass through
    * untouched (their intervals ended before the open version
    * began); the OPEN version is re-opened as a seed log row (its
    * valid_from + payload, ordered before any equal-ts batch row),
    * the compaction law reruns over seed ∪ batch, and the recomputed
    * segment renumbers from the open version's number. A batch that
    * only repeats the open payload therefore reproduces the open
    * version verbatim — the idle fast path costs one compaction
    * window over the touched segment, never a history rewrite.
    *
    * Scale: untouched keys move via one anti-join (no window);
    * the windows run over |touched segment| = open versions + batch
    * rows, not the history. */
  def scd2Append(history: DataFrame, batch: DataFrame, keyCol: String,
      tsCol: String, payloadCols: Seq[String],
      tieBreakCols: Seq[String] = Nil): DataFrame = {
    require(payloadCols.nonEmpty, "scd2Append needs at least one payload column")
    val outCols: Seq[String] =
      Seq(keyCol, "version", "valid_from", "valid_to", "is_current") ++ payloadCols
    def tieType(c: String): DataType = batch.schema(c).dataType
    val affected = batch.select(col(keyCol)).distinct()
      .withColumn("_aff", lit(true))
    // ONE history scan classifies every row via a BROADCAST of the
    // batch's key set (a micro-batch is small relative to the
    // history — the knnJoin probe-side posture): untouched keys and
    // the touched keys' CLOSED versions pass through together (their
    // intervals ended before the open version began), so history is
    // never shuffled — only the seed ∪ batch segment is. The
    // broadcast is also what keeps the nested fold plannable: with
    // shuffle joins here, AQE's reused-exchange coalescing handed the
    // q240 fold SMJ children with unequal partition counts.
    val flagged = history.join(broadcast(affected), Seq(keyCol), "left")
    val isOpen = coalesce(col("_aff"), lit(false)) && col("is_current")
    val passThrough = flagged.where(!isOpen).select(outCols.map(col): _*)
    val open = flagged.where(isOpen)
    val openMeta = open.select(col(keyCol),
      col("version").as("_base_version"), col("valid_from").as("_open_from"))
    // seed: the open version as a log row; _src 0 orders it before
    // any equal-ts batch row (its tie-break values are not retained
    // in the history — the append-only contract makes them moot)
    val seedLog = open.select((col(keyCol) +: col("valid_from").as("_t") +:
      lit(0).as("_src") +: payloadCols.map(col)) ++
      tieBreakCols.map(c => lit(null).cast(tieType(c)).as(c)): _*)
    val batchLog = batch
      .join(broadcast(openMeta.select(col(keyCol), col("_open_from"))),
        Seq(keyCol), "left")
      .where(col("_open_from").isNull || col(tsCol) >= col("_open_from"))
      .select((col(keyCol) +: col(tsCol).as("_t") +:
        lit(1).as("_src") +: payloadCols.map(col)) ++ tieBreakCols.map(col): _*)
    val log = seedLog.unionByName(batchLog)
    val ord = col("_t").asc +: col("_src").asc +: tieBreakCols.map(col(_).asc)
    val w = Window.partitionBy(col(keyCol)).orderBy(ord: _*)
    val unchanged = payloadCols
      .map(c => col(c) <=> lag(col(c), 1).over(w))
      .reduce(_ && _)
    val survivors = log
      .withColumn("_chg", row_number().over(w) === 1 || !unchanged)
      .where(col("_chg"))
    val w2 = Window.partitionBy(col(keyCol)).orderBy(ord: _*)
    val recomputed = survivors
      .withColumn("_seg", row_number().over(w2))
      .withColumn("valid_from", col("_t"))
      .withColumn("valid_to", lead(col("_t"), 1).over(w2))
      .withColumn("is_current", col("valid_to").isNull)
      .join(broadcast(openMeta.select(col(keyCol), col("_base_version"))),
        Seq(keyCol), "left")
      .withColumn("version",
        (coalesce(col("_base_version"), lit(1)) - 1 + col("_seg")).cast("int"))
      .select(outCols.map(col): _*)
    passThrough.unionByName(recomputed)
  }

  /** Point-in-time snapshot: the rows live at instant `at` — one row
    * per key whose [valid_from, valid_to) interval contains it
    * (half-open, so a version closing exactly at `at` has already
    * been replaced by its successor). Keys whose history starts
    * after `at` are absent — the corpus didn't carry them yet. This
    * is the "what did the corpus look like at cut time T" read the
    * object doc promises; a pure filter (partition-prunable when the
    * history is stored partitioned/z-ordered on the interval), no
    * shuffle, no window. */
  def asOf(history: DataFrame, at: org.apache.spark.sql.Column): DataFrame =
    history.where(col("valid_from") <= at &&
      (col("valid_to").isNull || col("valid_to") > at))
}
