package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
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
  *    requirement lastWinsPerKey documents. A NULL key is a key like
  *    any other (windows and the incremental fold group nulls
  *    together — the q233 null-id convention).
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

  /** THE compaction law — one definition for [[scd2]] and
    * [[scd2Append]] (which differ only in the window's ordering):
    * null-safe column-wise lag comparison, reduced with AND, anchored
    * on row_number so an all-NULL FIRST row (which would null-safe-
    * equal the lag's null defaults) still opens version 1. */
  private def compacted(log: DataFrame, keyCol: String,
      ord: Seq[Column], payloadCols: Seq[String]): DataFrame = {
    val w = Window.partitionBy(col(keyCol)).orderBy(ord: _*)
    val unchanged = payloadCols
      .map(c => col(c) <=> lag(col(c), 1).over(w))
      .reduce(_ && _)
    log.withColumn("_chg", row_number().over(w) === 1 || !unchanged)
      .where(col("_chg"))
      .drop("_chg")
  }

  /** See object doc. Output: key, version, valid_from, valid_to,
    * is_current, followed by the payload columns. */
  def scd2(df: DataFrame, keyCol: String, tsCol: String,
      payloadCols: Seq[String], tieBreakCols: Seq[String] = Nil): DataFrame = {
    require(payloadCols.nonEmpty, "scd2 needs at least one payload column")
    val ord = col(tsCol).asc +: tieBreakCols.map(col(_).asc)
    val w2 = Window.partitionBy(col(keyCol)).orderBy(ord: _*)
    compacted(df, keyCol, ord, payloadCols)
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
    * the (ts, tie-break) total order. Rows with a STRICTLY earlier ts
    * are LATE and are dropped (the watermark discipline — count them
    * upstream if they must be audited). A NULL ts can never satisfy
    * at-or-after, so null-ts batch rows are dropped for EVERY key —
    * new keys included (r19 ADVICE: the previous filter dropped them
    * only for existing keys, so the late-row rule applied
    * asymmetrically). The one-shot [[scd2]] orders null ts FIRST per
    * key; a log that carries null timestamps must be cleaned or
    * defaulted upstream before the incremental posture — fold ≡
    * one-shot is guaranteed only for non-null-ts logs. Rows at ts EQUAL to the open
    * valid_from are accepted and ordered after the seed — under the
    * contract their tie-break is later than the opening row's; a
    * contract-violating equal-ts row (earlier tie-break) is
    * UNDETECTABLE once the history has discarded the opener's
    * tie-break values, and folds in seed-first order rather than
    * being dropped. Under the contract, folding any batch split
    * equals the one-shot [[scd2]] of the whole log — the q240 gate
    * replays a 3-way split against the one-shot oracle verbatim.
    *
    * Mechanics: closed versions of touched keys pass through
    * untouched (their intervals ended before the open version
    * began); the OPEN version is re-opened as a seed log row (its
    * valid_from + payload, ordered before any equal-ts batch row),
    * the compaction law reruns over seed ∪ batch, and the recomputed
    * segment renumbers from the open version's number. A batch that
    * only repeats the open payload therefore reproduces the open
    * version verbatim — the idle fast path costs one compaction
    * window over the touched segment, never a history rewrite. All
    * key joins are null-safe (`<=>`): a null-key chain folds exactly
    * like any other key's, matching the one-shot windows.
    *
    * Scale: history is never shuffled — the batch's key set and the
    * open-version metadata broadcast (a micro-batch is small relative
    * to the history; the broadcast is also what keeps the nested fold
    * plannable: with shuffle joins here, AQE's reused-exchange
    * coalescing handed the q240 fold SMJ children with unequal
    * partition counts). The history subtree is still EVALUATED more
    * than once per fold (pass-through + seed + the openMeta
    * broadcast); in the production loop each evaluation is a scan of
    * the stored history table — a caller folding against an
    * expensive lineage persists it first (the library never hides a
    * persist). */
  def scd2Append(history: DataFrame, batch: DataFrame, keyCol: String,
      tsCol: String, payloadCols: Seq[String],
      tieBreakCols: Seq[String] = Nil): DataFrame = {
    require(payloadCols.nonEmpty, "scd2Append needs at least one payload column")
    val outCols: Seq[String] =
      Seq(keyCol, "version", "valid_from", "valid_to", "is_current") ++ payloadCols
    def tieType(c: String): DataType = batch.schema(c).dataType
    val affected = batch.select(col(keyCol).as("_akey")).distinct()
      .withColumn("_aff", lit(true))
    // one flagged classification of every history row via a BROADCAST
    // of the batch's key set; untouched keys and the touched keys'
    // CLOSED versions pass through together (their intervals ended
    // before the open version began). The explicit _aff flag (not
    // _akey null-ness) distinguishes no-match from a matched NULL key.
    val flagged = history
      .join(broadcast(affected), col(keyCol) <=> col("_akey"), "left")
      .drop("_akey")
    val isOpen = coalesce(col("_aff"), lit(false)) && col("is_current")
    val passThrough = flagged.where(!isOpen).select(outCols.map(col): _*)
    val open = flagged.where(isOpen)
    // ONE broadcast frame carries both open-version fields; its two
    // consumers join the same subtree, so the exchange is built once
    val openMeta = broadcast(open.select(col(keyCol).as("_okey"),
      col("version").as("_base_version"), col("valid_from").as("_open_from")))
    // seed: the open version as a log row; _src 0 orders it before
    // any equal-ts batch row (see the contract note above)
    val seedLog = open.select((col(keyCol) +: col("valid_from").as("_t") +:
      lit(0).as("_src") +: payloadCols.map(col)) ++
      tieBreakCols.map(c => lit(null).cast(tieType(c)).as(c)): _*)
    val batchLog = batch
      .join(openMeta, col(keyCol) <=> col("_okey"), "left")
      // null-ts rows are unorderable under the append contract: out
      // for every key, new keys included (see the contract note)
      .where(col(tsCol).isNotNull &&
        (col("_open_from").isNull || col(tsCol) >= col("_open_from")))
      .select((col(keyCol) +: col(tsCol).as("_t") +:
        lit(1).as("_src") +: payloadCols.map(col)) ++ tieBreakCols.map(col): _*)
    val ord = col("_t").asc +: col("_src").asc +: tieBreakCols.map(col(_).asc)
    val w2 = Window.partitionBy(col(keyCol)).orderBy(ord: _*)
    val recomputed =
      compacted(seedLog.unionByName(batchLog), keyCol, ord, payloadCols)
        .withColumn("_seg", row_number().over(w2))
        .withColumn("valid_from", col("_t"))
        .withColumn("valid_to", lead(col("_t"), 1).over(w2))
        .withColumn("is_current", col("valid_to").isNull)
        .join(openMeta, col(keyCol) <=> col("_okey"), "left")
        .withColumn("version",
          (coalesce(col("_base_version"), lit(1)) - 1 + col("_seg")).cast("int"))
        .select(outCols.map(col): _*)
    passThrough.unionByName(recomputed)
  }

  /** The stored-table posture of [[scd2Append]] (r19 verdict item 3 —
    * the frame law wired through a sink): returns a foreachBatch
    * function that folds each micro-batch of change-log rows into a
    * history table stored at `path`, TOUCHING ONLY THE PARTITIONS THE
    * BATCH'S KEYS LIVE IN. Layout: hash-bucketed by key (`_kb` =
    * pmod(hash(key), nBuckets) partition column); per batch the fold
    * (1) computes the batch's bucket set (≤ nBuckets values — a
    * driver-safe collect), (2) reads ONLY those partitions of the
    * stored history (partition-pruned scan), (3) runs the
    * [[scd2Append]] law, (4) dynamic-partition-overwrites only those
    * same partitions. Steady-state cost per batch is the touched
    * buckets' history, never the table; untouched buckets are never
    * read or written. The first batch (no table yet) is the one-shot
    * [[scd2]].
    *
    * The folded frame is materialized (localCheckpoint) before the
    * write — both because overwriting partitions that feed the
    * running plan is read-under-write, and because it is the
    * documented production posture of the fold ([[scd2Append]]'s
    * scale note: persist the history per batch rather than
    * re-evaluating its lineage). Restart replays are idempotent
    * under the append-only contract: a replayed row is either LATE
    * (dropped) or equal-ts-equal-payload against the open version it
    * itself created (absorbed by compaction) — StreamingSpec pins
    * fold-through-the-sink ≡ one-shot. At cluster scale the same
    * function body runs against a catalog table (Delta/Iceberg MERGE
    * keyed on (_kb, key)); the parquet layout here keeps the
    * identical dataflow shape. */
  def scd2Sink(path: String, keyCol: String, tsCol: String,
      payloadCols: Seq[String], tieBreakCols: Seq[String] = Nil,
      nBuckets: Int = 64): (DataFrame, Long) => Unit = (batch, _) =>
    if (batch.isEmpty) () // an empty FIRST batch would otherwise
    // create a schema-less parquet dir that breaks the next fold's
    // read; an empty later batch touches no buckets either way
    else {
    val spark = batch.sparkSession
    val kb = pmod(hash(col(keyCol)), lit(nBuckets))
    val hPath = new org.apache.hadoop.fs.Path(path)
    val fs = hPath.getFileSystem(spark.sparkContext.hadoopConfiguration)
    val folded =
      if (!fs.exists(hPath))
        scd2(batch, keyCol, tsCol, payloadCols, tieBreakCols)
      else {
        val touched = batch.select(kb.as("_kb")).distinct()
          .collect().map(_.getInt(0)).toSeq
        val hist = spark.read.parquet(path)
          .where(col("_kb").isin(touched: _*))
          .drop("_kb")
        scd2Append(hist, batch, keyCol, tsCol, payloadCols, tieBreakCols)
      }
    folded.withColumn("_kb", kb)
      .localCheckpoint(true)
      .write.mode("overwrite")
      .option("partitionOverwriteMode", "dynamic")
      .partitionBy("_kb")
      .parquet(path)
    ()
    }

  /** asOf-prunable storage layout: the history partitioned by each
    * version's CLOSING DAY (`_vt_day` = date of valid_to, 'open' for
    * current rows). [[asOfStored]] reads over this layout prune every
    * partition that closed wholly before the cut's day — the
    * partition-level twin of the [[asOf]] row filter (which still
    * applies to the survivors: same-day closings are row-filtered).
    * Day granularity is the crawl-corpus cadence; a table whose
    * versions churn faster partitions by the finer unit with the
    * same shape. */
  def writeForAsOf(history: DataFrame, path: String): Unit =
    history.withColumn("_vt_day",
        coalesce(date_format(col("valid_to"), "yyyy-MM-dd"), lit("open")))
      .write.mode("overwrite").partitionBy("_vt_day").parquet(path)

  /** Partition-pruned point-in-time read over a [[writeForAsOf]]
    * layout — the [[asOf]] law with the pruning predicate on the
    * partition column ('open' rows plus days ≥ the cut's day; the
    * exact half-open row filter applies on top). NewQueryPlanSpec
    * locks the pruning (the scan reads strictly fewer files than the
    * table holds once any partition is fully closed before the
    * cut). */
  def asOfStored(spark: org.apache.spark.sql.SparkSession, path: String,
      at: Column): DataFrame =
    spark.read.parquet(path)
      .where((col("_vt_day") === "open" ||
          col("_vt_day") >= date_format(at, "yyyy-MM-dd")) &&
        col("valid_from") <= at &&
        (col("valid_to").isNull || col("valid_to") > at))
      .drop("_vt_day")

  /** Point-in-time snapshot: the rows live at instant `at` — one row
    * per key whose [valid_from, valid_to) interval contains it
    * (half-open, so a version closing exactly at `at` has already
    * been replaced by its successor). Keys whose history starts
    * after `at` are absent — the corpus didn't carry them yet. This
    * is the "what did the corpus look like at cut time T" read the
    * object doc promises; a pure filter (partition-prunable when the
    * history is stored partitioned/z-ordered on the interval), no
    * shuffle, no window. */
  def asOf(history: DataFrame, at: Column): DataFrame =
    history.where(col("valid_from") <= at &&
      (col("valid_to").isNull || col("valid_to") > at))

  /** What changed between two cuts: one row per key whose live
    * payload differs between [[asOf]](t1) and [[asOf]](t2) —
    * `change` ∈ added (absent at t1), removed (absent at t2; only
    * possible when the history itself starts after t1... a key never
    * leaves an SCD2 history, so removed appears exactly when t2 <
    * t1-side first version — callers diffing backwards), changed
    * (both live, payload differs column-wise null-safely). Keys live
    * at both cuts with equal payload are silent — the diff is the
    * release-notes read, not a census. Payloads travel as
    * `<col>_before` / `<col>_after`.
    *
    * Scale: the two asOf filters scan the history (prunable) and
    * meet in ONE full-outer equi-join on the key — no window. */
  def diffSnapshots(history: DataFrame, t1: Column, t2: Column,
      keyCol: String, payloadCols: Seq[String]): DataFrame = {
    val before = asOf(history, t1).select(
      col(keyCol) +: lit(true).as("_b") +:
        payloadCols.map(c => col(c).as(s"${c}_before")): _*)
    val after = asOf(history, t2).select(
      col(keyCol).as("_k2") +: lit(true).as("_a") +:
        payloadCols.map(c => col(c).as(s"${c}_after")): _*)
    val joined = before.join(after, col(keyCol) <=> col("_k2"), "full_outer")
    val samePayload = payloadCols
      .map(c => col(s"${c}_before") <=> col(s"${c}_after"))
      .reduce(_ && _)
    joined
      .withColumn("change",
        when(col("_b").isNull, lit("added"))
          .when(col("_a").isNull, lit("removed"))
          .when(!samePayload, lit("changed")))
      .where(col("change").isNotNull)
      .select(coalesce(col(keyCol), col("_k2")).as(keyCol) +:
        col("change") +:
        payloadCols.flatMap(c =>
          Seq(col(s"${c}_before"), col(s"${c}_after"))): _*)
  }
}
