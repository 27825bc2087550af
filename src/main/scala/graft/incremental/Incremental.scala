package graft.incremental

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Incremental source indexing — the reference engine's core
  * differentiator (SURVEY.md §2.8), collapsed into idempotent batch
  * transactions:
  *
  *  - one-shot update = list ⟕ tracking → process delta → MERGE
  *    (source_indexer.rs:259-393)
  *  - ordinal monotonicity: never process an ordinal older than stored;
  *    equal-or-newer ordinal with unchanged content+logic only bumps
  *    the ordinal (row_indexer.rs:110-133, 506-589 content-hash skip)
  *  - logic fingerprint: change ⇒ full reprocess of affected rows
  *    (fingerprint.rs:34-143)
  *  - precommit/commit with exact stale-key deletion: target keys per
  *    source key are recorded in tracking; on re-evaluation the old
  *    keyset minus the new keyset is deleted from the sink
  *    (row_indexer.rs:179-505, db_tracking.rs:81-330)
  *
  * Tracking row: (source_key, ordinal, content_hash, logic_fp,
  * target_keys). Stored as parquet; the same logic runs unchanged over
  * a Delta table at cluster scale.
  */
object Incremental {

  val trackingSchema: StructType = StructType(Seq(
    StructField("source_key", StringType),
    StructField("ordinal", LongType),
    StructField("content_hash", StringType),
    StructField("logic_fp", StringType),
    StructField("target_keys", ArrayType(StringType))))

  def emptyTracking(spark: SparkSession): DataFrame =
    spark.createDataFrame(spark.sparkContext.emptyRDD[org.apache.spark.sql.Row],
      trackingSchema)

  /** A column reference by LITERAL name — backtick-quoted so a dotted
    * payload name (`user.name`) is never parsed as nested-field
    * access (r19 review: the caller-supplied payload columns flow
    * through tie-break/memo expressions by name). */
  private[incremental] def quotedCol(name: String): org.apache.spark.sql.Column =
    col("`" + name.replace("`", "``") + "`")

  def readTracking(spark: SparkSession, path: String): DataFrame =
    ParquetSink.read(spark, path).getOrElse(emptyTracking(spark))

  /** The per-run delta of a keyed source versus the tracking state.
    *
    * @param toEvaluate  source rows needing (re)processing: new keys,
    *                    newer-ordinal rows with changed content, or any
    *                    non-stale row when the logic fingerprint changed
    * @param ordinalOnly rows whose ordinal advanced but content+logic
    *                    is unchanged (content-hash skip: bump only)
    * @param toDelete    tracking rows whose source key disappeared
    *                    (their target_keys become sink deletions)
    */
  final case class SourceDelta(
      toEvaluate: DataFrame, ordinalOnly: DataFrame, toDelete: DataFrame)

  /** Per-key last-wins pre-dedup of a batch (r18, closing the r17
    * pass-11 deferral): the reference serializes rows per source key —
    * every arrival runs `should_skip` against the in-memory version
    * BEFORE processing (source_indexer.rs:142-177) under a per-key
    * Semaphore(1), so of N changes for one key only the max-ordinal
    * one survives into the committed state (row_indexer.rs:110-133:
    * never process an older ordinal; an equal ordinal of the same
    * version kind skips). The batch analogue keeps exactly the
    * max-ordinal row per key, carrying THAT row's content (the
    * reference's change.data travels with its ordinal). Ordinal ties
    * between upserts are adjudicated by arrival order in the
    * reference; a batch has no arrival order, so the tie-break is a
    * deterministic total order: (content_hash desc nulls last), then
    * every remaining payload column string-cast desc nulls last in
    * name order (r19 advice: two rows tied on ordinal AND hash but
    * differing in payload are a hash-contract violation, yet the pick
    * must still be stable across runs/partitionings — the same
    * instability class Memo.cached closed in r18). Under an honored
    * hash contract the payload keys never adjudicate anything. */
  private def lastWinsPerKey(batch: DataFrame): DataFrame = {
    val payloadTieBreak = batch.columns
      .filterNot(Set("source_key", "ordinal", "content_hash"))
      .sorted.toSeq
      // quotedCol (r19 review): col() parses a dotted payload name as
      // nested-field access — a `user.name` column that previously
      // flowed through diff() untouched would throw here
      .map(c => Incremental.quotedCol(c).cast("string").desc_nulls_last)
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy("source_key")
      .orderBy(col("ordinal").desc_nulls_last +:
        col("content_hash").desc_nulls_last +: payloadTieBreak: _*)
    batch.withColumn("_lw_rn", row_number().over(w))
      .where(col("_lw_rn") === 1).drop("_lw_rn")
  }

  /** Diff `source` (columns: source_key, ordinal, content_hash, + any
    * payload) against tracking. Stale rows (ordinal < stored) are
    * dropped entirely (late-write protection, row_indexer.rs:134-178).
    * A batch carrying one source_key at several ordinals evaluates
    * last-wins (one row, the max ordinal — see [[lastWinsPerKey]]);
    * the per-key window hash-partitions by source_key, the exact
    * partitioning the tracking join needs next, so at scale the
    * exchange is reused rather than doubled. */
  def diff(source: DataFrame, tracking: DataFrame, logicFp: String): SourceDelta = {
    val t = tracking.select(
      col("source_key"), col("ordinal").as("_t_ordinal"),
      col("content_hash").as("_t_hash"), col("logic_fp").as("_t_fp"))
    val joined = lastWinsPerKey(source).join(t, Seq("source_key"), "left")
    val isNew = col("_t_ordinal").isNull
    val fresh = col("ordinal") >= col("_t_ordinal")
    // null-SAFE comparisons (r17 review pass 11): `=!=` yields SQL
    // null on a null hash, so a tracked row arriving with a null
    // content_hash fell out of BOTH the evaluate and the bump arm —
    // silently skipped. A null-vs-value (or null-vs-null-flip) hash
    // reads as changed: reprocessing is the safe law when the hash
    // is unavailable.
    val contentChanged = !(col("content_hash") <=> col("_t_hash"))
    val logicChanged = col("_t_fp") =!= lit(logicFp)
    val toEvaluate = joined
      .where(isNew || (fresh && (contentChanged || logicChanged)))
      .drop("_t_ordinal", "_t_hash", "_t_fp")
    val ordinalOnly = joined
      .where(!isNew && col("ordinal") > col("_t_ordinal") &&
        !contentChanged && !logicChanged)
      .drop("_t_ordinal", "_t_hash", "_t_fp")
    val toDelete = tracking.join(
      source.select(col("source_key")), Seq("source_key"), "left_anti")
    SourceDelta(toEvaluate, ordinalOnly, toDelete)
  }

  /** One incremental sync of a source into a sink.
    *
    * @param source   keyed snapshot: (source_key, ordinal, content_hash,
    *                 payload...)
    * @param process  evaluation: delta rows → target rows; MUST output a
    *                 `target_key` column and carry `source_key` through
    * @param logicFp  fingerprint of the processing logic + config
    * @return number of source rows evaluated (for skip/memo assertions)
    */
  def syncSource(spark: SparkSession, source: DataFrame,
      process: DataFrame => DataFrame, logicFp: String,
      sinkPath: String, trackingPath: String): Long =
    syncSourceTo(spark, source, process, logicFp,
      graft.sinks.ParquetConnector, sinkPath, trackingPath)

  /** [[syncSource]] against any registered target connector — the sink
    * side of the sync is the connector's mutation contract, so JDBC /
    * property-graph / custom stores get identical incremental
    * semantics. */
  def syncSourceTo(spark: SparkSession, source: DataFrame,
      process: DataFrame => DataFrame, logicFp: String,
      connector: graft.sinks.TargetConnector, target: String,
      trackingPath: String): Long =
    sync(spark, source, process, logicFp, connector, target, trackingPath,
      fullSnapshot = true)

  /** Change-stream variant (live_updater.rs:23-424 consumption path):
    * the batch holds only changed keys, so absence does NOT mean
    * deletion — no stale-source cleanup, everything else identical.
    */
  def applyChanges(spark: SparkSession, batch: DataFrame,
      process: DataFrame => DataFrame, logicFp: String,
      sinkPath: String, trackingPath: String): Long =
    applyChangesTo(spark, batch, process, logicFp,
      graft.sinks.ParquetConnector, sinkPath, trackingPath)

  /** [[applyChanges]] against any registered target connector. */
  def applyChangesTo(spark: SparkSession, batch: DataFrame,
      process: DataFrame => DataFrame, logicFp: String,
      connector: graft.sinks.TargetConnector, target: String,
      trackingPath: String): Long =
    sync(spark, batch, process, logicFp, connector, target, trackingPath,
      fullSnapshot = false)

  /** Change-stream variant WITH explicit removals — the event-queue
    * consumption path (amazon_s3.rs ObjectRemoved events): the batch
    * carries upserts exactly like [[applyChangesTo]], while
    * `deletedKeys` (a `source_key` frame, optionally with an `ordinal`
    * column) are synced as deletions, so their previously exported
    * target keys are cleaned exactly.
    *
    * Deletes participate in the SAME version comparison as upserts
    * (r18, closing the r17 pass-11 deferral): in the reference a
    * delete is a `SourceValue::NonExistence` whose `SourceVersion`
    * flows through the identical `should_skip` checks
    * (row_indexer.rs:99-131, source_indexer.rs:141-177), so
    *  - a replayed STALE ObjectRemoved (ordinal older than the stored
    *    row's) is skipped — it never drops a newer row;
    *  - at an ordinal TIE the delete wins (`NonExistence` outranks
    *    `CurrentLogic` in the SourceVersionKind order,
    *    row_indexer.rs:34-41, so the upsert-side skip fires first);
    *  - a delete with NO ordinal is never skippable
    *    (row_indexer.rs:117-124, the `_ => false` arm) — it always
    *    applies, and wins against same-batch upserts (the batch
    *    analogue of "cannot be adjudicated ⇒ the conservative arm").
    * When `deletedKeys` has no `ordinal` column at all, every delete
    * is the no-ordinal case: it drops the stored row unconditionally
    * AND suppresses any same-batch upsert for its key (delete-wins is
    * the convention for every unadjudicable conflict; pre-r18 the
    * upsert was diffed first and re-added the key — a
    * last-writer-raced outcome this law replaces). The S3 event-queue
    * consumer is unaffected either way: its removed keys are disjoint
    * from its re-fetched upserts by construction. */
  def applyChangeStreamTo(spark: SparkSession, batch: DataFrame,
      deletedKeys: DataFrame, process: DataFrame => DataFrame,
      logicFp: String, connector: graft.sinks.TargetConnector,
      target: String, trackingPath: String): Long =
    sync(spark, batch, process, logicFp, connector, target, trackingPath,
      fullSnapshot = false, deletedSourceKeys = Some(deletedKeys))

  private def sync(spark: SparkSession, source: DataFrame,
      process: DataFrame => DataFrame, logicFp: String,
      connector: graft.sinks.TargetConnector, target: String,
      trackingPath: String, fullSnapshot: Boolean,
      deletedSourceKeys: Option[DataFrame] = None): Long = {
    val tracking = readTracking(spark, trackingPath)

    // Cross-arm batch resolution (see applyChangeStreamTo's scaladoc
    // for the reference law): adjudicate same-key upsert-vs-delete by
    // ordinal BEFORE diffing, then ordinal-guard surviving deletes
    // against the stored row so a stale replay never drops newer data.
    val (upserts, explicitDeletes) = deletedSourceKeys match {
      case None => (source, None)
      case Some(rawKeys) if !rawKeys.columns.contains("ordinal") =>
        // no ordinals on the delete stream: never skippable
        // (row_indexer.rs:117-124) — the delete wins everywhere
        val delKeys = rawKeys.select("source_key").distinct()
        (source.join(delKeys, Seq("source_key"), "left_anti"),
          Some(tracking.join(delKeys, Seq("source_key"), "left_semi")))
      case Some(rawKeys) =>
        // in-arm last-wins: one (max-ordinal) delete per key; max()
        // ignores nulls, so a key deleted at both a known and an
        // unknown ordinal adjudicates by the known one
        val del = rawKeys.groupBy("source_key")
          .agg(max(col("ordinal")).as("_d_ord"))
          .withColumn("_d_present", lit(true))
        // an upsert survives only if STRICTLY newer than the key's
        // delete (tie → delete wins; unadjudicable → delete wins)
        val up = source.join(del, Seq("source_key"), "left")
          .where(col("_d_present").isNull ||
            (col("_d_ord").isNotNull && col("ordinal").isNotNull &&
              col("ordinal") > col("_d_ord")))
          .drop("_d_ord", "_d_present")
        // a delete survives unless a same-batch upsert is strictly
        // newer...
        val upMax = source.groupBy("source_key")
          .agg(max(col("ordinal")).as("_u_ord"))
        val liveDel = del.join(upMax, Seq("source_key"), "left")
          .where(!(col("_u_ord").isNotNull && col("_d_ord").isNotNull &&
            col("_u_ord") > col("_d_ord")))
          .select("source_key", "_d_ord")
        // ...and drops the stored row only when the stored ordinal is
        // not strictly newer (the replayed-stale-delete guard)
        val toDel = tracking.join(liveDel, Seq("source_key"))
          .where(!(col("ordinal").isNotNull && col("_d_ord").isNotNull &&
            col("ordinal") > col("_d_ord")))
          .drop("_d_ord")
        (up, Some(toDel))
    }

    val delta0 = diff(upserts, tracking, logicFp)
    val delta =
      if (fullSnapshot) delta0
      else delta0.copy(toDelete =
        explicitDeletes.getOrElse(emptyTracking(spark)))

    val evaluated = delta.toEvaluate.cache()
    val nEvaluated = evaluated.count()

    // idle-batch fast path (r17 review pass 11): a micro-batch with
    // nothing to evaluate, delete, or bump previously still rewrote
    // the ENTIRE sink (ParquetSink.merge reads + swap-rewrites) and
    // the whole tracking table — O(table) per idle trigger under the
    // live updater. State is exactly unchanged, so skip both writes.
    if (nEvaluated == 0 && delta.toDelete.isEmpty &&
        delta.ordinalOnly.isEmpty) {
      evaluated.unpersist()
      return 0L
    }

    val outputs = process(evaluated).cache()

    // new target keyset per evaluated source key (precommit record)
    val newKeys = outputs.groupBy(col("source_key"))
      .agg(collect_list(col("target_key")).as("target_keys"))
    val evaluatedTracking = evaluated
      .select(col("source_key"), col("ordinal"), col("content_hash"))
      .join(newKeys, Seq("source_key"), "left")
      .withColumn("target_keys",
        coalesce(col("target_keys"), array().cast("array<string>")))
      .withColumn("logic_fp", lit(logicFp))
      .select("source_key", "ordinal", "content_hash", "logic_fp", "target_keys")

    // exact stale-key deletion: (old keys of re-evaluated sources ∪
    // keys of deleted sources) − new keys
    //
    // CONTRACT (r18, pinned against the reference's precommit keyset
    // law): target keys are NOT shared across source keys. The
    // reference tracks target keys PER source key and deletes a
    // source row's legacy keys unconditionally — a key absent from
    // THAT row's new output is staged for deletion with no check
    // against other rows' keysets (row_indexer.rs:151-153 keyed by
    // TargetKeyPair within one source row, :353-386 legacy-key
    // deletion) — so a target key emitted by two source keys is
    // clobbered there exactly as it would be here. Every library
    // process() derives target_key injectively from source_key
    // (chunk ids, etc.); a violating process() loses rows in BOTH
    // engines, which is why this subtracts only this run's outputs.
    val oldKeysOfEvaluated = tracking
      .join(evaluated.select("source_key"), Seq("source_key"))
      .select(explode(col("target_keys")).as("target_key"))
    val keysOfDeleted = delta.toDelete
      .select(explode(col("target_keys")).as("target_key"))
    val staleKeys = oldKeysOfEvaluated.unionByName(keysOfDeleted)
      .join(outputs.select("target_key"), Seq("target_key"), "left_anti")
      .distinct()

    connector.applyMutation(spark, target,
      outputs.drop("source_key"), Seq("target_key"), Some(staleKeys))

    // commit tracking: unchanged rows + ordinal bumps + evaluated rows,
    // minus deleted sources
    val bumpKeys = delta.ordinalOnly.select(
      col("source_key"), col("ordinal").as("_new_ordinal"))
    val untouched = tracking
      .join(evaluatedTracking.select("source_key"), Seq("source_key"), "left_anti")
      .join(delta.toDelete.select("source_key"), Seq("source_key"), "left_anti")
      .join(bumpKeys, Seq("source_key"), "left")
      .withColumn("ordinal", coalesce(col("_new_ordinal"), col("ordinal")))
      .drop("_new_ordinal")
      .select("source_key", "ordinal", "content_hash", "logic_fp", "target_keys")
    ParquetSink.swapWrite(spark, trackingPath,
      untouched.unionByName(evaluatedTracking))

    evaluated.unpersist()
    outputs.unpersist()
    nEvaluated
  }
}

/** Function-level memoization (memoization.rs:17-254): a persistent
  * cache table keyed by the fingerprint of (function logic, inputs);
  * computation happens only for cache misses, via the canonical
  * left-anti-join pattern.
  */
object Memo {

  /** @param inputs   rows carrying a `_fp` fingerprint column
    * @param compute  evaluates MISSES only; must return `_fp` + value
    *                 columns (the cache row schema)
    * @return one row per distinct input `_fp` with value columns, from
    *         cache where possible; cache is appended with new results
    */
  def cached(spark: SparkSession, cachePath: String, inputs: DataFrame,
      compute: DataFrame => DataFrame): DataFrame = {
    // ONE row per _fp (r17 review pass 11): plain distinct() kept
    // every (fp, other-columns) variant, computing duplicates and
    // appending duplicate _fp cache rows that fan out every later
    // hit join. The fingerprint COVERS the inputs by contract
    // (fingerprint.rs's role), so any representative row per _fp is
    // the same input. For CONTRACT-VIOLATING inputs (same _fp,
    // different payload — r18 ADVICE) the representative is now
    // picked by a total ordering over the payload columns, so the
    // computed/cached result is stable across runs and partition
    // layouts rather than whichever row dropDuplicates kept.
    val payloadCols = inputs.columns.filterNot(_ == "_fp")
    val payloadOrderable = inputs.schema.fields
      .filter(f => payloadCols.contains(f.name))
      .forall(f => org.apache.spark.sql.catalyst.expressions
        .RowOrdering.isOrderable(f.dataType))
    val distinctIn =
      if (payloadCols.isEmpty) inputs.distinct()
      else if (payloadOrderable)
        // min over ONE struct of the payload columns: map-side
        // combinable (a row_number window here would shuffle every
        // duplicate row to its _fp's partition and sort — strictly
        // worse for the common contract-honoring caller, r18 review);
        // A deterministic total order (native struct comparison,
        // field-by-field, nulls first — NOT the r17 string-cast
        // order: "10" < "2" as strings but not as numbers; either is
        // a valid deterministic pick, pass 8). Columns re-selected in
        // the INPUT order — compute() sees the schema it was given.
        // quotedCol/getField (r19 review): dotted payload names must
        // not parse as nested access — the same class the
        // lastWinsPerKey tie-break was fixed for
        inputs.groupBy(col("_fp"))
          .agg(min(struct(payloadCols.map(Incremental.quotedCol): _*))
            .as("_rep"))
          .select(inputs.columns.map(c =>
            if (c == "_fp") col("_fp")
            else col("_rep").getField(c).as(c)): _*)
      else {
        // unorderable payload (map-typed column): the aggregate form
        // would fail analysis — keep the string-cast window for this
        // arm only (r18 pass 8: the r18 aggregate rewrite silently
        // narrowed the accepted schemas)
        val w = org.apache.spark.sql.expressions.Window
          .partitionBy("_fp")
          .orderBy(payloadCols.map(c =>
            Incremental.quotedCol(c).cast("string").asc_nulls_first): _*)
        inputs.withColumn("_memo_rn", row_number().over(w))
          .where(col("_memo_rn") === 1).drop("_memo_rn")
      }
    val prior = ParquetSink.read(spark, cachePath)
    val misses = prior match {
      case None => distinctIn
      case Some(cache) =>
        distinctIn.join(cache.select("_fp"), Seq("_fp"), "left_anti")
    }
    // the transient cache lives only for the isEmpty+write pair and
    // is RELEASED here (pass 11: it leaked one pinned RDD per call);
    // results are then served from the cache FILE just written, so
    // nothing recomputes downstream
    val computed = compute(misses).cache()
    if (!computed.isEmpty) computed.write.mode("append").parquet(cachePath)
    computed.unpersist()
    distinctIn.select("_fp")
      .join(ParquetSink.read(spark, cachePath).getOrElse(computed),
        Seq("_fp"))
  }

  /** Fingerprint of logic + input values (fingerprint.rs:34-143 role:
    * any change in the op spec or inputs changes the key). Each value
    * carries a null-flag prefix because concat_ws SKIPS null columns —
    * without it (null, "x") and ("x", null) would collide on one key
    * and serve each other's cached results.
    *
    * FORMAT IS VERSIONED (r18 ADVICE): the hashed string starts with
    * a "graft-memo-v2" tag. The r17 move to length-prefixed values
    * was a silent format break — any memo cache or tracking
    * `logic_fp` persisted under the old format stops matching on
    * upgrade (first run recomputes everything; append-only cache
    * files keep the old-format rows forever). Introducing the tag is
    * itself that break one final time — library consumers with
    * persisted r17-format caches must rotate them across this
    * upgrade (in-repo the fingerprint has only test consumers). From
    * here the version makes every next break deliberate: bump the
    * tag AND rotate `cachePath` / `trackingPath` together. */
  def fingerprint(logic: String, cols: org.apache.spark.sql.Column*): org.apache.spark.sql.Column = {
    // length-prefixed values (r17 review pass 11): a bare separator
    // is not escaped from the values, so ["x\u0000y"] and ["x","y"]
    // concatenated identically — the collision class the null flag
    // was added against, reintroduced through embedded separators.
    // "1<len>:<value>" makes every column boundary unambiguous.
    val tagged = cols.map { c =>
      val s = c.cast("string")
      when(s.isNull, lit("0"))
        .otherwise(concat(lit("1"), length(s), lit(":"), s))
    }
    sha2(concat_ws("\u0000",
      lit("graft-memo-v2") +: lit(logic) +: tagged: _*), 256)
  }
}
