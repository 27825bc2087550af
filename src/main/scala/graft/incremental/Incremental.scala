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

  /** Diff `source` (columns: source_key, ordinal, content_hash, + any
    * payload) against tracking. Stale rows (ordinal < stored) are
    * dropped entirely (late-write protection, row_indexer.rs:134-178).
    */
  def diff(source: DataFrame, tracking: DataFrame, logicFp: String): SourceDelta = {
    val t = tracking.select(
      col("source_key"), col("ordinal").as("_t_ordinal"),
      col("content_hash").as("_t_hash"), col("logic_fp").as("_t_fp"))
    val joined = source.join(t, Seq("source_key"), "left")
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
    * `deletedKeys` (a `source_key` frame) are synced as deletions, so
    * their previously exported target keys are cleaned exactly. */
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
    val delta0 = diff(source, tracking, logicFp)
    val delta =
      if (fullSnapshot) delta0
      else delta0.copy(toDelete = deletedSourceKeys match {
        case Some(keys) =>
          tracking.join(keys.select(col("source_key")), Seq("source_key"), "left_semi")
        case None => emptyTracking(spark)
      })

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
    // the same input; violating callers were silently multiplying
    // results before, they get one deterministic computation now.
    val distinctIn = inputs.dropDuplicates("_fp")
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
    * and serve each other's cached results. */
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
    sha2(concat_ws("\u0000", lit(logic) +: tagged: _*), 256)
  }
}
