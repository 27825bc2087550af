package graft.streaming

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.streaming.{StreamingQuery, Trigger}
import org.apache.spark.sql.types.StructType

import graft.incremental.Incremental

/** Live update loop (live_updater.rs:23-424, SURVEY.md §2.8):
  * a streaming source of changed rows, applied to a sink with the same
  * ordinal/content-hash/fingerprint guards as the batch path.
  *
  * Spark-first shape: `readStream` (file source — each landed file is
  * a change batch) → `foreachBatch` running
  * [[Incremental.applyChanges]] — i.e. the change stream and the
  * one-shot update share ALL the indexing logic; the stream only
  * supplies batches. Checkpointing gives the ack semantics of the
  * reference's change_stream (interface.rs:92-105): a batch is
  * re-delivered if the job dies before commit, and re-applying is
  * idempotent thanks to the ordinal guard.
  *
  * `refresh_interval` (spec.rs:247-262) maps to the trigger.
  */
object LiveUpdater {

  /** Start a live updater over a directory of parquet change files.
    *
    * @param process same contract as Incremental.syncSource: delta
    *                rows → target rows with `target_key` + `source_key`
    */
  def start(spark: SparkSession, inputDir: String, schema: StructType,
      process: DataFrame => DataFrame, logicFp: String,
      sinkPath: String, trackingPath: String, checkpoint: String,
      trigger: Trigger = Trigger.AvailableNow()): StreamingQuery =
    startTo(spark, inputDir, schema, process, logicFp,
      graft.sinks.ParquetConnector, sinkPath, trackingPath, checkpoint, trigger)

  /** [[start]] against any target connector: the stream lands in a
    * JDBC table / property graph / custom store with the same
    * incremental guards — `foreachBatch` + connector mutation is the
    * Spark shape of the reference's per-target export pipeline.
    */
  def startTo(spark: SparkSession, inputDir: String, schema: StructType,
      process: DataFrame => DataFrame, logicFp: String,
      connector: graft.sinks.TargetConnector, target: String,
      trackingPath: String, checkpoint: String,
      trigger: Trigger = Trigger.AvailableNow()): StreamingQuery =
    spark.readStream
      .schema(schema)
      .parquet(inputDir)
      .writeStream
      .option("checkpointLocation", checkpoint)
      .trigger(trigger)
      .foreachBatch { (batch: DataFrame, _: Long) =>
        Incremental.applyChangesTo(
          batch.sparkSession, batch, process, logicFp, connector, target,
          trackingPath)
        ()
      }
      .start()
}
