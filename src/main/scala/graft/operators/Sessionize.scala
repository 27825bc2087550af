package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Event sessionization: split each user's event stream into sessions
  * at inactivity gaps > `gapMinutes`.
  *
  * Batch shape (lag + running sum over a per-user window — one shuffle
  * on user_id); the streaming twin is
  * `flatMapGroupsWithState` keyed by user (see graft.streaming).
  * Time arithmetic in exact integer microseconds for oracle parity.
  */
object Sessionize {

  def sessions(events: DataFrame, userCol: String, tsCol: String,
      idCol: String, gapMinutes: Int): DataFrame = {
    val gapMicros = gapMinutes.toLong * 60L * 1000000L
    val withGap = events
      .withColumn("ts_us", unix_micros(col(tsCol).cast("timestamp")))
      .withColumn("prev_us", lag(col("ts_us"), 1).over(
        Window.partitionBy(col(userCol)).orderBy(col("ts_us"), col(idCol))))
      .withColumn("new_session",
        when(col("prev_us").isNull || col("ts_us") - col("prev_us") > gapMicros, 1)
          .otherwise(0))
    val wRun = Window.partitionBy(col(userCol))
      .orderBy(col("ts_us"), col(idCol))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    withGap
      .withColumn("session_index", sum(col("new_session")).over(wRun))
      .groupBy(col(userCol), col("session_index"))
      .agg(
        count(lit(1)).as("n_events"),
        min(col("ts_us")).as("start_us"),
        max(col("ts_us")).as("end_us"))
      .withColumn("duration_us", col("end_us") - col("start_us"))
  }
}
