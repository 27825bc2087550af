package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.LongType

/** Parquet table loader for the driver-provided star schema
  * (TESTDATA.md). All operators take DataFrames; this is only the
  * convenience binding for `SparkEntry.queries` / `Bench`.
  *
  * At cluster scale the same operators run over any parquet/Delta
  * path — nothing here assumes local mode.
  */
object Tables {
  val all: Seq[String] = Seq(
    "region", "nation", "customer", "supplier", "part",
    "orders", "lineitem", "events", "documents", "embeddings")

  /** Sessions must set this so TIMESTAMP(NANOS) parquet (events.ts) is
    * readable; [[load]] then rebuilds a proper micro-precision
    * timestamp (truncation — matches DuckDB's ns→us read behavior).
    */
  val nanosConf: (String, String) = ("spark.sql.legacy.parquet.nanosAsLong", "true")

  def load(spark: SparkSession, sfDir: String, name: String): DataFrame = {
    val df = spark.read.parquet(s"$sfDir/$name.parquet")
    if (name == "events" && df.schema("ts").dataType == LongType)
      df.withColumn("ts", timestamp_micros(expr("ts div 1000")))
    else df
  }
}
