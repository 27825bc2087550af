package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Physical-layout helpers for the 100 TB tier: bucketed co-located
  * joins and skew salting. These don't change results — only shuffle
  * structure — so they carry specs instead of oracle queries.
  */
object Layout {

  /** Write a table bucketed by `keys` so future equi-joins/aggs on the
    * same keys are shuffle-free (both sides pre-partitioned + sorted).
    * Spark bucketing requires the table catalog (saveAsTable).
    */
  def writeBucketed(df: DataFrame, table: String, buckets: Int,
      keys: Seq[String]): Unit =
    df.write
      .bucketBy(buckets, keys.head, keys.tail: _*)
      .sortBy(keys.head, keys.tail: _*)
      .mode("overwrite")
      .saveAsTable(table)

  /** Salted join for a skewed LEFT key: the left side gets a random
    * salt in [0, n); the right side is replicated n times, one row per
    * salt value — so one hot key fans out over n reducers.
    * Equi-join results are identical to the unsalted join.
    */
  def saltedJoin(left: DataFrame, right: DataFrame, key: String,
      n: Int): DataFrame = {
    val saltedL = left.withColumn("_salt",
      (rand(seed = 42) * n).cast("int"))
    val saltedR = right.crossJoin(
      right.sparkSession.range(n).select(col("id").cast("int").as("_salt")))
    saltedL.join(saltedR, Seq(key, "_salt")).drop("_salt")
  }
}
