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

  /** A stable salt in [0, n) derived from `cols` (all columns of the
    * row when empty). Deterministic — never rand(): retried tasks and
    * incremental reruns reproduce identical partitioning regardless of
    * partition layout (a seeded rand only repeats per partition
    * index). */
  def saltCol(df: DataFrame, n: Int, cols: Seq[String] = Nil): org.apache.spark.sql.Column = {
    val basis = (if (cols.nonEmpty) cols else df.columns.toSeq).map(col)
    pmod(hash(basis: _*), lit(n))
  }

  /** Salted join for skewed LEFT keys: the left side gets a stable
    * salt in [0, n); the right side is replicated n times, one row per
    * salt value — so one hot key fans out over n reducers. This is the
    * plan-level tool for skew AQE can't rewrite (aggregation upstream,
    * or a single key overflowing one split). Equi-join results are
    * identical to the unsalted join (spec-checked).
    */
  def saltedJoin(left: DataFrame, right: DataFrame, keys: Seq[String],
      n: Int): DataFrame = {
    require(n > 0)
    require(!(left.columns ++ right.columns).contains("_salt"),
      "saltedJoin reserves the _salt column")
    val saltedL = left.withColumn("_salt", saltCol(left, n))
    val saltedR = right.withColumn("_salt",
      explode(sequence(lit(0), lit(n - 1))))
    saltedL.join(saltedR, keys :+ "_salt").drop("_salt")
  }

  def saltedJoin(left: DataFrame, right: DataFrame, key: String,
      n: Int): DataFrame = saltedJoin(left, right, Seq(key), n)
}
