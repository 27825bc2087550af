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

  /** A content-stable salt in [0, n) derived from `cols` (all columns
    * of the row when empty). Use for salted AGGREGATION (two-stage
    * partial → final), where grouping duplicate contents together is
    * exactly right. For joins use [[saltedJoin]], whose salt must be
    * row-unique — duplicate rows of one hot key would otherwise share
    * a salt and re-concentrate on one reducer. */
  def saltCol(df: DataFrame, n: Int, cols: Seq[String] = Nil): org.apache.spark.sql.Column = {
    val basis = (if (cols.nonEmpty) cols else df.columns.toSeq).map(col)
    pmod(hash(basis: _*), lit(n))
  }

  /** Salted join for skewed LEFT keys: each left ROW gets a salt in
    * [0, n) (position-derived — unique even across byte-identical
    * duplicate rows, where a content hash would collapse to one salt
    * and a seeded rand() would depend on partition layout); the right
    * side is replicated n times, one row per salt value — so one hot
    * key fans out over n reducers. This is the plan-level tool for
    * skew AQE can't rewrite (aggregation upstream, or a single key
    * overflowing one split). Any salt value in [0, n) yields the same
    * join output, so the salt choice never affects results — identical
    * to the unsalted join (spec-checked).
    */
  def saltedJoin(left: DataFrame, right: DataFrame, keys: Seq[String],
      n: Int): DataFrame = {
    require(n > 0)
    require(!(left.columns ++ right.columns).contains("_salt"),
      "saltedJoin reserves the _salt column")
    val saltedL = left.withColumn("_salt", joinSaltCol(n))
    val saltedR = right.withColumn("_salt",
      explode(sequence(lit(0), lit(n - 1))))
    saltedL.join(saltedR, keys :+ "_salt").drop("_salt")
  }

  def saltedJoin(left: DataFrame, right: DataFrame, key: String,
      n: Int): DataFrame = saltedJoin(left, right, Seq(key), n)

  /** Row-unique join salt (spec-visible for spread assertions). */
  private[graft] def joinSaltCol(n: Int): org.apache.spark.sql.Column =
    pmod(hash(monotonically_increasing_id()), lit(n))

  /** Bloom-pruned equi-join: aggregate the SMALL side's keys into one
    * Bloom bit-set row, broadcast it, and drop big-side rows that
    * can't match BEFORE the join shuffle — the classic semi-join
    * prune. Bloom has no false negatives, so results are identical to
    * `big.join(small, key)` (spec-checked); false positives only cost
    * a few extra rows entering the join. At 100 TB this turns a
    * full-corpus shuffle into a shuffle of the matching fraction for
    * the price of one broadcast bit set.
    */
  def bloomPruneJoin(big: DataFrame, small: DataFrame, key: String,
      m: Int = 1 << 20, k: Int = 3): DataFrame = {
    import graft.functions.Sketch
    require(!big.columns.contains("_bloom_bits"),
      "bloomPruneJoin reserves the _bloom_bits column")
    val bloom = small.agg(
      Sketch.bloomBits(col(key).cast("string"), m, k).as("_bloom_bits"))
    val probes = (0 until k).map(i =>
      pmod(graft.functions.Sketch.hash48Of(
        concat(lit(s"$i:"), col(key).cast("string"))), lit(m.toLong)).cast("int"))
    val pruned = big.crossJoin(broadcast(bloom))
      .where(probes.map(p => array_contains(col("_bloom_bits"), p)).reduce(_ && _))
      .drop("_bloom_bits")
    pruned.join(small, key)
  }
}
