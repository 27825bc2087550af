package graft

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Bucketed table layout — the shuffle-elimination lever for 100 TB
  * repeated joins/aggregations.
  *
  * A join of two tables bucketed by the join key into the SAME bucket
  * count is planned with zero Exchange operators: each task reads
  * matching bucket files from both sides (BucketingSpec proves the
  * plan). At cluster scale this is how the chunk↔document↔embedding
  * joins the engine runs every query avoid reshuffling the corpus:
  * ingest writes the big tables bucketed by their key once, every
  * later join is co-located. Sorting within buckets additionally lets
  * SortMergeJoin skip its sort.
  */
object Bucketing {

  /** Write `df` as a bucketed (and in-bucket sorted) table. The
    * managed-table requirement comes from Spark: bucket metadata
    * lives in the catalog. */
  def writeBucketed(df: DataFrame, table: String, keyCols: Seq[String],
      buckets: Int): Unit =
    df.write
      .bucketBy(buckets, keyCols.head, keyCols.tail: _*)
      .sortBy(keyCols.head, keyCols.tail: _*)
      .mode("overwrite")
      .saveAsTable(table)
}

/** Skew mitigation for joins whose key distribution is heavy-tailed
  * (the hot-document / hot-entity case).
  *
  * AQE's skew-join split (on by default in Sessions.local) handles
  * sort-merge skew at runtime; salting is the plan-level tool for the
  * cases AQE can't rewrite — e.g. when the skewed side must stream
  * through an aggregation first, or a key is so hot a single split
  * still overflows. The salt is DETERMINISTIC (hash of the whole row,
  * never rand()) so retried tasks and incremental reruns reproduce
  * identical partitioning.
  */
object Skew {

  /** A stable salt in [0, salts) derived from `cols` (all columns of
    * the row when empty). */
  def saltCol(df: DataFrame, salts: Int, cols: Seq[String] = Nil): Column = {
    val basis = (if (cols.nonEmpty) cols else df.columns.toSeq).map(col)
    pmod(hash(basis: _*), lit(salts))
  }

  /** Skew-safe equi-join: the (big, skewed) left side gets a stable
    * salt; the (smaller) right side is replicated once per salt value;
    * the join key becomes (key, salt), splitting each hot key's rows
    * across `salts` reducers. Result is row-identical to
    * `left.join(right, keys)` (spec-checked).
    */
  def saltedJoin(left: DataFrame, right: DataFrame, keys: Seq[String],
      salts: Int): DataFrame = {
    require(salts > 0)
    require(!(left.columns ++ right.columns).contains("_salt"),
      "saltedJoin reserves the _salt column")
    val l = left.withColumn("_salt", saltCol(left, salts))
    val r = right.withColumn("_salt",
      explode(sequence(lit(0), lit(salts - 1))))
    l.join(r, keys :+ "_salt").drop("_salt")
  }
}
