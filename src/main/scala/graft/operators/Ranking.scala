package graft.operators

import org.apache.spark.sql.{Column, DataFrame, Row}
import org.apache.spark.sql.types.LongType

/** Distributed global ranking.
  *
  * `row_number() OVER (ORDER BY …)` with no partition key collapses the
  * whole input into ONE partition (Spark warns exactly this) — fine for
  * a 10-row result, a bottleneck for corpus-wide ranking at scale. The
  * scalable equivalent is a range-partitioned sort (each partition
  * sorted, partitions themselves ordered) + `zipWithIndex`, which
  * assigns global indexes from per-partition offsets with one extra
  * lightweight count job and no data movement beyond the sort shuffle.
  */
object Ranking {

  /** Appends `rankCol` = 1-based position of each row under the total
    * order `sort` (the caller must make it deterministic: break ties
    * down to a unique key). */
  def withGlobalRank(df: DataFrame, rankCol: String, sort: Column*): DataFrame = {
    // localCheckpoint: zipWithIndex runs a count job over the sorted
    // plan and downstream consumption would otherwise re-run the
    // reduce-side sort a second time
    val sorted = df.orderBy(sort: _*).localCheckpoint(true)
    val out = sorted.schema.add(rankCol, LongType, nullable = false)
    val rdd = sorted.rdd.zipWithIndex().map { case (r, i) =>
      Row.fromSeq(r.toSeq :+ (i + 1L))
    }
    df.sparkSession.createDataFrame(rdd, out)
  }
}
