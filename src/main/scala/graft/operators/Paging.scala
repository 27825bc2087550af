package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Shared offset paging for the listing endpoints
  * ([[Bridge.documentListing]], [[Jobs.listJobs]]): drop the first
  * `offset` rows in `orderCol` order. The caller must have already
  * bounded the frame with a top-K limit — the unpartitioned
  * row_number window is safe ONLY on a bounded page, which is why
  * this lives behind one definition instead of two inlined copies
  * whose safety arguments could drift. */
object Paging {
  def dropOffset(df: DataFrame, orderCol: Column, offset: Int): DataFrame =
    if (offset <= 0) df
    else {
      val w = Window.orderBy(orderCol)
      df.withColumn("_rn", row_number().over(w))
        .where(col("_rn") > offset).drop("_rn")
    }
}
