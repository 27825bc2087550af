package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** As-of join: enrich each left row with the LATEST right row at or
  * before its timestamp within the same key — the standard
  * event-enrichment / point-in-time-correctness operator for
  * training-data pipelines (match features as they were when the
  * event happened, no lookahead leakage).
  *
  * Spark-first shape: Spark has no ASOF JOIN operator and a naive
  * range join explodes into an O(|L|·|R|) band per key. This is the
  * union-and-carry formulation instead: tag both sides, union, ONE
  * window pass per key ordered by (ts, side) carrying the last seen
  * right row forward as a single struct (atomic — a partially-null
  * right payload can never mix rows), keep left rows. One shuffle on
  * the key, linear work, no join explosion — survives arbitrary key
  * fan-in. Ties (right.ts == left.ts) match, as-of convention.
  * NULL-ts rows sort first (Spark ASC NULLS FIRST) and are NOT
  * inert: a null-ts LEFT row matches only a null-ts RIGHT row, and a
  * null-ts RIGHT row acts as a minus-infinity match — it carries to
  * EVERY left row of its key until a later right row supersedes it.
  * Null timestamps are garbage-in: filter them upstream on BOTH
  * sides; the behavior here is merely deterministic, not meaningful.
  */
object AsOfJoin {

  /** @param left      rows to enrich
    * @param right     lookup rows; at most one per (key, ts) —
    *                  pre-dedupe upstream for determinism
    * @param keyCol    equi-key column present on both sides
    * @param leftTs    left ordering column (numeric/timestamp)
    * @param rightTs   right ordering column (same type)
    * @param rightCols right payload columns to carry; output columns
    *                  are `asof_<rightTs>` and `asof_<name>`, all null
    *                  when the key has no right row at or before ts
    */
  def asOf(left: DataFrame, right: DataFrame, keyCol: String,
      leftTs: String, rightTs: String, rightCols: Seq[String]): DataFrame = {
    val leftCols = left.columns.toSeq
    val reserved = Seq("_ts", "_side", "_rp", "_asof") ++
      (rightTs +: rightCols).map(c => s"asof_$c")
    val clash = (leftCols ++ right.columns).toSet.intersect(reserved.toSet)
    require(clash.isEmpty,
      s"asOf reserves working/output columns ${reserved.mkString(", ")}; " +
        s"rename input columns ${clash.mkString(", ")}")
    val carried = rightTs +: rightCols
    val payload = struct(carried.map(col): _*)
    val r = right.select(col(keyCol), col(rightTs).as("_ts"),
      lit(0).as("_side"), payload.as("_rp"))
    val payloadType = r.schema("_rp").dataType
    val l = left.select(Seq(col(keyCol), col(leftTs).as("_ts"),
      lit(1).as("_side"), lit(null).cast(payloadType).as("_rp")) ++
      leftCols.filterNot(_ == keyCol).map(col): _*)
    val rAll = r.select(Seq(col(keyCol), col("_ts"), col("_side"), col("_rp")) ++
      leftCols.filterNot(_ == keyCol)
        .map(c => lit(null).cast(left.schema(c).dataType).as(c)): _*)
    val w = Window.partitionBy(col(keyCol))
      .orderBy(col("_ts").asc, col("_side").asc)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    l.unionByName(rAll)
      .withColumn("_asof", last(col("_rp"), ignoreNulls = true).over(w))
      .where(col("_side") === 1)
      .select(leftCols.map(col) ++
        carried.map(c => col(s"_asof.$c").as(s"asof_$c")): _*)
  }
}
