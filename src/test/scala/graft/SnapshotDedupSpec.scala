package graft

import org.scalatest.funsuite.AnyFunSuite

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions.col

import graft.operators.Dedup
import graft.functions.TextFunctions

/** Cross-snapshot incremental dedup (Dedup.newAgainstSnapshot /
  * newAgainstSnapshotBloom — q197's operator): the Bloom-pruned path
  * must equal the exact anti join at ANY filter size (no false
  * negatives; false positives stripped by the exact confirm), the
  * prune must actually shrink the join's probe side at a realistic
  * size, and a null-text row must stay new on both paths. */
class SnapshotDedupSpec extends AnyFunSuite {
  lazy val spark = TestSession.spark
  import spark.implicits._

  private def ids(df: DataFrame): Set[Long] =
    df.select("doc_id").collect().map(_.getLong(0)).toSet

  test("bloom path ≡ exact path, from all-positive (m=8) to sparse " +
      "(m=65536); null-text rows stay new") {
    val docs = Tables.load(spark, "/root/testdata/sf0.001", "documents")
      .select(col("doc_id"), col("text"))
      .unionByName(Seq((9999L, null: String)).toDF("doc_id", "text"))
    val batch = docs.where(col("doc_id") >= 250 || col("doc_id") === 9999L)
    val prior = docs
      .where(col("doc_id") < 250 || col("doc_id") % 5 === 0)
      .select(TextFunctions.fingerprint(col("text")).as("fingerprint"))
    val exact = ids(Dedup.newAgainstSnapshot(batch, "doc_id", "text", prior))
    assert(exact.contains(9999L), "null text never matches a fingerprint")
    for (m <- Seq(8, 256, 4096, 65536)) {
      val bloom = ids(Dedup.newAgainstSnapshotBloom(
        batch, "doc_id", "text", prior, m, 3))
      assert(bloom === exact, s"m=$m must reproduce the exact anti join")
    }
  }

  test("the prune shrinks the probe side: bloom-positive rows ≈ dups " +
      "+ fpp, well under the batch") {
    val docs = Tables.load(spark, "/root/testdata/sf0.001", "documents")
    val batch = docs.where(col("doc_id") >= 250)
    val prior = docs
      .where(col("doc_id") < 250 || col("doc_id") % 5 === 0)
      .select(TextFunctions.fingerprint(col("text")).as("fingerprint"))
    val m = 4096; val k = 3
    val bits = prior.agg(graft.functions.Sketch
      .bloomBits(col("fingerprint"), m, k).as("bits"))
    val maybe = (0 until k).map(i =>
        org.apache.spark.sql.functions.array_contains(col("bits"),
          (graft.functions.Sketch.hash48Of(
            org.apache.spark.sql.functions.concat(
              org.apache.spark.sql.functions.lit(s"$i:"),
              TextFunctions.fingerprint(col("text")))) % m).cast("int")))
      .reduce(_ && _)
    val positives = batch
      .crossJoin(org.apache.spark.sql.functions.broadcast(bits))
      .where(maybe).count()
    val batchN = batch.count()
    val dups = batchN - ids(Dedup.newAgainstSnapshot(
      batch, "doc_id", "text", prior)).size
    assert(positives >= dups, "a Bloom has no false negatives")
    // 300 keys in 4096 bits, k=3 → fpp ≈ 0.8%; allow generous slack
    assert(positives <= dups + (batchN - dups) / 10,
      s"prune must cut the probe side: positives=$positives dups=$dups " +
        s"batch=$batchN")
  }
}
