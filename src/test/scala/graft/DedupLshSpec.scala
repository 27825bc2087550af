package graft

import org.scalatest.funsuite.AnyFunSuite

import graft.operators.Dedup

/** Gates the LSH-banded embedding near-dup (q72) against the exact
  * cartesian baseline (q20) on the sf0.001 corpus: candidates are
  * verified (precision 1 by construction), recall must stay high, and
  * the plan must never contain a cartesian product. */
class DedupLshSpec extends AnyFunSuite {
  lazy val spark = TestSession.spark

  test("embeddingNearDupLsh: verified subset of exact pairs, recall >= 0.8, no cartesian") {
    val emb = Tables.load(spark, "/root/testdata/sf0.001", "embeddings")
    def pairs(df: org.apache.spark.sql.DataFrame): Set[(Long, Long)] =
      df.select("id_a", "id_b").collect()
        .map(r => (r.getLong(0), r.getLong(1))).toSet
    val exact = pairs(Dedup.embeddingNearDup(emb, "vec_id", "embedding", 0.4))
    val lshDf = Dedup.embeddingNearDupLsh(emb, "vec_id", "embedding", 64, 0.4, 3, 12)
    assert(!lshDf.queryExecution.executedPlan.toString.contains("Cartesian"),
      "LSH near-dup plan must not contain a cartesian product")
    val lsh = pairs(lshDf)
    assert(lsh.subsetOf(exact), "every LSH pair must pass the exact verify")
    assert(exact.nonEmpty)
    val recall = lsh.size.toDouble / exact.size
    assert(recall >= 0.8, s"recall=$recall (${lsh.size}/${exact.size})")
  }
}
