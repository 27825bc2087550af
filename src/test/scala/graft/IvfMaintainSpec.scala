package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.operators.SimilaritySearch

/** Incremental IVF maintenance (SimilaritySearch.meanCentroids /
  * assignToCentroids / ivfDriftCensus) — the edges the q174/q175
  * gates don't reach. */
class IvfMaintainSpec extends AnyFunSuite {
  lazy val spark = TestSession.spark
  import spark.implicits._

  private def vecs(rows: (Long, Int, Seq[Float])*) =
    rows.toSeq.toDF("vec_id", "label", "embedding")

  test("assignment picks the max-cosine centroid; exact ties break " +
      "to the LOWEST label") {
    val existing = vecs(
      (1L, 0, Seq(1f, 0f)), (2L, 0, Seq(1f, 0f)),
      (3L, 1, Seq(0f, 1f)), (4L, 1, Seq(0f, 1f)),
      // label 2 duplicates label 0's mean exactly -> tie for [1,0]
      (5L, 2, Seq(1f, 0f)))
    val cents = SimilaritySearch.meanCentroids(existing, "label",
      "embedding")
    val delta = Seq((10L, Seq(1f, 0f)), (11L, Seq(0f, 2f)))
      .toDF("vec_id", "embedding")
    val out = SimilaritySearch.assignToCentroids(delta, "vec_id",
      "embedding", cents)
      .orderBy("vec_id").collect()
      .map(r => (r.getLong(0), r.getInt(1), r.getDouble(2)))
    assert(out.toSeq === Seq((10L, 0, 1.0), (11L, 1, 1.0)))
  }

  test("an empty delta assigns nothing and leaves centroids the " +
      "running-mean identity") {
    val existing = vecs((1L, 0, Seq(1f, 0f)), (2L, 1, Seq(0f, 1f)))
    val cents = SimilaritySearch.meanCentroids(existing, "label",
      "embedding")
    val empty = Seq.empty[(Long, Seq[Float])].toDF("vec_id", "embedding")
    assert(SimilaritySearch.assignToCentroids(empty, "vec_id",
      "embedding", cents).count() === 0L)
    // census against the unchanged centroids: nothing moves, no flag
    val census = SimilaritySearch.ivfDriftCensus(existing, "vec_id",
      "label", "embedding", cents, reclusterThreshold = 0.0)
      .orderBy("label").collect()
    assert(census.map(_.getLong(2)).sum === 0L)
    assert(census.forall(!_.getBoolean(4)))
  }

  test("drift census: a cluster pulled past another flags at the " +
      "threshold; the untouched cluster does not") {
    val existing = vecs(
      (1L, 0, Seq(1f, 0f)),
      (2L, 1, Seq(0f, 1f)), (3L, 1, Seq(0f, 1f)))
    // updated centroids where label 0's centroid moved onto label
    // 1's axis: vector 1's nearest is now label 1 -> moved
    val moved = Seq((0, Seq(0.0, 1.0)), (1, Seq(0.0, 1.0)))
      .toDF("label", "centroid")
    // label 0's centroid flipped to [-1,0]: its own vector [1,0] now
    // scores -1 there vs 0 on label 1 -> it moves (1/1 > 0.5 flags);
    // label 1's vectors still match exactly -> untouched
    val cents = Seq((0, Seq(-1.0, 0.0)), (1, Seq(0.0, 1.0)))
      .toDF("label", "centroid")
    val census = SimilaritySearch.ivfDriftCensus(existing, "vec_id",
      "label", "embedding", cents, reclusterThreshold = 0.5)
      .orderBy("label").collect()
      .map(r => (r.getInt(0), r.getLong(1), r.getLong(2),
        r.getBoolean(4)))
    assert(census.toSeq === Seq((0, 1L, 1L, true), (1, 2L, 0L, false)))
    val pulled = Seq((0, Seq(0.0, 1.0)), (1, Seq(1.0, 0.0)))
      .toDF("label", "centroid")
    val census2 = SimilaritySearch.ivfDriftCensus(existing, "vec_id",
      "label", "embedding", pulled, reclusterThreshold = 0.5)
      .orderBy("label").collect()
      .map(r => (r.getInt(0), r.getLong(1), r.getLong(2),
        r.getBoolean(4)))
    // everything lands on the swapped centroid: both clusters flag
    assert(census2.toSeq === Seq((0, 1L, 1L, true), (1, 2L, 2L, true)))
  }

  test("q174/q175 plans: the centroid side broadcasts; no " +
      "corpus-sized sort-merge join") {
    for (q <- Seq("q174_ivf_assign", "q175_ivf_drift")) {
      val plan = SparkEntry.queries(q)(spark, "/root/testdata/sf0.001")
        .queryExecution.executedPlan.toString
      assert(plan.contains("BroadcastNestedLoopJoin") ||
        plan.contains("BroadcastHashJoin"), s"$q:\n$plan")
      assert(!plan.contains("CartesianProduct"), s"$q:\n$plan")
    }
  }
}
