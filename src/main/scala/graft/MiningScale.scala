package graft

import org.apache.spark.sql.functions._

import graft.operators.{ContrastiveMining, Dedup}

/** Scale-measurement main for the r20 mining faces (SCALING.md cells;
  * the Profile.scala tradition): times, at SPARK_GRAFT_SF_DIR,
  *  1. the recall-solved miner at the default 0.35 floor — the
  *     documented NEAR-EXHAUSTIVE price of a 0.9 recall target at
  *     below-random similarity (collision fraction 2);
  *  2. the same face at a 0.8 floor — the documented scale path
  *     (pEff > 1/2, fraction drops geometrically);
  *  3. hardNegativesAgainstSnapshot at the SIZED geometry against a
  *     prebuilt (persisted) bucket index vs the full-corpus face
  *     re-hashing — the artifact-reuse saving of the TRAIN/MERGE/
  *     APPLY posture.
  * Each cell prints min-of-2 warm seconds and the output row count
  * (so a timing can never mask an empty result).
  */
object MiningScale {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/tmp/sf1")
    val spark = Sessions.local(
      sys.env.getOrElse("SPARK_GRAFT_CPUS", "32").toInt)
    val emb = Tables.load(spark, sfDir, "embeddings")
    def time(name: String)(mk: => org.apache.spark.sql.DataFrame): Unit = {
      val runs = (1 to 2).map { _ =>
        val t0 = System.nanoTime()
        val n = mk.count()
        ((System.nanoTime() - t0) / 1e9, n)
      }
      println(f"MININGSCALE $name%-34s ${runs.map(_._1).min}%.2f s  " +
        f"rows=${runs.head._2}")
    }
    val lab = emb.where(col("label").isNotNull && size(col("embedding")) === 64)
      .select(col("vec_id"), col("embedding"), col("label"))
    val n = lab.count()
    val sizedBits = Dedup.lshSizing(n, 12, 0.5)
    println(s"MININGSCALE corpus labeled=$n sizedBits=$sizedBits " +
      s"recallPlan(0.35)=${ContrastiveMining.lshRecallSizing()} " +
      s"recallPlan(0.8)=${ContrastiveMining.lshRecallSizing(atCosine = 0.8)}")
    time("recall_face_floor_0.8") {
      ContrastiveMining.hardNegativesLshRecall(
        emb, "vec_id", "embedding", "label", 64, 3, atCosine = 0.8)
    }
    println(s"MININGSCALE n-aware plan(0.8, n=$n) = " +
      s"${ContrastiveMining.lshRecallSizing(atCosine = 0.8, rowCount = Some(n))}")
    time("recall_face_floor_0.8_n_aware") {
      ContrastiveMining.hardNegativesLshRecall(
        emb, "vec_id", "embedding", "label", 64, 3, atCosine = 0.8,
        rowCount = Some(n))
    }
    time("auto_face_sized") {
      ContrastiveMining.hardNegativesLshAuto(
        emb, "vec_id", "embedding", "label", 64, 3, rowCount = Some(n))
    }
    val buckets = Dedup.bandedBuckets(
        lab.select(col("vec_id"), col("embedding")),
        "vec_id", "embedding", 64, sizedBits, 12)
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    buckets.count()
    time("snapshot_face_sized_prebuilt") {
      ContrastiveMining.hardNegativesAgainstSnapshot(
        emb, emb, "vec_id", "embedding", "label",
        buckets, "vec_id", 64, 3, sizedBits, 12)
    }
    // the TRAIN/MERGE/APPLY saving only shows on the real posture: a
    // SMALL daily delta against the persisted index (batch = corpus
    // re-pays the whole signature cost by definition)
    val delta = emb.where(pmod(col("vec_id"), lit(100)) === 0)
    time("snapshot_face_1pct_delta") {
      ContrastiveMining.hardNegativesAgainstSnapshot(
        delta, emb, "vec_id", "embedding", "label",
        buckets, "vec_id", 64, 3, sizedBits, 12)
    }
    time("full_rehash_for_1pct_delta") {
      ContrastiveMining.hardNegativesLshAuto(
          emb, "vec_id", "embedding", "label", 64, 3, rowCount = Some(n))
        .join(delta.select(col("vec_id").as("anchor_id")), Seq("anchor_id"))
    }
    time("triplets_lsh_sized") {
      ContrastiveMining.tripletsLsh(
        emb, "vec_id", "embedding", "label", 64, sizedBits, 12)
    }
    time("recall_face_floor_0.35") {
      ContrastiveMining.hardNegativesLshRecall(
        emb, "vec_id", "embedding", "label", 64, 3)
    }
    spark.stop()
  }
}
