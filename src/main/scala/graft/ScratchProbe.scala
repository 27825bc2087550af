package graft

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Temporary decomposition probe (not part of the bench contract):
  * times sub-plans of hot queries with the noop sink. Rewritten per
  * round for whatever decomposition the round needs (r22: the q17
  * Σdf² self-join — df histogram, doc-length spread, and the exact
  * prefilter variants). */
object ScratchProbe {
  def noop(df: DataFrame): Unit =
    df.write.format("noop").mode("overwrite").save()

  def time(label: String)(f: => Unit): Unit = {
    val ts = (1 to 3).map { _ =>
      val t0 = System.nanoTime(); f; (System.nanoTime() - t0) / 1e9
    }
    println(f"SCRATCH $label%-28s ${ts.map(t => f"$t%.3f").mkString(" ")}")
  }

  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32").toInt
    val spark = Sessions.local(cpus)
    spark.sparkContext.setLogLevel("WARN")
    spark.range(1000000).selectExpr("sum(id)").collect()

    val idx = graft.operators.CorpusArtifacts.shingleIndex(
      "probe:" + sfDir, graft.Tables.load(spark, sfDir, "documents"),
      "doc_id", "text", 3)
    idx.count()

    // --- df statistics: how much of the posting/join mass is df==1,
    // and what the join mass Σdf² looks like with/without it ---
    val dfc = idx.groupBy(col("shingle")).agg(count(lit(1)).as("df"))
    dfc.persist(); dfc.count()
    println("=== df histogram (sf0.1) ===")
    dfc.groupBy(col("df")).agg(count(lit(1)).as("n_shingles"))
      .withColumn("postings", col("df") * col("n_shingles"))
      .withColumn("join_mass", col("df") * col("df") * col("n_shingles"))
      .orderBy(col("df"))
      .show(30, false)
    dfc.agg(count(lit(1)).as("vocab"),
      sum(col("df")).as("postings"),
      sum(col("df") * col("df")).as("join_mass_df2"),
      sum(when(col("df") === 1, 1L).otherwise(0L)).as("df1_vocab"),
      sum(when(col("df") === 1, 1L).otherwise(0L)).as("df1_postings"),
      max(col("df")).as("max_df")).show(false)

    // --- doc shingle-count spread: how selective is the exact
    // length-ratio filter (jaccard>=0.2 needs min >= 0.2*max)? ---
    val counts = idx.groupBy(col("doc_id")).agg(count(lit(1)).as("n"))
    counts.agg(min(col("n")), expr("percentile(n, 0.5)"), max(col("n"))).show(false)
    // join-row selectivity of the length-ratio prefilter
    val withN2 = idx.join(counts.withColumnRenamed("n", "ns"), Seq("doc_id"))
    val aa = withN2.select(col("doc_id").as("id_a"), col("shingle"), col("ns").as("n_a"))
    val bb = withN2.select(col("doc_id").as("id_b"), col("shingle"), col("ns").as("n_b"))
    val j = aa.join(bb, Seq("shingle")).where(col("id_a") < col("id_b"))
    val nmax2 = least(col("n_a"), col("n_b"))
    val passed = j.where(nmax2.cast("double") /
      (col("n_a") + col("n_b") - nmax2).cast("double") >= 0.2)
    println(s"SCRATCH joinrows total=${j.count()} pass_filter=${passed.count()}")

    // --- timing: current form vs df>=2 prefilter vs +length filter ---

    def variant(dropDf1: Boolean, lenFilter: Boolean): DataFrame = {
      val base = idx
      val withN = base.join(counts.withColumnRenamed("n", "n_shingles"), Seq("doc_id"))
      val kept = if (dropDf1)
        withN.join(broadcast(dfc.where(col("df") > 1).select(col("shingle"))), Seq("shingle"))
      else withN
      val a = kept.select(col("doc_id").as("id_a"), col("shingle"),
        col("n_shingles").as("n_a"))
      val b = kept.select(col("doc_id").as("id_b"), col("shingle"),
        col("n_shingles").as("n_b"))
      val joinCond = if (lenFilter)
        col("id_a") < col("id_b") &&
          col("n_a") * lit(0.2) <= col("n_b") && col("n_b") * lit(0.2) <= col("n_a")
      else col("id_a") < col("id_b")
      a.join(b, Seq("shingle"))
        .where(joinCond)
        .groupBy(col("id_a"), col("id_b"))
        .agg(count(lit(1)).as("n_common"),
          max(col("n_a")).as("n_a"), max(col("n_b")).as("n_b"))
        .withColumn("jaccard",
          col("n_common").cast("double") /
            (col("n_a") + col("n_b") - col("n_common")).cast("double"))
        .where(col("jaccard") >= 0.2)
        .select(col("id_a"), col("id_b"), col("n_common"), round(col("jaccard"), 6).as("jaccard"))
    }
    time("q17 old (no filter)")(noop(variant(dropDf1 = false, lenFilter = false)))
    time("q17 +lenfilter")(noop(variant(dropDf1 = false, lenFilter = true)))
    time("q17 current")(noop(
      graft.operators.Dedup.jaccardPairsFromIndex(idx, "doc_id", 0.2)))
    time("q17 old again")(noop(variant(dropDf1 = false, lenFilter = false)))

    // --- q15 artifact cache behavior ---
    val fps = graft.operators.CorpusArtifacts.fingerprints(
      "probe:" + sfDir, graft.Tables.load(spark, sfDir, "documents"),
      "doc_id", "text")
    time("fps count")(fps.count())
    time("q15 over artifact")(noop(
      graft.operators.Dedup.exactFromFingerprints(fps, "doc_id")))
    // listener: is the artifact scan serving cached blocks or
    // recomputing the md5 pass?
    @volatile var taskMs = 0L
    @volatile var tasks = 0
    val lsn = new org.apache.spark.scheduler.SparkListener {
      override def onStageCompleted(
          sc: org.apache.spark.scheduler.SparkListenerStageCompleted): Unit = {
        taskMs += sc.stageInfo.taskMetrics.executorRunTime
        tasks += sc.stageInfo.numTasks
      }
    }
    spark.sparkContext.addSparkListener(lsn)
    graft.operators.Dedup.exactFromFingerprints(fps, "doc_id").count()
    Thread.sleep(300)
    spark.sparkContext.removeSparkListener(lsn)
    println(s"SCRATCH q15-artifact-agg tasks=$tasks taskMs=$taskMs")
    spark.sparkContext.getRDDStorageInfo.foreach(i =>
      println(s"SCRATCH rddinfo id=${i.id} cached=${i.numCachedPartitions}/${i.numPartitions} mem=${i.memSize} name=${i.name}"))

    // --- q62 decomposition ---
    val raw = graft.Tables.load(spark, sfDir, "documents")
    val parsed = graft.operators.Parse.parse(
      raw.select(col("doc_id"),
        concat(lit("doc_"), col("doc_id"), lit(".pdf")).as("name"),
        concat(lit("s3://corpus/"), col("doc_id")).as("url"),
        col("text").as("content"),
        lit(graft.operators.Parse.TierBalanced).as("tier")),
      "doc_id", "name", "url", "content", "tier",
      () => graft.operators.StubParserClient())
    val docs = parsed.select(col("id").as("doc_id"),
      col("parsed_text").as("text"))
    time("q62 parse")(noop(docs))
    val chunks = graft.operators.TwoTier.chunk(docs, "doc_id", "text", 100, 20, 25)
    time("q62 chunks")(noop(chunks))
    val e0 = expr(
      "CAST(CONV(SUBSTRING(md5(CONCAT(chunk_text, CHAR(48))), 1, 6), 16, 10) AS DOUBLE) / 16777216.0")
    time("q62 chunks+md5")(noop(chunks.withColumn("_e0", e0)))
    val mentions = graft.operators.Entities.extractMentions(docs, "doc_id", "text", 2)
    time("q62 mentions")(noop(mentions))
    // split the mentions cost: tokenize-with-offsets explode vs the
    // (id, token) collect_list aggregate vs the df join tail
    val occ = graft.Partitioning.spread(docs.select(col("doc_id"), col("text")))
      .select(col("doc_id"),
        explode(graft.functions.NativeText.bm25TokenOffsetsOf(col("text"))).as("m"))
      .select(col("doc_id"), col("m.token").as("token"),
        col("m.start_offset").as("start_offset"), col("m.end_offset").as("end_offset"))
    time("q62 occurrences only")(noop(occ))
    val toksAgg = occ.groupBy(col("doc_id"), col("token"))
      .agg(count(lit(1)).as("tf"),
        collect_list(struct(col("start_offset"), col("end_offset"))).as("_offs"))
    time("q62 occ+tf-agg")(noop(toksAgg))

    // --- q24-class RRF: current per-source rank (2x sort+zip) vs a
    // fused single-sort variant (union tagged, one global sort+zip,
    // per-source offsets re-derived by a tiny agg + broadcast join) ---
    val embT = graft.Tables.load(spark, sfDir, "embeddings")
    val s1 = embT.select(col("vec_id").as("doc_id"),
      element_at(col("embedding"), 1).cast("double").as("score"))
    val s2 = embT.select(col("vec_id").as("doc_id"),
      element_at(col("embedding"), 2).cast("double").as("score"))
    time("rrf current")(noop(
      graft.operators.Search.rrfRaw(Seq(s1, s2), "doc_id", "score", 60)))
    def rrfFused(sources: Seq[DataFrame]): DataFrame = {
      val tagged = sources.zipWithIndex.map { case (s, i) =>
        s.select(lit(i).as("_src"), col("doc_id"), col("score")) }
      val ranked = graft.operators.Ranking.withGlobalRank(
        tagged.reduce(_ unionByName _), "gidx",
        col("_src").asc, col("score").desc, col("doc_id").asc)
      val offsets = ranked.groupBy(col("_src"))
        .agg(min(col("gidx")).as("_off"))
      ranked.join(broadcast(offsets), Seq("_src"))
        .select(col("doc_id"),
          (lit(1.0) / (lit(60) + col("gidx") - col("_off") + lit(1))).as("contrib"))
        .groupBy(col("doc_id")).agg(sum(col("contrib")).as("rrf_raw"))
    }
    time("rrf fused")(noop(rrfFused(Seq(s1, s2))))
    time("rrf current again")(noop(
      graft.operators.Search.rrfRaw(Seq(s1, s2), "doc_id", "score", 60)))

    spark.stop()
  }
}
