package graft

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Temporary decomposition probe (not part of the bench contract):
  * times sub-plans of hot queries with the noop sink. */
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

    // q17 decomposition
    val idx = graft.operators.CorpusArtifacts.shingleIndex(
      "probe:" + sfDir, graft.Tables.load(spark, sfDir, "documents"),
      "doc_id", "text", 3)
    idx.count()
    time("idx scan")(noop(idx))
    val a = idx.select(col("doc_id").as("id_a"), col("shingle"))
    val b = idx.select(col("doc_id").as("id_b"), col("shingle"))
    val joined = a.join(b, Seq("shingle")).where(col("id_a") < col("id_b"))
    time("self-join only")(noop(joined))
    val inter = joined.groupBy(col("id_a"), col("id_b"))
      .agg(count(lit(1)).as("n_common"))
    time("join+agg")(noop(inter))
    val counts = idx.groupBy(col("doc_id")).agg(count(lit(1)).as("n_shingles"))
    time("counts")(noop(counts))
    time("q17 full")(noop(
      graft.operators.Dedup.jaccardPairsFromIndex(idx, "doc_id", 0.2)))
    time("q17 count-action")(
      graft.operators.Dedup.jaccardPairsFromIndex(idx, "doc_id", 0.2).count())

    // spread micro-probes
    val docsRaw = graft.Tables.load(spark, sfDir, "documents")
      .select(col("doc_id"), col("text"))
    time("scan only")(noop(docsRaw))
    time("spread only")(noop(graft.Partitioning.spread(docsRaw)))
    time("scan+md5")(noop(docsRaw.select(col("doc_id"), md5(col("text")))))
    time("spread+md5")(noop(graft.Partitioning.spread(docsRaw)
      .select(col("doc_id"), md5(col("text")))))
    time("spread+fp")(noop(graft.Partitioning.spread(docsRaw)
      .select(col("doc_id"),
        graft.functions.TextFunctions.fingerprint(col("text")))))
    time("scan+fp")(noop(docsRaw
      .select(col("doc_id"),
        graft.functions.TextFunctions.fingerprint(col("text")))))

    // q62 decomposition
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
    val mentions = graft.operators.Entities.extractMentions(docs, "doc_id", "text", 2)
    time("q62 mentions")(noop(mentions))

    spark.stop()
  }
}
