package graft

import java.nio.file.{Files, Paths}

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.functions.RecursiveSplit
import graft.incremental.Incremental
import graft.operators.{Layout, Rerank, StubEmbedder, StubReranker}
import graft.sources.FileSource
import graft.operators.SimilaritySearch

/** The reference's text_embedding example shape end-to-end (SURVEY §7
  * step 2): local files → split_recursively → embed → exported chunk
  * table → query-time cosine top-k — plus the incremental re-run
  * (1 edited file ⇒ only its chunks reprocessed; stale chunks gone).
  */
class ExampleFlowSpec extends AnyFunSuite {
  lazy val spark = TestSession.spark
  import spark.implicits._

  private def pipeline(delta: DataFrame): DataFrame = {
    val chunks = delta
      .select(col("source_key"), posexplode(
        RecursiveSplit.split_recursively(col("content"), 50, 10, 0))
        .as(Seq("chunk_index", "c")))
      .select(col("source_key"),
        concat_ws("#", col("source_key"), col("chunk_index")).as("target_key"),
        col("c.text").as("chunk_text"))
      .withColumn("id", xxhash64(col("target_key"))) // deterministic join key
    val embedded = operators.EmbedText.embed(
      chunks, "id", "chunk_text", () => StubEmbedder(8))
    chunks.join(embedded, Seq("id")).drop("id")
  }

  test("files -> chunks -> embeddings -> export -> top-k query; incremental rerun") {
    val dir = Files.createTempDirectory("flowe2e")
    val docs = dir.resolve("docs")
    Files.createDirectories(docs)
    Files.writeString(docs.resolve("a.md"),
      "spark engines process data.\n\ncatalyst optimizes query plans for spark.")
    Files.writeString(docs.resolve("b.md"),
      "cooking pasta requires boiling water.\n\nadd salt generously to the pot.")
    val sink = s"$dir/chunks"
    val track = s"$dir/tracking"

    // ingest via the incremental driver
    val src = FileSource.text(spark, docs.toString, includeGlob = Some("*.md"))
    val n1 = Incremental.syncSource(spark, src, pipeline, "splitter-v1", sink, track)
    assert(n1 === 2)

    val chunks = spark.read.parquet(sink)
    assert(chunks.count() >= 4) // two paragraphs per file
    // every chunk carries its 8-dim embedding
    assert(chunks.schema("embedding").dataType.typeName === "array")

    // query-time: embed the query with the SAME stub (TransientFlow
    // semantics: shared transform between ingest and query)
    val qvec = StubEmbedder(8).embedBatch(Seq("spark query plans")).head
    val top = SimilaritySearch.topK(chunks, "target_key", "embedding",
      SimilaritySearch.vecLit(qvec.toSeq), 2)
    assert(top.count() === 2)

    // incremental: edit b.md only -> only b reprocessed, a untouched
    Thread.sleep(10)
    Files.writeString(docs.resolve("b.md"), "entirely new content about spark.")
    val src2 = FileSource.text(spark, docs.toString, includeGlob = Some("*.md"))
    val n2 = Incremental.syncSource(spark, src2, pipeline, "splitter-v1", sink, track)
    assert(n2 === 1)
    val after = spark.read.parquet(sink)
    // old pasta chunks replaced by the single new chunk
    assert(after.where(col("chunk_text").contains("pasta")).count() === 0)
    assert(after.where(col("chunk_text").contains("entirely new content")).count() === 1)
    assert(after.where(col("chunk_text").contains("catalyst")).count() === 1)
  }
}

class RerankSpec extends AnyFunSuite {
  lazy val spark = TestSession.spark
  import spark.implicits._

  test("stub reranker scores by query-term coverage") {
    val cands = Seq(
      (1L, "spark query plans optimized"),
      (2L, "spark only"),
      (3L, "nothing relevant at all")).toDF("id", "text")
    val got = Rerank.rerank(cands, "id", "text", "spark query",
        () => StubReranker())
      .collect().map(r => r.id -> r.rerank_score).toMap
    assert(got(1L) === 1.0)
    assert(got(2L) === 0.5)
    assert(got(3L) === 0.0)
  }

  test("rerankWithScore carries the retrieval score through the " +
      "boundary and scores exactly like rerank") {
    val cands = Seq(
      (1L, 0.91, "spark query plans optimized"),
      (2L, 0.72, "spark only"),
      (3L, 0.13, "nothing relevant at all")).toDF("id", "vscore", "text")
    val got = Rerank.rerankWithScore(cands, "id", "vscore", "text",
        "spark query", () => StubReranker())
      .collect().map(r => r.id -> ((r.vscore, r.rerank_score))).toMap
    val plain = Rerank.rerank(cands, "id", "text", "spark query",
        () => StubReranker())
      .collect().map(r => r.id -> r.rerank_score).toMap
    assert(got.view.mapValues(_._2).toMap === plain)
    assert(got(1L)._1 === 0.91 && got(2L)._1 === 0.72 && got(3L)._1 === 0.13)
  }
}

class LayoutSpec extends AnyFunSuite {
  lazy val spark = TestSession.spark
  import spark.implicits._

  test("salted join returns identical results to the plain join") {
    val left = (1 to 1000).map(i => (if (i % 10 == 0) "hot" else s"k$i", i))
      .toDF("key", "lv")
    val right = Seq(("hot", 100), ("k5", 5), ("k17", 17)).toDF("key", "rv")
    val plain = left.join(right, Seq("key"))
      .select($"key", $"lv", $"rv").collect().map(_.toSeq).toSet
    val salted = Layout.saltedJoin(left, right, "key", 8)
      .select($"key", $"lv", $"rv").collect().map(_.toSeq).toSet
    assert(salted === plain)
    // the join salt spreads even byte-identical duplicate rows of one
    // hot key (a content hash would collapse them onto one reducer)
    val dupes = Seq.fill(400)(("hot", 1)).toDF("key", "lv")
    val spread = dupes.withColumn("_s", Layout.joinSaltCol(8))
      .select("_s").distinct().count()
    assert(spread === 8)
    // reserved-name guard
    intercept[IllegalArgumentException] {
      Layout.saltedJoin(left.withColumnRenamed("lv", "_salt"), right, "key", 4)
    }
  }

  test("bloom-pruned join is row-identical and prunes before the join") {
    val big = (1 to 2000).map(i => (i.toLong, s"payload$i")).toDF("k", "v")
    val small = Seq((5L, "a"), (17L, "b"), (1999L, "c")).toDF("k", "name")
    val plain = big.join(small, Seq("k"))
      .select($"k", $"v", $"name").collect().map(_.toSeq).toSet
    val pruned = Layout.bloomPruneJoin(big, small, "k")
    assert(pruned.select($"k", $"v", $"name").collect().map(_.toSeq).toSet
      === plain)
    // the membership filter must sit under the join in the plan
    val plan = pruned.queryExecution.executedPlan.toString
    assert(plan.contains("array_contains"), s"no bloom filter in plan:\n$plan")
    // reserved-column guard
    intercept[IllegalArgumentException] {
      Layout.bloomPruneJoin(big.withColumnRenamed("v", "_bloom_bits"), small, "k")
    }
  }

  test("bucketed tables join without a shuffle exchange") {
    // bucketing needs the session catalog; use unique table names
    val a = (1 to 100).map(i => (i.toLong, s"a$i")).toDF("k", "av")
    val b = (1 to 100).map(i => (i.toLong, s"b$i")).toDF("k", "bv")
    Layout.writeBucketed(a, "graft_bk_a", 4, Seq("k"))
    Layout.writeBucketed(b, "graft_bk_b", 4, Seq("k"))
    val joined = spark.table("graft_bk_a").join(spark.table("graft_bk_b"), Seq("k"))
    val plan = joined.queryExecution.executedPlan.toString
    assert(!plan.contains("Exchange hashpartitioning"),
      s"expected shuffle-free bucketed join, got:\n$plan")
    assert(joined.count() === 100)
    spark.sql("DROP TABLE graft_bk_a")
    spark.sql("DROP TABLE graft_bk_b")
  }
}
