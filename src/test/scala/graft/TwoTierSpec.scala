package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.multimodal.Multimodal
import graft.operators.{StubLlm, TwoTier}

class TwoTierSpec extends AnyFunSuite {
  lazy val spark = TestSession.spark
  import spark.implicits._

  val text: String = (1 to 250).map(i => s"w$i").mkString(" ") // 250 tokens

  test("page windows overlap correctly; children partition each page") {
    val df = Seq((7L, text)).toDF("doc_id", "text")
    val chunks = TwoTier.chunk(df, "doc_id", "text", 100, 20, 25)
      .collect().map(r => (r.getAs[Int]("page_index"), r.getAs[Int]("child_index"),
        r.getAs[String]("chunk_text"), r.getAs[Int]("n_tokens")))
    // 250 tokens, step 80: pages at 0,80,160,240 -> 4 pages
    assert(chunks.map(_._1).distinct.sorted.toSeq === Seq(0, 1, 2, 3))
    // full pages have 4 children of 25 tokens
    val page0 = chunks.filter(_._1 == 0).sortBy(_._2)
    assert(page0.length === 4)
    assert(page0.forall(_._4 === 25))
    assert(page0.head._3.startsWith("w1 w2 w3"))
    // page1 starts at token 81 (overlap of 20 with page0)
    val page1 = chunks.filter(_._1 == 1).sortBy(_._2)
    assert(page1.head._3.startsWith("w81 "))
    // last page: tokens 241..250 -> one child of 10 tokens
    val page3 = chunks.filter(_._1 == 3)
    assert(page3.length === 1 && page3.head._4 === 10)
  }

  test("every child's parent page id exists among pages") {
    val df = Seq((1L, text), (2L, "short doc only")).toDF("doc_id", "text")
    val chunks = TwoTier.chunk(df, "doc_id", "text", 100, 20, 25)
    val pages = TwoTier.pages(df, "doc_id", "text", 100, 20)
    val orphan = chunks.select($"page_id")
      .join(pages.select($"page_id"), Seq("page_id"), "left_anti")
    assert(orphan.count() === 0)
  }

  test("stub LLM contextualization is deterministic and prefixes CTX") {
    val df = Seq((1L, text)).toDF("doc_id", "text")
    val ctx = TwoTier.withContext(
      TwoTier.pages(df, "doc_id", "text", 100, 20), () => StubLlm(8))
      .collect()
    assert(ctx.forall(_.contextual_summary.startsWith("CTX: w")))
    assert(ctx.forall(r => r.contextualized_text ===
      r.contextual_summary + " | " + r.page_text))
    val first = ctx.find(_.page_index == 0).get
    assert(first.contextual_summary === "CTX: w1 w2 w3 w4 w5 w6 w7 w8")
  }
}

class MultimodalSpec extends AnyFunSuite {
  lazy val spark = TestSession.spark
  import spark.implicits._

  test("feature extraction is deterministic over binary payloads") {
    val media = Multimodal.mediaFromText(
      Seq((1L, "some payload"), (2L, "other payload")).toDF("id", "text"),
      "id", "text", "image")
    assert(media.schema("payload").dataType.typeName === "binary")
    val f1 = Multimodal.extractFeatures(media, 16).collect().sortBy(_.media_id)
    val f2 = Multimodal.extractFeatures(media, 16).collect().sortBy(_.media_id)
    assert(f1.map(_.features.toSeq).toSeq === f2.map(_.features.toSeq).toSeq)
    assert(f1.forall(_.features.length === 16))
    assert(f1.forall(_.features.forall(v => v >= 0f && v < 1f)))
    assert(f1(0).features.toSeq !== f1(1).features.toSeq)
  }

  test("multi-vector extraction yields one vector per patch") {
    val media = Multimodal.mediaFromText(
      Seq((1L, "x" * 100)).toDF("id", "text"), "id", "text", "image")
    val mv = Multimodal.extractMultiVector(media, 8, 32).collect()(0)
    val patches = mv.getAs[scala.collection.Seq[scala.collection.Seq[Float]]]("patch_vectors")
    assert(patches.length === 4) // 100 bytes / 32 -> 3 full + 1 partial
    assert(patches.forall(_.length === 8))
  }

  test("maxSim scores identical doc highest") {
    val q = Array(Array(1f, 0f), Array(0f, 1f))
    val same = Seq(Seq(1f, 0f), Seq(0f, 1f))
    val other = Seq(Seq(0.5f, 0.5f))
    assert(Multimodal.maxSim(q)(same) > Multimodal.maxSim(q)(other))
  }
}
