package graft.operators

import org.apache.spark.sql.{Column, DataFrame, Dataset}
import org.apache.spark.sql.functions._

import graft.Partitioning
import graft.functions.TextFunctions

/** LLM client boundary (reference: llm provider clients, llm/mod.rs;
  * contextual-summary prompts two_tier_chunker.py:321-376). Real
  * deployments implement this with a batched HTTP client initialized
  * once per partition; tests and oracles use [[StubLlm]], which is
  * pure and deterministic.
  */
trait LlmClient extends Serializable {
  def complete(prompt: String): String
}

/** Deterministic stand-in: "summary" = first `n` whitespace tokens of
  * the text after the last "\n\n" prompt separator, prefixed "CTX:".
  */
final case class StubLlm(n: Int = 8) extends LlmClient {
  def complete(prompt: String): String = {
    val text = prompt.split("\n\n").last
    "CTX: " + text.split(" ").filter(_.nonEmpty).take(n).mkString(" ")
  }
}

/** Two-tier chunking (two_tier_chunker.py:46-557): parent "page"
  * chunks (token windows with overlap) + child chunks inside each
  * page; deterministic md5 chunk ids (:377-389); contextual-retrieval
  * columns (contextualized_text = LLM situating summary + chunk text,
  * document_tasks.py:428-476).
  *
  * Shape: one narrow stage builds the nested page/child arrays per
  * document inside codegen; two `posexplode`s flatten. The LLM pass is
  * a `mapPartitions` over page chunks — client constructed once per
  * partition, rows batched (embedding_service.py:125 pattern).
  */
object TwoTier {

  /** Page + child chunks. Output per CHILD chunk:
    * doc_id, page_index, page_id, page_text, child_index (=position_in_parent),
    * chunk_id, chunk_text, n_tokens.
    */
  def chunk(df: DataFrame, idCol: String, textCol: String,
      pageTokens: Int = 100, pageOverlap: Int = 20,
      childTokens: Int = 25, carryCols: Seq[String] = Nil): DataFrame = {
    require(pageOverlap < pageTokens)
    val step = pageTokens - pageOverlap
    val carried = carryCols.map(col)
    val base = Partitioning.spread(
        df.select(col(idCol) +: col(textCol) +: carried: _*))
      .withColumn("_toks", TextFunctions.allTokens(col(textCol)))
    val nPages = floor((greatest(size(col("_toks")), lit(1)) - 1) / step).cast("int")
    val pages = transform(sequence(lit(0), nPages),
      i => slice(col("_toks"), (i * step + 1).cast("int"), lit(pageTokens)))
    val paged = base
      .select(col(idCol) +: carried :+ posexplode(pages).as(Seq("page_index", "_ptoks")): _*)
      .withColumn("page_id",
        Chunker.chunkId(col(idCol), "page", col("page_index")))
      .withColumn("page_text", concat_ws(" ", col("_ptoks")))
    val nChildren = floor((greatest(size(col("_ptoks")), lit(1)) - 1) / childTokens).cast("int")
    val children = transform(sequence(lit(0), nChildren),
      j => slice(col("_ptoks"), (j * childTokens + 1).cast("int"), lit(childTokens)))
    paged
      .select(col(idCol) +: carried ++: Seq(col("page_index"), col("page_id"),
          col("page_text"), posexplode(children).as(Seq("child_index", "_ctoks"))): _*)
      .withColumn("chunk_id",
        md5(concat_ws("_", col("page_id"), lit("child"), col("child_index").cast("string"))))
      .withColumn("chunk_text", concat_ws(" ", col("_ctoks")))
      .withColumn("n_tokens", size(col("_ctoks")))
      .drop("_ctoks")
  }

  /** Page-level chunks only (the parent tier). */
  def pages(df: DataFrame, idCol: String, textCol: String,
      pageTokens: Int = 100, pageOverlap: Int = 20): DataFrame =
    chunk(df, idCol, textCol, pageTokens, pageOverlap, childTokens = Int.MaxValue)
      .where(col("child_index") === 0)
      .select(col(idCol), col("page_index"), col("page_id"), col("page_text"))

  /** Heading-aware variant (two_tier_chunker.py:94-133): markdown is
    * first split into heading blocks (preamble merged into the first
    * section), then each block is two-tier chunked independently so a
    * page never straddles a section boundary; every chunk carries its
    * block's `heading` and `block_index`. Output: heading-block
    * columns + the [[chunk]] columns keyed by (idCol, block_index).
    */
  def chunkHeadingAware(df: DataFrame, idCol: String, textCol: String,
      pageTokens: Int = 100, pageOverlap: Int = 20,
      childTokens: Int = 25): DataFrame = {
    val blocks = Partitioning.spread(df.select(col(idCol), col(textCol)))
      .select(col(idCol), posexplode(
          graft.functions.HeadingBlocks.headingBlocksOf(col(textCol)))
        .as(Seq("block_index", "_blk")))
      .select(col(idCol), col("block_index"),
        col("_blk.heading").as("heading"),
        col("_blk.body").as("block_text"))
      // block identity for the chunker: deterministic, content-free
      .withColumn("_block_key",
        concat_ws("#", col(idCol).cast("string"), col("block_index").cast("string")))
    // one pass: the real id/heading ride through as carry columns —
    // no recompute of the heading split and no reattachment join
    chunk(blocks, "_block_key", "block_text", pageTokens, pageOverlap,
        childTokens, carryCols = Seq(idCol, "block_index", "heading"))
      .drop("_block_key")
  }

  case class PageRow(doc_id: Long, page_index: Int, page_id: String, page_text: String)
  case class ContextualRow(doc_id: Long, page_index: Int, page_id: String,
      page_text: String, contextual_summary: String, contextualized_text: String)

  case class FocusRow(doc_id: Long, page_index: Int, page_id: String,
      semantic_focus: String)

  /** Semantic focus (two_tier_chunker.py:357-376): a short topic label
    * per chunk from the LLM boundary — same mapPartitions shape as
    * [[withContext]], different prompt. */
  def withFocus(pagesDf: DataFrame, mkClient: () => LlmClient): Dataset[FocusRow] = {
    val spark = pagesDf.sparkSession
    import spark.implicits._
    pagesDf.select(
        col("doc_id").cast("long"), col("page_index").cast("int"),
        col("page_id"), col("page_text"))
      .as[PageRow]
      .mapPartitions { it =>
        val client = mkClient()
        it.map { p =>
          FocusRow(p.doc_id, p.page_index, p.page_id,
            client.complete("Topic label, 2-5 words.\n\n" + p.page_text))
        }
      }
  }

  /** Contextual-retrieval pass (two_tier_chunker.py:390-495): per-page
    * LLM summary + `contextualized_text = summary | text`. The client
    * is constructed once per partition — the real-API shape — and the
    * stub keeps it reproducible for the oracle.
    */
  def withContext(pagesDf: DataFrame, mkClient: () => LlmClient): Dataset[ContextualRow] = {
    val spark = pagesDf.sparkSession
    import spark.implicits._
    pagesDf.select(
        col("doc_id").cast("long"), col("page_index").cast("int"),
        col("page_id"), col("page_text"))
      .as[PageRow]
      .mapPartitions { it =>
        val client = mkClient() // once per partition (op.py:309-362 prepare-once)
        it.map { p =>
          val ctx = client.complete("Situate this chunk.\n\n" + p.page_text)
          ContextualRow(p.doc_id, p.page_index, p.page_id, p.page_text,
            ctx, ctx + " | " + p.page_text)
        }
      }
  }
}
