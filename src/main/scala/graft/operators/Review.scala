package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Human-review and versioning surfaces of the reference store
  * (supabase_schema.sql): chunk edit tracking (`is_edited`,
  * `original_text` — :64-67), document version chains
  * (`version`, `parent_document_id` — :37-39), and multi-model LLM
  * comparison selection (`llm_comparisons` — :169-196). The reference
  * keeps these as live Postgres columns a review UI mutates; here they
  * are deterministic frame transforms, so review state is derivable,
  * auditable, and replayable at corpus scale.
  */
object Review {

  /** Apply chunk edits (schema :64-67 review status): an edited chunk
    * takes the new text, remembers the FIRST original in
    * `original_text` (re-editing never overwrites it — "store
    * original if edited"), and flags `is_edited`. Chunks without an
    * edit keep (or gain) `is_edited = false`, `original_text` null.
    * One left join on the chunk key — broadcastable when the edit set
    * is review-sized.
    */
  def applyEdits(chunks: DataFrame, keyCols: Seq[String], textCol: String,
      edits: DataFrame, editTextCol: String): DataFrame = {
    require(keyCols.nonEmpty)
    // initialize each review column independently — a frame carrying
    // one but not the other must neither crash nor null out preserved
    // originals
    val withFlag =
      if (chunks.columns.contains("is_edited")) chunks
      else chunks.withColumn("is_edited", lit(false))
    val base =
      if (withFlag.columns.contains("original_text")) withFlag
      else withFlag.withColumn("original_text", lit(null).cast("string"))
    // duplicate edits for one key would fan out chunk rows through the
    // join; collapse deterministically (max text wins — order-free)
    val e = edits
      .select(keyCols.map(col) :+ col(editTextCol).as("_edit_text"): _*)
      .groupBy(keyCols.map(col): _*)
      .agg(max(col("_edit_text")).as("_edit_text"))
    base.join(e, keyCols, "left")
      .withColumn("original_text",
        when(col("_edit_text").isNotNull && !col("is_edited"), col(textCol))
          .otherwise(col("original_text")))
      .withColumn(textCol,
        when(col("_edit_text").isNotNull, col("_edit_text")).otherwise(col(textCol)))
      .withColumn("is_edited", col("is_edited") || col("_edit_text").isNotNull)
      .drop("_edit_text")
  }

  /** Resolve document version chains (schema :37-39): every document
    * gains `root_document_id` (the chain's original), `version` (1 +
    * ancestor count — the DEFAULT 1 / +1-per-revision convention), and
    * `is_latest` (no other document names it as parent). The walk is
    * `maxDepth` iterated self-joins on the parent key — version chains
    * are human-edit histories, a few hops deep, so the bounded climb
    * is exact in practice and each hop is one equi-join shuffle on an
    * id key (AQE collapses the final hops once frontiers empty).
    */
  def versionChains(docs: DataFrame, idCol: String, parentCol: String,
      maxDepth: Int = 8): DataFrame = {
    require(maxDepth >= 1)
    val parents = docs.select(col(idCol).as("_pid"), col(parentCol).as("_pparent"))
    // only the ACTIVE frontier joins each hop: documents whose chain is
    // already resolved (null climb pointer — version 1 of most corpora)
    // leave the loop immediately and never re-shuffle; at scale the
    // frontier shrinks geometrically while the resolved union is a
    // no-shuffle concatenation
    var active = docs
      .withColumn("root_document_id", col(idCol))
      .withColumn("version", lit(1))
      .withColumn("_climb", col(parentCol))
    var resolved: DataFrame = null
    for (_ <- 1 to maxDepth) {
      val finished = active.where(col("_climb").isNull)
      resolved =
        if (resolved == null) finished else resolved.unionByName(finished)
      active = active.where(col("_climb").isNotNull)
        .join(parents, col("_climb") === col("_pid"), "left")
        .withColumn("version", col("version") + 1)
        .withColumn("root_document_id", col("_climb"))
        .withColumn("_climb", col("_pparent"))
        .drop("_pid", "_pparent")
    }
    // chains deeper than maxDepth keep their partial resolution
    val cur = resolved.unionByName(active)
    val hasChild = docs.select(col(parentCol).as("_cid"))
      .where(col("_cid").isNotNull).distinct()
    cur.drop("_climb")
      .join(hasChild, col(idCol) === col("_cid"), "left")
      .withColumn("is_latest", col("_cid").isNull)
      .drop("_cid")
  }

  /** Auto-select among multi-model outputs (llm_comparisons
    * :169-196): per row, the model with the highest confidence wins
    * (ties break on model name ascending — deterministic, unlike a
    * human `selected_by`). Input carries `<model>_output` /
    * `<model>_confidence` column pairs, the schema's gpt4/gemini/
    * claude shape generalized; a missing confidence ranks last. Adds
    * `selected_model`, `selected_output`, `selected_confidence` —
    * one array_sort over a `models`-sized array per row, no shuffle.
    */
  def selectByConfidence(df: DataFrame, models: Seq[String]): DataFrame = {
    require(models.nonEmpty)
    val best = element_at(array_sort(array(models.map(m => struct(
      (lit(0.0) - coalesce(col(s"${m}_confidence"), lit(-1.0))).as("_negconf"),
      lit(m).as("model"),
      col(s"${m}_output").cast("string").as("output"),
      coalesce(col(s"${m}_confidence"), lit(-1.0)).as("confidence"))): _*)), 1)
    df.withColumn("selected_model", best.getField("model"))
      .withColumn("selected_output", best.getField("output"))
      .withColumn("selected_confidence", best.getField("confidence"))
  }
}
