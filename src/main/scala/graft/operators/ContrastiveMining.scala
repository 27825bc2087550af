package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.functions.VectorFunctions

/** Contrastive-training-data mining over a labeled embedding corpus:
  * hard negatives and anchor/positive/negative triplets, the
  * retrieval/embedding-training face of the LLM data pipeline (DPR /
  * Contriever-style hard-negative selection). Beyond-reference tier —
  * the reference's nearest surface is plain vector search
  * (search_service.py:56-117); it has no labeled-pair mining.
  *
  * Label law (shared by every face here, oracle-pinned by the
  * q236-q238 gates): a NULL label is UNLABELED — it never forms a
  * positive and never forms a negative. Both sides of the label
  * comparison must be non-null, so null-label rows neither mine nor
  * are mined. This is the standard convention (unlabeled rows carry
  * no supervision either way), and it doubles as the degenerate-row
  * guard the LSH faces need (a null row can't land in a bucket).
  *
  * Scale design:
  *  - [[hardNegatives]] / [[triplets]]: the anchor set is the small
  *    side of a broadcast nested-loop — the bounded-anchor mining job
  *    (a training run mines negatives for its query set, not for the
  *    whole corpus). Corpus stays partitioned; per-partition local
  *    scoring; one shuffle for the per-anchor top-k window keyed on
  *    anchor_id (cardinality = |anchors|, never the corpus).
  *  - [[hardNegativesLsh]]: the full-corpus-anchors posture. A
  *    corpus-sized anchor side cannot broadcast, so candidates come
  *    from the SAME banded hyperplane-LSH pipeline the embedding
  *    dedup faces use ([[Dedup.embeddingNearDupLsh]]'s
  *    bandedCandidatePairs): signature → band explode → equi-join on
  *    (band, bucket). Cost is Σ bucket² instead of n²; recall for a
  *    pair at cosine s is 1−(1−p^bandBits)^bands with
  *    p = 1 − arccos(s)/π — the high-cosine pairs hard-negative
  *    mining wants are exactly the pairs LSH keeps. Approximate by
  *    design; the gate pins the law, the spec pins exact-recall on
  *    the fixture corpus.
  */
object ContrastiveMining {

  /** Select (id, vec, label) with the label law applied: null-label
    * rows are out, and rows whose vector is null or not `dim` wide
    * are out (they carry no usable geometry; on the LSH path they
    * would otherwise collapse into the zero-signature bucket). */
  private def labeled(df: DataFrame, idCol: String, vecCol: String,
      labelCol: String, dim: Int, as: String): DataFrame =
    df.select(col(idCol).as(s"${as}_id"), col(vecCol).as(s"${as}_vec"),
        col(labelCol).as(s"${as}_label"))
      .where(col(s"${as}_label").isNotNull &&
        size(col(s"${as}_vec")) === dim)
      // norm once per ROW: every face downstream scores PAIRS, where
      // cosineFromNorms (bit-identical to cosine) then pays one dot
      // per pair instead of three folds; faces that never score (the
      // sizing count) project it away, so it costs them nothing
      .withColumn(s"${as}_nrm",
        VectorFunctions.l2Norm(col(s"${as}_vec")))

  /** Per anchor, the top-k most-similar DIFFERENT-label corpus rows
    * by exact cosine (the hard negatives of a contrastive batch).
    * Anchors broadcast (bounded anchor set); ties broken by
    * neighbor_id ascending on the unrounded score, scores rounded to
    * 6 places on output — the repo's cross-engine convention.
    * Output: (anchor_id, neighbor_id, score, rnk). */
  def hardNegatives(corpus: DataFrame, idCol: String, vecCol: String,
      labelCol: String, anchors: DataFrame, dim: Int, k: Int): DataFrame =
    topKPerAnchor(
      scoredBroadcast(corpus, idCol, vecCol, labelCol, anchors, dim,
        keep = col("anchor_label") =!= col("neighbor_label")),
      k)

  /** Shared scoring recipe of the broadcast-anchor faces
    * ([[hardNegatives]] / [[triplets]]): label-law projection of both
    * sides, corpus × broadcast(anchors), `keep` predicate applied
    * BEFORE the cosine so pruned pairs never pay for it. */
  private def scoredBroadcast(corpus: DataFrame, idCol: String,
      vecCol: String, labelCol: String, anchors: DataFrame, dim: Int,
      keep: org.apache.spark.sql.Column): DataFrame = {
    val a = labeled(anchors, idCol, vecCol, labelCol, dim, "anchor")
    val c = labeled(corpus, idCol, vecCol, labelCol, dim, "neighbor")
    c.crossJoin(broadcast(a))
      .where(keep)
      .withColumn("score", VectorFunctions.cosineFromNorms(
        VectorFunctions.dot(col("anchor_vec"), col("neighbor_vec")),
        col("anchor_nrm"), col("neighbor_nrm")))
  }

  /** THE per-anchor top-k tail — one definition of the ranking
    * convention (cosine desc, neighbor_id asc tie-break on the
    * unrounded score, 6-dp rounding at the output boundary) for
    * [[hardNegatives]] and [[hardNegativesLsh]]. */
  private def topKPerAnchor(scored: DataFrame, k: Int): DataFrame = {
    val w = Window.partitionBy(col("anchor_id"))
      .orderBy(col("score").desc, col("neighbor_id").asc)
    scored.withColumn("rnk", row_number().over(w))
      .where(col("rnk") <= k)
      .select(col("anchor_id"), col("neighbor_id"),
        round(col("score"), 6).as("score"), col("rnk"))
  }

  /** [[topKPerAnchor]] for scored frames that may carry DUPLICATE
    * (anchor, neighbor) rows — the LSH faces since r21 skip the
    * pair-level distinct (its exchange carried every band collision,
    * the largest shuffle of the plan) and rank the raw multi-band
    * rows instead. Duplicates of a pair are identical in every
    * ranked column (the exact cosine is deterministic per pair), so
    * under the ranking order (score desc, neighbor_id asc) a tie IS
    * a duplicate: dense_rank over the dup-carrying frame equals
    * row_number over the distinct frame, rank-≤-k duplicates emit
    * identical output rows, and the final distinct — on the
    * |anchors|·k-bounded OUTPUT, not the candidate mass — collapses
    * them. (A corpus with two rows under one id and equal-cosine
    * different vectors would tie two true neighbors into one rank;
    * gate corpora have unique ids, and the exact faces keep the
    * row_number law.) */
  private def topKPerAnchorDups(scored: DataFrame, k: Int): DataFrame = {
    val w = Window.partitionBy(col("anchor_id"))
      .orderBy(col("score").desc, col("neighbor_id").asc)
    scored.withColumn("rnk", dense_rank().over(w))
      .where(col("rnk") <= k)
      .select(col("anchor_id"), col("neighbor_id"),
        round(col("score"), 6).as("score"), col("rnk"))
      .distinct()
  }

  /** Per anchor, ONE (hardest-positive, hardest-negative) triplet:
    * the same-label corpus row of highest cosine (self excluded,
    * null-safe — a null-id anchor still excludes nothing but
    * itself-by-id never matches) and the different-label row of
    * highest cosine, plus the margin. Anchors with no positive or no
    * negative candidate produce no triplet (inner semantics — a
    * triplet needs all three legs). margin =
    * round(round(pos,6) − round(neg,6), 6): both engines subtract
    * the same IEEE doubles, so the gate hash-matches.
    * Output: (anchor_id, pos_id, pos_score, neg_id, neg_score,
    * margin). */
  def triplets(corpus: DataFrame, idCol: String, vecCol: String,
      labelCol: String, anchors: DataFrame, dim: Int): DataFrame =
    bestPairs(
      scoredBroadcast(corpus, idCol, vecCol, labelCol, anchors, dim,
          keep = !(col("anchor_id") <=> col("neighbor_id")))
        .withColumn("is_pos",
          col("anchor_label") === col("neighbor_label")))

  /** Tail of [[triplets]]: rank within (anchor, leg), keep rank 1 of
    * each leg, fold the two ≤1-row legs into one row per anchor with
    * a conditional-max aggregate (no self-join — the scored frame is
    * scanned once). Shared with [[tripletsLsh]], whose scored frame
    * may carry DUPLICATE (anchor, neighbor) rows since r21 (the
    * candidate front skips its pair-level distinct): dense_rank makes
    * every duplicate of the leg winner rank 1 — duplicates are
    * identical in (neighbor_id, score, is_pos), an exact cosine being
    * deterministic per pair — and the conditional-max fold is
    * invariant to repeated identical values, so the output equals the
    * distinct-candidates law. (Under dup-free input a rank-1 tie
    * needs equal (score, neighbor_id) within the (anchor, is_pos)
    * leg, i.e. the same fold inputs again — dense_rank ≡ row_number
    * for the fold's purposes there too.) */
  private def bestPairs(scored: DataFrame): DataFrame = {
    val w = Window.partitionBy(col("anchor_id"), col("is_pos"))
      .orderBy(col("score").desc, col("neighbor_id").asc)
    scored.withColumn("rnk", dense_rank().over(w))
      .where(col("rnk") === 1)
      .groupBy(col("anchor_id"))
      .agg(
        max(when(col("is_pos"), col("neighbor_id"))).as("pos_id"),
        max(when(col("is_pos"), col("score"))).as("pos_score"),
        max(when(!col("is_pos"), col("neighbor_id"))).as("neg_id"),
        max(when(!col("is_pos"), col("score"))).as("neg_score"))
      .where(col("pos_id").isNotNull && col("neg_id").isNotNull)
      .select(col("anchor_id"), col("pos_id"),
        round(col("pos_score"), 6).as("pos_score"),
        col("neg_id"),
        round(col("neg_score"), 6).as("neg_score"),
        round(round(col("pos_score"), 6) - round(col("neg_score"), 6), 6)
          .as("margin"))
  }

  /** Full-corpus hard negatives: EVERY labeled row is an anchor, so
    * candidates come from banded hyperplane LSH instead of a
    * broadcast (see object doc). A candidate pair mines in BOTH
    * directions (the band join emits a<b once; each side is the
    * other's candidate), then the label law and per-anchor top-k
    * apply as in [[hardNegatives]]. Only pairs that collide in ≥1
    * band are visible — the documented recall trade.
    * Output: (anchor_id, neighbor_id, score, rnk). */
  def hardNegativesLsh(corpus: DataFrame, idCol: String, vecCol: String,
      labelCol: String, dim: Int, k: Int,
      bandBits: Int = 3, bands: Int = 12): DataFrame =
    topKPerAnchorDups(
      lshScoredDirected(corpus, idCol, vecCol, labelCol, dim,
        bandBits, bands, mixedOnly = true),
      k)

  /** THE full-corpus LSH candidate front shared by [[hardNegativesLsh]]
    * and [[tripletsLsh]]: label-law projection, banded candidates,
    * vector/label join-back, the face's pair predicate, ONE exact
    * cosine per undirected pair, THEN symmetrization. Output:
    * (anchor_id, neighbor_id, is_pos, score), each surviving pair in
    * both directions.
    *
    * Scoring BEFORE the direction explode (r21) halves the join and
    * dot work of the old directed form — both faces' pair predicates
    * are symmetric (a label comparison) and dot/cosineFromNorms are
    * bitwise symmetric (aᵢ·bᵢ = bᵢ·aᵢ term by term, same fold
    * order), so one undirected score IS both directed scores. The
    * filter-before-score discipline survives as `mixedOnly`: the
    * hard-negative face prunes same-label pairs before any dot.
    * Symmetrize via explode, NOT a self-union: a union's two
    * branches each re-plan the whole candidate pipeline (signature,
    * band join), doubling the dominant cost; the explode keeps ONE
    * candidate subtree and just doubles its (small, vector-free)
    * rows. Raw multi-band candidates ride through (dedup = false):
    * the faces' tails absorb duplicates (topKPerAnchorDups'
    * dense_rank law / bestPairs' conditional-max fold), so the
    * pair-level distinct exchange — the largest shuffle of the old
    * plan — is gone. */
  private def lshScoredDirected(corpus: DataFrame, idCol: String,
      vecCol: String, labelCol: String, dim: Int,
      bandBits: Int, bands: Int, mixedOnly: Boolean): DataFrame = {
    val base = labeled(corpus, idCol, vecCol, labelCol, dim, "n")
    val cand = Dedup.bandedCandidatePairs(
      base.select(col("n_id"), col("n_vec")), "n_id", "n_vec",
      dim, bandBits, bands, dedup = false)
    val av = base.select(col("n_id").as("_id_a"),
      col("n_vec").as("_vec_a"), col("n_label").as("_label_a"),
      col("n_nrm").as("_nrm_a"))
    val nv = base.select(col("n_id").as("_id_b"),
      col("n_vec").as("_vec_b"), col("n_label").as("_label_b"),
      col("n_nrm").as("_nrm_b"))
    val paired = cand.join(av, Seq("_id_a")).join(nv, Seq("_id_b"))
    val kept = if (mixedOnly)
      paired.where(col("_label_a") =!= col("_label_b")) else paired
    kept
      .select(col("_id_a"), col("_id_b"),
        (col("_label_a") === col("_label_b")).as("is_pos"),
        VectorFunctions.cosineFromNorms(
          VectorFunctions.dot(col("_vec_a"), col("_vec_b")),
          col("_nrm_a"), col("_nrm_b")).as("score"))
      .select(explode(array(
          struct(col("_id_a").as("anchor_id"), col("_id_b").as("neighbor_id")),
          struct(col("_id_b").as("anchor_id"), col("_id_a").as("neighbor_id"))))
          .as("_p"),
        col("is_pos"), col("score"))
      .select(col("_p.anchor_id"), col("_p.neighbor_id"),
        col("is_pos"), col("score"))
  }

  /** Full-corpus triplets through banded LSH — [[triplets]]' scale
    * posture (the broadcast-anchor face needs a bounded anchor set; a
    * corpus-sized one can't broadcast): every labeled row is an
    * anchor, BOTH legs come from band collisions (the bucket join is
    * label-blind, so same-label candidates ride the same pipeline),
    * and the [[triplets]] rank/conditional-max fold picks the hardest
    * COLLIDING positive and negative per anchor. Approximate by
    * design on both legs — an anchor whose hardest true positive
    * never collides gets its hardest colliding one instead, and an
    * anchor with no colliding positive (or negative) produces no
    * triplet (inner semantics, as the exact face). High-cosine pairs
    * are exactly the pairs LSH keeps, and the positive leg WANTS
    * high-cosine pairs, so positive recall runs above negative
    * recall at the same geometry. Sizing as everywhere: pass
    * [[Dedup.lshSizing]]'d bandBits at scale. Output matches
    * [[triplets]]. */
  def tripletsLsh(corpus: DataFrame, idCol: String, vecCol: String,
      labelCol: String, dim: Int,
      bandBits: Int = 3, bands: Int = 12): DataFrame =
    bestPairs(
      lshScoredDirected(corpus, idCol, vecCol, labelCol, dim,
        bandBits, bands, mixedOnly = false))

  /** Recall@k audit of an approximate miner against the exact law —
    * the QA aggregate a release's mining section reports. For each
    * k ≤ maxK: |approx ∩ exact| / |exact| over (anchor, neighbor)
    * pairs at rank ≤ k. Both inputs are (anchor_id, neighbor_id,
    * score, rnk) frames ([[hardNegatives]] / [[hardNegativesLsh]]
    * shapes). Exact integer counts; the ratio rounds at the
    * boundary. Output: (k, n_exact, n_found, recall), k-ascending.
    *
    * Scale: one equi-join on (anchor, neighbor) + one k-explode of
    * rank-bounded rows — both sides are top-k frames (|anchors|·k
    * rows), never the corpus. */
  def recallAudit(exact: DataFrame, approx: DataFrame, maxK: Int): DataFrame = {
    // exact pair at rank r is in the exact top-k for every k in
    // [r, maxK] — explode those k; the approx side joins ONCE per
    // pair carrying its own rank, found at k iff that rank ≤ k
    val ex = exact.where(col("rnk") <= maxK)
      .select(col("anchor_id"), col("neighbor_id"),
        explode(sequence(col("rnk"), lit(maxK))).as("k"))
    val ap = approx.where(col("rnk") <= maxK)
      .select(col("anchor_id"), col("neighbor_id"), col("rnk").as("_arnk"))
    ex.join(ap, Seq("anchor_id", "neighbor_id"), "left")
      .groupBy(col("k"))
      .agg(count(lit(1L)).as("n_exact"),
        count(when(col("_arnk") <= col("k"), lit(1L))).as("n_found"))
      .withColumn("recall",
        round(col("n_found").cast("double") / col("n_exact"), 6))
      .orderBy(col("k"))
  }

  /** [[recallAudit]]'s scale posture (the audit itself must survive
    * 100 TB: the exact side is corpus × anchors, so auditing EVERY
    * anchor is the one corpus² job left in the tier): recall measured
    * on a SEEDED ANCHOR SAMPLE — anchors whose
    * md5(id ‖ ":" ‖ seed) sorts below `maxPrefix`, the
    * lexicographic-hex fraction trick (P = the prefix read as a hex
    * fraction: "2" ⇒ 2/16; both engines produce the same lowercase
    * hex, so the sample is bit-identical and the gate hash-checks).
    * The exact side then costs |sample| × corpus through the same
    * broadcast-anchor face as [[hardNegatives]]; the approx side is
    * the caller's ALREADY-MINED frame (any (anchor_id, neighbor_id,
    * score, rnk) output — the audit never re-mines), semi-joined to
    * the sampled anchors through a broadcast of the sample's ids.
    * Null ids never sample (md5 of NULL is NULL). Output:
    * [[recallAudit]]'s (k, n_exact, n_found, recall), where the
    * counts now read over the sample. */
  def recallAuditSampled(corpus: DataFrame, idCol: String,
      vecCol: String, labelCol: String, approx: DataFrame, dim: Int,
      maxK: Int, seed: String, maxPrefix: String = "2"): DataFrame = {
    val draw = md5(concat(col(idCol).cast("string"), lit(":"), lit(seed)))
    val sampled = corpus.where(col(idCol).isNotNull && draw < lit(maxPrefix))
    val exact = hardNegatives(corpus, idCol, vecCol, labelCol,
      sampled, dim, maxK)
    val ids = sampled.select(col(idCol).as("anchor_id")).distinct()
    recallAudit(exact, approx.join(broadcast(ids), Seq("anchor_id")), maxK)
  }

  /** In-batch-negative batch composition — the training-batch layout
    * contrastive losses assume (every non-positive row of a batch
    * serves as a negative for every anchor, so two SAME-label anchors
    * in one batch poison each other's loss): assign labeled rows to
    * batches such that NO BATCH CARRIES A LABEL TWICE. The law:
    * wave = the row's rank within its label (per-label window); a
    * wave holds at most one row per label by construction, and
    * chunking each wave into `batchSize` slices (per-wave window,
    * (label, id) order) preserves that — the guarantee holds for ANY
    * batchSize, which only caps batch size (batches thin out at the
    * tail where fewer labels still have wave-many rows; a batchSize
    * above the label count simply never fills). Batches are emitted
    * as the COMPOSITE key (wave, chunk) with slot ∈ [0, batchSize):
    * a dense global batch number would cost a single-partition pass
    * (the Packing.scala posture — manifests number shards later);
    * the composite key is already a stable citation.
    *
    * Scale: two keyed windows (label-partitioned, then
    * wave-partitioned), no global exchange, no join. Null ids/labels
    * are out (a batch row must be citable; the label law as
    * everywhere). Output: (anchor_id, label, wave, chunk, slot). */
  def inBatchNegativeBatches(df: DataFrame, idCol: String,
      labelCol: String, batchSize: Int): DataFrame = {
    require(batchSize >= 2, s"a contrastive batch needs >= 2 rows: $batchSize")
    val base = df
      .select(col(idCol).as("anchor_id"), col(labelCol).as("label"))
      .where(col("anchor_id").isNotNull && col("label").isNotNull)
    val byLabel = Window.partitionBy(col("label")).orderBy(col("anchor_id"))
    val byWave = Window.partitionBy(col("wave"))
      .orderBy(col("label"), col("anchor_id"))
    base
      .withColumn("wave", (row_number().over(byLabel) - 1).cast("long"))
      .withColumn("_pos", (row_number().over(byWave) - 1).cast("long"))
      .withColumn("chunk", floor(col("_pos") / batchSize).cast("long"))
      .withColumn("slot", pmod(col("_pos"), lit(batchSize.toLong)))
      .drop("_pos")
  }

  /** Seeded UNIFORM negative sampling — the random half of a
    * contrastive batch (training mixes hard negatives with uniform
    * ones so the model sees both boundary and background contrast):
    * per anchor, the k different-label rows ranked by
    * md5(anchor_id ‖ ":" ‖ neighbor_id ‖ ":" ‖ seed) — a
    * deterministic uniform draw both engines reproduce (the MinHash
    * md5-permutation trick applied to sampling), tie-broken by
    * neighbor_id. No vectors touched — the draw is label-driven, so
    * the scan prunes to two columns. Label law as everywhere: NULL
    * labels neither sample nor are sampled. Anchors broadcast; the
    * only shuffle is the per-anchor top-k window. */
  def sampledNegatives(corpus: DataFrame, idCol: String, labelCol: String,
      anchors: DataFrame, k: Int, seed: String): DataFrame = {
    // null-id rows are out on BOTH sides: a pair without ids can't be
    // cited as a training example, and concat_ws would silently SKIP
    // the null component while a SQL `||` twin propagates NULL — the
    // exclusion keeps the draw engine-reproducible (r19 continuation
    // review pass 3)
    val a = anchors.select(col(idCol).as("anchor_id"),
        col(labelCol).as("anchor_label"))
      .where(col("anchor_label").isNotNull && col("anchor_id").isNotNull)
    val c = corpus.select(col(idCol).as("neighbor_id"),
        col(labelCol).as("neighbor_label"))
      .where(col("neighbor_label").isNotNull && col("neighbor_id").isNotNull)
    val drawn = c.crossJoin(broadcast(a))
      .where(col("anchor_label") =!= col("neighbor_label"))
      .withColumn("draw", md5(concat_ws(":",
        col("anchor_id").cast("string"),
        col("neighbor_id").cast("string"), lit(seed))))
    val w = Window.partitionBy(col("anchor_id"))
      .orderBy(col("draw").asc, col("neighbor_id").asc)
    drawn.withColumn("rnk", row_number().over(w))
      .where(col("rnk") <= k)
      .select(col("anchor_id"), col("neighbor_id"), col("rnk"))
  }

  /** [[hardNegativesLsh]] with bandBits sized by [[Dedup.lshSizing]]
    * over the MINING population — the labeled, dim-valid subset, not
    * the raw corpus (the label law filters before the band join; on
    * a mostly-unlabeled corpus a raw-count sizing would over-pick
    * bits and silently halve recall). The self-applying 100 TB path:
    * fixed 3-bit bands measured 36× at 10× data on the sf1 decade
    * (bucket populations grow with n, so the band join's Σ bucket²
    * grows n²; the sizing law holds collision mass constant, bits
    * growing with ln n). At the 500-vector gate corpus the law lands
    * exactly on the fixed face's (3, 12); the q242 oracle COMPUTES
    * the law over the labeled count (r20), so the gate holds at
    * every SF. `bands` stays a knob but recall DEGRADES as the law
    * widens bits with n (q245 measured recall@3 = 0.61 at sf0.1 vs
    * 0.90 at the gate decade) — callers who need a recall floor use
    * [[hardNegativesLshRecall]], which holds recall and pays
    * collisions instead. Callers at scale pass `rowCount` (the
    * LABELED count, from catalog stats or the ingest census) to skip
    * the sizing count() scan. */
  def hardNegativesLshAuto(corpus: DataFrame, idCol: String, vecCol: String,
      labelCol: String, dim: Int, k: Int, bands: Int = 12,
      budget: Double = 1000.0, rowCount: Option[Long] = None): DataFrame = {
    val n = rowCount.getOrElse(
      labeled(corpus, idCol, vecCol, labelCol, dim, "n").count())
    val bits = Dedup.lshSizing(n, bands, 0.5, budget)
    hardNegativesLsh(corpus, idCol, vecCol, labelCol, dim, k, bits, bands)
  }

  /** A solved LSH geometry: `bandBits`/`bands` to pass to the banded
    * faces, the recall the discounted curve predicts at the solve's
    * cosine floor, the expected random-collision FRACTION of the
    * corpus each anchor pays (bands · 2^−bandBits — multiply by the
    * corpus size for the absolute candidate count), and whether the
    * target was reachable within the caps. */
  final case class LshRecallPlan(bandBits: Int, bands: Int,
      predictedRecall: Double, collisionFrac: Double, met: Boolean)

  /** Recall-targeted (bandBits, bands) solve (r19 verdict item 1:
    * [[hardNegativesLshAuto]]'s default geometry held bands at 12 and
    * budgeted collisions only — q245 measured recall@3 = 0.61 at the
    * sf0.1 decade, silently losing 4 of 10 true hard negatives).
    *
    * The published curve: a pair at cosine s collides in one
    * bandBits-wide band with probability p^bandBits,
    * p = 1 − arccos(s)/π, so recall = 1 − (1 − p^bandBits)^bands.
    * Applied RAW the curve overpredicts: it assumes every pair's
    * per-bit collision probability equals p(s), but the realized
    * per-pair bit agreement over a fixed plane family DISPERSES
    * around it (structured embeddings are not isotropic relative to
    * the planes — measured on the gate corpus: mean agreement 0.626
    * for pairs predicted 0.626, but the 10th–90th percentile spans
    * 0.47–0.77, and this round's analytic-only solve measured
    * recall@3 = 0.662 where the curve promised 0.9: wide bands put
    * the collision sigmoid's threshold above the dispersion's lower
    * tail). The solve therefore discounts: pEff = p(atCosine) −
    * `dispersion`, and the curve is evaluated at pEff.
    *
    * The solve itself: recall pins, cost minimizes — for each
    * bandBits b in [1, bitsCap], the SMALLEST bands r ≤ bandsCap
    * meeting the target at pEff (comparison-walked, not ceil'd, so
    * the oracle's replay is boundary-stable); among feasible (b, r)
    * pick the minimum expected collision fraction r · 2^−b, ties to
    * the smaller b; if nothing is feasible, (1, bandsCap) with
    * met = false. By default the corpus size drops out of the argmin
    * (it scales every candidate's verify cost equally), so the solve
    * needs NO count scan; passing `rowCount` switches the objective
    * to total per-anchor dim-dot work, r·b signature dots + r·2^−b·n
    * verifies — at small corpora the signature term dominates and
    * the n-aware pick trades narrower bands for fewer of them (the
    * sf1 decade measured the n-free floor-0.8 pick at 5.3k signature
    * dots vs 2.2k verifies per row). Recall is pinned by the target
    * under either objective. The physics this exposes honestly:
    * pEff < 1/2 (a low
    * cosine floor) forces 1-bit bands and a collision fraction of
    * r/2 — near-exhaustive, the true price of high recall at
    * below-random similarity; the scale path is raising `atCosine`
    * (mine only high-cosine negatives), where pEff > 1/2 lets wider
    * bands cut the fraction geometrically.
    *
    * Engine parity: the q247 oracle replays the solve verbatim
    * (costs r · 2^−b are exact doubles in both engines; the recall
    * values sit ≫ 1 ulp from the threshold at every crossing the
    * gates exercise; the spec pins the Scala arithmetic). */
  def lshRecallSizing(targetRecall: Double = 0.9, atCosine: Double = 0.35,
      dispersion: Double = 0.15, bitsCap: Int = 32,
      bandsCap: Int = 512, rowCount: Option[Long] = None): LshRecallPlan = {
    require(targetRecall > 0 && targetRecall < 1,
      s"targetRecall must be in (0,1): $targetRecall")
    require(atCosine > -1 && atCosine < 1,
      s"atCosine must be in (-1,1): $atCosine")
    val pEff = 1.0 - math.acos(atCosine) / math.Pi - dispersion
    require(pEff > 0 && pEff < 1,
      s"discounted collision probability out of range: $pEff " +
        s"(atCosine $atCosine, dispersion $dispersion)")
    val feasible = (1 to bitsCap).flatMap { b =>
      val x = math.pow(pEff, b)
      (1 to bandsCap)
        .find(r => 1.0 - math.pow(1.0 - x, r) >= targetRecall)
        .map { r =>
          val frac = r * math.pow(0.5, b)
          // objective in per-anchor dim-dot units: candidate verifies
          // (frac·n — the term that dominates as n → ∞) plus, when
          // the caller supplies n, the signature dots r·b (which
          // dominate at small corpora: the sf1 decade MEASURED the
          // n-free pick at floor 0.8 spending 5.3k signature dots/row
          // against 2.2k verifies — SCALING addendum 18). Without n
          // the fraction alone is the objective, the n-free gate law.
          val cost = rowCount match {
            case Some(n) => r.toDouble * b + frac * n
            case None => frac
          }
          (b, r, frac, cost, 1.0 - math.pow(1.0 - x, r))
        }
    }
    feasible.sortBy { case (b, _, _, cost, _) => (cost, b) }
      .headOption match {
      case Some((b, r, frac, _, rec)) =>
        LshRecallPlan(b, r, rec, frac, met = true)
      case None =>
        val rec = 1.0 - math.pow(1.0 - pEff, bandsCap)
        LshRecallPlan(1, bandsCap, rec, bandsCap * 0.5, met = false)
    }
  }

  /** [[hardNegativesLsh]] with BOTH bands and bandBits solved by
    * [[lshRecallSizing]] — the recall-aware face the r19 verdict
    * asked for: callers state the recall they need and the cosine
    * floor it must hold at, and the cheapest geometry meeting it
    * follows (no count scan — the solve is corpus-size-free).
    * `atCosine` should sit at a low quantile of the expected top-k
    * score distribution — the [[recallAudit]]'s own measurement; the
    * 0.35 default is calibrated to the gate corpus, whose exact
    * top-3 hard negatives sit at cosine 0.33–0.43 ([[SparkEntry]]
    * q247 measures recall@3 = 0.973–0.974 at the sf0.01/sf0.1
    * decades under the defaults, where the fixed-budget auto face
    * measured 0.61). Cost is explicit, not hidden: at the default
    * floor the plan is (1 bit, 4 bands) — a collision fraction of 2
    * (every anchor verifies ~2n candidates; recall at below-random
    * similarity IS near-exhaustive search). Callers mining at scale
    * raise the floor to the cosine their negatives actually carry
    * and the fraction drops geometrically; the returned
    * [[LshRecallPlan]] (via [[lshRecallSizing]]) reports both knobs'
    * consequences before any job runs. */
  def hardNegativesLshRecall(corpus: DataFrame, idCol: String,
      vecCol: String, labelCol: String, dim: Int, k: Int,
      targetRecall: Double = 0.9, atCosine: Double = 0.35,
      dispersion: Double = 0.15, rowCount: Option[Long] = None): DataFrame = {
    // rowCount refines the OBJECTIVE only (signature term weighted
    // against verifies — see lshRecallSizing); recall is pinned by
    // the target either way. The q247 gate runs the n-free default.
    val plan = lshRecallSizing(targetRecall, atCosine, dispersion,
      rowCount = rowCount)
    hardNegativesLsh(corpus, idCol, vecCol, labelCol, dim, k,
      plan.bandBits, plan.bands)
  }

  /** Continuous-ingest mining (r19 verdict item 4 — the TRAIN/MERGE/
    * APPLY posture the dedup family has everywhere): mine a DAILY
    * ANCHOR BATCH against the snapshot's PERSISTED band-bucket index
    * ([[Dedup.bandedBuckets]] stored with the corpus, appended per
    * delta, never rebuilt — the [[Dedup.nearDupAgainstSnapshot]]
    * pattern for embeddings) instead of re-hashing the corpus. Only
    * the batch pays signature cost; candidates come from the
    * (band, bucket) equi-join between the batch's buckets and the
    * stored index, then the label law, exact cosine and per-anchor
    * top-k apply as in [[hardNegativesLsh]].
    *
    * (dim, bandBits, bands) MUST equal the parameters the stored
    * index was built with — a mismatch silently empties the bucket
    * join rather than erroring (the nearDupAgainstSnapshot `n`
    * caveat). With batch = corpus and the index built over the same
    * labeled corpus, the output EQUALS [[hardNegativesLsh]] — the
    * q248 gate pins that against the q238 oracle verbatim; the
    * streaming posture (foreachBatch, index stream-static) is pinned
    * by StreamingSpec.
    *
    * Output: (anchor_id, neighbor_id, score, rnk). */
  def hardNegativesAgainstSnapshot(batch: DataFrame, corpus: DataFrame,
      idCol: String, vecCol: String, labelCol: String,
      priorBuckets: DataFrame, priorIdCol: String, dim: Int, k: Int,
      bandBits: Int = 3, bands: Int = 12): DataFrame = {
    val a = labeled(batch, idCol, vecCol, labelCol, dim, "anchor")
    val bBk = Dedup.bandedBuckets(
      a.select(col("anchor_id"), col("anchor_vec")),
      "anchor_id", "anchor_vec", dim, bandBits, bands)
    // =!= (not <=>-negation): a null-id row can never be cited as a
    // mining pair, matching the fixed face's a<b candidate law.
    // Raw multi-band candidates (r21): topKPerAnchorDups' dense_rank
    // law absorbs duplicate collisions, so the pair-level distinct
    // exchange over the candidate mass is gone
    val cand = bBk
      .join(priorBuckets.select(col(priorIdCol).as("neighbor_id"),
        col("band"), col("bucket")), Seq("band", "bucket"))
      .where(col("anchor_id") =!= col("neighbor_id"))
      .select(col("anchor_id"), col("neighbor_id"))
    val nv = labeled(corpus, idCol, vecCol, labelCol, dim, "neighbor")
    val scored = cand
      .join(a, Seq("anchor_id"))
      .join(nv, Seq("neighbor_id"))
      .where(col("anchor_label") =!= col("neighbor_label"))
      .withColumn("score", VectorFunctions.cosineFromNorms(
        VectorFunctions.dot(col("anchor_vec"), col("neighbor_vec")),
        col("anchor_nrm"), col("neighbor_nrm")))
    topKPerAnchorDups(scored, k)
  }
}
