package graft.operators

import java.util.Locale

import org.apache.spark.sql.{DataFrame, Dataset}
import org.apache.spark.sql.functions._

import graft.functions.{LlmResponse, SeqMatcher}

/** The entity-curation tier: the reference's per-document duplicate
  * finding / auto-merge / review split, exactly as the API layer runs
  * it (app/utils/entity_deduplication.py; app/api/entities.py:374-583).
  *
  * This tier is DISTINCT from the corpus-wide fuzzy dedup
  * ([[Entities.fuzzyPairsTiered]]): the curation endpoints operate on
  * one document's entities at a time, group them GREEDILY around the
  * first ungrouped seed (entity_deduplication.py:287-318 — NOT a
  * transitive closure: a member joins only if it matches the seed),
  * admit compound-term containment as a grouping reason alongside the
  * similarity threshold, and merge each group under an 18-entry
  * type-priority ladder, not by confidence alone
  * (entity_deduplication.py:370-456).
  *
  * Because the grouping is row-level Scala (not Column SQL), the
  * similarity here uses the EXACT difflib algorithm
  * ([[graft.functions.SeqMatcher]]) — no Levenshtein substitution, so
  * tier scores are bit-for-bit the reference's.
  *
  * Scale posture: one shuffle partitioning by document_id, then O(n²)
  * in the per-document entity count inside each group — the
  * reference's own model (its endpoints fetch one document's
  * entities; n is tens, not millions). Corpus-wide dedup at 100 TB
  * stays on the blocked [[Entities.fuzzyPairsTiered]] path; this tier
  * is for the curation surface, where per-document semantics are the
  * contract.
  */
object EntityCuration {

  /** One entity as the curation tier sees it. `ord` is the fetch
    * ordinal (the reference iterates entities in DB return order;
    * Spark frames carry no order, so the caller supplies it). */
  case class CurationEntity(
      document_id: Long, ord: Int, entity_id: String, entity_name: String,
      entity_type: String, confidence: Double,
      context: String, chunk_id: String)

  case class GroupMember(
      document_id: Long, group_id: Int, member_pos: Int, entity_ord: Int,
      entity_id: String, entity_name: String, entity_type: String,
      avg_sim: Double, is_auto: Boolean)

  case class MergedEntity(
      document_id: Long, group_id: Int, canonical_ord: Int,
      entity_id: String, entity_name: String, entity_type: String,
      confidence: Double, merge_count: Int, original_names: Seq[String],
      all_contexts: Seq[String], chunk_ids: Seq[String],
      normalized_name: String)

  // ---- row-level ports (entity_deduplication.py) ----

  /** Python str.strip() — shared canonical impl (one ws source). */
  private def pyStrip(s: String): String = LlmResponse.pyStrip(s)

  /** Python str.split() — whitespace runs, no empty tokens. */
  private def pySplit(s: String): Array[String] = LlmResponse.pySplit(s)

  /** normalize_name (entity_deduplication.py:57-86): lowercase+strip,
    * non-[\w\s-] → space, whitespace collapse, one leading and one
    * trailing article stripped. (?U) mirrors Python's unicode \w/\s. */
  def normalizeName(name: String): String = {
    if (name == null || name.isEmpty) return ""
    var n = pyStrip(name.toLowerCase(Locale.ROOT))
    n = n.replaceAll("(?U)[^\\w\\s\\-]", " ")
    n = pyStrip(n.replaceAll("(?U)\\s+", " "))
    n = n.replaceFirst("(?U)^(the|a|an)\\s+", "")
    n.replaceFirst("(?U)\\s+(the|a|an)$", "")
  }

  private val abbrMap: Map[String, String] = Entities.abbreviations.toMap

  /** expand_abbreviations (:87-107): word-wise table lookup. */
  def expandAbbreviations(text: String): String =
    pySplit(text.toLowerCase(Locale.ROOT))
      .map(w => abbrMap.getOrElse(w, w)).mkString(" ")

  /** _are_singular_plural (:163-203): whole-string +s/+es and y↔ies,
    * plus the compound rule (same word count > 1, exactly one pair
    * differing, and only by +s/+es). */
  def areSingularPlural(n1: String, n2: String): Boolean = {
    def sPair(a: String, b: String): Boolean =
      a + "s" == b || b + "s" == a || a + "es" == b || b + "es" == a
    if (sPair(n1, n2)) return true
    if (n1.endsWith("y") && n1.dropRight(1) + "ies" == n2) return true
    if (n2.endsWith("y") && n2.dropRight(1) + "ies" == n1) return true
    if (n1.endsWith("ies") && n1.dropRight(3) + "y" == n2) return true
    if (n2.endsWith("ies") && n2.dropRight(3) + "y" == n1) return true
    val w1 = pySplit(n1); val w2 = pySplit(n2)
    if (w1.length == w2.length && w1.length > 1) {
      var diff = 0
      var i = 0
      while (i < w1.length) {
        if (w1(i) != w2(i)) {
          if (!sPair(w1(i), w2(i))) return false
          diff += 1
        }
        i += 1
      }
      diff == 1
    } else false
  }

  /** _are_variants (:205-236): equal after stripping every
    * non-alphanumeric (the model-number regex branch is subsumed —
    * same prefix + same number means the cleaned strings are equal). */
  def areVariants(n1: String, n2: String): Boolean =
    n1.replaceAll("[^a-z0-9]", "") == n2.replaceAll("[^a-z0-9]", "")

  /** calculate_similarity (:109-162): exact 1.0 → plural 0.98 →
    * abbreviation 0.95 → max(4 SequenceMatcher ratios over the
    * norm/expanded combos, substring 0.85 floor, variant 0.9 floor). */
  def calculateSimilarity(name1: String, name2: String): Double = {
    val n1 = normalizeName(name1); val n2 = normalizeName(name2)
    if (n1 == n2) return 1.0
    if (areSingularPlural(n1, n2)) return 0.98
    val e1 = expandAbbreviations(n1); val e2 = expandAbbreviations(n2)
    if (e1 == e2) return 0.95
    var base = math.max(
      math.max(SeqMatcher.ratio(n1, n2), SeqMatcher.ratio(e1, e2)),
      math.max(SeqMatcher.ratio(n1, e2), SeqMatcher.ratio(e1, n2)))
    if (n2.contains(n1) || n1.contains(n2)) base = math.max(base, 0.85)
    if (areVariants(n1, n2)) base = math.max(base, 0.9)
    base
  }

  /** _is_compound_term (:238-272): at least one multi-word name, and
    * the smaller word SET strictly contained in the larger. */
  def isCompoundTerm(name1: String, name2: String): Boolean = {
    val n1 = normalizeName(name1); val n2 = normalizeName(name2)
    if (!n1.contains(' ') && !n2.contains(' ')) return false
    val w1 = pySplit(n1).toSet; val w2 = pySplit(n2).toSet
    if (w1.size < w2.size) w1.subsetOf(w2)
    else if (w2.size < w1.size) w2.subsetOf(w1)
    else false
  }

  /** find_duplicates (:274-369): greedy first-seed grouping in fetch
    * order. cross_type=true (the endpoints' default) compares every
    * ungrouped entity against the seed, grouping on similarity >=
    * threshold OR compound containment; cross_type=false first
    * partitions by lowercased type (first-seen order) and drops the
    * compound reason. Only groups with > 1 member are returned. */
  def findDuplicates(entities: Seq[CurationEntity], threshold: Double,
      crossType: Boolean = true): Seq[Seq[CurationEntity]] = {
    if (entities.isEmpty) return Nil
    val out = Seq.newBuilder[Seq[CurationEntity]]
    def greedy(pool: Seq[CurationEntity], withCompound: Boolean): Unit = {
      val grouped = scala.collection.mutable.BitSet.empty
      for (i <- pool.indices if !grouped(i)) {
        val seed = pool(i)
        grouped += i
        val group = Seq.newBuilder[CurationEntity]
        group += seed
        var n = 1
        for (j <- i + 1 until pool.length if !grouped(j)) {
          val cand = pool(j)
          val sim = calculateSimilarity(seed.entity_name, cand.entity_name)
          val compound =
            withCompound && isCompoundTerm(seed.entity_name, cand.entity_name)
          if (sim >= threshold || compound) {
            group += cand
            grouped += j
            n += 1
          }
        }
        if (n > 1) out += group.result()
      }
    }
    if (crossType) greedy(entities, withCompound = true)
    else {
      // groupBy with first-seen type order, like Python's dict
      val order = scala.collection.mutable.LinkedHashMap
        .empty[String, scala.collection.mutable.ArrayBuffer[CurationEntity]]
      entities.foreach { e =>
        order.getOrElseUpdate(e.entity_type.toLowerCase(Locale.ROOT),
          scala.collection.mutable.ArrayBuffer.empty) += e
      }
      order.values.foreach(p => greedy(p.toSeq, withCompound = false))
    }
    out.result()
  }

  /** Mean pairwise calculate_similarity over a group's names
    * (entities.py:408-420 and entity_deduplication.py:474-487). */
  def avgSimilarity(group: Seq[CurationEntity]): Double = {
    var total = 0.0; var count = 0
    for (i <- group.indices; j <- i + 1 until group.length) {
      total += calculateSimilarity(group(i).entity_name, group(j).entity_name)
      count += 1
    }
    if (count > 0) total / count else 0.0
  }

  /** Type-priority ladder (entity_deduplication.py:380-400): more
    * specific types win the canonical slot; unknown types sink to 99. */
  val typePriority: Map[String, Int] = Map(
    "component" -> 1, "procedure" -> 2, "problem" -> 3,
    "specification" -> 4, "system" -> 5, "technology" -> 6,
    "chemical" -> 7, "product" -> 8, "event" -> 9, "organization" -> 10,
    "person" -> 11, "location" -> 12, "date" -> 13, "measurement" -> 14,
    "state" -> 15, "condition" -> 16, "concept" -> 17, "other" -> 18)

  /** merge_entity_data (:370-456): stable sort by (type priority,
    * -confidence), keep the head as the merged entity; confidence =
    * group max; original_names = the distinct names (emitted sorted —
    * the reference materializes a Python set, whose order is
    * unspecified); all_contexts/chunk_ids collected in the group's
    * fetch order (chunk_ids deduped; emitted sorted, same reason);
    * normalized_name from the canonical name. */
  def mergeEntityData(group: Seq[CurationEntity]): MergedEntity = {
    val sorted = group.sortBy(e =>
      (typePriority.getOrElse(e.entity_type.toLowerCase(Locale.ROOT), 99),
        -e.confidence))
    val head = sorted.head
    MergedEntity(
      document_id = head.document_id,
      group_id = -1, // caller assigns
      canonical_ord = head.ord,
      entity_id = head.entity_id,
      entity_name = head.entity_name,
      entity_type = head.entity_type,
      confidence = group.map(_.confidence).max,
      merge_count = group.length,
      original_names =
        group.map(_.entity_name).filter(_.nonEmpty).distinct.sorted,
      all_contexts = group.flatMap(e => Option(e.context)).filter(_.nonEmpty),
      chunk_ids =
        group.flatMap(e => Option(e.chunk_id)).filter(_.nonEmpty)
          .distinct.sorted,
      normalized_name = normalizeName(head.entity_name))
  }

  // ---- DataFrame tier ----

  private def asCuration(entities: DataFrame): Dataset[CurationEntity] = {
    val spark = entities.sparkSession
    import spark.implicits._
    val withOpt = Seq("context", "chunk_id").foldLeft(entities) { (df, c) =>
      if (df.columns.contains(c)) df else df.withColumn(c, lit(null: String))
    }
    withOpt.select(
      col("document_id").cast("long"), col("ord").cast("int"),
      col("entity_id").cast("string"), col("entity_name").cast("string"),
      col("entity_type").cast("string"), col("confidence").cast("double"),
      col("context").cast("string"), col("chunk_id").cast("string"))
      .as[CurationEntity]
  }

  /** Per-document duplicate groups (POST /entities/find-duplicates,
    * entities.py:374-507): one row per group member, with the group's
    * mean pairwise similarity and the auto-merge flag (avg >= 0.95 —
    * the endpoint's hardcoded arm). Input columns: document_id, ord,
    * entity_id, entity_name, entity_type, confidence
    * [, context, chunk_id]. One shuffle on document_id. */
  def duplicateGroups(entities: DataFrame, threshold: Double = 0.85,
      crossType: Boolean = true, autoThreshold: Double = 0.95): DataFrame = {
    val spark = entities.sparkSession
    import spark.implicits._
    asCuration(entities)
      .groupByKey(_.document_id)
      .flatMapGroups { (doc, it) =>
        val ents = it.toSeq.sortBy(_.ord)
        findDuplicates(ents, threshold, crossType).iterator.zipWithIndex
          .flatMap { case (g, gi) =>
            val avg = avgSimilarity(g)
            g.iterator.zipWithIndex.map { case (e, mi) =>
              GroupMember(doc, gi, mi, e.ord, e.entity_id, e.entity_name,
                e.entity_type, avg, avg >= autoThreshold)
            }
          }
      }
      .toDF()
  }

  /** The auto-merge arm of find-duplicates (entities.py:404-450): each
    * group whose mean similarity clears the threshold collapses via
    * [[mergeEntityData]]; group_id keeps the group's index in the
    * document's greedy emission order. */
  def autoMerged(entities: DataFrame, threshold: Double = 0.85,
      crossType: Boolean = true, autoThreshold: Double = 0.95): DataFrame = {
    val spark = entities.sparkSession
    import spark.implicits._
    asCuration(entities)
      .groupByKey(_.document_id)
      .flatMapGroups { (_, it) =>
        val ents = it.toSeq.sortBy(_.ord)
        findDuplicates(ents, threshold, crossType).iterator.zipWithIndex
          .filter { case (g, _) => avgSimilarity(g) >= autoThreshold }
          .map { case (g, gi) => mergeEntityData(g).copy(group_id = gi) }
      }
      .toDF()
  }

  /** deduplicate_entities (:458-530): auto groups merge, review
    * groups pass through flagged, everything else is kept. Output adds
    * `arm` ("kept" | "merged" | "review") and, for review members,
    * the group's mean similarity. */
  def dedupWithReview(entities: DataFrame,
      autoThreshold: Double = 0.95, reviewThreshold: Double = 0.85,
      crossType: Boolean = true): DataFrame = {
    val spark = entities.sparkSession
    import spark.implicits._
    asCuration(entities)
      .groupByKey(_.document_id)
      .flatMapGroups { (doc, it) =>
        val ents = it.toSeq.sortBy(_.ord)
        val groups = findDuplicates(ents, reviewThreshold, crossType)
        val scored = groups.map(g => (g, avgSimilarity(g)))
        val (auto, review) = scored.partition(_._2 >= autoThreshold)
        val removed = auto.iterator.flatMap(_._1).map(_.entity_id).toSet
        val inReview = review.iterator.flatMap(_._1).map(_.entity_id).toSet
        val kept = ents.iterator
          .filter(e => !removed(e.entity_id) && !inReview(e.entity_id))
          .map(e => (doc, "kept", e.entity_id, e.entity_name, e.entity_type,
            e.confidence, 1, 0.0))
        val merged = auto.iterator.map { case (g, avg) =>
          val m = mergeEntityData(g)
          (doc, "merged", m.entity_id, m.entity_name, m.entity_type,
            m.confidence, m.merge_count, avg)
        }
        val flagged = review.iterator.flatMap { case (g, avg) =>
          g.iterator.map(e => (doc, "review", e.entity_id, e.entity_name,
            e.entity_type, e.confidence, 1, avg))
        }
        kept ++ merged ++ flagged
      }
      .toDF("document_id", "arm", "entity_id", "entity_name", "entity_type",
        "confidence", "merge_count", "avg_sim")
  }

  /** POST /entities/merge (entities.py:507-583): explicit merge of a
    * member set under a caller-chosen target name/type. Input: one row
    * per member with merge_key, target_name, target_type. Confidence
    * = member max; original_names in fetch order; original_types =
    * the distinct type set (sorted — Python set order unspecified);
    * the merged id is the first member's (entities[0]). */
  def mergeApi(members: DataFrame): DataFrame =
    members
      .groupBy(col("merge_key"), col("target_name"), col("target_type"))
      .agg(
        min(struct(col("ord"), col("entity_id"))).as("_first"),
        max(col("confidence")).as("confidence"),
        count(lit(1)).cast("int").as("merge_count"),
        array_join(array_sort(collect_list(
          struct(col("ord"), col("entity_name")))).getField("entity_name"),
          "|").as("original_names"),
        array_join(array_sort(array_distinct(
          collect_list(col("entity_type")))), "|").as("original_types"))
      .select(col("merge_key"),
        col("_first.entity_id").as("entity_id"),
        col("target_name").as("entity_name"),
        col("target_type").as("entity_type"),
        col("confidence"), col("merge_count"),
        col("original_names"), col("original_types"),
        (col("merge_count") - 1).as("deleted_entities"))
}
