package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.Partitioning

/** Entity pipeline: mention extraction (stub tier), type/confidence
  * normalization, quality filtering, canonicalization, fuzzy dedup,
  * relationship extraction + taxonomy validation, and n-hop graph
  * traversal — the Spark re-expression of the reference's v2 entity
  * flow:
  *  - mention extraction: app/services/entity_extraction_runner_v2.py:1091-1674
  *    (LLM tier stubbed by a deterministic rare-term heuristic; the
  *    DataFrame shapes and downstream ops are the real thing)
  *  - type normalization + synonyms: entity_extraction_runner_v2.py:649-792
  *  - confidence normalization: entity_extraction_runner_v2.py:793-848
  *  - quality filter: entity_extraction_runner_v2.py:849-1078
  *  - canonicalization: app/flows/entity_extraction_flow_v2.py:63-75
  *  - fuzzy dedup tiers: app/utils/entity_deduplication.py:110-162
  *  - relationship dedup/validation: app/extraction/relationship_extractor.py:533-556,
  *    app/models/relationships.py:213-218
  *  - n-hop traversal: app/services/neo4j_service.py:429-489
  *
  * Scale: mention extraction is a narrow per-row stage; candidate
  * pairing for fuzzy dedup uses prefix blocking (never O(n²) over the
  * corpus); graph traversal is iterated equi-joins, broadcast when a
  * frontier is small.
  */
object Entities {

  /** Mention extraction, deterministic tier: a mention is an
    * occurrence of a corpus-rare token (document frequency <= maxDf).
    * Stands in for the LLM extractor with the reference's
    * PER-OCCURRENCE contract (entity_v2.py:23-40): one row per
    * occurrence with its own start_offset/end_offset (1-based start,
    * exclusive end, on the lowercased text). tf/df ride along as the
    * confidence basis of the stub tier.
    */
  def extractMentions(df: DataFrame, idCol: String, textCol: String,
      maxDf: Int): DataFrame = {
    // ONE tokenize pass: tf and df both derive from the occurrence
    // stream itself (tf = per-(doc, token) count, df = distinct docs
    // per token) — no second scan through the inverted index.
    // Offsets RIDE THE tf AGGREGATE as a collected list (r21): the
    // old shape joined the raw occurrence stream back against the
    // (id, token)-level stats — re-shuffling every occurrence row by
    // (id, token) — where collecting the offsets into the aggregate
    // and exploding them after the df join emits the identical row
    // multiset with the occurrence stream read ONCE and only
    // (id, token)-level rows ever joined. dfreq's countDistinct also
    // collapses to count(1) (toks is unique per (id, token) by
    // construction), dropping the Expand double-shuffle.
    // null ids drop at the source (r22, from the r21 ADVICE): the old
    // shape's countDistinct(id) ignored null-id rows in df and its
    // occurrences equi-join on (id, token) dropped their mentions;
    // count(1) + explode-from-aggregate would have counted and emitted
    // them — this filter restores the original contract exactly (and
    // is a no-op on the gate corpora, whose ids are non-null).
    val occurrences = Partitioning.spread(
        df.select(col(idCol), col(textCol)).where(col(idCol).isNotNull))
      .select(col(idCol),
        explode(graft.functions.NativeText.bm25TokenOffsetsOf(col(textCol))).as("m"))
      .select(col(idCol), col("m.token").as("token"),
        col("m.start_offset").as("start_offset"),
        col("m.end_offset").as("end_offset"))
    val toks = occurrences.groupBy(col(idCol), col("token"))
      .agg(count(lit(1)).as("tf"),
        collect_list(struct(col("start_offset"), col("end_offset")))
          .as("_offs"))
    val dfreq = toks.groupBy(col("token"))
      .agg(count(lit(1)).as("df"))
      .where(col("df") <= maxDf)
    toks.join(dfreq, Seq("token"))
      .select(col(idCol), col("token"), col("tf"), col("df"),
        explode(col("_offs")).as("_o"))
      .select(col(idCol),
        col("token").as("mention_text"),
        col("_o.start_offset").as("start_offset"),
        col("_o.end_offset").as("end_offset"),
        col("tf"), col("df"))
  }

  /** Entity-type normalization: uppercase, non-alnum → underscore,
    * synonym remap, whitelist (else OTHER).
    * (entity_extraction_runner_v2.py:649-792 semantics.)
    */
  val typeSynonyms: Seq[(String, String)] = Seq(
    "ORG" -> "ORGANIZATION", "COMPANY" -> "ORGANIZATION",
    "PER" -> "PERSON", "PEOPLE" -> "PERSON",
    "LOC" -> "LOCATION", "PLACE" -> "LOCATION",
    "PROD" -> "PRODUCT", "TECH" -> "TECHNOLOGY")
  val allowedTypes: Seq[String] = Seq(
    "PERSON", "ORGANIZATION", "LOCATION", "PRODUCT", "TECHNOLOGY",
    "COMPONENT", "MATERIAL", "PROCESS", "EVENT", "CONCEPT")

  def normalizeType(c: Column): Column = {
    val up = upper(regexp_replace(
      regexp_replace(c, "[^A-Za-z0-9]+", "_"), "^_+|_+$", ""))
    val remapped = typeSynonyms.foldRight(up) { case ((from, to), acc) =>
      when(up === from, lit(to)).otherwise(acc)
    }
    when(remapped.isin(allowedTypes: _*), remapped).otherwise(lit("OTHER"))
  }

  /** Lexical type-bias tier (entity_extraction_runner_v2.py:954-961):
    * cloth/towel/pad/wipe terms in the mention NAME override a
    * non-MATERIAL type unless a strong tool counter-signal appears —
    * the keyword lists are the reference's, verbatim. */
  private val materialBiasWords = Seq("cloth", "towel", "paper towel",
    "shop towel", "microfiber", "micro-fiber", "micro fibre", "wipe",
    "wipes", "wiping", "pad", "pads", "lint-free", "lint free")
  private val materialCounterWords = Seq("applicator tool",
    "applicator-tip", "applicator tip", "specialized tool", "equipment")

  def lexicalTypeBias(name: Column, etype: Column): Column = {
    val lx = lower(name)
    def containsAny(ws: Seq[String]) =
      ws.map(w => lx.contains(w)).reduce(_ || _)
    when(etype =!= "MATERIAL" && containsAny(materialBiasWords) &&
        !containsAny(materialCounterWords), lit("MATERIAL"))
      .otherwise(etype)
  }

  /** Clamp heterogeneous confidence values to [0,1]: percents (>1)
    * divided by 100, negatives → 0, nulls → 0.5 default.
    * (entity_extraction_runner_v2.py:793-848.)
    */
  def normalizeConfidence(c: Column): Column = {
    val d = c.try_cast("double")
    when(d.isNull, lit(0.5))
      .when(d < 0, lit(0.0))
      .when(d > 1 && d <= 100, d / 100.0)
      .when(d > 100, lit(1.0))
      .otherwise(d)
  }

  /** Mention quality filter: drop empty/short (<3 chars unless
    * all-caps acronym), pure digits, and generic stopword-ish terms.
    * (entity_extraction_runner_v2.py:849-1078 semantics.)
    */
  val genericTerms: Seq[String] = Seq(
    "thing", "stuff", "item", "data", "value", "info", "part")

  def qualityFilter(df: DataFrame, textCol: String): DataFrame = {
    val t = col(textCol)
    df.where(
      t.isNotNull &&
      length(t) > 0 &&
      (length(t) >= 3 || t === upper(t)) &&
      !t.rlike("^[0-9]+$") &&
      !lower(t).isin(genericTerms: _*))
  }

  /** Entity-name normalization for canonicalization: lowercase, strip
    * punctuation, collapse whitespace, drop leading articles.
    * (entity_deduplication.py:57-86.)
    */
  def normalizeName(c: Column): Column =
    trim(regexp_replace(
      regexp_replace(regexp_replace(lower(c), "^(the|a|an)\\s+", ""),
        "[^a-z0-9\\s]", " "),
      "\\s+", " "))

  /** ±`width`-char context window around each mention occurrence
    * (document_tasks.py:838-871: canonical entities carry the text
    * surrounding the mention). Slices the lowercased text — the frame
    * the per-occurrence offsets are measured on. Input `mentions`
    * must carry start_offset/end_offset ([[extractMentions]] output);
    * adds `context`.
    */
  def mentionContext(mentions: DataFrame, docs: DataFrame, idCol: String,
      textCol: String, width: Int = 160): DataFrame = {
    val lowered = docs.select(col(idCol), lower(col(textCol)).as("_lt"))
    mentions.join(lowered, Seq(idCol))
      .withColumn("_cs", greatest(col("start_offset") - width, lit(1)))
      .withColumn("context",
        col("_lt").substr(col("_cs"), col("end_offset") + width - col("_cs")))
      .drop("_lt", "_cs")
  }

  /** Merge each duplicate group keeping the highest-confidence member
    * (entity_deduplication.py:370-456): canonical = argmax confidence
    * with the lexicographically-smallest name as the deterministic
    * tiebreak; the other members become sorted aliases. One shuffle on
    * the group key, all aggregates map-side combinable (the argmax is
    * a struct-min over (-confidence, name)).
    */
  def mergeDuplicateGroups(members: DataFrame, groupCol: String,
      nameCol: String, confCol: String): DataFrame =
    members.groupBy(col(groupCol))
      .agg(
        min(struct((-col(confCol)).as("_nc"), col(nameCol).as("_n"))).as("_best"),
        max(col(confCol)).as("confidence"),
        count(lit(1)).as("n_members"),
        sort_array(collect_list(col(nameCol))).as("_all"))
      .select(col(groupCol),
        col("_best._n").as("canonical_name"),
        col("confidence"),
        col("n_members"),
        // drop exactly ONE occurrence of the canonical (array_remove
        // would delete same-named non-canonical members too, making
        // aliases inconsistent with n_members)
        array_join(concat(
          slice(col("_all"), lit(1),
            (array_position(col("_all"), col("_best._n")) - 1).cast("int")),
          slice(col("_all"),
            (array_position(col("_all"), col("_best._n")) + 1).cast("int"),
            size(col("_all")))), "|").as("aliases"))

  /** Canonicalization: unique entities by (normalized name, type);
    * keeps the minimum id as canonical and counts members.
    * (entity_extraction_flow_v2.py:63-75.)
    */
  def canonicalize(mentions: DataFrame, idCol: String, textCol: String,
      typeCol: String): DataFrame =
    mentions
      .select(col(idCol), normalizeName(col(textCol)).as("canonical_name"),
        col(typeCol).as("entity_type"))
      .groupBy(col("canonical_name"), col("entity_type"))
      .agg(min(col(idCol)).as("canonical_id"), count(lit(1)).as("n_mentions"))

  /** Canonical entity descriptions (canonical_description_service.py):
    * an LLM definition per canonical (name, type) through the same
    * once-per-partition client boundary as TwoTier.withContext.
    * Output: (canonical_name, entity_type, description). */
  def canonicalDescriptions(canonical: DataFrame, nameCol: String,
      typeCol: String, mkClient: () => LlmClient): DataFrame = {
    val spark = canonical.sparkSession
    import spark.implicits._
    canonical.select(col(nameCol).cast("string"), col(typeCol).cast("string"))
      .as[(String, String)]
      .mapPartitions { it =>
        val client = mkClient()
        it.map { case (name, etype) =>
          (name, etype,
            client.complete(s"Define the entity.\n\n$name (${etype.toLowerCase})"))
        }
      }
      .toDF("canonical_name", "entity_type", "description")
  }

  /** Fuzzy near-duplicate candidate pairs over canonical names with
    * prefix blocking: only names sharing a first-2-char block are
    * compared (keeps the self-join linear-ish under skew control),
    * then scored by normalized Levenshtein similarity
    * 1 - lev(a,b)/greatest(len(a),len(b)) >= minSim.
    * (entity_deduplication.py:110-162's "variant" tier; the exact
    * SequenceMatcher tiers live above this as refinements.)
    */
  def fuzzyPairs(names: DataFrame, nameCol: String, minSim: Double): DataFrame = {
    val a = names.select(col(nameCol).as("name_a"))
      .distinct().withColumn("blk", substring(col("name_a"), 1, 2))
    val b = names.select(col(nameCol).as("name_b"))
      .distinct().withColumn("blk", substring(col("name_b"), 1, 2))
    a.join(b, Seq("blk"))
      .where(col("name_a") < col("name_b"))
      .withColumn("lev", levenshtein(col("name_a"), col("name_b")))
      .withColumn("sim",
        lit(1.0) - col("lev").cast("double") /
          greatest(length(col("name_a")), length(col("name_b"))).cast("double"))
      .where(col("sim") >= minSim)
      .select(col("name_a"), col("name_b"), col("lev"), col("sim"))
  }

  // ---- tiered fuzzy similarity (entity_deduplication.py:18-236) ----

  /** Abbreviation → expansion table (entity_deduplication.py:18-55,
    * verbatim; 'nc' maps to itself to protect model numbers). */
  val abbreviations: Seq[(String, String)] = Seq(
    "ipa" -> "isopropyl alcohol", "nc" -> "nc",
    "lcd" -> "liquid crystal display", "led" -> "light emitting diode",
    "pcb" -> "printed circuit board", "cpu" -> "central processing unit",
    "gpu" -> "graphics processing unit", "ram" -> "random access memory",
    "rom" -> "read only memory", "ac" -> "alternating current",
    "dc" -> "direct current", "psi" -> "pounds per square inch",
    "rpm" -> "revolutions per minute", "temp" -> "temperature",
    "config" -> "configuration", "spec" -> "specification",
    "mfg" -> "manufacturing", "mfr" -> "manufacturer",
    "qty" -> "quantity", "req" -> "required", "min" -> "minimum",
    "max" -> "maximum", "avg" -> "average", "std" -> "standard",
    "ref" -> "reference", "ver" -> "version", "rev" -> "revision",
    "dept" -> "department", "mgmt" -> "management",
    "admin" -> "administration", "eng" -> "engineering",
    "maint" -> "maintenance", "ops" -> "operations",
    "qa" -> "quality assurance", "qc" -> "quality control")

  /** Match-normalization (entity_deduplication.py:57-86) — unlike
    * [[normalizeName]] it KEEPS hyphens/underscores and strips
    * trailing as well as leading articles. */
  def normalizeForMatch(c: Column): Column =
    regexp_replace(
      regexp_replace(
        trim(regexp_replace(
          regexp_replace(lower(trim(c)), "[^a-z0-9_\\s-]", " "),
          "\\s+", " ")),
        "^(the|a|an)\\s+", ""),
      "\\s+(the|a|an)$", "")

  /** Word-wise abbreviation expansion (entity_deduplication.py:87-107). */
  def expandAbbreviations(c: Column): Column = {
    val m = map(abbreviations.flatMap { case (k, v) => Seq(lit(k), lit(v)) }: _*)
    array_join(transform(split(c, " "), w => coalesce(element_at(m, w), w)), " ")
  }

  /** Singular/plural tier (entity_deduplication.py:163-203):
    * whole-string +s/+es and y↔ies rules, plus the compound rule —
    * same word count > 1 with EXACTLY one word pair differing, and
    * that pair differing only by +s/+es. */
  def pluralEq(a: Column, b: Column): Column = {
    def dropLast(c: Column, n: Int) = c.substr(lit(1), length(c) - n)
    val whole =
      (concat(a, lit("s")) === b) || (concat(b, lit("s")) === a) ||
      (concat(a, lit("es")) === b) || (concat(b, lit("es")) === a) ||
      (a.endsWith("y") && concat(dropLast(a, 1), lit("ies")) === b) ||
      (b.endsWith("y") && concat(dropLast(b, 1), lit("ies")) === a)
    val wa = split(a, " ")
    val wb = split(b, " ")
    val pairStats = zip_with(wa, wb, (x, y) => {
      val sPair = concat(x, lit("s")) === y || concat(y, lit("s")) === x ||
        concat(x, lit("es")) === y || concat(y, lit("es")) === x
      struct(
        when(x =!= y, 1).otherwise(0).as("d"),
        when(x =!= y && !sPair, 1).otherwise(0).as("bad"))
    })
    val nDiff = aggregate(pairStats, lit(0), (acc, p) => acc + p.getField("d"))
    val nBad = aggregate(pairStats, lit(0), (acc, p) => acc + p.getField("bad"))
    val compound = size(wa) === size(wb) && size(wa) > 1 &&
      nDiff === 1 && nBad === 0
    whole || compound
  }

  /** Variant tier (entity_deduplication.py:205-236): equal after
    * stripping every non-alphanumeric (NC2056 ≈ NC-2056; the model-
    * number regex branch is subsumed — same prefix and same number
    * means the cleaned strings are equal). */
  def variantEq(a: Column, b: Column): Column =
    regexp_replace(a, "[^a-z0-9]", "") === regexp_replace(b, "[^a-z0-9]", "")

  /** Tiered similarity over pre-normalized names + their expansions
    * (entity_deduplication.py:109-162): exact 1.0 → plural 0.98 →
    * abbreviation 0.95 → max(levenshtein ratio over the 4
    * norm/expanded combos, substring 0.85, variant 0.9).
    * (Base ratio uses normalized Levenshtein in place of Python's
    * SequenceMatcher — the one documented divergence, chosen because
    * it is expressible in any SQL engine, and MEASURED benign:
    * SequenceMatcherParitySpec compares both bases over every pair of
    * normalized part names — max |diff| 0.375, mean 0.101, and ZERO
    * pairs grouping differently at the reference's 0.85 threshold,
    * because the divergence concentrates far below it.) */
  def tieredSim(na: Column, nb: Column, ea: Column, eb: Column): Column = {
    def ratio(x: Column, y: Column): Column =
      lit(1.0) - levenshtein(x, y).cast("double") /
        greatest(length(x), length(y)).cast("double")
    val base = greatest(ratio(na, nb), ratio(ea, eb), ratio(na, eb), ratio(ea, nb))
    when(na === nb, lit(1.0))
      .when(pluralEq(na, nb), lit(0.98))
      .when(ea === eb, lit(0.95))
      .otherwise(greatest(base,
        when(instr(nb, na) > 0 || instr(na, nb) > 0, lit(0.85)).otherwise(lit(0.0)),
        when(variantEq(na, nb), lit(0.9)).otherwise(lit(0.0))))
  }

  /** Fuzzy candidate pairs under the full reference tier stack:
    * two-key prefix blocking, expansion precomputed once per distinct
    * name, tiered score filtered to >= minSim. Output
    * (name_a, name_b, sim).
    *
    * Blocking uses the UNION of the first-2-char prefixes of the
    * match-normalized name AND of its abbreviation expansion: the
    * 0.95 abbreviation tier fires on expanded(a) == expanded(b), and
    * an abbreviation rarely shares a name prefix with its expansion
    * ("ipa" blocks on "ip", "isopropyl alcohol" on "is" — name-prefix
    * blocking alone would never generate exactly the pairs the tier
    * exists for). The expansion prefix puts "ipa" and "isopropyl
    * alcohol" in the same "is" block. Pairs matched by both keys are
    * deduped before scoring. The reference compares within candidate
    * groups without blocking (entity_deduplication.py:274-369);
    * blocking is our scale substitution and must not cost the tier.
    */
  def fuzzyPairsTiered(names: DataFrame, nameCol: String,
      minSim: Double): DataFrame = {
    val n = names.select(normalizeForMatch(col(nameCol)).as("name"))
      .where(length(col("name")) > 0).distinct()
      .withColumn("exp", expandAbbreviations(col("name")))
      .withColumn("blk", explode(array_distinct(array(
        substring(col("name"), 1, 2), substring(col("exp"), 1, 2)))))
    val a = n.select(col("name").as("name_a"), col("exp").as("exp_a"), col("blk"))
    val b = n.select(col("name").as("name_b"), col("exp").as("exp_b"), col("blk"))
    a.join(b, Seq("blk"))
      .where(col("name_a") < col("name_b"))
      .select(col("name_a"), col("name_b"), col("exp_a"), col("exp_b"))
      .distinct() // a pair can match on both block keys
      .withColumn("sim", tieredSim(col("name_a"), col("name_b"),
        col("exp_a"), col("exp_b")))
      .where(col("sim") >= minSim)
      .select(col("name_a"), col("name_b"), col("sim"))
  }

  /** Full 14-type relationship taxonomy (relationships.py:11-198):
    * label → (allowed source types, allowed target types). "Any" is
    * the wildcard (RELATES_TO connects any entity types).
    */
  val relTaxonomy: Seq[(String, Seq[String], Seq[String])] = Seq(
    ("COMPONENT_OF", Seq("Component", "Feature", "Module"),
      Seq("Product", "System", "Component")),
    ("CONNECTS_TO", Seq("Product", "Component", "System", "Software"),
      Seq("Product", "Component", "System", "Platform")),
    ("DEPENDS_ON", Seq("Product", "Component", "Feature", "Process", "Software"),
      Seq("Component", "Service", "Resource", "Infrastructure")),
    ("REPLACES", Seq("Product", "Component", "Software", "Document"),
      Seq("Product", "Component", "Software", "Document")),
    ("TROUBLESHOOTS", Seq("Document", "Procedure", "Guide"),
      Seq("Issue", "Error", "Problem", "Component")),
    ("DEFINES", Seq("Document", "Specification", "Standard"),
      Seq("Concept", "Process", "Standard", "Value", "Term")),
    ("DOCUMENTS", Seq("Document", "Guide", "Manual"),
      Seq("Product", "Process", "Feature", "System")),
    ("REFERENCES", Seq("Document", "Specification", "Report"),
      Seq("Document", "Standard", "Source", "Study")),
    ("TARGETS", Seq("Document", "Campaign", "Feature", "Product"),
      Seq("Segment", "Department", "UserType", "Market")),
    ("RESPONSIBLE_FOR", Seq("Department", "Team", "Person", "Role"),
      Seq("Product", "Process", "Component", "Customer", "Document")),
    ("SERVES", Seq("Product", "Feature", "Service", "Department"),
      Seq("Customer", "Market", "Segment", "Region")),
    ("IMPACTS", Seq("Issue", "Change", "Feature", "Decision"),
      Seq("Product", "Customer", "Process", "Component")),
    ("RELATES_TO", Seq("Any"), Seq("Any")),
    ("COMPATIBLE_WITH", Seq("Product", "Component", "Software", "Accessory"),
      Seq("Product", "Component", "Software", "Standard")))

  /** Validate + dedup relationships against the 14-type taxonomy:
    * keep rows whose rel type exists and whose endpoint types are in
    * the type's allowed lists ("Any" wildcards pass everything —
    * relationships.py:213-218 validate_entities), then
    * UNIQUE(source, target, type) keeping max confidence
    * (relationship_extractor.py:533-556).
    *
    * The taxonomy is 14 rows — broadcast; membership is an
    * array_contains on the broadcast side, so the plan is one
    * broadcast hash join + one aggregate.
    */
  def validateRelationships(rels: DataFrame, srcType: String, relType: String,
      tgtType: String, srcId: String, tgtId: String, confCol: String): DataFrame = {
    val spark = rels.sparkSession
    import spark.implicits._
    val taxonomy = relTaxonomy.toDF("_tax_rel", "_tax_srcs", "_tax_tgts")
    rels.join(broadcast(taxonomy), col(relType) === col("_tax_rel"))
      .where(
        (array_contains(col("_tax_srcs"), lit("Any")) ||
          array_contains(col("_tax_srcs"), col(srcType))) &&
        (array_contains(col("_tax_tgts"), lit("Any")) ||
          array_contains(col("_tax_tgts"), col(tgtType))))
      .groupBy(col(srcId), col(tgtId), col(relType))
      .agg(max(col(confCol)).as("confidence"))
  }

  /** Co-occurrence relationship extraction: entity pairs appearing in
    * the same document (rule-based tier of
    * relationship_extractor.py:147-218). Output one row per unordered
    * pair with co-occurrence count.
    */
  def cooccurrence(mentions: DataFrame, docCol: String, entityCol: String): DataFrame = {
    val m = mentions.select(col(docCol), col(entityCol)).distinct()
    val a = m.select(col(docCol), col(entityCol).as("entity_a"))
    val b = m.select(col(docCol), col(entityCol).as("entity_b"))
    a.join(b, Seq(docCol))
      .where(col("entity_a") < col("entity_b"))
      .groupBy(col("entity_a"), col("entity_b"))
      .agg(count(lit(1)).as("n_docs"))
  }

  /** [[cooccurrence]] with a per-document entity cap — the scale
    * guard for pathological documents: a doc mentioning d entities
    * fans out d²/2 pairs, so one 10k-entity doc emits 50M rows. Here
    * only each document's `maxPerDoc` most-mentioned entities (ties:
    * lexicographic, deterministic) pair up, bounding the per-doc
    * fan-out at maxPerDoc²/2. The window partitions by document —
    * parallelism scales with the corpus, never a global sort.
    */
  def cooccurrenceCapped(mentions: DataFrame, docCol: String,
      entityCol: String, maxPerDoc: Int): DataFrame = {
    require(maxPerDoc > 0)
    val w = Window.partitionBy(col(docCol))
      .orderBy(col("_tf").desc, col(entityCol).asc)
    val top = mentions.groupBy(col(docCol), col(entityCol))
      .agg(count(lit(1)).as("_tf"))
      .withColumn("_rn", row_number().over(w))
      .where(col("_rn") <= maxPerDoc)
      .select(col(docCol), col(entityCol))
    cooccurrence(top, docCol, entityCol)
  }

  /** n-hop neighborhood over an undirected edge list via iterated
    * equi-joins (depth <= 2 in the reference; the frontier join
    * broadcast-s when small). Returns (node, neighbor, hops) with the
    * minimum hop count per neighbor.
    */
  def nHop(edges: DataFrame, srcCol: String, dstCol: String, hops: Int): DataFrame = {
    require(hops >= 1)
    val und = edges.select(col(srcCol).as("src"), col(dstCol).as("dst"))
      .unionByName(edges.select(col(dstCol).as("src"), col(srcCol).as("dst")))
      .distinct()
    var frontier = und.withColumn("hops", lit(1))
    var acc = frontier
    for (h <- 2 to hops) {
      frontier = frontier.select(col("src"), col("dst").as("mid"))
        .join(und.select(col("src").as("mid"), col("dst")), Seq("mid"))
        .where(col("src") =!= col("dst"))
        .select(col("src"), col("dst")).distinct()
        .withColumn("hops", lit(h))
      acc = acc.unionByName(frontier)
    }
    acc.groupBy(col("src"), col("dst")).agg(min(col("hops")).as("hops"))
  }
}
