package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.operators.Entities

class EntitiesSpec extends AnyFunSuite {
  lazy val spark = TestSession.spark
  import spark.implicits._

  test("normalizeType: synonyms remap, whitelist enforced, case/punct cleaned") {
    val got = Seq("org", "Tech!", "person", "widget", "LOC")
      .toDF("t").select(Entities.normalizeType($"t")).as[String].collect()
    assert(got.toSeq === Seq(
      "ORGANIZATION", "TECHNOLOGY", "PERSON", "OTHER", "LOCATION"))
  }

  test("normalizeConfidence clamps strings, percents, out-of-range") {
    val got = Seq(("0.7"), ("85"), ("150"), ("-3"), (null: String), ("abc"))
      .toDF("c").select(Entities.normalizeConfidence($"c")).as[Double].collect()
    assert(got.toSeq === Seq(0.7, 0.85, 1.0, 0.0, 0.5, 0.5))
  }

  test("qualityFilter drops short/generic/digit mentions, keeps acronyms") {
    val df = Seq("ok", "PCB", "123", "thing", "temperature sensor", "")
      .toDF("m")
    val kept = Entities.qualityFilter(df, "m").as[String].collect()
    assert(kept.toSeq === Seq("PCB", "temperature sensor"))
  }

  test("normalizeName strips articles, punctuation, extra whitespace") {
    val got = Seq("The  NC-2056 Sensor!", "an apple", "plain")
      .toDF("n").select(Entities.normalizeName($"n")).as[String].collect()
    assert(got.toSeq === Seq("nc 2056 sensor", "apple", "plain"))
  }

  test("normalizeForMatch keeps hyphens, strips trailing articles") {
    val got = Seq("The NC-2056 Sensor!", "sensor array the", "a  b ")
      .toDF("n").select(Entities.normalizeForMatch($"n")).as[String].collect()
    assert(got.toSeq === Seq("nc-2056 sensor", "sensor array", "b"))
  }

  test("tiered sim: plural 0.98, abbreviation 0.95, variant 0.9, substring 0.85") {
    def sim(a: String, b: String): Double =
      Seq((a, b)).toDF("a", "b").select(Entities.tieredSim(
        Entities.normalizeForMatch($"a"), Entities.normalizeForMatch($"b"),
        Entities.expandAbbreviations(Entities.normalizeForMatch($"a")),
        Entities.expandAbbreviations(Entities.normalizeForMatch($"b"))))
        .as[Double].head()
    assert(sim("sensor", "sensors") === 0.98)
    assert(sim("berry", "berries") === 0.98)
    assert(sim("pressure sensor", "pressure sensors") === 0.98) // compound
    assert(sim("pcb", "printed circuit board") === 0.95)
    assert(sim("NC2056", "NC-2056") === 0.9)
    assert(sim("sensor", "sensor calibration unit x") === 0.85)
    assert(sim("sensor", "sensor") === 1.0)
    // two words differing (not plural) must NOT take the compound tier
    assert(sim("alpha sensor", "beta sensors") < 0.98)
  }

  test("fuzzyPairsTiered scores blocked pairs with the tier stack") {
    val df = Seq("pressure sensor", "pressure sensors", "pcb", "printed circuit board")
      .toDF("name")
    val got = Entities.fuzzyPairsTiered(df, "name", 0.9)
      .select($"name_a", $"name_b", $"sim").as[(String, String, Double)]
      .collect().toSeq.sortBy(_._1)
    // two-key blocking: "pcb" ("pc") also blocks on its expansion's
    // prefix ("pr"), landing in the same block as "printed circuit
    // board" — the abbreviation tier fires where name-prefix blocking
    // alone would never have generated the pair
    assert(got === Seq(
      ("pcb", "printed circuit board", 0.95),
      ("pressure sensor", "pressure sensors", 0.98)))
  }

  test("fuzzyPairsTiered pairs an abbreviation with its expansion (ipa)") {
    // entity_deduplication.py:87-109 contract: "ipa" expands to
    // "isopropyl alcohol"; the pair must be generated (blocks "ip" vs
    // "is" differ — only the expansion block key finds it) and score
    // exactly the 0.95 abbreviation tier, once (both keys dedup).
    val df = Seq("ipa", "isopropyl alcohol", "unrelated widget").toDF("name")
    val got = Entities.fuzzyPairsTiered(df, "name", 0.9)
      .select($"name_a", $"name_b", $"sim").as[(String, String, Double)]
      .collect().toSeq
    assert(got === Seq(("ipa", "isopropyl alcohol", 0.95)))
  }

  test("fuzzyPairs finds variants within a block, skips distant names") {
    val df = Seq("sensor alpha", "sensor alphax", "sensor omega", "zzz")
      .toDF("name")
    val pairs = Entities.fuzzyPairs(df, "name", 0.8)
      .select($"name_a", $"name_b").as[(String, String)].collect()
    assert(pairs.toSeq === Seq(("sensor alpha", "sensor alphax")))
  }

  test("nHop computes minimal hop counts on a path graph") {
    // a-b, b-c, c-d: from a: b@1, c@2 (d beyond 2 hops)
    val edges = Seq(("a", "b"), ("b", "c"), ("c", "d")).toDF("s", "d")
    val got = Entities.nHop(edges, "s", "d", 2)
      .where($"src" === "a")
      .select($"dst", $"hops").as[(String, Int)].collect().sortBy(_._1)
    assert(got.toSeq === Seq(("b", 1), ("c", 2)))
  }

  test("validateRelationships enforces 14-type endpoints, Any wildcard, max-conf dedup") {
    val rels = Seq(
      // valid: Component COMPONENT_OF Product — twice, max conf kept
      ("c1", "Component", "COMPONENT_OF", "p1", "Product", 0.4),
      ("c1", "Component", "COMPONENT_OF", "p1", "Product", 0.9),
      // invalid source type for COMPONENT_OF
      ("x1", "Customer", "COMPONENT_OF", "p1", "Product", 0.8),
      // invalid target type for TROUBLESHOOTS
      ("d1", "Document", "TROUBLESHOOTS", "m1", "Market", 0.8),
      // RELATES_TO accepts any endpoint types
      ("a1", "Weird", "RELATES_TO", "b1", "Weirder", 0.6),
      // unknown relationship label drops
      ("a1", "Product", "MADE_UP", "b1", "Product", 0.6))
      .toDF("src", "src_t", "rel", "tgt", "tgt_t", "conf")
    val got = Entities.validateRelationships(
      rels, "src_t", "rel", "tgt_t", "src", "tgt", "conf")
      .select($"src", $"tgt", $"rel", $"confidence")
      .as[(String, String, String, Double)].collect().sortBy(_._1)
    assert(got.toSeq === Seq(
      ("a1", "b1", "RELATES_TO", 0.6),
      ("c1", "p1", "COMPONENT_OF", 0.9)))
    assert(Entities.relTaxonomy.size === 14)
  }

  test("extractMentions emits one row per occurrence with exact offsets") {
    val df = Seq(
      (1L, "common common rareterm common Rareterm"),
      (2L, "common words only here"),
      (3L, "common common words words")).toDF("doc_id", "text")
    val got = Entities.extractMentions(df, "doc_id", "text", 1)
      .select($"doc_id", $"mention_text", $"start_offset", $"end_offset")
      .as[(Long, String, Int, Int)].collect().sortBy(r => (r._1, r._3))
    // per-occurrence: both occurrences, each with its own offsets
    // (offsets on the lowercased text; end exclusive)
    assert(got.filter(_._2 == "rareterm").toSeq === Seq(
      (1L, "rareterm", 15, 23), (1L, "rareterm", 31, 39)))
    assert(!got.exists(_._2 == "common"))
    // the occurrence count matches the inverted-index tf
    assert(got.count(r => r._1 == 1L && r._2 == "rareterm") === 2)
  }

  test("extractMentions drops null-id rows: no null-id mentions, and " +
      "df counts only real documents (the pre-r21 countDistinct law)") {
    val df = Seq(
      (Some(1L), "common rareterm common"),
      (Some(2L), "common words only here"),
      (None, "rareterm rides a ghost document"))
      .toDF("doc_id", "text")
    // maxDf 1: rareterm appears in doc 1 and the null doc; under the
    // null-id contract df("rareterm") = 1 (the null doc is invisible),
    // so the doc-1 mention survives and carries df = 1
    val got = Entities.extractMentions(df, "doc_id", "text", 1)
      .select($"doc_id", $"mention_text", $"df")
      .collect().map(r => (Option(r.get(0)), r.getString(1), r.getLong(2)))
    assert(got.forall(_._1.isDefined), "no null-id mention rows")
    val rare = got.filter(_._2 == "rareterm")
    assert(rare.map(_._1).toSeq === Seq(Some(1L)))
    assert(rare.head._3 === 1L)
  }

  test("lexical bias forces cloth/wipe terms to MATERIAL, tools resist") {
    val rows = Seq(
      ("cleaning cloth", "PRODUCT"),     // biased
      ("Microfiber Pad", "TOOL"),        // biased (case-insensitive)
      ("applicator tool pad", "TOOL"),   // counter-signal: stays
      ("pressure sensor", "COMPONENT"),  // no keyword: stays
      ("shop towel", "MATERIAL"))        // already MATERIAL: unchanged
      .toDF("name", "etype")
    val got = rows.select($"name",
        Entities.lexicalTypeBias($"name", $"etype").as("t"))
      .as[(String, String)].collect().toMap
    assert(got === Map(
      "cleaning cloth" -> "MATERIAL", "Microfiber Pad" -> "MATERIAL",
      "applicator tool pad" -> "TOOL", "pressure sensor" -> "COMPONENT",
      "shop towel" -> "MATERIAL"))
  }

  test("capped co-occurrence bounds per-doc fan-out, keeps top entities") {
    // doc 1 mentions e1 3x, e2 2x, e3 1x, e4 1x
    val mentions = (Seq.fill(3)((1L, "e1")) ++ Seq.fill(2)((1L, "e2")) ++
      Seq((1L, "e3"), (1L, "e4"), (2L, "x"), (2L, "y")))
      .toDF("doc_id", "entity")
    val capped = Entities.cooccurrenceCapped(mentions, "doc_id", "entity", 2)
      .select($"entity_a", $"entity_b").as[(String, String)].collect().toSet
    // doc 1 keeps only e1,e2 (top tf); doc 2 keeps both (under cap)
    assert(capped === Set(("e1", "e2"), ("x", "y")))
    // subset of the uncapped pairs
    val full = Entities.cooccurrence(mentions, "doc_id", "entity")
      .select($"entity_a", $"entity_b").as[(String, String)].collect().toSet
    assert(capped.subsetOf(full))
  }

  test("mergeDuplicateGroups keeps the max-confidence member, min name on ties") {
    val members = Seq(
      ("g1", "beta", 0.9), ("g1", "alpha", 0.7), ("g1", "gamma", 0.9),
      ("g2", "solo", 0.5)).toDF("comp", "node", "confidence")
    val got = Entities.mergeDuplicateGroups(members, "comp", "node", "confidence")
      .collect().map(r => (r.getString(0), r.getString(1), r.getDouble(2),
        r.getLong(3), r.getString(4))).toSet
    assert(got === Set(
      // tie at 0.9: beta < gamma lexicographically
      ("g1", "beta", 0.9, 3L, "alpha|gamma"),
      ("g2", "solo", 0.5, 1L, "")))
    // a NON-canonical member sharing the canonical's name stays an
    // alias (only one occurrence is removed)
    val dup = Seq(("g", "acme", 0.9), ("g", "acme", 0.5), ("g", "acme inc", 0.4))
      .toDF("comp", "node", "confidence")
    val row = Entities.mergeDuplicateGroups(dup, "comp", "node", "confidence")
      .collect().head
    assert(row.getString(1) === "acme" && row.getLong(3) === 3L)
    assert(row.getString(4) === "acme|acme inc")
  }

  test("mentionContext slices the ±width window around each occurrence") {
    val docs = Seq((1L, "aaa bbb rareterm ccc ddd eee")).toDF("doc_id", "text")
    val ctx = Entities.mentionContext(
      Entities.extractMentions(docs, "doc_id", "text", 1), docs,
      "doc_id", "text", width = 4)
      .select($"mention_text", $"context").as[(String, String)].collect().toMap
    // mention [9, 17): window [5, 21) of the lowercased text
    assert(ctx("rareterm") === "bbb rareterm ccc")
    // window clamps at the document edges
    val wide = Entities.mentionContext(
      Entities.extractMentions(docs, "doc_id", "text", 1), docs,
      "doc_id", "text", width = 1000)
      .select($"context").as[String].head()
    assert(wide === "aaa bbb rareterm ccc ddd eee")
  }
}
