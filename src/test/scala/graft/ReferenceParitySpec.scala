package graft

import org.apache.spark.sql.functions._
import org.json4s._
import org.json4s.jackson.JsonMethods
import org.scalatest.funsuite.AnyFunSuite

import graft.operators.{EntityCuration, EntityQuality, Metadata,
  RelationshipTypes}
import graft.sources.PathSafety

/** Parity against the reference BINARY: tools/gen_parity_fixtures.py
  * runs the pure reference Python modules over adversarial inputs and
  * records their actual outputs; this spec replays the same inputs
  * through the Scala implementations. Unlike the hand-ported twins
  * (MetadataParitySpec's PyContracts), the expected side here was
  * produced by the reference itself.
  */
class ReferenceParitySpec extends AnyFunSuite {
  lazy val spark = TestSession.spark
  import spark.implicits._

  implicit val fmts: Formats = DefaultFormats

  private def fixture(name: String): JValue =
    JsonMethods.parse(scala.io.Source.fromInputStream(
      getClass.getResourceAsStream(s"/refparity/$name"), "UTF-8").mkString)

  test("relationship types: canonicalize + label match the reference run") {
    val rows = fixture("relationship_types.json").extract[List[JObject]]
    val in = rows.map(r => (r \ "input") match {
      case JNull => null
      case JString(s) => s
      case other => other.extract[String]
    })
    val got = in.toDF("raw")
      .select(col("raw"), RelationshipTypes.canonicalize(col("raw")).as("c"))
      .select(col("c"), RelationshipTypes.formatLabel(col("c"), col("raw"))
        .as("l"))
      .as[(String, String)].collect()
    rows.zip(got).foreach { case (r, (c, l)) =>
      assert(c === (r \ "canonical").extract[String],
        s"canonical for ${r \ "input"}")
      assert(l === (r \ "label").extract[String], s"label for ${r \ "input"}")
    }
  }

  test("entity quality: validity reason and both score arms match") {
    val rows = fixture("entity_quality.json").extract[List[JObject]]
    val names = rows.map(r => (r \ "name").extract[String])
    val got = names.toDF("name")
      .select(col("name"),
        EntityQuality.isValidEntity(col("name")).as("valid"),
        coalesce(EntityQuality.invalidReason(col("name")), lit(""))
          .as("reason"),
        EntityQuality.qualityScore(col("name"),
          lit(null).cast("string"), lit(0.5), lit(0)).as("s0"),
        EntityQuality.qualityScore(col("name"), lit("component"),
          lit(0.8), lit(3)).as("s3"))
      .as[(String, Boolean, String, Double, Double)].collect()
    rows.zip(got).foreach { case (r, (n, valid, reason, s0, s3)) =>
      assert(valid === (r \ "valid").extract[Boolean], s"valid for '$n'")
      assert(reason === (r \ "reason").extract[String], s"reason for '$n'")
      assert(math.abs(s0 - (r \ "score").extract[Double]) < 1e-12,
        s"score for '$n'")
      assert(math.abs(s3 - (r \ "score_rel3").extract[Double]) < 1e-12,
        s"score_rel3 for '$n'")
    }
  }

  test("entity dedup: normalize + abbreviation expansion match") {
    val rows = fixture("entity_dedup_normalize.json").extract[List[JObject]]
    rows.foreach { r =>
      val in = (r \ "input").extract[String]
      assert(EntityCuration.normalizeName(in) ===
        (r \ "normalized").extract[String], s"normalize('$in')")
      assert(EntityCuration.expandAbbreviations(in.toLowerCase) ===
        (r \ "expanded").extract[String], s"expand('$in')")
    }
  }

  test("entity dedup: similarity and all three tier predicates match") {
    val rows = fixture("entity_dedup_similarity.json").extract[List[JObject]]
    rows.foreach { r =>
      val a = (r \ "a").extract[String]
      val b = (r \ "b").extract[String]
      val na = EntityCuration.normalizeName(a)
      val nb = EntityCuration.normalizeName(b)
      assert(math.abs(EntityCuration.calculateSimilarity(a, b) -
        (r \ "similarity").extract[Double]) < 1e-12, s"sim($a, $b)")
      assert(EntityCuration.areSingularPlural(na, nb) ===
        (r \ "singular_plural").extract[Boolean], s"plural($a, $b)")
      assert(EntityCuration.areVariants(na, nb) ===
        (r \ "variants").extract[Boolean], s"variants($a, $b)")
      assert(EntityCuration.isCompoundTerm(na, nb) ===
        (r \ "compound").extract[Boolean], s"compound($a, $b)")
    }
  }

  private val dedupEntities = Seq(
    ("e1", "Pump", "component", 0.9), ("e2", "pumps", "component", 0.7),
    ("e3", "Water Pump", "component", 0.8),
    ("e4", "water pump", "system", 0.6),
    ("e5", "Valve", "component", 0.95),
    ("e6", "valve seat", "component", 0.5),
    ("e7", "Temp Sensor", "component", 0.8),
    ("e8", "Temperature Sensor", "component", 0.85),
    ("e9", "USB", "technology", 0.9),
    ("e10", "USB cable", "component", 0.4))
    .zipWithIndex.map { case ((id, n, t, c), i) =>
      EntityCuration.CurationEntity(1L, i, id, n, t, c, null, null)
    }

  test("entity dedup: greedy grouping matches the reference at every " +
      "threshold and cross-type arm") {
    val cases = fixture("entity_dedup_groups.json").extract[List[JObject]]
    cases.foreach { c =>
      val thr = (c \ "threshold").extract[Double]
      val cross = (c \ "cross_type").extract[Boolean]
      val want = (c \ "groups").extract[List[List[String]]]
      val got = EntityCuration.findDuplicates(dedupEntities, thr, cross)
        .map(_.map(_.entity_id).toList).toList
      assert(got === want, s"groups at thr=$thr cross=$cross")
    }
  }

  test("entity dedup: merge output matches the reference run") {
    val want = fixture("entity_dedup_merge.json")
    val group = Seq(
      EntityCuration.CurationEntity(1L, 0, "e2", "pumps", "component",
        0.7, "ctx2", "c2"),
      EntityCuration.CurationEntity(1L, 1, "e1", "Pump", "component",
        0.9, "ctx1", "c1"),
      EntityCuration.CurationEntity(1L, 2, "e4", "water pump", "system",
        0.6, "", "c1"))
    val m = EntityCuration.mergeEntityData(group)
    assert(m.entity_name === (want \ "name").extract[String])
    assert(m.entity_type === (want \ "type").extract[String])
    assert(m.confidence === (want \ "confidence_score").extract[Double])
    assert(m.merge_count ===
      (want \ "metadata" \ "merge_count").extract[Int])
    assert(m.original_names.toList ===
      (want \ "metadata" \ "original_names").extract[List[String]])
    assert(m.all_contexts.toList ===
      (want \ "metadata" \ "all_contexts").extract[List[String]])
    assert(m.chunk_ids.toList ===
      (want \ "metadata" \ "chunk_ids").extract[List[String]])
    assert(m.normalized_name === (want \ "normalized_name").extract[String])
  }

  test("taxonomy: category display names and tag classes match") {
    val fx = fixture("taxonomy.json")
    val disp = (fx \ "display").extract[List[JObject]]
    val got = disp.map(d => (d \ "category").extract[String]).toDF("c")
      .select(Metadata.categoryDisplayName(col("c"))).as[String].collect()
    disp.zip(got).foreach { case (d, g) =>
      assert(g === (d \ "name").extract[String],
        s"display for ${d \ "category"}")
    }
    val tags = (fx \ "tags").extract[List[JObject]]
    val gotT = tags.map(t => (t \ "tag").extract[String]).toDF("t")
      .select(Metadata.tagClass(col("t"))).as[String].collect()
    tags.zip(gotT).foreach { case (t, g) =>
      assert(g === (t \ "class").extract[String], s"class for ${t \ "tag"}")
    }
  }

  test("filename validation: accept/reject arms match") {
    val rows = fixture("filename.json").extract[List[JObject]]
    rows.foreach { r =>
      val in = (r \ "input").extract[String]
      val ok = (r \ "ok").extract[Boolean]
      val got = scala.util.Try(PathSafety.validateFilename(in))
      assert(got.isSuccess === ok, s"ok-arm for '$in': $got")
      if (ok) assert(got.get === (r \ "value").extract[String],
        s"value for '$in'")
    }
  }

  test("processor chunker: every strategy/size/overlap case matches " +
      "the reference run on adversarial texts") {
    import graft.operators.ProcessorChunker
    val fx = fixture("processor_chunker.json")
    val texts = (fx \ "texts").extract[List[String]]
    val cases = (fx \ "cases").extract[List[JObject]]
    cases.foreach { c =>
      val text = texts((c \ "text_id").extract[Int])
      val strat = (c \ "strategy").extract[String]
      val size = (c \ "chunk_size").extract[Int]
      val ov = (c \ "chunk_overlap").extract[Int]
      val want = (c \ "chunks").extract[List[JObject]]
      val got = ProcessorChunker.chunkText(text, strat, size, ov)
      assert(got.length === want.length,
        s"count for text=${c \ "text_id"} strat=$strat size=$size ov=$ov")
      got.zip(want).foreach { case (g, w) =>
        val ctx = s"text=${c \ "text_id"} strat=$strat size=$size " +
          s"ov=$ov idx=${g.chunkIndex}"
        assert(g.text === (w \ "text").extract[String], ctx)
        assert(g.chunkIndex === (w \ "chunk_index").extract[Int], ctx)
        assert(g.chunkSize === (w \ "chunk_size").extract[Int], ctx)
        assert(g.startIndex === (w \ "start_index").extract[Int], ctx)
        assert(g.endIndex === (w \ "end_index").extract[Int], ctx)
      }
    }
  }

  test("processor chunker: matches the reference run over real corpus " +
      "documents, including through the DataFrame face") {
    import graft.operators.ProcessorChunker
    val rows = fixture("processor_chunker_corpus.json")
      .extract[List[JObject]]
    // row-function parity over all 20 documents x 3 strategies
    val texts = Tables.load(spark, "/root/testdata/sf0.001", "documents")
      .select("doc_id", "text").as[(Long, String)].collect().toMap
    rows.foreach { r =>
      val docId = (r \ "doc_id").extract[Long]
      val strat = (r \ "strategy").extract[String]
      val want = (r \ "chunks").extract[List[JObject]]
      val got = ProcessorChunker.chunkText(texts(docId), strat, 500, 50)
      assert(got.length === (r \ "n_chunks").extract[Int],
        s"doc=$docId strat=$strat")
      got.zip(want).foreach { case (g, w) =>
        assert(g.text === (w \ "text").extract[String],
          s"doc=$docId strat=$strat idx=${g.chunkIndex}")
        assert(g.startIndex === (w \ "start_index").extract[Int],
          s"doc=$docId strat=$strat idx=${g.chunkIndex}")
        assert(g.endIndex === (w \ "end_index").extract[Int],
          s"doc=$docId strat=$strat idx=${g.chunkIndex}")
      }
    }
    // the DataFrame face returns the same rows for one strategy
    val docsDf = Tables.load(spark, "/root/testdata/sf0.001", "documents")
      .where(col("doc_id") <= texts.keys.max)
      .select(col("doc_id").as("document_id"), col("text").as("content"))
    val viaDf = ProcessorChunker.chunkDocuments(docsDf, "recursive")
      .select("document_id", "chunk_index", "chunk_text", "start_index")
      .as[(Long, Int, String, Int)].collect().toSet
    val direct = texts.toSeq.flatMap { case (id, t) =>
      ProcessorChunker.chunkText(t, "recursive")
        .map(c => (id, c.chunkIndex, c.text, c.startIndex))
    }.toSet
    assert(viaDf === direct)
  }

  test("metadata tag merge + regex scans match the reference run") {
    val rows = fixture("metadata_merge.json").extract[List[JObject]]
    rows.foreach { r =>
      val tags = (r \ "llm_tags").extract[List[String]]
      val content = (r \ "content").extract[String]
      val got = Seq((tags, content)).toDF("tags", "content")
        .select(
          Metadata.mergeTags(col("tags"), col("content")).as("m"),
          Metadata.productModelTags(col("content")).as("p"),
          Metadata.componentTags(col("content")).as("c"),
          Metadata.issueTags(col("content")).as("i"))
        .as[(Seq[String], Seq[String], Seq[String], Seq[String])].head()
      val ctx = s"content='${content.take(40)}'"
      assert(got._1.toList === (r \ "merged").extract[List[String]], ctx)
      // the reference's product list is list(set(...)) — hash-order
      // noise — so the fixture records it sorted and both sides
      // compare sorted (membership is the contract, the merge re-sorts)
      assert(got._2.toList.sorted ===
        (r \ "products").extract[List[String]], ctx)
      assert(got._3.toList === (r \ "components").extract[List[String]], ctx)
      assert(got._4.toList === (r \ "issues").extract[List[String]], ctx)
    }
  }

  test("document-state transition map and per-state flags match") {
    import graft.operators.{StateCensus, StateMachine}
    val fx = fixture("document_state.json")
    val want = (fx \ "transitions").extract[Map[String, List[String]]]
    val got = StateMachine.simpleAllowed.groupBy(_._1)
      .view.mapValues(_.map(_._2).toList).toMap
    StateMachine.simpleStates.foreach { s =>
      assert(got.getOrElse(s, Nil) === want(s), s"transitions from $s")
    }
    val flags = (fx \ "flags").extract[List[JObject]]
    flags.foreach { f =>
      val s = (f \ "state").extract[String]
      // terminal == no exits in the verbatim map
      assert(got.getOrElse(s, Nil).isEmpty ===
        (f \ "terminal").extract[Boolean], s"terminal for $s")
      assert(StateCensus.ActionStates.contains(s) ===
        (f \ "requires_action").extract[Boolean], s"requires_action for $s")
    }
  }

  test("DocumentProcessor chunker family matches the reference run, " +
      "including the sentence arm's live TypeError") {
    import graft.operators.DocProcessorChunker
    val fx = fixture("doc_processor_chunks.json")
    val texts = (fx \ "texts").extract[List[String]]
    val cases = (fx \ "cases").extract[List[JObject]]
    cases.foreach { c =>
      val text = texts((c \ "text_id").extract[Int])
      val method = (c \ "method").extract[String]
      val size = (c \ "chunk_size").extract[Int]
      val ov = (c \ "chunk_overlap").extract[Int]
      val mn = (c \ "min_chunk_size").extract[Int]
      val ctx = s"text=${c \ "text_id"} method=$method size=$size ov=$ov"
      val refError = (c \ "error") match {
        case JString(e) => Some(e); case _ => None
      }
      val got: Option[Seq[DocProcessorChunker.RawChunk]] = method match {
        case "recursive" =>
          Some(DocProcessorChunker.recursiveChunks(text, size, ov, mn))
        case "sentence" =>
          DocProcessorChunker.sentenceChunks(text, size, ov)
        case _ => Some(DocProcessorChunker.fixedChunks(text, size, ov))
      }
      refError match {
        case Some(_) => assert(got.isEmpty, s"$ctx: expected the " +
          "TypeError arm (None), got ${got.map(_.length)} chunks")
        case None =>
          val want = (c \ "chunks").extract[List[JObject]]
          assert(got.isDefined, ctx)
          assert(got.get.length === want.length, ctx)
          got.get.zip(want).foreach { case (g, w) =>
            assert(g.text === (w \ "text").extract[String], ctx)
            assert(g.start === (w \ "start").extract[Long], ctx)
            assert(g.end === (w \ "end").extract[Long], ctx)
            assert(g.chunkId === (w \ "chunk_id").extract[String], ctx)
          }
      }
    }
  }

  test("identifier validation: per-kind accept/reject arms match") {
    val rows = fixture("naming.json").extract[List[JObject]]
    val fns = Map[String, String => String](
      "field" -> graft.dataflow.Naming.validateFieldName,
      "flow" -> graft.dataflow.Naming.validateFlowName,
      "full_flow" -> graft.dataflow.Naming.validateFullFlowName)
    rows.foreach { r =>
      val in = (r \ "input").extract[String]
      fns.foreach { case (kind, fn) =>
        val refErr = (r \ kind) match {
          case JNull => None
          case JString(s) => Some(s)
          case _ => None
        }
        val got = scala.util.Try(fn(in))
        assert(got.isSuccess === refErr.isEmpty,
          s"$kind('$in'): got=$got ref=$refErr")
      }
    }
  }
}
