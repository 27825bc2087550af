package graft

import org.json4s._
import org.json4s.jackson.JsonMethods
import org.scalatest.funsuite.AnyFunSuite

import graft.dataflow.ConfigValidation
import graft.operators.Throttle

/** Wave-2 parity against the reference BINARY (see
  * ReferenceParitySpec): tools/gen_parity_fixtures2.py runs reference
  * modules that need import-time stand-ins (tenacity, service
  * clients) and records their actual outputs; this spec replays the
  * same inputs through the Scala implementations.
  */
class ReferenceParity2Spec extends AnyFunSuite {

  implicit val fmts: Formats = DefaultFormats

  private def fixture(name: String): JValue =
    JsonMethods.parse(scala.io.Source.fromInputStream(
      getClass.getResourceAsStream(s"/refparity/$name"), "UTF-8").mkString)

  test("retry backoff: sleep schedule, call count and outcome match " +
      "the reference run (sync and async bodies agree)") {
    val fx = fixture("retry.json")
    val sync = (fx \ "sync").extract[List[JObject]]
    // retry_async is the same schedule: the generator asserts it by
    // recording both; replay once against the recorded sync rows
    assert((fx \ "async") === (fx \ "sync"))
    sync.foreach { r =>
      val fails = (r \ "fails").extract[Int]
      val ma = (r \ "max_attempts").extract[Int]
      val bf = (r \ "backoff_factor").extract[Double]
      val iwMs = ((r \ "initial_wait").extract[Double] * 1000).toLong
      val mwMs = ((r \ "max_wait").extract[Double] * 1000).toLong
      val wantSleeps = (r \ "sleeps").extract[List[Double]]
        .map(s => (s * 1000).toLong)
      val ctx = s"fails=$fails ma=$ma bf=$bf"

      val sleeps = scala.collection.mutable.ArrayBuffer.empty[Long]
      var calls = 0
      val got = scala.util.Try(Throttle.withRetry[String](
          maxAttempts = ma, initialWaitMillis = iwMs,
          backoffFactor = bf, maxWaitMillis = mwMs,
          sleep = sleeps += _) {
        calls += 1
        if (calls <= fails) throw new RuntimeException(s"boom$calls")
        "ok"
      })
      assert(calls === (r \ "calls").extract[Int], ctx)
      assert(sleeps.toList === wantSleeps, ctx)
      (r \ "outcome").extract[String] match {
        case "ok" => assert(got === scala.util.Success("ok"), ctx)
        case err =>
          assert(got.isFailure && s"error:${got.failed.get.getMessage}"
            === err, ctx)
      }
    }
  }

  private def settingsOf(j: JValue): ConfigValidation.Settings = {
    def opt(k: String): Option[String] = (j \ k) match {
      case JString(s) => Some(s)
      case _ => None
    }
    ConfigValidation.Settings(
      environment = (j \ "environment").extract[String],
      databaseUrl = opt("database_url"), redisUrl = opt("redis_url"),
      supabaseUrl = opt("supabase_url"), supabaseKey = opt("supabase_key"),
      qdrantUrl = opt("qdrant_url"), neo4jUri = opt("neo4j_uri"),
      neo4jUser = opt("neo4j_user"), neo4jPassword = opt("neo4j_password"),
      llamaparseApiKey = opt("llamaparse_api_key"),
      openaiApiKey = opt("openai_api_key"),
      googleAiApiKey = opt("google_ai_api_key"))
  }

  import graft.operators.SemanticChunkerRow

  private def chunkMatches(got: SemanticChunkerRow.SemChunk, w: JObject,
      ctx: String, full: Boolean): Unit = {
    assert(got.text === (w \ "text").extract[String], ctx)
    assert(got.sentenceCount === (w \ "sentence_count").extract[Int], ctx)
    assert(got.tokenCount === (w \ "token_count").extract[Int], ctx)
    assert(got.semanticFocus === (w \ "semantic_focus").extract[String],
      ctx)
    if (full) {
      assert(got.chunkIndex === (w \ "chunk_index").extract[Int], ctx)
      assert(got.totalChunks === (w \ "total_chunks").extract[Int], ctx)
      def opt(j: JValue): Option[String] = j match {
        case JString(s) => Some(s); case _ => None
      }
      assert(got.previousContext === opt(w \ "previous_context"), ctx)
      assert(got.nextContext === opt(w \ "next_context"), ctx)
    }
  }

  test("semantic chunker: sentence split matches the reference run") {
    val fx = fixture("semantic_chunker.json")
    val texts = (fx \ "texts").extract[List[String]]
    (fx \ "sentences").extract[List[JObject]].foreach { r =>
      val ti = (r \ "text_id").extract[Int]
      assert(SemanticChunkerRow.splitIntoSentences(texts(ti)).toList ===
        (r \ "sentences").extract[List[String]], s"text=$ti")
    }
  }

  test("semantic chunker: create_semantic_chunks matches the reference " +
      "run across every threshold/min/max/context config") {
    val fx = fixture("semantic_chunker.json")
    val texts = (fx \ "texts").extract[List[String]]
    (fx \ "cases").extract[List[JObject]].foreach { c =>
      val ti = (c \ "text_id").extract[Int]
      val thr = (c \ "threshold").extract[Double]
      val mn = (c \ "min_chunk").extract[Int]
      val mx = (c \ "max_chunk").extract[Int]
      val mc = (c \ "maintain_context").extract[Boolean]
      val want = (c \ "chunks").extract[List[JObject]]
      val got = SemanticChunkerRow.createSemanticChunks(
        texts(ti), SemanticChunkerRow.stubEncode, thr, mn, mx, mc)
      val ctx = s"text=$ti thr=$thr mn=$mn mx=$mx ctx=$mc"
      assert(got.length === want.length, ctx)
      got.zip(want).foreach { case (g, w) =>
        chunkMatches(g, w, s"$ctx idx=${g.chunkIndex}", full = true)
      }
    }
  }

  test("semantic chunker: identify_key_concepts matches") {
    val fx = fixture("semantic_chunker.json")
    val texts = (fx \ "texts").extract[List[String]]
    (fx \ "concepts").extract[List[JObject]].foreach { r =>
      val ti = (r \ "text_id").extract[Int]
      val k = (r \ "top_k").extract[Int]
      assert(SemanticChunkerRow.identifyKeyConcepts(
          texts(ti), SemanticChunkerRow.stubEncode, k).toList ===
        (r \ "concepts").extract[List[String]], s"text=$ti k=$k")
    }
  }

  test("semantic chunker: matches the reference run over real corpus " +
      "documents, including through the DataFrame face") {
    val spark = TestSession.spark
    import spark.implicits._
    import org.apache.spark.sql.functions.col
    val rows = fixture("semantic_chunker.json")
      .extract[JObject].obj.toMap.apply("corpus").extract[List[JObject]]
    val texts = Tables.load(spark, "/root/testdata/sf0.001", "documents")
      .select("doc_id", "text").as[(Long, String)].collect().toMap
    rows.foreach { r =>
      val docId = (r \ "doc_id").extract[Long]
      val want = (r \ "chunks").extract[List[JObject]]
      val got = SemanticChunkerRow.createSemanticChunks(
        texts(docId), SemanticChunkerRow.stubEncode, 0.5, 20, 80, true)
      assert(got.length === (r \ "n_chunks").extract[Int], s"doc=$docId")
      got.zip(want).foreach { case (g, w) =>
        chunkMatches(g, w, s"doc=$docId idx=${g.chunkIndex}", full = false)
      }
    }
    // the distributed face returns the same rows
    val docsDf = Tables.load(spark, "/root/testdata/sf0.001", "documents")
      .where(col("doc_id") <= rows.map(r => (r \ "doc_id").extract[Long]).max)
      .select(col("doc_id"), col("text"))
    val viaDf = SemanticChunkerRow.chunkDocuments(
        docsDf, "doc_id", "text", () => SemanticChunkerRow.stubEncode,
        0.5, 20, 80, true)
      .select("doc_id", "chunk_index", "chunk_text", "semantic_focus")
      .as[(Long, Int, String, String)].collect().toSet
    val direct = rows.flatMap { r =>
      val docId = (r \ "doc_id").extract[Long]
      (r \ "chunks").extract[List[JObject]].zipWithIndex.map {
        case (w, i) => (docId, i, (w \ "text").extract[String],
          (w \ "semantic_focus").extract[String])
      }
    }.toSet
    assert(viaDf === direct)
  }

  import graft.operators.TwoTierRow

  test("two-tier: bm25 tokens, sentence split and heading blocks " +
      "match the reference run (incl. the DataFrame expression)") {
    val spark = TestSession.spark
    import spark.implicits._
    import org.apache.spark.sql.functions.col
    val fx = fixture("two_tier.json")
    val texts = (fx \ "texts").extract[List[String]]
    (fx \ "tokens").extract[List[JObject]].foreach { r =>
      val ti = (r \ "text_id").extract[Int]
      assert(TwoTierRow.tokenizeForBm25(texts(ti)).toList ===
        (r \ "tokens").extract[List[String]], s"tokens text=$ti")
    }
    (fx \ "sentences").extract[List[JObject]].foreach { r =>
      val ti = (r \ "text_id").extract[Int]
      assert(TwoTierRow.splitIntoSentences(texts(ti)).toList ===
        (r \ "sentences").extract[List[String]], s"sentences text=$ti")
    }
    val blockRows = (fx \ "blocks").extract[List[JObject]]
    blockRows.foreach { r =>
      val ti = (r \ "text_id").extract[Int]
      val want = (r \ "blocks").extract[List[JObject]].map { b =>
        ((b \ "heading") match {
          case JString(s) => s; case _ => null
        }, (b \ "body").extract[String])
      }
      assert(graft.functions.HeadingBlocks.split(texts(ti)).toList ===
        want, s"blocks text=$ti")
    }
    // the Catalyst expression face returns the same blocks
    val viaExpr = texts.zipWithIndex.map(_.swap).toDF("text_id", "text")
      .select(col("text_id"),
        graft.functions.HeadingBlocks.headingBlocksOf(col("text"))
          .as("blocks"))
      .as[(Int, Seq[(String, String)])].collect().toMap
    blockRows.foreach { r =>
      val ti = (r \ "text_id").extract[Int]
      val want = (r \ "blocks").extract[List[JObject]].map { b =>
        ((b \ "heading") match {
          case JString(s) => s; case _ => null
        }, (b \ "body").extract[String])
      }
      assert(viaExpr(ti).toList === want, s"expr blocks text=$ti")
    }
  }

  test("two-tier: page chunks match at every token budget; section " +
      "chunks reproduce the live AttributeError arm") {
    val fx = fixture("two_tier.json")
    val texts = (fx \ "texts").extract[List[String]]
    (fx \ "pages").extract[List[JObject]].foreach { r =>
      val ti = (r \ "text_id").extract[Int]
      val size = (r \ "page_token_size").extract[Int]
      assert(TwoTierRow.createPageChunks(texts(ti), size).toList ===
        (r \ "chunks").extract[List[String]], s"pages text=$ti size=$size")
    }
    (fx \ "sections").extract[List[JObject]].foreach { r =>
      val ti = (r \ "text_id").extract[Int]
      val got = TwoTierRow.createSectionChunks(texts(ti))
      (r \ "error") match {
        case JString(_) => assert(got.isEmpty, s"sections text=$ti " +
          "expected the AttributeError arm")
        case _ => assert(got === Some((r \ "chunks")
          .extract[List[String]].toVector), s"sections text=$ti")
      }
    }
  }

  test("two-tier: semantic chunks match on both arms (SemanticChunker " +
      "and the ImportError sentence fallback)") {
    val fx = fixture("two_tier.json")
    val texts = (fx \ "texts").extract[List[String]]
    (fx \ "semantic").extract[List[JObject]].foreach { r =>
      val ti = (r \ "text_id").extract[Int]
      val arm = (r \ "arm").extract[String]
      val enc =
        if (arm == "semantic")
          Some(SemanticChunkerRow.stubEncode: SemanticChunkerRow.Encoder)
        else None
      val want = (r \ "chunks").extract[List[JObject]].map(c =>
        ((c \ "text").extract[String],
          (c \ "sentence_count").extract[Int]))
      assert(TwoTierRow.createSemanticChunks(texts(ti), enc).toList ===
        want, s"semantic text=$ti arm=$arm")
    }
  }

  test("two-tier: md5-UUID chunk ids match") {
    val fx = fixture("two_tier.json")
    (fx \ "chunk_ids").extract[List[JObject]].foreach { r =>
      val parent = (r \ "parent_id") match {
        case JString(s) => Some(s); case _ => None
      }
      assert(TwoTierRow.generateChunkId(
          (r \ "document_id").extract[String],
          (r \ "level").extract[String],
          (r \ "index").extract[Int], parent) ===
        (r \ "chunk_id").extract[String], s"id for ${r \ "document_id"}")
    }
  }

  test("two-tier: process_document matches the reference run end to " +
      "end, including through the DataFrame face") {
    import graft.operators.StubLlm
    val fx = fixture("two_tier.json")
    val texts = (fx \ "texts").extract[List[String]]
    val docs = (fx \ "process_document").extract[List[JObject]]
    def checkChunk(g: TwoTierRow.ChunkRow, w: JObject, ctx: String): Unit = {
      assert(g.id === (w \ "id").extract[String], ctx)
      assert(g.chunkLevel === (w \ "chunk_level").extract[String], ctx)
      assert(g.chunkIndex === (w \ "chunk_index").extract[Int], ctx)
      assert(g.chunkText === (w \ "chunk_text").extract[String], ctx)
      assert(g.chunkSize === (w \ "chunk_size").extract[Int], ctx)
      assert(g.contextualSummary ===
        (w \ "contextual_summary").extract[String], ctx)
      assert(g.contextualizedText ===
        (w \ "contextualized_text").extract[String], ctx)
      assert(g.parentChunkId === ((w \ "parent_chunk_id") match {
        case JString(s) => Some(s); case _ => None
      }), ctx)
      assert(g.bm25Tokens.toList ===
        (w \ "bm25_tokens").extract[List[String]], ctx)
      assert(g.sentenceCount === ((w \ "sentence_count") match {
        case JInt(n) => Some(n.toInt); case _ => None
      }), ctx)
      assert(g.semanticFocus === ((w \ "semantic_focus") match {
        case JString(s) => Some(s); case _ => None
      }), ctx)
      assert(g.tier === (w \ "tier").extract[String], ctx)
    }
    docs.foreach { d =>
      val ti = (d \ "text_id").extract[Int]
      val got = TwoTierRow.processDocument(
        (d \ "document_id").extract[String], texts(ti),
        (d \ "title").extract[String], StubLlm(),
        Some(SemanticChunkerRow.stubEncode),
        pageTokenSize = (d \ "page_token_size").extract[Int])
      val want = (d \ "chunks").extract[List[JObject]]
      assert(got.length === want.length, s"doc text=$ti")
      got.zip(want).foreach { case (g, w) =>
        checkChunk(g, w, s"text=$ti id=${g.id}")
      }
    }
    // distributed face agrees on (id, level, text) rows
    val spark = TestSession.spark
    import spark.implicits._
    val in = docs.map { d =>
      ((d \ "document_id").extract[String],
        texts((d \ "text_id").extract[Int]),
        (d \ "title").extract[String])
    }.toDF("document_id", "text", "title")
    val viaDf = TwoTierRow.processDocuments(in, "document_id", "text",
        "title", pageTokenSize = 40)
      .select("documentId", "id", "chunkLevel", "chunkText")
      .as[(String, String, String, String)].collect().toSet
    val direct = docs.flatMap { d =>
      val docId = (d \ "document_id").extract[String]
      (d \ "chunks").extract[List[JObject]].map(w => (docId,
        (w \ "id").extract[String], (w \ "chunk_level").extract[String],
        (w \ "chunk_text").extract[String]))
    }.toSet
    assert(viaDf === direct)
  }

  import graft.operators.SearchServiceRow
  import graft.operators.SearchServiceRow.{Candidate, Result}

  test("search service: tokenizer matches the reference run") {
    (fixture("search_service.json") \ "tokenize")
      .extract[List[JObject]].foreach { r =>
        val t = (r \ "text").extract[String]
        assert(SearchServiceRow.tokenize(t).toList ===
          (r \ "tokens").extract[List[String]], s"tokenize('$t')")
      }
  }

  private def jStrOpt(j: JValue): Option[String] = j match {
    case JString(s) => Some(s); case _ => None
  }

  test("search service: candidate-set BM25 matches the reference run, " +
      "including the duplicate-token double-score quirk") {
    val fx = fixture("search_service.json")
    val corpus = (fx \ "bm25_corpus").extract[Map[String, List[JObject]]]
      .map { case (tok, rows) =>
        tok -> rows.map { r =>
          Candidate(
            (r \ "id") match {
              case JInt(n) => n.toString
              case JString(s) => s
              case other => other.extract[String]
            },
            jStrOpt(r \ "document_id"), jStrOpt(r \ "chunk_text"),
            jStrOpt(r \ "contextualized_text"),
            (r \ "bm25_tokens") match {
              case JArray(xs) =>
                Some(xs.map(_.extract[String]).toVector)
              case _ => None
            })
        }
      }
    val fetch: (String, Int) => Seq[Candidate] =
      (tok, lim) => corpus.getOrElse(tok, Nil).take(lim)
    (fx \ "bm25").extract[List[JObject]].foreach { c =>
      val q = (c \ "query").extract[String]
      val lim = (c \ "limit").extract[Int]
      val got = SearchServiceRow.bm25CandidateSearch(q, fetch, lim)
      val want = (c \ "results").extract[List[JObject]]
      assert(got.length === want.length, s"bm25 '$q'")
      got.zip(want).foreach { case (g, w) =>
        val ctx = s"bm25 '$q' id=${g.id}"
        assert(g.id === (w \ "id").extract[String], ctx)
        assert(math.abs(g.score - (w \ "score").extract[Double]) < 1e-12,
          ctx)
        assert(g.source === (w \ "source").extract[String], ctx)
        assert(g.title === (w \ "title").extract[String], ctx)
        assert(g.content === (w \ "content").extract[String], ctx)
      }
    }
  }

  private def resultOf(j: JObject): Result =
    Result((j \ "id").extract[String], (j \ "score").extract[Double],
      (j \ "source").extract[String],
      (j \ "title").extractOrElse[String](""),
      (j \ "content").extractOrElse[String](""))

  test("search service: RRF fusion matches the reference run " +
      "(pooled vector group, graph append, non-source drop)") {
    val fx = fixture("search_service.json") \ "fuse"
    val in = (fx \ "input").extract[List[JObject]].map(resultOf)
    val got = SearchServiceRow.fuseResults(in,
      Set("vector_chunk", "vector_table", "vector_image", "vector"),
      Set("bm25"), (fx \ "limit").extract[Int])
    val want = (fx \ "output").extract[List[JObject]]
    assert(got.length === want.length)
    got.zip(want).foreach { case (g, w) =>
      val ctx = s"fuse id=${g.id}"
      assert(g.id === (w \ "id").extract[String], ctx)
      assert(math.abs(g.score - (w \ "score").extract[Double]) < 1e-12, ctx)
      assert(g.source === (w \ "source").extract[String], ctx)
      assert(g.title === (w \ "title").extract[String], ctx)
      assert(g.content === (w \ "content").extract[String], ctx)
    }
  }

  test("search service: legacy weighted merge matches on every arm " +
      "(vector+graph blends, same-source max, relationship merge " +
      "truthiness)") {
    val fx = fixture("search_service.json")
    (fx \ "merge_and_rank").extract[List[JObject]].foreach { c =>
      val w = (c \ "vector_weight").extract[Double]
      // rebuild the reference's input list (it's fixed in the
      // generator; mirrored here to keep the fixture self-contained)
      def rel(xs: (String, Int)*): Option[Vector[String]] =
        Some(xs.toVector.map { case (k, v) => s"$k=$v" })
      val in = Seq(
        Result("m1", 0.9, "vector", "t1", "c1"),
        Result("m1", 0.4, "graph", "t1g", "c1g", rel("r" -> 1)),
        Result("m2", 0.2, "graph", "t2", "c2", rel("r" -> 2)),
        Result("m2", 0.6, "vector", "t2v", "c2v"),
        Result("m3", 0.5, "vector", "t3", "c3"),
        Result("m3", 0.7, "vector", "t3b", "c3b"),
        Result("m4", 0.1, "bm25", "t4", "c4", Some(Vector.empty)),
        Result("m4", 0.3, "bm25", "t4b", "c4b", rel("r" -> 4)),
        Result("m5", 0.05, "graph", "t5", "c5", rel("r" -> 5)),
        Result("m5", 0.04, "graph", "t5b", "c5b", rel("r" -> 6)))
      val got = SearchServiceRow.mergeAndRank(in, w)
      val want = (c \ "output").extract[List[JObject]]
      assert(got.length === want.length, s"merge w=$w")
      got.zip(want).foreach { case (g, ww) =>
        val ctx = s"merge w=$w id=${g.id}"
        assert(g.id === (ww \ "id").extract[String], ctx)
        assert(math.abs(g.score - (ww \ "score").extract[Double]) < 1e-12,
          ctx)
        assert(g.source === (ww \ "source").extract[String], ctx)
        assert(g.title === (ww \ "title").extract[String], ctx)
        val wantRels = (ww \ "relationships") match {
          case JArray(xs) => Some(xs.map { x =>
            x.extract[Map[String, Int]].map { case (k, v) => s"$k=$v" }
              .mkString
          }.toVector)
          case _ => None
        }
        assert(g.relationships === wantRels, ctx)
      }
    }
  }

  test("search service: Cypher builder matches the reference text " +
      "exactly") {
    (fixture("search_service.json") \ "graph_query")
      .extract[List[JObject]].foreach { c =>
        assert(SearchServiceRow.buildGraphQuery(
            jStrOpt(c \ "entity_name"), jStrOpt(c \ "entity_type"),
            jStrOpt(c \ "relationship_type"),
            (c \ "limit").extract[Int], (c \ "depth").extract[Int]) ===
          (c \ "query").extract[String],
          s"cypher for ${c \ "entity_name"}")
      }
  }

  test("search service: performance-stats frame matches (numpy-linear " +
      "percentiles, meeting-target census)") {
    (fixture("search_service.json") \ "perf")
      .extract[List[JObject]].foreach { c =>
        def metrics(k: String): Seq[Double] =
          (c \ "metrics" \ k).extract[List[Double]]
        val got = SearchServiceRow.performanceStats(
          metrics("vector_searches"), metrics("graph_searches"),
          metrics("hybrid_searches"))
        val want = (c \ "stats").extract[JObject]
        assert(got("target_latency_ms") === 200)
        assert(got("meeting_target") ===
          (want \ "meeting_target").extract[Boolean])
        Seq("vector", "graph", "hybrid").foreach { k =>
          val gm = got(k).asInstanceOf[Map[String, Any]]
          val wm = (want \ k).extract[JObject]
          assert(gm.keySet === wm.obj.map(_._1).toSet, s"keys $k")
          wm.obj.foreach { case (kk, v) =>
            val gv = gm(kk) match {
              case i: Int => i.toDouble
              case d: Double => d
            }
            assert(math.abs(gv - v.extract[Double]) < 1e-9,
              s"perf $k.$kk")
          }
        }
      }
  }

  test("reranker fallback: substring-overlap boost matches the " +
      "reference run") {
    (fixture("search_service.json") \ "rerank")
      .extract[List[JObject]].foreach { c =>
        val q = (c \ "query").extract[String]
        val cands = (c \ "candidates").extract[List[JObject]].map { x =>
          Result((x \ "id").extract[String],
            (x \ "score").extract[Double], "hybrid", "",
            (x \ "content").extract[String])
        }
        val got = SearchServiceRow.rerankFallback(q, cands,
          (c \ "top_k").extract[Int])
        val want = (c \ "output").extract[List[JObject]]
        assert(got.length === want.length, s"rerank '$q'")
        got.zip(want).foreach { case (g, w) =>
          assert(g.id === (w \ "id").extract[String], s"rerank '$q'")
          assert(math.abs(g.score - (w \ "score").extract[Double]) <
            1e-12, s"rerank '$q' id=${g.id}")
        }
      }
  }

  import graft.operators.RelationshipRulesRow

  test("relationship rules: entity-type heuristic and lookup variants " +
      "match the reference run") {
    val fx = fixture("relationship_rules.json")
    (fx \ "entity_types").extract[List[JObject]].foreach { r =>
      val n = (r \ "name").extract[String]
      val meta = (r \ "metadata" \ "type") match {
        case JString(s) => Some(s); case _ => None
      }
      assert(RelationshipRulesRow.entityTypeOf(n, meta) ===
        (r \ "type").extract[String], s"type of '$n'")
    }
    (fx \ "lookups").extract[List[JObject]].foreach { r =>
      val names = (r \ "names").extract[List[String]]
      val got = RelationshipRulesRow.createEntityLookup(names)
        .toList.map { case (k, v) => List(k, v) }
      assert(got === (r \ "lookup").extract[List[List[String]]],
        s"lookup for $names")
    }
  }

  test("relationship rules: the shipped extractor is the live " +
      "KeyError('CAUSES') arm; the matcher itself matches under the " +
      "enum-valid patterns config") {
    val fx = fixture("relationship_rules.json")
    assert((fx \ "rules_default" \ "error").extract[String] ===
      "KeyError:CAUSES")
    assert(RelationshipRulesRow.extractWithRules("any",
      RelationshipRulesRow.createEntityLookup(Seq("pump"))).isEmpty)
    (fx \ "rules_valid").extract[List[JObject]].foreach { c =>
      val text = (c \ "text").extract[String]
      val lookup = RelationshipRulesRow.createEntityLookup(
        (c \ "entities").extract[List[String]])
      val got = RelationshipRulesRow.extractWithRulesValid(text, lookup)
      val want = (c \ "relationships").extract[List[JObject]]
      assert(got.length === want.length, s"rules '${text.take(30)}'")
      got.zip(want).foreach { case (g, w) =>
        val ctx = s"rules '${text.take(30)}' ${g.relType}"
        assert(g.sourceEntity === (w \ "source").extract[String], ctx)
        assert(g.sourceType === (w \ "source_type").extract[String], ctx)
        assert(g.relType === (w \ "type").extract[String], ctx)
        assert(g.targetEntity === (w \ "target").extract[String], ctx)
        assert(g.targetType === (w \ "target_type").extract[String], ctx)
        assert(g.confidence === (w \ "confidence").extract[Double], ctx)
        assert(g.sourceText === (w \ "source_text").extract[String], ctx)
        assert(g.method === (w \ "method").extract[String], ctx)
      }
    }
  }

  test("relationship rules: document relationships and dedup match " +
      "end to end") {
    val fx = fixture("relationship_rules.json")
    (fx \ "doc_relationships").extract[List[JObject]].foreach { c =>
      val ents = (c \ "entities").extract[List[JObject]].map { e =>
        ((e \ "name").extract[String],
          (e \ "count").extractOrElse[Int](1),
          (e \ "first_position").extractOrElse[Int](0))
      }
      val meta = (c \ "metadata") match {
        case o: JObject => Some((
          (o \ "id") match {
            case JString(s) => Some(s)
            case JInt(n) => Some(n.toString)
            case _ => None
          },
          jStrOpt(o \ "title")))
        case _ => None
      }
      val docRels = RelationshipRulesRow
        .createDocumentRelationships(ents, meta)
      val got = RelationshipRulesRow.dedupRelationships(docRels)(
        r => (r.sourceEntity, r.relType, r.targetEntity),
        _.confidence)
      val want = (c \ "relationships").extract[List[JObject]]
      assert(got.length === want.length, s"docrels ${c \ "metadata"}")
      got.zip(want).foreach { case (g, w) =>
        val ctx = s"docrel ${g.targetEntity}"
        assert(g.sourceEntity === (w \ "source").extract[String], ctx)
        assert(g.sourceType === (w \ "source_type").extract[String], ctx)
        assert(g.relType === (w \ "type").extract[String], ctx)
        assert(g.targetEntity === (w \ "target").extract[String], ctx)
        assert(g.targetType === (w \ "target_type").extract[String], ctx)
        assert(g.confidence === (w \ "confidence").extract[Double], ctx)
        assert(g.sourceText === (w \ "source_text").extract[String], ctx)
        assert(g.method === (w \ "method").extract[String], ctx)
        assert(g.mentionCount ===
          (w \ "additional" \ "mention_count").extract[Int], ctx)
        assert(g.firstMention ===
          (w \ "additional" \ "first_mention").extract[Int], ctx)
        assert(g.sourceId ===
          (w \ "additional" \ "source_id").extract[String], ctx)
        assert(g.sourceName ===
          (w \ "additional" \ "source_name").extract[String], ctx)
        assert(g.targetName ===
          (w \ "additional" \ "target_name").extract[String], ctx)
      }
    }
    val dd = fx \ "dedup"
    case class SimpleRel(s: String, t: String, ty: String, c: Double)
    val in = (dd \ "input").extract[List[JObject]].map(j => SimpleRel(
      (j \ "source").extract[String], (j \ "target").extract[String],
      (j \ "type").extract[String], (j \ "confidence").extract[Double]))
    val got = RelationshipRulesRow.dedupRelationships(in)(
      r => (r.s, r.ty, r.t), _.c)
    val want = (dd \ "output").extract[List[JObject]].map(j => SimpleRel(
      (j \ "source").extract[String], (j \ "target").extract[String],
      (j \ "type").extract[String], (j \ "confidence").extract[Double]))
    assert(got.toList === want)
  }

  import graft.functions.LlmResponse

  test("llm response: the extract_entities filter pipeline matches " +
      "the reference run on every arm") {
    (fixture("llm_service.json") \ "entities")
      .extract[List[JObject]].foreach { c =>
        val content = (c \ "content").extract[String]
        val got = LlmResponse.parseEntitiesRow(content)
        val want = (c \ "entities").extract[List[JObject]]
        val ctx = s"entities '${content.take(40)}'"
        assert(got.length === want.length, ctx)
        got.zip(want).foreach { case (g, w) =>
          assert(g.name === (w \ "name").extract[String], ctx)
          assert(g.entityType === (w \ "type").extract[String], ctx)
          assert(g.confidence === (w \ "confidence").extract[Double], ctx)
          assert(g.context === jStrOpt(w \ "context"), ctx)
        }
      }
  }

  test("llm response: the extract_metadata parse matches the reference " +
      "run exactly (row face) and modulo the null-list coalesce " +
      "(Column face)") {
    val spark = TestSession.spark
    import spark.implicits._
    import org.apache.spark.sql.functions.col
    val rows = (fixture("llm_service.json") \ "metadata")
      .extract[List[JObject]]
    rows.foreach { c =>
      val content = (c \ "content").extract[String]
      val got = LlmResponse.parseMetadataRow(content)
      val w = c \ "metadata"
      val ctx = s"metadata '${content.take(40)}'"
      assert(got.title === jStrOpt(w \ "title"), ctx)
      assert(got.author === jStrOpt(w \ "author"), ctx)
      assert(got.department === jStrOpt(w \ "department"), ctx)
      assert(got.category === jStrOpt(w \ "category"), ctx)
      def listOf(j: JValue): Option[Vector[String]] = j match {
        case JArray(xs) => Some(xs.map(_.extract[String]).toVector)
        case _ => None
      }
      assert(got.tags === listOf(w \ "tags"), ctx)
      assert(got.summary === jStrOpt(w \ "summary"), ctx)
      assert(got.keyTopics === listOf(w \ "key_topics"), ctx)
      assert(got.sentiment === jStrOpt(w \ "sentiment"), ctx)
      assert(got.confidence === ((w \ "confidence") match {
        case JDouble(d) => Some(d)
        case JInt(n) => Some(n.toDouble)
        case _ => None
      }), ctx)
    }
    // the Column face agrees after the documented null-list coalesce
    val viaCol = rows.map(c => (c \ "content").extract[String])
      .toDF("raw")
      .select(LlmResponse.parseMetadata(col("raw")).as("m"))
      .select("m.title", "m.tags", "m.summary", "m.confidence")
      .as[(Option[String], Seq[String], Option[String], Double)]
      .collect()
    rows.zip(viaCol).foreach { case (c, (title, tags, summary, conf)) =>
      val w = c \ "metadata"
      val ctx = s"column face '${(c \ "content").extract[String].take(30)}'"
      assert(title === jStrOpt(w \ "title"), ctx)
      val wantTags = (w \ "tags") match {
        case JArray(xs) => xs.map(_.extract[String])
        case _ => Nil // null-list coalesce deviation
      }
      assert(tags.toList === wantTags, ctx)
      assert(summary === jStrOpt(w \ "summary"), ctx)
      val wantConf = (w \ "confidence") match {
        case JDouble(d) => d
        case JInt(n) => n.toDouble
        case _ => 0.5 // null confidence coalesces to the missing default
      }
      assert(conf === wantConf, ctx)
    }
  }

  test("llm response: cost estimates match the reference pricing " +
      "table through the Column face") {
    val spark = TestSession.spark
    import spark.implicits._
    import org.apache.spark.sql.functions.col
    val rows = (fixture("llm_service.json") \ "cost").extract[List[JObject]]
    val got = rows.map { c =>
      ((c \ "provider").extract[String], (c \ "model").extract[String],
        (c \ "prompt_tokens").extract[Int],
        (c \ "completion_tokens").extract[Int])
    }.toDF("provider", "model", "pt", "ct")
      .select(LlmResponse.estimateCost(col("provider"), col("model"),
        col("pt"), col("ct")).as("cost"))
      .as[Double].collect()
    rows.zip(got).foreach { case (c, g) =>
      assert(math.abs(g - (c \ "cost").extract[Double]) < 1e-12,
        s"cost ${c \ "model"}")
    }
  }

  import graft.JobRowFixture.JobRow

  test("job tracker: the scripted create/update/cancel/list/cleanup " +
      "run matches the reference through the DataFrame faces") {
    import graft.operators.Jobs
    val spark = TestSession.spark
    import spark.implicits._
    import org.apache.spark.sql.functions.{col, lit}
    val fx = fixture("job_tracker.json")

    var jobs = Vector.empty[JobRow]
    def jobsDf = spark.createDataFrame(jobs)
    (fx \ "ops").extract[List[JObject]].foreach { op =>
      val id = (op \ "id").extract[String]
      val now = (op \ "now").extract[String]
      (op \ "op").extract[String] match {
        case "create" =>
          val meta = (op \ "metadata") match {
            case o: JObject => o.extract[Map[String, String]]
            case _ => null
          }
          val req = Seq((id, (op \ "type").extract[String], meta))
            .toDF("id", "type", "metadata")
          jobs = jobs ++ Jobs.create(req, lit(now)).as[JobRow].collect()
        case "update" =>
          assert(jobs.exists(_.id == id) ===
            (op \ "found").extract[Boolean], s"update $id found-arm")
          val kw = op \ "kw"
          val upd = Seq((id, (op \ "status").extract[String],
            jStrOpt(kw \ "message").orNull,
            (kw \ "progress") match {
              case JInt(n) => Int.box(n.toInt); case _ => null
            },
            jStrOpt(kw \ "error").orNull))
            .toDF("id", "to_status", "message", "progress", "error")
          jobs = Jobs.applyUpdates(jobsDf, upd, lit(now))
            .as[JobRow].collect().toVector
            .sortBy(j => jobs.indexWhere(_.id == j.id))
        case "cancel" =>
          val ids = Seq(id).toDF("id")
          val (updated, outcomes) = Jobs.cancel(jobsDf, ids, lit(now))
          assert(outcomes.as[(String, Boolean)].collect().head._2 ===
            (op \ "cancelled").extract[Boolean], s"cancel $id")
          jobs = updated.as[JobRow].collect().toVector
            .sortBy(j => jobs.indexWhere(_.id == j.id))
      }
    }

    // final store matches field-for-field
    val want = (fx \ "jobs").extract[Map[String, JObject]]
    assert(jobs.map(_.id).toSet === want.keySet)
    jobs.foreach { j =>
      val w = want(j.id)
      val ctx = s"job ${j.id}"
      assert(j.`type` === (w \ "type").extract[String], ctx)
      assert(j.status === (w \ "status").extract[String], ctx)
      assert(j.progress === (w \ "progress").extract[Int], ctx)
      assert(j.message === (w \ "message").extract[String], ctx)
      assert(j.metadata === (w \ "metadata").extract[Map[String, String]],
        ctx)
      assert(j.created_at === (w \ "created_at").extract[String], ctx)
      assert(j.updated_at === (w \ "updated_at").extract[String], ctx)
      assert(j.completed_at === jStrOpt(w \ "completed_at"), ctx)
      assert(j.error === jStrOpt(w \ "error"), ctx)
    }

    // listing endpoint filter/sort/page parity
    (fx \ "lists").extract[List[JObject]].foreach { l =>
      val got = Jobs.listJobs(jobsDf, jStrOpt(l \ "status"),
          jStrOpt(l \ "type"), (l \ "limit").extract[Int],
          (l \ "offset").extract[Int])
        .select("id").as[String].collect().toList
      assert(got === (l \ "ids").extract[List[String]],
        s"list ${l \ "status"}/${l \ "type"}")
    }

    // cleanup drops terminal jobs strictly older than the cutoff
    val afterCleanup = Jobs.cleanupOldJobs(jobsDf,
        lit((fx \ "cleanup_cutoff").extract[String]))
      .select("id").as[String].collect().toList.sorted
    assert(afterCleanup === (fx \ "jobs_after_cleanup")
      .extract[List[String]])
  }

  import graft.operators.CanonicalDescriptionRow
  import graft.operators.CanonicalDescriptionRow._

  private def attrOf(j: JValue): Attr = j match {
    case JNull => ANull
    case JString(s) => AStr(s)
    case JInt(n) => AInt(n.toLong)
    case JBool(b) => ABool(b)
    case JArray(xs) => AList(xs.map(attrOf).toVector)
    case JObject(fields) =>
      AMap(fields.map { case (k, v) => k -> attrOf(v) }.toVector)
    case other => fail(s"unexpected attr $other")
  }

  private def evidenceOf(j: JObject): EvidenceItem =
    EvidenceItem(
      (j \ "mention").extractOrElse[String](""),
      (j \ "context").extractOrElse[String](""),
      (j \ "summary").extractOrElse[String](""),
      (j \ "attributes") match {
        case JObject(fields) =>
          fields.map { case (k, v) => k -> attrOf(v) }
        case _ => Nil
      })

  test("canonical descriptions: clean text, attribute fragments and " +
      "evidence preparation match the reference run") {
    val fx = fixture("canonical_description.json")
    (fx \ "clean_text").extract[List[JObject]].foreach { c =>
      val v = (c \ "value").extract[String]
      val m = (c \ "max_length") match {
        case JInt(n) => Some(n.toInt); case _ => None
      }
      assert(CanonicalDescriptionRow.cleanText(v, m) ===
        (c \ "out").extract[String], s"clean_text('$v', $m)")
    }
    (fx \ "attributes").extract[List[JObject]].foreach { c =>
      // ordered pairs: dict insertion order is part of the contract
      // (the fixture dump sorts plain-object keys)
      val attrs = (c \ "attributes_list") match {
        case JArray(pairs) => pairs.map {
          case JArray(List(JString(k), v)) => k -> attrOf(v)
          case other => fail(s"unexpected pair $other")
        }
        case _ => Nil
      }
      assert(CanonicalDescriptionRow.formatAttributeFragment(attrs) ===
        (c \ "out").extract[String], s"attrs ${c \ "attributes_list"}")
    }
    (fx \ "evidence").extract[List[JObject]].foreach { c =>
      val items = (c \ "items").extract[List[JObject]].map(evidenceOf)
      assert(CanonicalDescriptionRow.prepareEvidence(items).toList ===
        (c \ "out").extract[List[String]], s"evidence case ${c \ "case"}")
    }
  }

  test("canonical descriptions: prompts and the response " +
      "post-processing ladder match on every arm") {
    val fx = fixture("canonical_description.json")
    (fx \ "calls").extract[List[JObject]].foreach { c =>
      val content = (c \ "content").extract[String]
      val prev = (c \ "prev").extract[String]
      val ctx = s"call '${content.take(25)}' prev='$prev'"
      assert(CanonicalDescriptionRow.systemPrompt ===
        (c \ "system_prompt").extract[String], ctx)
      assert(CanonicalDescriptionRow.userPrompt(Some("Water Pump"),
          Some("component"), prev,
          Seq("Mention: pump | Context: leaks")) ===
        (c \ "prompt").extract[String], ctx)
      val got = CanonicalDescriptionRow.callLlm(Some("Water Pump"),
        Some("component"), prev,
        Seq("Mention: pump | Context: leaks"),
        new graft.operators.LlmClient {
          def complete(p: String): String = content
        })
      assert(got === Some((c \ "out").extract[String]), ctx)
    }
    assert(CanonicalDescriptionRow.callLlm(Some("X"), None, "p", Nil,
      graft.operators.StubLlm()).isEmpty)
  }

  test("canonical descriptions: generate_descriptions matches end to " +
      "end with the label-keyed client") {
    val fx = fixture("canonical_description.json") \ "generate"
    val responses = (fx \ "responses").extract[Map[String, String]]
    val llm = new graft.operators.LlmClient {
      def complete(prompt: String): String = {
        val label = prompt.split("\n", 2).head
          .stripPrefix("Entity: ").split(" \\(")(0)
        responses.getOrElse(label, "?")
      }
    }
    val entities = (fx \ "entities").extract[List[JObject]].map { e =>
      CanonicalEntity(
        jStrOpt(e \ "id"), jStrOpt(e \ "name"), jStrOpt(e \ "type"),
        (e \ "metadata" \ "description").extractOrElse[String](""))
    }
    val evMap = (fx \ "evidence_map").extract[Map[String, List[JObject]]]
      .map { case (k, items) => k -> items.map(evidenceOf).toSeq }
    val got = CanonicalDescriptionRow.generateDescriptions(
      entities, evMap, llm)
    assert(got === (fx \ "out").extract[Map[String, String]])
  }

  test("embedding service: similarity metrics, model info and the " +
      "batch cost distribution match the reference run") {
    import graft.operators.EmbedText
    val fx = fixture("embedding_service.json")
    (fx \ "similarity").extract[List[JObject]].foreach { c =>
      val a = (c \ "a").extract[List[Double]]
      val b = (c \ "b").extract[List[Double]]
      val m = (c \ "metric").extract[String]
      val got = EmbedText.similarityRow(a, b, m)
      (c \ "out") match {
        case JDouble(want) =>
          assert(got.isDefined && math.abs(got.get - want) < 1e-9,
            s"sim $m: $got vs $want")
        case JInt(want) =>
          assert(got.isDefined && math.abs(got.get - want.toDouble) < 1e-9,
            s"sim $m")
        case _ =>
          assert(got.isEmpty, s"sim $m: expected the ValueError arm")
      }
    }
    (fx \ "model_info").extract[List[JObject]].foreach { c =>
      val m = (c \ "model").extract[String]
      val got = EmbedText.modelInfo(m).get
      val want = (c \ "info").extract[JObject]
      assert(got("model") === (want \ "model").extract[String], m)
      assert(got("dimensions") === (want \ "dimensions").extract[Int], m)
      assert(got("price_per_1k_tokens") ===
        (want \ "price_per_1k_tokens").extract[Double], m)
      assert(math.abs(got("price_per_1m_tokens").asInstanceOf[Double] -
        (want \ "price_per_1m_tokens").extract[Double]) < 1e-15, m)
    }
    assert((fx \ "bad_model_error").extract[String]
      .startsWith("Unsupported model: bogus-model"))
    assert(EmbedText.modelInfo("bogus-model").isEmpty)

    (fx \ "single_costs").extract[List[JObject]].foreach { c =>
      val text = (c \ "text").extract[String]
      assert(EmbedText.singleCost(text, "text-embedding-3-small") ===
        (c \ "cost").extract[Double], s"cost '${text.take(12)}'")
    }
    val batchTexts = (fx \ "batch_texts").extract[List[String]]
    (fx \ "batches").extract[List[JObject]].foreach { c =>
      val bs = (c \ "batch_size").extract[Int]
      val timeoutBatch = (c \ "timeout_batch") match {
        case JInt(n) => Some(n.toInt); case _ => None
      }
      val got = EmbedText.batchCosts(batchTexts,
        "text-embedding-3-small", bs, bi => timeoutBatch.contains(bi))
      assert(got.toList === (c \ "costs").extract[List[Double]],
        s"batch bs=$bs timeout=$timeoutBatch")
      // the zero-fill arm carries the MODEL dimensions, not the
      // response's
      timeoutBatch.foreach { tb =>
        val dims = (c \ "dims").extract[List[Int]]
        val start = tb * bs
        dims.slice(start, start + bs).foreach(d => assert(d === 1536))
      }
    }
  }

  private def strMap(j: JValue): Map[String, String] = j match {
    case JObject(fields) => fields.map {
      case (k, JString(s)) => k -> s
      case (k, JInt(n)) => k -> n.toString
      case (k, JBool(b)) => k -> (if (b) "True" else "False")
      case (k, other) => k -> other.toString
    }.toMap
    case _ => Map.empty
  }

  test("state manager: the scripted run over the faked store matches " +
      "the reference — tables, audit rows, live-error arms, queries " +
      "and metrics") {
    import graft.operators.StateManagerRow
    import graft.operators.StateManagerRow._
    val fx = fixture("state_manager.json")

    var now = ""
    val store = new StateManagerRow.Store(() => now)
    def errName(e: Err): String = e match {
      case _: AttributeError => "AttributeError"
      case _: ValueErr => "ValueError"
      case _: StateValidationError => "StateValidationError"
    }
    (fx \ "ops").extract[List[JObject]].foreach { op =>
      now = (op \ "now").extract[String]
      val kind = (op \ "op").extract[String]
      val ctx = s"op $kind ${op \ "arg"} @ $now"
      def checkOutcome(got: Either[Err, Unit]): Unit = {
        val want = (op \ "outcome").extract[String]
        got match {
          case Right(_) => assert(want === "ok", ctx)
          case Left(e) =>
            assert(want === s"${errName(e)}: ${e.message}", ctx)
        }
      }
      kind match {
        case "create" =>
          val id = (op \ "arg").extract[String]
          val meta = (op \ "metadata") match {
            case o: JObject => Some(strMap(o)); case _ => None
          }
          val init = (op \ "initial_state")
            .extractOrElse[String]("discovered")
          checkOutcome(store.createState(id, init, meta))
        case "transition" =>
          checkOutcome(store.transition((op \ "arg").extract[String],
            (op \ "to").extract[String], None, jStrOpt(op \ "reason"),
            None))
        case "reset" =>
          checkOutcome(
            store.resetFailedDocument((op \ "arg").extract[String]))
        case "bulk" =>
          val ids = (op \ "arg").extract[List[String]]
          val res = store.bulkTransition(ids,
            (op \ "to").extract[String])
          assert(res.count(_._2.isRight) ===
            (op \ "bulk_ok_count").extract[Int], ctx)
      }
    }

    // final documents table
    val wantDocs = (fx \ "documents").extract[List[JObject]]
    assert(store.docs.keySet.toList.sorted ===
      wantDocs.map(d => (d \ "id").extract[String]).sorted)
    wantDocs.foreach { w =>
      val d = store.docs((w \ "id").extract[String])
      val ctx = s"doc ${d.id}"
      assert(d.name === (w \ "name").extract[String], ctx)
      assert(d.sourceType === (w \ "source_type").extract[String], ctx)
      assert(d.fileType === (w \ "file_type").extract[String], ctx)
      assert(d.status === (w \ "status").extract[String], ctx)
      assert(d.retryCount === (w \ "retry_count").extract[Int], ctx)
      assert(d.metadata === strMap(w \ "metadata"), ctx)
      assert(d.createdAt === (w \ "created_at").extract[String], ctx)
      assert(d.updatedAt === (w \ "updated_at").extract[String], ctx)
      assert(d.version === (w \ "version").extract[Int], ctx)
      assert(d.tags.isEmpty === (w \ "tags").extract[List[String]].isEmpty,
        ctx)
    }

    // audit rows, in insertion order
    val wantTrans = (fx \ "transitions").extract[List[JObject]]
    assert(store.transitions.length === wantTrans.length)
    store.transitions.zip(wantTrans).foreach { case (t, w) =>
      val ctx = s"audit ${t.documentId}@${t.createdAt}"
      assert(t.documentId === (w \ "document_id").extract[String], ctx)
      assert(t.fromState === (w \ "from_state").extract[String], ctx)
      assert(t.toState === (w \ "to_state").extract[String], ctx)
      assert(t.userId === jStrOpt(w \ "user_id"), ctx)
      assert(t.reason === jStrOpt(w \ "reason"), ctx)
      assert(t.metadata === strMap(w \ "metadata"), ctx)
      assert(t.createdAt === (w \ "created_at").extract[String], ctx)
    }

    // queries + metrics
    val q = fx \ "queries"
    assert(store.documentsByState("discovered").toList ===
      (q \ "by_state_discovered").extract[List[String]])
    assert(store.documentsRequiringAction().toList ===
      (q \ "requiring_action").extract[List[String]])
    assert(store.stateStatistics().toMap ===
      (q \ "statistics").extract[Map[String, Int]])
    val m = store.processingMetrics()
    val wm = q \ "metrics"
    assert(m("state_counts") ===
      (wm \ "state_counts").extract[Map[String, Int]])
    assert(m("total_documents") ===
      (wm \ "total_documents").extract[Int])
    assert(m("success_rate") === (wm \ "success_rate").extract[Double])
    assert(m("failure_rate") === (wm \ "failure_rate").extract[Double])
    assert(m("average_processing_time") ===
      (wm \ "average_processing_time").extract[Double])
    assert(m("documents_pending_review") ===
      (wm \ "documents_pending_review").extract[Int])
    assert(m("documents_failed") ===
      (wm \ "documents_failed").extract[Int])
  }

  test("config validation: error message and status frame match the " +
      "reference run, including the production exit arm") {
    val rows = fixture("config_validator.json").extract[List[JObject]]
    rows.foreach { r =>
      val s = settingsOf(r \ "settings")
      val ctx = s"case=${r \ "case"}"
      (r \ "exit") match {
        case JInt(code) =>
          // production + invalid: module import exits 1 — the exit is
          // driven by a non-empty validation failure
          assert(code === 1, ctx)
          assert(ConfigValidation.validationFailure(s).nonEmpty, ctx)
        case _ =>
          val wantErr = (r \ "error") match {
            case JString(e) => Some(e); case _ => None
          }
          assert(ConfigValidation.validationFailure(s) === wantErr, ctx)
          val wantStatus = (r \ "status").extract[JObject]
          val got = ConfigValidation.configStatus(s)
          wantStatus.obj.foreach { case (k, v) =>
            val gv = got(k)
            v match {
              case JBool(b) => assert(gv === b, s"$ctx status.$k")
              case JString(str) => assert(gv === str, s"$ctx status.$k")
              case other => fail(s"$ctx status.$k unexpected: $other")
            }
          }
          assert(got.keySet === wantStatus.obj.map(_._1).toSet, ctx)
      }
    }
  }
}

/** Top-level (encoder-visible) row shape for the job-tracker parity
  * replay. */
object JobRowFixture {
  case class JobRow(id: String, `type`: String, status: String,
      progress: Int, message: String, metadata: Map[String, String],
      created_at: String, updated_at: String,
      completed_at: Option[String], error: Option[String])
}
