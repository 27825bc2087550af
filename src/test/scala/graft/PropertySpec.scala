package graft

import org.apache.spark.sql.Row
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._
import org.scalatest.funsuite.AnyFunSuite
import org.scalacheck.Gen
import org.scalacheck.rng.Seed

import graft.functions.{RecursiveSplit, TextFunctions}
import graft.operators.Chunker
import graft.types.SchemaMapping

/** Property tests (SURVEY §5: codec roundtrips mirroring
  * test_convert.py, plus operator invariants under random inputs).
  * Driver-side generation, one Spark job per sampled batch.
  */
class PropertySpec extends AnyFunSuite {
  lazy val spark = TestSession.spark
  import spark.implicits._

  /** Deterministic sampling (scalacheck Gen, fixed seeds) — property
    * checks without the scalatest-plus bridge (offline dep set). */
  private def samples[A](g: Gen[A], n: Int): Seq[A] =
    (0 until n).map(i => g.pureApply(Gen.Parameters.default, Seed(42L + i)))

  private val textGen: Gen[String] = for {
    words <- Gen.listOfN(40, Gen.oneOf(
      Gen.alphaLowerStr.map(_.take(6)), Gen.const("the"),
      Gen.const("日本語"), Gen.const("🙂")))
    seps <- Gen.listOfN(40, Gen.oneOf(" ", " ", "\n", "\n\n", ". "))
  } yield words.zip(seps).map { case (w, s) => w + s }.mkString

  test("recursive split always reconstructs from offsets (random unicode text)") {
    val texts = samples(textGen, 60)
    val rows = texts.zipWithIndex.map { case (t, i) => (i.toLong, t) }
      .toDF("id", "text")
      .select($"id", $"text", explode(
        RecursiveSplit.split_recursively($"text", 30, 5, 8)).as("c"))
      .select($"text", $"c.start", $"c.end", $"c.text".as("chunk"))
      .collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val (text, s, e, chunk) =
        (r.getString(0), r.getInt(1), r.getInt(2), r.getString(3))
      assert(text.substring(s, e) === chunk)
      assert(chunk.nonEmpty)
      assert(!Character.isWhitespace(chunk.head) && !Character.isWhitespace(chunk.last))
    }
  }

  test("winnow: random docs sharing a >= k+w-1 substring share a fingerprint") {
    import graft.functions.NativeText
    val ctxGen = Gen.listOfN(6, Gen.alphaLowerStr.map(_.take(5))).map(_.mkString(" "))
    val coreGen = Gen.alphaNumStr.map(_.take(30)).suchThat(_.length >= 11)
    val cases = samples(Gen.zip(coreGen, ctxGen, ctxGen), 40)
    val df = cases.zipWithIndex.map { case ((core, p1, p2), i) =>
      (i.toLong, p1 + " " + core + " " + p2, core)
    }.toDF("id", "doc", "core")
    val rows = df.select(
        NativeText.winnowOf($"doc", 8, 4).as("fdoc"),
        NativeText.winnowOf($"core", 8, 4).as("fcore"))
      .as[(Seq[Long], Seq[Long])].collect()
    rows.foreach { case (fdoc, fcore) =>
      assert((fdoc.toSet & fcore.toSet).nonEmpty)
      assert(fdoc.toSeq === fdoc.sorted)
    }
  }

  test("fixed chunks cover the whole text in order") {
    val texts = samples(Gen.asciiPrintableStr.suchThat(_.nonEmpty), 40)
    val rows = texts.zipWithIndex.map { case (t, i) => (i.toLong, t) }
      .toDF("id", "text")
    val out = Chunker.fixed(rows, "text", 20, 5)
      .groupBy($"id").agg(
        max(length($"text")).as("len"),
        max($"chunk_index").as("last"),
        count(lit(1)).as("n"))
      .collect()
    assert(out.length === texts.length)
    out.foreach { r =>
      val (len, last, n) = (r.getInt(1), r.getInt(2), r.getLong(3))
      assert(n === last + 1) // indexes contiguous from 0
      // last chunk starts before the end of text (step=15)
      assert(last * 15 < math.max(len, 1))
    }
  }

  test("bm25 tokens never contain stopwords or short tokens") {
    val toks = samples(textGen, 60).toDF("text")
      .select(explode(TextFunctions.bm25Tokens($"text")).as("t"))
      .as[String].collect()
    assert(toks.nonEmpty)
    toks.foreach { t =>
      assert(t.length > 2)
      assert(!TextFunctions.stopwords.contains(t))
      assert(t.matches("[a-z0-9]+"))
    }
  }

  test("type-table roundtrip: values survive Row encoding per SchemaMapping") {
    val schema = StructType(Seq(
      SchemaMapping.field("b", SchemaMapping.scalar("Bytes"), nullable = true),
      SchemaMapping.field("s", SchemaMapping.scalar("Str"), nullable = true),
      SchemaMapping.field("i", SchemaMapping.scalar("Int64"), nullable = true),
      SchemaMapping.field("f", SchemaMapping.scalar("Float64"), nullable = true),
      SchemaMapping.field("r", SchemaMapping.scalar("Range"), nullable = true),
      SchemaMapping.field("d", SchemaMapping.scalar("Date"), nullable = true),
      SchemaMapping.field("v", SchemaMapping.vector(FloatType, Some(3))._1,
        nullable = true)))
    val rows = Seq(
      Row("xyz".getBytes, "text", 42L, 2.5, Row(3L, 9L),
        java.sql.Date.valueOf("2024-02-29"), Seq(1f, 2f, 3f)),
      Row(null, null, null, null, null, null, null))
    val df = spark.createDataFrame(
      spark.sparkContext.parallelize(rows.map(r => r: Row)), schema)
    val back = df.collect()
    assert(back(0).getAs[Array[Byte]]("b").toSeq === "xyz".getBytes.toSeq)
    assert(back(0).getAs[Row]("r") === Row(3L, 9L))
    assert(back(0).getAs[Seq[Float]]("v") === Seq(1f, 2f, 3f))
    assert(back(1).toSeq.forall(_ == null))
    // round-trip through parquet too (export path)
    val tmp = java.nio.file.Files.createTempDirectory("types").toString
    df.write.mode("overwrite").parquet(s"$tmp/t")
    val rt = spark.read.parquet(s"$tmp/t")
    // parquet widens struct-field nullability; compare field names/types
    val rtRange = rt.schema("r").dataType.asInstanceOf[StructType]
    val expRange = SchemaMapping.scalar("Range").asInstanceOf[StructType]
    assert(rtRange.fields.map(f => (f.name, f.dataType)).toSeq ===
      expRange.fields.map(f => (f.name, f.dataType)).toSeq)
    assert(rt.count() === 2)
  }

  test("union encoding keeps exactly one active variant") {
    val u = SchemaMapping.union(Seq("as_int" -> LongType, "as_str" -> StringType))
    val df = spark.createDataFrame(
      spark.sparkContext.parallelize(Seq(
        Row(Row("as_int", 7L, null)), Row(Row("as_str", null, "seven")))),
      StructType(Seq(StructField("u", u))))
    val got = df.select($"u._tag", $"u.as_int", $"u.as_str").collect()
    assert(got(0).toSeq === Seq("as_int", 7L, null))
    assert(got(1).toSeq === Seq("as_str", null, "seven"))
  }

  test("as-of join matches brute force on random key/timestamp data") {
    import graft.operators.AsOfJoin
    val gen = for {
      lk <- Gen.listOfN(60, Gen.choose(1, 5))
      lt <- Gen.listOfN(60, Gen.choose(0L, 50L))
      rk <- Gen.listOfN(25, Gen.choose(1, 5))
      rt <- Gen.listOfN(25, Gen.choose(0L, 50L))
    } yield (lk.zip(lt), rk.zip(rt).distinct)
    val (leftRows, rightRows0) = samples(gen, 1).head
    // at most one right row per (key, ts): contract precondition
    val rightRows = rightRows0.groupBy(identity).keys.toSeq
      .zipWithIndex.map { case ((k, t), i) => (k, t, i.toDouble) }
    val left = leftRows.zipWithIndex
      .map { case ((k, t), i) => (i.toLong, k, t) }.toDF("lid", "k", "ts")
    val right = rightRows.toDF("k", "rts", "v")
    val got = AsOfJoin.asOf(left, right, "k", "ts", "rts", Seq("v"))
      .select($"lid", $"asof_rts", $"asof_v").collect()
      .map(r => (r.getLong(0),
        if (r.isNullAt(1)) None else Some((r.getLong(1), r.getDouble(2)))))
      .toMap
    // brute force: for every left row, the latest right at or before ts
    leftRows.zipWithIndex.foreach { case ((k, t), i) =>
      val expected = rightRows.filter(r => r._1 == k && r._2 <= t)
        .sortBy(_._2).lastOption.map(r => (r._2, r._3))
      assert(got(i.toLong) === expected, s"left row $i (k=$k, ts=$t)")
    }
  }

  test("interval join matches brute force on random points/intervals") {
    import graft.operators.RangeJoin
    val gen = for {
      pts <- Gen.listOfN(80, Gen.choose(0, 100))
      los <- Gen.listOfN(30, Gen.choose(0, 95))
      spans <- Gen.listOfN(30, Gen.choose(1, 20))
    } yield (pts, los.zip(spans).map { case (l, s) => (l, l + s) })
    val (pts, ivs) = samples(gen, 1).head
    val points = pts.zipWithIndex.map { case (v, i) => (i.toLong, v.toDouble) }
      .toDF("pid", "v")
    val intervals = ivs.zipWithIndex
      .map { case ((lo, hi), i) => (i.toLong, lo.toDouble, hi.toDouble) }
      .toDF("iid", "lo", "hi")
    for (width <- Seq(1.0, 7.0, 50.0)) {
      val got = RangeJoin.intervalJoin(points, "v", intervals, "lo", "hi", width)
        .select($"pid", $"iid").as[(Long, Long)].collect().toSet
      val expected = (for {
        (v, pi) <- pts.zipWithIndex
        ((lo, hi), ii) <- ivs.zipWithIndex
        if v >= lo && v < hi
      } yield (pi.toLong, ii.toLong)).toSet
      assert(got === expected, s"bucketWidth=$width")
    }
  }

  test("interval join: boundary adversary — hi within 1e-12 above a " +
      "bucket boundary still reaches the boundary bucket (the trimmed " +
      "candidate-bucket bug), exact-boundary hi stays exclusive") {
    import graft.operators.RangeJoin
    val points = Seq((1L, 10.0), (2L, 9.999999999999)).toDF("pid", "v")
    val intervals = Seq(
      (1L, 5.0, 10.0 + 5e-13), // reaches INTO bucket 2: point at 10.0 matches
      (2L, 5.0, 10.0))         // exclusive at exactly 10.0: point 10.0 does NOT
      .toDF("iid", "lo", "hi")
    val got = RangeJoin.intervalJoin(points, "v", intervals, "lo", "hi", 5.0)
      .select($"pid", $"iid").as[(Long, Long)].collect().toSet
    assert(got === Set((1L, 1L), (2L, 1L), (2L, 2L)),
      "pair (1,1) is the one the hi-1e-12 candidate trim silently lost")
  }

  test("heading blocks agree with an independent reimplementation") {
    import graft.functions.HeadingBlocks.headingBlocksOf
    import org.apache.spark.sql.Row
    // independent model: regex-split reimplementation of
    // two_tier_chunker.py:94-133 (vs the operator's index-walk)
    def model(text: String): Seq[(Option[String], String)] = {
      def strip(s: String) = s.dropWhile(" \t\n\r".contains(_))
        .reverse.dropWhile(" \t\n\r".contains(_)).reverse
      val hm = "(?m)^(#{1,6})\\s+.*$".r
      val ms = hm.findAllMatchIn(text).map(_.start).toList
      if (ms.isEmpty) {
        val t = strip(text)
        if (t.isEmpty) Nil else Seq((None, t))
      } else {
        val pre = strip(text.take(ms.head))
        ms.zip(ms.tail :+ text.length).zipWithIndex.map {
          case ((s0, e0), i) =>
            val block = strip(text.substring(s0, e0))
            val (h, b) = block.indexOf('\n') match {
              case -1 => (block, "")
              case nl => (strip(block.take(nl)), strip(block.drop(nl + 1)))
            }
            val body = if (i == 0 && pre.nonEmpty)
              pre + (if (b.nonEmpty) "\n\n" + b else "") else b
            (Option(h), body)
        }
      }
    }
    val mdGen = for {
      parts <- Gen.listOfN(12, Gen.oneOf(
        Gen.const("# Head"), Gen.const("## Sub x"), Gen.const("####### seven"),
        Gen.alphaLowerStr.map(_.take(8)), Gen.const("  "), Gen.const("#nospace")))
    } yield parts.mkString("\n")
    val texts = samples(mdGen, 40)
    val got = texts.toDF("t")
      .select($"t", headingBlocksOf($"t").as("b")).collect()
      .map(r => r.getString(0) -> r.getSeq[Row](1)
        .map(x => (Option(x.getString(0)), x.getString(1)))).toMap
    texts.foreach { t =>
      assert(got(t) === model(t), s"text:\n$t")
    }
  }

  test("incremental sync agrees with an in-memory model over random change sequences") {
    import graft.incremental.{Incremental, ParquetSink}
    val tmp = java.nio.file.Files.createTempDirectory("incprop").toString
    val (sink, track) = (s"$tmp/sink", s"$tmp/track")
    // model: source_key -> (ordinal, content); target = processed rows
    var model = Map.empty[String, (Long, String)]
    def process(delta: org.apache.spark.sql.DataFrame) =
      delta.select(col("source_key"),
        concat(col("source_key"), lit("#"), col("content")).as("target_key"),
        upper(col("content")).as("out"))
    val keyPool = ('a' to 'f').map(_.toString)
    val contentGen = Gen.oneOf("x", "y", "z")
    val rnd = new scala.util.Random(7)
    (1 to 6).foreach { step =>
      // random snapshot: subset of keys, each with a random content and
      // a MONOTONIC ordinal (the source contract); occasionally a
      // stale ordinal that must be ignored for known keys
      val snapshot = keyPool.filter(_ => rnd.nextBoolean()).map { k =>
        val content = contentGen.pureApply(Gen.Parameters.default,
          Seed(step * 100L + k.hashCode))
        val stale = model.contains(k) && rnd.nextInt(5) == 0
        val ord = if (stale) model(k)._1 - 1 else step.toLong
        (k, ord, content)
      }
      val src = snapshot.toDF("source_key", "ordinal", "content")
        .withColumn("content_hash", sha2(col("content"), 256))
      Incremental.syncSource(spark, src, process, "fp", sink, track)
      // evolve the model with the same semantics: stale rows ignored
      // entirely (they neither update nor protect from deletion —
      // their key IS present in the snapshot so it's not deleted)
      val present = snapshot.map(_._1).toSet
      model = model.filter { case (k, _) => present.contains(k) }
      snapshot.foreach { case (k, ord, content) =>
        model.get(k) match {
          case Some((prevOrd, _)) if ord < prevOrd => // stale: drop
          case _ => model += (k -> (ord, content))
        }
      }
      val expected = model.map { case (k, (_, content)) =>
        (s"$k#$content", content.toUpperCase)
      }.toSet
      val got = ParquetSink.read(spark, sink).get
        .select($"target_key", $"out").as[(String, String)].collect().toSet
      assert(got === expected, s"divergence at step $step")
    }
  }

  test("token offsets slice back to their token (random unicode text)") {
    import graft.functions.NativeText
    val texts = samples(textGen, 60)
    val rows = texts.zipWithIndex.map { case (t, i) => (i.toLong, t) }
      .toDF("id", "text")
      .select($"text", explode(NativeText.bm25TokenOffsetsOf($"text")).as("m"))
      .select($"text", $"m.token", $"m.start_offset", $"m.end_offset")
      .collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val (text, tok, s, e) =
        (r.getString(0), r.getString(1), r.getInt(2), r.getInt(3))
      val lower = text.toLowerCase
      // 1-based [start, end) in CODE POINTS (the unit SQL substring
      // slices by — textGen includes astral 🙂 chars to pin this):
      // the slice of the lowercased text IS the token
      val cps = lower.codePoints.toArray
      assert(s >= 1 && e > s && e <= cps.length + 1)
      assert(new String(cps, s - 1, e - s) === tok)
      assert(tok.length >= 3 && !TextFunctions.stopwords.contains(tok))
    }
    // stream identity with the offset-less tokenizer
    val both = texts.zipWithIndex.map { case (t, i) => (i.toLong, t) }
      .toDF("id", "text")
      .select(
        transform(NativeText.bm25TokenOffsetsOf($"text"), m => m.getField("token")).as("a"),
        NativeText.bm25TokensOf($"text").as("b"))
    assert(both.where(not($"a" <=> $"b")).count() === 0)
  }

  test("removeBoilerplateLines: conservation and idempotency laws on " +
      "random line corpora (removal never raises a survivor's df, so " +
      "a second pass at the same threshold removes nothing)") {
    import graft.operators.Dedup
    // small line alphabet → real cross-doc collisions at every df
    val lineGen = Gen.oneOf("banner x", "menu", "body a", "body b",
      "body c", "   ", "footer y", "z")
    val docGen = Gen.chooseNum(1, 6)
      .flatMap(k => Gen.listOfN(k, lineGen)).map(_.mkString("\n"))
    val docs = samples(docGen, 50).zipWithIndex
      .map { case (t, i) => (i.toLong, t) }.toDF("doc_id", "text")
    val out = Dedup.removeBoilerplateLines(
      docs, "doc_id", "text", 5L).cache()
    try {
      // conservation: every doc verdicts once; n_removed counts what
      // left clean_text
      assert(out.count() === 50L)
      val broke = out.where(
        col("n_lines") - col("n_removed") =!=
          when(col("clean_text") === "" and col("n_lines") === col("n_removed"),
            lit(0)).otherwise(size(split(col("clean_text"), "\n", -1))))
      assert(broke.count() === 0L, broke.collect().mkString("\n"))
      // idempotency (provable law: removal deletes whole lines
      // everywhere, so surviving lines keep their exact df)
      val again = Dedup.removeBoilerplateLines(
        out.select(col("doc_id"), col("clean_text")),
        "doc_id", "clean_text", 5L)
      assert(again.where(col("n_removed") > 0).count() === 0L)
    } finally out.unpersist()
  }

  test("budgetSelect: selection is monotone in the budget and " +
      "total-respecting on random corpora") {
    import graft.operators.Sampling
    val rowGen = Gen.zip(Gen.chooseNum(0L, 40L), Gen.chooseNum(0L, 4L))
    val rows = samples(rowGen, 80).zipWithIndex
      .map { case ((n, b), i) => (i.toLong, n, b) }
      .toDF("id", "n_tokens", "band")
    val picks = Seq(0L, 100L, 400L, 900L, 100000L).map { budget =>
      val sel = Sampling.budgetSelect(rows, "id", "n_tokens", "band", budget)
        .where(col("selected")).cache()
      val ids = sel.select("id").collect().map(_.getLong(0)).toSet
      val toks = sel.agg(coalesce(sum("n_tokens"), lit(0L)))
        .head().getLong(0)
      sel.unpersist()
      // the selection never overshoots the budget
      assert(toks <= budget, s"budget $budget overshot: $toks")
      ids
    }
    // growing budgets only ever ADD documents
    picks.sliding(2).foreach { case Seq(a, b) =>
      assert(a.subsetOf(b), s"monotonicity broke: ${a.diff(b)}")
    }
    // unbounded budget takes everything
    assert(picks.last.size === 80)
  }
}
