package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.operators.Packing

/** Concat-and-chop sequence packing (operators/Packing). */
class PackingSpec extends AnyFunSuite {
  lazy val spark = TestSession.spark
  import spark.implicits._

  test("concatChop: hand-computed spans, budget boundaries, empty doc") {
    // one shard, budget 10; docs in id order: 4, 7, 0, 10, 3 tokens
    // stream offsets: [0,4) [4,11) [11,11) [11,21) [21,24)
    val df = Seq((1L, 4L), (2L, 7L), (3L, 0L), (4L, 10L), (5L, 3L))
      .toDF("id", "tc")
    val out = Packing.concatChop(df, "id", "tc", lit(0L), 10L)
      .collect().map(r => r.getLong(0) ->
        ((r.getLong(3), r.getLong(4), r.getLong(5)))).toMap
    assert(out(1L) === ((0L, 0L, 0L)))
    // doc 2 spans tokens [4,11) → sequences 0..1
    assert(out(2L) === ((4L, 0L, 1L)))
    // empty doc at offset 11 sits at its boundary
    assert(out(3L) === ((11L, 1L, 1L)))
    // doc 4 spans [11,21) → sequences 1..2
    assert(out(4L) === ((11L, 1L, 2L)))
    assert(out(5L) === ((21L, 2L, 2L)))
  }

  test("shards pack independently and the stream is contiguous") {
    val df = spark.range(1000).toDF("id")
      .withColumn("tc", (col("id") * 7 % 13) + 1)
    val out = Packing.concatChop(df, "id", "tc",
      pmod(col("id"), lit(4)), 50L)
    // per shard: offsets are a contiguous prefix sum (next start =
    // previous start + previous n_tokens in id order)
    val rows = out.orderBy("shard", "id")
      .select("shard", "start", "n_tokens").collect()
    rows.groupBy(_.getLong(0)).foreach { case (_, rs) =>
      rs.foldLeft(0L) { (expected, r) =>
        assert(r.getLong(1) === expected)
        expected + r.getLong(2)
      }
    }
    // layout-invariant: same result after an adversarial repartition
    val again = Packing.concatChop(df.repartition(17), "id", "tc",
      pmod(col("id"), lit(4)), 50L)
    assert(again.exceptAll(out).count() === 0L)
    assert(out.exceptAll(again).count() === 0L)
  }

  test("carryCols ride through the packing window unchanged") {
    val df = Seq((1L, 4L, "en"), (2L, 7L, "de")).toDF("id", "tc", "lang")
    val out = Packing.concatChop(df, "id", "tc", lit(0L), 10L,
      carryCols = Seq("lang"))
    assert(out.columns.toSeq ===
      Seq("id", "lang", "shard", "n_tokens", "start", "seq_first",
        "seq_last"))
    assert(out.where(col("id") === 2L).collect().head
      .getAs[String]("lang") === "de")
  }

  test("shardManifest: exact totals, ceil sequence count (immune to " +
      "the trailing-empty-doc boundary), and an order-insensitive " +
      "checksum that flips on any id or count change") {
    val df = Seq((0L, 4L), (2L, 7L), (4L, 0L), (1L, 10L), (3L, 3L))
      .toDF("id", "tc").withColumn("shard", pmod(col("id"), lit(2)))
    def mf(d: org.apache.spark.sql.DataFrame) =
      Packing.shardManifest(d, "shard", "id", "tc", 10L)
        .collect().map(r => r.getLong(0) ->
          ((r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4))))
        .toMap
    val a = mf(df)
    // shard 0: ids 0,2,4 → 11 tokens → ceil(11/10) = 2 sequences
    assert(a(0L)._1 === 3L && a(0L)._2 === 11L && a(0L)._3 === 2L)
    // shard 1: ids 1,3 → 13 tokens → 2 sequences
    assert(a(1L)._1 === 2L && a(1L)._2 === 13L && a(1L)._3 === 2L)
    // row order cannot move the checksum (xor is commutative)
    assert(mf(df.orderBy(col("tc").desc)) === a)
    // ...but a single token-count change must
    val b = mf(df.withColumn("tc",
      when(col("id") === 2L, lit(8L)).otherwise(col("tc"))))
    assert(b(0L)._4 !== a(0L)._4)
    assert(b(1L)._4 === a(1L)._4, "other shards stay localized")
    // 20 tokens exactly at budget 10 → 2 sequences, not 3, even with
    // a trailing empty doc on the boundary (the max(seq_last)+1 trap)
    val c = mf(Seq((0L, 10L), (2L, 10L), (4L, 0L)).toDF("id", "tc")
      .withColumn("shard", lit(0L)))
    assert(c(0L)._3 === 2L)
  }

  test("shardManifest multi-key face: (split, shard) subsets roll up " +
      "independently, and the single-col overload is the Seq face") {
    val df = Seq((0L, 4L, "train"), (1L, 7L, "test"), (2L, 9L, "train"),
      (3L, 5L, "test")).toDF("id", "tc", "split")
      .withColumn("shard", pmod(col("id"), lit(2)))
    val m = Packing.shardManifest(df, Seq("split", "shard"),
        "id", "tc", 10L)
      .collect().map(r => (r.getString(0), r.getLong(1)) ->
        ((r.getLong(2), r.getLong(3), r.getLong(5)))).toMap
    // (train, 0): id 0 and 2 → 13 tokens; (test, 1): ids 1, 3 → 12
    assert(m(("train", 0L))._1 === 2L && m(("train", 0L))._2 === 13L)
    assert(m(("test", 1L))._1 === 2L && m(("test", 1L))._2 === 12L)
    // one key, same law: the overload must agree cell-for-cell
    val a = Packing.shardManifest(df, "shard", "id", "tc", 10L).collect()
    val b = Packing.shardManifest(df, Seq("shard"), "id", "tc", 10L)
      .collect()
    assert(a.toSeq === b.toSeq)
  }

  test("lengthBucketBatches: ceil buckets, id-ordered chop, the " +
      "pad_to waste law; 0/null tokens sit in bucket 0; boundary " +
      "lengths land on the exact bucket edge") {
    val df = Seq[(Long, java.lang.Long)](
      (1L, 10L), (2L, 32L),          // both bucket 1 (<=32)
      (3L, 33L), (4L, 64L), (5L, 40L), // bucket 2 (33..64)
      (6L, 0L), (7L, null)           // bucket 0, pad_to 0
    ).toDF("id", "n")
    val out = Packing.lengthBucketBatches(df, "id", "n", 32L, 2)
      .collect().map(r => r.getLong(0) ->
        ((r.getLong(2), r.getLong(3), r.getLong(4)))).toMap
    assert(out(1L) === ((1L, 0L, 32L)))
    assert(out(2L) === ((1L, 0L, 32L)))
    // bucket 2 in id order: 3,4 batch 0; 5 batch 1
    assert(out(3L) === ((2L, 0L, 64L)))
    assert(out(4L) === ((2L, 0L, 64L)))
    assert(out(5L) === ((2L, 1L, 64L)))
    assert(out(6L) === ((0L, 0L, 0L)))
    assert(out(7L) === ((0L, 0L, 0L)))
    // waste law: every member's n_tokens <= pad_to
    val all = Packing.lengthBucketBatches(df, "id", "n", 32L, 2)
    assert(all.where(col("n") > col("pad_to")).count() === 0L)
  }

  test("sequenceIndex: hand-computed composition rows; sequences " +
      "tile to exactly the budget except each shard's last; offsets " +
      "are contiguous; empty docs contribute nothing") {
    // one shard, budget 10: docs 4, 7, 0, 10, 3 tokens (as above)
    val df = Seq((1L, 4L), (2L, 7L), (3L, 0L), (4L, 10L), (5L, 3L))
      .toDF("id", "tc")
    val packed = Packing.concatChop(df, "id", "tc", lit(0L), 10L)
    val idx = Packing.sequenceIndex(packed, "id", 10L)
      .collect().map(r => (r.getLong(1), r.getLong(2)) ->
        ((r.getLong(3), r.getLong(4)))).toMap
    // seq 0: doc1 [0,4), doc2 [4,10) → 6 of doc2's 7 tokens
    assert(idx((0L, 1L)) === ((0L, 4L)))
    assert(idx((0L, 2L)) === ((4L, 6L)))
    // seq 1: doc2's last token, doc4's first 9
    assert(idx((1L, 2L)) === ((0L, 1L)))
    assert(idx((1L, 4L)) === ((1L, 9L)))
    // seq 2: doc4's last token + doc5's 3
    assert(idx((2L, 4L)) === ((0L, 1L)))
    assert(idx((2L, 5L)) === ((1L, 3L)))
    assert(!idx.keySet.exists(_._2 == 3L), "empty doc 3 absent")
    // tiling: seqs 0 and 1 sum to 10; final seq 2 holds the 4 rest
    val bySeq = idx.toSeq.groupBy(_._1._1)
      .view.mapValues(_.map(_._2._2).sum).toMap
    assert(bySeq === Map(0L -> 10L, 1L -> 10L, 2L -> 4L))
    // contiguity within each sequence
    idx.toSeq.groupBy(_._1._1).foreach { case (_, rows) =>
      val sorted = rows.map(_._2).sortBy(_._1)
      sorted.foldLeft(0L) { case (at, (off, n)) =>
        assert(off === at); at + n
      }
    }
  }

  test("concatChop: a STRING shard expression (hash band) partitions " +
      "as-is — the r17 pass-7 regression (a long cast crashed ANSI " +
      "runs and null-collapsed every shard under legacy casts)") {
    val df = Seq((1L, 4L), (2L, 7L), (3L, 5L)).toDF("id", "tc")
    val out = Packing.concatChop(df, "id", "tc",
        substring(md5(col("id").cast("string")), 1, 1), 10L)
      .collect().map(r => r.getAs[Long]("id") ->
        r.getAs[String]("shard")).toMap
    // every row keeps its own single-hex band; no null collapse
    assert(out.values.forall(s => s != null && s.length == 1))
    assert(out.keySet === Set(1L, 2L, 3L))
  }

  test("concatChop + shardManifest: null token counts pack as 0 with " +
      "non-null bounds, and the manifest checksum SEES null-count " +
      "docs (r17 pass-7: they were counted in n_docs but invisible " +
      "to the integrity artifact)") {
    val df = Seq((1L, Some(4L)), (2L, None), (3L, Some(6L)))
      .toDF("id", "tc")
    val packed = Packing.concatChop(df, "id", "tc", lit(0L), 10L)
    val rows = packed.collect().map(r => r.getAs[Long]("id") ->
      ((r.getAs[Long]("n_tokens"), r.getAs[Long]("start"),
        r.getAs[Long]("seq_first"), r.getAs[Long]("seq_last")))).toMap
    // the null-count doc sits at its boundary like an empty doc
    assert(rows(2L) === ((0L, 4L, 0L, 0L)))
    assert(rows(3L) === ((6L, 4L, 0L, 0L)))
    def checksum(d: org.apache.spark.sql.DataFrame): Long =
      Packing.shardManifest(Packing.concatChop(d, "id", "tc", lit(0L),
          10L), "shard", "id", "n_tokens", 10L)
        .collect().head.getAs[Long]("checksum")
    // a null-count doc CONTRIBUTES to the checksum: swapping which
    // doc carries the null changes it
    val swapped = Seq((1L, None: Option[Long]), (2L, Some(4L)),
      (3L, Some(6L))).toDF("id", "tc")
    assert(checksum(df) !== checksum(swapped))
  }

  test("budget must be positive") {
    val df = Seq((1L, 4L)).toDF("id", "tc")
    assertThrows[IllegalArgumentException] {
      Packing.concatChop(df, "id", "tc", lit(0L), 0L)
    }
  }
}
