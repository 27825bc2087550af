package graft.functions

import java.security.MessageDigest

import org.apache.spark.sql.{Column, Encoder, Encoders}
import org.apache.spark.sql.expressions.Aggregator
import org.apache.spark.sql.functions.udaf

/** KMV (K-Minimum-Values) distinct-count sketch as a typed
  * [[Aggregator]] — the custom-UDAF tier (SURVEY §2.9: the reference
  * has no UDAF surface; our training-data additions need mergeable
  * sketches for corpus-scale cardinalities).
  *
  * Items hash to 48-bit uniform values (first 12 md5 hex digits);
  * the buffer keeps the k smallest DISTINCT hashes and is mergeable
  * (map-side partial aggregation works — the whole point of a sketch
  * at 100 TB: fixed-size state per group, one shuffle of k longs).
  * Estimate: exact count while < k distinct hashes seen, else
  * (k−1) / (h_k / 2^48). Deterministic md5 hashing makes the estimate
  * engine-reproducible — the DuckDB oracle recomputes it exactly,
  * unlike an HLL whose register layout is implementation-defined.
  */
object Sketch {

  private val TwoPow48 = 281474976710656.0 // 2^48, exact in double

  private val mdLocal: ThreadLocal[MessageDigest] =
    ThreadLocal.withInitial(() => MessageDigest.getInstance("MD5"))

  private[functions] def hash48(s: String): Long = {
    val md = mdLocal.get()
    md.reset()
    val d = md.digest(s.getBytes("UTF-8"))
    // first 6 bytes == first 12 hex digits
    ((d(0) & 0xffL) << 40) | ((d(1) & 0xffL) << 32) | ((d(2) & 0xffL) << 24) |
      ((d(3) & 0xffL) << 16) | ((d(4) & 0xffL) << 8) | (d(5) & 0xffL)
  }

  final case class KmvDistinct(k: Int) extends Aggregator[String, Seq[Long], Double] {
    require(k > 1)
    override def zero: Seq[Long] = Seq.empty

    private def insert(buf: Seq[Long], h: Long): Seq[Long] =
      if (buf.contains(h)) buf
      else if (buf.size < k) (buf :+ h).sorted
      else if (h < buf.last) (buf.init :+ h).sorted
      else buf

    // null skipped to match SQL COUNT(DISTINCT ...) semantics
    override def reduce(buf: Seq[Long], item: String): Seq[Long] =
      if (item == null) buf else insert(buf, hash48(item))

    override def merge(a: Seq[Long], b: Seq[Long]): Seq[Long] =
      (a ++ b).distinct.sorted.take(k)

    override def finish(buf: Seq[Long]): Double =
      if (buf.size < k) buf.size.toDouble
      else (k - 1).toDouble / (buf.last.toDouble / TwoPow48)

    override def bufferEncoder: Encoder[Seq[Long]] =
      org.apache.spark.sql.catalyst.encoders.ExpressionEncoder[Seq[Long]]()
    override def outputEncoder: Encoder[Double] = Encoders.scalaDouble
  }

  /** Column aggregate: KMV distinct estimate of a string column. */
  def kmvDistinct(c: Column, k: Int): Column =
    udaf(KmvDistinct(k), Encoders.STRING).apply(c)

  /** Deterministic Bloom bit position `i` of an item: md5 of
    * "i:item" folded to 48 bits, mod m — engine-reproducible, so a
    * DuckDB oracle recomputes membership exactly. */
  def bloomPositions(item: String, m: Int, k: Int): Seq[Int] =
    (0 until k).map(i => (hash48(s"$i:$item") % m).toInt)

  /** Mergeable Bloom filter as a typed [[Aggregator]]: the buffer is
    * a FIXED-SIZE dense bitset (`Array[Long]` of ceil(m/64) words) —
    * O(k) bit-sets per row, word-wise OR on merge, so cost is
    * O(rows·k + m), independent of distinct-key count. (`udaf` wraps
    * Aggregators as TypedImperativeAggregate: the buffer lives as one
    * mutable object per group and only serializes at the partial/final
    * boundary, so in-place mutation is the intended fast path.) The
    * OUTPUT is still the sorted set-bit position list, directly
    * queryable with `array_contains` — contract unchanged. The
    * standard shuffle-free semi-join prune at 100 TB: aggregate the
    * small side's keys into one Bloom row, broadcast it, and filter
    * the big side map-side with [[bloomPositions]] membership before
    * any join. Nulls are skipped (SQL distinct semantics, like KMV).
    */
  final case class BloomAgg(m: Int, k: Int)
      extends Aggregator[String, Array[Long], Seq[Int]] {
    require(m > 0 && k > 0)
    override def zero: Array[Long] = new Array[Long]((m + 63) >>> 6)
    override def reduce(buf: Array[Long], item: String): Array[Long] = {
      if (item != null) {
        var i = 0
        while (i < k) {
          val pos = (hash48(s"$i:$item") % m).toInt // same bits as bloomPositions
          buf(pos >>> 6) |= 1L << (pos & 63)
          i += 1
        }
      }
      buf
    }
    override def merge(a: Array[Long], b: Array[Long]): Array[Long] = {
      var i = 0
      while (i < a.length) { a(i) |= b(i); i += 1 }
      a
    }
    override def finish(buf: Array[Long]): Seq[Int] = {
      val out = Vector.newBuilder[Int]
      var w = 0
      while (w < buf.length) {
        var bits = buf(w)
        while (bits != 0L) {
          out += (w << 6) + java.lang.Long.numberOfTrailingZeros(bits)
          bits &= bits - 1
        }
        w += 1
      }
      out.result()
    }
    override def bufferEncoder: Encoder[Array[Long]] =
      org.apache.spark.sql.catalyst.encoders.ExpressionEncoder[Array[Long]]()
    override def outputEncoder: Encoder[Seq[Int]] =
      org.apache.spark.sql.catalyst.encoders.ExpressionEncoder[Seq[Int]]()
  }

  /** Column aggregate: Bloom bit-position set of a string column. */
  def bloomBits(c: Column, m: Int, k: Int): Column =
    udaf(BloomAgg(m, k), Encoders.STRING).apply(c)

  /** Count-Min Sketch (Cormode & Muthukrishnan 2005): a d×w counter
    * matrix — row i's bucket for an item is hash48("i:item") mod w,
    * every matching counter increments, and a point estimate is the
    * MIN over the d counters (never an underestimate; overestimates
    * bounded by ‖f‖₁·e/w with probability 1−e^(−d)). The buffer is
    * the flat d·w long array: O(d) adds per row, element-wise SUM on
    * merge — fully merge-associative, so the aggregate is map-side
    * combinable and partition-count invariant like [[BloomAgg]].
    * The 100 TB posture: one CMS row summarizes a token stream's
    * frequencies in d·w longs regardless of vocabulary size — the
    * bounded-memory stand-in for an exact groupBy count when only
    * point lookups / heavy-hitter checks are needed. Deterministic
    * md5 bucketing → a DuckDB oracle replays every estimate exactly,
    * collisions and all. Nulls are skipped (KMV/Bloom convention). */
  final case class CmsAgg(d: Int, w: Int)
      extends Aggregator[String, Array[Long], Seq[Long]] {
    require(d > 0 && w > 0)
    override def zero: Array[Long] = new Array[Long](d * w)
    override def reduce(buf: Array[Long], item: String): Array[Long] = {
      if (item != null) {
        var i = 0
        while (i < d) {
          buf(i * w + (hash48(s"$i:$item") % w).toInt) += 1L
          i += 1
        }
      }
      buf
    }
    override def merge(a: Array[Long], b: Array[Long]): Array[Long] = {
      var i = 0
      while (i < a.length) { a(i) += b(i); i += 1 }
      a
    }
    override def finish(buf: Array[Long]): Seq[Long] =
      // defensive copy — the buffer is the aggregator's mutable
      // scratch; wrapping it unsafely would alias live state into
      // the output row (Bloom/KMV likewise emit fresh collections)
      buf.toSeq
    override def bufferEncoder: Encoder[Array[Long]] =
      org.apache.spark.sql.catalyst.encoders.ExpressionEncoder[Array[Long]]()
    override def outputEncoder: Encoder[Seq[Long]] =
      org.apache.spark.sql.catalyst.encoders.ExpressionEncoder[Seq[Long]]()
  }

  /** Column aggregate: flat d×w CMS counter row of a string column. */
  def cmsCounters(c: Column, d: Int, w: Int): Column =
    udaf(CmsAgg(d, w), Encoders.STRING).apply(c)

  /** Point-frequency estimate of `item` against a [[cmsCounters]]
    * row: min over the d per-row counters — broadcast the 1-row
    * counter frame and probe map-side. */
  def cmsEstimate(counters: Column, item: Column, d: Int, w: Int): Column =
    (0 until d).map { i =>
      org.apache.spark.sql.functions.element_at(counters,
        (org.apache.spark.sql.functions.lit(i * w) +
          org.apache.spark.sql.functions.pmod(
            hash48Of(org.apache.spark.sql.functions.concat(
              org.apache.spark.sql.functions.lit(s"$i:"), item)),
            org.apache.spark.sql.functions.lit(w.toLong)).cast("int") +
          org.apache.spark.sql.functions.lit(1)).cast("int"))
    }.reduce(org.apache.spark.sql.functions.least(_, _))

  /** Column API: the sketch tier's 48-bit md5 hash of a string —
    * per-row membership probes against [[bloomBits]] sets. */
  def hash48Of(c: Column): Column =
    org.apache.spark.sql.GraftColumnBridge.column(
      Hash48Expr(org.apache.spark.sql.GraftColumnBridge.expression(c)))
}

/** hash48 as a native expression (one md5 + fold per row). */
case class Hash48Expr(
    child: org.apache.spark.sql.catalyst.expressions.Expression)
    extends org.apache.spark.sql.catalyst.expressions.UnaryExpression
    with org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback {
  override def dataType: org.apache.spark.sql.types.DataType =
    org.apache.spark.sql.types.LongType
  override def nullSafeEval(s: Any): Any =
    Sketch.hash48(s.asInstanceOf[org.apache.spark.unsafe.types.UTF8String].toString)
  override protected def withNewChildInternal(
      c: org.apache.spark.sql.catalyst.expressions.Expression): Hash48Expr =
    copy(child = c)
  override def prettyName: String = "graft_hash48"
}
