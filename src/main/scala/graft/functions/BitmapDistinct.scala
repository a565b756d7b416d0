package graft.functions

import org.apache.spark.sql.{Column, Encoder, Encoders}
import org.apache.spark.sql.catalyst.encoders.ExpressionEncoder
import org.apache.spark.sql.expressions.Aggregator
import org.apache.spark.sql.functions.udaf

/** Exact distinct counting via mergeable fixed-width bitmaps — the
  * bitmap-index aggregation pattern (ClickHouse `groupBitmap`, Doris
  * `BITMAP_UNION`): ids are sharded into segments of 2^[[BitmapDistinct.SegBits]]
  * consecutive values, each segment's presence set is a flat `Array[Long]`
  * bit vector, and the aggregation is a word-wise OR — associative and
  * commutative, so Spark runs it as a map-side partial aggregation.
  *
  * Why this beats `count(distinct)` at 100 TB: exact distinct over a shuffle
  * ships one row per distinct id per partition (the Expand/regroup plan);
  * the bitmap ships AT MOST one fixed-size buffer per (group, segment) per
  * map task, regardless of how many ids hit that segment — for dense id
  * domains (user ids, document ids) that is orders of magnitude less shuffle
  * volume. The segment key keeps each buffer bounded (2^SegBits bits), so
  * sparse/huge domains degrade to more segments, never to bigger buffers,
  * and the per-group final count is an exact Σ popcount per segment.
  *
  * Reference scope: the reference's only aggregation is the word-count
  * reduce (`test/user_tasks.cc:19-34`); this is a north-star extension of
  * the same algebraic-reduce shape (SURVEY.md §2.1 O6) with a set-valued
  * accumulator.
  *
  * Determinism: the bitmap is a pure set — OR order never matters — and the
  * popcount is exact, so the result hash-matches DuckDB's
  * `COUNT(DISTINCT ...)` bit-for-bit.
  */
object BitmapDistinct {

  /** log2 of the segment width. 8 here (4-word / 32-byte buffers) so the
    * test corpus' id domain genuinely spans multiple segments; a production
    * deployment over dense 64-bit ids would use 16 (8 KiB buffers) — the
    * trade is buffer size vs segment-key cardinality, and the aggregation
    * is exact at any setting.
    */
  val SegBits = 8
  val SegWords: Int = (1 << SegBits) / 64

  /** IN = offset of the id within its segment (0 until 2^SegBits). */
  object Agg extends Aggregator[Int, Array[Long], Long] {
    override def zero: Array[Long] = new Array[Long](SegWords)
    override def reduce(b: Array[Long], off: Int): Array[Long] = {
      b(off >>> 6) |= 1L << (off & 63)
      b
    }
    override def merge(a: Array[Long], b: Array[Long]): Array[Long] = {
      var i = 0
      while (i < SegWords) { a(i) |= b(i); i += 1 }
      a
    }
    override def finish(b: Array[Long]): Long = {
      var n = 0L
      var i = 0
      while (i < SegWords) { n += java.lang.Long.bitCount(b(i)); i += 1 }
      n
    }
    override def bufferEncoder: Encoder[Array[Long]] = ExpressionEncoder[Array[Long]]()
    override def outputEncoder: Encoder[Long] = Encoders.scalaLong
  }

  private lazy val fn = udaf(Agg, Encoders.scalaInt)

  /** Popcount of the segment bitmap over `off` (the in-segment offset). */
  def bitmapCount(off: Column): Column = fn(off)
}
