package graft.functions

import org.apache.spark.sql.{Encoder, Encoders}
import org.apache.spark.sql.expressions.Aggregator

/** Typed `Aggregator[IN, BUF, OUT]` examples — the idiomatic Spark form of the
  * reference's algebraic reduce UDFs (SURVEY.md §2.1 O6: an associative
  * reduce like word count's sum gains map-side partial aggregation for free
  * when expressed as an Aggregator instead of a value-list reduce).
  */
object TypedAggregators {

  /** Mean + max + count in one pass — the Aggregator form of
    * [[graft.tasks.MonthlyStats]]'s reduce.
    */
  final case class StatsBuf(sum: Double, max: Double, n: Long)
  final case class Stats(mean: Double, max: Double, n: Long)

  object MeanMax extends Aggregator[Double, StatsBuf, Stats] {
    override def zero: StatsBuf = StatsBuf(0.0, Double.NegativeInfinity, 0L)
    override def reduce(b: StatsBuf, v: Double): StatsBuf =
      StatsBuf(b.sum + v, math.max(b.max, v), b.n + 1)
    override def merge(a: StatsBuf, b: StatsBuf): StatsBuf =
      StatsBuf(a.sum + b.sum, math.max(a.max, b.max), a.n + b.n)
    override def finish(b: StatsBuf): Stats = Stats(if (b.n == 0) 0.0 else b.sum / b.n, b.max, b.n)
    override def bufferEncoder: Encoder[StatsBuf] = Encoders.product[StatsBuf]
    override def outputEncoder: Encoder[Stats] = Encoders.product[Stats]
  }

  /** Exact long sum of string-encoded counts — WordCount's reduce as an
    * Aggregator (partial aggregation replaces shipping one pair per
    * occurrence, reference `test/user_tasks.cc:19`).
    */
  object SumCounts extends Aggregator[String, Long, Long] {
    override def zero: Long = 0L
    override def reduce(b: Long, v: String): Long = b + v.toLong
    override def merge(a: Long, b: Long): Long = a + b
    override def finish(b: Long): Long = b
    override def bufferEncoder: Encoder[Long] = Encoders.scalaLong
    override def outputEncoder: Encoder[Long] = Encoders.scalaLong
  }
}
