package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.GraftSqlBridge
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
import org.apache.spark.sql.catalyst.expressions.{ExpectsInputTypes, Expression, UnaryExpression}
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Within-document n-gram repetition statistics, one JVM pass per row:
  * `struct(total_grams, distinct_grams, top_count)` over the word n-grams of
  * the lowercased, space-split text (the [[ShingleSet]] tokenization contract,
  * kept in exact sync with the DuckDB oracle). Fewer than n tokens ⇒ (0,0,0)
  * — callers filter `total_grams > 0` instead of re-tokenizing upstream.
  *
  * This is the Gopher-style repetitiveness signal an LLM corpus pipeline
  * computes for every document (duplicate-n-gram fraction, dominant-gram
  * share): boilerplate, keyword-stuffed, and template pages score high and
  * get dropped before training. Shape matters at 100 TB: the naive form
  * (explode n-grams → two grouped aggregations) shuffles O(docs × grams)
  * rows twice; this is a narrow projection — zero shuffle, O(doc length)
  * per row, embarrassingly parallel — because the counting hash map lives
  * per document, never across them.
  *
  * CodegenFallback like [[ShingleSet]]: one virtual call per row is noise at
  * per-document granularity, and Spark's higher-order-function alternative
  * evaluates its lambdas interpreted per ELEMENT (profiled ~2 ms/doc in the
  * dedup tier — and it cannot express the per-gram count map at all).
  */
case class RepetitionStats(child: Expression, n: Int)
    extends UnaryExpression with ExpectsInputTypes with CodegenFallback {

  override def dataType: DataType = StructType(Seq(
    StructField("total_grams", LongType, nullable = false),
    StructField("distinct_grams", LongType, nullable = false),
    StructField("top_count", LongType, nullable = false)))
  override def inputTypes = Seq(StringType)

  override def nullSafeEval(v: Any): Any = {
    // Locale.ROOT for the same reason as ShingleSet: locale-sensitive
    // lowercasing would diverge from Spark's lower() and the oracle.
    val toks = v.asInstanceOf[UTF8String].toString
      .toLowerCase(java.util.Locale.ROOT).split(" +").filter(_.nonEmpty)
    if (toks.length < n) return InternalRow(0L, 0L, 0L)
    val counts = new java.util.HashMap[String, Long]()
    var top = 0L
    var i = 0
    while (i <= toks.length - n) {
      val sb = new java.lang.StringBuilder(toks(i))
      var j = 1
      while (j < n) { sb.append(' ').append(toks(i + j)); j += 1 }
      val c = counts.merge(sb.toString, 1L, (a, b) => a + b)
      if (c > top) top = c
      i += 1
    }
    InternalRow((toks.length - n + 1).toLong, counts.size().toLong, top)
  }

  override protected def withNewChildInternal(newChild: Expression): RepetitionStats =
    copy(child = newChild)
}

object RepetitionStats {
  def apply(c: Column, n: Int = 3): Column =
    GraftSqlBridge.column(RepetitionStats(GraftSqlBridge.expression(c), n))
}
