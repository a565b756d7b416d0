package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.GraftSqlBridge
import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
import org.apache.spark.sql.catalyst.expressions.{ExpectsInputTypes, Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Distinct word n-gram shingles of a text column, as one JVM call per row.
  *
  * Semantics (kept in exact sync with the DuckDB oracle SQL and the previous
  * HOF formulation): lowercase → split on space runs → drop empties → join
  * every n consecutive tokens with a single space → distinct, first-occurrence
  * order. Requires ≥ n tokens (callers pre-filter; fewer ⇒ empty array).
  *
  * Why an Expression and not `transform`/`filter`/`array_distinct`: Spark's
  * higher-order functions evaluate their lambdas interpreted, per element —
  * profiled at ~2 ms per document here, serializing the whole dedup tier.
  * This is CodegenFallback (one virtual call per row), which is irrelevant at
  * per-row granularity; the inner loop is plain JVM string work.
  */
case class ShingleSet(child: Expression, n: Int)
    extends UnaryExpression with ExpectsInputTypes with CodegenFallback {
  override def dataType: DataType = ArrayType(StringType, containsNull = false)
  override def inputTypes = Seq(StringType)

  override def nullSafeEval(v: Any): Any = {
    // Locale.ROOT: locale-sensitive toLowerCase would diverge from Spark's
    // locale-independent lower() (and the DuckDB oracle) under e.g. a
    // Turkish default JVM locale ('I' → 'ı'), breaking the dedup tier's
    // bit-equality contract.
    val toks = v.asInstanceOf[UTF8String].toString
      .toLowerCase(java.util.Locale.ROOT).split(" +").filter(_.nonEmpty)
    if (toks.length < n) return new GenericArrayData(Array.empty[Any])
    val seen = new java.util.LinkedHashSet[String]()
    var i = 0
    while (i <= toks.length - n) {
      val sb = new java.lang.StringBuilder(toks(i))
      var j = 1
      while (j < n) { sb.append(' ').append(toks(i + j)); j += 1 }
      seen.add(sb.toString)
      i += 1
    }
    val out = new Array[Any](seen.size())
    val it = seen.iterator()
    var k = 0
    while (it.hasNext) { out(k) = UTF8String.fromString(it.next()); k += 1 }
    new GenericArrayData(out)
  }

  override protected def withNewChildInternal(newChild: Expression): ShingleSet = copy(child = newChild)
}

object ShingleSet {
  def apply(c: Column, n: Int = 3): Column =
    GraftSqlBridge.column(ShingleSet(GraftSqlBridge.expression(c), n))
}
