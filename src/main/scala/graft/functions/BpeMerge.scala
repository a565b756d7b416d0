package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{ExpectsInputTypes, Expression, TernaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types.{ArrayType, DataType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** One BPE merge step as a native expression: replace every adjacent
  * occurrence of the symbol pair (a, b) in a symbol array with the merged
  * symbol `ab`, scanning left-to-right non-overlapping (the classic
  * Sennrich-BPE rewrite — in "aaa" with pair (a,a) the FIRST two symbols
  * merge and the third survives).
  *
  * A native expression rather than an `aggregate()` HOF fold: the rewrite
  * runs once per vocabulary entry per merge round on the training hot path,
  * and interpreted per-element lambdas are the measured 100× cliff the
  * engine's other per-row kernels ([[Winnow]], [[ShingleSet]]) already
  * avoid. CodegenFallback costs one virtual call per ROW (not per element)
  * — the same trade as [[Md5Long]].
  */
case class BpeMerge(first: Expression, second: Expression, third: Expression)
    extends TernaryExpression
    with ExpectsInputTypes
    with CodegenFallback {

  override def dataType: DataType = ArrayType(StringType, containsNull = false)
  override def inputTypes = Seq(ArrayType(StringType), StringType, StringType)

  override def nullSafeEval(arr: Any, av: Any, bv: Any): Any = {
    val in = arr.asInstanceOf[ArrayData]
    val a = av.asInstanceOf[UTF8String]
    val b = bv.asInstanceOf[UTF8String]
    val n = in.numElements()
    val out = new java.util.ArrayList[UTF8String](n)
    var i = 0
    while (i < n) {
      val cur = in.getUTF8String(i)
      if (i + 1 < n && a.equals(cur) && b.equals(in.getUTF8String(i + 1))) {
        out.add(UTF8String.concat(a, b))
        i += 2
      } else {
        out.add(cur)
        i += 1
      }
    }
    new GenericArrayData(out.toArray)
  }

  override protected def withNewChildrenInternal(
      newFirst: Expression, newSecond: Expression, newThird: Expression): BpeMerge =
    copy(first = newFirst, second = newSecond, third = newThird)
}

object BpeMerge {
  def apply(arr: Column, a: Column, b: Column): Column = {
    import org.apache.spark.sql.GraftSqlBridge
    GraftSqlBridge.column(BpeMerge(
      GraftSqlBridge.expression(arr),
      GraftSqlBridge.expression(a),
      GraftSqlBridge.expression(b)))
  }
}
