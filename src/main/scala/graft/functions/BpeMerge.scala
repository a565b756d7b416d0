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
    val syms = new Array[UTF8String](in.numElements())
    var i = 0
    while (i < syms.length) { syms(i) = in.getUTF8String(i); i += 1 }
    new GenericArrayData(BpeMerge.rewrite(syms,
      av.asInstanceOf[UTF8String], bv.asInstanceOf[UTF8String]).asInstanceOf[Array[Any]])
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

  /** One left-to-right rewrite pass shared by [[BpeMerge]] and [[BpeApply]]. */
  private[functions] def rewrite(in: Array[UTF8String], a: UTF8String, b: UTF8String): Array[UTF8String] = {
    val out = new java.util.ArrayList[UTF8String](in.length)
    var i = 0
    while (i < in.length) {
      if (i + 1 < in.length && a.equals(in(i)) && b.equals(in(i + 1))) {
        out.add(UTF8String.concat(a, b))
        i += 2
      } else {
        out.add(in(i))
        i += 1
      }
    }
    out.toArray(new Array[UTF8String](out.size()))
  }
}

/** BPE ENCODE: apply a whole trained merge table (rank-ordered
  * `array<struct<a string, b string>>`) to a symbol array — the tokenizer
  * application that prices a corpus under a learned vocab. Applying each
  * merge once, in rank order, with one left-to-right pass each is complete:
  * a merge of (s, t) can never create a NEW adjacent (s, t) occurrence
  * (that would need st = s or st = t, impossible for non-empty symbols), so
  * no fixpoint loop per merge is required — the same single-pass rule the
  * trainer's per-round rewrite uses, which is what makes encode(w) land on
  * exactly the trainer's final symbol state for in-vocabulary words.
  */
case class BpeApply(left: Expression, right: Expression)
    extends org.apache.spark.sql.catalyst.expressions.BinaryExpression
    with ExpectsInputTypes
    with CodegenFallback {

  override def dataType: DataType = ArrayType(StringType, containsNull = false)
  override def inputTypes = Seq(
    ArrayType(StringType),
    ArrayType(org.apache.spark.sql.types.StructType(Seq(
      org.apache.spark.sql.types.StructField("a", StringType),
      org.apache.spark.sql.types.StructField("b", StringType)))))

  override def nullSafeEval(symsV: Any, mergesV: Any): Any = {
    val symsIn = symsV.asInstanceOf[ArrayData]
    var syms = new Array[UTF8String](symsIn.numElements())
    var i = 0
    while (i < syms.length) { syms(i) = symsIn.getUTF8String(i); i += 1 }
    val merges = mergesV.asInstanceOf[ArrayData]
    var m = 0
    while (m < merges.numElements()) {
      val row = merges.getStruct(m, 2)
      syms = BpeMerge.rewrite(syms, row.getUTF8String(0), row.getUTF8String(1))
      m += 1
    }
    new GenericArrayData(syms.asInstanceOf[Array[Any]])
  }

  override protected def withNewChildrenInternal(newLeft: Expression, newRight: Expression): BpeApply =
    copy(left = newLeft, right = newRight)
}

object BpeApply {
  def apply(syms: Column, merges: Column): Column = {
    import org.apache.spark.sql.GraftSqlBridge
    GraftSqlBridge.column(BpeApply(
      GraftSqlBridge.expression(syms),
      GraftSqlBridge.expression(merges)))
  }
}
