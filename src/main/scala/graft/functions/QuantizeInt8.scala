package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.GraftSqlBridge
import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, ExpectsInputTypes, Expression}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types.{ArrayType, DataType, DoubleType, IntegerType}

/** Int8 vector quantization: `q[i] = floor(v[i] * 127 / norm + 0.5)` — the
  * norm-scaled round-half-up code a vector store keeps in place of the float
  * vector (64 bytes instead of 256/512 per 64-dim embedding; dot products on
  * int8 codes then run in SIMD integer units).
  *
  * `floor(x + 0.5)` instead of `round(x)`: round's half-away-from-zero /
  * half-even behavior differs between engines, while floor of a double is a
  * single correctly-rounded IEEE op everywhere. Same reason the expression
  * takes the norm as an ARGUMENT instead of computing it: the caller derives
  * it via [[SeqDot]] so both engines share one addition sequence.
  *
  * One JVM call per row looping the 64 elements (CodegenFallback — same
  * posture as [[ShingleSet]]); a null array or null norm yields null.
  * Division by a zero norm is the caller's concern (no real embedding has
  * one; the result would be the platform's ±Infinity → floor semantics in
  * both engines anyway).
  */
case class QuantizeInt8(left: Expression, right: Expression)
    extends BinaryExpression with ExpectsInputTypes with CodegenFallback {
  override def dataType: DataType = ArrayType(IntegerType, containsNull = false)
  override def inputTypes = Seq(ArrayType(DoubleType), DoubleType)

  override def nullSafeEval(l: Any, r: Any): Any = {
    val v = l.asInstanceOf[ArrayData]
    val nrm = r.asInstanceOf[Double]
    val n = v.numElements()
    val out = new Array[Int](n)
    var i = 0
    while (i < n) {
      out(i) = math.floor(v.getDouble(i) * 127.0 / nrm + 0.5).toInt
      i += 1
    }
    new GenericArrayData(out)
  }

  override protected def withNewChildrenInternal(newLeft: Expression, newRight: Expression): QuantizeInt8 =
    copy(left = newLeft, right = newRight)
}

object QuantizeInt8 {
  def apply(vec: Column, norm: Column): Column =
    GraftSqlBridge.column(QuantizeInt8(GraftSqlBridge.expression(vec), GraftSqlBridge.expression(norm)))
}
