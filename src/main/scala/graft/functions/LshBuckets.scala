package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.GraftSqlBridge
import org.apache.spark.sql.catalyst.expressions.{ExpectsInputTypes, Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types.{ArrayType, DataType, DoubleType, LongType}

/** All hyperplane-LSH bucket keys of a vector in ONE expression node:
  * `out(t)` has bit `p` set iff the left-fold dot product of the vector with
  * plane `t·planesPerTable + p` is ≥ 0 — exactly the per-plane
  * `when(SeqDot(v, plane) >= 0, 1<<p)` composition it replaces, with the same
  * sequential IEEE addition order.
  *
  * Why an expression and not a column composition: the composed form is
  * `tables × planes` SeqDot nodes, each carrying a 64-double literal — a
  * ~4600-literal expression tree that Catalyst re-analyzes and re-optimizes
  * on every query construction, which dominated the ANN query's wall clock
  * (driver-side planning, not execution). Here the plane matrix rides along
  * as plain constructor data: one tree node, constant planning cost.
  * CodegenFallback costs one virtual call per row — irrelevant at per-vector
  * granularity (the inner loops still run as tight JVM code).
  */
case class LshBuckets(child: Expression, planes: IndexedSeq[IndexedSeq[Double]], planesPerTable: Int)
    extends UnaryExpression
    with ExpectsInputTypes
    with CodegenFallback {

  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def inputTypes = Seq(ArrayType(DoubleType))

  @transient private lazy val planeArr: Array[Array[Double]] = planes.map(_.toArray).toArray

  override def nullSafeEval(v: Any): Any = {
    val a = v.asInstanceOf[ArrayData]
    val dims = a.numElements()
    val nTables = planeArr.length / planesPerTable
    val out = new Array[Long](nTables)
    var t = 0
    while (t < nTables) {
      var key = 0L
      var p = 0
      while (p < planesPerTable) {
        val plane = planeArr(t * planesPerTable + p)
        val n = math.min(dims, plane.length)
        var dot = 0.0
        var i = 0
        while (i < n) { dot += a.getDouble(i) * plane(i); i += 1 }
        if (dot >= 0) key |= (1L << p)
        p += 1
      }
      out(t) = key
      t += 1
    }
    new GenericArrayData(out)
  }

  override protected def withNewChildInternal(newChild: Expression): LshBuckets =
    copy(child = newChild)
}

object LshBuckets {
  def apply(v: Column, planes: IndexedSeq[IndexedSeq[Double]], planesPerTable: Int): Column =
    GraftSqlBridge.column(LshBuckets(GraftSqlBridge.expression(v), planes, planesPerTable))
}
