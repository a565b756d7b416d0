package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.GraftSqlBridge
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, ExpectsInputTypes, Expression}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, DoubleType}

/** Sequential dot product of two `array<double>` columns as a codegen'd
  * Catalyst expression: `Σ l[i]·r[i]`, accumulated strictly left-to-right.
  *
  * Semantically identical to
  * `aggregate(zip_with(l, r, (x,y) => x*y), 0.0, (acc,x) => acc + x)` and to
  * DuckDB's `list_reduce([l[i]*r[i] ...], (a,b) -> a+b)` — the same IEEE
  * addition sequence, so results stay bit-identical across engines — but
  * ~20× faster: the HOF formulation is interpreted per element (CodegenFallback
  * with closure dispatch and boxing), which dominated the embedding-pair scan.
  *
  * Assumes non-null elements (callers cast from parquet `array<float>`, which
  * never stores null elements here); a null array yields null.
  */
case class SeqDot(left: Expression, right: Expression)
    extends BinaryExpression with ExpectsInputTypes {
  override def dataType: DataType = DoubleType
  override def inputTypes = Seq(ArrayType(DoubleType), ArrayType(DoubleType))

  override def nullSafeEval(l: Any, r: Any): Any = {
    val a = l.asInstanceOf[ArrayData]
    val b = r.asInstanceOf[ArrayData]
    val n = math.min(a.numElements(), b.numElements())
    var acc = 0.0
    var i = 0
    while (i < n) {
      acc += a.getDouble(i) * b.getDouble(i)
      i += 1
    }
    acc
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (l, r) => {
      val n = ctx.freshName("n")
      val i = ctx.freshName("i")
      val acc = ctx.freshName("acc")
      s"""
         |int $n = java.lang.Math.min($l.numElements(), $r.numElements());
         |double $acc = 0.0;
         |for (int $i = 0; $i < $n; $i++) {
         |  $acc += $l.getDouble($i) * $r.getDouble($i);
         |}
         |${ev.value} = $acc;
       """.stripMargin
    })

  override protected def withNewChildrenInternal(newLeft: Expression, newRight: Expression): SeqDot =
    copy(left = newLeft, right = newRight)
}

object SeqDot {
  def apply(l: Column, r: Column): Column =
    GraftSqlBridge.column(SeqDot(GraftSqlBridge.expression(l), GraftSqlBridge.expression(r)))
}
