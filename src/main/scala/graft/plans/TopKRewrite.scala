package graft.plans

import graft.functions.TopKRows
import org.apache.spark.sql.catalyst.expressions._
import org.apache.spark.sql.catalyst.plans.logical._
import org.apache.spark.sql.catalyst.rules.Rule
import org.apache.spark.sql.types.{DoubleType, IntegerType, StringType, StructField, StructType}

/** Optimizer rewrite: `row_number() OVER (PARTITION BY g ORDER BY ord DESC,
  * tie ASC) <= k` → the [[graft.functions.TopKRows]] bounded-heap aggregate.
  *
  * The declarative window form ranks EVERY row of every group: each map task
  * ships its full share of each group through the exchange (Spark's own
  * `InferWindowGroupLimit` trims that to k per group per task, but still by
  * sorting each partition and still re-sorting after the shuffle). The heap
  * aggregate maintains k entries per group with no sort at all and shuffles
  * exactly one k-bounded buffer per group per map task — the plan this
  * engine would hand-write (`q37_topk_pergroup`), produced automatically
  * from the query a user would naturally write.
  *
  * Fires only on an exactly-provable shape (anything else is left to the
  * window machinery):
  *  - filter is `rn <= <int literal>` on the row_number output itself;
  *  - the window computes ONLY that row_number, partitioned by a single
  *    attribute, ordered by exactly (ord: double DESC, tie: string ASC);
  *  - ord and tie are non-nullable (the heap drops null entries, while
  *    row_number would rank them — restricting to non-nullable inputs makes
  *    the two provably identical; ties among duplicate rows yield the same
  *    output multiset either way);
  *  - the window's child outputs exactly {g, ord, tie}, so no other column
  *    has to survive the aggregation.
  * The replacement re-aliases its outputs to the ORIGINAL exprIds, so parent
  * operators (sorts, projects) are untouched. Registered through
  * [[GraftExtensions]]; plan change + unchanged results are asserted in
  * PlanAuditSpec and on the driver gate (`q38_topk_rewrite` vs a
  * ROW_NUMBER() oracle).
  */
object TopKRewrite extends Rule[LogicalPlan] {

  override def apply(plan: LogicalPlan): LogicalPlan = plan.transformUp {
    case f @ Filter(LessThanOrEqual(rnAttr: Attribute, IntegerLiteral(k)), w: Window)
        if k > 0 => matchWindow(w, rnAttr, k).getOrElse(f)
  }

  private def matchWindow(w: Window, rnAttr: Attribute, k: Int): Option[LogicalPlan] = {
    (w.windowExpressions, w.partitionSpec) match {
      case (Seq(alias @ Alias(WindowExpression(RowNumber(), spec), _)), Seq(g: Attribute))
          if alias.exprId == rnAttr.exprId =>
        spec.orderSpec match {
          case Seq(
              SortOrder(ord: Attribute, Descending, _, _),
              SortOrder(tie: Attribute, Ascending, _, _))
              if ord.dataType == DoubleType && !ord.nullable
                && tie.dataType == StringType && !tie.nullable
                && w.child.output.map(_.exprId).toSet == Set(g, ord, tie).map(_.exprId) =>
            Some(rewrite(w.child, g, ord, tie, rnAttr, k, w.output))
          case _ => None
        }
      case _ => None
    }
  }

  /** Build Aggregate(TopKRows) → Generate(PosExplode) → Project, with the
    * project re-aliasing each computed column to the original output's
    * exprId (parents keep resolving).
    */
  private def rewrite(child: LogicalPlan, g: Attribute, ord: Attribute, tie: Attribute,
      rnAttr: Attribute, k: Int, originalOutput: Seq[Attribute]): LogicalPlan = {
    val topAlias = Alias(
      TopKRows(ord, tie, Literal(k)).toAggregateExpression(), "graft_top")()
    val agg = Aggregate(Seq(g), Seq(g, topAlias), child)

    val entryType = StructType(Seq(
      StructField("ord", DoubleType, nullable = false),
      StructField("payload", StringType, nullable = false)))
    val posAttr = AttributeReference("pos", IntegerType, nullable = false)()
    val colAttr = AttributeReference("col", entryType, nullable = false)()
    val gen = Generate(PosExplode(topAlias.toAttribute),
      unrequiredChildIndex = Nil, outer = false, qualifier = None,
      generatorOutput = Seq(posAttr, colAttr), agg)

    val projList: Seq[NamedExpression] = originalOutput.map { a =>
      if (a.exprId == g.exprId) g
      else if (a.exprId == ord.exprId)
        Alias(GetStructField(colAttr, 0, Some("ord")), a.name)(exprId = a.exprId)
      else if (a.exprId == tie.exprId)
        Alias(GetStructField(colAttr, 1, Some("payload")), a.name)(exprId = a.exprId)
      else // rnAttr: posexplode is 0-based, row_number 1-based, both ints
        Alias(Add(posAttr, Literal(1)), a.name)(exprId = a.exprId)
    }
    Project(projList, gen)
  }
}
