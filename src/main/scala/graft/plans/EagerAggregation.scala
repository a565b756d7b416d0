package graft.plans

import org.apache.spark.sql.catalyst.expressions._
import org.apache.spark.sql.catalyst.expressions.aggregate._
import org.apache.spark.sql.catalyst.plans.Inner
import org.apache.spark.sql.catalyst.plans.logical._
import org.apache.spark.sql.catalyst.rules.Rule
import org.apache.spark.sql.types.{IntegerType, LongType}

/** Optimizer rewrite: EAGER AGGREGATION (Yan & Larson, VLDB'95) — push
  * partial aggregation BELOW an inner equi-join when the aggregate provably
  * decomposes:
  *
  * {{{
  *   Aggregate(G, count(*)/sum(x), L ⋈_{lk = rk} R)      (G, x from L)
  * =
  *   Aggregate(G, sum(cl·cr) / sum(sl·cr),
  *     Aggregate(G ∪ lk, count(*) as cl, sum(x) as sl, L)
  *       ⋈_{lk = rk}
  *     Aggregate(rk, count(*) as cr, R))
  * }}}
  *
  * Each left (G, key) cell joins `cr(k)` identical right rows, so the
  * joined cell contributes exactly `cl·cr` rows and `sl·cr` to the sums —
  * the identity that lets both inputs collapse to their key-level
  * cardinalities BEFORE the exchange. At scale this turns a fact-sized
  * shuffle-join-then-aggregate into two map-side-combined aggregations
  * joined at key cardinality: the join never sees a fact row. (Spark has
  * no such rule — `PushDownPredicates` moves filters, never aggregates.)
  *
  * Fires only on an exactly-provable shape; anything else is untouched:
  *  - INNER join with a single `lk = rk` equality and no other predicate
  *    (null keys drop identically in both plans: a pre-aggregated null-key
  *    group still fails the equality, exactly like its raw rows did);
  *  - the aggregate sits directly on the join or on an attributes-only
  *    Project of it (the shape column pruning leaves);
  *  - every group attribute and every aggregated column comes from ONE
  *    side (the matcher tries both orientations);
  *  - aggregates are `count(*)` / `sum(int|long)` only, no DISTINCT, no
  *    FILTER. Float/decimal sums are deliberately excluded: re-associating
  *    a double sum changes the IEEE result, and decimal partials widen
  *    precision — both would break the engine's bit-exactness contract;
  *  - `count(*)` is re-emitted as `coalesce(sum(cl·cr), 0)` to preserve
  *    the original's non-nullable type (an inner join feeds every
  *    surviving group ≥ 1 row, so the coalesce never actually fires).
  *
  * The rewrite re-aliases its outputs to the ORIGINAL exprIds, so parents
  * are untouched (the TopKRewrite device), and a rewritten aggregate can
  * never match again (its sums are over products, not attributes) — the
  * fixpoint batch terminates. Registered in [[GraftExtensions]]; plan
  * shape + unchanged results are asserted in PlanAuditSpec, and the driver
  * gate carries `q51_eager_agg` vs a plain join-then-aggregate oracle.
  */
object EagerAggregation extends Rule[LogicalPlan] {

  override def apply(plan: LogicalPlan): LogicalPlan = plan.transformUp {
    case agg @ Aggregate(_, _, join: Join, _) if join.joinType == Inner =>
      rewrite(agg, join).getOrElse(agg)
    case agg @ Aggregate(_, _, Project(projList, join: Join), _)
        if join.joinType == Inner && projList.forall(_.isInstanceOf[Attribute]) =>
      rewrite(agg, join).getOrElse(agg)
  }

  private def rewrite(agg: Aggregate, join: Join): Option[LogicalPlan] = {
    val (aRaw, bRaw) = join.condition match {
      case Some(EqualTo(a: Attribute, b: Attribute)) => (a, b)
      case _ => return None
    }
    // Orient the key pair to the join's children.
    val oriented =
      if (join.left.outputSet.contains(aRaw) && join.right.outputSet.contains(bRaw))
        Some((aRaw, bRaw))
      else if (join.left.outputSet.contains(bRaw) && join.right.outputSet.contains(aRaw))
        Some((bRaw, aRaw))
      else None
    oriented.flatMap { case (lk, rk) =>
      tryOneSide(agg, join.left, lk, join.right, rk)
        .orElse(tryOneSide(agg, join.right, rk, join.left, lk))
    }
  }

  private sealed trait Out
  private case class PassThrough(a: Attribute) extends Out
  private case class CountAll(alias: Alias) extends Out
  private case class SumCol(alias: Alias, x: Attribute) extends Out

  /** `aggSide` carries the groups and aggregated columns; `cntSide` only
    * contributes its per-key cardinality.
    */
  private def tryOneSide(agg: Aggregate, aggSide: LogicalPlan, ak: Attribute,
      cntSide: LogicalPlan, ck: Attribute): Option[LogicalPlan] = {
    val aggSideIds = aggSide.outputSet

    val groupsOpt = agg.groupingExpressions.map {
      case a: Attribute if aggSideIds.contains(a) => Some(a)
      case _ => None
    }
    if (groupsOpt.exists(_.isEmpty)) return None
    val groups = groupsOpt.flatten

    val outsOpt: Seq[Option[Out]] = agg.aggregateExpressions.map {
      case a: Attribute if groups.exists(_.exprId == a.exprId) => Some(PassThrough(a))
      case al @ Alias(ae: AggregateExpression, _) if !ae.isDistinct && ae.filter.isEmpty =>
        ae.aggregateFunction match {
          case Count(Seq(Literal(1, _))) => Some(CountAll(al))
          case Sum(x: Attribute, _)
              if aggSideIds.contains(x) &&
                (x.dataType == LongType || x.dataType == IntegerType) =>
            Some(SumCol(al, x))
          case _ => None
        }
      case _ => None
    }
    if (outsOpt.exists(_.isEmpty)) return None
    val outs = outsOpt.flatten
    if (!outs.exists { case _: CountAll | _: SumCol => true; case _ => false }) return None

    // Pre-aggregate the agg side per (G ∪ key): its count and each sum.
    val keyed: Seq[Attribute] =
      if (groups.exists(_.exprId == ak.exprId)) groups else groups :+ ak
    val clAlias = Alias(Count(Literal(1)).toAggregateExpression(), "graft_cl")()
    val slAliases: Map[ExprId, Alias] = outs.collect { case SumCol(al, x) =>
      al.exprId -> Alias(Sum(x).toAggregateExpression(), s"graft_sl_${al.name}")()
    }.toMap
    val preAgg = Aggregate(keyed, keyed ++ (clAlias +: slAliases.values.toSeq), aggSide)

    // Pre-aggregate the other side to its per-key cardinality.
    val crAlias = Alias(Count(Literal(1)).toAggregateExpression(), "graft_cr")()
    val cntAgg = Aggregate(Seq(ck), Seq(ck, crAlias), cntSide)

    val rejoined = Join(preAgg, cntAgg, Inner, Some(EqualTo(ak, ck)), JoinHint.NONE)

    val cl = clAlias.toAttribute
    val cr = crAlias.toAttribute
    val finalExprs: Seq[NamedExpression] = outs.map {
      case PassThrough(a) => a
      case CountAll(al) =>
        Alias(
          Coalesce(Seq(
            Sum(Multiply(cl, cr)).toAggregateExpression(),
            Literal(0L))),
          al.name)(exprId = al.exprId)
      case SumCol(al, _) =>
        val sl = slAliases(al.exprId).toAttribute
        Alias(Sum(Multiply(sl, cr)).toAggregateExpression(), al.name)(exprId = al.exprId)
    }
    Some(Aggregate(groups, finalExprs, rejoined))
  }
}
