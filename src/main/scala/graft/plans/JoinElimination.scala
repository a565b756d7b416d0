package graft.plans

import org.apache.spark.sql.catalyst.expressions._
import org.apache.spark.sql.catalyst.plans.{Cross, Inner, LeftAnti, LeftOuter, LeftSemi, RightOuter}
import org.apache.spark.sql.catalyst.plans.logical._
import org.apache.spark.sql.catalyst.rules.Rule
import org.apache.spark.sql.execution.datasources.{HadoopFsRelation, LogicalRelation}

/** Optimizer rewrite: PK-FK join elimination under declared (RELY)
  * referential-integrity constraints — the classic warehouse optimizer
  * feature (Oracle/DB2/Snowflake "informational constraints"): an inner
  * join `fact ⋈ dim ON fact.fk = dim.pk` whose consumer references NO dim
  * column is the identity on fact when
  *
  *  1. `pk` is unique in dim (the join cannot duplicate fact rows),
  *  2. every non-null `fk` has a match (the join cannot drop fact rows),
  *  3. `fk` is never null (an inner join drops null-FK rows; elimination
  *     would keep them).
  *
  * Spark has no constraint metadata, so the engine carries its own RELY
  * registry below: constraints are DECLARED, not enforced — exactly the
  * lakehouse posture, where enforcement at 100 TB write rates is
  * unaffordable but the optimizer wins (dropping a dimension-table scan +
  * broadcast/shuffle PER QUERY) are not. The declaration's truth is itself
  * driver-checked end-to-end: `q49_join_elim`'s oracle RUNS the join in
  * DuckDB, so the hash gate fails if any constraint is violated on data.
  *
  * Fires only on an exactly-provable shape (the [[TopKRewrite]] doctrine):
  * the join is Inner with a single `fk = pk` equality; the dim side is a
  * BARE parent-table scan under at most attribute-only Projects (column
  * pruning's residue — a Filter/Aggregate/Join there could change
  * multiplicity); the consumer (Project or Aggregate directly above)
  * references nothing from the dim side. At 100 TB this is the difference
  * between scanning only the fact table and paying a dimension broadcast —
  * or, pre-AQE, a shuffle — on every dashboard query a BI layer generates
  * against a star schema (such generated SQL habitually joins every
  * dimension regardless of use; elimination is what makes that free).
  */
object JoinElimination extends Rule[LogicalPlan] {

  /** RELY registry: (fk table, fk column, parent table, pk column). FK
    * columns are additionally declared non-null. Table identity = the
    * parquet file name of the scan (the engine's table layer,
    * `sources/Tables.scala`). The SAME sequence drives the nightly audit
    * (`dq_referential`, `operators/Quality.scala`) — one source of truth,
    * so the optimizer can never rely on a constraint the auditor does not
    * check.
    */
  val Declared: Seq[(String, String, String, String)] = Seq(
    ("lineitem", "l_orderkey", "orders", "o_orderkey"),
    ("lineitem", "l_partkey", "part", "p_partkey"),
    ("lineitem", "l_suppkey", "supplier", "s_suppkey"),
    ("orders", "o_custkey", "customer", "c_custkey"),
    ("customer", "c_nationkey", "nation", "n_nationkey"),
    ("supplier", "s_nationkey", "nation", "n_nationkey"),
    ("nation", "n_regionkey", "region", "r_regionkey"))

  /** FK column name → (FK table, parent table, PK column), the rule's
    * lookup form. The FK table matters as much as the parent: the declared
    * constraint holds for values OF THAT TABLE'S COLUMN, so the rule must
    * prove the kept side's FK attribute actually carries them (lineage
    * check below), not merely shares the name.
    */
  val Constraints: Map[String, (String, String, String)] =
    Declared.map { case (ft, fk, pt, pk) => fk -> ((ft, pt, pk)) }.toMap

  override def apply(plan: LogicalPlan): LogicalPlan = plan.transformUp {
    case p @ Project(_, j: Join) =>
      eliminate(p.references, j).map(keep => p.copy(child = keep)).getOrElse(p)
    case a @ Aggregate(_, _, j: Join, _) =>
      eliminate(a.references, j).map(keep => a.copy(child = keep)).getOrElse(a)
  }

  private def eliminate(refs: AttributeSet, j: Join): Option[LogicalPlan] = j match {
    case Join(l, r, Inner, Some(EqualTo(x: Attribute, y: Attribute)), _) =>
      trySide(refs, l, r, x, y).orElse(trySide(refs, r, l, x, y))
    case _ => None
  }

  /** `keep` if `drop` is a bare registered parent scan joined pk = fk,
    * nothing above references it, AND the kept side's FK attribute provably
    * carries values of the DECLARED child table's column (lineage check —
    * a same-named alias on an unrelated table, or an FK null-extended by an
    * upstream outer join, must decline: the real inner join would change
    * those rows and elimination would silently keep them).
    */
  private def trySide(refs: AttributeSet, keep: LogicalPlan, drop: LogicalPlan,
      x: Attribute, y: Attribute): Option[LogicalPlan] = {
    val (fk, pk) = if (drop.outputSet.contains(x)) (y, x) else (x, y)
    if (drop.outputSet.contains(pk) && keep.outputSet.contains(fk)
      && Constraints.get(fk.name).exists { case (ftab, ptab, pcol) =>
        pk.name == pcol && parentTableOf(drop).contains(ptab) &&
          childTableOf(keep, fk).contains(ftab)
      }
      && refs.intersect(drop.outputSet).isEmpty) Some(keep)
    else None
  }

  /** The parquet table name of a bare scan, looking through attribute-only
    * Projects; None for any shape that could change row multiplicity.
    */
  private def parentTableOf(p: LogicalPlan): Option[String] = p match {
    case Project(ps, child) if ps.forall(_.isInstanceOf[AttributeReference]) =>
      parentTableOf(child)
    case lr: LogicalRelation => scanTableOf(lr)
    case _ => None
  }

  /** The parquet table the attribute `a`'s VALUES come from, tracing only
    * through operators that preserve them row-wise: attribute/alias-of-
    * attribute Projects, Filters, and the non-null-extended side of a join
    * (inner/cross both sides; left-outer/semi/anti left only; right-outer
    * right only). Anything else — a full outer join, the nullable side of
    * an outer join, a computed alias, a generator, a union — returns None
    * and the rule declines: those shapes can introduce NULLs or values the
    * declared constraint never covered. Unlike [[parentTableOf]] this does
    * NOT care about multiplicity (duplicating or dropping kept rows keeps
    * every surviving fk a genuine child-table value, which is all
    * soundness needs on the kept side).
    */
  private def childTableOf(p: LogicalPlan, a: Attribute): Option[String] = p match {
    case Project(ps, child) =>
      ps.find(_.toAttribute.exprId == a.exprId).flatMap {
        case ar: AttributeReference => childTableOf(child, ar)
        case Alias(ar: AttributeReference, _) => childTableOf(child, ar)
        case _ => None
      }
    case Filter(_, child) => childTableOf(child, a)
    case SubqueryAlias(_, child) => childTableOf(child, a)
    case Join(l, r, jt, _, _) =>
      val fromLeft = l.outputSet.contains(a)
      val valuePreserved = jt match {
        case Inner | Cross => true
        case LeftOuter | LeftSemi | LeftAnti => fromLeft
        case RightOuter => !fromLeft
        case _ => false
      }
      if (valuePreserved) childTableOf(if (fromLeft) l else r, a) else None
    case lr: LogicalRelation if lr.outputSet.contains(a) => scanTableOf(lr)
    case _ => None
  }

  /** The single-file parquet table name behind a scan (the engine's table
    * layer, `sources/Tables.scala`); None for any other relation.
    */
  private def scanTableOf(lr: LogicalRelation): Option[String] = lr.relation match {
    case fs: HadoopFsRelation =>
      fs.location.rootPaths.toList match {
        case one :: Nil if one.getName.endsWith(".parquet") =>
          Some(one.getName.stripSuffix(".parquet"))
        case _ => None
      }
    case _ => None
  }
}
