package graft.plans


import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.expressions._
import org.apache.spark.sql.catalyst.expressions.aggregate._
import org.apache.spark.sql.catalyst.plans.logical.{Aggregate, LogicalPlan, Project}
import org.apache.spark.sql.catalyst.rules.Rule
import org.apache.spark.sql.execution.datasources.{HadoopFsRelation, LogicalRelation}
import org.apache.spark.sql.functions._

/** Materialized aggregate views + the optimizer rule that reroutes matching
  * aggregate queries onto them ("aggregate navigation").
  *
  * The 100 TB story: recurring reporting aggregates re-scan the same fact
  * table for every dashboard refresh. A materialized view holds the
  * DECOMPOSABLE partial state (count / sum / min / max per grouping key),
  * maintained offline; any aggregate over a SUBSET of the view's keys whose
  * functions are all re-aggregable then reads the view — GBs — instead of
  * the base table — TBs. The rule proves the substitution, the user query
  * text never changes, and the driver-gate oracle recomputes from the BASE
  * table, so a hash-match is end-to-end evidence the rerouted plan is
  * semantically identical (`mv_agg_reroute`).
  *
  * Fires only on an exactly-provable shape (anything else stays on the base
  * table):
  *  - the aggregate's child is the registered base-table parquet scan
  *    (optionally under a column-pruning Project of plain attributes —
  *    no Filter: a row-level predicate invalidates pre-aggregation);
  *  - every grouping expression is a plain attribute among the view's keys
  *    (a PROPER subset rolls partials up — the cube-navigation case);
  *  - grouping is non-empty (a global aggregate over an EMPTY base returns
  *    one row, but an empty view would return zero — declined rather than
  *    special-cased);
  *  - every aggregate is non-distinct, unfiltered count(*) / sum / min /
  *    max over a registered measure: count(*) → SUM(cnt), sum → SUM(sum_m),
  *    min → MIN(min_m), max → MAX(max_m). count(col), avg, distinct and
  *    expression-wrapped measures decline.
  * The rewritten Aggregate re-aliases every output to the ORIGINAL exprIds,
  * so parent operators are untouched ([[TopKRewrite]]'s contract).
  */
object MatViews {

  /** A registered view: pre-aggregated `mvPath` parquet for `basePath`,
    * grouped by `keys`, with partial count/sum/min/max per `measures`.
    */
  final case class View(basePath: String, mvPath: String, keys: Seq[String], measures: Seq[String])

  val CntCol = "graft_mv_cnt"
  def sumCol(m: String): String = s"graft_mv_sum_$m"
  def minCol(m: String): String = s"graft_mv_min_$m"
  def maxCol(m: String): String = s"graft_mv_max_$m"

  /** Registry keyed by the base path's normalized URI path. Process-global
    * (one registry per JVM, like the session extension itself), bounded:
    * gate/bench loops register a fresh per-invocation tmp base each pass
    * and never revisit the old one, so the eldest entries are dead weight —
    * an LRU cap keeps the registry from growing for the JVM's lifetime.
    */
  private val MaxViews = 64
  private val views = java.util.Collections.synchronizedMap(
    new java.util.LinkedHashMap[String, View](16, 0.75f, true) {
      override def removeEldestEntry(e: java.util.Map.Entry[String, View]): Boolean =
        size() > MaxViews
    })

  private def norm(p: String): String =
    new org.apache.hadoop.fs.Path(p).toUri.getPath

  def register(v: View): Unit = views.put(norm(v.basePath), v)
  def unregister(basePath: String): Unit = views.remove(norm(basePath))
  def clear(): Unit = views.clear()

  private[plans] def lookup(rootPaths: Seq[org.apache.hadoop.fs.Path]): Option[View] =
    rootPaths match {
      case Seq(p) => Option(views.get(p.toUri.getPath))
      case _      => None
    }

  /** The partial-state aggregation of `rows` for (keys, measures). */
  private def partials(rows: org.apache.spark.sql.DataFrame,
      keys: Seq[String], measures: Seq[String]): org.apache.spark.sql.DataFrame = {
    val aggs = count(lit(1)).as(CntCol) +: measures.flatMap { m =>
      Seq(sum(col(m)).as(sumCol(m)), min(col(m)).as(minCol(m)), max(col(m)).as(maxCol(m)))
    }
    rows.groupBy(keys.map(col): _*).agg(aggs.head, aggs.tail: _*)
  }

  /** Build the partial-state parquet for (basePath, keys, measures) and
    * register it. Unregisters first so the build's own aggregate can never
    * reroute onto the view it is about to overwrite (the self-referential
    * rebuild hazard).
    */
  def buildAndRegister(spark: SparkSession, basePath: String, mvPath: String,
      keys: Seq[String], measures: Seq[String]): Unit = {
    unregister(basePath)
    partials(spark.read.parquet(basePath), keys, measures)
      .write.mode("overwrite").parquet(mvPath)
    register(View(basePath, mvPath, keys, measures))
  }

  /** Incremental refresh for an APPEND batch: fold the batch's partial
    * state into the registered view without rescanning the base table —
    * count/sum/min/max partials are all mergeable (that is WHY the view
    * stores partials, not finals), so the refresh cost is O(batch) +
    * O(view), independent of base-table size. The merged state lands at
    * `newMvPath` (a fresh version, never overwriting the version being
    * read) and the registration flips atomically to it. Appends only:
    * deletes/updates would need retractable partials (min/max are not
    * invertible) — route those through a full [[buildAndRegister]].
    */
  def refreshAppend(spark: SparkSession, basePath: String,
      batch: org.apache.spark.sql.DataFrame, newMvPath: String): Unit = {
    val view = Option(views.get(norm(basePath))).getOrElse(
      throw new IllegalStateException(s"no view registered for $basePath"))
    val keys = view.keys
    val mergeAggs = sum(col(CntCol)).as(CntCol) +: view.measures.flatMap { m =>
      Seq(sum(col(sumCol(m))).as(sumCol(m)),
        min(col(minCol(m))).as(minCol(m)),
        max(col(maxCol(m))).as(maxCol(m)))
    }
    val merged = partials(batch, keys, view.measures)
      .unionByName(spark.read.parquet(view.mvPath))
      .groupBy(keys.map(col): _*)
      .agg(mergeAggs.head, mergeAggs.tail: _*)
    merged.write.mode("overwrite").parquet(newMvPath)
    register(View(basePath, newMvPath, keys, view.measures))
  }
}

/** The reroute rule — registered through [[GraftExtensions]]. */
object MatViewReroute extends Rule[LogicalPlan] {

  override def apply(plan: LogicalPlan): LogicalPlan = plan.transformUp {
    case agg: Aggregate => reroute(agg).getOrElse(agg)
  }

  /** The registered view scanned by `plan`, if `plan` is exactly that scan
    * (or a column-pruning Project over it).
    */
  private def scanView(plan: LogicalPlan): Option[MatViews.View] = plan match {
    case LogicalRelation(fsr: HadoopFsRelation, _, _, _, _) =>
      MatViews.lookup(fsr.location.rootPaths)
    case Project(pl, child) if pl.forall(_.isInstanceOf[AttributeReference]) =>
      scanView(child)
    case _ => None
  }

  private def reroute(agg: Aggregate): Option[LogicalPlan] =
    scanView(agg.child).flatMap { view =>
      val groupable = agg.groupingExpressions.nonEmpty && agg.groupingExpressions.forall {
        case a: AttributeReference => view.keys.contains(a.name)
        case _                     => false
      }
      if (!groupable) None
      else {
        // Fresh MV relation per rewrite: attribute ids must be unique per
        // occurrence in a plan tree, so the analyzed read is not cached.
        val mvPlan = SparkSession.active.read.parquet(view.mvPath).queryExecution.analyzed
        val mvAttr = mvPlan.output.map(a => a.name -> a).toMap
        val rewritten: Seq[Option[NamedExpression]] = agg.aggregateExpressions.map {
          case a: AttributeReference if view.keys.contains(a.name) =>
            Some(Alias(mvAttr(a.name), a.name)(exprId = a.exprId))
          case al @ Alias(AggregateExpression(fn, Complete, false, None, _), name) =>
            rewriteFn(fn, view, mvAttr).map(nf =>
              Alias(nf.toAggregateExpression(), name)(exprId = al.exprId))
          case _ => None
        }
        if (rewritten.exists(_.isEmpty)) None
        else {
          val newGroup = agg.groupingExpressions.collect {
            case a: AttributeReference => mvAttr(a.name)
          }
          Some(Aggregate(newGroup, rewritten.flatten, mvPlan))
        }
      }
    }

  /** count(*) / sum / min / max over a registered measure → the re-aggregation
    * of the view's partial column. The rewritten function must produce the
    * ORIGINAL output type exactly — the Alias keeps the original exprId, so
    * a widened type (e.g. SUM over an already-widened decimal partial:
    * Decimal(28,2) → Decimal(38,2)) would change the schema under every
    * parent that was resolved against it. Long/double sums re-aggregate at
    * the same type and fire; type-widening cases decline conservatively.
    */
  private def rewriteFn(fn: AggregateFunction, view: MatViews.View,
      mvAttr: Map[String, Attribute]): Option[AggregateFunction] = {
    val rewritten: Option[AggregateFunction] = fn match {
      case Count(Seq(Literal(1, _))) =>
        Some(Sum(mvAttr(MatViews.CntCol)))
      case Sum(a: AttributeReference, _) if view.measures.contains(a.name) =>
        Some(Sum(mvAttr(MatViews.sumCol(a.name))))
      case Min(a: AttributeReference) if view.measures.contains(a.name) =>
        Some(Min(mvAttr(MatViews.minCol(a.name))))
      case Max(a: AttributeReference) if view.measures.contains(a.name) =>
        Some(Max(mvAttr(MatViews.maxCol(a.name))))
      case _ => None
    }
    rewritten.filter(_.dataType == fn.dataType)
  }
}
