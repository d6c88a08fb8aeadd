package graft.plans

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.catalyst.expressions.{EqualNullSafe, EqualTo, PredicateHelper, RaiseError}
import org.apache.spark.sql.catalyst.expressions.aggregate.AggregateExpression
import org.apache.spark.sql.catalyst.plans.logical._

/** Static scale linter over OPTIMIZED logical plans: flags the plan
  * shapes that measured super-linear at the sf1 decade bench (or
  * would at 100 TB) but are invisible at small SF. The registry
  * sweep in QueriesSmokeSpec runs every registered query through
  * this, so the CLASSES the sf1 gate caught as instances (q12's
  * window-chain-ending-in-distinct at 33×, q13's double-distinct
  * Expand at 52×) cannot be reintroduced silently; library users can
  * lint their own composed plans the same way before submitting.
  *
  * Rules:
  *  - `distinct-over-window`: a pure dedup Aggregate (no aggregate
  *    functions) directly above a Window through a Project/Filter
  *    chain — the window sorts the FULL data grain inside fixed-width
  *    partitions only for the distinct to collapse it; rewrite with
  *    [[graft.operators.Rollups.keyGrainAttach]].
  *  - `multi-distinct-expand`: one Aggregate with ≥ 2 DISTINCT
  *    aggregate groups (different argument sets) — Spark plans this
  *    as an Expand that replicates every input row per group;
  *    rewrite with [[graft.operators.Rollups.distinctCascade]].
  *  - `cartesian`: a Join with no condition where neither side is
  *    provably bounded (maxRows) — quadratic at scale.
  *  - `non-equi-join`: a Join whose condition has no equality
  *    conjunct keyed across the two sides and neither side is
  *    provably bounded — plans as a nested-loop join; use binned
  *    range joins / as-of joins instead.
  *  - `unbounded-global-window`: a Window with an EMPTY partition
  *    spec whose input is neither provably bounded nor grain-
  *    collapsed by an upstream Aggregate/Window — a single-partition
  *    sort of the whole input. (The rank-statistic family's global
  *    cumulative windows ride value-grain aggregates and pass.)
  *  - `single-partition-funnel`: repartition(1)/coalesce(1) over an
  *    unbounded input inside a query plan — one task processes
  *    everything downstream (output writers belong in the sink, not
  *    the plan).
  */
object PlanLint extends PredicateHelper {

  final case class Finding(rule: String, node: String) {
    override def toString: String = s"$rule @ $node"
  }

  /** Sides below this row bound never scale with the data: literal
    * grids, global aggregates, limited heads.
    */
  val BoundedRows = 10000L

  def lint(df: DataFrame): Seq[Finding] =
    lintPlan(df.queryExecution.optimizedPlan) ++
      lintDistinctExpand(df.queryExecution.analyzed)

  /** The multi-distinct detector runs on the ANALYZED plan: by
    * optimization time RewriteDistinctAggregates has already turned
    * the distinct aggregates into the very Expand we are trying to
    * flag, indistinguishable from a semantic grouping-sets Expand.
    * (Analysis-time Expands — cube/rollup — carry no isDistinct
    * aggregates, so they never false-positive here.)
    */
  def lintDistinctExpand(analyzed: LogicalPlan): Seq[Finding] =
    analyzed.collect {
      case a: Aggregate if distinctGroupCount(a) >= 2 =>
        Finding("multi-distinct-expand",
          a.simpleString(6).linesIterator.next().take(160))
    }

  def lintPlan(plan: LogicalPlan): Seq[Finding] = {
    val out = collection.mutable.Buffer.empty[Finding]
    def head(p: LogicalPlan): String = p.simpleString(6).linesIterator.next().take(160)
    // `guarded` carries "a raise_error cap sits above these rows": a
    // global window under such a guard cannot silently sort an
    // oversized input — the guard raises first (the grainGuarded /
    // ValueGrainCap contract).
    def walk(p: LogicalPlan, guarded: Boolean): Unit = {
      val g = guarded ||
        p.expressions.exists(_.exists(_.isInstanceOf[RaiseError]))
      p match {
        case a: Aggregate =>
          if (isPureDistinct(a) && windowBelow(a.child))
            out += Finding("distinct-over-window", head(a))
        case j: Join =>
          val sanctioned = broadcastHinted(j) || j.children.exists(bounded)
          if (!sanctioned) {
            if (j.condition.isEmpty)
              out += Finding("cartesian", head(j))
            else if (!hasEquiKey(j))
              out += Finding("non-equi-join", head(j))
          }
        case w: Window
            if w.partitionSpec.isEmpty && !g && !grainCollapsed(w.child) =>
          out += Finding("unbounded-global-window", head(w))
        case r: Repartition
            if r.numPartitions == 1 && !bounded(r.child) =>
          out += Finding("single-partition-funnel", head(r))
        case _ =>
      }
      p.children.foreach(walk(_, g))
    }
    walk(plan, guarded = false)
    out.toList
  }

  /** An explicit broadcast hint declares the side bounded — the
    * nested-loop the join plans to is the author's stated intent
    * (ANN query panels, centroid dims, one-row stats).
    */
  private def broadcastHinted(j: Join): Boolean =
    Seq(j.hint.leftHint, j.hint.rightHint).flatten
      .exists(_.strategy.contains(BROADCAST))

  /** An Aggregate carrying no aggregate function is `.distinct()` (or
    * dropDuplicates over all columns) after optimization.
    */
  private def isPureDistinct(a: Aggregate): Boolean =
    a.groupingExpressions.nonEmpty &&
      !a.aggregateExpressions.exists(_.exists(_.isInstanceOf[AggregateExpression]))

  /** A Window reachable through a pure row-preserving chain — the
    * distinct is collapsing the very grain the window sorted. Stops
    * at anything that changes grain (Aggregate, Join, Generate).
    */
  private def windowBelow(p: LogicalPlan): Boolean = p match {
    case _: Window => true
    case _: Project | _: Filter | _: SubqueryAlias => windowBelow(p.children.head)
    case _ => false
  }

  /** Number of DISTINCT aggregate groups Spark would Expand over:
    * distinct aggregates with the same canonicalized argument set
    * share a group; ≥ 2 groups → one Expand row replica per group.
    */
  private def distinctGroupCount(a: Aggregate): Int =
    a.aggregateExpressions.flatMap(_.collect {
      case ae: AggregateExpression if ae.isDistinct =>
        (ae.aggregateFunction.children.map(_.canonicalized), ae.filter.map(_.canonicalized))
    }).distinct.size

  /** Join condition carries at least one equality conjunct keyed
    * across both sides (what ExtractEquiJoinKeys would find) — the
    * join can hash-partition instead of nested-looping.
    */
  private def hasEquiKey(j: Join): Boolean =
    j.condition.exists(splitConjunctivePredicates(_).exists {
      case e @ (_: EqualTo | _: EqualNullSafe) =>
        val Seq(l, r) = e.children
        (canEvaluate(l, j.left) && canEvaluate(r, j.right)) ||
          (canEvaluate(l, j.right) && canEvaluate(r, j.left))
      case _ => false
    })

  /** Provably bounded row count: literal relations, global
    * aggregates, limits — anything whose maxRows does not scale with
    * the data.
    */
  private def bounded(p: LogicalPlan): Boolean =
    p.maxRows.exists(_ <= BoundedRows)

  /** The global window's input is already grain-collapsed: bounded,
    * or riding an upstream Aggregate (the rank-statistic family's
    * cumulative windows run at VALUE grain produced by a groupBy) or
    * another Window (stacked windows — the inner one was linted).
    */
  private def grainCollapsed(p: LogicalPlan): Boolean = p match {
    case _ if bounded(p) => true
    case _: Aggregate | _: Window => true
    // explode() above an aggregate re-expands rows back toward data
    // grain — a window above it is NOT collapsed (mirrors windowBelow,
    // which already treats Generate as grain-changing)
    case _: Generate => false
    case u: Union => u.children.forall(grainCollapsed)
    case u: UnaryNode => grainCollapsed(u.child)
    case j: Join => j.children.forall(grainCollapsed)
    case _ => false
  }
}
