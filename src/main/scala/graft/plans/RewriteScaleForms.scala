package graft.plans

import scala.collection.mutable

import org.apache.spark.sql.catalyst.expressions._
import org.apache.spark.sql.catalyst.expressions.aggregate._
import org.apache.spark.sql.catalyst.plans.Inner
import org.apache.spark.sql.catalyst.plans.logical._
import org.apache.spark.sql.catalyst.rules.Rule
import org.apache.spark.sql.types.{ByteType, DataType, DecimalType, IntegerType, LongType, ShortType}

/** Optimizer REPAIR rules for two of the PlanLint scale-killer
  * classes — the engine does not just flag the shapes the sf1 decade
  * gate caught (q12 33×, q13 52× for 10× data), it rewrites them into
  * the forms the registry uses by hand
  * ([[graft.operators.Rollups.keyGrainAttach]] /
  * [[graft.operators.Rollups.distinctCascade]]'s join discipline).
  *
  * Both follow the [[RewriteWindowTopK]] pattern: output attributes
  * keep their exprIds so downstream plans are untouched, each rule is
  * conf-gated, and plan-equivalence + result-equivalence are pinned in
  * PlanLintSpec.
  */
object RewriteScaleForms {

  /** Sum/avg folds are only order-insensitive (and therefore safe to
    * move between a window's sorted single-pass fold and a hash
    * aggregate's partial/final merge) over exact arithmetic.
    */
  private[plans] def exactType(dt: DataType): Boolean = dt match {
    case ByteType | ShortType | IntegerType | LongType => true
    case _: DecimalType => true
    case _ => false
  }

  /** Aggregates whose group value cannot depend on fold order: the
    * guard that makes a window→groupBy move provably result-identical
    * (float sums are excluded — the two plans fold in different
    * orders and may differ in ulps).
    */
  private[plans] def orderInsensitive(af: AggregateFunction): Boolean = af match {
    case _: Min | _: Max | _: Count => true
    case s: Sum => exactType(s.child.dataType)
    case a: Average => exactType(a.child.dataType)
    case _ => false
  }

  /** The frame covers the whole partition, so the window value is a
    * per-GROUP constant (order spec, if any, cannot change it).
    */
  private[plans] def fullFrame(f: Expression): Boolean = f match {
    case SpecifiedWindowFrame(_, UnboundedPreceding, UnboundedFollowing) => true
    case UnspecifiedFrame => true
    case _ => false
  }

  /** Re-alias a plan's output through a Project so it can sit on the
    * other side of a self-join (disjoint output exprIds), plus the
    * attribute remap for expressions moving across.
    */
  private[plans] def freshSide(
      child: LogicalPlan): (LogicalPlan, AttributeMap[Attribute]) = {
    val aliases = child.output.map(a => Alias(a, a.name)())
    (Project(aliases, child),
      AttributeMap(child.output.zip(aliases.map(_.toAttribute))))
  }
}

/** Optimizer rule: collapse the Zipf-dangerous "window-attach chain
  * ending in distinct" pattern (the q12 sf1 catch, 33× wall for 10×
  * data)
  *
  * {{{ Distinct(Project/Filter*(Window(aggs over (PARTITION BY k), child))) }}}
  *
  * into the keyGrainAttach shape: one Aggregate per distinct
  * partition-key set at its OWN collapsed grain, null-safe-joined at
  * the union grain —
  *
  * {{{ Distinct(Project/Filter*(Join(Aggregate(G, G ++ atGrainAggs, child), Aggregate(P_i, ...)))) }}}
  *
  * The window form sorts the full data grain inside fixed-width hash
  * partitions only for the distinct to throw the rows away; the
  * aggregate form only ever shuffles collapsed grains and is map-side
  * combined.
  *
  * Guards (all must hold, else the plan is left alone): the dedup
  * references ONLY partition keys and window outputs through the
  * Project/Filter chain; every window function is a full-frame,
  * non-distinct, unfiltered, ORDER-INSENSITIVE aggregate (min / max /
  * count / exact-typed sum / exact-typed avg — float sums fold in a
  * different order under groupBy and are excluded); all partition
  * specs are attributes; batch child. Window output attributes keep
  * their exprIds. Disable with
  * `spark.graft.rewriteDistinctOverWindow=false`.
  */
object RewriteDistinctOverWindow extends Rule[LogicalPlan] {

  private val ConfKey = "spark.graft.rewriteDistinctOverWindow"

  import RewriteScaleForms._

  override def apply(plan: LogicalPlan): LogicalPlan = {
    if (!conf.getConfString(ConfKey, "true").toBoolean) return plan
    plan.transformUp {
      case a: Aggregate if isPureDistinct(a) =>
        tryRewrite(a.references, a.child)
          .map(c => a.copy(child = c)).getOrElse(a)
    }
  }

  /** `.distinct()` after optimization: an Aggregate carrying no
    * aggregate function.
    */
  private def isPureDistinct(a: Aggregate): Boolean =
    a.groupingExpressions.nonEmpty &&
      !a.aggregateExpressions.exists(_.exists(_.isInstanceOf[AggregateExpression]))

  /** Rebuild the row-preserving chain between the distinct and the
    * window stack, tracking which attributes the consumer above each
    * node actually needs.
    */
  private def tryRewrite(refs: AttributeSet, p: LogicalPlan): Option[LogicalPlan] =
    p match {
      case pr @ Project(list, child) =>
        tryRewrite(AttributeSet(list.flatMap(_.references)), child)
          .map(c => pr.copy(child = c))
      case f @ Filter(cond, child) =>
        tryRewrite(refs ++ cond.references, child)
          .map(c => f.copy(child = c))
      case w: Window => collapseStack(refs, w)
      case _ => None
    }

  private def qualifies(w: Window): Boolean =
    w.partitionSpec.nonEmpty &&
      w.partitionSpec.forall(_.isInstanceOf[AttributeReference]) &&
      w.windowExpressions.forall {
        case al @ Alias(WindowExpression(ae: AggregateExpression,
            WindowSpecDefinition(_, _, frame)), _) =>
          !ae.isDistinct && ae.filter.isEmpty &&
            ae.aggregateFunction.deterministic &&
            orderInsensitive(ae.aggregateFunction) && fullFrame(frame)
        case _ => false
      }

  private def collapseStack(refs: AttributeSet, top: Window): Option[LogicalPlan] = {
    // gather the run of qualifying stacked Window nodes — the
    // analyzer threads attribute-only pass-through Projects between
    // them, which carry no computation and are safe to bypass
    var windows = Vector.empty[Window]
    var cur: LogicalPlan = top
    var done = false
    while (!done) cur match {
      case w: Window if qualifies(w) =>
        windows :+= w
        cur = w.child
      case Project(list, pc)
          if windows.nonEmpty && list.forall(_.isInstanceOf[Attribute]) &&
            pc.isInstanceOf[Window] =>
        cur = pc
      case _ => done = true
    }
    val child = cur
    if (child.isInstanceOf[Window] || child.isStreaming || windows.isEmpty)
      return None

    val grainKeys = windows.flatMap(_.partitionSpec)
      .map(_.asInstanceOf[Attribute]).distinctBy(_.exprId)
    val winAttrs = AttributeSet(
      windows.flatMap(_.windowExpressions.map(_.toAttribute)))
    // the dedup (and everything between) may only look at partition
    // keys and window outputs — any data-grain reference means the
    // distinct is NOT collapsing the window's grain and the rewrite
    // would change semantics
    if (!refs.subsetOf(AttributeSet(grainKeys) ++ winAttrs)) return None

    // window expressions grouped by partition-key set, first-seen order
    val groups = mutable.LinkedHashMap
      .empty[Set[ExprId], (Seq[Attribute], Vector[NamedExpression])]
    windows.foreach { w =>
      val keys = w.partitionSpec.map(_.asInstanceOf[Attribute])
      val kset = keys.map(_.exprId).toSet
      val (k0, acc) = groups.getOrElse(kset, (keys, Vector.empty[NamedExpression]))
      groups(kset) = (k0, acc ++ w.windowExpressions)
    }

    def collapse(ne: NamedExpression, remap: Expression => Expression): NamedExpression =
      ne match {
        case al @ Alias(WindowExpression(ae, _), name) =>
          Alias(remap(ae), name)(exprId = al.exprId, qualifier = al.qualifier)
        case other => other // unreachable under qualifies()
      }

    val grainSet = grainKeys.map(_.exprId).toSet
    val atGrain = groups.get(grainSet).map(_._2).getOrElse(Vector.empty)
    val base: LogicalPlan = Aggregate(grainKeys,
      grainKeys ++ atGrain.map(collapse(_, identity)), child)

    groups.remove(grainSet)
    Some(groups.values.foldLeft(base) { case (acc, (keys, aggs)) =>
      // each coarser-grain attach aggregates a RE-ALIASED copy of the
      // child (disjoint exprIds across the self-join), with the
      // window-output exprIds preserved on the aliases
      val (proj, amap) = freshSide(child)
      def remap(e: Expression): Expression =
        e.transform { case at: Attribute => amap.getOrElse(at, at) }
      val subKeys = keys.map(amap(_))
      val sub = Aggregate(subKeys, subKeys ++ aggs.map(collapse(_, remap)), proj)
      val cond = keys.zip(subKeys)
        .map { case (a, b) => EqualNullSafe(a, b): Expression }.reduce(And)
      Join(acc, sub, Inner, Some(cond), JoinHint.NONE)
    })
  }
}

/** Optimizer rule: decompose an Aggregate carrying ≥ 2 DISTINCT
  * aggregate groups (the q13 sf1 catch: Spark plans it as an Expand
  * replicating EVERY input row once per group — 52× wall for 10×
  * data) into single-distinct sub-aggregates null-safe-joined at the
  * group grain — the distinctCascade discipline as a plan rewrite:
  *
  * {{{ Aggregate(g, [cd(x), cd(y), sum(z)], child) }}}
  * becomes
  * {{{ Project(exprIds preserved, Join(Aggregate(g, cd(x)+sum(z), child), Aggregate(g', cd(y'), fresh(child)), g <=> g')) }}}
  *
  * One distinct group rides the base aggregate together with all
  * non-distinct aggregates (a single-distinct aggregate plans without
  * an Expand); every additional group gets its own aggregate over a
  * re-aliased copy of the child. Inner-join on null-safe key equality
  * is exact: every branch aggregates the same child, so the group
  * sets are identical.
  *
  * DEFAULT OFF (`spark.graft.rewriteMultiDistinct=true` to enable):
  * the registry's two sanctioned multi-distinct instances (q127
  * one-scan profiling, q182 contingency cells) prove the Expand is
  * sometimes the BETTER plan — when the fan is a static constant and
  * the input is one scan wide, N joined scans lose. A static rule
  * cannot see that, so the repair is opt-in where the detection
  * (PlanLint) is always-on.
  */
object RewriteMultiDistinct extends Rule[LogicalPlan] {

  private val ConfKey = "spark.graft.rewriteMultiDistinct"

  import RewriteScaleForms._

  override def apply(plan: LogicalPlan): LogicalPlan = {
    if (!conf.getConfString(ConfKey, "false").toBoolean) return plan
    plan.transformUp {
      case a: Aggregate if qualifies(a) => rewrite(a).getOrElse(a)
    }
  }

  private def distinctKey(ae: AggregateExpression): (Seq[Expression], Option[Expression]) =
    (ae.aggregateFunction.children.map(_.canonicalized),
      ae.filter.map(_.canonicalized))

  private def qualifies(a: Aggregate): Boolean = {
    val aggs = a.aggregateExpressions.flatMap(_.collect {
      case ae: AggregateExpression => ae
    })
    aggs.filter(_.isDistinct).map(distinctKey).distinct.size >= 2 &&
      !a.child.isStreaming &&
      a.groupingExpressions.forall(_.deterministic) &&
      a.aggregateExpressions.forall(_.deterministic)
  }

  private def rewrite(a: Aggregate): Option[LogicalPlan] = {
    val g = a.groupingExpressions
    val res = a.aggregateExpressions
    val child = a.child

    val allAggs = res.flatMap(_.collect { case ae: AggregateExpression => ae })
    val regular = allAggs.filterNot(_.isDistinct)
      .groupBy(_.canonicalized).map(_._2.head).toSeq
    // distinct groups in first-seen order
    val groupOf = mutable.LinkedHashMap
      .empty[(Seq[Expression], Option[Expression]), Vector[AggregateExpression]]
    allAggs.filter(_.isDistinct).foreach { ae =>
      val k = distinctKey(ae)
      val cur = groupOf.getOrElse(k, Vector.empty)
      if (!cur.exists(_.canonicalized == ae.canonicalized))
        groupOf(k) = cur :+ ae
    }
    val dGroups = groupOf.values.toSeq

    val aggMap = mutable.HashMap.empty[Expression, Attribute]
    val gMap = mutable.HashMap.empty[Expression, Attribute]

    // base branch: first distinct group + ALL non-distinct aggregates
    // (a single-distinct aggregate plans without an Expand)
    val baseKeys = g.zipWithIndex.map { case (e, i) => Alias(e, s"__gk$i")() }
    baseKeys.zip(g).foreach { case (al, e) =>
      gMap(e.canonicalized) = al.toAttribute
    }
    val baseAggs = (dGroups.head ++ regular).map { ae =>
      val al = Alias(ae, "__agg")()
      aggMap(ae.canonicalized) = al.toAttribute
      al
    }
    val base: LogicalPlan = Aggregate(g, baseKeys ++ baseAggs, child)

    val joined = dGroups.tail.foldLeft(base) { (acc, aggs) =>
      val (proj, amap) = freshSide(child)
      def remap(e: Expression): Expression =
        e.transform { case at: Attribute => amap.getOrElse(at, at) }
      val subG = g.map(remap)
      val subKeys = subG.zipWithIndex.map { case (e, i) => Alias(e, s"__gk$i")() }
      val subAggs = aggs.map { ae =>
        val al = Alias(remap(ae), "__agg")()
        aggMap(ae.canonicalized) = al.toAttribute
        al
      }
      val sub = Aggregate(subG, subKeys ++ subAggs, proj)
      val cond = baseKeys.zip(subKeys).map { case (bk, sk) =>
        EqualNullSafe(bk.toAttribute, sk.toAttribute): Expression
      }.reduceOption(And)
      Join(acc, sub, Inner, cond, JoinHint.NONE)
    }

    // final projection: original output names, types, exprIds
    def rebuild(e: Expression): Expression = e.transformDown {
      case ae: AggregateExpression if aggMap.contains(ae.canonicalized) =>
        aggMap(ae.canonicalized)
      case e2 if gMap.contains(e2.canonicalized) => gMap(e2.canonicalized)
    }
    val outs = res.map {
      case al: Alias =>
        Alias(rebuild(al.child), al.name)(exprId = al.exprId,
          qualifier = al.qualifier)
      case attr: Attribute =>
        Alias(rebuild(attr), attr.name)(exprId = attr.exprId,
          qualifier = attr.qualifier)
      case other =>
        Alias(rebuild(other), other.name)(exprId = other.exprId)
    }
    // any reference the rebuild did not cover means the aggregate had
    // a shape we do not fully model — leave the plan alone
    if (outs.forall(_.references.subsetOf(joined.outputSet)))
      Some(Project(outs, joined))
    else None
  }
}
