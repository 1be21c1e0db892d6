package graft.optimizer

import org.apache.spark.sql.catalyst.expressions._
import org.apache.spark.sql.catalyst.expressions.aggregate._
import org.apache.spark.sql.catalyst.plans.Inner
import org.apache.spark.sql.catalyst.plans.logical._
import org.apache.spark.sql.catalyst.rules.Rule
import org.apache.spark.sql.types.LongType

/** Eager COUNT(*) aggregation through an inner equi-join (Yan & Larson,
  * "Eager aggregation and lazy aggregation", VLDB'95; optimization-guide
  * §2.3 "aggregate before you shuffle"): when a grouped COUNT(*) sits on
  * a join whose one side contributes ONLY its join keys, count that side
  * per join key FIRST, join the (much smaller) per-key counts, and SUM
  * them in the final aggregate.
  *
  *   Agg_G[count(*)] (L ⋈_{lk=rk} R)
  *     ⇒ Agg_G[coalesce(sum(c0),0)] (Agg_{lk}[count(*) AS c0](L) ⋈_{lk=rk} R)
  *
  * Equivalence: in the original, group g's count is Σ over joined rows =
  * Σ_{r∈R matching g} |{l ∈ L : l.lk = r.rk}|; in the rewrite each
  * (lk-group, r) joined row carries exactly that inner cardinality as
  * c0, so the sums coincide — for ANY multiplicities on either side
  * (duplicate R keys multiply both forms identically). coalesce(·, 0)
  * restores COUNT's zero on the empty global group (SUM of no rows is
  * NULL where COUNT is 0) and keeps the output attribute non-nullable as
  * COUNT declared it.
  *
  * Why it pays: the fact side of a fact⋈dim count query collapses BEFORE
  * the join (q_path_seq: 600 k lineitems → 150 k order keys, measured
  * 0.97 → 0.58 s at sf0.1; q_groupby_count: 15 k customers → 25 nation
  * keys), so the join probes and the final aggregate hash pre-aggregated
  * rows; at cluster scale a shuffle join moves per-key counts instead of
  * raw fact rows. Where the join key is unique in L the pushed aggregate
  * reduces nothing and costs one extra in-pipeline hash-aggregate pass
  * over L — bounded, and not a shape the engine's corpus produces with a
  * grouped count.
  *
  * Guards (all required):
  *  - batch plan only (streaming grouped aggregation is stateful);
  *  - INNER join whose condition is a conjunction of EqualTo between the
  *    two sides' attributes (the engine's equi-joins) — no residual
  *    predicate that could reference aggregated-away columns;
  *  - every AggregateExpression in the output is COUNT over foldable
  *    non-null children, non-DISTINCT, un-FILTERed — the one
  *    decomposition needing no per-aggregate multiplication rewrite;
  *  - grouping/output expressions reference only the kept side; the
  *    pushed side contributes nothing but its join keys;
  *  - the pushed side is not already an Aggregate. The rewrite cannot
  *    re-match its own output (the SUM is not a COUNT), so the fixpoint
  *    batch terminates; a pushed count over a join CHAIN may legally
  *    cascade one level further down, which is the intended recursion.
  */
object EagerCountPushdown extends Rule[LogicalPlan] {

  /** Is every aggregate call in this output expression a plain COUNT of
    * foldable non-null arguments (COUNT(*) / COUNT(1))? */
  private def onlyCountStar(e: Expression): Boolean =
    e.collect { case ae: AggregateExpression => ae }.forall(isCountStar)

  private def isCountStar(ae: AggregateExpression): Boolean =
    ae.aggregateFunction match {
      case Count(children) =>
        !ae.isDistinct && ae.filter.isEmpty &&
          children.forall(c => c.foldable && c.eval() != null)
      case _ => false
    }

  private def splitConjuncts(e: Expression): Seq[Expression] = e match {
    case And(a, b) => splitConjuncts(a) ++ splitConjuncts(b)
    case other => Seq(other)
  }

  /** The pushed side's join-key attributes, provided the condition is a
    * pure conjunction of cross-side attribute equalities. */
  private def pushSideKeys(cond: Expression, push: LogicalPlan,
      keep: LogicalPlan): Option[Seq[Attribute]] = {
    val keys = splitConjuncts(cond).map {
      case EqualTo(a: Attribute, b: Attribute) =>
        if (push.outputSet.contains(a) && keep.outputSet.contains(b)) Some(a)
        else if (push.outputSet.contains(b) && keep.outputSet.contains(a))
          Some(b)
        else None
      case _ => None
    }
    if (keys.forall(_.isDefined)) Some(keys.map(_.get).distinct) else None
  }

  /** Shared structural checks given the set of child attrs the aggregate
    * actually consumes (directly, or through its Project's aliases). */
  private def eligibleRefs(agg: Aggregate, refs: AttributeSet,
      push: LogicalPlan, keep: LogicalPlan, cond: Expression): Boolean = {
    if (push.isInstanceOf[Aggregate]) return false
    if (!agg.resolved) return false
    val outs = agg.aggregateExpressions
    if (!outs.forall(_.deterministic) ||
      !agg.groupingExpressions.forall(_.deterministic)) return false
    // at least one count, and no other aggregate function anywhere
    val aggCalls = outs.flatMap(_.collect { case ae: AggregateExpression => ae })
    if (aggCalls.isEmpty || !aggCalls.forall(isCountStar)) return false
    // nothing above the join may see a pushed-side column
    if (refs.exists(push.outputSet.contains)) return false
    pushSideKeys(cond, push, keep).exists(_.nonEmpty)
  }

  /** Fire only when the join will SHUFFLE the pushed side. Under a
    * broadcast join the pushed side never moves — the pre-aggregation
    * would ADD an exchange (measured +1 Exchange, no wall win at sf0.1
    * where every bench join broadcasts). The kept side's explicit hint
    * decides first (the engine's steerSides plants BROADCAST /
    * SHUFFLE_HASH deliberately); otherwise the kept side's size estimate
    * against the session broadcast threshold. */
  private def joinWillShuffle(keep: LogicalPlan, keepHint: Option[HintInfo],
      pushHint: Option[HintInfo]): Boolean = {
    def strat(h: Option[HintInfo]) = h.flatMap(_.strategy)
    strat(keepHint) match {
      case Some(BROADCAST) => false
      case Some(SHUFFLE_HASH) | Some(SHUFFLE_MERGE) => true
      case _ =>
        strat(pushHint) match {
          case Some(BROADCAST) => false // push side broadcast: it never moves
          case _ =>
            val thr = conf.autoBroadcastJoinThreshold
            thr >= 0 && keep.stats.sizeInBytes > thr
        }
    }
  }

  private def eligible(agg: Aggregate, push: LogicalPlan,
      keep: LogicalPlan, cond: Expression): Boolean =
    eligibleRefs(agg,
      AttributeSet(agg.groupingExpressions.flatMap(_.references) ++
        agg.aggregateExpressions.flatMap(_.references)), push, keep, cond)

  private def rewrite(agg: Aggregate, push: LogicalPlan, keep: LogicalPlan,
      cond: Expression, hint: JoinHint, pushIsLeft: Boolean,
      projUsed: Option[Seq[NamedExpression]]): LogicalPlan = {
    val keys = pushSideKeys(cond, push, keep).get
    val c0 = AttributeReference("__graft_c0", LongType, nullable = false)()
    val pushed = Aggregate(keys,
      keys :+ Alias(AggregateExpression(Count(Seq(Literal(1))), Complete,
        isDistinct = false), "__graft_c0")(exprId = c0.exprId), push)
    val newJoin =
      if (pushIsLeft) Join(pushed, keep, Inner, Some(cond), hint)
      else Join(keep, pushed, Inner, Some(cond), hint)
    // when the aggregate read through a Project, keep exactly the
    // project expressions it used and forward the pushed count
    val newChild = projUsed match {
      case Some(used) => Project(used :+ c0, newJoin)
      case None => newJoin
    }
    val newOuts = agg.aggregateExpressions.map { out =>
      out.transform {
        case ae: AggregateExpression if isCountStar(ae) =>
          Coalesce(Seq(
            AggregateExpression(Sum(c0), Complete, isDistinct = false),
            Literal(0L)))
      }.asInstanceOf[NamedExpression]
    }
    Aggregate(agg.groupingExpressions, newOuts, newChild)
  }

  /** The attrs `agg` pulls from `p`'s output, resolved through `p`'s
    * aliases to the attrs of `p`'s child they derive from — None when
    * any referenced project expression is non-deterministic. */
  private def throughProject(agg: Aggregate, p: Project)
      : Option[(Seq[NamedExpression], AttributeSet)] = {
    val used = p.projectList.filter(ne => agg.references.contains(ne.toAttribute))
    if (!used.forall(_.deterministic)) None
    else Some((used, AttributeSet(used.flatMap(_.references))))
  }

  /** Aggregate directly over the join, or over one aliasing Project
    * (CollapseProject leaves a Project in place when folding it would
    * duplicate a non-trivial group expression — the common shape for
    * GROUP BY on a constructed struct). */
  /** Session kill-switch: `spark.graft.eagerCountPushdown=false` disables
    * the rewrite (operational escape hatch + A/B measurement). */
  private def enabled: Boolean =
    conf.getConfString("spark.graft.eagerCountPushdown", "true") == "true"

  override def apply(plan: LogicalPlan): LogicalPlan = {
    if (plan.isStreaming || !enabled) return plan
    plan.transformDown {
      case agg @ Aggregate(_, _, Join(l, r, Inner, Some(cond), hint), _)
          if eligible(agg, l, r, cond) &&
            joinWillShuffle(r, hint.rightHint, hint.leftHint) =>
        rewrite(agg, l, r, cond, hint, pushIsLeft = true, None)
      case agg @ Aggregate(_, _, Join(l, r, Inner, Some(cond), hint), _)
          if eligible(agg, r, l, cond) &&
            joinWillShuffle(l, hint.leftHint, hint.rightHint) =>
        rewrite(agg, r, l, cond, hint, pushIsLeft = false, None)
      case agg @ Aggregate(_, _,
          p @ Project(_, Join(l, r, Inner, Some(cond), hint)), _)
          if throughProject(agg, p).exists { case (used, refs) =>
            eligibleRefs(agg, refs, l, r, cond) } &&
            joinWillShuffle(r, hint.rightHint, hint.leftHint) =>
        val (used, _) = throughProject(agg, p).get
        rewrite(agg, l, r, cond, hint, pushIsLeft = true, Some(used))
      case agg @ Aggregate(_, _,
          p @ Project(_, Join(l, r, Inner, Some(cond), hint)), _)
          if throughProject(agg, p).exists { case (used, refs) =>
            eligibleRefs(agg, refs, r, l, cond) } &&
            joinWillShuffle(l, hint.leftHint, hint.rightHint) =>
        val (used, _) = throughProject(agg, p).get
        rewrite(agg, r, l, cond, hint, pushIsLeft = false, Some(used))
    }
  }
}
