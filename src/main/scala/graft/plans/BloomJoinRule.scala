package graft.plans

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.expressions.{Alias, And, Attribute, BloomFilterMightContain, EqualTo, Expression, IsNotNull, Literal, ScalarSubquery, XxHash64}
import org.apache.spark.sql.catalyst.expressions.aggregate.BloomFilterAggregate
import org.apache.spark.sql.catalyst.optimizer.ColumnPruning
import org.apache.spark.sql.catalyst.plans.{Inner, LeftSemi}
import org.apache.spark.sql.catalyst.plans.logical.{Aggregate, Filter, Join, JoinHint, LogicalPlan, SHUFFLE_HASH, SHUFFLE_MERGE}
import org.apache.spark.sql.catalyst.rules.Rule

/** Planner-tier bloom-prefilter join (the rule form of
  * `Scale.bloomPrefilterJoin`): when an equi-join's one side carries a
  * selective filter and is small enough to sketch, inject a
  * `BloomFilterMightContain(scalar-subquery(bloom_filter_agg(dim key)))`
  * predicate onto the OTHER (fact) side — so non-matching fact rows die
  * BEFORE the join shuffle instead of after it. False positives are
  * scrubbed by the exact join that still follows; the rewrite is
  * result-identical by construction, the win is shuffle volume (at
  * 100 TB a selective dim prunes the fact exchange by orders of
  * magnitude).
  *
  * This is the same plan shape Spark's own `InjectRuntimeFilter`
  * (spark/sql/catalyst/optimizer/InjectRuntimeFilter.scala) produces,
  * reusing the built-in `BloomFilterAggregate`/`BloomFilterMightContain`
  * expressions — but with library-controlled thresholds: Spark's rule
  * only fires when the application side scans > 10 GB (invisible at
  * test scale, conservative at cluster scale); this one fires on any
  * size-asymmetric filtered equi-join, the explicit always-on
  * formulation the engine documents. Idempotent (a side that already
  * carries a bloom predicate is left alone), so it is safe in both a
  * fixed-point optimizer batch (`GraftExtensions.injectOptimizerRule`)
  * and the once-per-query `experimental.extraOptimizations` hook
  * ([[BloomJoin.ensureRegistered]]).
  *
  * Tunables (SQL conf):
  *   - `spark.graft.bloomJoin.enabled` (default true)
  *   - `spark.graft.bloomJoin.creationSideThreshold` — max creation-side
  *     size in bytes to build a bloom over (default 128 MB ≈ 100M keys
  *     at the default 3% fpp of `BloomFilter.create(n)`)
  *   - `spark.graft.bloomJoin.sizeRatio` — app side must be at least
  *     this many times larger than the creation side (default 2)
  */
object BloomJoinRule extends Rule[LogicalPlan] {

  private def enabled: Boolean =
    conf.getConfString("spark.graft.bloomJoin.enabled", "true").toBoolean
  private def creationThreshold: Long =
    conf.getConfString("spark.graft.bloomJoin.creationSideThreshold",
      String.valueOf(128L * 1024 * 1024)).toLong
  private def sizeRatio: Long =
    conf.getConfString("spark.graft.bloomJoin.sizeRatio", "2").toLong

  /** A filter that actually discards rows (not just null-pruning) marks
    * the creation side as selective — the precondition for the bloom to
    * pay for itself.
    */
  private def hasSelectiveFilter(plan: LogicalPlan): Boolean = plan.exists {
    case Filter(cond, _) =>
      splitConjunctive(cond).exists {
        case _: IsNotNull => false
        case Literal(true, _) => false
        case _ => true
      }
    case _ => false
  }

  private def splitConjunctive(e: Expression): Seq[Expression] = e match {
    case And(l, r) => splitConjunctive(l) ++ splitConjunctive(r)
    case other => Seq(other)
  }

  /** One bloom predicate per (application side, key): if the subtree
    * already probes a bloom with this key's hash, leave it alone (this
    * is also what makes the rule converge under a fixed-point batch).
    */
  private def alreadyBloomed(plan: LogicalPlan, appKey: Expression): Boolean = plan.exists {
    case Filter(cond, _) => cond.exists {
      case BloomFilterMightContain(_, h: XxHash64) =>
        h.children.exists(_.semanticEquals(appKey))
      case _ => false
    }
    case _ => false
  }

  /** The bloom only pays when the join SHUFFLES the application side —
    * under a broadcast join the fact side never moves, so a prefilter is
    * pure per-row overhead. Shuffling is the outcome when the creation
    * side exceeds the broadcast threshold (the at-scale case), when
    * broadcasting is disabled, or when the caller pinned a shuffle
    * strategy hint on the join.
    */
  private def willShuffle(creationSize: BigInt, hint: JoinHint): Boolean = {
    val bcast = conf.autoBroadcastJoinThreshold
    bcast < 0 || creationSize > bcast ||
      Seq(hint.leftHint, hint.rightHint).flatten.flatMap(_.strategy)
        .exists(s => s == SHUFFLE_MERGE || s == SHUFFLE_HASH)
  }

  private def inject(app: LogicalPlan, appKey: Expression,
                     creation: LogicalPlan, creationKey: Expression): LogicalPlan = {
    val rowCount = creation.stats.rowCount.map(_.longValue).filter(_ > 0L)
    val agg = rowCount match {
      case Some(n) => new BloomFilterAggregate(new XxHash64(Seq(creationKey)), n)
      case None => new BloomFilterAggregate(new XxHash64(Seq(creationKey)))
    }
    val alias = Alias(agg.toAggregateExpression(), "graft_bloom")()
    // prune the creation side to the key column before it runs as a
    // standalone subquery job (the main optimizer will not revisit it)
    val aggregate = ColumnPruning(Aggregate(Nil, Seq(alias), creation))
    val subquery = ScalarSubquery(aggregate, Seq.empty)
    Filter(BloomFilterMightContain(subquery, new XxHash64(Seq(appKey))), app)
  }

  override def apply(plan: LogicalPlan): LogicalPlan = {
    if (!enabled) return plan
    plan.transformUp {
      case j @ Join(left, right, joinType, Some(cond), hint)
          if joinType == Inner || joinType == LeftSemi =>
        val equiKeys = splitConjunctive(cond).collect {
          case EqualTo(l, r)
              if l.references.nonEmpty && l.references.subsetOf(left.outputSet) &&
                 r.references.subsetOf(right.outputSet) => (l, r)
          case EqualTo(l, r)
              if r.references.nonEmpty && r.references.subsetOf(left.outputSet) &&
                 l.references.subsetOf(right.outputSet) => (r, l)
        }
        def size(p: LogicalPlan): BigInt = p.stats.sizeInBytes
        // prefilter the LEFT side from the RIGHT (both join types keep
        // left rows only on match), and — for inner — the reverse too
        var newLeft = left
        var newRight = right
        equiKeys.headOption.foreach { case (lk, rk) =>
          if (hasSelectiveFilter(right) && !alreadyBloomed(left, lk) &&
              size(right) <= creationThreshold && size(left) >= size(right) * sizeRatio &&
              willShuffle(size(right), hint))
            newLeft = inject(left, lk, right, rk)
          if (joinType == Inner &&
              hasSelectiveFilter(left) && !alreadyBloomed(right, rk) &&
              size(left) <= creationThreshold && size(right) >= size(left) * sizeRatio &&
              willShuffle(size(left), hint))
            newRight = inject(right, rk, left, lk)
        }
        if (newLeft.eq(left) && newRight.eq(right)) j
        else j.copy(left = newLeft, right = newRight)
    }
  }
}

/** Runtime registration for sessions built without
  * `spark.sql.extensions=graft.functions.GraftExtensions` (the
  * `experimental.extraOptimizations` public hook — same pattern as
  * [[Asof.ensureRegistered]]).
  */
object BloomJoin {
  def ensureRegistered(spark: SparkSession): Unit = {
    val exp = spark.asInstanceOf[org.apache.spark.sql.classic.SparkSession].experimental
    if (!exp.extraOptimizations.contains(BloomJoinRule))
      exp.extraOptimizations = exp.extraOptimizations :+ BloomJoinRule
  }
}
