package graft.plans

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.expressions.AttributeReference
import org.apache.spark.sql.catalyst.plans.Inner
import org.apache.spark.sql.catalyst.plans.logical._
import org.apache.spark.sql.catalyst.rules.Rule
import org.apache.spark.sql.execution.datasources.LogicalRelation

/** The statistics→plan loop (VERDICT r10 item 3): q271 proved the engine
  * can SERVE CBO-grade NDV estimates from persisted HLL registers; this
  * rule is the missing consumer — it reads the persisted per-column NDV
  * stats table and flips a join to broadcast when the sketch bounds one
  * side small but Spark's own size estimation cannot see it.
  *
  * The blind spot it covers: a grouped dimension derived from a big table
  * (`fact ⋈ big.groupBy(k).agg(...)`). Without ANALYZE-style column stats,
  * Spark estimates the Aggregate's size as its CHILD's size — the whole
  * big table — so planning picks a sort-merge join and shuffles the fact.
  * AQE does fix this at runtime, but only AFTER the fact side's shuffle
  * map stage has already run; a planning-time broadcast never shuffles the
  * fact at all, which at 100 TB is the difference that matters. The
  * grouped-side row bound is sound, not heuristic: #groups ≤ ∏ NDV(k) —
  * an UPPER bound justifying broadcast can only over-estimate, never
  * under-estimate, the broadcast size. (The q202 fan-out lesson is the
  * same blindness in the other direction.)
  *
  * Stats resolve by (table, column): the grouping attribute is traced by
  * exprId to the file scan that produced it (aliases/renames bail —
  * conservative), the table name comes from the scan path, and the NDV
  * comes from the stats table q273 builds with the q230/q271 deterministic
  * HLL machinery. Estimated broadcast bytes = ∏NDV × the aggregate
  * output's schema default widths, compared against the session's own
  * autoBroadcastJoinThreshold. Stats location comes from
  * `spark.graft.stats.dir`; unset = rule inactive (the PlanAuditSpec
  * negative control).
  */
object SketchStats {
  val DirKey: String = StatsCatalog.DirKey

  def ensure(spark: SparkSession): Unit = synchronized {
    val cur = spark.experimental.extraOptimizations
    if (!cur.exists(_.isInstanceOf[BroadcastFromSketchStats]))
      spark.experimental.extraOptimizations =
        cur :+ ReorderJoinsFromNdv() :+ BroadcastFromSketchStats() :+ VetoBroadcastOnFanout()
  }

  /** Generation-pinned, failure-transparent, re-entrancy-guarded read of
    * the persisted NDV table — all three disciplines live in
    * [[StatsCatalog]] now (VERDICT r11 items 3/4); the stats table itself
    * is a few rows of 64-byte register state per column, a bounded driver
    * read the same shape as a catalog statistics lookup. */
  private[plans] def lookup(spark: SparkSession, dir: String): Map[(String, String), Long] =
    StatsCatalog.ndv(spark, dir)

  /** Reset the memoized stats (tests rebuild stores under the same path). */
  def invalidate(): Unit = StatsCatalog.invalidate()

  /** Sound row upper bound for a grouped side: ∏ NDV(grouping cols),
    * every grouping expr a stats-covered scan column. Filters/projects
    * between the agg and the scan only shrink rows, so the bound holds
    * through them. Shared by the broadcast flip (rows × width vs the
    * threshold) and the join reorder (rows as the dim cardinality). */
  private[plans] def groupedRowBound(p: LogicalPlan,
      stats: Map[(String, String), Long]): Option[(Long, Int)] = p match {
    case Aggregate(groupingExprs, aggExprs, child, _) if groupingExprs.nonEmpty =>
      val leaves = child.collect { case lr: LogicalRelation => lr }
      val ndvs = groupingExprs.map {
        case a: AttributeReference =>
          leaves.collectFirst {
            case lr if lr.output.exists(_.exprId == a.exprId) =>
              StatsCatalog.tableOf(lr).flatMap(t => stats.get((t, a.name)))
          }.flatten
        case _ => None
      }
      if (ndvs.exists(_.isEmpty)) None
      else {
        val rows = ndvs.flatten.foldLeft(1L)((acc, n) =>
          if (acc > Long.MaxValue / math.max(1L, n)) Long.MaxValue else acc * n)
        val width = aggExprs.map(_.dataType.defaultSize).sum + 16
        Some((rows, width))
      }
    case Project(_, inner) => groupedRowBound(inner, stats)
    case Filter(_, inner) => groupedRowBound(inner, stats)
    case SubqueryAlias(_, inner) => groupedRowBound(inner, stats)
    case _ => None
  }

  final case class BroadcastFromSketchStats() extends Rule[LogicalPlan] {

    override def apply(plan: LogicalPlan): LogicalPlan = {
      val dir = conf.getConfString(DirKey, "")
      if (dir.isEmpty) plan
      else {
        val stats = lookup(SparkSession.active, dir)
        if (stats.isEmpty) plan
        else plan.transformUp {
          case j @ Join(l, r, Inner, _, JoinHint.NONE) =>
            val threshold = conf.autoBroadcastJoinThreshold
            // Safety margin (ADVICE r11): the "sound" ∏NDV row bound rides
            // on two estimates that can individually under-shoot — HLL NDV
            // carries ~±2% error in its accurate regime, and defaultSize
            // (20 B for strings) under-counts long variable-length keys.
            // Requiring rows*width ≤ threshold/2 keeps a 2× cushion so a
            // forced broadcast never materially exceeds the session's own
            // autoBroadcastJoinThreshold.
            def small(p: LogicalPlan): Boolean = groupedRowBound(p, stats).exists {
              case (rows, width) =>
                threshold > 0 && rows < Long.MaxValue / width &&
                  rows * width <= threshold / 2
            }
            val bc = Some(HintInfo(strategy = Some(BROADCAST)))
            if (small(r)) j.copy(hint = JoinHint(None, bc))
            else if (small(l)) j.copy(hint = JoinHint(bc, None))
            else j
        }
      }
    }
  }

  /** The THIRD stats consumer — catalog-driven JOIN REORDERING (VERDICT
    * r11 "missing" 4's tail: "neither does join reordering"). Spark's own
    * CostBasedJoinReorder needs ANALYZE-style catalog statistics and is
    * off by default; without them a left-deep chain executes in WRITTEN
    * order, so `fact ⋈ expanding ⋈ reducing` carries the expanded
    * intermediate through every later join. With the persisted exact row
    * counts (`table_rows`) and HLL NDVs, the textbook System-R estimate
    *
    *   |A ⋈k B|  ≈  |A|·|B| / max(ndv(A.k), ndv(B.k))
    *
    * (Selinger et al., SIGMOD'79) is computable entirely from the catalog
    * at planning time. The rule rewrites `(fact ⋈c1 d1) ⋈c2 d2` to
    * `(fact ⋈c2 d2) ⋈c1 d1` when c2 touches no d1 attribute (so the swap
    * is the plain inner-join commute, result-identical) and the estimated
    * fact⋈d2 intermediate is ≤ HALF the fact⋈d1 one (the 2× margin makes
    * the rule a no-op on its own output, so the fixed-point batch
    * terminates, and keeps near-ties in written order). A Project restores
    * the original output order. A mis-estimate costs only performance —
    * never rows: the rewrite is an equivalence.
    *
    * At 100 TB this is the shuffle-volume decision: the intermediate of
    * join 1 is the SHUFFLE INPUT of join 2, so putting the multiplying
    * join (events-per-user, lines-per-order) last shrinks every
    * intermediate exchange to the reduced side's size. Same activation
    * and catalog discipline as the other consumers ([[StatsCatalog]]).
    */
  final case class ReorderJoinsFromNdv() extends Rule[LogicalPlan]
      with org.apache.spark.sql.catalyst.expressions.PredicateHelper {
    import org.apache.spark.sql.catalyst.expressions.{Attribute, EqualTo, Expression}

    private def scanOf(p: LogicalPlan): Option[LogicalRelation] = p match {
      case lr: LogicalRelation => Some(lr)
      case Project(_, c) => scanOf(c)
      case Filter(_, c) => scanOf(c)
      case SubqueryAlias(_, c) => scanOf(c)
      case _ => None
    }

    /** Column pruning interposes attribute-only Projects between the
      * joins of a chain; they carry no computation, so the match looks
      * through them (the swapped tree's top Project restores exactly the
      * original output, re-pruning what the stripped one did) — and the
      * pairwise swap then composes: each fixed-point pass bubbles the
      * smallest-factor dim one join further down, so longer chains sort. */
    private def stripAttrProject(p: LogicalPlan): LogicalPlan = p match {
      case Project(exprs, c) if exprs.forall(_.isInstanceOf[Attribute]) =>
        stripAttrProject(c)
      case other => other
    }

    /** NDV of `a`, resolved by exprId into any covered scan under `p`. */
    private def ndvOf(p: LogicalPlan, a: Attribute,
        ndv: Map[(String, String), Long]): Option[Long] =
      p.collect { case lr: LogicalRelation => lr }.iterator.flatMap { lr =>
        lr.output.find(_.exprId == a.exprId).flatMap(sa =>
          StatsCatalog.tableOf(lr).flatMap(t => ndv.get((t, sa.name))))
      }.nextOption()

    /** Row estimate for a single-scan dim: the catalog count, refined by
      * the classic 1/NDV equality-filter selectivity for each
      * `col = literal` conjunct on a covered column — but ONLY where the
      * estimator is in its accurate regime (NDV ≥ 100): the raw integer
      * HLL floors tiny cardinalities at ~45, and dividing by a floored
      * NDV would overstate a small-domain filter's selectivity ~9× (a
      * 5-value column priced as 45), flipping the estimate's bias from
      * conservative to eager. Unrefinable filters contribute nothing —
      * they only shrink the true rows, the conservative direction. */
    private def scanRows(dim: LogicalPlan, rows: Map[String, Long],
        ndv: Map[(String, String), Long]): Option[Long] = {
      def filterNdvs(p: LogicalPlan): Seq[Long] = p match {
        case Filter(cond, c) =>
          splitConjunctivePredicates(cond).flatMap {
            case EqualTo(a: AttributeReference, l) if l.foldable =>
              ndvOf(dim, a, ndv).filter(_ >= 100L)
            case EqualTo(l, a: AttributeReference) if l.foldable =>
              ndvOf(dim, a, ndv).filter(_ >= 100L)
            case _ => None
          } ++ filterNdvs(c)
        case Project(_, c) => filterNdvs(c)
        case SubqueryAlias(_, c) => filterNdvs(c)
        case _ => Nil
      }
      scanOf(dim).flatMap(sc => StatsCatalog.tableOf(sc).flatMap(rows.get)).map { base =>
        filterNdvs(dim).foldLeft(base)((r, n) => math.max(1L, r / math.max(1L, n)))
      }
    }

    /** The dim's REDUCTION FACTOR against the chain: System-R gives
      * |L ⋈k d| = |L|·|d| / max(ndv(L.k), ndv(d.k)), so with |L| common
      * to both swap candidates the comparison only needs each dim's
      * (rows(d), key NDV) pair — position-independent numbers (the key
      * NDVs resolve by exprId into the scans wherever the chain puts
      * them), which is what makes the pairwise bubble terminate. rows(d)
      * comes from the catalog when the dim traces to a single covered
      * scan, or from the ∏NDV grouped bound when it is an aggregate over
      * one (the broadcast flip's own dim shape — grouping attrs keep
      * their scan exprIds, so the key NDV resolves through the Aggregate
      * unchanged); both are upper-ish, the same discipline as the other
      * consumers. Any untraceable piece yields None, join stays put. */
    private def factor(left: LogicalPlan, dim: LogicalPlan, cond: Expression,
        rows: Map[String, Long], ndv: Map[(String, String), Long]): Option[(BigInt, BigInt)] = {
      // composite keys: per-pair selectivities multiply under the standard
      // independence assumption; the product is capped at
      // max(largest single-pair NDV, rows(d)) — the dim side's composite
      // NDV can never exceed its row count, so the cap reins in
      // correlation-blind inflation while never cutting BELOW what a
      // single pair already justifies. Unresolvable extra pairs and
      // non-equi conjuncts are ignored — they only shrink the true
      // result, so dropping them errs toward over-estimating the
      // candidate's join size, i.e. toward keeping the written order.
      def keyNdvs(d: LogicalPlan, c: Expression): Seq[Long] =
        splitConjunctivePredicates(c).flatMap {
          case EqualTo(a: AttributeReference, b: AttributeReference) =>
            val (la, da) =
              if (left.outputSet.contains(a) && d.outputSet.contains(b)) (Some(a), Some(b))
              else if (left.outputSet.contains(b) && d.outputSet.contains(a)) (Some(b), Some(a))
              else (None, None)
            for {
              ln <- la.flatMap(ndvOf(left, _, ndv))
              dn <- da.flatMap(ndvOf(d, _, ndv))
            } yield math.max(1L, math.max(ln, dn))
          case _ => None
        }
      for {
        dRows <- scanRows(dim, rows, ndv)
          .orElse(groupedRowBound(dim, ndv).map(_._1))
        ks = keyNdvs(dim, cond)
        if ks.nonEmpty
      } yield (BigInt(dRows),
        ks.map(BigInt(_)).product.min(BigInt(math.max(ks.max, math.max(1L, dRows)))))
    }

    override def apply(plan: LogicalPlan): LogicalPlan = {
      val dir = conf.getConfString(DirKey, "")
      if (dir.isEmpty) plan
      else {
        val spark = SparkSession.active
        val rows = StatsCatalog.rows(spark, dir)
        val stats = lookup(spark, dir)
        if (rows.isEmpty || stats.isEmpty) plan
        else plan.transformUp {
          case j2 @ Join(l0, d2, Inner, Some(c2), JoinHint.NONE) =>
            stripAttrProject(l0) match {
              case Join(f, d1, Inner, Some(c1), JoinHint.NONE)
                  if c2.references.subsetOf(f.outputSet ++ d2.outputSet) =>
                (factor(f, d1, c1, rows, stats),
                  factor(f, d2, c2, rows, stats)) match {
                  // swap iff rows(d2)/k2 ≤ (rows(d1)/k1) / 2 — exact
                  // cross-multiplied; the 2x margin makes the comparator a
                  // strict partial order, so the adjacent-swap bubble
                  // strictly reduces inversions and the batch terminates
                  case (Some((r1, k1)), Some((r2, k2))) if r2 * k1 * 2 <= r1 * k2 =>
                    Project(j2.output,
                      Join(Join(f, d2, Inner, Some(c2), JoinHint.NONE),
                        d1, Inner, Some(c1), JoinHint.NONE))
                  case _ => j2
                }
              case _ => j2
            }
        }
      }
    }
  }

  /** The SECOND stats consumer (VERDICT r11 item 6) — the q202 lesson:
    * generator fan-out is invisible to Spark's size-only estimation.
    * `Generate(explode(col))` forwards roughly its child's sizeInBytes,
    * so a small scan that explodes a k-element array column looks k×
    * smaller than it is and the planner happily BROADCASTS the exploded
    * side — an under-estimation that ships k× the expected bytes to every
    * executor (the inverse blindness of [[BroadcastFromSketchStats]]:
    * there Spark over-estimates and misses a broadcast; here it
    * under-estimates and picks a bad one).
    *
    * The rule corrects with the persisted per-(table, array column) avg
    * element count: when a join side contains an explode of a
    * stats-covered scan column, its naive estimate is ≤ the broadcast
    * threshold (so the planner WOULD build on it), but naive × avg_len
    * exceeds the threshold, the side gets a NO_BROADCAST_HASH hint. The
    * veto direction is safe by construction: a wrongly-vetoed broadcast
    * degrades to a shuffled join; a wrongly-granted one degrades to an
    * OOM-shaped driver/executor spike at 100 TB. Same activation and
    * catalog discipline as the NDV consumer ([[StatsCatalog]]).
    */
  final case class VetoBroadcastOnFanout() extends Rule[LogicalPlan] {
    import org.apache.spark.sql.catalyst.expressions.ExplodeBase

    /** Corrected-size veto check: true when `p` would be size-eligible
      * for broadcast but an explode of a covered array column makes the
      * corrected estimate exceed the threshold. */
    private def fanoutBlows(p: LogicalPlan,
        fan: Map[(String, String), (Long, Long)], threshold: Long): Boolean = {
      val naive = p.stats.sizeInBytes
      naive <= threshold && p.collect { case g: Generate => g }.exists { g =>
        g.generator match {
          case e: ExplodeBase => e.child match {
            case a: AttributeReference =>
              g.child.collect {
                case lr: LogicalRelation if lr.output.exists(_.exprId == a.exprId) => lr
              }.headOption.flatMap(tableOf)
                .flatMap(t => fan.get((t, a.name)))
                .exists { case (avgLen, _) =>
                  naive * BigInt(math.max(1L, avgLen)) > threshold }
            case _ => false
          }
          case _ => false
        }
      }
    }

    private def tableOf(lr: LogicalRelation): Option[String] = StatsCatalog.tableOf(lr)

    override def apply(plan: LogicalPlan): LogicalPlan = {
      val dir = conf.getConfString(DirKey, "")
      val threshold = conf.autoBroadcastJoinThreshold
      if (dir.isEmpty || threshold <= 0) plan
      else {
        val fan = StatsCatalog.fanout(SparkSession.active, dir)
        if (fan.isEmpty) plan
        else plan.transformUp {
          case j @ Join(l, r, Inner, _, JoinHint.NONE) =>
            val veto = Some(HintInfo(strategy = Some(NO_BROADCAST_HASH)))
            val (vl, vr) =
              (fanoutBlows(l, fan, threshold), fanoutBlows(r, fan, threshold))
            if (vl || vr)
              j.copy(hint = JoinHint(if (vl) veto else None, if (vr) veto else None))
            else j
        }
      }
    }
  }
}
