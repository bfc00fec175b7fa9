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
      spark.experimental.extraOptimizations = cur :+ BroadcastFromSketchStats()
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

  final case class BroadcastFromSketchStats() extends Rule[LogicalPlan] {

    private def tableOf(lr: LogicalRelation): Option[String] = StatsCatalog.tableOf(lr)

    /** Sound row upper bound for a grouped side: ∏ NDV(grouping cols),
      * every grouping expr a stats-covered scan column. Filters/projects
      * between the agg and the scan only shrink rows, so the bound holds
      * through them. */
    private def groupedRowBound(p: LogicalPlan,
        stats: Map[(String, String), Long]): Option[(Long, Int)] = p match {
      case Aggregate(groupingExprs, aggExprs, child, _) if groupingExprs.nonEmpty =>
        val leaves = child.collect { case lr: LogicalRelation => lr }
        val ndvs = groupingExprs.map {
          case a: AttributeReference =>
            leaves.collectFirst {
              case lr if lr.output.exists(_.exprId == a.exprId) =>
                tableOf(lr).flatMap(t => stats.get((t, a.name)))
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
}
