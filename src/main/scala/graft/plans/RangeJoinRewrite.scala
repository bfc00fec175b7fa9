package graft.plans

import java.util.concurrent.ConcurrentHashMap

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.expressions._
import org.apache.spark.sql.catalyst.plans.{Inner, LeftOuter, RightOuter}
import org.apache.spark.sql.catalyst.plans.logical.{Generate, Join, LogicalPlan, Project}
import org.apache.spark.sql.catalyst.rules.Rule
import org.apache.spark.sql.functions.{col, expr, max => fmax}
import org.apache.spark.sql.types.{LongType, TimestampNTZType, TimestampType}

/** Bucketed range-join rewrite — the optimizer-rule form of q216's hand
  * rewrite (SURVEY §4.3 candidate): an INNER join whose only cross-side
  * condition is a point-in-interval predicate (`lo <= t AND t < hi`) plans
  * as a nested-loop (or worse, a cartesian) because Catalyst finds no equi
  * keys. The rule manufactures them: the point side gains
  * `bucket = t div W`, the interval side EXPLODES to the buckets its
  * `[lo, hi)` span covers, the join becomes an equi-join on bucket with
  * the ORIGINAL predicates kept as residual — result-identical by
  * construction (every qualifying pair shares the point's bucket; the
  * residual removes every spurious bucket-mate).
  *
  * Why it matters at 100 TB: a time-range join of two big relations is
  * the classic nested-loop trap — neither side broadcasts, so the naive
  * plan is quadratic. Bucketing turns it into one shuffle on bucket id
  * with per-bucket work proportional to interval width / W.
  *
  * Width selection (r11, VERDICT r10 item 2): when
  * `spark.graft.rangeJoin.bucketWidth` is set (> 0) it is the base width —
  * the knob Databricks' range-join hints expose. When UNSET, the rule
  * derives W itself with one bounded planning-time probe over the
  * interval side: W = median interval span (percentile_approx 0.5), the
  * width at which a typical interval covers ~1–2 buckets. Either way the
  * EXPLOSION GUARD (ADVICE r10) then applies: the same probe's exact
  * max-span raises W to ceil(maxSpan / maxBucketsPerInterval) if any row
  * would otherwise explode past `spark.graft.rangeJoin.maxBucketsPerInterval`
  * (default 4096) Sequence elements — a mis-set width now degrades toward
  * the naive join's economics instead of failing on Spark's array-size
  * cap. Any W > 0 is CORRECT (the residual repairs every bucket
  * boundary); width only tunes the explosion/selectivity trade. The probe
  * is one aggregate over the interval side (the small side of the
  * pattern), executed at planning and memoized per (canonical interval
  * plan, session) so re-executions re-use it.
  *
  * Type lowering (r11, VERDICT r10 item 6): TimestampType and
  * TIMESTAMP_NTZ points/bounds are lowered to epoch micros inside the
  * rule (the internal representation — NTZ via an explicit-UTC cast, so
  * the mapping is injective and order-preserving under any session
  * timezone), so event-time range joins rewrite without a hand
  * `unix_micros` cast. LongType joins pass through unchanged.
  *
  * Join types (r12, VERDICT r11 "missing" 6): INNER, plus LEFT/RIGHT
  * OUTER when the PRESERVED side is the point side — "every event keeps
  * its row, matched windows attach or null out". Soundness: a point lies
  * in exactly one bucket and the interval side emits each covered bucket
  * once, so each qualifying (point, interval) pair matches exactly once
  * after the rewrite, and an unmatched point row null-extends exactly
  * once — outer semantics are preserved verbatim. The mirrored shape
  * (preserved INTERVAL side) is NOT rewritten: the preserved side is the
  * exploded one there, and an unmatched interval row would null-extend
  * once PER BUCKET — the rule bails and the naive join stands.
  *
  * Bails (leaves the join untouched) when: any cross-side equality
  * already exists (Catalyst handles it), the bound/point types are not
  * all the same type in {LongType, TimestampType, TimestampNTZType},
  * the join type is not Inner/LeftOuter/RightOuter (or the outer's
  * preserved side is not the point side), or width
  * derivation finds an empty/degenerate interval side with no manual
  * width to fall back on.
  */
object RangeJoinRewrite {
  val WidthKey = "spark.graft.rangeJoin.bucketWidth"
  val MaxBucketsKey = "spark.graft.rangeJoin.maxBucketsPerInterval"
  /** Explicit off-switch (the old `WidthKey = 0` disable still works). */
  val EnabledKey = "spark.graft.rangeJoin.enabled"

  def ensure(spark: SparkSession): Unit = synchronized {
    val cur = spark.experimental.extraOptimizations
    if (!cur.exists(_.isInstanceOf[BucketRangeJoin]))
      spark.experimental.extraOptimizations = cur :+ BucketRangeJoin()
  }

  /** (medianSpan, maxSpan) of the interval side, memoized by the canonical
    * hashes of the child plan AND both bound expressions (ADVICE r11: two
    * range joins sharing an interval child but different bound columns must
    * not collide — a colliding maxSpan weakens the explosion guard, which
    * is a runtime Sequence failure, not just a width choice). Entries
    * expire after [[SpanTtlNanos]] so data appended under the same path
    * re-probes instead of reusing stale spans. Collisions or stale entries
    * within the TTL only change the chosen width, never the join's result
    * (residual predicates repair any W > 0). */
  private val spanCache =
    new ConcurrentHashMap[(Int, Int, Int), ((Long, Long), Long)]()
  private val SpanTtlNanos = 10L * 60 * 1000 * 1000 * 1000 // 10 min

  /** Re-entrancy guard (VERDICT r11 item 3, same lesson as
    * [[SketchStats]]): the probe is itself a query, and ITS optimization
    * runs BucketRangeJoin again on this thread. Today's probe plans carry
    * no cross-side range join, but that is an accident of plan shape —
    * the guard makes the inner pass return None (derived width
    * unavailable; manual knob still honored, else the naive join stands),
    * which is always correct. */
  private val probing = new ThreadLocal[Boolean] { override def initialValue = false }

  private[plans] def probeSpans(spark: SparkSession, child: LogicalPlan,
      lo: Expression, hi: Expression): Option[(Long, Long)] = {
    if (probing.get()) return None
    val key = (child.canonicalized.hashCode(),
      lo.canonicalized.hashCode(), hi.canonicalized.hashCode())
    val now = System.nanoTime()
    Option(spanCache.get(key)).collect {
      case (v, born) if now - born < SpanTtlNanos => v
    }.orElse {
      probing.set(true)
      try {
        val span = Alias(Subtract(hi, lo), "__rj_span")()
        val df = org.apache.spark.sql.graftbridge.PlanBridge
          .ofRows(spark, Project(Seq(span), child))
          .filter(col("__rj_span") > 0L)
          .agg(expr("percentile_approx(__rj_span, 0.5)").as("med"),
            fmax(col("__rj_span")).as("mx"))
        val row = df.head()
        if (row.isNullAt(0) || row.isNullAt(1)) None
        else {
          val v = (row.getLong(0), row.getLong(1))
          if (spanCache.size > 128) spanCache.clear()
          spanCache.put(key, (v, now))
          Some(v)
        }
      } finally probing.set(false)
    }
  }

  /** Resolve `e` to the (table, column) of the file scan that produced it
    * — bare attribute traced by exprId through whatever projections sit
    * above the scan; anything computed bails (conservative, same
    * discipline as SketchStats' grouping trace). */
  private[plans] def scanColumn(child: LogicalPlan, e: Expression): Option[(String, String)] =
    e match {
      case a: AttributeReference =>
        child.collect {
          case lr: org.apache.spark.sql.execution.datasources.LogicalRelation
              if lr.output.exists(_.exprId == a.exprId) => lr
        }.headOption.flatMap(lr => StatsCatalog.tableOf(lr).map(t => (t, a.name)))
      case _ => None
    }

  /** Catalog-first span resolution (VERDICT r11 item 2): when both bounds
    * trace to columns of ONE scanned table and the persisted stats store
    * carries a span row for that (table, lo, hi), planning pays a bounded
    * catalog read instead of scanning the interval side — at 100 TB the
    * difference between planning in milliseconds and planning paying a
    * full table scan. Falls back to the planning-time probe on a miss. */
  private[plans] def resolveSpans(session: SparkSession, statsDir: String,
      boundChild: LogicalPlan, lo: Expression, hi: Expression,
      loM: Expression, hiM: Expression): Option[(Long, Long)] =
    resolveSpansTagged(session, statsDir, boundChild, lo, hi, loM, hiM)._1

  /** [[resolveSpans]] plus WHERE the spans came from — "catalog-width" or
    * "probe-width" — for the diagnostics surface (VERDICT r15 item 1). */
  private[plans] def resolveSpansTagged(session: SparkSession, statsDir: String,
      boundChild: LogicalPlan, lo: Expression, hi: Expression,
      loM: Expression, hiM: Expression): (Option[(Long, Long)], String) = {
    val fromCatalog =
      if (statsDir.isEmpty) None
      else for {
        (lt, lc) <- scanColumn(boundChild, lo)
        (ht, hc) <- scanColumn(boundChild, hi)
        if lt == ht
        v <- StatsCatalog.spans(session, statsDir).get((lt, lc, hc))
      } yield v
    fromCatalog match {
      case Some(v) => (Some(v), "catalog-width")
      case None => (probeSpans(session, boundChild, loM, hiM), "probe-width")
    }
  }

  final case class BucketRangeJoin() extends Rule[LogicalPlan] with PredicateHelper {

    override def apply(plan: LogicalPlan): LogicalPlan = {
      val enabled = conf.getConfString(EnabledKey, "true").toBoolean
      val wManual =
        try conf.getConfString(WidthKey, "-1").toLong
        catch { case _: NumberFormatException => -1L }
      val maxBuckets =
        try math.max(1L, conf.getConfString(MaxBucketsKey, "4096").toLong)
        catch { case _: NumberFormatException => 4096L }
      if (!enabled || wManual == 0L) plan // 0 = the historical off-switch
      else plan.transformUp {
        case j @ Join(l, r, jt, Some(cond), hint)
            if jt == Inner || jt == LeftOuter || jt == RightOuter =>
          val conj = splitConjunctivePredicates(cond)
          def fromLeft(e: Expression) = e.references.nonEmpty && e.references.subsetOf(l.outputSet)
          def fromRight(e: Expression) = e.references.nonEmpty && e.references.subsetOf(r.outputSet)
          def crossSide(a: Expression, b: Expression) =
            (fromLeft(a) && fromRight(b)) || (fromRight(a) && fromLeft(b))
          val hasEqui = conj.exists {
            case EqualTo(a, b) => crossSide(a, b)
            case _ => false
          }
          // (point, lower, upper) with point on one side, bounds on the other
          val lower = conj.collectFirst {
            case GreaterThanOrEqual(t, lo) if crossSide(t, lo) => (t, lo)
            case LessThanOrEqual(lo, t) if crossSide(lo, t) => (t, lo)
          }
          val upper = (t: Expression) => conj.collectFirst {
            case LessThan(u, hi) if u.semanticEquals(t) && crossSide(u, hi) => hi
            case GreaterThan(hi, u) if u.semanticEquals(t) && crossSide(hi, u) => hi
          }
          val diag = conf.getConfString(graft.plans.RuleDiag.EnabledKey, "false").toBoolean
          def bail(reason: String): Join = {
            if (diag) RuleDiag.record("range-join", "bailed", reason, j)
            j
          }
          lower.flatMap { case (t, lo) => upper(t).map(hi => (t, lo, hi)) } match {
            case Some(_) if hasEqui =>
              // Catalyst already has equi keys — the rewrite has nothing
              // to add; say so rather than staying silent
              bail("equi-exists")
            case Some((t, lo, hi)) if !(Seq(t, lo, hi).forall(_.dataType == LongType) ||
                 Seq(t, lo, hi).forall(_.dataType == TimestampType) ||
                 Seq(t, lo, hi).forall(_.dataType == TimestampNTZType)) =>
              bail("type-mismatch")
            case Some((t, lo, hi)) =>
              // point on one side, BOTH bounds on the other
              val sidesOk =
                if (fromLeft(t)) fromRight(lo) && fromRight(hi)
                else if (fromRight(t)) fromLeft(lo) && fromLeft(hi)
                else false
              // outer joins only when the preserved side is the point side
              // (see scaladoc: the exploded side must be the non-preserved
              // one, or unmatched rows would null-extend once per bucket)
              val typeOk = jt match {
                case Inner => true
                case LeftOuter => fromLeft(t)
                case RightOuter => fromRight(t)
                case _ => false
              }
              if (!sidesOk) bail("sides-mismatch")
              else if (!typeOk) bail("preserved-interval-side")
              else {
                // Timestamp types lower to their internal epoch-micros
                // Long — strictly monotone and injective, so bucket
                // containment survives the mapping exactly (VERDICT r10
                // item 6). NTZ goes through an EXPLICIT-UTC cast: that
                // reinterprets the internal wall-clock micros verbatim
                // (UTC is offset 0), so the mapping stays injective and
                // order-preserving under ANY session timezone — a
                // session-zone cast would not be (DST gaps collide).
                def micros(e: Expression): Expression = e.dataType match {
                  case TimestampType => UnixMicros(e)
                  case TimestampNTZType =>
                    UnixMicros(Cast(e, TimestampType, Some("UTC")))
                  case _ => e
                }
                val (tM, loM, hiM) = (micros(t), micros(lo), micros(hi))
                val boundChild = if (fromLeft(t)) r else l
                val session = SparkSession.active
                val statsDir = conf.getConfString(StatsCatalog.DirKey, "")
                lazy val spansTagged =
                  resolveSpansTagged(session, statsDir, boundChild, lo, hi, loM, hiM)
                lazy val spans = spansTagged._1
                val wBase =
                  if (wManual > 0L) Some(wManual)
                  else spans.map { case (med, _) => math.max(1L, med) }
                val wGuarded = wBase.map { w0 =>
                  spans match {
                    case Some((_, mx)) =>
                      val need = (mx + maxBuckets - 1) / maxBuckets
                      math.max(w0, math.max(1L, need))
                    case None => w0
                  }
                }
                wGuarded match {
                  case None =>
                    // empty/degenerate interval side, no knob — naive join is fine
                    bail("degenerate-interval")
                  case Some(w) =>
                    if (diag) RuleDiag.record("range-join", "fired",
                      if (wManual > 0L) "manual-width" else spansTagged._2, j)
                    val tLeft = fromLeft(t)
                    val bucketAlias = Alias(IntegralDivide(tM, Literal(w)), "__rj_bucket")()
                    val gAttr = AttributeReference("__rj_b", LongType, nullable = true)()
                    // Sequence is TimeZoneAware even over Longs — without an
                    // explicit zone the post-analysis plan counts as unresolved.
                    // Empty/degenerate intervals (hi <= lo) must yield zero
                    // buckets, not a Sequence boundary error the naive join
                    // never raised — hence the If guard.
                    val seq = If(GreaterThan(hiM, loM),
                      new Sequence(
                        IntegralDivide(loM, Literal(w)),
                        IntegralDivide(Subtract(hiM, Literal(1L)), Literal(w)),
                        Some(Literal(1L))).withTimeZone(conf.sessionLocalTimeZone),
                      Literal.create(Seq.empty[Long],
                        org.apache.spark.sql.types.ArrayType(LongType, containsNull = false)))
                    def pointProj(p: LogicalPlan) = Project(p.output :+ bucketAlias, p)
                    def boundGen(p: LogicalPlan) =
                      Generate(Explode(seq), unrequiredChildIndex = Nil, outer = false,
                        qualifier = None, generatorOutput = Seq(gAttr), child = p)
                    val (nl, nr) =
                      if (tLeft) (pointProj(l), boundGen(r)) else (boundGen(l), pointProj(r))
                    val newCond = (EqualTo(bucketAlias.toAttribute, gAttr) +: conj)
                      .reduce(And)
                    Project(j.output, Join(nl, nr, jt, Some(newCond), hint))
                }
              }
            case _ => j
          }
      }
    }
  }
}
