package graft.plans

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.expressions._
import org.apache.spark.sql.catalyst.plans.Inner
import org.apache.spark.sql.catalyst.plans.logical.{Generate, Join, LogicalPlan, Project}
import org.apache.spark.sql.catalyst.rules.Rule
import org.apache.spark.sql.types.LongType

/** Bucketed range-join rewrite — the optimizer-rule form of q216's hand
  * rewrite (SURVEY §4.3 candidate): an INNER join whose only cross-side
  * condition is a point-in-interval predicate (`lo <= t AND t < hi`, all
  * LongType, non-negative domains — epoch micros, versions, offsets)
  * plans as a nested-loop (or worse, a cartesian) because Catalyst finds
  * no equi keys. The rule manufactures them: the point side gains
  * `bucket = t div W`, the interval side EXPLODES to the buckets its
  * `[lo, hi)` span covers, the join becomes an equi-join on bucket with
  * the ORIGINAL predicates kept as residual — result-identical by
  * construction (every qualifying pair shares the point's bucket; the
  * residual removes every spurious bucket-mate).
  *
  * Why it matters at 100 TB: a time-range join of two big relations is
  * the classic nested-loop trap — neither side broadcasts, so the naive
  * plan is quadratic. Bucketing turns it into one shuffle on bucket id
  * with per-bucket work proportional to interval width / W. The width W
  * comes from `spark.graft.rangeJoin.bucketWidth` (set it near the
  * typical interval length; 0 disables the rule) — the knob Databricks'
  * range-join hints expose, done here as a pure logical rewrite so
  * Catalyst still picks the physical join (shuffled hash / sort-merge,
  * or broadcast when one side is small).
  *
  * Bails (leaves the join untouched) when: any cross-side equality
  * already exists (Catalyst handles it), the bound/point types are not
  * LongType, or the join is not INNER.
  *
  * Operational caveat: each interval row explodes to ceil(span/W)
  * buckets — a width far below the typical interval length multiplies
  * the interval side by that factor (and Catalyst's Sequence caps array
  * sizes). Pick W within an order of magnitude of the median span; the
  * residual predicates keep ANY positive W correct.
  */
object RangeJoinRewrite {
  val WidthKey = "spark.graft.rangeJoin.bucketWidth"

  def ensure(spark: SparkSession): Unit = synchronized {
    val cur = spark.experimental.extraOptimizations
    if (!cur.exists(_.isInstanceOf[BucketRangeJoin]))
      spark.experimental.extraOptimizations = cur :+ BucketRangeJoin()
  }

  final case class BucketRangeJoin() extends Rule[LogicalPlan] with PredicateHelper {

    override def apply(plan: LogicalPlan): LogicalPlan = {
      val w =
        try conf.getConfString(WidthKey, "0").toLong
        catch { case _: NumberFormatException => 0L }
      if (w <= 0L) plan
      else plan.transformUp {
        case j @ Join(l, r, Inner, Some(cond), hint) =>
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
          lower.flatMap { case (t, lo) => upper(t).map(hi => (t, lo, hi)) } match {
            case Some((t, lo, hi)) if !hasEqui &&
                t.dataType == LongType && lo.dataType == LongType &&
                hi.dataType == LongType &&
                // point on one side, BOTH bounds on the other
                (if (fromLeft(t)) fromRight(lo) && fromRight(hi)
                 else fromLeft(lo) && fromLeft(hi)) =>
              val tLeft = fromLeft(t)
              val bucketAlias = Alias(IntegralDivide(t, Literal(w)), "__rj_bucket")()
              val gAttr = AttributeReference("__rj_b", LongType, nullable = true)()
              // Sequence is TimeZoneAware even over Longs — without an
              // explicit zone the post-analysis plan counts as unresolved.
              // Empty/degenerate intervals (hi <= lo) must yield zero
              // buckets, not a Sequence boundary error the naive join
              // never raised — hence the If guard.
              val seq = If(GreaterThan(hi, lo),
                new Sequence(
                  IntegralDivide(lo, Literal(w)),
                  IntegralDivide(Subtract(hi, Literal(1L)), Literal(w)),
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
              Project(j.output, Join(nl, nr, Inner, Some(newCond), hint))
            case _ => j
          }
      }
    }
  }
}
