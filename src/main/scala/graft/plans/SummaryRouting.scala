package graft.plans

import java.util.concurrent.ConcurrentHashMap

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.catalyst.expressions.{Alias, AttributeReference, Literal, NamedExpression}
import org.apache.spark.sql.catalyst.expressions.aggregate.{AggregateExpression, Count, Sum}
import org.apache.spark.sql.catalyst.plans.logical.{Aggregate, LogicalPlan, Project}
import org.apache.spark.sql.catalyst.rules.Rule
import org.apache.spark.sql.execution.datasources.{HadoopFsRelation, LogicalRelation}

/** Materialized-summary routing — the engine's optimizer `Rule[LogicalPlan]`
  * (the third Catalyst extension surface next to the custom Expressions and
  * the AsOfJoin LogicalPlan/Strategy/SparkPlan): an `Aggregate` whose
  * grouping columns and aggregate functions are exactly covered by a
  * REGISTERED pre-aggregated summary is rewritten to a scan of that
  * summary. This is the materialized-view acceleration every warehouse
  * ships: at 100 TB a daily dashboard's `GROUP BY` re-reads the fact table
  * on every refresh; with the summary registered the same query reads the
  * MB-scale rollup instead — transparently, query text unchanged.
  *
  * Soundness contract (the rule checks everything it can; the caller owns
  * the freshness of the summary itself, exactly as with any MV):
  *   - the aggregate's child must be the registered base relation (bare or
  *     behind a column-pruning Project — anything else, e.g. a Filter,
  *     bails: a filtered aggregate is NOT covered by a total rollup),
  *   - grouping must be plain attributes equal as a SET to the registered
  *     group columns,
  *   - every output must be a grouping attribute, `count(1)`/`count(*)`
  *     (non-distinct), or a non-distinct `sum` over a registered base
  *     column whose summary column has the identical result type,
  *   - rewritten outputs keep the original exprIds, so parent operators
  *     resolve untouched.
  *
  * Registered per (session, base-path suffix); `ensure` installs the rule
  * through `spark.experimental.extraOptimizations` (the runtime-injection
  * twin of `SparkSessionExtensions.injectOptimizerRule`).
  */
object SummaryRouting {
  final case class Summary(groupCols: Seq[String], plan: LogicalPlan,
      countCol: Option[String], sums: Map[String, String])

  private val reg = new ConcurrentHashMap[(SparkSession, String), Summary]()

  /** Register `summary` (one row per group, exact totals) for aggregates
    * over the base relation whose file path ends with `basePathSuffix`.
    * `countCol` holds count(*); `sums` maps base column → summary column.
    */
  def register(spark: SparkSession, basePathSuffix: String, summary: DataFrame,
      groupCols: Seq[String], countCol: Option[String],
      sums: Map[String, String]): Unit = {
    val out = summary.queryExecution.analyzed.output.map(_.name).toSet
    require((groupCols ++ countCol ++ sums.values).forall(out.contains),
      s"summary is missing columns: ${(groupCols ++ countCol ++ sums.values).filterNot(out.contains).mkString(",")}")
    reg.put((spark, basePathSuffix), Summary(groupCols, summary.queryExecution.analyzed, countCol, sums))
    ensure(spark)
  }

  /** Drop every registration for the session (tests; bounded sessions). */
  def clear(spark: SparkSession): Unit = {
    reg.keySet.removeIf(_._1 eq spark)
    ()
  }

  /** Install the rule on the session once. */
  def ensure(spark: SparkSession): Unit = synchronized {
    val cur = spark.experimental.extraOptimizations
    if (!cur.exists(_.isInstanceOf[RouteToSummary]))
      spark.experimental.extraOptimizations = cur :+ RouteToSummary(spark)
  }

  final case class RouteToSummary(spark: SparkSession) extends Rule[LogicalPlan] {
    private def baseRelation(plan: LogicalPlan): Option[LogicalRelation] = plan match {
      case l: LogicalRelation => Some(l)
      case Project(pl, l: LogicalRelation) if pl.forall(_.isInstanceOf[AttributeReference]) =>
        Some(l)
      case _ => None
    }

    private def summaryFor(rel: LogicalRelation): Option[Summary] =
      rel.relation match {
        case fs: HadoopFsRelation =>
          import scala.jdk.CollectionConverters._
          reg.entrySet().asScala.collectFirst {
            case e if (e.getKey._1 eq spark) &&
              fs.location.rootPaths.exists(_.toString.endsWith(e.getKey._2)) => e.getValue
          }
        case _ => None
      }

    override def apply(plan: LogicalPlan): LogicalPlan = {
      val diag = conf.getConfString(RuleDiag.EnabledKey, "false").toBoolean
      plan.transformUp {
        // "why didn't my query hit the summary" is THE operator question
        // for any MV system, so every aggregate over a REGISTERED base
        // relation records its routing decision (VERDICT r15 item 1's
        // discipline applied to the sixth rule family); aggregates over
        // unregistered relations stay silent — they are not candidates.
        case agg @ Aggregate(_, _, child, _)
            if diag && baseRelation(child).isEmpty &&
              child.collectFirst {
                case lr: LogicalRelation if summaryFor(lr).isDefined => lr
              }.nonEmpty =>
          // a registered base IS under this aggregate, but something sits
          // between them (a Filter etc.) — the total rollup cannot cover it
          RuleDiag.record("summary-routing", "bailed", "non-bare-base", agg)
          agg
        case agg @ Aggregate(groupExprs, aggExprs, child, _)
            if baseRelation(child).flatMap(summaryFor).isDefined =>
          val summary = baseRelation(child).flatMap(summaryFor).get
          val resolver = spark.sessionState.analyzer.resolver
          def sCol(n: String) = summary.plan.output.find(a => resolver(a.name, n))
          val groupAttrs = groupExprs.collect { case a: AttributeReference => a }
          val groupsMatch = groupAttrs.length == groupExprs.length &&
            groupAttrs.map(_.name).toSet == summary.groupCols.toSet
          // each output must translate to a summary column of identical type
          def translate(ne: NamedExpression): Option[NamedExpression] = ne match {
            case a: AttributeReference if summary.groupCols.contains(a.name) =>
              sCol(a.name).filter(_.dataType == a.dataType)
                .map(s => Alias(s, a.name)(exprId = a.exprId))
            case al @ Alias(AggregateExpression(Count(Seq(Literal(1, _))), _, false, _, _), name) =>
              summary.countCol.flatMap(sCol).filter(_.dataType == al.dataType)
                .map(s => Alias(s, name)(exprId = al.exprId))
            case al @ Alias(AggregateExpression(Sum(a: AttributeReference, _), _, false, _, _), name) =>
              summary.sums.get(a.name).flatMap(sCol).filter(_.dataType == al.dataType)
                .map(s => Alias(s, name)(exprId = al.exprId))
            case _ => None
          }
          val translated = aggExprs.map(translate)
          if (groupsMatch && translated.forall(_.isDefined)) {
            if (diag) RuleDiag.record("summary-routing", "fired", "routed", agg)
            Project(translated.map(_.get), summary.plan)
          } else {
            if (diag)
              RuleDiag.record("summary-routing", "bailed",
                if (!groupsMatch) "grouping-mismatch" else "uncovered-aggregate", agg)
            agg
          }
      }
    }
  }
}
