package graft.functions

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression, ExpressionInfo, UnaryExpression}
import org.apache.spark.sql.types.{DataType, IntegerType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Custom Catalyst expressions for the package-metadata layer (SURVEY.md
  * §4.3): native `Expression`s, not Scala UDFs, so null handling is uniform
  * and Catalyst can constant-fold literal arguments (a UDF is a black box —
  * these are foldable, so `version_compare(v, '2.6.0')` against a literal
  * costs one string walk per row with no serialization). CodegenFallback to
  * start; `doGenCode` only if a bench gap demands it (SURVEY.md hard part
  * #5 — these sit outside the relational hot path).
  */
case class VersionCompare(left: Expression, right: Expression)
    extends BinaryExpression with CodegenFallback {
  override def dataType: DataType = IntegerType
  override protected def nullSafeEval(l: Any, r: Any): Any =
    VersionOrder.compare(l.asInstanceOf[UTF8String].toString, r.asInstanceOf[UTF8String].toString)
  override protected def withNewChildrenInternal(newLeft: Expression, newRight: Expression): VersionCompare =
    copy(left = newLeft, right = newRight)
  override def prettyName: String = "version_compare"
}

case class VersionSortKey(child: Expression)
    extends UnaryExpression with CodegenFallback {
  override def dataType: DataType = StringType
  override protected def nullSafeEval(v: Any): Any =
    UTF8String.fromString(VersionOrder.sortKey(v.asInstanceOf[UTF8String].toString))
  override protected def withNewChildInternal(newChild: Expression): VersionSortKey =
    copy(child = newChild)
  override def prettyName: String = "version_sort_key"
}

/** Registration: both an idempotent per-session helper (works whatever
  * session the driver hands us) and the `SparkSessionExtensions` injection
  * path (`spark.sql.extensions=graft.GraftExtensions`) — the Spark-native
  * equivalent of the reference's Starlark script registry (SURVEY.md §2.10).
  */
object GraftFunctions {
  val all: Seq[(String, ExpressionInfo, Seq[Expression] => Expression)] = Seq(
    ("version_compare",
      new ExpressionInfo(classOf[VersionCompare].getName, "version_compare"),
      (args: Seq[Expression]) => VersionCompare(args(0), args(1))),
    ("version_sort_key",
      new ExpressionInfo(classOf[VersionSortKey].getName, "version_sort_key"),
      (args: Seq[Expression]) => VersionSortKey(args.head)))

  /** Idempotent: safe to call at the top of every query builder. */
  def ensureRegistered(spark: SparkSession): Unit = {
    val registry = spark.sessionState.functionRegistry
    all.foreach { case (name, info, builder) =>
      val id = FunctionIdentifier(name)
      if (!registry.functionExists(id)) registry.registerFunction(id, info, builder)
    }
  }
}
