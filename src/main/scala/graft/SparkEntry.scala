package graft

import scala.collection.immutable.ListMap

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Driver contract — the judged query surface (SURVEY.md §2, §7).
  *
  * Every named query maps a (SparkSession, fixtureDir) pair to a DataFrame;
  * `oracleSql` carries the DuckDB-equivalent SQL for the driver's hash
  * compare. Queries are grouped by SURVEY.md milestone in the objects under
  * `graft.queries`.
  */
object SparkEntry {
  /** Flagship query on /root/testdata/sf0.001; driver smoke-checks rows>0. */
  def entry(spark: SparkSession): DataFrame =
    queries("q01_pricing_summary")(spark, "/root/testdata/sf0.001")

  private def modules: Seq[(Seq[(String, (SparkSession, String) => DataFrame)], Seq[(String, String)])] =
    Seq(
      (_root_.graft.queries.Relational.queries, _root_.graft.queries.Relational.oracles),
      (_root_.graft.queries.Events.queries, _root_.graft.queries.Events.oracles),
      (_root_.graft.queries.Packages.queries, _root_.graft.queries.Packages.oracles),
      (_root_.graft.queries.Resolution.queries, _root_.graft.queries.Resolution.oracles),
      (_root_.graft.queries.Text.queries, _root_.graft.queries.Text.oracles),
      (_root_.graft.queries.Dedup.queries, _root_.graft.queries.Dedup.oracles),
      (_root_.graft.queries.Vectors.queries, _root_.graft.queries.Vectors.oracles),
      (_root_.graft.queries.Multimodal.queries, _root_.graft.queries.Multimodal.oracles),
      (_root_.graft.queries.Archives.queries, _root_.graft.queries.Archives.oracles),
      (_root_.graft.queries.Extras.queries, _root_.graft.queries.Extras.oracles),
      (_root_.graft.queries.Analytics.queries, _root_.graft.queries.Analytics.oracles),
      (_root_.graft.queries.Mining.queries, _root_.graft.queries.Mining.oracles),
      (_root_.graft.queries.Advanced.queries, _root_.graft.queries.Advanced.oracles),
      (_root_.graft.queries.StatsStore.queries, _root_.graft.queries.StatsStore.oracles),
      (_root_.graft.queries.StreamServe.queries, _root_.graft.queries.StreamServe.oracles))

  /** One entry per implemented operator from SURVEY.md §2 (insertion-ordered
    * so Verify/Bench output is stable).
    */
  def queries: Map[String, (SparkSession, String) => DataFrame] =
    ListMap(modules.flatMap(_._1).map { case (name, fn) =>
      // every query is self-contained: the custom-function registry rides
      // the entry point, so a query whose build step was satisfied by a
      // PERSISTED store from an earlier JVM (index/stats generations under
      // tmpdir) still resolves array_dot & co. — registration is
      // idempotent and a no-op after the first query on a session
      name -> { (s: SparkSession, dir: String) =>
        graft.functions.GraftFunctions.ensureRegistered(s)
        fn(s, dir)
      }
    }: _*)

  /** For each key in `queries`, equivalent ANSI SQL runnable by DuckDB on
    * the same parquet tables. Omitted for ops whose semantics DuckDB cannot
    * reproduce (custom hash functions etc.) → driver records rows-only.
    */
  def oracleSql: Map[String, String] =
    ListMap(modules.flatMap(_._2): _*)
}
