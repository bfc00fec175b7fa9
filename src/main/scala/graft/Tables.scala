package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Loaders for the driver-generated fixture tables (TESTDATA.md) plus derived
  * package-metadata views.
  *
  * The reference, tinyrange/pkg2, is a package-metadata engine
  * (`/root/reference/README.md:1`): a uniform, queryable database of package
  * records with depends/provides relationship lists and a fetch-then-cache
  * ingest layer (`/root/reference/.vscode/settings.json:9`). The snapshot
  * carries no code, so the `packages`/`depends` views here are deterministic
  * synthetic derivations over the `part` fixture shaped like the reference's
  * record model (SURVEY.md §1.1, §7 M2). Every derivation below is pure
  * integer/string arithmetic on fixture columns so the DuckDB oracle can
  * reproduce it exactly.
  *
  * Scale notes (100 TB): all loaders return plain parquet scans — predicate
  * pushdown and column pruning reach the file scan untouched. No caching or
  * collect here; derived views are narrow projections (no shuffle).
  */
object Tables {
  val names: Seq[String] = Seq(
    "region", "nation", "customer", "supplier", "part",
    "orders", "lineitem", "events", "documents", "embeddings")

  private def read(spark: SparkSession, dir: String, name: String): DataFrame =
    spark.read.parquet(s"$dir/$name.parquet")

  def region(spark: SparkSession, dir: String): DataFrame   = read(spark, dir, "region")
  def nation(spark: SparkSession, dir: String): DataFrame   = read(spark, dir, "nation")
  def customer(spark: SparkSession, dir: String): DataFrame = read(spark, dir, "customer")
  def supplier(spark: SparkSession, dir: String): DataFrame = read(spark, dir, "supplier")
  def part(spark: SparkSession, dir: String): DataFrame     = read(spark, dir, "part")
  def orders(spark: SparkSession, dir: String): DataFrame   = read(spark, dir, "orders")
  def lineitem(spark: SparkSession, dir: String): DataFrame = read(spark, dir, "lineitem")
  def documents(spark: SparkSession, dir: String): DataFrame = read(spark, dir, "documents")
  def embeddings(spark: SparkSession, dir: String): DataFrame = read(spark, dir, "embeddings")

  /** `events.ts` has shipped as BOTH parquet TIMESTAMP(NANOS) and
    * TIMESTAMP(MICROS) across fixture generations, and a hard-coded
    * conversion for either silently breaks the whole events family when
    * the driver regenerates the data (round 8 lost all 18 event queries
    * this way). Adapt on the DRIVER-SIDE schema (metadata only, no job):
    * nanos arrive as raw longs (legacy conf; Spark's vectorized reader
    * rejects nanos) and truncate to micros; micros arrive as a timestamp
    * already. Either way the column lands as TIMESTAMP_NTZ micros —
    * exactly what DuckDB's `CAST(ts AS TIMESTAMP)` yields, so oracle
    * parity holds for both vintages. Integer `div` (not `/`) — ns epoch
    * values overflow a double's 53-bit mantissa.
    */
  def events(spark: SparkSession, dir: String): DataFrame = {
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    val raw = read(spark, dir, "events")
    val conv = raw.schema("ts").dataType match {
      case org.apache.spark.sql.types.LongType =>
        expr("cast(timestamp_micros(ts div 1000) as timestamp_ntz)")
      case _ => col("ts").cast("timestamp_ntz")
    }
    raw.withColumn("ts", conv)
  }

  /** Number of distinct synthetic package names. Small enough that every
    * name gets several versions even at sf0.001 (200 parts), large enough to
    * make latest-version / closure queries non-trivial.
    */
  val PackageNameCount = 60

  /** Derived package-record view (one row per package *version*), the moral
    * equivalent of pkg2's parsed APKINDEX/Packages/primary.xml records:
    * (name, version, arch, provides) keyed by the originating p_partkey.
    * Version segments are pure modular arithmetic on p_partkey so that
    * numeric-aware version ordering (1.10 > 1.9) is exercised and the oracle
    * can reproduce the derivation in SQL.
    */
  def packages(spark: SparkSession, dir: String): DataFrame =
    part(spark, dir).select(
      col("p_partkey").as("pkg_id"),
      concat(lit("pkg-"), lpad(pmod(col("p_partkey"), lit(PackageNameCount)).cast("string"), 2, "0")).as("name"),
      concat(
        (pmod(col("p_partkey"), lit(4)) + 1).cast("string"), lit("."),
        pmod(col("p_partkey") * 7, lit(13)).cast("string"), lit("."),
        pmod(col("p_partkey") * 13, lit(7)).cast("string"), lit("-r"),
        (pmod(col("p_partkey"), lit(5)) + 1).cast("string")).as("version"),
      when(pmod(col("p_partkey"), lit(2)) === 0, "x86_64").otherwise("aarch64").as("arch"),
      col("p_size").as("size_mb"),
      col("p_retailprice").as("build_cost"),
      // Open metadata map (SURVEY.md §1.1 "fixed columns + open string
      // map"): the dynamic-schema half of the package record. Key presence
      // VARIES per record — `section` exists only on even pkg_ids —
      // because an open map whose keys are always present is just fixed
      // columns in disguise. map_filter drops the null-valued entry.
      map_filter(
        map(
          lit("license"), element_at(
            array(lit("mit"), lit("gpl"), lit("apache")),
            (pmod(col("p_partkey"), lit(3)) + 1).cast("int")),
          lit("maintainer"), concat(lit("m-"), pmod(col("p_partkey"), lit(7)).cast("string")),
          lit("section"), when(pmod(col("p_partkey"), lit(2)) === 0,
            when(pmod(col("p_partkey"), lit(4)) === 0, "base").otherwise("dev"))),
        (_, v) => v.isNotNull).as("extras"))

  /** File list per package *version* — the reference's most-used lookup
    * shape ("which package owns /usr/bin/x", à la `dpkg -S` /
    * `apk info --who-owns`; SURVEY.md §1.1 "File lists"). Each package
    * version pkg_id carries (pkg_id % 4 + 2) files; file j's path id is
    * (pkg_id*31 + j*17) % 97, so paths are SHARED across packages (a path
    * has several owning candidates — the lookup is a real resolution, not
    * a 1:1 join). Pure integer arithmetic end-to-end so the DuckDB oracle
    * rebuilds the identical relation.
    *
    * Scale notes: at 100 TB this is the engine's largest derived relation
    * (files ≫ packages); it is a narrow projection + generator explode —
    * no shuffle — and owning-package lookups are a path-key filter
    * (pushable) + per-path aggregation.
    */
  def files(spark: SparkSession, dir: String): DataFrame =
    packages(spark, dir)
      .withColumn("fidx", explode(expr("sequence(0, cast(pkg_id % 4 + 1 as int))")))
      .withColumn("pid", pmod(col("pkg_id") * 31 + col("fidx") * 17, lit(97)))
      .select(col("pkg_id"), col("name"), col("version"),
        concat(lit("/usr/"),
          element_at(array(lit("bin"), lit("lib"), lit("share"), lit("etc")),
            (pmod(col("pid"), lit(4)) + 1).cast("int")),
          lit("/f"), lpad(col("pid").cast("string"), 2, "0")).as("path"))

  /** Provides relation (SURVEY.md §1.1 "Relationship lists"): every package
    * name provides ITSELF plus one virtual alias `virt-XX` with
    * XX = i % 20 — three real names per virtual name, so alias resolution
    * (J6) genuinely fans out instead of being name-identity.
    */
  def provides(spark: SparkSession, dir: String): DataFrame = {
    val nm = packages(spark, dir).select(
      pmod(col("pkg_id"), lit(PackageNameCount)).cast("int").as("i")).distinct()
    def pkgName(c: org.apache.spark.sql.Column) =
      concat(lit("pkg-"), lpad(c.cast("string"), 2, "0"))
    nm.select(pkgName(col("i")).as("name"),
        array(pkgName(col("i")),
          concat(lit("virt-"), lpad(pmod(col("i"), lit(20)).cast("string"), 2, "0"))).as("pr"))
      .select(col("name"), explode(col("pr")).as("provides_name"))
      .distinct()
  }

  /** Depends list in the universal packaging form — CONSTRAINT STRINGS
    * (`virt-07>=2.5.0`, `pkg-44`), not pre-split columns (SURVEY.md §1.1):
    * name i depends on a constrained virtual name (op cycles >=, <, = by
    * i % 3; version from i's arithmetic) and on one bare real name.
    * `parse_constraint` (graft.functions) turns these back into
    * (name, op, ver) — the end-to-end resolution path q64 exercises.
    */
  def dependsSpecs(spark: SparkSession, dir: String): DataFrame = {
    val nm = packages(spark, dir).select(
      pmod(col("pkg_id"), lit(PackageNameCount)).cast("int").as("i")).distinct()
    def pad2(c: org.apache.spark.sql.Column) = lpad(c.cast("string"), 2, "0")
    nm.select(concat(lit("pkg-"), pad2(col("i"))).as("name"),
        array(
          concat(lit("virt-"), pad2(pmod(col("i") * 7 + 3, lit(20))),
            element_at(array(lit(">="), lit("<"), lit("=")), (pmod(col("i"), lit(3)) + 1).cast("int")),
            (pmod(col("i"), lit(3)) + 1).cast("string"), lit("."),
            pmod(col("i") * 5, lit(10)).cast("string"), lit(".0")),
          concat(lit("pkg-"), pad2(pmod(col("i") * 3 + 11, lit(PackageNameCount))))).as("specs"))
      .select(col("name"), explode(col("specs")).as("spec"))
      .distinct()
  }

  /** Distinct package-name universe with its index i (0..59) — the base of
    * every name-keyed relation below.
    */
  def packageNames(spark: SparkSession, dir: String): DataFrame =
    packages(spark, dir)
      .select(pmod(col("pkg_id"), lit(PackageNameCount)).cast("int").as("i")).distinct()
      .select(col("i"),
        concat(lit("pkg-"), lpad(col("i").cast("string"), 2, "0")).as("name"))

  /** Conflicts relation (SURVEY.md §1.1 "Relationship lists": depends,
    * provides, CONFLICTS, REPLACES): name i conflicts with name
    * (i*11+5) mod 60. Never self-referential: 10i ≡ 55 (mod 60) has no
    * solution (even lhs, odd rhs).
    */
  def conflicts(spark: SparkSession, dir: String): DataFrame = {
    val nm = packageNames(spark, dir)
    nm.select(col("name"),
      concat(lit("pkg-"),
        lpad(pmod(col("i") * 11 + 5, lit(PackageNameCount)).cast("string"), 2, "0"))
        .as("conflicts_with"))
  }

  /** Replaces relation: every fourth name (i % 4 == 0) REPLACES the very
    * name it conflicts with — the dpkg Conflicts+Replaces takeover pattern
    * (the replacement ships the files of the package it supersedes, so the
    * conflict is not a blocker).
    */
  def replaces(spark: SparkSession, dir: String): DataFrame = {
    val nm = packageNames(spark, dir)
    nm.filter(pmod(col("i"), lit(4)) === 0)
      .select(col("name"),
        concat(lit("pkg-"),
          lpad(pmod(col("i") * 11 + 5, lit(PackageNameCount)).cast("string"), 2, "0"))
          .as("replaces_name"))
  }

  /** Dependency edges between package *names*: name i depends on names
    * (i*7+3) mod N and (i*3+11) mod N (two out-edges per name, cycles
    * guaranteed — closure must be cycle-safe). Derived from the distinct
    * name set so the edge list is identical at every scale factor tier.
    */
  def dependsEdges(spark: SparkSession, dir: String): DataFrame = {
    val nm = packages(spark, dir).select(
      pmod(col("pkg_id"), lit(PackageNameCount)).cast("int").as("i")).distinct()
    def pkgName(c: org.apache.spark.sql.Column) =
      concat(lit("pkg-"), lpad(c.cast("string"), 2, "0"))
    nm.select(
        pkgName(col("i")).as("name"),
        array(
          pkgName(pmod(col("i") * 7 + 3, lit(PackageNameCount))),
          pkgName(pmod(col("i") * 3 + 11, lit(PackageNameCount)))).as("depends"))
      .select(col("name"), explode(col("depends")).as("dep"))
      .distinct()
  }
}
