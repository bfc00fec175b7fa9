package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.functions.GraftFunctions

/** The custom Catalyst expressions through their SQL faces: registration,
  * null-safety, constant folding, and end-to-end use in max_by/orderBy.
  */
class ExpressionsSpec extends AnyFunSuite {
  private lazy val spark = SparkTestHarness.spark

  test("version_compare / version_sort_key register and evaluate via SQL") {
    GraftFunctions.ensureRegistered(spark)
    val r = spark.sql(
      """SELECT version_compare('1.10', '1.9') AS a,
        |       version_compare('1.0~rc1', '1.0') AS b,
        |       version_compare('2:0.1', '9.9') AS c,
        |       version_sort_key('1.2.3-r4') = version_sort_key('1.2.3-r4') AS d""".stripMargin).head()
    assert(r.getInt(0) > 0 && r.getInt(1) < 0 && r.getInt(2) > 0 && r.getBoolean(3))
  }

  test("expressions are null-safe") {
    GraftFunctions.ensureRegistered(spark)
    val r = spark.sql(
      "SELECT version_compare(NULL, '1.0') AS a, version_sort_key(NULL) AS b").head()
    assert(r.isNullAt(0) && r.isNullAt(1))
  }

  test("literal arguments constant-fold in the optimized plan") {
    GraftFunctions.ensureRegistered(spark)
    val df = spark.sql("SELECT version_compare('1.10', '1.9') AS c")
    val optimized = df.queryExecution.optimizedPlan.toString
    assert(!optimized.contains("version_compare"), s"not folded:\n$optimized")
  }

  test("registration is idempotent and extensions class injects the same set") {
    GraftFunctions.ensureRegistered(spark)
    GraftFunctions.ensureRegistered(spark) // second call must not throw
    // the extensions injector exposes exactly the same function names
    assert(GraftFunctions.all.map(_._1).toSet ===
      Set("version_compare", "version_sort_key", "array_dot", "parse_constraint",
        "token_ngrams", "bloom_might_contain", "hilbert_d2",
        "archive_format", "archive_members", "archive_extract", "archive_inspect",
        "tar_archive", "zip_archive"))
  }

  test("array_dot matches the higher-order-function fold bit-for-bit") {
    GraftFunctions.ensureRegistered(spark)
    val rows = Tables.embeddings(spark, SparkTestHarness.Sf0001)
      .selectExpr("transform(embedding, x -> cast(x as double)) AS v")
      .selectExpr(
        "array_dot(v, v) AS d1",
        "aggregate(transform(v, x -> x * x), cast(0 as double), (s, x) -> s + x) AS d2")
      .collect()
    rows.foreach(r => assert(r.getDouble(0) === r.getDouble(1)))
    val nulls = spark.sql("SELECT array_dot(NULL, array(1.0D)) AS a").head()
    assert(nulls.isNullAt(0))
  }

  test("token_ngrams equals the split/slice/array_join pipeline on real docs") {
    GraftFunctions.ensureRegistered(spark)
    val rows = Tables.documents(spark, SparkTestHarness.Sf0001)
      .where("size(split(text, ' ')) >= 8") // sequence(1, n<1) is descending, not empty
      .selectExpr(
        "token_ngrams(text, 8) AS fast",
        """transform(sequence(1, size(split(text, ' ')) - 7),
          |  i -> array_join(slice(split(text, ' '), i, 8), ' ')) AS ref""".stripMargin)
      .collect()
    assert(rows.nonEmpty)
    rows.foreach(r => assert(r.getSeq[String](0) === r.getSeq[String](1)))
  }

  test("token_ngrams keeps split()'s empty-token semantics on irregular spacing") {
    GraftFunctions.ensureRegistered(spark)
    import spark.implicits._
    // consecutive/leading/trailing separators produce empty tokens exactly
    // like split(text, ' ') — oracle parity must not depend on clean input
    val docs = Seq("a  b c", " x y", "z ", "  ", "a b  c d").toDF("text")
    val rows = docs
      .selectExpr(
        "token_ngrams(text, 2) AS fast",
        """transform(sequence(1, size(split(text, ' ')) - 1),
          |  i -> array_join(slice(split(text, ' '), i, 2), ' ')) AS ref""".stripMargin)
      .collect()
    rows.foreach(r => assert(r.getSeq[String](0) === r.getSeq[String](1)))
  }

  test("token_ngrams edge cases: short docs, exact length, null, n <= 0") {
    GraftFunctions.ensureRegistered(spark)
    val r = spark.sql(
      """SELECT token_ngrams('a b c', 4) AS short,
        |  token_ngrams('a b c', 3) AS exact,
        |  token_ngrams(NULL, 3) AS n,
        |  token_ngrams('a b c', 0) AS zero,
        |  token_ngrams('a b c', -2) AS neg""".stripMargin).head()
    assert(r.getSeq[String](0) === Seq.empty)
    assert(r.getSeq[String](1) === Seq("a b c"))
    assert(r.isNullAt(2))
    assert(r.getSeq[String](3) === Seq.empty)
    assert(r.getSeq[String](4) === Seq.empty)
  }

  test("token_ngrams implicit-casts n and type-errors at analysis time") {
    GraftFunctions.ensureRegistered(spark)
    // BIGINT n narrows via ImplicitCastInputTypes instead of a runtime
    // ClassCastException
    val r = spark.sql("SELECT token_ngrams('a b c', CAST(2 AS BIGINT)) AS g").head()
    assert(r.getSeq[String](0) === Seq("a b", "b c"))
    // a non-string first argument that can't cast fails during analysis
    intercept[org.apache.spark.sql.AnalysisException] {
      spark.sql("SELECT token_ngrams(array(1), 2)").head()
    }
  }

  test("hilbert_d2 matches an independent bit-walk reference and is bijective on the grid") {
    GraftFunctions.ensureRegistered(spark)
    import spark.implicits._
    // independent reference: the same public xy2d algorithm re-stated
    // with immutable bindings
    def ref(bits: Int, x0: Long, y0: Long): Long = {
      val n = 1L << bits
      def step(s: Long, x: Long, y: Long, d: Long): Long =
        if (s == 0) d
        else {
          val rx = if ((x & s) > 0) 1L else 0L
          val ry = if ((y & s) > 0) 1L else 0L
          val d2 = d + s * s * ((3 * rx) ^ ry)
          val (fx, fy) = if (ry == 0 && rx == 1) (n - 1 - x, n - 1 - y) else (x, y)
          val (nx, ny) = if (ry == 0) (fy, fx) else (fx, fy)
          step(s >> 1, nx, ny, d2)
        }
      step(n >> 1, x0, y0, 0L)
    }
    val grid = (for (x <- 0L until 16L; y <- 0L until 16L) yield (x, y))
    val got = grid.toDF("x", "y")
      .withColumn("d", call_function("hilbert_d2", col("x"), col("y"), lit(4)))
      .collect().map(r => (r.getLong(0), r.getLong(1)) -> r.getLong(2)).toMap
    grid.foreach { case (x, y) => assert(got((x, y)) == ref(4, x, y), s"($x,$y)") }
    // bijection: 256 cells -> 256 distinct indices in [0, 256)
    assert(got.values.toSet.size == 256 && got.values.forall(d => d >= 0 && d < 256))
    // consecutive indices are grid-adjacent — the curve property q193 sells
    val byD = got.map(_.swap)
    (0L until 255L).foreach { d =>
      val (x1, y1) = byD(d); val (x2, y2) = byD(d + 1)
      assert(math.abs(x1 - x2) + math.abs(y1 - y2) == 1, s"jump at d=$d")
    }
    val nul = spark.sql("SELECT hilbert_d2(CAST(NULL AS BIGINT), 3, 8)").head()
    assert(nul.isNullAt(0))
  }

  test("sort by version_sort_key orders a DataFrame by version semantics") {
    GraftFunctions.ensureRegistered(spark)
    import spark.implicits._
    val vs = Seq("1.10", "1.9", "1.0~rc1", "2:0.1", "1.0").toDF("v")
    val sorted = vs.orderBy(expr("version_sort_key(v)")).as[String].collect().toSeq
    assert(sorted === Seq("1.0~rc1", "1.0", "1.9", "1.10", "2:0.1"))
  }
}
