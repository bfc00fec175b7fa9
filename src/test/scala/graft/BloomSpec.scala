package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Graft.bloomPrunedJoin and the bloom_might_contain expression: result
  * row-identity with the plain join (the operator's whole contract), the
  * no-false-negative property of the probe, the plan shape (probe filter
  * present on the big side, still codegen'd), and builder validation.
  */
class BloomSpec extends AnyFunSuite {
  private lazy val spark = SparkTestHarness.spark
  private val dir = SparkTestHarness.Sf0001

  private def parts = Tables.part(spark, dir)
    .filter(col("p_size") >= 45).select("p_partkey", "p_brand")
  private def li = Tables.lineitem(spark, dir)
    .select(col("l_partkey").as("p_partkey"), col("l_quantity"))

  test("bloom-pruned join is row-identical to the plain join") {
    def key(df: org.apache.spark.sql.DataFrame) =
      df.collect().map(r => (r.getLong(0), r.getString(2), r.getDouble(1))).sorted.toSeq
    val plain = li.join(parts, Seq("p_partkey")).select("p_partkey", "l_quantity", "p_brand")
    val bloomed = Graft.bloomPrunedJoin(li, parts, "p_partkey", 64L, 0.01)
      .select("p_partkey", "l_quantity", "p_brand")
    assert(key(bloomed) === key(plain))
    assert(plain.count() > 0)
  }

  test("the probe never false-negatives on inserted keys") {
    import spark.implicits._
    graft.functions.GraftFunctions.ensureRegistered(spark)
    val keys = (0L until 1000L).map(_ * 7919L)
    val bf = keys.toDF("k").stat.bloomFilter("k", 1000L, 0.03)
    val bos = new java.io.ByteArrayOutputStream()
    bf.writeTo(bos)
    val n = keys.toDF("k")
      .filter(call_function("bloom_might_contain", col("k"), lit(bos.toByteArray)))
      .count()
    assert(n === 1000L) // every inserted key must pass
  }

  test("plan shape: big-side filter probes the bloom before the join, codegen'd") {
    val df = Graft.bloomPrunedJoin(li, parts, "p_partkey", 64L, 0.01)
    df.collect() // finalize the adaptive plan so codegen spans are printable
    val p = df.queryExecution.executedPlan.toString.split("== Initial Plan ==")(0)
    val probeLine = p.linesIterator.find(_.contains("bloom_might_contain")).getOrElse("")
    assert(probeLine.nonEmpty, s"no bloom probe in plan:\n${p.take(2000)}")
    // toString marks whole-stage-codegen spans as `*(n)`; the probe filter
    // must carry the star (no CodegenFallback split)
    assert(probeLine.contains("*("), s"bloom probe fell out of codegen: $probeLine")
  }

  test("a non-integral join key is rejected loudly") {
    val docs = Tables.documents(spark, dir).select("lang", "doc_id")
    val dim = Tables.documents(spark, dir).select(col("lang").as("lang"), col("n_chars")).limit(5)
    val ex = intercept[IllegalArgumentException] {
      Graft.bloomPrunedJoin(docs, dim.drop("n_chars"), "lang")
    }
    assert(ex.getMessage.contains("integral"))
  }

  test("the filter argument must be a binary literal") {
    graft.functions.GraftFunctions.ensureRegistered(spark)
    import spark.implicits._
    val ex = intercept[Exception] {
      Seq(1L).toDF("k")
        .select(call_function("bloom_might_contain", col("k"), col("k"))).collect()
    }
    def messages(t: Throwable): Seq[String] =
      Option(t).toSeq.flatMap(e => Option(e.getMessage).toSeq ++ messages(e.getCause))
    assert(messages(ex).exists(_.contains("binary literal")))
  }
}
