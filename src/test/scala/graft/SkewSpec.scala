package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Skew-mitigation patterns (SURVEY.md "Spill-aware"/100 TB notes): salting
  * must be a pure plan rewrite — identical results, skew spread across
  * `SaltBuckets` reducers. AQE handles this automatically for joins in
  * 4.x; the explicit pattern is for aggregations and older planners, and
  * the equivalence proof is what makes it safe to apply mechanically.
  */
class SkewSpec extends AnyFunSuite {
  private lazy val spark = SparkTestHarness.spark
  private val dir = SparkTestHarness.Sf0001
  private val SaltBuckets = 8

  test("salted two-phase aggregation equals direct aggregation") {
    val ev = Tables.events(spark, dir)
    val direct = ev.groupBy("event_type")
      .agg(count(lit(1)).as("n"), sum("value").as("total"))
      .orderBy("event_type").collect()

    val salted = ev
      .withColumn("salt", pmod(col("event_id"), lit(SaltBuckets)))
      .groupBy("event_type", "salt")                       // phase 1: skew spread
      .agg(count(lit(1)).as("pn"), sum("value").as("pt"))
      .groupBy("event_type")                               // phase 2: merge partials
      .agg(sum("pn").as("n"), sum("pt").as("total"))
      .orderBy("event_type").collect()

    assert(salted.length === direct.length)
    salted.zip(direct).foreach { case (s, d) =>
      assert(s.getString(0) === d.getString(0))
      assert(s.getLong(1) === d.getLong(1))
      assert(math.abs(s.getDouble(2) - d.getDouble(2)) < 1e-6)
    }
  }

  test("salted replicated-dim join equals plain join") {
    import spark.implicits._
    val fact = Tables.events(spark, dir).select(col("event_type"), col("value"))
    val dim = Seq(("click", 1.0), ("view", 2.0), ("purchase", 5.0), ("signup", 3.0), ("error", 0.0))
      .toDF("event_type", "weight")

    val plain = fact.join(dim, "event_type")
      .agg(count(lit(1)).as("n"), sum(col("value") * col("weight")).as("w"))
      .head()

    // salt the (skewed) fact side; replicate the dim side across all salts
    val saltedFact = fact.withColumn("salt", pmod(crc32(col("event_type").cast("binary")) + monotonically_increasing_id(), lit(SaltBuckets)))
    val replicatedDim = dim.crossJoin(
      spark.range(SaltBuckets).select(col("id").cast("int").as("salt")))
    val salted = saltedFact.join(replicatedDim, Seq("event_type", "salt"))
      .agg(count(lit(1)).as("n"), sum(col("value") * col("weight")).as("w"))
      .head()

    assert(salted.getLong(0) === plain.getLong(0))
    assert(math.abs(salted.getDouble(1) - plain.getDouble(1)) < 1e-6)
  }

  test("saltedJoin refuses inputs that already carry a __salt column") {
    import spark.implicits._
    val big = Seq((1, "a")).toDF("k", "__salt")
    val small = Seq((1, "x")).toDF("k", "v")
    intercept[IllegalArgumentException] { Graft.saltedJoin(big, small, "k", "__salt") }
    intercept[IllegalArgumentException] { Graft.saltedJoin(small, big, "k", "v") }
  }
}
