package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Properties of the HDR quantile sketch (q264/q265's machinery) proven on
  * seeded random value sets, independent of the fixture:
  *   - the guarantee: for every percentile the exact rank-r value lies in
  *     the estimate bucket, so |est − exact| / exact <= 2^-6;
  *   - integer rank bounds bracket the target rank;
  *   - mergeability: the union sketch (bucket-wise count sums) serves the
  *     same estimates as a sketch built from the concatenated data.
  */
class HdrSketchSpec extends AnyFunSuite {
  private lazy val spark = SparkTestHarness.spark

  private def bucketId(c: Long): Long = {
    val e = 63 - java.lang.Long.numberOfLeadingZeros(c)
    e.toLong * 64 + ((c >> (e - 6)) & 63)
  }
  private def lb(id: Long): Long = (64L + id % 64) << ((id / 64 - 6).toInt)
  private def ub(id: Long): Long = lb(id) + (1L << ((id / 64 - 6).toInt)) - 1

  test("estimate bucket contains the exact rank value on 8 seeded random sets") {
    val rnd = new scala.util.Random(42L)
    for (inst <- 1 to 8) {
      // heavy-tailed positive values >= 64 (the sketch's domain)
      val vals = Seq.fill(2000)(64L + math.abs(rnd.nextLong()) %
        (if (inst % 2 == 0) 100000L else 1000000000L))
      val regs = vals.groupBy(bucketId).map { case (id, vs) => id -> vs.size.toLong }
      val sorted = vals.sorted
      val n = vals.size.toLong
      for (pct <- Seq(50, 90, 99)) {
        val r = (n * pct + 99) / 100
        val exact = sorted((r - 1).toInt)
        // serve: first bucket whose cumulative count reaches r
        var cum = 0L
        val ids = regs.keys.toSeq.sorted
        val pick = ids.find { id => cum += regs(id); cum >= r }.get
        assert(exact >= lb(pick) && exact <= ub(pick),
          s"inst $inst p$pct: exact $exact outside bucket [${lb(pick)}, ${ub(pick)}]")
        assert((ub(pick) - lb(pick)).toDouble / lb(pick) <= 1.0 / 64 + 1e-12)
      }
    }
  }

  test("merged register sums serve the same estimates as a rebuilt sketch") {
    val rnd = new scala.util.Random(7L)
    val a = Seq.fill(1500)(64L + math.abs(rnd.nextLong()) % 500000L)
    val b = Seq.fill(900)(64L + math.abs(rnd.nextLong()) % 500000L)
    def regsOf(vs: Seq[Long]) = vs.groupBy(bucketId).map { case (id, x) => id -> x.size.toLong }
    val merged = (regsOf(a).toSeq ++ regsOf(b).toSeq)
      .groupBy(_._1).map { case (id, xs) => id -> xs.map(_._2).sum }
    assert(merged == regsOf(a ++ b))
  }

  test("the Spark-side bucket expression matches the reference bucketing") {
    import spark.implicits._
    val rnd = new scala.util.Random(11L)
    val vals = Seq.fill(500)(64L + math.abs(rnd.nextLong()) % 100000000L)
    val got = vals.toDF("c")
      .withColumn("e", expr("length(bin(c)) - 1"))
      .withColumn("id", expr("e * 64 + (shiftright(c, cast(e - 6 as int)) & 63)"))
      .select("c", "id").collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    vals.foreach(v => assert(got(v) == bucketId(v), s"bucket mismatch for $v"))
  }
}
