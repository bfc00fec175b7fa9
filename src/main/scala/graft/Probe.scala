package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Temporary debug probe: A/B dot-product formulations. */
object Probe {
  def main(args: Array[String]): Unit = {
    val s = SparkSession.builder()
      .master("local[4]")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    s.sparkContext.setLogLevel("ERROR")
    val dir = "/root/testdata/sf0.1"
    def vecs = s.read.parquet(s"$dir/embeddings.parquet").select(
      col("vec_id"), col("label"),
      expr("transform(embedding, x -> cast(x as double))").as("v"))
    val foldDot = "aggregate(zip_with(va, vb, (x, y) -> x * y), cast(0 as double), (s, x) -> s + x)"
    val unrolled = (1 to 64).map(i => s"element_at(va, $i) * element_at(vb, $i)").mkString(" + ")
    def pairs(dot: String) = {
      val a = vecs.select(col("label"), col("vec_id").as("d1"), col("v").as("va"))
      val b = vecs.select(col("label").as("lb"), col("vec_id").as("d2"), col("v").as("vb"))
      a.join(b, col("label") === col("lb") && col("d1") < col("d2"))
        .select(expr(dot).as("dot")).agg(sum("dot")).head()
    }
    def time(name: String)(f: => Any): Unit = {
      val t0 = System.nanoTime(); f
      println(f"TIME $name ${(System.nanoTime()-t0)/1e9}%.2f")
    }
    time("warm-fold")(pairs(foldDot)); time("warm-unroll")(pairs(unrolled))
    time("fold-1")(pairs(foldDot)); time("unroll-1")(pairs(unrolled))
    time("fold-2")(pairs(foldDot)); time("unroll-2")(pairs(unrolled))
    s.stop()
  }
}
