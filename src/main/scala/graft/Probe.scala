package graft

import org.apache.spark.sql.SparkSession

/** Temporary debug probe (deleted after M0). */
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
    def time(name: String)(f: => Long): Unit = {
      val t0 = System.nanoTime(); val n = f
      println(f"TIME $name ${(System.nanoTime()-t0)/1e9}%.2f s rows=$n")
    }
    val q14 = graft.queries.Relational.queries.toMap.apply("q14_name_search")
    time("q14_run1")(q14(s, dir).count())
    time("q14_run2")(q14(s, dir).count())
    q14(s, dir).explain("formatted")
    s.stop()
  }
}
