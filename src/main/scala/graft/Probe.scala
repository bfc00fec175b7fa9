package graft

import org.apache.spark.sql.SparkSession

/** Temporary debug probe (plan audit). */
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
    val qs = graft.queries.Relational.queries.toMap ++ graft.queries.Events.queries.toMap ++
      graft.queries.Dedup.queries.toMap
    for (name <- Seq("q02_revenue_by_nation", "q06_revenue_forecast", "q42_minhash_lsh_pairs")) {
      println(s"===== $name =====")
      qs(name)(s, dir).explain("formatted")
    }
    s.stop()
  }
}
