package graft

import org.apache.spark.sql.SparkSession

/** Temporary debug probe (deleted after M0). */
object Probe {
  def main(args: Array[String]): Unit = {
    val s = SparkSession.builder()
      .master("local[8]")
      .config("spark.sql.shuffle.partitions", "8")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    s.sparkContext.setLogLevel("ERROR")
    val df = SparkEntry.entry(s)
    val n = df.count()
    println(s"SMOKE entry rows=$n schema=${df.schema.fieldNames.mkString(",")}")
    s.stop()
  }
}
