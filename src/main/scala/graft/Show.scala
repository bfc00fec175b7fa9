package graft
import org.apache.spark.sql.SparkSession

/** Dev-loop runner: print a judged query's rows (the thing Probe's
  * count-only loop can't show) — `SPARK_GRAFT_SF_DIR=<dir> runMain
  * graft.Show <name> [<name> ...]`. */
object Show {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val dir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.01")
    val explain = sys.env.contains("SPARK_GRAFT_EXPLAIN")
    for (name <- args) {
      val df = SparkEntry.queries(name)(spark, dir)
      println(s"=== $name @ $dir")
      df.show(500, truncate = false)
      // dev-loop plan audit: the executed plan the numbers came from
      if (explain) println(df.queryExecution.executedPlan.toString)
    }
  }
}
