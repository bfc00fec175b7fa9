package graft
import org.apache.spark.sql.SparkSession

/** Dev-loop plan dumper for the optimization-round evidence files:
  * `SPARK_GRAFT_SF_DIR=<dir> SPARK_GRAFT_PLAN_TAG=<tag> runMain
  * graft.Plans <outdir> <name> [<name> ...]` writes each query's
  * `explain("formatted")` output to `<outdir>/<name>_<tag>.txt` — the
  * artifact the plan claims in OPTIMIZATION_r*.md are checked against. */
object Plans {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val dir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val tag = sys.env.getOrElse("SPARK_GRAFT_PLAN_TAG", "plan")
    val outDir = args.head
    java.nio.file.Files.createDirectories(java.nio.file.Paths.get(outDir))
    for (name <- args.tail) {
      val df = SparkEntry.queries(name)(spark, dir)
      // the string form of explain("formatted"), captured instead of printed
      val bos = new java.io.ByteArrayOutputStream()
      Console.withOut(new java.io.PrintStream(bos, true, "UTF-8")) {
        df.explain("formatted")
      }
      val txt = bos.toString("UTF-8")
      java.nio.file.Files.write(
        java.nio.file.Paths.get(outDir, s"${name}_$tag.txt"),
        txt.getBytes("UTF-8"))
      println(s"wrote $outDir/${name}_$tag.txt")
    }
    spark.stop()
  }
}
