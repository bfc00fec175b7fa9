package graft
import org.apache.spark.sql.SparkSession
object Probe {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    // optional per-round breakdown for the iterative family (dev loop)
    val rounds = sys.env.contains("SPARK_GRAFT_ROUNDS")
    if (rounds) graft.operators.Iterate.setRecording(true)
    val dir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    // Spark-job counter: the load-independent measure of driver barriers
    // (the thing the fused Iterate rounds exist to minimize)
    val jobs = new java.util.concurrent.atomic.AtomicLong()
    spark.sparkContext.addSparkListener(new org.apache.spark.scheduler.SparkListener {
      override def onJobStart(js: org.apache.spark.scheduler.SparkListenerJobStart): Unit =
        jobs.incrementAndGet()
    })
    for (name <- args; _ <- 1 to 3) {
      val j0 = jobs.get()
      val t0 = System.nanoTime()
      val n = SparkEntry.queries(name)(spark, dir).count()
      val t = (System.nanoTime() - t0) / 1e9
      // listener events deliver asynchronously — drain before sampling so
      // a late onJobStart never lands in the NEXT run's count (ADVICE r11)
      org.apache.spark.graftbridge.ListenerBridge.drain(spark.sparkContext)
      println(f"PROBE $name rows=$n t=$t%.3f jobs=${jobs.get()-j0}")
      if (rounds) graft.operators.Iterate.drainRounds().foreach(r =>
        println(f"  ROUND ${r.label}%s ${r.round}%d ${r.ms / 1000.0}%.3f jobs=${r.jobs}%d"))
    }
  }
}
