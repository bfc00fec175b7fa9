package graft.tmp

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

// scratch: one Luby round's physical plan
object MisPlan {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[8]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.ui.enabled", "false").appName("misplan").getOrCreate()
    import spark.implicits._
    val shufN = 32
    val edges = (0L until 3000L).map(i => (i, (i * 7 + 1) % 3000)).toDF("a", "b")
      .filter(col("a") =!= col("b"))
    val sym = edges.select(col("a").as("name"), col("b").as("nb"))
      .unionByName(edges.select(col("b").as("name"), col("a").as("nb")))
    val symByNb = graft.operators.Lineage.cut(sym.repartition(shufN, col("nb")))
    val symByName = graft.operators.Lineage.cut(sym.repartition(shufN, col("name")))
    val remaining0 = graft.operators.Lineage.cut(
      (0L until 3000L).toDF("name").repartition(shufN, col("name")))
    val r = 1
    val remaining = remaining0
    val pri = remaining.withColumn("pri",
      expr(s"substring(md5('$r:' || name), 1, 15) || ':' || name"))
    val nbMin = symByNb
      .join(pri.hint("shuffle_hash")
        .select(col("name").as("nb"), col("pri").as("nb_pri"))
        .repartition(shufN, col("nb")), "nb")
      .select(col("name"), col("nb_pri"))
      .repartition(shufN, col("name"))
      .join(remaining.hint("shuffle_hash"), "name")
      .groupBy("name").agg(min("nb_pri").as("nb_min"))
    val winners = pri.join(nbMin.hint("shuffle_hash"), Seq("name"), "left")
      .filter(col("nb_min").isNull || col("pri") < col("nb_min"))
      .select(col("name"), lit(r).as("round"))
    val removed = winners.select("name")
      .unionByName(symByName.join(winners.hint("shuffle_hash").select("name"), "name")
        .select(col("nb").as("name")))
      .repartition(shufN, col("name"))
      .distinct()
    val next = remaining.join(removed.hint("shuffle_hash"), Seq("name"), "left_anti")
    val jobs = new java.util.concurrent.atomic.AtomicLong()
    spark.sparkContext.addSparkListener(new org.apache.spark.scheduler.SparkListener {
      override def onJobStart(js: org.apache.spark.scheduler.SparkListenerJobStart): Unit =
        { jobs.incrementAndGet(); () }
    })
    org.apache.spark.graftbridge.ListenerBridge.drain(spark.sparkContext)
    val fr = graft.operators.Lineage.cutLazy(next)
    val n = fr.count()
    org.apache.spark.graftbridge.ListenerBridge.drain(spark.sparkContext)
    println(s"=== ROUND n=$n jobs=${jobs.get()}")
    println(next.queryExecution.executedPlan.toString.take(11000))
    spark.stop()
  }
}
