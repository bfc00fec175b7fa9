package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

// dev-only profiling scratch; not committed
object Scratch {
  def main(args: Array[String]): Unit = {
    val dir = "/root/testdata/sf0.1"
    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    def time(name: String)(f: => Long): Unit = {
      val t0 = System.nanoTime(); val n1 = f
      val t1 = System.nanoTime(); val n2 = f
      val t2 = System.nanoTime()
      println(f"TIME $name%-28s run1=${(t1 - t0) / 1e9}%.3f run2=${(t2 - t1) / 1e9}%.3f rows=$n1/$n2")
    }

    val sh = graft.queries.Shingles.frame(spark, dir)
    time("shingle.count")(sh.count())
    val hk = sh.select(col("doc_id"), col("hk"))
    time("df-agg")(hk.groupBy("hk").agg(count(lit(1)).as("df")).filter(col("df") > 20).count())
    val hot = hk.groupBy("hk").agg(count(lit(1)).as("df")).filter(col("df") > 20).select("hk")
    val kept = hk.join(broadcast(hot), Seq("hk"), "left_anti")
    time("kept.count")(kept.count())
    val b2 = kept.select(col("doc_id").as("doc_id2"), col("hk").as("hk2"))
    time("pairjoin-agg")(
      kept.join(b2, col("hk") === col("hk2") && col("doc_id") < col("doc_id2"))
        .groupBy(col("doc_id"), col("doc_id2")).agg(count(lit(1)).as("common")).count())
    time("sizes")(kept.groupBy("doc_id").agg(count(lit(1)).as("sz")).count())
    // grouped pair-gen alternative
    val grouped = kept.groupBy("hk").agg(sort_array(collect_list(col("doc_id"))).as("docs"))
      .filter(size(col("docs")) >= 2)
    time("grouped-pairgen")(
      grouped.select(explode(expr(
        "flatten(transform(docs, (x, i) -> transform(slice(docs, i + 2, size(docs) - i - 1), y -> struct(x as d1, y as d2))))")).as("p"))
        .groupBy(col("p.d1"), col("p.d2")).agg(count(lit(1)).as("common")).count())
    // q48 variants
    val docs = Tables.documents(spark, dir)
    time("q48-4filters")(
      docs.withColumn("toks", split(col("text"), " "))
        .withColumn("v_en", size(expr("filter(toks, t -> t IN ('the', 'a', 'of'))")))
        .withColumn("v_de", size(expr("filter(toks, t -> t IN ('der', 'die', 'das'))")))
        .withColumn("v_es", size(expr("filter(toks, t -> t IN ('el', 'los', 'una'))")))
        .withColumn("v_fr", size(expr("filter(toks, t -> t IN ('le', 'les', 'une'))")))
        .groupBy("lang").agg(sum("v_en").as("a"), sum("v_de").as("b"), sum("v_es").as("c"), sum("v_fr").as("d")).count())
    time("q48-regexp_count")(
      docs.withColumn("pad", concat(lit(" "), col("text"), lit(" ")))
        .withColumn("v_en", expr("regexp_count(pad, '(?<= )(the|a|of)(?= )')"))
        .withColumn("v_de", expr("regexp_count(pad, '(?<= )(der|die|das)(?= )')"))
        .withColumn("v_es", expr("regexp_count(pad, '(?<= )(el|los|una)(?= )')"))
        .withColumn("v_fr", expr("regexp_count(pad, '(?<= )(le|les|une)(?= )')"))
        .groupBy("lang").agg(sum("v_en").as("a"), sum("v_de").as("b"), sum("v_es").as("c"), sum("v_fr").as("d")).count())
    time("q48-1aggregate")(
      docs.withColumn("vs", expr(
        "aggregate(split(text, ' '), array(0, 0, 0, 0), (acc, t) -> array(" +
          "acc[0] + if(t IN ('the', 'a', 'of'), 1, 0), " +
          "acc[1] + if(t IN ('der', 'die', 'das'), 1, 0), " +
          "acc[2] + if(t IN ('el', 'los', 'una'), 1, 0), " +
          "acc[3] + if(t IN ('le', 'les', 'une'), 1, 0)))"))
        .select(col("lang"), col("vs")(0).as("v_en"), col("vs")(1).as("v_de"), col("vs")(2).as("v_es"), col("vs")(3).as("v_fr"))
        .groupBy("lang").agg(sum("v_en").as("a"), sum("v_de").as("b"), sum("v_es").as("c"), sum("v_fr").as("d")).count())
    spark.stop()
  }
}
