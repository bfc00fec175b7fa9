package graft

import org.apache.spark.ml.feature.BucketedRandomProjectionLSH
import org.apache.spark.ml.linalg.Vectors
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** MLlib LSH integration (SURVEY.md §1.2, §7 M4 scale path): the packaged
  * library alternative to the hand-rolled LSH in q42/q52 —
  * BucketedRandomProjectionLSH over the embeddings fixture, sanity-checked
  * against brute-force nearest neighbour.
  */
class MlLshSpec extends AnyFunSuite {
  private lazy val spark = SparkTestHarness.spark
  private val dir = SparkTestHarness.Sf0001

  test("BucketedRandomProjectionLSH approx-NN finds the brute-force L2 neighbour") {
    import spark.implicits._
    val vecs = Tables.embeddings(spark, dir)
      .select(col("vec_id"), col("embedding"))
      .as[(Long, Array[Float])]
      .map { case (id, e) => (id, Vectors.dense(e.map(_.toDouble))) }
      .toDF("vec_id", "features")
      .cache()

    val lsh = new BucketedRandomProjectionLSH()
      .setBucketLength(2.0).setNumHashTables(4).setSeed(42L)
      .setInputCol("features").setOutputCol("hashes")
    val model = lsh.fit(vecs)

    val query = vecs.filter(col("vec_id") === 0).head().getAs[org.apache.spark.ml.linalg.Vector]("features")
    val approx = model.approxNearestNeighbors(vecs.filter(col("vec_id") =!= 0), query, 1)
      .select("vec_id").head().getLong(0)

    // brute-force L2 nearest neighbour
    val brute = vecs.filter(col("vec_id") =!= 0).as[(Long, org.apache.spark.ml.linalg.Vector)]
      .map { case (id, v) => (id, Vectors.sqdist(v, query)) }
      .toDF("vec_id", "d").orderBy("d").head().getLong(0)

    assert(approx === brute,
      "approx NN should find the true neighbour at this scale/settings")
  }
}
