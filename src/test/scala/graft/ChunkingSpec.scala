package graft

import org.scalatest.funsuite.AnyFunSuite

/** q87 chunking invariants on the fixture corpus: full coverage (every
  * token lands in a chunk), bounded windows, correct stride/overlap, and
  * a short final window instead of a dropped one.
  */
class ChunkingSpec extends AnyFunSuite {
  private lazy val spark = SparkTestHarness.spark
  private val C = 32
  private val S = 24

  test("q87: windows are bounded, strided, and cover every token") {
    val rows = SparkEntry.queries("q87_doc_chunks")(spark, SparkTestHarness.Sf0001)
      .collect()
      .map(r => (r.getLong(0), r.getInt(1), r.getInt(2)))
    assert(rows.nonEmpty)
    rows.foreach { case (_, _, n) => assert(n >= 1 && n <= C) }
    rows.groupBy(_._1).foreach { case (doc, chunks) =>
      val byIdx = chunks.sortBy(_._2)
      // chunk indices are dense from 0
      assert(byIdx.map(_._2).toSeq === (0 until byIdx.length))
      // every chunk except the last is full (its window fits or the next
      // window exists precisely because tokens extend past its start)
      byIdx.dropRight(1).foreach { case (_, idx, n) =>
        assert(n === C || (idx + 1) * S < idx * S + n,
          s"doc $doc chunk $idx: short non-final chunk of $n tokens")
      }
      // coverage: total tokens = last start + last length, and the last
      // window actually starts before the token stream ends
      val (_, lastIdx, lastN) = byIdx.last
      assert(lastN >= 1)
      val totalTokens = lastIdx * S + lastN
      // a doc with totalTokens tokens must produce exactly
      // floor((totalTokens-1)/S)+1 chunks — no missing or extra windows
      assert(byIdx.length === (totalTokens - 1) / S + 1)
    }
  }

  test("q87: adjacent full windows overlap by C - S tokens") {
    import org.apache.spark.sql.functions._
    val dir = SparkTestHarness.Sf0001
    val chunks = Tables.documents(spark, dir)
      .withColumn("toks", split(col("text"), " "))
      .withColumn("chunk_idx",
        explode(expr(s"sequence(0, cast((size(toks) - 1) div $S as int))")))
      .withColumn("chunk", expr(s"slice(toks, chunk_idx * $S + 1, $C)"))
      .select(col("doc_id"), col("chunk_idx"), col("chunk"))
      .collect()
      .map(r => ((r.getLong(0), r.getInt(1)), r.getSeq[String](2)))
      .toMap
    val overlapping = chunks.keys.filter { case (d, i) =>
      chunks.contains((d, i + 1)) && chunks((d, i)).length == C
    }
    assert(overlapping.nonEmpty)
    overlapping.foreach { case (d, i) =>
      val tail = chunks((d, i)).drop(S)
      val head = chunks((d, i + 1)).take(C - S)
      assert(tail === head, s"doc $d chunks $i/${i + 1} disagree on the overlap")
    }
  }
}
