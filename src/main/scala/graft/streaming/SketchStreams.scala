package graft.streaming

import org.apache.spark.sql.Encoders
import org.apache.spark.sql.streaming.{OutputMode, StatefulProcessor, TimeMode, TimerValues, TTLConfig, ValueState}

import graft.functions.HllSketch

/** Streaming sketch builders (VERDICT r10 item 4): the engine's two
  * deterministic mergeable sketches — the HLL distinct-count registers
  * (q230/q271) and the HDR quantile registers (q264/q265) — built
  * INCREMENTALLY under `transformWithState` (RocksDB state store), so the
  * serving layer can keep sketches warm off a stream instead of
  * re-aggregating batches. Both processors apply the exact same integer
  * register math as the batch aggregations (the HLL processor literally
  * calls [[HllSketch.reduce]]), so the streamed register state is
  * BYTE-EQUAL to the batch frames — StreamingSpec proves it across ≥3
  * micro-batches.
  *
  * Scale notes: state per key is 64 bytes (HLL) or ≤ a few hundred
  * (bucket, count) pairs (HDR) at ANY input cardinality; keys partition
  * across executors by the group key; merges never rescan history — the
  * same economics that make the batch sketches 100 TB-safe make the
  * streaming form a constant-memory standing query.
  */
object SketchStreams {
  /** q264's integer HDR bucket id: e = bitlength(c) - 1,
    * id = e * 64 + ((c >> (e - 6)) & 63). Callers guarantee c >= 64
    * (e >= 6), as the batch register builders do for cent amounts. */
  def hdrBucket(c: Long): Int = {
    val e = 63 - java.lang.Long.numberOfLeadingZeros(c)
    (e * 64 + ((c >> (e - 6)) & 63L)).toInt
  }
}

/** Incremental HLL registers per key: ValueState holds the 64-byte
  * register array; each input row folds through the SAME
  * [[HllSketch.reduce]] the batch UDAF uses. Emits the full register
  * vector after every micro-batch (Update mode) — registers grow
  * monotonically, so the last emission per key is the final state.
  */
class HllRegistersProcessor
    extends StatefulProcessor[String, (String, String), (String, Seq[Long])] {
  @transient private var regs: ValueState[Array[Byte]] = _
  @transient private lazy val fold = new HllSketch()

  override def init(outputMode: OutputMode, timeMode: TimeMode): Unit =
    regs = getHandle.getValueState[Array[Byte]]("hll_regs", Encoders.BINARY, TTLConfig.NONE)

  override def handleInputRows(key: String, rows: Iterator[(String, String)],
      timerValues: TimerValues): Iterator[(String, Seq[Long])] = {
    val buf = if (regs.exists()) regs.get() else new Array[Byte](HllSketch.M)
    rows.foreach(r => fold.reduce(buf, r._2))
    regs.update(buf)
    Iterator.single((key, buf.toSeq.map(_.toLong)))
  }
}

/** Incremental HDR quantile registers per key: ValueState holds the
  * (bucket → count) register map; counts only grow, so the last emitted
  * snapshot per (key, bucket) is the final register value. Input values
  * are integer cent amounts >= 64, exactly like the batch register
  * builders (q19/q264).
  */
class HdrRegistersProcessor
    extends StatefulProcessor[String, (String, Long), (String, Int, Long)] {
  import org.apache.spark.sql.streaming.MapState

  @transient private var regs: MapState[Int, Long] = _

  override def init(outputMode: OutputMode, timeMode: TimeMode): Unit =
    // MapState, not ValueState[Map[...]]: the RocksDB value encoder (Avro)
    // rejects MapType, and MapState is the keyed-map primitive anyway —
    // one state-store entry per occupied bucket
    regs = getHandle.getMapState[Int, Long]("hdr_regs",
      Encoders.scalaInt, Encoders.scalaLong, TTLConfig.NONE)

  override def handleInputRows(key: String, rows: Iterator[(String, Long)],
      timerValues: TimerValues): Iterator[(String, Int, Long)] = {
    rows.foreach { r =>
      val b = SketchStreams.hdrBucket(r._2)
      val cur = if (regs.containsKey(b)) regs.getValue(b) else 0L
      regs.updateValue(b, cur + 1L)
    }
    regs.iterator().map { case (b, n) => (key, b, n) }.toSeq.iterator
  }
}
