package graft.streaming

import org.apache.spark.sql.{Dataset, Encoders, SparkSession}
import org.apache.spark.sql.streaming.{OutputMode, StatefulProcessor, TTLConfig, TimeMode, TimerValues, ValueState}

/** Streaming twin of the batch `sketch_hdr_quantiles` rank sketch:
  * per-key HDR-grid bucket counts maintained across micro-batches via
  * transformWithState. The state IS the sketch — (bucket lower bound,
  * count) pairs on the fixed log₂/2⁵ grid of
  * [[graft.ops.Sketch.hdrBucketSql]] — so memory per key is bounded by
  * the GRID (≤ ~576 buckets), never the data, and it never needs a
  * watermark.
  *
  * Parity with the batch sketch is exact for ANY arrival order and any
  * micro-batch slicing — stronger than the sorted-input contract most
  * processors here carry — because bucket assignment is a pure function
  * of the value and merge is count addition (the mergeability the batch
  * query proves per-day, exercised per-micro-batch here). Emits one row
  * per key per micro-batch: (key, n_seen, p50, p90, p99) with the same
  * rank rule as the batch query (first bucket whose cumulative count
  * reaches ⌈φ·n⌉); n_seen is monotone, so max-n rows are final.
  */
class HdrProcessor
    extends StatefulProcessor[String, (String, Long), (String, Long, Long, Long, Long)] {

  @transient private var st: ValueState[HdrProcessor.S] = _

  override def init(outputMode: OutputMode, timeMode: TimeMode): Unit =
    st = getHandle.getValueState[HdrProcessor.S](
      "hdr", Encoders.product[HdrProcessor.S], TTLConfig.NONE)

  override def handleInputRows(
      key: String,
      rows: Iterator[(String, Long)],
      timerValues: TimerValues): Iterator[(String, Long, Long, Long, Long)] = {
    val prev = if (st.exists()) st.get() else HdrProcessor.S(Seq.empty, Seq.empty, 0L)
    val m = scala.collection.mutable.HashMap.empty[Long, Long]
    prev.lbs.iterator.zip(prev.cs.iterator).foreach { case (lb, c) => m.update(lb, c) }
    var n = prev.n
    rows.foreach { r =>
      val lb = HdrProcessor.bucketOf(r._2)
      m.update(lb, m.getOrElse(lb, 0L) + 1L)
      n += 1L
    }
    val hist = m.toArray.sortBy(_._1)
    st.update(HdrProcessor.S(hist.map(_._1).toSeq, hist.map(_._2).toSeq, n))
    def q(phiBp: Long): Long = {
      val rank = (n * phiBp + 9999L) / 10000L
      var cum = 0L
      var i = 0
      while (i < hist.length && cum + hist(i)._2 < rank) { cum += hist(i)._2; i += 1 }
      if (i < hist.length) hist(i)._1 else -1L
    }
    Iterator.single((key, n, q(5000L), q(9000L), q(9900L)))
  }
}

object HdrProcessor {
  /** Sketch state: parallel (bucket lb, count) vectors, sorted by lb,
    * plus the monotone processed-value count versioning emissions.
    */
  final case class S(lbs: Seq[Long], cs: Seq[Long], n: Long)

  /** Scala twin of [[graft.ops.Sketch.hdrBucketSql]] (subBits = 5,
    * maxBits = 21) in identical Long arithmetic: values under 2⁶ are
    * their own bucket, above that the top 6 significant bits are kept —
    * Java `/` on non-negatives ≡ SQL truncating DIV, so the streamed
    * grid is bit-identical to both engines' batch grid.
    */
  def bucketOf(v: Long): Long = {
    require(v >= 0L && v < (1L << 21), s"hdr bucket domain: $v")
    if (v < 64L) v
    else {
      val b = 63 - java.lang.Long.numberOfLeadingZeros(v)
      val p = 1L << (b - 5)
      v / p * p
    }
  }

  /** Rows: (key, v) with v on the [0, 2²¹) grid domain → per key per
    * micro-batch: (key, n_seen, p50, p90, p99) bucket lower bounds.
    */
  def apply(
      spark: SparkSession,
      rows: Dataset[(String, Long)]): Dataset[(String, Long, Long, Long, Long)] = {
    import spark.implicits._
    SeriesStatsProcessor.configure(spark)
    rows.groupByKey(_._1)
      .transformWithState(new HdrProcessor, TimeMode.None(), OutputMode.Append())
  }
}
