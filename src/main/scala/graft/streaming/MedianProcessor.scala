package graft.streaming

import org.apache.spark.sql.{Dataset, Encoders, SparkSession}
import org.apache.spark.sql.streaming.{OutputMode, StatefulProcessor, TTLConfig, TimeMode, TimerValues, ValueState}

/** Streaming twin of the batch `ts_rolling_median` operator: per-key
  * trailing-21 (current + 20 prior) median and MAD over INTEGER cent
  * values, carried in fixed-point ten-thousandths. Because every number
  * is an integer — the even-count median is (a+b)·50, the MAD's even
  * median floor-halves — parity with the batch window is EXACT, not
  * approximate, whenever each key's points arrive time-ordered across
  * micro-batches (same contract as [[EwmaProcessor]]). State per key is
  * a bounded ≤21-slot ring in arrival order; medians sort a copy.
  */
class MedianProcessor(window: Int = 21)
    extends StatefulProcessor[Long, (Long, Long, Long, Long), (Long, Long, Long, Long, Long)] {

  require(window >= 1)

  @transient private var ring: ValueState[MedianProcessor.Ring] = _

  override def init(outputMode: OutputMode, timeMode: TimeMode): Unit =
    ring = getHandle.getValueState[MedianProcessor.Ring](
      "ring", Encoders.product[MedianProcessor.Ring], TTLConfig.NONE)

  /** Fixed-point median of SORTED values scaled ·100; even count avgs
    * the two middles exactly ((a+b)·50). */
  private def medE4(sorted: Array[Long]): Long = {
    val n = sorted.length
    if (n % 2 == 1) sorted(n / 2) * 100
    else (sorted(n / 2 - 1) + sorted(n / 2)) * 50
  }

  /** Median of already-e4-scaled deviations; even count floor-halves. */
  private def medOfE4(sorted: Array[Long]): Long = {
    val n = sorted.length
    if (n % 2 == 1) sorted(n / 2)
    else (sorted(n / 2 - 1) + sorted(n / 2)) / 2
  }

  override def handleInputRows(
      key: Long,
      rows: Iterator[(Long, Long, Long, Long)],
      timerValues: TimerValues): Iterator[(Long, Long, Long, Long, Long)] = {
    // (key, ts, id, cents) — sort the micro-batch like the batch window order
    val pts = rows.toArray.sortBy(r => (r._2, r._3))
    var buf = if (ring.exists()) ring.get().vs.toVector else Vector.empty[Long]
    val out = pts.map { p =>
      buf = (buf :+ p._4).takeRight(window)
      val sorted = buf.toArray.sorted
      val med = medE4(sorted)
      val devs = sorted.map(x => math.abs(x * 100 - med)).sorted
      (key, p._3, buf.length.toLong, med, medOfE4(devs))
    }
    if (pts.nonEmpty) ring.update(MedianProcessor.Ring(buf))
    out.iterator
  }
}

object MedianProcessor {
  /** Encoder-friendly state wrapper (Seq[Long] alone is not a Product). */
  final case class Ring(vs: Seq[Long])

  /** Rows: (key, ts, id, cents) → per event: (key, id, n_window,
    * med_e4, mad_e4) — the exact schema of the batch twin.
    */
  def apply(
      spark: SparkSession,
      rows: Dataset[(Long, Long, Long, Long)],
      window: Int = 21): Dataset[(Long, Long, Long, Long, Long)] = {
    import spark.implicits._
    SeriesStatsProcessor.configure(spark)
    rows.groupByKey(_._1)
      .transformWithState(new MedianProcessor(window), TimeMode.None(), OutputMode.Append())
  }
}
