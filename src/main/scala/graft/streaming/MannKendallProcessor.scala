package graft.streaming

import org.apache.spark.sql.{Dataset, Encoders, SparkSession}
import org.apache.spark.sql.streaming.{OutputMode, StatefulProcessor, TTLConfig, TimeMode, TimerValues, ValueState}

/** Streaming twin of the batch `ts_mann_kendall` trend test: per key,
  * the Kendall S statistic over the hourly-mean series of the NEWEST
  * ≤ 256 hours — the live "is this metric trending" monitor.
  *
  * State is window-bounded, never data-bounded: per kept hour the
  * (Σcents, count) pair, parallel vectors ascending by hour. A new
  * row only touches its own hour's sums; the statistic is then
  * recomputed over the ≤ 256 kept means exactly as the batch
  * pair-join does — truncating hourly means (Σ DIV n), sign pairs
  * (earlier, later), 10⁴·S DIV pairs — so every emission equals the
  * batch query over the rows seen so far, bit-for-bit. The O(k²)
  * recompute is ≤ 256·255/2 integer comparisons per touched key per
  * micro-batch — constant work, the price of exactness.
  *
  * Ordering contract: per-key rows arrive in ts order ACROSS batches
  * (hours are non-decreasing, so evicting all but the newest 256
  * hours can never drop an hour that still receives data); arrivals
  * within a batch are sorted here. Late data for a still-kept hour is
  * handled exactly (the hour's sums just update).
  */
class MannKendallProcessor
    extends StatefulProcessor[String, (String, Long, Long), (String, Long, Long, Long, Long)] {

  import MannKendallProcessor.MaxHours

  @transient private var st: ValueState[MannKendallProcessor.S] = _

  override def init(outputMode: OutputMode, timeMode: TimeMode): Unit =
    st = getHandle.getValueState[MannKendallProcessor.S](
      "mk", Encoders.product[MannKendallProcessor.S], TTLConfig.NONE)

  override def handleInputRows(
      key: String,
      rows: Iterator[(String, Long, Long)],
      timerValues: TimerValues): Iterator[(String, Long, Long, Long, Long)] = {
    val prev = if (st.exists()) st.get()
      else MannKendallProcessor.S(Seq.empty, Seq.empty, Seq.empty)
    val byHour = scala.collection.mutable.TreeMap.empty[Long, (Long, Long)]
    prev.hs.iterator.zip(prev.sums.iterator.zip(prev.cnts.iterator))
      .foreach { case (h, sc) => byHour.update(h, sc) }
    rows.toArray.sortBy(_._2).foreach { case (_, tsUs, cents) =>
      val h = tsUs / 3600000000L // truncating, == the batch DIV
      val (sm, c) = byHour.getOrElse(h, (0L, 0L))
      byHour.update(h, (sm + cents, c + 1L))
    }
    while (byHour.size > MaxHours) byHour.remove(byHour.firstKey)
    st.update(MannKendallProcessor.S(byHour.keysIterator.toSeq,
      byHour.valuesIterator.map(_._1).toSeq, byHour.valuesIterator.map(_._2).toSeq))
    val cs = byHour.valuesIterator.map { case (sm, c) => sm / c }.toArray
    val k = cs.length
    if (k < 2) Iterator.empty
    else {
      var s = 0L; var ties = 0L
      var i = 0
      while (i < k) {
        var j = i + 1
        while (j < k) {
          if (cs(j) > cs(i)) s += 1
          else if (cs(j) < cs(i)) s -= 1
          else ties += 1
          j += 1
        }
        i += 1
      }
      val nPairs = k.toLong * (k - 1) / 2
      Iterator((key, nPairs, s, ties, 10000L * s / nPairs))
    }
  }
}

object MannKendallProcessor {
  val MaxHours = 256

  /** Kept hours ascending with their (Σcents, count) — parallel
    * vectors for the product encoder.
    */
  final case class S(hs: Seq[Long], sums: Seq[Long], cnts: Seq[Long])

  /** Rows: (key, tsMicros, cents) in per-key ts order → per touched
    * key each micro-batch: (key, n_pairs, s, n_ties, tau_bp) — the
    * batch query's exact output columns (keys with fewer than two
    * hours emit nothing, matching the batch inner pair-join).
    */
  def apply(
      spark: SparkSession,
      rows: Dataset[(String, Long, Long)]): Dataset[(String, Long, Long, Long, Long)] = {
    import spark.implicits._
    SeriesStatsProcessor.configure(spark)
    rows.groupByKey(_._1)
      .transformWithState(new MannKendallProcessor, TimeMode.None(), OutputMode.Update())
  }
}
