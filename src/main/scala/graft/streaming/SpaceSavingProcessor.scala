package graft.streaming

import org.apache.spark.sql.{Dataset, Encoders, SparkSession}
import org.apache.spark.sql.streaming.{OutputMode, StatefulProcessor, TTLConfig, TimeMode, TimerValues, ValueState}

/** Streaming heavy hitters via SPACE-SAVING (Metwally, Agrawal, El
  * Abbadi, "Efficient computation of frequent and top-k elements in data
  * streams", ICDT'05 — public): per stream key, at most `k` (item,
  * count, err) counters. A seen item increments its counter; an unseen
  * item evicts the MINIMUM counter and inherits its count as the new
  * item's error bound. The classic guarantees hold per key regardless of
  * stream length:
  *
  *  - any item with true frequency &gt; N/k is IN the summary;
  *  - for every tracked item: true ≤ est and est − err ≤ true.
  *
  * State is O(k) per key forever — the bounded-memory property that
  * makes it the streaming top-k of choice. Determinism: intra-batch
  * points are sorted by (ts, id) before folding (same contract as every
  * processor here), and min-eviction ties break on the smallest item
  * string, so the summary is a pure function of the per-key arrival
  * order.
  */
class SpaceSavingProcessor(k: Int)
    extends StatefulProcessor[String, (String, Long, Long, String), (String, String, Long, Long, Long)] {

  require(k >= 1 && k <= 4096, "k in [1,4096]")

  @transient private var st: ValueState[SpaceSavingProcessor.S] = _

  override def init(outputMode: OutputMode, timeMode: TimeMode): Unit =
    st = getHandle.getValueState[SpaceSavingProcessor.S](
      "spacesaving", Encoders.product[SpaceSavingProcessor.S], TTLConfig.NONE)

  override def handleInputRows(
      key: String,
      rows: Iterator[(String, Long, Long, String)],
      timerValues: TimerValues): Iterator[(String, String, Long, Long, Long)] = {
    val pts = rows.toArray.sortBy(r => (r._2, r._3))
    if (pts.isEmpty) Iterator.empty
    else {
      val prev = if (st.exists()) st.get() else SpaceSavingProcessor.S(Seq.empty, 0L)
      // (item -> (count, err)) — small (≤ k), a mutable map per batch is fine
      val m = scala.collection.mutable.LinkedHashMap[String, (Long, Long)](
        prev.entries.map(e => e._1 -> ((e._2, e._3))): _*)
      pts.foreach { p =>
        val item = p._4
        m.get(item) match {
          case Some((c, e)) => m(item) = (c + 1, e)
          case None if m.size < k => m(item) = (1L, 0L)
          case None =>
            val (evict, (mc, _)) = m.minBy { case (it, (c, _)) => (c, it) }
            m.remove(evict)
            m(item) = (mc + 1, mc)
        }
      }
      val n = prev.n + pts.length
      val entries = m.toSeq.map { case (it, (c, e)) => (it, c, e) }
        .sortBy { case (it, c, _) => (-c, it) }
      st.update(SpaceSavingProcessor.S(entries, n))
      entries.iterator.map { case (it, c, e) => (key, it, c, e, n) }
    }
  }
}

object SpaceSavingProcessor {
  /** Encoder-friendly state: the counter table (item, count, err) plus
    * the monotone processed-row count N (versions emitted rows and
    * anchors the N/k guarantee).
    */
  final case class S(entries: Seq[(String, Long, Long)], n: Long)

  /** Rows: (key, ts, id, item) → per key per micro-batch, the full
    * summary: (key, item, est, err, n_seen).
    */
  def apply(
      spark: SparkSession,
      rows: Dataset[(String, Long, Long, String)],
      k: Int): Dataset[(String, String, Long, Long, Long)] = {
    import spark.implicits._
    SeriesStatsProcessor.configure(spark)
    rows.groupByKey(_._1)
      .transformWithState(new SpaceSavingProcessor(k), TimeMode.None(), OutputMode.Update())
  }
}
