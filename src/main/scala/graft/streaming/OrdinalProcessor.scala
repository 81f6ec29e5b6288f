package graft.streaming

import org.apache.spark.sql.{Dataset, Encoders, SparkSession}
import org.apache.spark.sql.streaming.{OutputMode, StatefulProcessor, TTLConfig, TimeMode, TimerValues, ValueState}

/** Streaming twin of the ts_ordinal_patterns pattern stage (Bandt–Pompe
  * ordinal symbols over each series): state per key is just the last
  * TWO series values, and every arrival beyond the second emits the
  * ordinal pattern of the completed triple — exactly the triples the
  * batch `lead(c,1)/lead(c,2)` chain forms, with the identical stable
  * tie rule (equal values order by position). Fold-twin ordering
  * precondition: per-key rows arrive in series order across batches
  * (intra-batch arrivals are sorted here); under that, the grouped
  * pattern counts equal the batch histogram after any stream prefix.
  *
  * Scale: three longs of state per key, RocksDB-backed like every
  * transformWithState op; emission is one row per arrival.
  */
class OrdinalProcessor
    extends StatefulProcessor[String, (String, Long, Long), (String, String)] {

  @transient private var st: ValueState[(Long, Long, Long)] = _

  override def init(outputMode: OutputMode, timeMode: TimeMode): Unit =
    st = getHandle.getValueState[(Long, Long, Long)](
      "last2", Encoders.product[(Long, Long, Long)], TTLConfig.NONE)

  override def handleInputRows(
      key: String,
      rows: Iterator[(String, Long, Long)],
      timerValues: TimerValues): Iterator[(String, String)] = {
    var (n, p2, p1) = if (st.exists()) st.get() else (0L, 0L, 0L)
    val out = Seq.newBuilder[(String, String)]
    // (h, c) sorted by h: the batch window order within the micro-batch
    rows.toArray.sortBy(_._2).foreach { case (_, _, c) =>
      if (n >= 2) out += ((key, OrdinalProcessor.pattern(p2, p1, c)))
      p2 = p1; p1 = c; n = math.min(n + 1, 2L)
    }
    st.update((n, p2, p1))
    out.result().iterator
  }
}

object OrdinalProcessor {

  /** The 6-way ordinal pattern of (a, b, c) — sorted indices by
    * (value, position), identical branch order to the batch CASE.
    */
  def pattern(a: Long, b: Long, c: Long): String =
    if (a <= b && b <= c) "012"
    else if (a <= c && c < b) "021"
    else if (b < a && a <= c) "102"
    else if (b <= c && c < a) "120"
    else if (c < a && a <= b) "201"
    else "210"

  /** Rows: (seriesKey, h, c) with per-key h ascending across batches →
    * one (seriesKey, pattern) row per completed triple.
    */
  def apply(
      spark: SparkSession,
      rows: Dataset[(String, Long, Long)]): Dataset[(String, String)] = {
    import spark.implicits._
    SeriesStatsProcessor.configure(spark)
    rows.groupByKey(_._1)
      .transformWithState(new OrdinalProcessor, TimeMode.None(), OutputMode.Update())
  }
}
