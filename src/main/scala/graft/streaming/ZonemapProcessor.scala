package graft.streaming

import org.apache.spark.sql.{Dataset, SparkSession}
import org.apache.spark.sql.Encoders
import org.apache.spark.sql.streaming.{OutputMode, StatefulProcessor, TTLConfig, TimeMode, TimerValues, ValueState}

/** Streaming zone-map maintenance — the write-path half of
  * `layout_zonemap_skip`: as rows stream into a file/partition, the
  * writer keeps the running (min, max) of each predicate column plus
  * the row count, exactly the statistics a lakehouse manifest records
  * per data file and the scan-side skipping eval consumes. Keyed by
  * the file id, state is five longs (ValueState); min/max are monotone
  * under append and the count is an associative sum, so the final row
  * after ANY micro-batch split is bit-identical to the batch
  * min/max/count aggregate over the same rows (StreamingSpec parity
  * twin vs the zones() aggregate shape).
  *
  * Rows: (fileKey, p, s) → one running
  * (fileKey, n, p_min, p_max, s_min, s_max) row per touched file per
  * micro-batch.
  */
class ZonemapProcessor
    extends StatefulProcessor[String, (String, Long, Long), (String, Long, Long, Long, Long, Long)] {

  @transient private var st: ValueState[(Long, Long, Long, Long, Long)] = _

  override def init(outputMode: OutputMode, timeMode: TimeMode): Unit = {
    st = getHandle.getValueState[(Long, Long, Long, Long, Long)](
      "zonemap", Encoders.tuple(Encoders.scalaLong, Encoders.scalaLong,
        Encoders.scalaLong, Encoders.scalaLong, Encoders.scalaLong), TTLConfig.NONE)
  }

  override def handleInputRows(
      key: String,
      rows: Iterator[(String, Long, Long)],
      timerValues: TimerValues): Iterator[(String, Long, Long, Long, Long, Long)] = {
    var (n, p0, p1, s0, s1) =
      if (st.exists()) st.get()
      else (0L, Long.MaxValue, Long.MinValue, Long.MaxValue, Long.MinValue)
    rows.foreach { case (_, p, s) =>
      n += 1
      if (p < p0) p0 = p
      if (p > p1) p1 = p
      if (s < s0) s0 = s
      if (s > s1) s1 = s
    }
    st.update((n, p0, p1, s0, s1))
    if (n == 0L) Iterator.empty
    else Iterator((key, n, p0, p1, s0, s1))
  }
}

object ZonemapProcessor {

  /** Rows: (fileKey, p, s) → running per-file zone maps. */
  def apply(
      spark: SparkSession,
      rows: Dataset[(String, Long, Long)]): Dataset[(String, Long, Long, Long, Long, Long)] = {
    import spark.implicits._
    SeriesStatsProcessor.configure(spark)
    rows.groupByKey(_._1)
      .transformWithState(new ZonemapProcessor, TimeMode.None(), OutputMode.Update())
  }
}
