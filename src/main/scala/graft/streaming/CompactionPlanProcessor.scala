package graft.streaming

import org.apache.spark.sql.{Dataset, Encoders, SparkSession}
import org.apache.spark.sql.streaming.{OutputMode, StatefulProcessor, TTLConfig, TimeMode, TimerValues, ValueState}

/** Streaming compaction-plan maintenance — the write-path twin of
  * `layout_compaction_plan` (r8 verdict #7): as data files land in a
  * table partition, the service keeps the running cumulative-quota bin
  * ledger per source — file count, byte total, bin count, the open
  * bin's fill, the completed-bin max, and the oversize census — i.e.
  * everything the batch planner's per-source summary row reports,
  * maintained in SEVEN LONGS of ValueState per key. Binning is the
  * same cumulative-quota rule as the batch query (`bin = bytes-before
  * DIV target`) applied in ARRIVAL order (doc_id asc, the house
  * ordering contract — an append stream has no bytes-desc global sort;
  * the batch parity reference in StreamingSpec runs the identical
  * window fold in the same order). All carried state is associative
  * sums plus the open-bin carry, so the final row after ANY micro-batch
  * split — including a split mid-bin — is bit-identical to the batch
  * fold, and checkpoint restart recovers the open bin exactly.
  *
  * Rows: (source, doc_id, bytes) → per touched source per micro-batch,
  * the current plan summary: (source, n_files, total_bytes, n_bins,
  * ideal_bins, max_bin_bytes, oversize_files, reduction_bp).
  */
class CompactionPlanProcessor(target: Long)
    extends StatefulProcessor[String, (String, Long, Long),
      (String, Long, Long, Long, Long, Long, Long, Long)] {

  require(target >= 1, "target bytes >= 1")

  @transient private var st: ValueState[CompactionPlanProcessor.S] = _

  override def init(outputMode: OutputMode, timeMode: TimeMode): Unit =
    st = getHandle.getValueState[CompactionPlanProcessor.S](
      "compaction", Encoders.product[CompactionPlanProcessor.S], TTLConfig.NONE)

  override def handleInputRows(
      key: String,
      rows: Iterator[(String, Long, Long)],
      timerValues: TimerValues): Iterator[(String, Long, Long, Long, Long, Long, Long, Long)] = {
    // the house ordering contract: fold in doc_id order within the batch
    val pts = rows.toArray.sortBy(_._2)
    if (pts.isEmpty) Iterator.empty
    else {
      var s = if (st.exists()) st.get()
        else CompactionPlanProcessor.S(0L, 0L, 0L, -1L, 0L, 0L, 0L)
      pts.foreach { case (_, _, bytes) =>
        val bin = s.total / target
        if (bin != s.curBin) {
          if (s.curBin >= 0L && s.curBytes > s.maxDone) s = s.copy(maxDone = s.curBytes)
          s = s.copy(curBin = bin, curBytes = 0L, nBins = s.nBins + 1L)
        }
        s = s.copy(n = s.n + 1L, total = s.total + bytes,
          curBytes = s.curBytes + bytes,
          oversize = s.oversize + (if (bytes > target) 1L else 0L))
      }
      st.update(s)
      val idealBins = (s.total + target - 1L) / target
      val maxBin = math.max(s.maxDone, s.curBytes)
      val reductionBp = 10000L * (s.n - s.nBins) / s.n
      Iterator.single((key, s.n, s.total, s.nBins, idealBins, maxBin,
        s.oversize, reductionBp))
    }
  }
}

object CompactionPlanProcessor {
  /** Running ledger: file count, byte total, bins opened so far, the
    * open bin's index and fill, the completed-bin max, oversize count.
    */
  final case class S(n: Long, total: Long, nBins: Long,
    curBin: Long, curBytes: Long, maxDone: Long, oversize: Long)

  /** Rows: (source, doc_id, bytes) → running per-source plan summary. */
  def apply(
      spark: SparkSession,
      rows: Dataset[(String, Long, Long)],
      target: Long): Dataset[(String, Long, Long, Long, Long, Long, Long, Long)] = {
    import spark.implicits._
    SeriesStatsProcessor.configure(spark)
    rows.groupByKey(_._1)
      .transformWithState(new CompactionPlanProcessor(target),
        TimeMode.None(), OutputMode.Update())
  }
}
