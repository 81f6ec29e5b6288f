package graft.streaming

import org.apache.spark.sql.{Dataset, SparkSession}
import org.apache.spark.sql.Encoders
import org.apache.spark.sql.streaming.{MapState, OutputMode, StatefulProcessor, TTLConfig, TimeMode, TimerValues, ValueState}

/** Streaming twin of `dedup_rate_by_source` — the per-source duplication
  * dashboard that keeps up with ingestion: keyed by source, state is the
  * doc count plus two first-arrival registries (MapState keyed by the
  * 60-bit md5 of the exact text and of the word-set template
  * fingerprint — pre-hashed through the SAME md5-60 dialect the batch
  * query family uses, so stream and batch see identical keys). Distinct
  * counting is idempotent and commutative — a hash's FIRST arrival is
  * the only event that moves the distinct counter — so the emitted
  * (n_docs, n_exact, n_fingerprint, exact_dup_bp, template_dup_bp) row
  * is bit-identical to the batch countDistinct aggregation over the
  * same rows under ANY micro-batch split, with no ordering contract at
  * all. State is bounded by the DISTINCT corpus per source (the
  * registries hold one long per unique text/template), never by the
  * stream length; the bp arithmetic is the batch query's exact integer
  * form.
  *
  * Rows: (source, chHash, fpHash) → per touched source per micro-batch,
  * the running (source, n_docs, n_exact, n_fingerprint, exact_dup_bp,
  * template_dup_bp).
  */
class DedupRateProcessor
    extends StatefulProcessor[String, (String, Long, Long),
      (String, Long, Long, Long, Long, Long)] {

  @transient private var seenCh: MapState[Long, Boolean] = _
  @transient private var seenFp: MapState[Long, Boolean] = _
  @transient private var st: ValueState[(Long, Long, Long)] = _

  override def init(outputMode: OutputMode, timeMode: TimeMode): Unit = {
    seenCh = getHandle.getMapState[Long, Boolean](
      "seenExact", Encoders.scalaLong, Encoders.scalaBoolean, TTLConfig.NONE)
    seenFp = getHandle.getMapState[Long, Boolean](
      "seenFingerprint", Encoders.scalaLong, Encoders.scalaBoolean, TTLConfig.NONE)
    st = getHandle.getValueState[(Long, Long, Long)](
      "counts", Encoders.tuple(Encoders.scalaLong, Encoders.scalaLong,
        Encoders.scalaLong), TTLConfig.NONE)
  }

  override def handleInputRows(
      key: String,
      rows: Iterator[(String, Long, Long)],
      timerValues: TimerValues): Iterator[(String, Long, Long, Long, Long, Long)] = {
    var (n, nCh, nFp) = if (st.exists()) st.get() else (0L, 0L, 0L)
    rows.foreach { case (_, ch, fp) =>
      n += 1
      if (!seenCh.containsKey(ch)) { seenCh.updateValue(ch, true); nCh += 1 }
      if (!seenFp.containsKey(fp)) { seenFp.updateValue(fp, true); nFp += 1 }
    }
    st.update((n, nCh, nFp))
    if (n == 0L) Iterator.empty
    else Iterator.single((key, n, nCh, nFp,
      (n - nCh) * 10000L / n, (n - nFp) * 10000L / n))
  }
}

object DedupRateProcessor {

  /** Rows: (source, chHash, fpHash) → running per-source dup rates. */
  def apply(
      spark: SparkSession,
      rows: Dataset[(String, Long, Long)]): Dataset[(String, Long, Long, Long, Long, Long)] = {
    import spark.implicits._
    SeriesStatsProcessor.configure(spark)
    rows.groupByKey(_._1)
      .transformWithState(new DedupRateProcessor, TimeMode.None(), OutputMode.Update())
  }
}
