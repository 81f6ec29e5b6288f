package graft.streaming

import org.apache.spark.sql.{Dataset, SparkSession}
import org.apache.spark.sql.Encoders
import org.apache.spark.sql.streaming.{OutputMode, StatefulProcessor, TTLConfig, TimeMode, TimerValues, ValueState}

/** Streaming twin of `quality_pii_census` — the privacy gate that keeps
  * up with ingestion: detection is STATELESS (the identical regex +
  * unrolled-Luhn expressions, via `Quality.piiDetections`-shaped per-doc
  * rows), so the processor holds only SEVEN counters per source and its
  * running census after any stream prefix is bit-identical to the batch
  * aggregation over that prefix (all sums, no rank statistics, no
  * frozen reference needed — the AdfProcessor associativity class).
  *
  * Input per doc: (source, n_email, n_phone, n_ipv4, has_cc, cc_luhn);
  * output per touched source per batch: the running
  * (source, n_docs, n_email, n_phone, n_ipv4, n_cc, n_cc_luhn,
  * n_pii_docs, pii_bp) census row.
  */
class PiiProcessor
    extends StatefulProcessor[String, (String, Long, Long, Long, Long, Long),
      (String, Long, Long, Long, Long, Long, Long, Long, Long)] {

  // (nDocs, nEmail, nPhone, nIpv4, nCc, nCcLuhn, nPiiDocs)
  @transient private var tot: ValueState[(Long, Long, Long, Long, Long, Long, Long)] = _

  override def init(outputMode: OutputMode, timeMode: TimeMode): Unit =
    tot = getHandle.getValueState[(Long, Long, Long, Long, Long, Long, Long)](
      "piiTotals", Encoders.product[(Long, Long, Long, Long, Long, Long, Long)],
      TTLConfig.NONE)

  override def handleInputRows(
      key: String,
      rows: Iterator[(String, Long, Long, Long, Long, Long)],
      timerValues: TimerValues): Iterator[(String, Long, Long, Long, Long, Long, Long, Long, Long)] = {
    var (n, ne, np, ni, nc, nl, npii) =
      if (tot.exists()) tot.get() else (0L, 0L, 0L, 0L, 0L, 0L, 0L)
    rows.foreach { case (_, e, p, i, cc, luhn) =>
      n += 1; ne += e; np += p; ni += i; nc += cc; nl += luhn
      if (e + p + i > 0 || cc == 1L) npii += 1
    }
    tot.update((n, ne, np, ni, nc, nl, npii))
    if (n == 0L) Iterator.empty
    else Iterator((key, n, ne, np, ni, nc, nl, npii, 10000L * npii / n))
  }
}

object PiiProcessor {

  /** Rows: (source, n_email, n_phone, n_ipv4, has_cc, cc_luhn) per doc →
    * one running census row per touched source per micro-batch.
    */
  def apply(
      spark: SparkSession,
      rows: Dataset[(String, Long, Long, Long, Long, Long)]): Dataset[(String, Long, Long, Long, Long, Long, Long, Long, Long)] = {
    import spark.implicits._
    SeriesStatsProcessor.configure(spark)
    rows.groupByKey(_._1)
      .transformWithState(new PiiProcessor, TimeMode.None(), OutputMode.Update())
  }
}
