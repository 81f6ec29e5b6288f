package graft.streaming

import org.apache.spark.sql.{Dataset, Encoders, SparkSession}
import org.apache.spark.sql.streaming.{OutputMode, StatefulProcessor, TTLConfig, TimeMode, TimerValues, ValueState}

/** Streaming twin of the batch `quality_encoding` mojibake scan,
  * aggregated per source — the live ingest-hygiene gate: every
  * micro-batch, for each source key, the running totals of the UTF-8
  * byte-class census (bytes, continuation bytes, lead-promised
  * continuations, control bytes) plus how many documents carried ANY
  * damage. The per-doc classification (including the deterministic
  * damage plant) is the EXACT Scala mirror of the batch hex-dialect
  * CASE — [[graft.queries.Quality.encodingMetrics]] — and all state is
  * plain sums, so the processor is order-insensitive and every
  * emission equals the batch builder grouped by source over the rows
  * seen so far, bit-for-bit (StreamingSpec pins it).
  *
  * Scale note: per-doc metrics are associative; at firehose scale the
  * upstream map task can pre-classify (the classify function is pure)
  * and feed count deltas instead of raw hex.
  */
class Utf8GateProcessor
    extends StatefulProcessor[String, (String, Long, String), (String, Long, Long, Long, Long, Long)] {

  @transient private var st: ValueState[Utf8GateProcessor.S] = _

  override def init(outputMode: OutputMode, timeMode: TimeMode): Unit =
    st = getHandle.getValueState[Utf8GateProcessor.S](
      "utf8gate", Encoders.product[Utf8GateProcessor.S], TTLConfig.NONE)

  override def handleInputRows(
      key: String,
      rows: Iterator[(String, Long, String)],
      timerValues: TimerValues): Iterator[(String, Long, Long, Long, Long, Long)] = {
    var s = if (st.exists()) st.get() else Utf8GateProcessor.S(0L, 0L, 0L, 0L, 0L, 0L)
    rows.foreach { case (_, docId, hx) =>
      val m = Utf8GateProcessor.classify(docId, hx)
      s = Utf8GateProcessor.S(
        s.nDocs + 1L,
        s.nBytes + m.nBytes,
        s.nCont + m.nCont,
        s.contExpected + m.contExpected,
        s.nCtrl + m.nCtrl,
        s.nDamaged + (if (math.abs(m.nCont - m.contExpected) * 10 + m.nCtrl > 0) 1L else 0L))
    }
    st.update(s)
    if (s.nDocs == 0) Iterator.empty
    else Iterator.single((key, s.nDocs, s.nBytes,
      s.nCont - s.contExpected, s.nCtrl, s.nDamaged))
  }
}

object Utf8GateProcessor {

  /** Running per-source sums. */
  final case class S(nDocs: Long, nBytes: Long, nCont: Long,
      contExpected: Long, nCtrl: Long, nDamaged: Long)

  /** One doc's byte-class census. */
  final case class M(nBytes: Long, nCont: Long, contExpected: Long, nCtrl: Long)

  /** Exact Scala mirror of the batch hex-dialect classification in
    * `Quality.encodingMetrics` — same damage plant (byte position
    * p ≡ doc_id mod 7 overwritten by the doc_id mod 4 rotation), same
    * first-hex-digit classes, same control-byte allowlist.
    */
  def classify(docId: Long, hx: String): M = {
    val nb = hx.length / 2
    var cont = 0L
    var exp = 0L
    var ctrl = 0L
    var p = 1
    while (p <= nb) {
      val bb =
        if (p % 7 == docId % 7) (docId % 4) match {
          case 0 => "BF"
          case 1 => "C3"
          case 2 => "F0"
          case _ => "00"
        }
        else hx.substring(2 * p - 2, 2 * p)
      bb.charAt(0) match {
        case '8' | '9' | 'A' | 'B' => cont += 1
        case 'C' | 'D' => exp += 1
        case 'E' => exp += 2
        case 'F' => exp += 3
        case '0' | '1' =>
          if (bb != "09" && bb != "0A" && bb != "0D") ctrl += 1
        case _ => ()
      }
      p += 1
    }
    M(nb, cont, exp, ctrl)
  }

  /** Rows: (source, doc_id, hex-of-first-64-bytes) in ANY order → per
    * touched source each micro-batch, one running row:
    * (source, n_docs, n_bytes, cont_excess, n_ctrl, n_damaged).
    */
  def apply(
      spark: SparkSession,
      rows: Dataset[(String, Long, String)]): Dataset[(String, Long, Long, Long, Long, Long)] = {
    import spark.implicits._
    SeriesStatsProcessor.configure(spark)
    rows.groupByKey(_._1)
      .transformWithState(new Utf8GateProcessor, TimeMode.None(), OutputMode.Update())
  }
}
