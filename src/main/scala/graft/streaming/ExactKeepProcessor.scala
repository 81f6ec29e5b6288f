package graft.streaming

import org.apache.spark.sql.{Dataset, SparkSession}
import org.apache.spark.sql.Encoders
import org.apache.spark.sql.streaming.{OutputMode, StatefulProcessor, TTLConfig, TimeMode, TimerValues, ValueState}

/** Streaming twin of the exact-dedup KEEP rule (`dedup_exact` /
  * `pipeline_dedup_impact`): keyed by md5 content hash, ValueState
  * holds the current winner (min doc_id seen, with its source and
  * token count). min is associative/commutative/idempotent, so the
  * final winner per hash — and therefore any census aggregated over
  * the winner rows (the dedup-impact "after" columns) — is
  * bit-identical to the batch rule under ANY arrival order or split:
  * a smaller id arriving late simply swaps the winner, and the swap
  * is emitted so downstream replaces the hash's row (last-write-wins
  * by key). State is one fixed-width row per DISTINCT content hash —
  * the same cardinality the batch groupBy shuffles — never row-count-
  * sized.
  *
  * Rows: (hash, doc_id, source, nw) → on change one
  * (hash, keep_id, source, nw) winner row.
  */
class ExactKeepProcessor
    extends StatefulProcessor[String, (String, Long, String, Long), (String, Long, String, Long)] {

  @transient private var winner: ValueState[(Long, String, Long)] = _

  override def init(outputMode: OutputMode, timeMode: TimeMode): Unit =
    winner = getHandle.getValueState[(Long, String, Long)](
      "winner", Encoders.tuple(Encoders.scalaLong, Encoders.STRING, Encoders.scalaLong),
      TTLConfig.NONE)

  override def handleInputRows(
      key: String,
      rows: Iterator[(String, Long, String, Long)],
      timerValues: TimerValues): Iterator[(String, Long, String, Long)] = {
    var cur = if (winner.exists()) Some(winner.get()) else None
    var changed = false
    rows.foreach { case (_, id, src, nw) =>
      if (cur.forall(id < _._1)) { cur = Some((id, src, nw)); changed = true }
    }
    cur match {
      case Some(w) if changed =>
        winner.update(w)
        Iterator((key, w._1, w._2, w._3))
      case _ => Iterator.empty
    }
  }
}

object ExactKeepProcessor {

  def apply(
      spark: SparkSession,
      rows: Dataset[(String, Long, String, Long)]): Dataset[(String, Long, String, Long)] = {
    import spark.implicits._
    SeriesStatsProcessor.configure(spark)
    rows.groupByKey(_._1)
      .transformWithState(new ExactKeepProcessor, TimeMode.None(), OutputMode.Update())
  }
}
