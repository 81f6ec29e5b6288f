package graft.streaming

import org.apache.spark.sql.{Dataset, Encoders, SparkSession}
import org.apache.spark.sql.streaming.{OutputMode, StatefulProcessor, TTLConfig, TimeMode, TimerValues, ValueState}

/** Streaming trajectory SPEED GATE — the transformWithState twin of
  * `geo_speed_gate` (teleportation / GPS-spoof detection): per user,
  * state is the LAST seen position and timestamp plus the running
  * hop/violation counters; every arrival checks the pure-integer
  * speed-limit comparison against the carried location — the same
  * d² > v²·dt² cross-multiplication as the batch query, with the
  * elapsed seconds clamped INSIDE the product (the batch query's ANSI
  * lesson). Intra-batch rows fold in (ts, event_id) order (the house
  * ordering contract), so the streamed counters equal the batch lag
  * window bit-for-bit under any split at batch boundaries. This is
  * the online shape of the gate: a fraud pipeline flags the hop the
  * moment it arrives, not at the end of the day.
  */
class SpeedGateProcessor
    extends StatefulProcessor[Long, (Long, Long, Long, Long, Long),
      (Long, Long, Long, Long)] {

  @transient private var st: ValueState[SpeedGateProcessor.S] = _

  override def init(outputMode: OutputMode, timeMode: TimeMode): Unit =
    st = getHandle.getValueState[SpeedGateProcessor.S](
      "speedgate", Encoders.product[SpeedGateProcessor.S], TTLConfig.NONE)

  override def handleInputRows(
      key: Long,
      rows: Iterator[(Long, Long, Long, Long, Long)],
      timerValues: TimerValues): Iterator[(Long, Long, Long, Long)] = {
    val pts = rows.toArray.sortBy(r => (r._2, r._3))
    if (pts.isEmpty) Iterator.empty
    else {
      var s = if (st.exists()) st.get()
        else SpeedGateProcessor.S(first = true, 0L, 0L, 0L, 0L, 0L, 0L)
      pts.foreach { case (_, ts, _, lat, lon) =>
        if (!s.first) {
          val d2 = (lat - s.lat) * (lat - s.lat) + (lon - s.lon) * (lon - s.lon)
          val dt = math.max((ts - s.ts) / 1000000L, 1L)
          val cl = math.min(dt, 1001L)
          val teleport = dt <= 1000L && d2 > 1000000000000L * cl * cl
          s = s.copy(ts = ts, lat = lat, lon = lon, nHops = s.nHops + 1,
            nTel = s.nTel + (if (teleport) 1L else 0L),
            maxD2 = if (teleport) math.max(s.maxD2, d2) else s.maxD2)
        } else {
          s = s.copy(first = false, ts = ts, lat = lat, lon = lon)
        }
      }
      st.update(s)
      Iterator.single((key, s.nHops, s.nTel, s.maxD2))
    }
  }
}

/** Per-HOP event twin of [[SpeedGateProcessor]] — the alerting shape:
  * instead of running counters, emit ONE ROW PER TELEPORTING HOP the
  * moment it arrives — (user_id, ts_us, event_id, d2, dt_s) — so a
  * downstream sink can page on the event itself. Same state (last
  * position), same pure-integer gate, same (ts, event_id) intra-batch
  * fold order; the union of all emitted rows over any batch split
  * equals the batch lag-window's teleport hop set exactly (each hop is
  * evaluated exactly once, when its arrival closes the pair). Emitted
  * alerts are append-only by construction — a hop never re-emits,
  * because the carried state advances past it.
  */
class SpeedGateHopsProcessor
    extends StatefulProcessor[Long, (Long, Long, Long, Long, Long),
      (Long, Long, Long, Long, Long)] {

  @transient private var st: ValueState[SpeedGateProcessor.S] = _

  override def init(outputMode: OutputMode, timeMode: TimeMode): Unit =
    st = getHandle.getValueState[SpeedGateProcessor.S](
      "speedgate_hops", Encoders.product[SpeedGateProcessor.S], TTLConfig.NONE)

  override def handleInputRows(
      key: Long,
      rows: Iterator[(Long, Long, Long, Long, Long)],
      timerValues: TimerValues): Iterator[(Long, Long, Long, Long, Long)] = {
    val pts = rows.toArray.sortBy(r => (r._2, r._3))
    if (pts.isEmpty) Iterator.empty
    else {
      var s = if (st.exists()) st.get()
        else SpeedGateProcessor.S(first = true, 0L, 0L, 0L, 0L, 0L, 0L)
      val alerts = Array.newBuilder[(Long, Long, Long, Long, Long)]
      pts.foreach { case (_, ts, eid, lat, lon) =>
        if (!s.first) {
          val d2 = (lat - s.lat) * (lat - s.lat) + (lon - s.lon) * (lon - s.lon)
          val dt = math.max((ts - s.ts) / 1000000L, 1L)
          val cl = math.min(dt, 1001L)
          if (dt <= 1000L && d2 > 1000000000000L * cl * cl)
            alerts += ((key, ts, eid, d2, dt))
          s = s.copy(ts = ts, lat = lat, lon = lon, nHops = s.nHops + 1)
        } else {
          s = s.copy(first = false, ts = ts, lat = lat, lon = lon)
        }
      }
      st.update(s)
      alerts.result().iterator
    }
  }
}

object SpeedGateHopsProcessor {
  /** Rows as [[SpeedGateProcessor.apply]]; output one row per teleport
    * hop: (user_id, ts_us, event_id, d2, dt_s).
    */
  def apply(
      spark: SparkSession,
      rows: Dataset[(Long, Long, Long, Long, Long)])
    : Dataset[(Long, Long, Long, Long, Long)] = {
    import spark.implicits._
    SeriesStatsProcessor.configure(spark)
    rows.groupByKey(_._1)
      .transformWithState(new SpeedGateHopsProcessor,
        TimeMode.None(), OutputMode.Update())
  }
}

object SpeedGateProcessor {
  /** Last position + running counters. */
  final case class S(first: Boolean, ts: Long, lat: Long, lon: Long,
    nHops: Long, nTel: Long, maxD2: Long)

  /** Rows: (user_id, ts_us, event_id, lat, lon) with positions derived
    * upstream through the shared builder. Output per batch per user:
    * (user_id, n_hops, n_teleports, max_teleport_d2).
    */
  def apply(
      spark: SparkSession,
      rows: Dataset[(Long, Long, Long, Long, Long)])
    : Dataset[(Long, Long, Long, Long)] = {
    import spark.implicits._
    SeriesStatsProcessor.configure(spark)
    rows.groupByKey(_._1)
      .transformWithState(new SpeedGateProcessor,
        TimeMode.None(), OutputMode.Update())
  }
}
