package graft.streaming

import graft.core.GtsRow
import org.apache.spark.sql.{Dataset, Encoders, SparkSession}
import org.apache.spark.sql.streaming.{OutputMode, StatefulProcessor, TTLConfig, TimeMode, TimerValues, ValueState}

/** Spark 4 arbitrary-stateful-processing v2 (transformWithState): a
  * per-series running (count, max) tracker — the modern replacement for
  * mapGroupsWithState, with typed state handles backed by the RocksDB
  * state store. Emits the updated stats for each series touched in a
  * micro-batch.
  */
class SeriesStatsProcessor extends StatefulProcessor[String, GtsRow, (String, Long, Double)] {

  @transient private var stats: ValueState[(Long, Double)] = _

  override def init(outputMode: OutputMode, timeMode: TimeMode): Unit =
    stats = getHandle.getValueState[(Long, Double)](
      "seriesStats", Encoders.product[(Long, Double)], TTLConfig.NONE)

  override def handleInputRows(
      key: String,
      rows: Iterator[GtsRow],
      timerValues: TimerValues): Iterator[(String, Long, Double)] = {
    // NaN = "no numeric value seen yet" — a bool/string-only series must
    // not surface a Double.MinValue sentinel as its max
    val prev = if (stats.exists()) stats.get() else (0L, Double.NaN)
    var n = prev._1
    var mx = prev._2
    def bump(v: Double): Unit = if (mx.isNaN || v > mx) mx = v
    rows.foreach { r =>
      n += 1
      r.v_double.foreach(bump)
      r.v_long.foreach(v => bump(v.toDouble))
    }
    stats.update((n, mx))
    Iterator.single((key, n, mx))
  }
}

object SeriesStatsProcessor {
  /** transformWithState requires the RocksDB state store provider. */
  def configure(spark: SparkSession): Unit =
    spark.conf.set("spark.sql.streaming.stateStore.providerClass",
      "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider")

  def apply(spark: SparkSession, parsed: Dataset[GtsRow]): Dataset[(String, Long, Double)] = {
    import spark.implicits._
    configure(spark)
    parsed.groupByKey(_.name)
      .transformWithState(new SeriesStatsProcessor, TimeMode.None(), OutputMode.Update())
  }
}
