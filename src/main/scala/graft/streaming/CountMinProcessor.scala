package graft.streaming

import org.apache.spark.sql.{Dataset, Encoders, SparkSession}
import org.apache.spark.sql.streaming.{OutputMode, StatefulProcessor, TTLConfig, TimeMode, TimerValues, ValueState}

/** Streaming Count-Min sketch — the transformWithState twin of
  * `sketch_countmin` (Cormode &amp; Muthukrishnan, "An improved data
  * stream summary: the count-min sketch and its applications",
  * J. Algorithms 55, 2005 — public): per stream key, a depth×width
  * counter table in state; every arrival increments one bucket per
  * depth row. CM is a LINEAR sketch — cell values are sums of
  * per-arrival indicator vectors — so the streaming table equals the
  * batch-aggregated table EXACTLY under any micro-batch split, with no
  * ordering precondition at all. Bucket indices arrive PRE-HASHED
  * through the shared [[graft.ops.Sketch.h60]] expression (the
  * BottomKProcessor discipline: stream and batch hash identically by
  * construction). State is depth×width longs per key forever — the
  * constant-memory property that makes CM the distributed-systems
  * frequency sketch of choice. Emits the touched cells' new values
  * each batch (Update-mode semantics): the last emit per cell IS the
  * final table.
  */
class CountMinProcessor(depth: Int, width: Int)
    extends StatefulProcessor[String, (String, Int, Int), (String, Int, Int, Long)] {

  require(depth >= 1 && depth <= 16 && width >= 2 && width <= 65536,
    "depth in [1,16], width in [2,65536]")

  @transient private var st: ValueState[CountMinProcessor.S] = _

  override def init(outputMode: OutputMode, timeMode: TimeMode): Unit =
    st = getHandle.getValueState[CountMinProcessor.S](
      "countmin", Encoders.product[CountMinProcessor.S], TTLConfig.NONE)

  override def handleInputRows(
      key: String,
      rows: Iterator[(String, Int, Int)],
      timerValues: TimerValues): Iterator[(String, Int, Int, Long)] = {
    val cells: Array[Long] =
      if (st.exists()) st.get().cells.toArray
      else Array.fill(depth * width)(0L)
    val touched = scala.collection.mutable.LinkedHashSet.empty[Int]
    rows.foreach { case (_, j, bucket) =>
      require(j >= 0 && j < depth && bucket >= 0 && bucket < width,
        s"cell ($j,$bucket) outside ${depth}x$width")
      val i = j * width + bucket
      cells(i) += 1L
      touched += i
    }
    if (touched.isEmpty) Iterator.empty
    else {
      st.update(CountMinProcessor.S(cells.toSeq))
      touched.iterator.map(i => (key, i / width, i % width, cells(i)))
    }
  }
}

object CountMinProcessor {
  /** The flattened depth×width counter table (row-major). */
  final case class S(cells: Seq[Long])

  /** Rows: (key, j, bucket) — one per (arrival, depth row), pre-hashed
    * upstream. Output: (key, j, bucket, count) for each touched cell.
    */
  def apply(
      spark: SparkSession,
      rows: Dataset[(String, Int, Int)],
      depth: Int,
      width: Int): Dataset[(String, Int, Int, Long)] = {
    import spark.implicits._
    SeriesStatsProcessor.configure(spark)
    rows.groupByKey(_._1)
      .transformWithState(new CountMinProcessor(depth, width),
        TimeMode.None(), OutputMode.Update())
  }
}
