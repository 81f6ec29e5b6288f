package graft.streaming

import org.apache.spark.sql.{Dataset, Encoders, SparkSession}
import org.apache.spark.sql.streaming.{OutputMode, StatefulProcessor, TTLConfig, TimeMode, TimerValues, ValueState}

/** Streaming per-file BLOOM + zone-map manifest maintenance — the
  * write-path twin of `layout_bloom_skip` (as [[ZonemapProcessor]] is
  * of `layout_zonemap_skip`): as rows land in a file, the processor
  * OR-folds the pre-hashed bloom word contributions and tracks
  * min/max/count, i.e. exactly the per-file statistics block a
  * lakehouse manifest stores so point lookups can skip files. Word
  * contributions arrive through the shared
  * [[graft.ops.Sketch.bloomWordSql]] expression (the house pre-hash
  * discipline), and OR/min/max/count are all associative AND
  * commutative — the streamed manifest equals the batch aggregation
  * bit-for-bit under any micro-batch split or arrival order; OR and
  * min/max are additionally idempotent, so replayed rows cannot
  * corrupt the bloom or the bounds. State: 4 words + 3 scalars per
  * file, forever.
  */
class BloomManifestProcessor
    extends StatefulProcessor[String, (String, Long, Long, Long, Long, Long),
      (String, Long, Long, Long, Long, Long, Long, Long)] {

  @transient private var st: ValueState[BloomManifestProcessor.S] = _

  override def init(outputMode: OutputMode, timeMode: TimeMode): Unit =
    st = getHandle.getValueState[BloomManifestProcessor.S](
      "bloommanifest", Encoders.product[BloomManifestProcessor.S], TTLConfig.NONE)

  override def handleInputRows(
      key: String,
      rows: Iterator[(String, Long, Long, Long, Long, Long)],
      timerValues: TimerValues): Iterator[(String, Long, Long, Long, Long, Long, Long, Long)] = {
    var s = if (st.exists()) st.get()
      else BloomManifestProcessor.S(0L, 0L, 0L, 0L, Long.MaxValue, Long.MinValue, 0L)
    var any = false
    rows.foreach { case (_, w0, w1, w2, w3, pk) =>
      s = BloomManifestProcessor.S(s.b0 | w0, s.b1 | w1, s.b2 | w2, s.b3 | w3,
        math.min(s.mn, pk), math.max(s.mx, pk), s.n + 1)
      any = true
    }
    if (!any) Iterator.empty
    else {
      st.update(s)
      Iterator.single((key, s.b0, s.b1, s.b2, s.b3, s.mn, s.mx, s.n))
    }
  }
}

object BloomManifestProcessor {
  /** The manifest block: 4 bloom words, min/max key, row count. */
  final case class S(b0: Long, b1: Long, b2: Long, b3: Long,
    mn: Long, mx: Long, n: Long)

  /** Rows: (file, w0, w1, w2, w3, key) with the word contributions
    * pre-OR'd per row upstream. Output per batch per touched file:
    * (file, b0, b1, b2, b3, min_key, max_key, n_rows).
    */
  def apply(
      spark: SparkSession,
      rows: Dataset[(String, Long, Long, Long, Long, Long)])
    : Dataset[(String, Long, Long, Long, Long, Long, Long, Long)] = {
    import spark.implicits._
    SeriesStatsProcessor.configure(spark)
    rows.groupByKey(_._1)
      .transformWithState(new BloomManifestProcessor,
        TimeMode.None(), OutputMode.Update())
  }
}
