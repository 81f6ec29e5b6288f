package graft.streaming

import org.apache.spark.sql.{Dataset, Encoders, SparkSession}
import org.apache.spark.sql.streaming.{OutputMode, StatefulProcessor, TTLConfig, TimeMode, TimerValues, ValueState}

/** Streaming twin of the batch `sketch_kmv` distinct-count estimator:
  * per-key k-minimum-values state over a pre-hashed id stream. The state
  * is EXACTLY the sketch — a sorted vector of at most k distinct 56-bit
  * hashes — so memory per key is bounded by k forever, the property that
  * makes KMV the streaming distinct-count of choice (and why the twin
  * needs no watermark: the sketch never grows).
  *
  * Parity with the batch estimator is EXACT by construction: the k
  * smallest distinct hashes of a set don't depend on arrival order or
  * micro-batch boundaries, and the estimate is the same integer DIV
  * ((k−1)·2^56 / h_k) on the same h_k. Below k the sketch holds every
  * hash, so the estimate IS the distinct count. Emits one row per key
  * per micro-batch: (key, n_rows_seen, n_held, n_est) — n_rows_seen is
  * monotone, so the row with its maximum is the final answer.
  */
class KmvProcessor(k: Int)
    extends StatefulProcessor[String, (String, Long), (String, Long, Long, Long)] {

  require(k >= 2 && k <= 256, "k in [2,256]")

  @transient private var st: ValueState[KmvProcessor.S] = _

  override def init(outputMode: OutputMode, timeMode: TimeMode): Unit =
    st = getHandle.getValueState[KmvProcessor.S](
      "kmv", Encoders.product[KmvProcessor.S], TTLConfig.NONE)

  override def handleInputRows(
      key: String,
      rows: Iterator[(String, Long)],
      timerValues: TimerValues): Iterator[(String, Long, Long, Long)] = {
    val batch = rows.map(_._2).toArray
    val prev = if (st.exists()) st.get() else KmvProcessor.S(Seq.empty, 0L)
    val ks = (prev.ks.toArray ++ batch).distinct.sorted.take(k).toSeq
    val seen = prev.n + batch.length
    val est =
      if (ks.length < k) ks.length.toLong
      else ((k - 1).toLong * 72057594037927936L) / ks(k - 1) // 2^56
    st.update(KmvProcessor.S(ks, seen))
    Iterator.single((key, seen, ks.length.toLong, est))
  }
}

object KmvProcessor {
  /** Encoder-friendly state: the sorted ≤k-min distinct hashes plus a
    * monotone processed-row count (versions the emitted rows).
    */
  final case class S(ks: Seq[Long], n: Long)

  /** Rows: (key, h) where h is the 56-bit md5-derived hash the batch op
    * uses (`Sketch.h60('k', id) DIV 16`) → per key per micro-batch:
    * (key, n_rows_seen, n_held, n_est).
    */
  def apply(
      spark: SparkSession,
      rows: Dataset[(String, Long)],
      k: Int = 16): Dataset[(String, Long, Long, Long)] = {
    import spark.implicits._
    SeriesStatsProcessor.configure(spark)
    rows.groupByKey(_._1)
      .transformWithState(new KmvProcessor(k), TimeMode.None(), OutputMode.Append())
  }
}
