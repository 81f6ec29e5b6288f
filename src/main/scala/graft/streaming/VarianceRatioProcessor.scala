package graft.streaming

import org.apache.spark.sql.{Dataset, Encoders, SparkSession}
import org.apache.spark.sql.streaming.{OutputMode, StatefulProcessor, TTLConfig, TimeMode, TimerValues, ValueState}

/** Streaming twin of the batch `ts_variance_ratio` (Lo–MacKinlay VR(q)
  * for q ∈ {2, 4, 8}): per-key single-pass moment state over the
  * in-order hourly series. The q-period difference is the current
  * value minus the value q steps back, so a ring of the last 8 values
  * plus per-q (m, Σd, Σd²) — 21 longs, never data-sized — carries
  * everything; the centered variance is then the SAME integer
  * expansion the batch uses, v_q = (Σd² − 2·qμ·Σd + m·(qμ)²) DIV m
  * around the truncating 1-diff mean μ, which is exact for any
  * constant center. Because both sides sum the identical diffs in
  * bigints, the running emission after the last batch equals the
  * batch query bit-for-bit (the GapStatsProcessor argument, applied
  * per lag).
  *
  * Emits one row per (key, q≠1) per micro-batch: (key, q, m, mu, v1,
  * vq, vr_e4) with vr_e4 = v_q·10⁴ DIV (q·v₁), None when q·v₁ = 0 —
  * the batch nullif. Ordering precondition as everywhere: per-key rows
  * arrive in bucket order across batches; intra-batch rows are sorted
  * here.
  */
class VarianceRatioProcessor
    extends StatefulProcessor[String, (String, Long, Long), (String, Long, Long, Long, Long, Long, Option[Long])] {

  import VarianceRatioProcessor.Qs

  @transient private var st: ValueState[VarianceRatioProcessor.S] = _

  override def init(outputMode: OutputMode, timeMode: TimeMode): Unit =
    st = getHandle.getValueState[VarianceRatioProcessor.S](
      "vr", Encoders.product[VarianceRatioProcessor.S], TTLConfig.NONE)

  override def handleInputRows(
      key: String,
      rows: Iterator[(String, Long, Long)],
      timerValues: TimerValues): Iterator[(String, Long, Long, Long, Long, Long, Option[Long])] = {
    val prev = if (st.exists()) st.get()
      else VarianceRatioProcessor.S(0L, Seq.empty,
        Seq.fill(Qs.length)(0L), Seq.fill(Qs.length)(0L), Seq.fill(Qs.length)(0L))
    var n = prev.n
    val ring = scala.collection.mutable.ArrayBuffer.from(prev.ring)
    val m = prev.m.toArray
    val sd = prev.sd.toArray
    val sdd = prev.sdd.toArray
    rows.toArray.sortBy(_._2).foreach { case (_, _, c) =>
      var qi = 0
      while (qi < Qs.length) {
        val q = Qs(qi)
        if (n >= q) {
          val d = c - ring((ring.length - q).toInt)
          m(qi) += 1; sd(qi) += d; sdd(qi) += d * d
        }
        qi += 1
      }
      ring += c
      if (ring.length > Qs.last) ring.remove(0, ring.length - Qs.last.toInt)
      n += 1
    }
    st.update(VarianceRatioProcessor.S(n, ring.toSeq, m.toSeq, sd.toSeq, sdd.toSeq))
    if (m(0) == 0) Iterator.empty
    else {
      val n1 = m(0)
      val mu = sd(0) / n1
      val v1 = (sdd(0) - 2 * mu * sd(0) + n1 * mu * mu) / n1
      (1 until Qs.length).iterator.filter(qi => m(qi) > 0).map { qi =>
        val q = Qs(qi)
        val vq = (sdd(qi) - 2 * q * mu * sd(qi) + m(qi) * q * mu * q * mu) / m(qi)
        val vr = if (q * v1 == 0) None else Some(vq * 10000 / (q * v1))
        (key, q, m(qi), mu, v1, vq, vr)
      }
    }
  }
}

object VarianceRatioProcessor {
  /** Lags: index 0 is the base 1-diff, the rest are the reported VRs. */
  val Qs: Seq[Long] = Seq(1L, 2L, 4L, 8L)

  /** Ring of the last ≤ 8 values plus per-q moment sums (parallel
    * vectors for the product encoder).
    */
  final case class S(n: Long, ring: Seq[Long],
      m: Seq[Long], sd: Seq[Long], sdd: Seq[Long])

  /** Rows: (seriesKey, bucket, value) with per-key bucket ascending
    * across batches → after each batch the running
    * (key, q, m, mu, v1, vq, vr_e4) per q ∈ {2, 4, 8}.
    */
  def apply(
      spark: SparkSession,
      rows: Dataset[(String, Long, Long)]): Dataset[(String, Long, Long, Long, Long, Long, Option[Long])] = {
    import spark.implicits._
    SeriesStatsProcessor.configure(spark)
    rows.groupByKey(_._1)
      .transformWithState(new VarianceRatioProcessor, TimeMode.None(), OutputMode.Update())
  }
}
