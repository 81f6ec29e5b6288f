package graft.streaming

import org.apache.spark.sql.{Dataset, Encoders, SparkSession}
import org.apache.spark.sql.streaming.{OutputMode, StatefulProcessor, TTLConfig, TimeMode, TimerValues, ValueState}

/** Streaming twin of the batch `q_ab_welch`: the live experiment
  * monitor. Per metric key, six longs of state — (n, Σc, Σc²) per arm —
  * are everything the Welch statistic needs, and because they are pure
  * sums the running emission equals the batch query bit-for-bit at any
  * prefix (no ordering precondition at all — the one processor here
  * that is fully order-insensitive). Each micro-batch emits the
  * current (key, n_a, n_b, mu_a, mu_b, d, v_a, v_b, t2_e4,
  * significant): truncating means, centered-expansion variances, one
  * cross-multiplied rational — the identical integer formulas.
  *
  * This is what "peeking" at a live experiment should read: the
  * statistic is recomputed exactly per batch, so any sequential-
  * testing policy (fixed horizon, alpha spending) is applied on top
  * of exact numbers, not approximations.
  */
class WelchProcessor
    extends StatefulProcessor[String, (String, Long, Long), (String, Long, Long, Long, Long, Long, Long, Long, Option[Long], Option[Boolean])] {

  @transient private var st: ValueState[(Long, Long, Long, Long, Long, Long)] = _

  override def init(outputMode: OutputMode, timeMode: TimeMode): Unit =
    st = getHandle.getValueState[(Long, Long, Long, Long, Long, Long)](
      "welch", Encoders.product[(Long, Long, Long, Long, Long, Long)], TTLConfig.NONE)

  override def handleInputRows(
      key: String,
      rows: Iterator[(String, Long, Long)],
      timerValues: TimerValues): Iterator[(String, Long, Long, Long, Long, Long, Long, Long, Option[Long], Option[Boolean])] = {
    var (na, sa, ssa, nb, sb, ssb) =
      if (st.exists()) st.get() else (0L, 0L, 0L, 0L, 0L, 0L)
    rows.foreach { case (_, arm, c) =>
      if (arm == 0L) { na += 1; sa += c; ssa += c * c }
      else { nb += 1; sb += c; ssb += c * c }
    }
    st.update((na, sa, ssa, nb, sb, ssb))
    if (na == 0 || nb == 0) Iterator.empty
    else {
      val muA = sa / na
      val muB = sb / nb
      val vA = (ssa - 2 * muA * sa + na * muA * muA) / na
      val vB = (ssb - 2 * muB * sb + nb * muB * muB) / nb
      val d = muA - muB
      val den = vA * nb + vB * na
      val t2 = if (den == 0) None else Some(10000 * d * d * na * nb / den)
      Iterator((key, na, nb, muA, muB, d, vA, vB, t2, t2.map(_ > 38416L)))
    }
  }
}

object WelchProcessor {

  /** Rows: (metricKey, arm ∈ {0,1}, value) in ANY order → after each
    * batch one running Welch row per key, equal to the batch statistic
    * over the rows seen so far.
    */
  def apply(
      spark: SparkSession,
      rows: Dataset[(String, Long, Long)]): Dataset[(String, Long, Long, Long, Long, Long, Long, Long, Option[Long], Option[Boolean])] = {
    import spark.implicits._
    SeriesStatsProcessor.configure(spark)
    rows.groupByKey(_._1)
      .transformWithState(new WelchProcessor, TimeMode.None(), OutputMode.Update())
  }
}
