package graft.streaming

import org.apache.spark.sql.{Dataset, Encoders, SparkSession}
import org.apache.spark.sql.streaming.{OutputMode, StatefulProcessor, TTLConfig, TimeMode, TimerValues, ValueState}

/** Streaming twin of the b-bit minwise-hashing calibration
  * (`dedup_minhash_bbit` / Li &amp; König, WWW 2010): per stream key,
  * the four per-b error censuses (n_pairs, Σ|Ĵ−J|, ΣĴ, ΣJ) ride in a
  * 16-long ValueState. Every per-pair quantity — the b-bit agreement
  * count over the 16 signature slots, the bias-corrected estimate
  * Ĵ_bp = max(0, (agree·2ᵇ − 16)·10⁴ ⁄ (16·(2ᵇ−1))), the absolute
  * error against the exact-Jaccard jbp the pair carries — is a pure
  * function of the arriving row, and the census is associative sums of
  * those, so the running table equals the batch aggregation over any
  * stream prefix under ANY micro-batch split (the CountMin/GapStats
  * linearity argument; no frozen reference needed). The division
  * discipline is the batch query's exactly: truncating Long division ≡
  * Spark DIV ≡ DuckDB // on the non-negative operands here, and the
  * max(0, ·) clamp sits AFTER the truncation on both sides (toward-zero
  * truncation keeps the negative branch identical too).
  *
  * Rows arrive as (key, jbp, x[16], y[16]) — the SHARED
  * [[graft.queries.Dedup.bbitPairSignatures]] relation, so stream and
  * batch see structurally identical inputs. Emits per touched key per
  * batch, one row per b ∈ {1, 2, 4, 8}: (key, b, n_pairs, mae_bp,
  * mean_est_bp, mean_exact_bp) — the final emission IS the batch
  * calibration table of the full stream.
  */
class BbitProcessor
    extends StatefulProcessor[String, (String, Long, Seq[Long], Seq[Long]), (String, Long, Long, Long, Long, Long)] {

  @transient private var st: ValueState[BbitProcessor.S] = _

  override def init(outputMode: OutputMode, timeMode: TimeMode): Unit =
    st = getHandle.getValueState[BbitProcessor.S](
      "bbitCensus", Encoders.product[BbitProcessor.S], TTLConfig.NONE)

  override def handleInputRows(
      key: String,
      rows: Iterator[(String, Long, Seq[Long], Seq[Long])],
      timerValues: TimerValues): Iterator[(String, Long, Long, Long, Long, Long)] = {
    val acc: Array[Long] =
      if (st.exists()) st.get().sums.toArray
      else Array.fill(4 * BbitProcessor.Bs.length)(0L)
    var touched = false
    rows.foreach { case (_, jbp, x, y) =>
      require(x.length == 16 && y.length == 16,
        s"bbit: expected 16-slot signatures, got ${x.length}/${y.length}")
      touched = true
      var bi = 0
      while (bi < BbitProcessor.Bs.length) {
        val bb = BbitProcessor.Bs(bi)
        val mask = (1L << bb) - 1
        var agree = 0L
        var i = 0
        while (i < 16) {
          if ((x(i) & mask) == (y(i) & mask)) agree += 1
          i += 1
        }
        val est = math.max(0L, ((agree * (1L << bb) - 16L) * 10000L) / (16L * mask))
        acc(4 * bi) += 1L
        acc(4 * bi + 1) += math.abs(est - jbp)
        acc(4 * bi + 2) += est
        acc(4 * bi + 3) += jbp
        bi += 1
      }
    }
    if (!touched) Iterator.empty
    else {
      st.update(BbitProcessor.S(acc.toSeq))
      BbitProcessor.Bs.indices.iterator.map { bi =>
        val n = acc(4 * bi)
        (key, BbitProcessor.Bs(bi).toLong, n,
          acc(4 * bi + 1) / n, acc(4 * bi + 2) / n, acc(4 * bi + 3) / n)
      }
    }
  }
}

object BbitProcessor {

  /** The b values the batch calibration sweeps. */
  val Bs: Array[Int] = Array(1, 2, 4, 8)

  /** Flattened per-b census: [n, Σ|err|, Σest, Σexact] × |Bs|. */
  final case class S(sums: Seq[Long])

  /** Rows: (key, jbp, x-signature[16], y-signature[16]) → per batch one
    * running (key, b, n_pairs, mae_bp, mean_est_bp, mean_exact_bp) row
    * per b for each touched key; the final rows equal the batch
    * `dedup_minhash_bbit` aggregation over the full stream.
    */
  def apply(
      spark: SparkSession,
      rows: Dataset[(String, Long, Seq[Long], Seq[Long])]): Dataset[(String, Long, Long, Long, Long, Long)] = {
    import spark.implicits._
    SeriesStatsProcessor.configure(spark)
    rows.groupByKey(_._1)
      .transformWithState(new BbitProcessor, TimeMode.None(), OutputMode.Update())
  }
}
