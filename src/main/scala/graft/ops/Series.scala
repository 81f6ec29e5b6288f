package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Per-series time-series primitives generic over any keyed, ordered
  * relation — the smoothing/robust-outlier layer a metrics pipeline runs
  * after ingest (the analytics the reference delegates to its TSDB:
  * catalyser/warp.go routes series points; smoothing/outliers are the
  * first queries run on them).
  *
  * Cross-engine determinism notes (the DuckDB-oracle rules this module
  * is built around):
  *  - EWMA is a SEQUENTIAL fold — order-dependent float arithmetic — so
  *    it is computed as a sorted fold (collect_list → array_sort →
  *    aggregate), which both Spark and DuckDB (`list(... ORDER BY)` →
  *    `list_reduce`) evaluate in the identical order: bit-exact.
  *  - robust stats use exact interpolated percentiles (`percentile` ≡
  *    `quantile_cont`), never approx sketches.
  */
object Series {

  /** Exponentially-weighted moving average of each key's value sequence,
    * one output row per key: s_1 = x_1, s_i = (1-α)·s_{i-1} + α·x_i,
    * returning s_n (the EWMA "level" at the series head).
    *
    * One shuffle (the groupBy); the fold is linear in the series length
    * and runs inside the aggregate — no window, no O(n²) prefix
    * recompute. Per-key history must fit in one aggregation buffer: at
    * 100 TB that means keying by a bounded-cardinality series id
    * (sensor, metric, user), optionally pre-bucketed by time range —
    * same contract as any collect_list-based sorted fold.
    *
    * `orderCol`/`tieCol` must form a unique total order within a key (ts
    * + event id); ties would make the sort — and thus the fold —
    * nondeterministic.
    */
  def ewmaLast(
      df: DataFrame,
      keyCol: String,
      orderCol: String,
      tieCol: String,
      valCol: String,
      alphas: Seq[Double]): DataFrame = {
    require(alphas.nonEmpty && alphas.forall(a => a > 0 && a <= 1))
    val sorted = array_sort(collect_list(struct(
      col(orderCol), col(tieCol), col(valCol).cast("double").as("_v"))))
    val base = df.groupBy(col(keyCol))
      .agg(count(lit(1)).as("n_points"), sorted.as("_a"))
      .withColumn("_vs", expr("transform(_a, x -> x._v)"))
    val withEwmas = alphas.foldLeft(base) { (acc, a) =>
      acc.withColumn(ewmaColName(a), expr(
        s"""aggregate(slice(_vs, 2, size(_vs) - 1), element_at(_vs, 1),
            (acc, x) -> acc * ${1.0 - a} + x * $a)"""))
    }
    withEwmas.drop("_a", "_vs")
  }

  /** Column name for an alpha: ewma_25 for α=0.25 (basis-point-free,
    * two-digit percent label). */
  def ewmaColName(alpha: Double): String =
    f"ewma_${math.round(alpha * 100)}%02d"

  /** DuckDB twin of one [[ewmaLast]] fold — same seed (first element),
    * same left fold, same constants. */
  def ewmaSql(valCol: String, orderBy: String, alpha: Double): String =
    s"""list_reduce(list($valCol::DOUBLE ORDER BY $orderBy),
        (acc, x) -> acc * ${1.0 - alpha} + x * $alpha)"""

  /** One Holt double-exponential-smoothing step over a PACKED integer
    * accumulator, emitted as SQL for either engine (`div` = `DIV` on
    * Spark, `//` on DuckDB — both truncate toward zero). The (level,
    * trend) pair is offset-packed into one bigint — enc = (l + 131072)
    * · 2²² + (b + 2²¹) — because a STRUCT accumulator is miscompiled by
    * DuckDB 1.0's list_reduce when the fold runs ≥ 3 elements (verified
    * minimal repro: field 2 sees a stale accumulator), while scalar
    * folds are proven bit-exact by the EWMA twin. A raw (un-packed)
    * first element seeds l=y₁, b=0 — raw values sit below 2²¹, packed
    * ones above 2.3·10¹¹, so the CASE discriminates exactly. Bounds:
    * |y| &lt; 2²¹ cents, l &gt; −131072 — far outside any 2-decimal
    * metric domain scaled to cents.
    */
  def holtStepSql(div: String, acc: String, x: String,
      alphaBp: Long = 3000L, betaBp: Long = 1000L): String = {
    val l0 = s"(CASE WHEN $acc < 2097152 THEN $acc ELSE ($acc $div 4194304) - 131072 END)"
    val b0 = s"(CASE WHEN $acc < 2097152 THEN 0 ELSE ($acc % 4194304) - 2097152 END)"
    val ln = s"(($alphaBp * $x + ${10000 - alphaBp} * ($l0 + $b0)) $div 10000)"
    val bn = s"(($betaBp * ($ln - $l0) + ${10000 - betaBp} * $b0) $div 10000)"
    s"(($ln + 131072) * 4194304 + $bn + 2097152)"
  }

  /** Decode [[holtStepSql]]'s packed accumulator: (level, trend). */
  def holtDecodeSql(div: String, acc: String): (String, String) = (
    s"(CASE WHEN $acc < 2097152 THEN $acc ELSE ($acc $div 4194304) - 131072 END)",
    s"(CASE WHEN $acc < 2097152 THEN 0 ELSE ($acc % 4194304) - 2097152 END)")

  /** Loud domain gate for a cents array about to enter a packed Holt
    * fold (ADVICE r3): the packing invariants need y₁ &lt; 2²¹ (raw-vs-
    * packed discriminator) and every level &gt; −131072 — silently
    * violated, they produce a wrong-but-plausible packed state. This
    * wraps the array so any element outside the CONSERVATIVE input box
    * (−2¹⁶, 2²⁰) — enough headroom that level/trend provably stay inside
    * their encodable ranges for α=0.3, β=0.1 — raises at runtime instead.
    * Spark-side only: the oracle runs on data that already passed this.
    */
  def holtGuardSql(arr: String): String =
    s"""transform($arr, y -> CASE WHEN y > -65536 AND y < 1048576 THEN y
        ELSE CAST(raise_error(concat('holt fold domain: cents must be in (-2^16, 2^20), got ',
          CAST(y AS STRING))) AS BIGINT) END)"""

  /** One 1-D random-walk Kalman-filter step over a PACKED integer
    * accumulator, emitted as SQL for either engine (`div` = `DIV` /
    * `//`; both truncate toward zero, so every floor-division below is
    * bit-identical cross-engine). State is (nis_alarms, level, variance)
    * offset-packed into one bigint — enc = a·2⁴³ + x·2²⁵ + p — for the
    * same reason as [[holtStepSql]]: DuckDB list_reduce miscompiles
    * STRUCT accumulators, scalar folds are proven exact. Fixed-point
    * gains: k₆ = p⁻·10⁶ ÷ (p⁻ + R) (ppm), level update x + k₆(z−x)÷10⁶,
    * variance (10⁶−k₆)p⁻ ÷ 10⁶ — every operand stays under 2⁶² (ANSI
    * overflow headroom audited in the scaladoc bounds).
    *
    * Constants: process variance Q = 250,000 c² (σ≈50.00), observation
    * variance R = 4,000,000 c² (σ≈200.00). The NIS alarm increments when
    * the squared innovation exceeds 9·(p⁻+R) — the 3σ normalized-
    * innovation gate every tracking stack uses — and SATURATES at 2¹⁹−1
    * so the packing can never overflow. A raw (un-packed) first element
    * seeds x=z₁, p=R, a=0; raw cents sit under 2²⁵ (enforced by
    * [[kalmanGuardSql]]: z ∈ [1, 131071]) while any packed state is
    * ≥ 2²⁵ because the level never falls below min(z) ≥ 1, so the CASE
    * discriminates exactly.
    *
    * Bounds: p⁻ ≤ R+Q &lt; 2²³; level stays inside [min z, max z] ⊂
    * [1, 2¹⁷) because the truncated correction never overshoots its
    * target; k₆·(z−x) ≤ 10⁶·2¹⁷ &lt; 2³⁷; (10⁶−k₆)·p⁻ &lt; 2⁴³;
    * enc ≤ (2¹⁹−1)·2⁴³ + 2¹⁸·2²⁵ + 2²⁵ &lt; 2⁶².
    */
  def kalmanStepSql(div: String, acc: String, z: String): String = {
    val Q = 250000L; val R = 4000000L
    val x0 = s"(CASE WHEN $acc < 33554432 THEN $acc ELSE ($acc $div 33554432) % 262144 END)"
    val p0 = s"(CASE WHEN $acc < 33554432 THEN $R ELSE $acc % 33554432 END)"
    val a0 = s"(CASE WHEN $acc < 33554432 THEN 0 ELSE $acc $div 8796093022208 END)"
    val pp = s"($p0 + $Q)"
    val k6 = s"(($pp * 1000000) $div ($pp + $R))"
    val xn = s"($x0 + ($k6 * ($z - $x0)) $div 1000000)"
    val pn = s"(((1000000 - $k6) * $pp) $div 1000000)"
    val an = s"(LEAST($a0 + (CASE WHEN ($z - $x0) * ($z - $x0) > 9 * ($pp + $R) THEN 1 ELSE 0 END), 524287))"
    s"($an * 8796093022208 + $xn * 33554432 + $pn)"
  }

  /** Decode [[kalmanStepSql]]'s packed accumulator:
    * (nis_alarms, level, variance). Single-sample series (the
    * accumulator is still the raw seed) decode to (0, z₁, R).
    */
  def kalmanDecodeSql(div: String, acc: String): (String, String, String) = (
    s"(CASE WHEN $acc < 33554432 THEN 0 ELSE $acc $div 8796093022208 END)",
    s"(CASE WHEN $acc < 33554432 THEN $acc ELSE ($acc $div 33554432) % 262144 END)",
    s"(CASE WHEN $acc < 33554432 THEN 4000000 ELSE $acc % 33554432 END)")

  /** Driver/executor-side Long mirror of ONE [[kalmanStepSql]] step —
    * Java `/` truncates toward zero exactly like Spark DIV and DuckDB
    * `//`, and every operand stays under 2⁶² (no silent wrap even
    * without ANSI), so a sequential fold of this function over the same
    * ordered cents reproduces the distributed fold bit-for-bit. Used by
    * the streaming [[graft.streaming.KalmanProcessor]] twin.
    */
  def kalmanStepLong(acc: Long, z: Long): Long = {
    val raw = acc < 33554432L
    val x0 = if (raw) acc else (acc / 33554432L) % 262144L
    val p0 = if (raw) 4000000L else acc % 33554432L
    val a0 = if (raw) 0L else acc / 8796093022208L
    val pp = p0 + 250000L
    val k6 = (pp * 1000000L) / (pp + 4000000L)
    val xn = x0 + (k6 * (z - x0)) / 1000000L
    val pn = ((1000000L - k6) * pp) / 1000000L
    val alarm = if ((z - x0) * (z - x0) > 9L * (pp + 4000000L)) 1L else 0L
    val an = math.min(a0 + alarm, 524287L)
    an * 8796093022208L + xn * 33554432L + pn
  }

  /** Decode a packed Kalman accumulator (Long mirror of
    * [[kalmanDecodeSql]]): (nis_alarms, level, variance). */
  def kalmanDecodeLong(acc: Long): (Long, Long, Long) =
    if (acc < 33554432L) (0L, acc, 4000000L)
    else (acc / 8796093022208L, (acc / 33554432L) % 262144L, acc % 33554432L)

  /** Loud domain gate for cents entering the packed Kalman fold: the
    * raw-vs-packed discriminator and the level-bounds proof need
    * z ∈ [1, 131071]. Spark-side only (the oracle folds data that
    * already passed this gate). Same contract as [[holtGuardSql]].
    */
  def kalmanGuardSql(arr: String): String =
    s"""transform($arr, y -> CASE WHEN y >= 1 AND y <= 131071 THEN y
        ELSE CAST(raise_error(concat('kalman fold domain: cents must be in [1, 131071], got ',
          CAST(y AS STRING))) AS BIGINT) END)"""

  /** Robust per-group outlier flagging by median absolute deviation:
    * score = |x - median| / (1.4826·MAD), keep rows with score > `k`.
    * The 1.4826 factor scales MAD to σ under normality — the standard
    * robust z-score. Degenerate groups (MAD = 0: over half the values
    * identical) produce no outliers rather than dividing by zero.
    *
    * Shape: two aggregations over the group key (median, then MAD) +
    * two broadcast-sized joins of per-group stats back onto the rows —
    * the scale-safe form of a robust detector (group stats are tiny;
    * the data is never windowed or collected).
    *
    * Score comparisons happen on round(score, 6) so an oracle engine
    * computing the identical expression can never flip a boundary row.
    */
  def madOutliers(
      df: DataFrame,
      keyCol: String,
      valCol: String,
      k: Double = 3.0): DataFrame = {
    val v = col(valCol).cast("double")
    val med = df.groupBy(col(keyCol))
      .agg(expr(s"percentile($valCol, 0.5)").as("med"))
    val dev = df.join(med, keyCol)
      .withColumn("dev", abs(v - col("med")))
    val mad = dev.groupBy(col(keyCol))
      .agg(expr("percentile(dev, 0.5)").as("mad"))
    dev.join(mad, keyCol)
      .filter(col("mad") > 0)
      .withColumn("mad_score", col("dev") / (col("mad") * 1.4826))
      .filter(round(col("mad_score"), 6) > k)
  }

  /** Two-pass EXACT per-group median over integer values — the
    * 100-TB-safe replacement for the one-rank-window-per-group form:
    * with a handful of group values (event types), a single
    * `row_number() OVER (PARTITION BY g ORDER BY v)` sorts each group's
    * ENTIRE data in one task. Here pass 1 is a map-side-combining
    * count per (group, value-bucket) — a relation bounded by the value
    * DOMAIN (range/width), not by the data — the cumulative scan and
    * target-rank location run on that bounded relation, and pass 2
    * ranks ONLY each group's median bucket (a ~1/#buckets slice of the
    * rows, partitioned by (group, bucket) so the exchange spreads
    * across the cluster).
    *
    * Result is IDENTICAL to the window form's value at rank
    * `(n + 1) DIV 2` under `(value, id)` ordering: truncating DIV
    * bucketing is monotone in the value (negatives included — both
    * trunc-toward-zero halves are monotone and meet at 0), so
    * bucket-prefix counts + in-bucket rank reproduce the global rank
    * exactly; ties on the value resolve by `idCol` inside one bucket,
    * never across buckets. Returns one row per group: (groupCol, m).
    */
  def bucketedMedian(
      df: DataFrame,
      groupCol: String,
      valCol: String,
      idCol: String,
      bucketWidth: Long = 1024L): DataFrame = {
    require(bucketWidth >= 1L)
    import org.apache.spark.sql.expressions.Window
    val b = df.select(col(groupCol).as("_g"), col(valCol).as("_v"), col(idCol).as("_id"))
      .withColumn("_b", expr(s"_v DIV $bucketWidth"))
    val bc = b.groupBy("_g", "_b").agg(count(lit(1)).as("_c"))
    // both windows run over the BOUNDED bucket-count relation (child is
    // the Aggregate above — domain-sized, never data-sized)
    val wc = Window.partitionBy("_g").orderBy("_b")
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val wn = Window.partitionBy("_g")
    val medBucket = bc.withColumn("_cum", sum("_c").over(wc))
      .withColumn("_n", sum("_c").over(wn))
      .withColumn("_tgt", expr("(_n + 1) DIV 2"))
      .filter(expr("_cum >= _tgt AND _cum - _c < _tgt"))
      .select(col("_g"), col("_b"), expr("_tgt - (_cum - _c)").as("_off"))
    val wr = Window.partitionBy("_g", "_b").orderBy(col("_v"), col("_id"))
    b.join(medBucket, Seq("_g", "_b"))
      .withColumn("_rv", row_number().over(wr).cast("bigint"))
      .filter(col("_rv") === col("_off"))
      .select(col("_g").as(groupCol), col("_v").as("m"))
  }
}
