package graft.ops

/** Closed-form linear-model fitting from one-pass distributed
  * sufficient statistics — the scalable way to fit a linear probe /
  * quality regressor over 100 TB: ONE scan aggregates nine exact
  * BIGINT moments per group (n, Σx1, Σx2, Σy, Σx1², Σx1x2, Σx2²,
  * Σx1y, Σx2y — associative, map-side combined, streamable), then the
  * 2-feature ridge normal equations solve on that metadata-sized state
  * in pure integer arithmetic both engines evaluate identically.
  *
  * The quantized econometrics dialect (the ts_adf_lite discipline):
  *  - centered moments via the exact algebraic identity about the
  *    TRUNCATING means a = S DIV n:  Σ(x−a)(y−b) = Sxy − a·Sy − b·Sx
  *    + n·a·b — exact for any integer constants, so no float mean ever
  *    enters;
  *  - per-row quantization v = C DIV n BEFORE any moment product
  *    (overflow headroom to ~×10⁵ the sf0.1 row count: every product
  *    below is ≤ ~1e18 at n = 2e11 — see the term-by-term audit in the
  *    round-9 session notes);
  *  - truncation toward zero (Spark DIV ≡ DuckDB // ≡ Java /) is
  *    cross-engine exact on negatives, so the signed covariances are
  *    safe;
  *  - ridge λ on the quantized diagonal keeps det > 0 (Cauchy–Schwarz
  *    plus the λ·(v11+v22)+λ² slack dominates the ±(v11+v22)
  *    truncation error); the CASE guard is belt-and-braces.
  *
  * Estimator contract: deterministic "ridge-lite" within quantization
  * error of true OLS (slopes about truncated means differ from
  * true-mean slopes by n·δ₁·δ₂ with |δ| < 1 — relative ~n/C ≈ 1/var,
  * negligible and DETERMINISTIC). Accuracy vs double OLS is pinned in
  * RidgeSpec; the oracle pins bit-exactness.
  */
object Fit {

  /** Ridge diagonal in quantized (per-row variance) units. The v's are
    * per-row second moments (hundreds to hundreds of thousands on the
    * certified tables), so λ = 1 shrinks slopes by well under 1% while
    * still covering the ±(v11+v22) truncation slack in det > 0 for
    * non-degenerate designs (the CASE guard handles the rest).
    */
  val Lambda = 1L

  /** The post-aggregation solve as projection stages over the nine
    * moment columns `n, s1, s2, sy, s11, s12, s22, s1y, s2y`. Each
    * inner Seq is one projection (later stages read earlier names);
    * Spark folds them as `select *, e AS name`, DuckDB as chained
    * CTEs. `div` is `DIV` (Spark) or `//` (DuckDB).
    */
  def ridgeStages(div: String): Seq[Seq[(String, String)]] = Seq(
    Seq(
      "a1" -> s"s1 $div n",
      "a2" -> s"s2 $div n",
      "ay" -> s"sy $div n"),
    Seq(
      "c11" -> "s11 - 2 * a1 * s1 + n * a1 * a1",
      "c22" -> "s22 - 2 * a2 * s2 + n * a2 * a2",
      "c12" -> "s12 - a1 * s2 - a2 * s1 + n * a1 * a2",
      "c1y" -> "s1y - a1 * sy - ay * s1 + n * a1 * ay",
      "c2y" -> "s2y - a2 * sy - ay * s2 + n * a2 * ay"),
    Seq(
      "v11" -> s"c11 $div n",
      "v22" -> s"c22 $div n",
      "v12" -> s"c12 $div n",
      "v1y" -> s"c1y $div n",
      "v2y" -> s"c2y $div n"),
    Seq(
      "det_q" -> s"(v11 + $Lambda) * (v22 + $Lambda) - v12 * v12",
      "num1" -> s"(v22 + $Lambda) * v1y - v12 * v2y",
      "num2" -> s"(v11 + $Lambda) * v2y - v12 * v1y"),
    Seq(
      "b1_milli" -> s"CASE WHEN det_q > 0 THEN (num1 * 1000) $div det_q ELSE 0 END",
      "b2_milli" -> s"CASE WHEN det_q > 0 THEN (num2 * 1000) $div det_q ELSE 0 END"),
    Seq(
      "b0_milli" -> s"(sy * 1000) $div n - b1_milli * a1 - b2_milli * a2"))

  /** Fold the stages onto a Spark DataFrame holding the moment cols. */
  def ridgeSolve(df: org.apache.spark.sql.DataFrame): org.apache.spark.sql.DataFrame =
    ridgeStages("DIV").foldLeft(df) { (d, st) =>
      d.selectExpr("*" +: st.map { case (nm, e) => s"($e) AS $nm" }: _*)
    }

  /** DuckDB CTE chain mirroring [[ridgeSolve]]: `WITH <momentsCte>,
    * f0 AS (...), ... SELECT ... FROM fK`. Caller supplies the moments
    * CTE named `m`.
    */
  def ridgeSolveSqlFrom(momentsRef: String): String = {
    val stages = ridgeStages("//")
    val ctes = stages.zipWithIndex.map { case (st, i) =>
      val from = if (i == 0) momentsRef else s"f${i - 1}"
      val cols = st.map { case (nm, e) => s"($e) AS $nm" }.mkString(", ")
      s"f$i AS (SELECT *, $cols FROM $from)"
    }
    ctes.mkString(",\n    ")
  }

  /** Last stage name for the DuckDB chain built by [[ridgeSolveSqlFrom]]. */
  def ridgeFinalRef: String = s"f${ridgeStages("//").size - 1}"

  /** Fisher LDA from per-class one-pass moments — same machinery as
    * [[ridgeStages]] but the scatter is the POOLED within-class one and
    * the right-hand side is the class-mean difference: w ∝ S_w⁻¹(μ₁−μ₀).
    * Inputs: per-class moment columns `n0, s1_0, s2_0, s11_0, s12_0,
    * s22_0` and the `_1` set (from ONE conditional aggregate). Outputs:
    * `w1_milli, w2_milli` (the discriminant direction), `thr` (integer
    * threshold at the midpoint of the projected class means, in
    * score units = milli·feature), `flip` (true when class 1 projects
    * BELOW class 0 — the prediction comparison direction), `det_q`.
    * All magnitudes stage-quantized: projected means go through
    * milli-means (≤ 10³·max-feature) before meeting the weights, so
    * nothing grows with n.
    */
  def ldaStages(div: String): Seq[Seq[(String, String)]] = Seq(
    Seq(
      "a1_0" -> s"s1_0 $div n0", "a2_0" -> s"s2_0 $div n0",
      "a1_1" -> s"s1_1 $div n1", "a2_1" -> s"s2_1 $div n1"),
    Seq(
      "c11p" -> ("(s11_0 - 2 * a1_0 * s1_0 + n0 * a1_0 * a1_0)" +
        " + (s11_1 - 2 * a1_1 * s1_1 + n1 * a1_1 * a1_1)"),
      "c22p" -> ("(s22_0 - 2 * a2_0 * s2_0 + n0 * a2_0 * a2_0)" +
        " + (s22_1 - 2 * a2_1 * s2_1 + n1 * a2_1 * a2_1)"),
      "c12p" -> ("(s12_0 - a1_0 * s2_0 - a2_0 * s1_0 + n0 * a1_0 * a2_0)" +
        " + (s12_1 - a1_1 * s2_1 - a2_1 * s1_1 + n1 * a1_1 * a2_1)")),
    Seq(
      "v11" -> s"c11p $div (n0 + n1)",
      "v22" -> s"c22p $div (n0 + n1)",
      "v12" -> s"c12p $div (n0 + n1)",
      "m1_0" -> s"(s1_0 * 1000) $div n0", "m2_0" -> s"(s2_0 * 1000) $div n0",
      "m1_1" -> s"(s1_1 * 1000) $div n1", "m2_1" -> s"(s2_1 * 1000) $div n1"),
    Seq(
      "det_q" -> s"(v11 + $Lambda) * (v22 + $Lambda) - v12 * v12",
      "d1" -> "m1_1 - m1_0",
      "d2" -> "m2_1 - m2_0"),
    Seq(
      "w1_milli" -> (s"CASE WHEN det_q > 0 THEN " +
        s"(((v22 + $Lambda) * d1 - v12 * d2) * 1000) $div det_q ELSE 0 END"),
      "w2_milli" -> (s"CASE WHEN det_q > 0 THEN " +
        s"(((v11 + $Lambda) * d2 - v12 * d1) * 1000) $div det_q ELSE 0 END")),
    Seq(
      "p0" -> s"(w1_milli * m1_0) $div 1000 + (w2_milli * m2_0) $div 1000",
      "p1" -> s"(w1_milli * m1_1) $div 1000 + (w2_milli * m2_1) $div 1000"),
    Seq(
      "thr" -> s"(p0 + p1) $div 2",
      "flip" -> "p1 < p0"))

  def ldaSolve(df: org.apache.spark.sql.DataFrame): org.apache.spark.sql.DataFrame =
    ldaStages("DIV").foldLeft(df) { (d, st) =>
      d.selectExpr("*" +: st.map { case (nm, e) => s"($e) AS $nm" }: _*)
    }

  /** DuckDB CTE chain mirroring [[ldaSolve]] (prefix `g`). */
  def ldaSolveSqlFrom(momentsRef: String): String = {
    val stages = ldaStages("//")
    stages.zipWithIndex.map { case (st, i) =>
      val from = if (i == 0) momentsRef else s"g${i - 1}"
      val cols = st.map { case (nm, e) => s"($e) AS $nm" }.mkString(", ")
      s"g$i AS (SELECT *, $cols FROM $from)"
    }.mkString(",\n    ")
  }

  def ldaFinalRef: String = s"g${ldaStages("//").size - 1}"

  /** Long mirror of [[ldaStages]] — (w1_milli, w2_milli, thr, flip, det_q). */
  def ldaSolveLong(n0: Long, s10: Long, s20: Long, s110: Long, s120: Long,
      s220: Long, n1: Long, s11: Long, s21: Long, s111: Long, s121: Long,
      s221: Long): (Long, Long, Long, Boolean, Long) = {
    require(n0 > 0 && n1 > 0, "ldaSolveLong needs both classes non-empty")
    val a10 = s10 / n0; val a20 = s20 / n0; val a11 = s11 / n1; val a21 = s21 / n1
    val c11p = (s110 - 2 * a10 * s10 + n0 * a10 * a10) +
      (s111 - 2 * a11 * s11 + n1 * a11 * a11)
    val c22p = (s220 - 2 * a20 * s20 + n0 * a20 * a20) +
      (s221 - 2 * a21 * s21 + n1 * a21 * a21)
    val c12p = (s120 - a10 * s20 - a20 * s10 + n0 * a10 * a20) +
      (s121 - a11 * s21 - a21 * s11 + n1 * a11 * a21)
    val v11 = c11p / (n0 + n1); val v22 = c22p / (n0 + n1); val v12 = c12p / (n0 + n1)
    val m10 = (s10 * 1000) / n0; val m20 = (s20 * 1000) / n0
    val m11 = (s11 * 1000) / n1; val m21 = (s21 * 1000) / n1
    val det = (v11 + Lambda) * (v22 + Lambda) - v12 * v12
    val d1 = m11 - m10; val d2 = m21 - m20
    val w1 = if (det > 0) (((v22 + Lambda) * d1 - v12 * d2) * 1000) / det else 0L
    val w2 = if (det > 0) (((v11 + Lambda) * d2 - v12 * d1) * 1000) / det else 0L
    val p0 = (w1 * m10) / 1000 + (w2 * m20) / 1000
    val p1 = (w1 * m11) / 1000 + (w2 * m21) / 1000
    ((w1, w2, (p0 + p1) / 2, p1 < p0, det))
  }

  /** Driver/processor Long mirror of the identical arithmetic (Java /
    * and % truncate toward zero exactly like DIV — pinned in OpsSpec
    * precedents). Input: the nine exact sums; output
    * (b1_milli, b2_milli, b0_milli, det_q).
    */
  def ridgeSolveLong(n: Long, s1: Long, s2: Long, sy: Long, s11: Long,
      s12: Long, s22: Long, s1y: Long, s2y: Long): (Long, Long, Long, Long) = {
    require(n > 0, "ridgeSolveLong needs n > 0")
    val a1 = s1 / n; val a2 = s2 / n; val ay = sy / n
    val c11 = s11 - 2 * a1 * s1 + n * a1 * a1
    val c22 = s22 - 2 * a2 * s2 + n * a2 * a2
    val c12 = s12 - a1 * s2 - a2 * s1 + n * a1 * a2
    val c1y = s1y - a1 * sy - ay * s1 + n * a1 * ay
    val c2y = s2y - a2 * sy - ay * s2 + n * a2 * ay
    val v11 = c11 / n; val v22 = c22 / n; val v12 = c12 / n
    val v1y = c1y / n; val v2y = c2y / n
    val det = (v11 + Lambda) * (v22 + Lambda) - v12 * v12
    val num1 = (v22 + Lambda) * v1y - v12 * v2y
    val num2 = (v11 + Lambda) * v2y - v12 * v1y
    val b1 = if (det > 0) (num1 * 1000) / det else 0L
    val b2 = if (det > 0) (num2 * 1000) / det else 0L
    val b0 = (sy * 1000) / n - b1 * a1 - b2 * a2
    (b1, b2, b0, det)
  }
}
