package graft.ops

/** Geospatial encoding primitives in the shared Spark/DuckDB integer
  * dialect (like [[Layout]]): canonical GEOHASH encoding per the public
  * spec (Niemeyer 2008; the Wikipedia reference algorithm) — MSB-first
  * bit interleave starting with LONGITUDE, base-32 alphabet without
  * a/i/l/o. Coordinates are e6-scaled micro-degree BIGINTs; 6
  * characters = 30 bits = 15 bits per axis, all products stay far
  * inside BIGINT. At 100 TB the geohash string is the standard
  * partition/bucket key for spatial data: prefix-truncation gives the
  * cell pyramid (4-char ≈ 39 km × 19.5 km cells) that the
  * `geo_knn_cells` grid join and any spatial rollup key on.
  */
object Geo {

  val Alphabet = "0123456789bcdefghjkmnpqrstuvwxyz"

  /** 15-bit axis quantizers: q = (coord + offset)·2^15 DIV span. The
    * multiplier is an explicit BIGINT so literal (INT-typed) coordinate
    * arguments cannot overflow under ANSI.
    */
  def qlonSql(div: String, lonE6: String): String =
    s"((($lonE6) + 180000000) * CAST(32768 AS BIGINT) $div 360000000)"
  def qlatSql(div: String, latE6: String): String =
    s"((($latE6) + 90000000) * CAST(32768 AS BIGINT) $div 180000000)"

  /** The 30-bit geohash integer: lon bit (14−i) at position 29−2i, lat
    * bit (14−i) at 28−2i (even bit-positions from the MSB are
    * longitude — the spec's defining property). Literal power-of-two
    * multipliers, no shift-by-expression (the [[Layout.zorderSql]]
    * technique).
    */
  def geohashBitsSql(div: String, latE6: String, lonE6: String): String = {
    val qlon = qlonSql(div, lonE6)
    val qlat = qlatSql(div, latE6)
    val terms =
      (0 to 14).flatMap { i =>
        Seq(
          s"(($qlon >> ${14 - i}) & 1) * CAST(${1L << (29 - 2 * i)} AS BIGINT)",
          s"(($qlat >> ${14 - i}) & 1) * CAST(${1L << (28 - 2 * i)} AS BIGINT)")
      }
    terms.mkString("(", " + ", ")")
  }

  /** The 6-character geohash string from a 30-bit expression `bits`
    * (5 bits per char, MSB-first). `substr` is 1-based in both engines.
    */
  def geohash6FromBitsSql(bits: String): String =
    (0 to 5).map { j =>
      s"substr('$Alphabet', CAST((($bits) >> ${25 - 5 * j}) & 31 AS INT) + 1, 1)"
    }.mkString(" || ")

  /** Ray-casting crossing indicator (pnpoly, Franklin's public
    * algorithm) in the shared integer dialect: 1 when the horizontal
    * +x ray from (px, py) crosses the edge (x1,y1)→(x2,y2), else 0.
    * The division is cleared by cross-multiplication with the sign
    * split on the edge direction, so the test is exact BIGINT
    * arithmetic — both engines agree on every boundary. Sum over a
    * ring's edges and take parity for containment. Shared by
    * `geo_polygon_tag` and GeoSpec's hand-laid ground-truth shapes.
    */
  def rayCrossSql(px: String, py: String,
      x1: String, y1: String, x2: String, y2: String): String =
    s"""CASE WHEN ($y1 > $py) != ($y2 > $py)
          AND (($y2 > $y1 AND ($x2 - $x1) * ($py - $y1) - ($px - $x1) * ($y2 - $y1) > 0)
            OR ($y2 < $y1 AND ($x2 - $x1) * ($py - $y1) - ($px - $x1) * ($y2 - $y1) < 0))
        THEN 1 ELSE 0 END"""

  // --- Fixed-point CORDIC trigonometry (great-circle support) ---------
  //
  // The public CORDIC rotation-mode algorithm (Volder 1959) unrolled in
  // pure BIGINT arithmetic shared by both engines: conditional
  // add/subtract with arithmetic right-shifts (cross-engine identical —
  // both Spark and DuckDB shift arithmetically) and an arctan literal
  // table in NANO-degrees. No libm call ever runs inside a query, so
  // Spark and the DuckDB oracle produce bit-identical sin/cos — float
  // trig could never promise that. Scale 2^29 keeps the 3-term chord²
  // sum at ≤ 3·(2·2^29)² ≈ 3.5e18, inside ANSI BIGINT.

  /** Fixed-point scale exponent for CORDIC outputs (values in
    * [-2^29, 2^29] represent [-1.0, 1.0]).
    */
  val CordicScaleBits = 29
  val CordicIters = 30

  /** atan(2^-i) in nano-degrees, the per-iteration rotation angles.
    * Computed once with StrictMath (platform-pinned) and interpolated
    * as LITERALS into both dialects — the engines never run atan.
    */
  val AtanNano: IndexedSeq[Long] = (0 until CordicIters).map { i =>
    Math.round(StrictMath.atan(StrictMath.pow(2.0, -i)) * 180.0 / StrictMath.PI * 1e9)
  }.toIndexedSeq

  /** x0 = K·2^29 where K = Π 1/sqrt(1+2^-2i) is the CORDIC gain — the
    * pre-scaled start vector so the rotated result lands at scale 2^29.
    */
  val CordicX0: Long = {
    val k = (0 until CordicIters)
      .map(i => 1.0 / StrictMath.sqrt(1.0 + StrictMath.pow(2.0, -2 * i))).product
    Math.round(k * (1L << CordicScaleBits))
  }

  /** Staged (colName → common-dialect SQL) steps computing cos/sin of
    * the MICRO-degree BIGINT angle column `aCol` into `<px>c` / `<px>s`
    * at scale 2^29. Stage boundaries are reference boundaries: each
    * stage's expressions only read columns from earlier stages, so the
    * stages map 1:1 onto Spark `withColumn` order and DuckDB CTE links.
    * Quadrant pre-reduction folds |a| > 90° into the CORDIC convergence
    * range (Σ atan ≈ 99.88°): cos(a) = -cos(180°−|a|)·sign-split,
    * sin unchanged — exact for the full ±180° input range.
    *
    * `aCol` must be a NON-FOLDABLE column (a scan/range attribute). A
    * literal input makes every stage expression foldable, which
    * CollapseProject counts as "cheap" and inlines through all ~36
    * stages — the substituted tree is exponential and the optimizer
    * spins for minutes (measured in GeoSpec). Wrap constants in a
    * one-row LocalRelation (`Seq(x).toDF`) instead.
    */
  def cordicStages(px: String, aCol: String): Seq[Seq[(String, String)]] = {
    val pre = Seq(
      Seq(s"${px}an" -> s"($aCol) * 1000"),
      Seq(
        s"${px}r" -> (s"CASE WHEN ${px}an > 90000000000 THEN 180000000000 - ${px}an " +
          s"WHEN ${px}an < -90000000000 THEN -180000000000 - ${px}an ELSE ${px}an END"),
        s"${px}g" -> (s"CASE WHEN ${px}an > 90000000000 OR ${px}an < -90000000000 " +
          "THEN -1 ELSE 1 END")),
      Seq(
        s"${px}x0" -> s"CAST($CordicX0 AS BIGINT)",
        s"${px}y0" -> s"CAST(0 AS BIGINT)",
        s"${px}z0" -> s"${px}r"))
    val iters = (0 until CordicIters).map { i =>
      Seq(
        s"${px}x${i + 1}" -> (s"CASE WHEN ${px}z$i >= 0 THEN ${px}x$i - (${px}y$i >> $i) " +
          s"ELSE ${px}x$i + (${px}y$i >> $i) END"),
        s"${px}y${i + 1}" -> (s"CASE WHEN ${px}z$i >= 0 THEN ${px}y$i + (${px}x$i >> $i) " +
          s"ELSE ${px}y$i - (${px}x$i >> $i) END"),
        s"${px}z${i + 1}" -> (s"CASE WHEN ${px}z$i >= 0 THEN ${px}z$i - ${AtanNano(i)} " +
          s"ELSE ${px}z$i + ${AtanNano(i)} END"))
    }
    val fin = Seq(Seq(
      s"${px}c" -> s"${px}g * ${px}x$CordicIters",
      s"${px}s" -> s"${px}y$CordicIters"))
    pre ++ iters ++ fin
  }

  /** Exact integer sqrt in the shared dialect (the
    * [[Sample.temperatureAlloc]] move): floor(sqrt(double)) then ±1
    * correction by SQUARING — never trust the float at perfect-square
    * boundaries. `x` must be a non-negative BIGINT expression.
    */
  def isqrtSql(x: String): String =
    s"""(CASE
      WHEN (CAST(floor(sqrt(CAST(($x) AS DOUBLE))) AS BIGINT) + 1)
        * (CAST(floor(sqrt(CAST(($x) AS DOUBLE))) AS BIGINT) + 1) <= ($x)
        THEN CAST(floor(sqrt(CAST(($x) AS DOUBLE))) AS BIGINT) + 1
      WHEN CAST(floor(sqrt(CAST(($x) AS DOUBLE))) AS BIGINT)
        * CAST(floor(sqrt(CAST(($x) AS DOUBLE))) AS BIGINT) > ($x)
        THEN CAST(floor(sqrt(CAST(($x) AS DOUBLE))) AS BIGINT) - 1
      ELSE CAST(floor(sqrt(CAST(($x) AS DOUBLE))) AS BIGINT) END)"""

  /** Staged steps for CORDIC VECTORING mode — fixed-point atan2: the
    * angle of (`yCol`, `xCol`) lands in `<px>az` in NANO-degrees,
    * (-180e9, 180e9]. The core walk drives |y| to zero over the
    * positive quadrant (convergence needs x ≥ 0, and Σ atan ≈ 99.88°
    * covers the 0–90° range), accumulating the rotation in z; the
    * full-circle answer comes from the classic quadrant fold. The
    * vectoring gain multiplies only the magnitude, never the angle, so
    * no K compensation is needed. Inputs at any integer scale ≤ ~2^31
    * (micro-degree deltas qualify); same non-foldable-input caveat as
    * [[cordicStages]].
    */
  def cordicAtan2Stages(px: String, yCol: String, xCol: String): Seq[Seq[(String, String)]] = {
    val pre = Seq(
      Seq(
        s"${px}x0" -> s"abs($xCol)",
        s"${px}y0" -> s"abs($yCol)",
        s"${px}z0" -> "CAST(0 AS BIGINT)"))
    val iters = (0 until CordicIters).map { i =>
      Seq(
        s"${px}x${i + 1}" -> (s"CASE WHEN ${px}y$i > 0 THEN ${px}x$i + (${px}y$i >> $i) " +
          s"ELSE ${px}x$i - (${px}y$i >> $i) END"),
        s"${px}y${i + 1}" -> (s"CASE WHEN ${px}y$i > 0 THEN ${px}y$i - (${px}x$i >> $i) " +
          s"ELSE ${px}y$i + (${px}x$i >> $i) END"),
        s"${px}z${i + 1}" -> (s"CASE WHEN ${px}y$i > 0 THEN ${px}z$i + ${AtanNano(i)} " +
          s"ELSE ${px}z$i - ${AtanNano(i)} END"))
    }
    val core = s"${px}z$CordicIters"
    val fin = Seq(Seq(
      s"${px}az" -> (s"CASE WHEN ($xCol) = 0 AND ($yCol) = 0 THEN CAST(0 AS BIGINT) " +
        s"WHEN ($xCol) >= 0 AND ($yCol) >= 0 THEN $core " +
        s"WHEN ($xCol) < 0 AND ($yCol) >= 0 THEN 180000000000 - $core " +
        s"WHEN ($xCol) < 0 AND ($yCol) < 0 THEN $core - 180000000000 " +
        s"ELSE -$core END")))
    pre ++ iters ++ fin
  }

  /** Staged steps for the 2^29-scaled unit 3-vector of (`latCol`,
    * `lonCol`) micro-degree columns into `<px>ux/<px>uy/<px>uz`
    * (x toward lon 0, z toward the pole). The two angle chains advance
    * in the SAME stages so the DuckDB CTE chain stays ~36 links.
    * Chord² between two such vectors is monotone in great-circle
    * distance (chord = 2·sin(angle/2)) — nearest-site ranking needs no
    * inverse trig.
    */
  def unitVectorStages(px: String, latCol: String, lonCol: String): Seq[Seq[(String, String)]] = {
    val a = cordicStages(px + "t", latCol)
    val b = cordicStages(px + "n", lonCol)
    a.zip(b).map { case (s1, s2) => s1 ++ s2 } :+ Seq(
      s"${px}ux" -> s"(${px}tc * ${px}nc) >> $CordicScaleBits",
      s"${px}uy" -> s"(${px}tc * ${px}ns) >> $CordicScaleBits",
      s"${px}uz" -> s"${px}ts")
  }

  /** Apply staged steps to a DataFrame, ONE `selectExpr("*", …)` per
    * stage — never one `withColumn` per column: each withColumn
    * re-analyzes the whole accumulated plan, and ~200 of them over a
    * ~200-column schema costs MINUTES of driver-side analysis (measured
    * on the first GeoSpec run); 36 stage-batched selects are instant.
    */
  def applyStages(df: org.apache.spark.sql.DataFrame,
      stages: Seq[Seq[(String, String)]]): org.apache.spark.sql.DataFrame =
    stages.foldLeft(df) { (d, st) =>
      d.selectExpr("*" +: st.map { case (n, e) => s"$e AS $n" }: _*)
    }

  /** GREAT-CIRCLE DISTANCE IN METERS from a chord² column (scale
    * 2^(2·29), i.e. between two [[unitVectorStages]] outputs) — the
    * full haversine surface with ZERO libm: half-chord = sin(θ/2)
    * comes from the exact integer sqrt, its complement leg from the
    * same, and θ/2 = atan2(half-chord, leg) from the vectoring walk
    * (asin(x) ≡ atan2(x, √(1−x²))). Meters use the integer constant
    * 111,195 m/degree (π·6371000/180 = 111194.93 — a 0.7 ppm bias, an
    * order below the fixed-point noise). `div` is "DIV" (Spark) or
    * "//" (DuckDB); everything else is dialect-common.
    */
  def greatCircleMetersStages(px: String, c2Col: String,
      div: String): Seq[Seq[(String, String)]] = {
    val s2 = 1L << (2 * CordicScaleBits)
    Seq(Seq(
      s"${px}h" -> isqrtSql(s"(($c2Col) >> 2)"),
      // greatest(0, …) clamps the complement leg: near-antipodal pairs with
      // fixed-point norm error can push c2>>2 past s2, and an unclamped
      // negative operand would NaN the sqrt → ANSI cast failure. greatest
      // exists in both dialects and is a no-op for all certified inputs.
      s"${px}hx" -> isqrtSql(s"greatest(0, $s2 - (($c2Col) >> 2))"))) ++
      cordicAtan2Stages(px + "v", s"${px}h", s"${px}hx") :+
      Seq(s"${px}m" -> s"(2 * ${px}vaz * 111195) $div 1000000000")
  }

  /** DuckDB CTE chain applying `stages` over the CTE `src`: returns the
    * comma-joined CTE definitions and the final CTE's name.
    */
  def duckStageChain(prefix: String, src: String,
      stages: Seq[Seq[(String, String)]]): (String, String) = {
    val ctes = stages.zipWithIndex.map { case (st, i) =>
      val from = if (i == 0) src else s"$prefix${i - 1}"
      s"$prefix$i AS (SELECT *, " +
        st.map { case (n, e) => s"$e AS $n" }.mkString(", ") + s" FROM $from)"
    }
    (ctes.mkString(",\n    "), s"$prefix${stages.length - 1}")
  }
}
