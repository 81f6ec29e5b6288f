package graft.ops

/** Storage-layout machinery: Z-order (Morton) interleaved sort keys.
  *
  * At 100 TB the dominant cost of a multi-dimensional workload is how
  * many files a 2-predicate scan has to open: sorting data by ONE key
  * clusters that key only. Writing files ordered by the bit-interleave
  * of k quantized keys gives every key locality ~2^(bits/k), so
  * min/max zone maps prune on ALL interleaved dimensions at once —
  * the standard lakehouse `OPTIMIZE ZORDER BY` move, reproduced here
  * as pure integer SQL both engines evaluate identically (`>>`/`&` on
  * BIGINT are cross-engine exact, including on negatives, and the
  * quantizer is truncating integer division).
  *
  * All builders emit the SHARED Spark/DuckDB dialect; integer division
  * is parameterized (`DIV` in Spark, `//` in DuckDB) like
  * [[graft.ops.Series.holtStepSql]].
  */
object Layout {

  /** Quantize `x` (BIGINT expression) from its [mn, mx] range onto
    * [0, 2^bits): q = (x - mn)·(2^bits - 1) DIV (mx - mn). Exact in
    * both engines for non-negative numerators; callers pass mn/mx from
    * a 1-row aggregate so the numerator is non-negative by
    * construction. Degenerate range (mx = mn) maps to 0.
    */
  def quantizeSql(div: String, x: String, mn: String, mx: String, bits: Int): String = {
    require(bits >= 1 && bits <= 31, s"quantize bits in [1,31], got $bits")
    val top = (1L << bits) - 1
    s"(CASE WHEN ($mx) > ($mn) THEN ((($x) - ($mn)) * $top) $div (($mx) - ($mn)) ELSE 0 END)"
  }

  /** Morton/Z-order interleave of already-quantized BIGINT expressions
    * in [0, 2^bits): bit i of column j lands at position i·k + j. The
    * interleave is a sum of `(x >> i & 1) · 2^(i·k+j)` terms with
    * LITERAL power-of-two multipliers — no shift-by-expression, so the
    * generated SQL parses and folds identically in Spark and DuckDB.
    */
  def zorderSql(cols: Seq[String], bits: Int): String = {
    val k = cols.size
    require(k >= 2, "interleaving one column is just the column")
    require(bits >= 1 && bits * k <= 62, s"bits*cols must fit a BIGINT: $bits*$k")
    val terms =
      for { i <- 0 until bits; (c, j) <- cols.zipWithIndex }
        yield s"((($c) >> $i) & 1) * CAST(${1L << (i * k + j)} AS BIGINT)"
    terms.mkString("(", " + ", ")")
  }

  /** Hilbert-curve index (xy→d) of two already-quantized BIGINT columns
    * in [0, 2^bits) — the unrolled classic loop (one projection stage
    * per bit, high to low): quadrant q = rx=0 ? ry : 3−ry (the (3·rx)
    * XOR ry identity written as CASE — DuckDB's `^` is POWER, never
    * use XOR operators cross-engine), d += s²·q, then the ry=0
    * rotation (swap, with the rx=1 reflection about N−1). Hilbert
    * beats Morton for zone-map locality because the curve is
    * CONTINUOUS — consecutive cells are always grid-adjacent, so equal
    * d-ranges tile compact blobs with no Z-shaped jumps across the
    * grid; [[hilbertStages]] output feeds the same file-bucketing DIV
    * as [[zorderSql]]. Stage exprs reference only prior-stage
    * ATTRIBUTES (the Geo CollapseProject discipline — never feed
    * foldable literals through a deep chain).
    *
    * Returns stages for [[graft.ops.Geo.applyStages]] /
    * [[graft.ops.Geo.duckStageChain]]; final columns `${px}d` (the
    * index, in [0, 4^bits)) plus working `${px}x/${px}y`.
    */
  def hilbertStages(px: String, xCol: String, yCol: String,
      bits: Int): Seq[Seq[(String, String)]] = {
    require(bits >= 1 && bits <= 30, s"hilbert bits in [1,30], got $bits")
    val n = 1L << bits
    val init = Seq(
      s"${px}x$bits" -> s"($xCol)", s"${px}y$bits" -> s"($yCol)",
      s"${px}d$bits" -> "CAST(0 AS BIGINT)")
    val steps = (bits - 1 to 0 by -1).map { k =>
      val s = 1L << k
      val (xp, yp, dp) = (s"${px}x${k + 1}", s"${px}y${k + 1}", s"${px}d${k + 1}")
      val rx = s"(($xp & $s) > 0)"
      val ry = s"(($yp & $s) > 0)"
      Seq(
        s"${px}d$k" -> (s"$dp + ${s * s} * (CASE WHEN $rx AND $ry THEN 2 " +
          s"WHEN $rx THEN 3 WHEN $ry THEN 1 ELSE 0 END)"),
        s"${px}x$k" -> s"(CASE WHEN $ry THEN $xp WHEN $rx THEN ${n - 1} - $yp ELSE $yp END)",
        s"${px}y$k" -> s"(CASE WHEN $ry THEN $yp WHEN $rx THEN ${n - 1} - $xp ELSE $xp END)")
    }
    val fin = Seq(s"${px}d" -> s"${px}d0")
    Seq(init) ++ steps ++ Seq(fin)
  }
}
