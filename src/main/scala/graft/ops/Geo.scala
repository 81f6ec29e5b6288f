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
}
