package graft

import org.apache.spark.sql.SparkSession
import org.scalatest.BeforeAndAfterAll
import org.scalatest.funsuite.AnyFunSuite

/** The geohash encoder against the public reference vectors (the
  * Wikipedia/Niemeyer examples) and the spec's structural properties.
  */
class GeoSpec extends AnyFunSuite with BeforeAndAfterAll {

  private lazy val spark = SparkSession.builder()
    .master("local[2]")
    .config("spark.sql.shuffle.partitions", "2")
    .config("spark.ui.enabled", "false")
    .getOrCreate()

  override def afterAll(): Unit = spark.stop()

  private def geohash6(latE6: Long, lonE6: Long): String = {
    val bits = graft.ops.Geo.geohashBitsSql("DIV", latE6.toString, lonE6.toString)
    spark.sql(s"SELECT ${graft.ops.Geo.geohash6FromBitsSql(s"($bits)")} AS gh")
      .collect()(0).getString(0)
  }

  test("public reference vectors: Jutland and Curitiba") {
    // Wikipedia's canonical example: (57.64911, 10.40744) -> u4pruy...
    assert(geohash6(57649110L, 10407440L) == "u4pruy")
    // Curitiba city-center example: (-25.382708, -49.265506) -> 6gkzwg...
    assert(geohash6(-25382708L, -49265506L) == "6gkzwg")
  }

  test("hemisphere corners land in the spec's quadrant leaders") {
    // the first character encodes (lon-half, lat-half): z is the NE
    // extreme, 0 the SW extreme — the lon-leading interleave property
    assert(geohash6(89999999L, 179999999L).startsWith("z"))
    assert(geohash6(-90000000L, -180000000L) == "000000")
    // equator/prime-meridian point sits at the 's' cell corner
    assert(geohash6(0L, 0L).startsWith("s"))
  }

  test("prefix truncation is the cell pyramid: nearby points share prefixes") {
    // two points ~100 m apart share a long prefix; 1 degree apart only a short one
    val a = geohash6(57649110L, 10407440L)
    val b = geohash6(57649810L, 10408140L)
    assert(a.take(5) == b.take(5), s"$a vs $b")
    val far = geohash6(58649110L, 11407440L)
    assert(a.take(1) == far.take(1) && a.take(4) != far.take(4))
  }

  test("alphabet is the canonical base-32 without a/i/l/o") {
    assert(graft.ops.Geo.Alphabet == "0123456789bcdefghjkmnpqrstuvwxyz")
    assert(!"ailo".exists(graft.ops.Geo.Alphabet.contains(_: Char)))
  }
}
