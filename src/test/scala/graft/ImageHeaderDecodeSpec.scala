package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.scalatest.BeforeAndAfterAll
import org.scalatest.funsuite.AnyFunSuite

/** The byte-level container decoder against hand-laid-out header bytes
  * (offsets from the public format specs), truncated/garbage inputs,
  * and the codegen path.
  */
class ImageHeaderDecodeSpec extends AnyFunSuite with BeforeAndAfterAll {

  private lazy val spark = SparkSession.builder()
    .master("local[2]")
    .config("spark.sql.shuffle.partitions", "2")
    .config("spark.ui.enabled", "false")
    .getOrCreate()

  override def afterAll(): Unit = spark.stop()

  private def decode(hex: String) = {
    graft.expressions.ImageHeaderDecode.register(spark)
    import spark.implicits._
    Seq(hex).toDF("hx").repartition(1)
      .selectExpr("image_header_decode(unhex(hx)) AS m")
      .selectExpr("m.format", "m.width", "m.height", "m.frames")
      .collect()(0)
  }

  test("BMP: little-endian dims at 18/22, negative (top-down) height folded") {
    // 26-byte prefix: 'BM', sizes/offsets, width 640 = 8002, height -2 (top-down)
    val r = decode("424D" + "36000000" + "00000000" + "36000000" + "28000000" +
      "80020000" + "FEFFFFFF")
    assert(r.getString(0) == "bmp" && r.getLong(1) == 640L && r.getLong(2) == 2L
      && r.getLong(3) == 1L)
  }

  test("PNG: big-endian IHDR dims; APNG acTL frame count; static PNG = 1 frame") {
    val sig = "89504E470D0A1A0A"
    val ihdr = "0000000D" + "49484452" + "00000280" + "000001E0" + "0806000000" + "AABBCCDD"
    // acTL: len 8, 'acTL', num_frames 17, num_plays 0, crc
    val actl = "00000008" + "6163544C" + "00000011" + "00000000" + "AABBCCDD"
    val anim = decode(sig + ihdr + actl)
    assert(anim.getString(0) == "png" && anim.getLong(1) == 640L &&
      anim.getLong(2) == 480L && anim.getLong(3) == 17L)
    // same file with a non-acTL chunk after IHDR (IDAT) decodes 1 frame
    val still = decode(sig + ihdr + "00000008" + "49444154" + "0000001100000000AABBCCDD")
    assert(still.getLong(3) == 1L)
  }

  test("GIF: 87a and 89a accepted, little-endian u16 dims at 6/8") {
    val r89 = decode("474946383961" + "8002" + "E001" + "000000" + "3B")
    assert(r89.getString(0) == "gif" && r89.getLong(1) == 640L && r89.getLong(2) == 480L)
    val r87 = decode("474946383761" + "1000" + "2000" + "000000" + "3B")
    assert(r87.getString(0) == "gif" && r87.getLong(1) == 16L && r87.getLong(2) == 32L)
  }

  test("garbage, truncated and null inputs decode to NULL (nullable honored)") {
    graft.expressions.ImageHeaderDecode.register(spark)
    import spark.implicits._
    val rows = Seq(
      Some("FFD8FFE0"),          // JPEG magic — not a supported container
      Some("424D36"),            // truncated BMP
      Some("89504E470D0A1A"),    // truncated PNG signature
      None: Option[String]       // null in, null out
    ).toDF("hx").repartition(1)
      .selectExpr("image_header_decode(unhex(hx)) AS m").collect()
    assert(rows.forall(_.isNullAt(0)), s"expected all NULL, got ${rows.toSeq}")
  }

  private def decodeWav(hex: String) = {
    graft.expressions.AudioHeaderDecode.register(spark)
    import spark.implicits._
    Seq(hex).toDF("hx").repartition(1)
      .selectExpr("audio_header_decode(unhex(hx)) AS m")
      .selectExpr("m.format", "m.channels", "m.sample_rate", "m.bits", "m.n_samples")
      .collect()(0)
  }

  test("WAV: RIFF magics, le fmt fields, n_samples = data size / block align") {
    // 44.1 kHz stereo 16-bit, data 400 bytes -> 100 samples/channel
    // rate 44100 = AC44 -> le '44AC0000'; byte rate 176400 = 2B110 -> '10B10200'
    val hex = "52494646" + "B4010000" + "57415645" + "666D7420" + "10000000" +
      "0100" + "0200" + "44AC0000" + "10B10200" + "0400" + "1000" +
      "64617461" + "90010000"
    val r = decodeWav(hex)
    assert(r.getString(0) == "wav" && r.getLong(1) == 2L && r.getLong(2) == 44100L &&
      r.getLong(3) == 16L && r.getLong(4) == 100L)
    // mono 8 kHz: 8000 = 1F40 -> le '401F0000'; block align 2; data 64 -> 32 samples
    val mono = "52494646" + "64000000" + "57415645" + "666D7420" + "10000000" +
      "0100" + "0100" + "401F0000" + "803E0000" + "0200" + "1000" +
      "64617461" + "40000000"
    val m = decodeWav(mono)
    assert(m.getLong(1) == 1L && m.getLong(2) == 8000L && m.getLong(4) == 32L)
    // wrong WAVE magic / truncated -> NULL
    graft.expressions.AudioHeaderDecode.register(spark)
    import spark.implicits._
    val bad = Seq("52494646" + "54000000" + "57415646" + hex.drop(24), "524946").toDF("hx")
      .repartition(1).selectExpr("audio_header_decode(unhex(hx)) AS m").collect()
    assert(bad.forall(_.isNullAt(0)))
  }

  test("decoder runs inside whole-stage codegen (no interpreted fallback)") {
    graft.expressions.ImageHeaderDecode.register(spark)
    import spark.implicits._
    val df = Seq("424D").toDF("hx").repartition(1)
      .selectExpr("image_header_decode(unhex(hx)) AS m")
    df.collect() // finalize the AQE plan before reading it
    val plan = df.queryExecution.executedPlan.toString
    assert(plan.contains("*("), s"no WholeStageCodegen span in:\n$plan")
  }
}
