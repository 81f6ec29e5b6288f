package graft

import graft.parsers.{GraphiteParser, InfluxLineParser, OpenTsdbParser, PromParser}
import org.scalatest.funsuite.AnyFunSuite

/** Seeded fuzz: every parser must uphold its Either contract on arbitrary
  * garbage — no exception may escape (the prom timestamp-overflow bug
  * class). 4×2000 random inputs over a hostile alphabet.
  */
class ParserFuzzSpec extends AnyFunSuite {

  private val alphabet =
    "abc019 .,;=\"\\{}[]'+-#\t\u00e9\u4e2d@i\r\n%&?/!~`|Inf NaN true _:"

  private def garbage(rnd: scala.util.Random, maxLen: Int): String = {
    val n = rnd.nextInt(maxLen)
    (0 until n).map(_ => alphabet.charAt(rnd.nextInt(alphabet.length))).mkString
  }

  test("graphite parser never throws") {
    val rnd = new scala.util.Random(101)
    (1 to 2000).foreach { i =>
      val s = garbage(rnd, 60)
      try GraphiteParser.parseLine(s, parse = true, 1L)
      catch { case e: Throwable => fail(s"graphite threw on <$s>: $e") }
    }
  }

  test("influx parser never throws") {
    val rnd = new scala.util.Random(102)
    (1 to 2000).foreach { _ =>
      val s = garbage(rnd, 80)
      try InfluxLineParser.parseLine(s, "n", 1L)
      catch { case e: Throwable => fail(s"influx threw on <$s>: $e") }
    }
  }

  test("opentsdb parser never throws") {
    val rnd = new scala.util.Random(103)
    (1 to 2000).foreach { _ =>
      val s = garbage(rnd, 80)
      try OpenTsdbParser.parse(s, 1L)
      catch { case e: Throwable => fail(s"opentsdb threw on <$s>: $e") }
    }
  }

  test("prom exposition parser never throws") {
    val rnd = new scala.util.Random(104)
    (1 to 2000).foreach { _ =>
      val s = garbage(rnd, 80)
      try PromParser.parseExposition(s, Map("j" -> "x"), 1L)
      catch { case e: Throwable => fail(s"prom threw on <$s>: $e") }
    }
  }

  test("influx near-valid mutations never throw") {
    val rnd = new scala.util.Random(105)
    val base = """weather,location=us-midwest temperature=82,b="x y" 1465839830100400200"""
    (1 to 2000).foreach { _ =>
      val pos = rnd.nextInt(base.length)
      val mutated = base.substring(0, pos) +
        alphabet.charAt(rnd.nextInt(alphabet.length)) + base.substring(pos + 1)
      try InfluxLineParser.parseLine(mutated, "n", 1L)
      catch { case e: Throwable => fail(s"influx threw on <$mutated>: $e") }
    }
  }

  test("graphiteVtype column twin agrees with GraphiteParser.inferValue on adversarial tokens") {
    import graft.core.GtsValue
    val spark = org.apache.spark.sql.SparkSession.builder()
      .master("local[2]").config("spark.sql.shuffle.partitions", "2")
      .config("spark.ui.enabled", "false").appName("graft-vtype-agreement").getOrCreate()
    try {
      import spark.implicits._
      // the drift cases the advisor flagged + Go-vs-Java float grammar edges
      val targeted = Seq(
        "1.5d", "1.5D", "1.5f", "1.5F", "1.5", " 1.5", "1.5 ", "1.5\t",
        "0x1.8p1", "0X1.8P1", "1.5e3", "1.5E3", "+1.5", "-1.5", "1.", ".5",
        ".", "..", "1..2", "5", "+5", "-5", " 5", "5 ", "5.0f", "1.d5",
        "Infinity", "-Infinity", "NaN", "Inf", "inf", "true", "True", "FALSE",
        " true", "99999999999999999999", "1,5", "", "15e3", "1_000", "１.5")
      val rnd = new scala.util.Random(106)
      val tokens = targeted ++ (1 to 3000).map(_ => garbage(rnd, 20))
      val expected = tokens.map { t =>
        GraphiteParser.inferValue(t) match {
          case _: GtsValue.GtsDouble => "double"
          case _: GtsValue.GtsLong   => "long"
          case _: GtsValue.GtsBool   => "bool"
          case _: GtsValue.GtsString => "string"
        }
      }
      val got = tokens.toDF("tok")
        .select(graft.functions.IngestSql.graphiteVtype(org.apache.spark.sql.functions.col("tok")))
        .as[String].collect().toSeq
      val diffs = tokens.indices.collect {
        case i if expected(i) != got(i) => (tokens(i), expected(i), got(i))
      }
      assert(diffs.isEmpty, s"column/Scala drift on: ${diffs.take(10).map(d => s"<${d._1}> scala=${d._2} col=${d._3}")}")
    } finally spark.stop()
  }
}
