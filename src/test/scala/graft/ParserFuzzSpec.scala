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
}
