package graft

import org.scalatest.funsuite.AnyFunSuite
import graft.parsers.StatsdParser
import graft.parsers.StatsdParser.Sample

class StatsdSpec extends AnyFunSuite {

  test("grammar corners: types, gauge signs, unit-fraction rates") {
    assert(StatsdParser.parseLine("a.b:42|c") == Right(Sample("a.b", 42, "c", false, 1)))
    assert(StatsdParser.parseLine("a:42|c|@0.5") == Right(Sample("a", 42, "c", false, 2)))
    assert(StatsdParser.parseLine("a:42|c|@0.25") == Right(Sample("a", 42, "c", false, 4)))
    assert(StatsdParser.parseLine("a:42|c|@0.125") == Right(Sample("a", 42, "c", false, 8)))
    assert(StatsdParser.parseLine("a:42|c|@0.2") == Right(Sample("a", 42, "c", false, 5)))
    assert(StatsdParser.parseLine("a:42|c|@1") == Right(Sample("a", 42, "c", false, 1)))
    assert(StatsdParser.parseLine("t:9|ms|@0.5") == Right(Sample("t", 9, "ms", false, 2)))
    // gauges: sign = delta, unsigned = absolute set; negatives keep sign
    assert(StatsdParser.parseLine("g:+5|g") == Right(Sample("g", 5, "g", true, 1)))
    assert(StatsdParser.parseLine("g:-5|g") == Right(Sample("g", -5, "g", true, 1)))
    assert(StatsdParser.parseLine("g:5|g") == Right(Sample("g", 5, "g", false, 1)))
    assert(StatsdParser.parseLine("s:77|s") == Right(Sample("s", 77, "s", false, 1)))
  }

  test("malformed lines fail loudly, never guess") {
    for (bad <- Seq(":5|c", "m", "m:|c", "m:x|c", "m:5|q", "m:5|c|0.5",
        "m:5|c|@0.3", "m:5|c|@0", "m:5|c|@x", "m:5|s|@0.5", "m:+5|c",
        "m:-5|ms", "m:5|c|@0.5|extra"))
      assert(StatsdParser.parseLine(bad).isLeft, s"accepted: $bad")
  }

  test("dogstatsd: tags canonicalize sorted, both section orders accepted") {
    import StatsdParser.DogSample
    assert(StatsdParser.parseDogLine("m:5|c|@0.5|#env:prod,host:web1") ==
      Right(DogSample("m", Seq(5), "c", false, 2, "env:prod,host:web1")))
    // permuted tags -> identical canonical key
    assert(StatsdParser.parseDogLine("m:5|c|@0.5|#host:web1,env:prod") ==
      Right(DogSample("m", Seq(5), "c", false, 2, "env:prod,host:web1")))
    // tag section before rate section
    assert(StatsdParser.parseDogLine("m:5|c|#a:1|@0.25") ==
      Right(DogSample("m", Seq(5), "c", false, 4, "a:1")))
    // bare tags and no tags
    assert(StatsdParser.parseDogLine("m:5|d|#canary") ==
      Right(DogSample("m", Seq(5), "d", false, 1, "canary")))
    assert(StatsdParser.parseDogLine("m:5|h") ==
      Right(DogSample("m", Seq(5), "h", false, 1, "")))
  }

  test("dogstatsd: value packing on c/ms/h/d only; gauges keep delta semantics") {
    import StatsdParser.DogSample
    assert(StatsdParser.parseDogLine("m:1:2:3|h|@0.25") ==
      Right(DogSample("m", Seq(1, 2, 3), "h", false, 4, "")))
    assert(StatsdParser.parseDogLine("m:1:2|ms") ==
      Right(DogSample("m", Seq(1, 2), "ms", false, 1, "")))
    assert(StatsdParser.parseDogLine("g:+5|g|#env:x") ==
      Right(DogSample("g", Seq(5), "g", true, 1, "env:x")))
    assert(StatsdParser.parseDogLine("g:-5|g") ==
      Right(DogSample("g", Seq(-5), "g", true, 1, "")))
    for (bad <- Seq("m:1:2|g", "m:1:2|s", "m:+1:2|h", "m:1:|h", "m:5|g|@0.5",
        "m:5|c|@0.5|@0.5", "m:5|c|#a|#b", "m:5|c|#", "m:5|c|#a,,b",
        "m:5|c|x", "m:5|z|#a"))
      assert(StatsdParser.parseDogLine(bad).isLeft, s"accepted: $bad")
  }
}
