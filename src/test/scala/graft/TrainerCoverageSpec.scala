package graft

import org.apache.spark.sql.SparkSession
import org.scalatest.BeforeAndAfterAll
import org.scalatest.funsuite.AnyFunSuite
import java.nio.file.Files

/** pipeline_trainer_coverage — the no-silent-caps diagnostic for the
  * tokenizer trainers (r10 verdict task #3).
  *
  * On THIS corpus the unigram top-1024 cap covers 100% of token mass
  * (the synthetic vocabulary is 31 words — honestly FLAT, the
  * q_lda_calibration precedent), so the corpus test pins the exact
  * invariants (coverage == 10000 bp whenever vocabulary ≤ cap;
  * types_seen == min(cap, types_total); seen ≤ total always), and the
  * MONOTONE-DEGRADATION claim — a growing corpus pushes mass outside
  * the cap — is pinned on PLANTED corpora whose vocabulary actually
  * outgrows 1024.
  */
class TrainerCoverageSpec extends AnyFunSuite with BeforeAndAfterAll {

  private lazy val spark = SparkSession.builder()
    .master("local[4]")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.ui.enabled", "false")
    .appName("graft-trainer-coverage-spec")
    .getOrCreate()

  override def afterAll(): Unit = spark.stop()

  private def rows(dir: String): Map[String, (Long, Long, Long, Long)] = {
    val out = graft.queries.TextOps.trainerCoverage.fn(spark, dir).collect()
      .map { r =>
        r.getString(r.fieldIndex("trainer")) ->
          ((r.getLong(r.fieldIndex("cap")), r.getLong(r.fieldIndex("seen")),
            r.getLong(r.fieldIndex("total")), r.getLong(r.fieldIndex("coverage_bp"))))
      }.toMap
    spark.sparkContext.getPersistentRDDs.values.foreach(_.unpersist(blocking = true))
    out
  }

  test("corpus invariants: bounded bp, seen <= total, exact 10000 when vocab <= cap") {
    spark.sparkContext.setLogLevel("ERROR")
    Seq("/root/testdata/sf0.001", "/root/testdata/sf0.01").foreach { sf =>
      val m = rows(sf)
      assert(m.keySet == Set("unigram_dp_unroll", "unigram_top_words_mass",
        "unigram_top_words_types", "wordpiece_merge_mass"), s"$sf: rows $m")
      m.foreach { case (t, (cap, seen, total, bp)) =>
        assert(cap > 0 && seen >= 0 && seen <= total && bp >= 0 && bp <= 10000,
          s"$sf/$t: ($cap, $seen, $total, $bp)")
      }
      val (cap, typesSeen, typesTotal, _) = m("unigram_top_words_types")
      assert(typesSeen == math.min(cap, typesTotal),
        s"$sf: top-V must select exactly min(cap, vocab) types")
      if (typesTotal <= cap) {
        assert(m("unigram_top_words_mass")._4 == 10000L,
          s"$sf: vocab <= cap must mean FULL mass coverage (the honest flat)")
        assert(m("unigram_top_words_mass")._2 == m("unigram_top_words_mass")._3)
      }
    }
  }

  /** Planted corpus: 1024 base words × 3 occurrences + `extras`
    * singleton words, 16 words per document — vocabulary 1024 + extras,
    * so the top-1024 trainer sees exactly the base mass and coverage =
    * 3072 / (3072 + extras).
    */
  private def planted(extras: Int): String = {
    val dir = Files.createTempDirectory(s"graft_tcov_$extras").toString
    val base = (0 until 1024).flatMap(i => Seq.fill(3)(f"w$i%04d"))
    val extra = (0 until extras).map(i => f"x$i%05d")
    val words = new scala.util.Random(42L).shuffle(base ++ extra)
    import spark.implicits._
    words.grouped(16).zipWithIndex.map { case (ws, i) =>
      (i.toLong, ws.mkString(" "), "en", "planted", ws.mkString(" ").length.toLong)
    }.toSeq.toDF("doc_id", "text", "lang", "source", "n_chars")
      .repartition(2).write.parquet(s"$dir/documents.parquet")
    dir
  }

  test("planted vocab growth: top-1024 mass coverage degrades monotonically") {
    spark.sparkContext.setLogLevel("ERROR")
    val cov = Seq(0, 1024, 3072).map { extras =>
      val m = rows(planted(extras))
      val (_, seen, total, bp) = m("unigram_top_words_mass")
      // exact closed form: base mass 3·1024 inside the cap, extras outside
      assert(seen == 3072L && total == 3072L + extras,
        s"extras=$extras: ($seen, $total)")
      assert(bp == seen * 10000L / total, s"extras=$extras: bp=$bp")
      val (_, tSeen, tTotal, _) = m("unigram_top_words_types")
      assert(tSeen == 1024L && tTotal == 1024L + extras)
      bp
    }
    assert(cov == cov.sorted.reverse && cov.distinct == cov,
      s"coverage must strictly degrade with vocabulary growth: $cov")
  }
}
