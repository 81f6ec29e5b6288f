package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Dev-only: partition-shape probe for the LSH signature path (ROADMAP
  * round-5 perf item). The sf0.1 documents table is ONE parquet file →
  * a single input partition, and [[graft.ops.Lsh.shingles]] builds its
  * word n-grams in an interpreted HOF transform() BEFORE the explode —
  * so the whole shingle fan-out runs in one task until the groupBy
  * shuffle. This probe A/Bs the as-scanned plan against an explicit
  * small repartition ahead of the shingle transform. At real scale the
  * input arrives in many files and the question disappears; the probe
  * decides whether the bench-scale single-file artifact is worth a
  * guard repartition in the queries.
  *
  * VERDICT (round 5, sf0.1, local[32], both probe orders run): NOT
  * adopted. The first timed variant absorbs session warm-up (~2-3 s)
  * whichever it is; warm steady-state is signatures 0.41 s as-scanned
  * vs 0.49 s repartitioned, candidatePairs 0.76 vs 0.68 s — within
  * noise. The shingle HOF on one partition is cheap at this volume and
  * the signature groupBy re-parallelizes immediately after; a guard
  * repartition would add a shuffle for no measured win.
  */
object DevLsh {
  def main(args: Array[String]): Unit = {
    val dir = if (args.nonEmpty) args(0) else "/root/testdata/sf0.1"
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    def time[T](label: String)(f: => T): T = {
      val t0 = System.nanoTime(); val r = f
      println(f"[devlsh] $label: ${(System.nanoTime() - t0) / 1e9}%.2f s"); r
    }
    val docs = Tables.t(spark, dir, "documents")
    println(s"[devlsh] scan partitions = ${docs.rdd.getNumPartitions}")
    for (rep <- 1 to 2) {
      time(s"signatures repartition(32) $rep") {
        graft.ops.Lsh.signatures(
          graft.ops.Lsh.shingles(docs.repartition(32), "doc_id", "text", 3),
          "doc_id").count()
      }
      time(s"signatures as-scanned $rep") {
        graft.ops.Lsh.signatures(
          graft.ops.Lsh.shingles(docs, "doc_id", "text", 3), "doc_id").count()
      }
      time(s"candidatePairs as-scanned $rep") {
        graft.ops.Lsh.candidatePairs(graft.ops.Lsh.signatures(
          graft.ops.Lsh.shingles(docs, "doc_id", "text", 3), "doc_id"),
          "doc_id").count()
      }
      time(s"candidatePairs repartition(32) $rep") {
        graft.ops.Lsh.candidatePairs(graft.ops.Lsh.signatures(
          graft.ops.Lsh.shingles(docs.repartition(32), "doc_id", "text", 3),
          "doc_id"), "doc_id").count()
      }
    }
    spark.stop()
  }
}
