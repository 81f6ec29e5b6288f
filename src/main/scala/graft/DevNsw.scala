package graft

import org.apache.spark.sql.SparkSession

/** Dev-only: A/B probe for the NSW beam-hop plan shape (ROADMAP item).
  * Variant A (now a dev twin) is the CHAINED plan: 3 hops composed
  * into one lazy DataFrame. Variant B (SHIPPED since round 5)
  * truncates the plan between hops with localCheckpoint on the
  * ~|queries|·8-row beam — fewer operators per stage, one scheduled
  * job per hop.
  *
  * MEASURED at sf0.1 / local[32] (2 reps × 2 sessions, round 5):
  * chained 8.5-8.9 s cold / 2.5-3.1 s warm; truncated 2.7-2.8 s cold /
  * 2.0-2.3 s warm — the deep chained plan pays a per-hop-level
  * whole-stage-codegen COMPILE tax that the tiny checkpoint jobs never
  * approach. Truncation adopted (house A/B rule: win on both axes).
  */
object DevNsw {
  def main(args: Array[String]): Unit = {
    val dir = if (args.nonEmpty) args(0) else "/root/testdata/sf0.1"
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    def time[T](label: String)(f: => T): T = {
      val t0 = System.nanoTime(); val r = f
      println(f"[devnsw] $label: ${(System.nanoTime() - t0) / 1e9}%.2f s"); r
    }
    for (rep <- 1 to 2) {
      time(s"chained (dev twin) rep$rep") {
        spark.catalog.clearCache()
        graft.queries.Similarity.devNswBeamChained(spark, dir).count()
      }
      time(s"checkpointed-hops (shipped) rep$rep") {
        spark.catalog.clearCache()
        graft.queries.Similarity.annNswBeam.fn(spark, dir).count()
      }
    }
    spark.stop()
  }
}
