package graft

import org.apache.spark.sql.SparkSession

/** Dev-only: A/B probe for geo_haversine_ref's plan shape (r8 verdict #2).
  * The query is a single-table linear scan whose cost is the fused
  * ~90-stage CORDIC projection chain (rotation → isqrt → vectoring) —
  * the r8 bench outlier at 2.7-3.3 s. Candidates, per the DevNsw rule
  * (deep plan, small intermediate → truncate):
  *   - fused          (shipped in r8): one deep whole-stage-codegen tree
  *   - ckpt-unit:     localCheckpoint after the unit-vector chain
  *   - ckpt-c2:       localCheckpoint after the chord² join (user_id+c2)
  *   - ckpt-both:     both cuts
  * Run with reps ≥3 at sf0.1 on a QUIET host; adopt per the house rule
  * (win cold AND warm) and record the verdict in geoHaversineBuild's
  * scaladoc + the shipped flags.
  *
  * MEASURED 2026-08-15 (sf0.1, local[32], 3 interleaved reps, quiet):
  * fused cold 11.93 / warm-min 2.61; ckpt-unit 4.13 / 2.33;
  * ckpt-c2 2.69 / 2.05; ckpt-both 2.25 / 2.02. ADOPTED ckpt-both —
  * wins cold by 5.3x (per-level codegen-compile tax, the DevNsw
  * signature) AND warm by 1.3x. Full record in the scaladoc of
  * [[graft.queries.Analytics.geoHaversineBuild]].
  */
object DevGeo {
  def main(args: Array[String]): Unit = {
    val dir = if (args.nonEmpty) args(0) else "/root/testdata/sf0.1"
    val reps = if (args.length > 1) args(1).toInt else 3
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    def clean(): Unit = {
      spark.catalog.clearCache()
      spark.sparkContext.getPersistentRDDs.values
        .foreach(_.unpersist(blocking = true))
    }
    def time(label: String)(f: => Unit): Double = {
      clean()
      val t0 = System.nanoTime(); f
      val s = (System.nanoTime() - t0) / 1e9
      println(f"[devgeo] $label: $s%.2f s"); s
    }
    val variants = Seq(
      ("fused", (false, false)), ("ckpt-unit", (true, false)),
      ("ckpt-c2", (false, true)), ("ckpt-both", (true, true)))
    // interleave variants within each rep so a host-noise window cannot
    // favor one variant; rep 1 is the cold (codegen-compile) sample
    val acc = scala.collection.mutable.Map[String, List[Double]]()
    for (rep <- 1 to reps; (name, (u, c)) <- variants) {
      val t = time(s"$name rep$rep") {
        graft.queries.Analytics
          .geoHaversineBuild(spark, dir, ckptUnit = u, ckptC2 = c).count()
      }
      acc(name) = acc.getOrElse(name, Nil) :+ t
    }
    variants.foreach { case (name, _) =>
      val ts = acc(name)
      val warm = if (ts.size > 1) ts.tail.min else ts.head
      println(f"[devgeo] SUMMARY $name%-10s cold=${ts.head}%.2f warmMin=$warm%.2f")
    }
    spark.stop()
  }
}
