package graft

import org.apache.spark.sql.SparkSession
import org.scalatest.BeforeAndAfterAll
import org.scalatest.funsuite.AnyFunSuite

/** Ground-truth pins for ts_forecast_ensemble: (1) the Bates–Granger
  * combination must never lose to its WORST member on the holdout (on
  * this corpus it holds for every type at every SF — a flip means the
  * weighting arithmetic broke, e.g. weights paired with the wrong
  * member errors); (2) the bp weights are a partition of ~10000 (each
  * truncating division loses < 1, so the sum sits in (9997, 10000]).
  */
class ForecastEnsembleSpec extends AnyFunSuite with BeforeAndAfterAll {

  private lazy val spark = SparkSession.builder()
    .master("local[4]")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.ui.enabled", "false")
    .config("spark.sql.session.timeZone", "UTC")
    .getOrCreate()

  override def afterAll(): Unit = spark.stop()

  test("ensemble never loses to the worst member; weights partition 10000") {
    spark.sparkContext.setLogLevel("ERROR")
    for (dir <- Seq("/root/testdata/sf0.001", "/root/testdata/sf0.01")) {
      val rows = graft.queries.Series.tsForecastEnsemble.fn(spark, dir)
        .select("event_type", "w_naive_bp", "w_drift_bp", "w_mean_bp",
          "mae_naive", "mae_drift", "mae_mean", "mae_ens", "ens_beats_worst")
        .collect()
      assert(rows.nonEmpty, s"$dir: no ensemble rows")
      rows.foreach { r =>
        val t = r.getString(0)
        assert(r.getBoolean(8), s"$dir/$t: ensemble lost to its worst member")
        val wsum = r.getLong(1) + r.getLong(2) + r.getLong(3)
        assert(wsum > 9997L && wsum <= 10000L, s"$dir/$t: weight sum $wsum")
        val worst = Seq(r.getLong(4), r.getLong(5), r.getLong(6)).max
        assert(r.getLong(7) <= worst, s"$dir/$t: mae_ens ${r.getLong(7)} > worst $worst")
      }
    }
  }
}
