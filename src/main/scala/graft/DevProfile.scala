package graft

import graft.queries.Dedup
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Dev-only stage profiler for the heavy queries (not part of the driver
  * contract). Reuses Dedup's own building blocks so the measured pipeline
  * is exactly the production one.
  */
object DevProfile {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.ui.enabled", "false")
      .config("spark.sql.session.timeZone", "UTC")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    def time[T](label: String)(f: => T): T = {
      val t0 = System.nanoTime(); val r = f
      println(f"[profile] $label%-30s ${(System.nanoTime() - t0) / 1e9}%8.2f s"); r
    }
    // warmup
    Tables.t(spark, sfDir, "documents").count()

    val sh = Dedup.sparkShingles(spark, sfDir)
    time("shingles count")(sh.count())
    time("shingles count again")(sh.count())
    val hm = sh.withColumn("hm", expr(Dedup.hashExpr))
    time("md5 hash")(hm.count())
    val sc = Dedup.sigCols
    val sig = hm.groupBy("doc_id").agg(sc.head, sc.tail: _*)
    time("signatures (16 mins)")(sig.count())
    time("signatures again")(sig.count())
    spark.udf.register("minhash_sig", udaf(graft.functions.MinHashAggregator))
    val sigU = hm.groupBy("doc_id").agg(expr("minhash_sig(hm)").as("sig"))
    time("signatures (udaf)")(sigU.count())
    time("signatures (udaf) again")(sigU.count())
    val pairs = time("full minhash query")(Dedup.minhashLsh.fn(spark, sfDir).count())
    println(s"pairs=$pairs")

    time("full simhash")(Dedup.simhash.fn(spark, sfDir).count())
    time("full jaccard")(Dedup.ngramJaccard.fn(spark, sfDir).count())
    time("full influx_fanout")(graft.queries.Ingest.influxFanout.fn(spark, sfDir).count())
    time("influx synth only")(Tables.events(spark, sfDir).select(
      expr("concat(event_type, ' value=', CAST(value AS STRING))")).count())

    // raw single-thread parser throughput (the reference's comparable
    // number is a single Go goroutine's parse loop)
    val lines = (0 until 200000).map(i =>
      s"cpu_load,host=server$i,region=us-west value=${i % 100}.5,k=${i}i ${1434055562000000000L + i}")
    val t0 = System.nanoTime()
    var n = 0
    lines.foreach { l =>
      n += graft.parsers.InfluxLineParser.parseLine(l, "n", 0L).fold(_ => 0, _.size)
    }
    val dt = (System.nanoTime() - t0) / 1e9
    println(f"[profile] raw influx parser: ${lines.size / dt / 1000}%.0fk lines/s ($n GTS) single-thread")
    val glines = (0 until 200000).map(i => s"sys.cpu.user;host=web$i ${i % 100}.5 1546420308")
    val t1 = System.nanoTime()
    var g = 0
    glines.foreach { l => if (graft.parsers.GraphiteParser.parseLine(l, true, 0L).isRight) g += 1 }
    val dtg = (System.nanoTime() - t1) / 1e9
    println(f"[profile] raw graphite parser: ${g / dtg / 1000}%.0fk lines/s single-thread")

    // end-to-end engine throughput: synthesize lines (x20 = ~2M) -> typed
    // graphite parse -> Sensision encode, through Spark (32 tasks); first
    // run includes plan compile, second run is the amortized figure
    import spark.implicits._
    val lineDs = Tables.events(spark, sfDir)
      .crossJoin(spark.range(20))
      .select(expr("concat(event_type, '.m', CAST(user_id AS STRING), ';dc=east ', " +
        "CAST(value AS STRING), ' ', CAST(ts_us DIV 1000 AS STRING))")).as[String]
      .persist()
    val nLines = lineDs.count()
    for (round <- 1 to 2) {
      val t2 = System.nanoTime()
      val parsed = graft.streaming.ProtocolIngest.graphite(spark, lineDs, hierarchyLabels = true)
      val encoded = parsed.map(r => graft.core.Sensision.encode(r.toGts))
      val outBytes = encoded.map(_.length.toLong).reduce(_ + _)
      val dte = (System.nanoTime() - t2) / 1e9
      println(f"[profile] e2e parse+encode r$round: ${nLines / dte / 1000}%.0fk lines/s over 32 threads ($nLines lines, $outBytes bytes)")
    }
    lineDs.unpersist()

    // codegen on/off comparison for the signature-heavy pipeline
    spark.conf.set("spark.sql.codegen.wholeStage", "false")
    val t3 = System.nanoTime()
    graft.queries.Dedup.minhashLsh.fn(spark, sfDir).count()
    println(f"[profile] minhash, codegen OFF: ${(System.nanoTime() - t3) / 1e9}%.2f s")
    spark.conf.set("spark.sql.codegen.wholeStage", "true")
    spark.stop()
  }
}
