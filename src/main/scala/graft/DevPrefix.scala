package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Dev-only: A/B probe for the dedup_prefix_filter plan (7.4 s at sf0.1
  * in the round-7 mid bench — the registry's slowest query on landing).
  * Suspects:
  *  A. the global-df attach: groupBy(sh) agg + shuffle JOIN back onto
  *     the postings vs ONE window count over partition(sh) on the same
  *     exchange;
  *  B. the verification arrays: sort_array(collect_list) per doc where
  *     the intersect size never needed sorted input;
  *  C. raw stage volumes (postings / prefix / candidates) to see which
  *     stage carries the time.
  * Run: sbt "runMain graft.DevPrefix [sfdir]". Findings recorded in the
  * adopting commit.
  */
object DevPrefix {
  def main(args: Array[String]): Unit = {
    val dir = if (args.nonEmpty) args(0) else "/root/testdata/sf0.1"
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    def time[T](label: String)(f: => T): T = {
      val t0 = System.nanoTime(); val r = f
      println(f"[devprefix] $label: ${(System.nanoTime() - t0) / 1e9}%.2f s"); r
    }

    // stage volumes
    val sh = graft.ops.Lsh.shingles(
      spark.read.parquet(s"$dir/documents.parquet"), "doc_id", "text", n = 3).persist()
    time("postings count")(println(s"[devprefix]   postings=${sh.count()}"))
    val pre = graft.ops.Lsh.prefixPostings(sh, "doc_id").persist()
    time("prefix postings count")(println(s"[devprefix]   prefix=${pre.count()}"))
    val cand = pre.select(col("doc_id").as("d1"), col("sh"))
      .join(pre.select(col("doc_id").as("d2"), col("sh").as("sh2")),
        col("sh") === col("sh2") && col("d1") < col("d2"))
      .select("d1", "d2").distinct()
    time("candidates count")(println(s"[devprefix]   cand=${cand.count()}"))
    pre.unpersist(); sh.unpersist()

    def variantWindowDf(s: SparkSession): Long = {
      import org.apache.spark.sql.expressions.Window
      val sh = graft.ops.Lsh.shingles(
        s.read.parquet(s"$dir/documents.parquet"), "doc_id", "text", n = 3).persist()
      val pre = graft.ops.Scale.capGroups(
        sh.select(col("doc_id"), col("sh"),
            count(lit(1)).over(Window.partitionBy("sh")).as("_df"))
          .select(col("doc_id"), col("sh"),
            row_number().over(
              Window.partitionBy("doc_id").orderBy(col("_df"), col("sh"))).as("_rk"),
            count(lit(1)).over(Window.partitionBy("doc_id")).as("_n"))
          .filter(expr("_rk <= _n - ((_n + 1) DIV 2) + 1"))
          .select("doc_id", "sh"),
        "sh", 128L)
      val cand = pre.select(col("doc_id").as("d1"), col("sh"))
        .join(pre.select(col("doc_id").as("d2"), col("sh").as("sh2")),
          col("sh") === col("sh2") && col("d1") < col("d2"))
        .select("d1", "d2").distinct()
      val sets = sh.groupBy("doc_id")
        .agg(collect_list("sh").as("g"), count(lit(1)).as("n"))
      val n = cand
        .join(sets.select(col("doc_id").as("d1"), col("g").as("g1"), col("n").as("n1")), "d1")
        .join(sets.select(col("doc_id").as("d2"), col("g").as("g2"), col("n").as("n2")), "d2")
        .withColumn("shared", size(array_intersect(col("g1"), col("g2"))).cast("long"))
        .filter(col("shared") / (col("n1") + col("n2") - col("shared")) >= 0.5)
        .count()
      sh.unpersist()
      n
    }

    def variantRepartition(s: SparkSession): Long = {
      import org.apache.spark.sql.expressions.Window
      // spread the interpreted shingle explode across cores: the sf
      // parquet is ONE file -> one scan partition -> single-threaded HOF
      val sh = graft.ops.Lsh.shingles(
        s.read.parquet(s"$dir/documents.parquet").repartition(32),
        "doc_id", "text", n = 3).persist()
      val pre = graft.ops.Scale.capGroups(
        sh.select(col("doc_id"), col("sh"),
            count(lit(1)).over(Window.partitionBy("sh")).as("_df"))
          .select(col("doc_id"), col("sh"),
            row_number().over(
              Window.partitionBy("doc_id").orderBy(col("_df"), col("sh"))).as("_rk"),
            count(lit(1)).over(Window.partitionBy("doc_id")).as("_n"))
          .filter(expr("_rk <= _n - ((_n + 1) DIV 2) + 1"))
          .select("doc_id", "sh"),
        "sh", 128L)
      val cand = pre.select(col("doc_id").as("d1"), col("sh"))
        .join(pre.select(col("doc_id").as("d2"), col("sh").as("sh2")),
          col("sh") === col("sh2") && col("d1") < col("d2"))
        .select("d1", "d2").distinct()
      val sets = sh.groupBy("doc_id")
        .agg(collect_list("sh").as("g"), count(lit(1)).as("n"))
      val n = cand
        .join(sets.select(col("doc_id").as("d1"), col("g").as("g1"), col("n").as("n1")), "d1")
        .join(sets.select(col("doc_id").as("d2"), col("g").as("g2"), col("n").as("n2")), "d2")
        .withColumn("shared", size(array_intersect(col("g1"), col("g2"))).cast("long"))
        .filter(col("shared") / (col("n1") + col("n2") - col("shared")) >= 0.5)
        .count()
      sh.unpersist()
      n
    }

    def variantHashed(s: SparkSession): Long = {
      import org.apache.spark.sql.expressions.Window
      graft.expressions.Md5Hash60.register(s)
      // gram STRINGS leave the pipeline at the explode: every window
      // sort, join key, array element and intersect below runs on the
      // canonical md5-derived 60-bit long instead
      val sh = graft.ops.Lsh.shingles(
        s.read.parquet(s"$dir/documents.parquet"), "doc_id", "text", n = 3)
        .select(col("doc_id"), expr("graft_h60(sh)").as("sh")).persist()
      val pre = graft.ops.Scale.capGroups(
        sh.select(col("doc_id"), col("sh"),
            count(lit(1)).over(Window.partitionBy("sh")).as("_df"))
          .select(col("doc_id"), col("sh"),
            row_number().over(
              Window.partitionBy("doc_id").orderBy(col("_df"), col("sh"))).as("_rk"),
            count(lit(1)).over(Window.partitionBy("doc_id")).as("_n"))
          .filter(expr("_rk <= _n - ((_n + 1) DIV 2) + 1"))
          .select("doc_id", "sh"),
        "sh", 128L)
      val cand = pre.select(col("doc_id").as("d1"), col("sh"))
        .join(pre.select(col("doc_id").as("d2"), col("sh").as("sh2")),
          col("sh") === col("sh2") && col("d1") < col("d2"))
        .select("d1", "d2").distinct()
      val sets = sh.groupBy("doc_id")
        .agg(collect_list("sh").as("g"), count(lit(1)).as("n"))
      val n = cand
        .join(sets.select(col("doc_id").as("d1"), col("g").as("g1"), col("n").as("n1")), "d1")
        .join(sets.select(col("doc_id").as("d2"), col("g").as("g2"), col("n").as("n2")), "d2")
        .withColumn("shared", size(array_intersect(col("g1"), col("g2"))).cast("long"))
        .filter(col("shared") / (col("n1") + col("n2") - col("shared")) >= 0.5)
        .count()
      sh.unpersist()
      n
    }

    for (rep <- 1 to 2) {
      time(s"shipped rep$rep") {
        spark.catalog.clearCache()
        println(s"[devprefix]   rows=${graft.queries.Dedup.prefixFilter.fn(spark, dir).count()}")
      }
      time(s"window-df + unsorted sets rep$rep") {
        spark.catalog.clearCache()
        println(s"[devprefix]   rows=${variantWindowDf(spark)}")
      }
      time(s"hashed-gram keys rep$rep") {
        spark.catalog.clearCache()
        println(s"[devprefix]   rows=${variantHashed(spark)}")
      }
      time(s"repartitioned explode + window-df rep$rep") {
        spark.catalog.clearCache()
        println(s"[devprefix]   rows=${variantRepartition(spark)}")
      }
    }
    spark.stop()
  }
}
