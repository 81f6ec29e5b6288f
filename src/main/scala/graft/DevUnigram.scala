package graft

import org.apache.spark.sql.SparkSession

/** Unigram trainer dev harness: dumps the driver-EM vocabulary (TSV on
  * stdout between markers) and the generated oracle SQL (files under
  * /tmp) so the DuckDB twin can be diffed piece by piece while
  * iterating. Args: sfDir (default sf0.001).
  */
object DevUnigram {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.001")
    val spark = SparkSession.builder()
      .master("local[8]")
      .config("spark.sql.shuffle.partitions", "8")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val vocab = graft.ops.Unigram.train(Tables.t(spark, sfDir, "documents"))
    println("=== DRIVER VOCAB ===")
    vocab.foreach(p => println(s"${p.piece}\t${p.isChar}\t${p.usage}\t${p.cost}"))
    println("=== END VOCAB ===")
    java.nio.file.Files.write(java.nio.file.Paths.get("/tmp/unigram_vocab_oracle.sql"),
      (s"WITH ${graft.ops.Unigram.emOracleCtes()}\n" +
        "SELECT piece, is_char, usage, cost AS cost_fix FROM c_fin ORDER BY piece")
        .getBytes("UTF-8"))
    java.nio.file.Files.write(java.nio.file.Paths.get("/tmp/unigram_fert_oracle.sql"),
      (s"WITH ${graft.ops.Unigram.emOracleCtes()},\n${graft.ops.Unigram.fertilityOracleCtes()}\n" +
        """SELECT w.lang, w.source, CAST(sum(w.n) AS BIGINT) AS words,
          CAST(sum(w.n * p.np) AS BIGINT) AS pieces,
          (CAST(sum(w.n * p.np) AS BIGINT) * 10000) // CAST(sum(w.n) AS BIGINT) AS fertility_bp
          FROM wls w JOIN np p USING (word) GROUP BY 1, 2 ORDER BY 1, 2""")
        .getBytes("UTF-8"))
    println("oracle SQL written to /tmp/unigram_{vocab,fert}_oracle.sql")
    spark.stop()
  }
}
