package graft

import graft.queries.{Analytics, Dedup, Graphs, Ingest, Quality, Series, Similarity, Sketches, TextOps}
import org.apache.spark.sql.{DataFrame, SparkSession}

/** Driver contract — see /root/repo/SURVEY.md §7 + the builder prompt.
  * Each registered operator lives in a `graft.queries.*` module as a [[Q]]
  * (Spark implementation + DuckDB oracle twin when SQL-expressible).
  */
object SparkEntry {

  private def registry: Seq[Q] =
    Analytics.all ++ Ingest.all ++ TextOps.all ++ Dedup.all ++ Similarity.all ++
      Series.all ++ Quality.all ++ Sketches.all ++ Graphs.all

  /** Flagship query on /root/testdata/sf0.001; driver smoke-checks rows>0.
    * A representative star-join + windowed aggregation over the ingested
    * data — the analytics layer the reference delegates to Warp 10.
    */
  def entry(spark: SparkSession): DataFrame =
    Analytics.q5RegionRevenue.fn(spark, "/root/testdata/sf0.001")

  /** One entry per implemented operator from SURVEY.md §2. */
  def queries: Map[String, (SparkSession, String) => DataFrame] =
    registry.map(q => q.name -> q.fn).toMap

  /** For each key in queries, equivalent ANSI SQL runnable by DuckDB on
    * the same parquet tables. Omitted for non-SQL-expressible ops (driver
    * records a weaker rows-only check).
    */
  def oracleSql: Map[String, String] =
    registry.flatMap(q => q.oracle.map(o => q.name -> o)).toMap
}
