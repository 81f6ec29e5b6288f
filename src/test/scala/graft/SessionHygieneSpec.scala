package graft

import org.apache.spark.sql.SparkSession
import org.scalatest.BeforeAndAfterAll
import org.scalatest.funsuite.AnyFunSuite

/** Session-reuse hygiene: a composed long-lived session (notebook, REPL,
  * service) runs queries back to back WITHOUT Verify/Bench's between-query
  * persistent-RDD teardown — so no query may leave CacheManager entries
  * behind after its result is materialized. `graph_squares_copurchase`
  * (the one query that persists two shared intermediates) eagerly
  * materializes its 30-row output and unpersists both; this spec pins
  * that discipline so a future persist() without a matching unpersist
  * fails loudly instead of leaking into every downstream query's memory
  * budget.
  */
class SessionHygieneSpec extends AnyFunSuite with BeforeAndAfterAll {
  private val sfDir = "/root/testdata/sf0.001"

  private lazy val spark = SparkSession.builder()
    .master("local[4]")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.ui.enabled", "false")
    .config("spark.sql.session.timeZone", "UTC")
    .getOrCreate()

  override def afterAll(): Unit = spark.stop()

  test("graph_squares_copurchase leaves no CacheManager entries behind") {
    spark.sparkContext.setLogLevel("ERROR")
    spark.catalog.clearCache()
    assert(spark.sharedState.cacheManager.isEmpty, "precondition: cache clear")
    val out = SparkEntry.queries("graph_squares_copurchase")(spark, sfDir)
    assert(out.count() > 0)
    // the query's persisted intermediates must already be gone — no
    // clearCache, no teardown: this is the composed-session path
    assert(spark.sharedState.cacheManager.isEmpty,
      "graph_squares_copurchase left cached plans pinned in the CacheManager")
  }

  test("the surviving blocks are only the GC-managed 30-row checkpoint") {
    spark.sparkContext.setLogLevel("ERROR")
    val before = spark.sparkContext.getPersistentRDDs.keySet
    val out = SparkEntry.queries("graph_squares_copurchase")(spark, sfDir)
    assert(out.count() <= 30)
    val leaked = spark.sparkContext.getPersistentRDDs.keySet -- before
    // exactly the result's own localCheckpoint may remain (ContextCleaner
    // reclaims it on GC); the eg/ac intermediates must not
    assert(leaked.size <= 1,
      s"expected at most the result checkpoint to survive, got RDDs $leaked")
  }
}
