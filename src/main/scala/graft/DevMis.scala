// DevMis — recorded measurement (round 8): graph_mis_greedy at sf0.1,
// partTransitions edge set (309,441 und edges, 7,927 vertices, 7 Luby
// rounds, trace (668, 647, 647, 388, 110, 18, 3)):
//   distributed loop (smallCutoff=200k -> exceeded): 16.7 s of per-round
//     job scheduling on tiny state (3 actions x 7 rounds + barriers);
//   counted-small driver loop (smallCutoff=2M): the collected ~5 MB edge
//     list loops in milliseconds; query total 4.3 s at sf0.1 (~3 s of it
//     the shared partTransitions build, in family with fflCensus 3.2 s).
// The degree caps bound edges at 64*V, so the 2M gate is a real bound,
// not a hope. OpsSpec pins fast == distributed on a multi-round graph.
//
// Round 9 (verdict #3): the distributed loop folds every trace count
// into its checkpoint action as an `observe` metric (CollectMetrics
// fires during the checkpoint job — verified for localCheckpoint AND
// reliable checkpoint), cutting per-round ACTIONS from 4 (winner
// checkpoint, winner count, survivor checkpoint, survivor count) to 2,
// the irreducible pair of materialized relations. The adjacency is now
// checkpointed PRE-PARTITIONED per join key (u and v copies), so the
// data-sized side never re-exchanges across rounds — the shuffle story
// that matters when active stops being broadcastable at 100x.
//
// MEASURED (this main, sf0.1 partTransitions, 309,441 edges, 7 rounds,
// smallCutoff=0, 2026-08-15):
//   old loop: 111 listener jobs, 12.2 s cold / 8.3 s warm
//   new loop:  85 listener jobs, 11.4 s cold / 7.4-8.6 s warm
// Stage-name breakdown of the new 85: exactly 17 are action jobs
// (2/round x 7 + 3 setup, the designed 2x cut from 4/round), the other
// 68 are sub-ms BroadcastExchange futures (withThreadLocalCaptured) —
// one per broadcast join at tiny state, intrinsic to the broadcast
// planning that is CORRECT here and disappears at scale (big active
// sides plan as shuffle joins against the pre-partitioned adjacency).
// AQE on/off does not change the count (measured both). Two dead-end
// alternatives recorded: a persist-chain without checkpoints hits an
// EXPONENTIAL logical-plan DAG (the survivor plan references the label
// plan twice per round) and OOMs in explainString; a single st-labeled
// round relation halves actions again but double-computes the
// neighbor-min shuffle — wrong trade at scale.
//
// Earlier attempt this round (superseded): lazy persist + count-as-
// materializer had the same 2-action shape but no lineage truncation.

package graft

import java.util.concurrent.atomic.AtomicLong

import org.apache.spark.scheduler.{SparkListener, SparkListenerJobStart}
import org.apache.spark.sql.SparkSession

object DevMis {
  def main(args: Array[String]): Unit = {
    val dir = if (args.nonEmpty) args(0) else "/root/testdata/sf0.1"
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")

    val jobs = new AtomicLong(0)
    spark.sparkContext.addSparkListener(new SparkListener {
      override def onJobStart(jobStart: SparkListenerJobStart): Unit =
        jobs.incrementAndGet()
    })

    val edges = graft.queries.Graphs.partTransitions(spark, dir)
      .localCheckpoint(true) // isolate the loop's jobs from the build's
    println(s"[devmis] edge build done, rows=${edges.count()}")

    for (rep <- 1 to 2) {
      spark.catalog.clearCache()
      Thread.sleep(200) // let the listener drain
      val j0 = jobs.get()
      val t0 = System.nanoTime()
      val (trace, indep, maximal) =
        graft.ops.Graph.lubyMis(edges, smallCutoff = 0)
      val sec = (System.nanoTime() - t0) / 1e9
      val j = jobs.get() - j0
      println(f"[devmis] distributed rep$rep: $sec%.2f s, $j jobs, " +
        s"rounds=${trace.size}, indep=$indep, maximal=$maximal, " +
        s"trace=${trace.map(_._2).mkString(",")}")
    }
    spark.stop()
  }
}
