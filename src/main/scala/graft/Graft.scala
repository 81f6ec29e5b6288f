package graft

/** Single-import discovery surface for the generic operator library:
  *
  * {{{
  * import graft.Graft
  *
  * val pairs = Graft.lsh.candidatePairs(sigs, "id")
  * val comps = Graft.graph.connectedComponentsStar(pairs, "d1", "d2")
  * val level = Graft.series.ewmaLast(events, "sensor", "ts", "seq", "v", Seq(0.5))
  * }}}
  *
  * Every member is the corresponding `graft.ops` module — see
  * EXAMPLES.md for end-to-end recipes. The `graft.queries` modules are
  * thin bindings of these onto the bundled test tables (with DuckDB
  * verification oracles); user code should come through here.
  */
object Graft {
  /** Skew-aware aggregation/join helpers (salting, bucketing). */
  val scale: ops.Scale.type = ops.Scale
  /** Connected components, PageRank, triangle counting. */
  val graph: ops.Graph.type = ops.Graph
  /** Sequence packing / context-window binning. */
  val pack: ops.Pack.type = ops.Pack
  /** Exact + approximate nearest-neighbor search primitives. */
  val ann: ops.Ann.type = ops.Ann
  /** MinHash/SimHash signatures and banded candidate generation. */
  val lsh: ops.Lsh.type = ops.Lsh
  /** Per-document text features, winnowing, BPE merge training. */
  val text: ops.Text.type = ops.Text
  /** Reproducible hash-ordered / weighted / stratified sampling. */
  val sample: ops.Sample.type = ops.Sample
  /** Wire-protocol parsing facades (graphite/influx/opentsdb/prom). */
  val ingest: ops.Ingest.type = ops.Ingest
  /** Per-series smoothing and robust outlier scoring. */
  val series: ops.Series.type = ops.Series
  /** One-pass column profiling (nulls/distincts/min/max). */
  val profile: ops.Profile.type = ops.Profile
}
