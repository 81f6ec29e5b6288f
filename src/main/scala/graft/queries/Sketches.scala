package graft.queries

import graft.{Q, Tables}
import graft.ops.Sketch
import org.apache.spark.sql.functions._

/** Deterministic sketch queries — thin bindings of [[graft.ops.Sketch]]
  * onto the testdata tables, each carrying an exact twin so the output
  * surfaces estimate-vs-exact side by side (the production monitoring
  * shape: a sketch you can't audit is a sketch you can't trust).
  *
  * All four oracles are bit-exact: the md5-derived 60-bit hash is the
  * shared cross-engine randomness and every estimate is fixed-point
  * bigint DIV — no float in any comparison path.
  */
object Sketches {

  def all: Seq[Q] = Seq(countMin, bloomJoin, hll, kmv, kmvSetOps, spaceSaving,
    hdrQuantiles, hllWindow, amsF2, bitmapIntersect)

  /** DuckDB twin of [[Sketch.h60]]. */
  private def oh60(saltExpr: String, keyExpr: String): String =
    s"CAST('0x' || substr(md5($saltExpr || ':' || $keyExpr), 1, 15) AS BIGINT)"

  private val cmsD = 4
  private val cmsW = 128

  /** Count-Min heavy hitters over (user_id, event_type) traffic pairs:
    * top-20 exact counts beside their CMS point estimates (d=4, w=128 —
    * 750 keys into 128 buckets forces real collisions; min-over-depth
    * keeps the overestimate tight). The counter table is 512 cells no
    * matter the data volume — THE sketch property that matters at 100 TB.
    */
  val countMin: Q = Q("sketch_countmin", (s, dir) => {
    val exact = Tables.t(s, dir, "events")
      .select(concat_ws("|", col("user_id"), col("event_type")).as("key"))
      .groupBy("key").agg(count(lit(1)).as("n"))
    Sketch.cmsEstimate(exact, "key", "n", cmsD, cmsW)
      .orderBy(col("n_exact").desc, col("key")).limit(20)
  }, Some(s"""
    WITH ex AS (
      SELECT CAST(user_id AS VARCHAR) || '|' || event_type AS key,
             count(*)::BIGINT AS n
      FROM events GROUP BY 1),
    hx AS (
      SELECT key, n, j,
             ${oh60("CAST(j AS VARCHAR)", "key")} % $cmsW AS bucket
      FROM ex CROSS JOIN range($cmsD) t(j)),
    ct AS (SELECT j, bucket, sum(n)::BIGINT AS c FROM hx GROUP BY 1, 2)
    SELECT key, max(n)::BIGINT AS n_exact, min(c)::BIGINT AS n_est
    FROM hx JOIN ct USING (j, bucket)
    GROUP BY key
    ORDER BY n_exact DESC, key LIMIT 20"""))

  private val bloomM = 1 << 20
  private val bloomK = 3

  /** Bloom-filter join pruning: the bit-set of finished orders
    * (o_orderstatus='F') probed by every lineitem orderkey — the
    * runtime-filter shape that prunes fact-side rows before an
    * expensive shuffle join at warehouse scale. One summary row:
    * probes / exact members / maybes / false positives (never a false
    * negative: maybes ⊇ members by construction, and the fp_bp column
    * puts the measured false-positive rate next to its m,k budget).
    */
  val bloomJoin: Q = Q("sketch_bloom", (s, dir) => {
    val set = Tables.t(s, dir, "orders")
      .filter(col("o_orderstatus") === "F")
      .select(col("o_orderkey").cast("string").as("k")).distinct()
    val probes = Tables.t(s, dir, "lineitem")
      .select(col("l_orderkey").cast("string").as("k")).distinct()
    val bits = Sketch.bloomBits(set, "k", bloomM, bloomK)
    val probed = Sketch.bloomProbe(probes, "k", bits, bloomM, bloomK)
    val exact = probes.join(set, Seq("k"), "left_semi")
      .select(col("k"), lit(true).as("present"))
    probed.join(exact, probed("key") === exact("k"), "left")
      .select(col("maybe"), coalesce(col("present"), lit(false)).as("present"))
      .agg(count(lit(1)).as("n_probed"),
        sum(when(col("present"), 1L).otherwise(0L)).as("n_present"),
        sum(when(col("maybe"), 1L).otherwise(0L)).as("n_maybe"),
        sum(when(col("maybe") && !col("present"), 1L).otherwise(0L)).as("n_false_pos"))
      .withColumn("fp_bp", expr("(n_false_pos * 10000) DIV nullif(n_probed - n_present, 0)"))
  }, Some(s"""
    WITH st AS (
      SELECT DISTINCT CAST(o_orderkey AS VARCHAR) AS k FROM orders
      WHERE o_orderstatus = 'F'),
    pr AS (SELECT DISTINCT CAST(l_orderkey AS VARCHAR) AS k FROM lineitem),
    bits AS (
      SELECT DISTINCT ${oh60("CAST(j AS VARCHAR)", "k")} % $bloomM AS pos
      FROM st CROSS JOIN range($bloomK) t(j)),
    ph AS (
      SELECT k, ${oh60("CAST(j AS VARCHAR)", "k")} % $bloomM AS pos
      FROM pr CROSS JOIN range($bloomK) t(j)),
    mb AS (
      SELECT k, (count(*) FILTER (WHERE pos IN (SELECT pos FROM bits))) = $bloomK AS maybe
      FROM ph GROUP BY k),
    j AS (
      SELECT mb.maybe, (st.k IS NOT NULL) AS present
      FROM mb LEFT JOIN st ON mb.k = st.k)
    SELECT count(*)::BIGINT AS n_probed,
      sum(CASE WHEN present THEN 1 ELSE 0 END)::BIGINT AS n_present,
      sum(CASE WHEN maybe THEN 1 ELSE 0 END)::BIGINT AS n_maybe,
      sum(CASE WHEN maybe AND NOT present THEN 1 ELSE 0 END)::BIGINT AS n_false_pos,
      (sum(CASE WHEN maybe AND NOT present THEN 1 ELSE 0 END)::BIGINT * 10000)
        // nullif(count(*)::BIGINT - sum(CASE WHEN present THEN 1 ELSE 0 END)::BIGINT, 0) AS fp_bp
    FROM j"""))

  private val hllM = 64

  /** Hand-rolled HLL distinct-count over lineitem orderkeys: m=64
    * registers (σ≈13%), rho from the hash's binary STRING (no float
    * log), harmonic sum scaled exact by 2^40, alpha as a /2048
    * rational — the estimate is a single bigint DIV, bit-auditable on
    * both engines. This is the deterministic counterpart to
    * q_approx_distinct's engine-native HLL++ (which can never have a
    * cross-engine oracle).
    */
  val hll: Q = Q("sketch_hll", (s, dir) => {
    val li = Tables.t(s, dir, "lineitem")
    val regs = Sketch.hllRegisters(li, "l_orderkey", hllM)
    val est = Sketch.hllEstimate(regs, hllM)
    val exact = li.agg(countDistinct(col("l_orderkey")).as("n_exact"))
    est.crossJoin(exact)
      .withColumn("err_bp", expr("(abs(est_distinct - n_exact) * 10000) DIV n_exact"))
      .select("m", "n_exact", "est_distinct", "err_bp", "sum_scaled", "nonzero_buckets")
  }, Some {
    val alphaNum = math.round(0.7213 / (1.0 + 1.079 / hllM) * 2048)
    s"""
    WITH h AS (
      SELECT DISTINCT ${oh60("'h'", "CAST(l_orderkey AS VARCHAR)")} AS h
      FROM lineitem),
    r AS (
      SELECT h % $hllM AS bucket,
             least(length(bin(h // $hllM)) - length(rtrim(bin(h // $hllM), '0')) + 1, 40) AS rho
      FROM h),
    regs AS (
      SELECT g.bucket, coalesce(max(r.rho), 0) AS reg
      FROM range($hllM) g(bucket) LEFT JOIN r ON g.bucket = r.bucket
      GROUP BY g.bucket),
    agg AS (
      SELECT sum(CAST(pow(2, 40 - reg) AS BIGINT))::BIGINT AS sum_scaled,
             sum(CASE WHEN reg > 0 THEN 1 ELSE 0 END)::BIGINT AS nonzero_buckets
      FROM regs),
    ex AS (SELECT count(DISTINCT l_orderkey)::BIGINT AS n_exact FROM lineitem)
    SELECT $hllM AS m, ex.n_exact,
      ($alphaNum * ${hllM.toLong * hllM} * 1099511627776) // (agg.sum_scaled * 2048) AS est_distinct,
      (abs(($alphaNum * ${hllM.toLong * hllM} * 1099511627776) // (agg.sum_scaled * 2048) - ex.n_exact) * 10000)
        // ex.n_exact AS err_bp,
      agg.sum_scaled, agg.nonzero_buckets
    FROM agg, ex"""
  })

  private val kmvK = 16

  /** KMV distinct users per event type: k=16 minimum hash values,
    * est = (k-1)·2^56 / h_k in one integer DIV; groups under k distinct
    * keys are exact by construction (sf0.001's 15 users exercises that
    * branch, larger SFs the estimator). KMV sketches merge by
    * keep-k-smallest — the property that makes them the distributed
    * distinct-count of choice.
    */
  val kmv: Q = Q("sketch_kmv", (s, dir) => {
    Sketch.kmvEstimate(Tables.t(s, dir, "events"), "event_type", "user_id", kmvK)
      .withColumnRenamed("grp", "event_type")
      .withColumn("err_bp", expr("(abs(n_est - n_exact) * 10000) DIV n_exact"))
      .orderBy("event_type")
  }, Some(s"""
    WITH h AS (
      SELECT DISTINCT event_type,
             ${oh60("'k'", "CAST(user_id AS VARCHAR)")} // 16 AS h
      FROM events),
    rk AS (
      SELECT event_type, h,
             row_number() OVER (PARTITION BY event_type ORDER BY h) AS r,
             count(*) OVER (PARTITION BY event_type) AS n
      FROM h)
    SELECT event_type, max(n)::BIGINT AS n_exact,
      CASE WHEN max(n) < $kmvK THEN max(n)::BIGINT
           ELSE (${(kmvK - 1).toLong} * 72057594037927936)
                  // max(CASE WHEN r = $kmvK THEN h END) END AS n_est,
      (abs(CASE WHEN max(n) < $kmvK THEN max(n)::BIGINT
           ELSE (${(kmvK - 1).toLong} * 72057594037927936)
                  // max(CASE WHEN r = $kmvK THEN h END) END - max(n)) * 10000)
        // max(n) AS err_bp
    FROM rk GROUP BY event_type
    ORDER BY event_type"""))

  private val ssCap = 64

  /** SpaceSaving heavy hitters over the corpus token stream: words with
    * frequency above N/64, found by capacity-bounded per-partition
    * summaries then CONFIRMED with exact counts
    * ([[Sketch.heavyHitters]]) — the candidate-then-confirm pattern
    * that turns an order-dependent one-pass sketch into a deterministic
    * operator (the guarantee makes every true heavy hitter a candidate;
    * only exact counts reach the output). On this corpus the 31-word
    * vocabulary is under the capacity, so the summary is provably exact
    * — the eviction path is proven on adversarial skew in SketchSpec.
    * The oracle is the definition itself: GROUP BY + threshold.
    */
  val spaceSaving: Q = Q("sketch_spacesaving", (s, dir) => {
    val words = Tables.t(s, dir, "documents")
      .select(explode(graft.ops.Text.words(col("text"))).as("w"))
    Sketch.heavyHitters(words, "w", ssCap)
      .orderBy(col("n_exact").desc, col("key"))
  }, Some(s"""
    WITH w AS (
      SELECT unnest(list_filter(string_split(lower(text), ' '), x -> x <> '')) AS key
      FROM documents),
    c AS (SELECT key, count(*)::BIGINT AS n_exact FROM w GROUP BY 1),
    t AS (SELECT sum(n_exact)::BIGINT AS n_total FROM c)
    SELECT key, n_exact, n_total,
      CAST(n_exact * 10000 // n_total AS BIGINT) AS share_bp
    FROM c, t WHERE n_exact * $ssCap > n_total
    ORDER BY n_exact DESC, key"""))

  private val kmvSetK = 64

  /** KMV set operations between the activity-cell sets (user ×
    * hour-of-day) of the time range's first and second half: union /
    * intersection / Jaccard estimated from two 64-value sketches alone
    * ([[Sketch.kmvSetOps]] — Beyer et al. SIGMOD'07). THE
    * sketch-mergeability showcase: at 100 TB each half ships 64 hashes,
    * not its key set, and the coordinator's answer here is
    * bit-reproducible because every estimate is one integer division.
    */
  val kmvSetOps: Q = Q("sketch_kmv_setops", (s, dir) => {
    val e = Tables.events(s, dir)
    val rng = e.agg(min("ts_us").as("mn"), max("ts_us").as("mx"))
    val cells = e.crossJoin(broadcast(rng))
      .select(concat_ws(":", col("user_id"),
          expr("(ts_us DIV 3600000000) % 24")).as("key"),
        (col("ts_us") * 2 <= col("mn") + col("mx")).as("fh"))
      .persist() // both half filters read this — one event scan, not two
    Sketch.kmvSetOps(cells.filter(col("fh")).select("key"),
      cells.filter(!col("fh")).select("key"), "key", kmvSetK)
  }, Some {
    val k = kmvSetK
    val maxH = 72057594037927936L
    def sk(name: String, cond: String) =
      s"""$name AS MATERIALIZED (
        SELECT DISTINCT ${oh60("'k'", "key")} // 16 AS h
        FROM cells WHERE $cond ORDER BY h LIMIT $k)"""
    def est(src: String) =
      s"""(SELECT CASE WHEN count(*) < $k THEN count(*)::BIGINT
        ELSE ${(k - 1).toLong} * $maxH // max(h) END FROM $src)"""
    s"""WITH rng AS (SELECT min(epoch_us(ts)) AS mn, max(epoch_us(ts)) AS mx
        FROM events),
    cells AS MATERIALIZED (SELECT CAST(user_id AS VARCHAR) || ':' ||
        CAST((epoch_us(ts) // 3600000000) % 24 AS VARCHAR) AS key,
        epoch_us(ts) * 2 <= mn + mx AS fh
      FROM events, rng),
    ${sk("sa", "fh")},
    ${sk("sb", "NOT fh")},
    mg AS MATERIALIZED (SELECT h FROM (SELECT h FROM sa UNION SELECT h FROM sb)
      ORDER BY h LIMIT $k),
    st AS (SELECT
        (SELECT count(*)::BIGINT FROM mg) AS k_used,
        (SELECT count(*)::BIGINT FROM mg
          WHERE h IN (SELECT h FROM sa) AND h IN (SELECT h FROM sb)) AS matches,
        ${est("sa")} AS est_a, ${est("sb")} AS est_b, ${est("mg")} AS est_union)
    SELECT CAST($k AS BIGINT) AS k, k_used, est_a, est_b, est_union, matches,
      matches * est_union // k_used AS est_inter,
      matches * 10000 // k_used AS jacc_bp
    FROM st"""
  })

  /** Deterministic MERGEABLE rank/quantile sketch on the HDR-histogram
    * fixed grid ([[Sketch.hdrBucketSql]] — Tene's HdrHistogram, public;
    * the roadmap's "fixed-grid rank sketch": GK/KLL have sequential or
    * randomized semantics, a fixed grid has neither). Per event type,
    * cent values land in log₂-spaced buckets with 2⁵ sub-buckets
    * (relative error &lt; 1/32, ≤ ~576 buckets total); the quantile for
    * rank ⌈φ·n⌉ is the first bucket whose cumulative count reaches it.
    *
    * The query exercises the MERGE path on purpose: per-day partial
    * histograms (what every executor would ship at 100 TB) are merged
    * by summing counts, and the result is provably identical to a
    * direct build because bucket assignment is value-deterministic and
    * counts are associative. The exact quantile rides the same
    * cum/rank machinery over the exact per-cent histogram (value-
    * bounded, not data-bounded) for the estimate-beside-exact audit
    * shape of this module; SketchSpec asserts the 1/32 error contract.
    */
  val hdrQuantiles: Q = Q("sketch_hdr_quantiles", (s, dir) => {
    import org.apache.spark.sql.expressions.Window
    import s.implicits._
    val lb = Sketch.hdrBucketSql("DIV", "cents")
    val e = Tables.events(s, dir).select(col("event_type"),
      expr("ts_us DIV 86400000000").as("day"),
      expr("CAST(round(value * 100) AS BIGINT)").as("cents"))
    val partial = e.groupBy(col("event_type"), col("day"), expr(lb).as("lb"))
      .agg(count(lit(1)).as("c"))
    val merged = partial.groupBy("event_type", "lb").agg(sum("c").as("c"))
    val exact = e.groupBy(col("event_type"), col("cents").as("lb"))
      .agg(count(lit(1)).as("c"))
    val phis = Seq(5000L, 9000L, 9900L).toDF("phi_bp")
    // both windows run over BUCKET tables (parameter/value-bounded),
    // partitioned by series — never a data-sized window
    def quant(hist: org.apache.spark.sql.DataFrame, outCol: String) =
      hist.withColumn("cum",
          sum("c").over(Window.partitionBy("event_type").orderBy("lb")))
        .withColumn("n", sum("c").over(Window.partitionBy("event_type")))
        .crossJoin(broadcast(phis))
        .withColumn("rk", expr("(n * phi_bp + 9999) DIV 10000"))
        .filter(col("cum") >= col("rk") && col("cum") - col("c") < col("rk"))
        .select(col("event_type"), col("phi_bp"), col("n"), col("lb").as(outCol))
    quant(merged, "q_est_c")
      .join(quant(exact, "q_exact_c").drop("n"), Seq("event_type", "phi_bp"))
      .orderBy("event_type", "phi_bp")
  }, Some {
    val lb = Sketch.hdrBucketSql("//", "cents", guard = false)
    def quant(src: String, outCol: String, withN: Boolean) =
      s"""SELECT event_type, phi_bp${if (withN) ", n" else ""}, lb AS $outCol
        FROM (SELECT event_type, lb, c,
            CAST(sum(c) OVER (PARTITION BY event_type ORDER BY lb) AS BIGINT) AS cum,
            CAST(sum(c) OVER (PARTITION BY event_type) AS BIGINT) AS n
          FROM $src) t CROSS JOIN ph
        WHERE cum >= (n * phi_bp + 9999) // 10000
          AND cum - c < (n * phi_bp + 9999) // 10000"""
    s"""WITH e AS (SELECT event_type, epoch_us(ts) // 86400000000 AS day,
        CAST(round(value * 100) AS BIGINT) AS cents
      FROM events),
    part AS (SELECT event_type, day, $lb AS lb, count(*)::BIGINT AS c
      FROM e GROUP BY 1, 2, 3),
    m AS (SELECT event_type, lb, sum(c)::BIGINT AS c FROM part GROUP BY 1, 2),
    ex AS (SELECT event_type, cents AS lb, count(*)::BIGINT AS c
      FROM e GROUP BY 1, 2),
    ph(phi_bp) AS (VALUES (CAST(5000 AS BIGINT)), (9000), (9900)),
    qm AS (${quant("m", "q_est_c", withN = true)}),
    qe AS (${quant("ex", "q_exact_c", withN = false)})
    SELECT qm.event_type, qm.phi_bp, qm.n, q_est_c, q_exact_c
    FROM qm JOIN qe ON qe.event_type = qm.event_type AND qe.phi_bp = qm.phi_bp
    ORDER BY 1, 2"""
  })

  /** Sliding-window distinct users via HLL register MERGE — the
    * mergeability property that makes sketches the 100-TB answer to
    * windowed COUNT DISTINCT: per (hour, bucket) registers are built
    * ONCE, and the trailing-6-hour sketch is just the per-bucket
    * register MAX over a RANGE frame (no re-scan of 6 hours of raw
    * data, which is what the exact expansion must do). Same
    * fixed-point estimate dialect as [[hll]] (rho from the binary
    * string, 2⁴⁰-scaled harmonic sum, /2048 alpha — every step
    * bigint). The exact trailing-6h distinct rides beside it as the
    * accuracy audit (bounded 6× fan-out), so every window carries its
    * own err_bp — the table that justifies replacing the exact path
    * at scale. Shapes: one register grid (hours × 64), one range
    * window per bucket, map-side-combinable rollups.
    */
  val hllWindow: Q = Q("sketch_hll_window", (s, dir) => {
    import org.apache.spark.sql.expressions.Window
    val alphaNum = math.round(0.7213 / (1.0 + 1.079 / hllM) * 2048)
    val e = Tables.events(s, dir)
      .withColumn("hh", expr("ts_us DIV 3600000000"))
    val h = e.select(col("hh"),
        expr(Sketch.h60("'hw'", "CAST(user_id AS STRING)")).as("h"))
      .distinct()
    val r = h.withColumn("bucket", expr(s"h % $hllM"))
      .withColumn("rho", expr(
        s"least(length(bin(h DIV $hllM)) - length(rtrim('0', bin(h DIV $hllM))) + 1, 40)"))
      .groupBy("hh", "bucket").agg(max("rho").as("rho"))
    val grid = e.select("hh").distinct()
      .crossJoin(broadcast(s.range(hllM).select(col("id").as("bucket"))))
    val wR = Window.partitionBy("bucket").orderBy("hh").rangeBetween(-5, 0)
    val merged = grid.join(r, Seq("hh", "bucket"), "left")
      .na.fill(0L, Seq("rho"))
      .withColumn("reg", max("rho").over(wR))
    val est = merged.groupBy("hh").agg(
        sum(expr("CAST(pow(2, 40 - reg) AS BIGINT)")).as("sum_scaled"),
        sum(when(col("reg") > 0, 1L).otherwise(0L)).as("nonzero_buckets"))
      .withColumn("est_distinct", expr(
        s"($alphaNum * ${hllM.toLong * hllM} * 1099511627776) DIV (sum_scaled * 2048)"))
    val du = e.select("user_id", "hh").distinct()
    val span = e.agg(max("hh").as("hmax"))
    val exact = du.select(col("user_id"), explode(expr("sequence(hh, hh + 5)")).as("we"))
      .distinct()
      .crossJoin(broadcast(span)).filter(col("we") <= col("hmax"))
      .groupBy("we").agg(countDistinct("user_id").as("n_exact"))
    est.join(exact, est("hh") === exact("we"))
      .select(col("hh"), col("n_exact"), col("est_distinct"),
        expr("(abs(est_distinct - n_exact) * 10000) DIV n_exact").as("err_bp"),
        col("nonzero_buckets"))
      .orderBy("hh")
  }, Some {
    val alphaNum = math.round(0.7213 / (1.0 + 1.079 / hllM) * 2048)
    val estExpr = s"($alphaNum * ${hllM.toLong * hllM} * 1099511627776) // (est.sum_scaled * 2048)"
    s"""WITH e AS (
      SELECT user_id, epoch_us(ts) // 3600000000 AS hh FROM events),
    h AS (SELECT DISTINCT hh, ${oh60("'hw'", "CAST(user_id AS VARCHAR)")} AS h FROM e),
    r AS (SELECT hh, h % $hllM AS bucket,
        max(least(length(bin(h // $hllM)) - length(rtrim(bin(h // $hllM), '0')) + 1, 40)) AS rho
      FROM h GROUP BY hh, bucket),
    hours AS (SELECT DISTINCT hh FROM e),
    grid AS (SELECT hours.hh, g.bucket FROM hours CROSS JOIN range($hllM) g(bucket)),
    mg AS (SELECT grid.hh, grid.bucket, coalesce(r.rho, 0) AS rho
      FROM grid LEFT JOIN r ON r.hh = grid.hh AND r.bucket = grid.bucket),
    w AS (SELECT hh, max(rho) OVER (PARTITION BY bucket ORDER BY hh
        RANGE BETWEEN 5 PRECEDING AND CURRENT ROW) AS reg FROM mg),
    est AS (SELECT hh, sum(CAST(pow(2, 40 - reg) AS BIGINT))::BIGINT AS sum_scaled,
        sum(CASE WHEN reg > 0 THEN 1 ELSE 0 END)::BIGINT AS nonzero_buckets
      FROM w GROUP BY hh),
    du AS (SELECT DISTINCT user_id, hh FROM e),
    ex0 AS (SELECT DISTINCT user_id, hh + t.i AS we
      FROM du CROSS JOIN (SELECT unnest(range(0, 6)) AS i) t),
    mx AS (SELECT max(hh) AS hmax FROM e),
    ex AS (SELECT we, count(DISTINCT user_id)::BIGINT AS n_exact
      FROM ex0, mx WHERE we <= mx.hmax GROUP BY we)
    SELECT est.hh, ex.n_exact,
      CAST($estExpr AS BIGINT) AS est_distinct,
      CAST((abs($estExpr - ex.n_exact) * 10000) // ex.n_exact AS BIGINT) AS err_bp,
      est.nonzero_buckets
    FROM est JOIN ex ON ex.we = est.hh ORDER BY est.hh"""
  })

  private val amsK = 64

  /** AMS tug-of-war F2 (self-join size / skew mass) of the l_partkey
    * stream: 64 ±1-sign counters over the exact per-key counts
    * ([[Sketch.amsCounters]]), estimate = mean of the squared counters,
    * audited against the exact F2 = Σ n² computed from the same
    * per-key agg. F2 is what a cost model needs to size a shuffle
    * self-join or detect key skew before it happens — and the AMS
    * state is 64 additive bigints per shard vs a full key histogram.
    * Deterministic md5 signs ⇒ est and err_bp are bit-identical
    * cross-engine; `within_3sigma` records the √(2/k)≈17.7% ·3 design
    * envelope. Headroom: |c_j| ≤ N rows, so c² stays signed-64-safe
    * below ~3·10⁹ rows per shard — at 100 TB run per-shard counters
    * and ADD them (the merge IS the sum), never a global re-hash.
    * Shapes: one exact groupBy, a broadcast 64-row fan-out over keys,
    * one 64-row agg.
    */
  val amsF2: Q = Q("sketch_ams_f2", (s, dir) => {
    val ex = Tables.t(s, dir, "lineitem")
      .select(col("l_partkey").cast("string").as("key"))
      .groupBy("key").agg(count(lit(1)).as("n"))
      .persist() // key-bounded: one row per distinct part
    val est = Sketch.amsCounters(ex, "key", "n", amsK)
      .agg(sum(expr("c * c")).as("ss"))
      .select(expr(s"ss DIV $amsK").as("f2_est"))
    val exact = ex.agg(sum(expr("n * n")).as("f2_exact"))
    exact.crossJoin(est)
      .select(col("f2_exact"), col("f2_est"),
        expr("abs(f2_est - f2_exact) * 10000 DIV f2_exact").as("err_bp"),
        expr("abs(f2_est - f2_exact) * 10000 DIV f2_exact <= 5300").as("within_3sigma"))
  }, Some(s"""WITH ex AS (
      SELECT CAST(l_partkey AS VARCHAR) AS key, count(*)::BIGINT AS n
      FROM lineitem GROUP BY 1),
    sg AS (SELECT t.j,
        CASE WHEN ${oh60("CAST(t.j AS VARCHAR)", "key")} % 2 = 0 THEN n ELSE -n END AS v
      FROM ex CROSS JOIN range($amsK) t(j)),
    c AS (SELECT j, sum(v)::BIGINT AS c FROM sg GROUP BY j),
    es AS (SELECT sum(c * c)::BIGINT // $amsK AS f2_est FROM c),
    xx AS (SELECT sum(n * n)::BIGINT AS f2_exact FROM ex)
    SELECT f2_exact, f2_est,
      abs(f2_est - f2_exact) * 10000 // f2_exact AS err_bp,
      abs(f2_est - f2_exact) * 10000 // f2_exact <= 5300 AS within_3sigma
    FROM es, xx"""))

  /** Distributed bitmap-index set algebra — the segment-bitmap form an
    * OLAP engine (Druid/Pinot/ClickHouse roaring bitmaps — public) uses
    * for audience-overlap questions: per event type the distinct-user
    * set is packed into 63-bit words keyed by user_id DIV 63 (bit 63
    * stays clear — DuckDB's `<<` refuses the sign bit, and the sub-word
    * popcounts are unaffected), then every pairwise overlap is ONE
    * word-keyed equi-join of bitmap fragments with popcount(a AND b) —
    * set intersection at #users⁄63 longs per side instead of a
    * user-level join, the exact companion to [[kmvSetOps]]' estimated
    * intersections. Shapes: one distinct shuffle, one word-keyed
    * bitmap agg (bit_or partials combine map-side), and the fragment
    * join is co-partitioned on the word key — at 100 TB the bitmap
    * relation is users⁄63 × #types rows, shrinking the join input 63×
    * versus raw user pairs. All integer (popcounts + one DIV), so
    * bit-exact.
    */
  val bitmapIntersect: Q = Q("sketch_bitmap_intersect", (s, dir) => {
    val tu = Tables.events(s, dir).select(col("event_type"), col("user_id")).distinct()
    // loud domain gate: a negative user_id would shift by a negative
    // amount (Spark % keeps the dividend sign) and silently corrupt the
    // word packing — fail the query instead. One-row broadcast.
    val domainGate = tu.agg(min("user_id").as("mn"))
      .select(expr("""CASE WHEN mn < 0 THEN raise_error(concat(
          'sketch_bitmap_intersect: negative user_id ', CAST(mn AS STRING),
          ' cannot be bit-packed')) ELSE 1 END""").as("_domain_ok"))
    val bm = tu
      .crossJoin(broadcast(domainGate)).where(col("_domain_ok") === 1)
      .select(col("event_type"), expr("user_id DIV 63").as("w"),
        expr("shiftleft(CAST(1 AS BIGINT), CAST(user_id % 63 AS INT))").as("b"))
      .groupBy("event_type", "w").agg(expr("bit_or(b)").as("bits"))
    val sz = bm.groupBy("event_type")
      .agg(expr("CAST(sum(bit_count(bits)) AS BIGINT)").as("n_users"))
    val ix = bm.as("a").join(bm.as("b"),
        col("a.w") === col("b.w") && col("a.event_type") < col("b.event_type"))
      .groupBy(col("a.event_type").as("type_a"), col("b.event_type").as("type_b"))
      .agg(expr("CAST(sum(bit_count(a.bits & b.bits)) AS BIGINT)").as("n_both"))
    ix.join(sz.select(col("event_type").as("type_a"), col("n_users").as("n_a")), "type_a")
      .join(sz.select(col("event_type").as("type_b"), col("n_users").as("n_b")), "type_b")
      .select(col("type_a"), col("type_b"), col("n_a"), col("n_b"), col("n_both"),
        expr("10000 * n_both DIV (n_a + n_b - n_both)").as("jaccard_bp"))
      .orderBy("type_a", "type_b")
  }, Some("""WITH tu AS (SELECT DISTINCT event_type, user_id FROM events),
    bm AS (SELECT event_type, user_id // 63 AS w,
        bit_or(1::BIGINT << CAST(user_id % 63 AS INT)) AS bits
      FROM tu GROUP BY event_type, w),
    sz AS (SELECT event_type, CAST(sum(bit_count(bits)) AS BIGINT) AS n_users
      FROM bm GROUP BY event_type),
    ix AS (SELECT a.event_type AS type_a, b.event_type AS type_b,
        CAST(sum(bit_count(a.bits & b.bits)) AS BIGINT) AS n_both
      FROM bm a JOIN bm b ON b.w = a.w AND a.event_type < b.event_type
      GROUP BY 1, 2)
    SELECT type_a, type_b, sa.n_users AS n_a, sb.n_users AS n_b, n_both,
      CAST(10000 * n_both // (sa.n_users + sb.n_users - n_both) AS BIGINT) AS jaccard_bp
    FROM ix
    JOIN sz sa ON sa.event_type = ix.type_a
    JOIN sz sb ON sb.event_type = ix.type_b
    ORDER BY type_a, type_b"""))
}
