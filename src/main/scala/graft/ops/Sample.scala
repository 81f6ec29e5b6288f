package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Reproducible sampling primitives for training-data curation — all
  * selection is a pure function of the row id (md5-derived), never
  * `rand()`: stable across engines, retries, partitionings, and scales.
  * Complements [[Text.hashBucket]] (percentile membership) with ORDERED
  * selection — "the first n per stratum", "until the budget is spent".
  */
object Sample {

  /** Total order within a stratum: the full 60-bit md5 prefix of the id
    * (salted), id as tie-break. Same expression is emitted into DuckDB
    * oracles, so order is identical cross-engine.
    */
  def hashOrder(id: Column, salt: String): Column = {
    graft.expressions.Md5Hash60.registerActive()
    call_function(graft.expressions.Md5Hash60.fnName,
      concat(lit(salt), id.cast("string")))
  }

  /** Per-stratum 0-based sequence numbers in `idCol` order as a
    * DISTRIBUTED prefix-count — the ranking companion to
    * [[Pack.assignBins]]'s prefix-sum, same shard shape: rows shard
    * into contiguous id ranges (`idCol DIV shardSize`), local ranks
    * come from a per-(stratum, shard) window (parallelism =
    * #strata × #shards), and shard offsets from a small per-stratum
    * window over per-shard COUNTS (N/shardSize rows — the only place
    * a full ordering survives). Adds `rn`; bit-identical to
    * `row_number() OVER (PARTITION BY stratum ORDER BY id) - 1`.
    */
  def shardedRank(
      df: DataFrame,
      strataCol: String,
      idCol: String,
      shardSize: Long = 4096L): DataFrame = {
    require(shardSize >= 1, "shardSize >= 1")
    val d = df.withColumn("_shard", expr(s"$idCol DIV $shardSize"))
    val wIn = Window.partitionBy(strataCol, "_shard").orderBy(idCol)
      .rowsBetween(Window.unboundedPreceding, 0)
    val wSh = Window.partitionBy("_o_strata").orderBy("_o_shard")
      .rowsBetween(Window.unboundedPreceding, -1)
    val offsets = d.groupBy(strataCol, "_shard").agg(count(lit(1)).as("_shard_n"))
      .select(col(strataCol).as("_o_strata"), col("_shard").as("_o_shard"),
        col("_shard_n"))
      .withColumn("_off", coalesce(sum("_shard_n").over(wSh), lit(0L)))
    d.withColumn("_local_rn", count(lit(1)).over(wIn))
      .join(offsets,
        col(strataCol) === col("_o_strata") && col("_shard") === col("_o_shard"))
      .withColumn("rn", col("_local_rn") + col("_off") - 1)
      .drop("_shard", "_o_strata", "_o_shard", "_shard_n", "_local_rn", "_off")
  }

  /** Exactly min(n, |stratum|) rows per stratum, chosen by hash order —
    * the exact-count companion to rate-based downsampling (equal-size
    * eval slices, per-source audit samples). One shuffle on the stratum
    * key; the window is per-stratum, so parallelism = #strata and no
    * global ordering exists anywhere.
    *
    * Adds `h` (the hash key) and `rn` (1-based rank within the stratum).
    */
  def stratifiedTopN(
      df: DataFrame,
      strataCol: String,
      idCol: String,
      n: Int,
      salt: String = "strat"): DataFrame = {
    val w = Window.partitionBy(strataCol).orderBy("h", idCol)
    df.withColumn("h", hashOrder(col(idCol), salt))
      .withColumn("rn", row_number().over(w).cast("bigint"))
      .filter(col("rn") <= n)
  }

  /** Greedy per-stratum budget cap: rows are admitted in hash order
    * until the stratum's cumulative `weightCol` reaches `budget` — the
    * token-budget mixing step of a training-data pipeline ("up to 1M
    * tokens from each source, reproducibly"). A row is admitted iff the
    * cumulative weight BEFORE it is under budget, so the cap is overshot
    * by at most one row (the standard greedy knapsack cut). Per-stratum
    * window, no global ordering.
    *
    * Adds `h`, `cum_before` (exclusive prefix sum), keeps only admitted
    * rows.
    */
  def budgetCap(
      df: DataFrame,
      strataCol: String,
      idCol: String,
      weightCol: String,
      budget: Long,
      salt: String = "budget"): DataFrame = {
    val w = Window.partitionBy(strataCol).orderBy("h", idCol)
      .rowsBetween(Window.unboundedPreceding, -1)
    df.withColumn("h", hashOrder(col(idCol), salt))
      .withColumn("cum_before", coalesce(sum(col(weightCol)).over(w), lit(0L)))
      .filter(col("cum_before") < budget)
  }

  /** Deterministic weighted sampling without replacement (priority
    * sampling — Duffield/Lund/Thorup, JACM'07): each row draws a
    * uniform integer h ∈ [0, M) from its id hash and gets priority
    * w·S DIV (h+1); the k largest priorities are the sample, so heavier
    * rows win proportionally more draws. Selection is a pure function
    * of (id, salt) — stable across engines, retries and partitionings —
    * and the priority is EXACT scaled-reciprocal integer arithmetic
    * (never a float), so an oracle twin cannot diverge on a rounding
    * boundary.
    *
    * Plan shape: embarrassingly parallel scoring + global top-k, which
    * Spark executes as per-partition heaps merged on the driver
    * (TakeOrderedAndProject) — no global sort, no shuffle of the data.
    *
    * Adds `h` and `priority`.
    */
  def priorityWeighted(
      df: DataFrame,
      idCol: String,
      weightCol: String,
      k: Int,
      salt: String = "prio"): DataFrame =
    prioritized(df, idCol, weightCol, salt)
      .orderBy(desc("priority"), asc(idCol)).limit(k)

  /** The scoring half of [[priorityWeighted]] without the top-k cut —
    * adds `h` and `priority`. Shared with the streaming
    * [[graft.streaming.BottomKProcessor]] twin so the stream and the
    * batch sample score through the SAME expression and cannot drift.
    */
  def prioritized(
      df: DataFrame,
      idCol: String,
      weightCol: String,
      salt: String = "prio"): DataFrame =
    df.withColumn("h", hashOrder(col(idCol), salt) % PriorityModulus)
      .withColumn("priority",
        expr(s"CAST($weightCol AS BIGINT) * ${PriorityScale}L DIV (h + 1)"))

  /** Prime modulus of the uniform draw and the reciprocal scale —
    * shared with the emitted oracle twins. */
  val PriorityModulus: Long = 1000003L
  val PriorityScale: Long = 1000000000000L

  /** TEMPERATURE-based source mixing at α = 1/2 — the multilingual
    * data-mixing rule p_i ∝ n_i^α (Conneau &amp; Lample, XLM, NeurIPS'19;
    * Xue et al., mT5, NAACL'21 — α ∈ [0.2, 0.7] in practice) that
    * upsamples low-resource strata relative to proportional sampling.
    * α = 1/2 is the temperature whose weights are EXACT integers:
    * w_i = isqrt(n_i), computed as floor(sqrt) then corrected ±1 by
    * SQUARING (sqrt of a bigint-sized double is correctly rounded in
    * both engines, and the integer correction removes any boundary
    * doubt — no float ever reaches the output). The budget is
    * apportioned by CUMULATIVE QUOTAS: alloc_i = ⌊B·cum_i ⁄ T⌋ −
    * ⌊B·cum_{i−1} ⁄ T⌋ over the stratum-ordered cumulative weights —
    * telescopes to EXACTLY B, deterministic, one window over the
    * #strata-row aggregate (the sanctioned global-window-over-Aggregate
    * shape; nothing data-sized is ever globally ordered).
    *
    * Output: (`strataCol`, `n_rows`, `weight`, `alloc`). Feed `alloc`
    * into a per-stratum hash-order rank (e.g. [[stratifiedTopN]]'s
    * window) to materialize the actual sample.
    */
  def temperatureAlloc(df: DataFrame, strataCol: String, budget: Long): DataFrame = {
    require(budget >= 0)
    val counts = df.groupBy(strataCol).agg(count(lit(1)).as("n_rows"))
      .withColumn("_k0", expr("CAST(floor(sqrt(CAST(n_rows AS DOUBLE))) AS BIGINT)"))
      .withColumn("weight", expr(
        """CASE WHEN (_k0 + 1) * (_k0 + 1) <= n_rows THEN _k0 + 1
                WHEN _k0 * _k0 > n_rows THEN _k0 - 1 ELSE _k0 END"""))
      .drop("_k0")
    val wCum = Window.orderBy(col(strataCol).asc)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val withCum = counts.withColumn("cumw", sum("weight").over(wCum))
    val tot = counts.agg(sum("weight").as("tw"))
    withCum.crossJoin(broadcast(tot))
      .withColumn("alloc", expr(
        s"($budget * cumw) DIV tw - ($budget * (cumw - weight)) DIV tw"))
      .select(col(strataCol), col("n_rows"), col("weight"), col("alloc"))
  }

  /** SYSTEMATIC probability-proportional-to-size sampling (Madow 1949 —
    * the classical survey design; rand()-free variant with the
    * threshold grid anchored at T/n): row i is hit once for every
    * multiple of T/n its weight span (cum−w, cum] crosses —
    * n_hits = (cum·n) DIV T − ((cum−w)·n) DIV T, the same telescoping
    * floor-diff as [[temperatureAlloc]], so hits sum EXACTLY to n and
    * rows heavier than T/n surface with multiplicity (the PPS
    * certainty stratum). Inclusion is proportional to weight by
    * construction and a pure function of the sorted order — bit-stable
    * across engines, retries, partitionings.
    *
    * The row cumsum is [[Pack.assignBins]]'s DISTRIBUTED prefix-sum
    * (per-shard local windows + a shard-offset window over the
    * aggregate), never a data-sized global window.
    */
  def ppsSystematic(
      df: DataFrame,
      idCol: String,
      weightCol: String,
      n: Long,
      shardSize: Long = 4096L): DataFrame = {
    require(n >= 1, "n >= 1")
    val d = df.withColumn("_shard", expr(s"$idCol DIV $shardSize"))
    val wIn = Window.partitionBy("_shard").orderBy(idCol)
      .rowsBetween(Window.unboundedPreceding, 0)
    val wSh = Window.orderBy("_shard").rowsBetween(Window.unboundedPreceding, -1)
    val sh = d.groupBy("_shard").agg(sum(weightCol).as("_t"))
    val offsets = sh.withColumn("_off", coalesce(sum("_t").over(wSh), lit(0L)))
      .select(col("_shard").as("_o_shard"), col("_off"))
    val total = sh.agg(sum("_t").as("_tt"))
    d.withColumn("_lc", sum(col(weightCol)).over(wIn))
      .join(offsets, col("_shard") === col("_o_shard"))
      .crossJoin(broadcast(total))
      .withColumn("cum", expr("_lc + _off"))
      .withColumn("n_hits", expr(
        s"(cum * $n) DIV _tt - ((cum - $weightCol) * $n) DIV _tt"))
      .filter(col("n_hits") > 0)
      .drop("_shard", "_o_shard", "_lc", "_off", "_tt")
  }

  /** Feistel id-domain bits: positions live in [0, 2^(2·[[FeistelHalfBits]])). */
  val FeistelHalfBits = 20
  /** 2^[[FeistelHalfBits]] — the half-domain modulus. */
  val FeistelHalf: Long = 1L << FeistelHalfBits

  /** 3-round balanced Feistel network over the 2^40 id domain — the
    * DETERMINISTIC epoch-shuffle permutation (Black &amp; Rogaway,
    * "Ciphers with Arbitrary Finite Domains", CT-RSA 2002 — public; the
    * standard format-preserving-permutation construction): position =
    * feistel(doc_id, epoch) is a BIJECTION on [0, 2^40) for every epoch
    * key, so sorting (or range-sharding) by it is a reproducible
    * pseudo-random training order with ZERO shuffle — one codegen'd
    * integer expression per row, no sort-by-rand() (non-reproducible,
    * full exchange), no materialized permutation table (a second
    * 100-TB-scale dataset). The round function is a multiplicative hash
    * (Knuth 2654435761) keyed by round constant + epoch; any round
    * function yields a bijection — quality only affects dispersion,
    * which the query's shard-balance output measures in exact bp.
    *
    * Emitted as SQL TEXT in both dialects (`duck`: `xor()`/`//`; Spark:
    * `^`/`DIV`) so query and oracle interpolate the IDENTICAL
    * arithmetic — all intermediates positive and &lt; 2^52, exact in
    * BIGINT on both engines. Headroom: callers must gate ids into
    * [0, 2^40) loudly (ANSI would throw far later, at the cast).
    */
  def feistelPosSql(id: String, epoch: String, duck: Boolean): String = {
    val H = FeistelHalf
    def xor(a: String, b: String) = if (duck) s"xor($a, $b)" else s"($a ^ $b)"
    val div = if (duck) "//" else "DIV"
    def f(r: String, k: Long) =
      s"(((($r) * 2654435761 + ($epoch) * 7919 + $k) $div 64) % $H)"
    val l0 = s"(($id) $div $H)"
    val r0 = s"(($id) % $H)"
    val r1 = xor(l0, f(r0, 40503L)); val l1 = r0
    val r2 = xor(l1, f(r1, 52501L)); val l2 = r1
    val r3 = xor(l2, f(r2, 63809L)); val l3 = r2
    s"(($l3) * $H + ($r3))"
  }

  /** Driver Long twin of [[feistelPosSql]] — IDENTICAL arithmetic
    * (`DIV` ≡ Java `/` on the all-positive intermediates, `^` is XOR
    * in both). Consumed by the streaming resume-cursor twin
    * ([[graft.streaming.ResumeCursorProcessor]]); OpsSpec pins the SQL
    * against its own INDEPENDENT inline mirror of the network, so this
    * copy is covered transitively.
    */
  def feistelPos(id: Long, epoch: Long): Long = {
    val H = FeistelHalf
    def f(r: Long, k: Long) = ((r * 2654435761L + epoch * 7919L + k) / 64) % H
    val l0 = id / H; val r0 = id % H
    val r1 = l0 ^ f(r0, 40503L); val l1 = r0
    val r2 = l1 ^ f(r1, 52501L); val l2 = r1
    val r3 = l2 ^ f(r2, 63809L); val l3 = r2
    l3 * H + r3
  }

  /** Bucket width of the resume-cursor position census: 4096 buckets
    * over the 2^40 Feistel domain — ONE constant shared by
    * `pipeline_resume_cursor` and its streaming twin (the
    * shared-constant rule).
    */
  val CursorBucketWidth: Long = 1L << 28
}
