package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Deterministic streaming-sketch family — Count-Min, Bloom, HLL, KMV —
  * the cardinality/frequency/membership summaries a 100 TB pipeline ships
  * between stages instead of the data itself (pre-join pruning filters,
  * distinct-count monitoring, heavy-hitter alerts).
  *
  * Everything here is INTEGER-EXACT and seed-free: the only hash is the
  * md5-derived 60-bit bigint (`conv(substr(md5(x),1,15),16,10)`), shared
  * with the DuckDB oracle builders in [[graft.queries.Sketches]], so
  * every register, bit position, and fixed-point estimate is reproducible
  * cross-engine — unlike library sketches (Spark's HLL++, DataSketches)
  * whose internals differ per engine, these are bit-auditable.
  *
  * Scale shape: every sketch is one shuffle over (salt, bucket)-sized
  * keys — counters/registers/bit-sets are bounded by the sketch
  * parameters, never by data volume, which is the whole point.
  */
object Sketch {

  /** 60-bit md5 hash of `saltExpr || ':' || keyExpr` as a SQL string —
    * the native [[graft.expressions.Md5Hash60]] expression (one digest,
    * no hex-string round-trip), bit-identical to the
    * `conv(substr(md5(x),1,15),16,10)` chain it replaces. DuckDB twin:
    * `CAST('0x' || substr(md5(...),1,15) AS BIGINT)`. Registers the
    * function on the active/default sessions (the emitted fragment is
    * resolved at analysis time — same pattern as ops/Text.nfc).
    */
  def h60(saltExpr: String, keyExpr: String): String = {
    graft.expressions.Md5Hash60.registerActive()
    s"graft_h60(concat(CAST($saltExpr AS STRING), ':', $keyExpr))"
  }

  /** Word-packed per-file bloom primitives (the `layout_bloom_skip`
    * shape): positions in [0, words·63) — 63 usable bits per BIGINT
    * word because DuckDB range-checks a left shift into the sign bit.
    * Spark dialect (`conv`); the oracle mirrors with the '0x' cast.
    * Shared with [[graft.streaming.BloomManifestProcessor]] so the
    * stream and the batch manifest hash identically by construction.
    */
  def bloomPosSql(salt: String, key: String, words: Int): String =
    s"CAST(conv(substr(md5(concat('$salt', CAST($key AS STRING))), 1, 15), 16, 10) AS BIGINT) % ${words * 63}"

  /** The single-word contribution of one (salt, key) position to word
    * `w` — OR these per salt, then bit_or-aggregate per file.
    */
  def bloomWordSql(salt: String, key: String, w: Int, words: Int): String = {
    val p = bloomPosSql(salt, key, words)
    s"CASE WHEN $p DIV 63 = $w THEN CAST(1 AS BIGINT) << ($p % 63) ELSE CAST(0 AS BIGINT) END"
  }

  /** Count-Min counters for (key, n) rows pre-aggregated to exact
    * per-key counts: `depth` independent hash rows, `width` buckets.
    * Returns (j, bucket, c). Counter table size = depth×width, constant.
    */
  def cmsCounters(exact: DataFrame, keyCol: String, nCol: String,
      depth: Int, width: Int): DataFrame =
    exact.select(col(keyCol).as("key"), col(nCol).as("n"),
        explode(expr(s"sequence(0, ${depth - 1})")).as("j"))
      .withColumn("bucket", expr(s"${h60("j", "key")} % $width"))
      .groupBy("j", "bucket").agg(sum("n").as("c"))

  /** Point estimates: min over the depth counters each key hashes into.
    * Joins the (key,j,bucket) probe grid against the tiny counter table —
    * broadcast-able at any scale since counters are parameter-bounded.
    */
  def cmsEstimate(exact: DataFrame, keyCol: String, nCol: String,
      depth: Int, width: Int): DataFrame = {
    val probes = exact.select(col(keyCol).as("key"), col(nCol).as("n_exact"),
        explode(expr(s"sequence(0, ${depth - 1})")).as("j"))
      .withColumn("bucket", expr(s"${h60("j", "key")} % $width"))
    probes.join(cmsCounters(exact, keyCol, nCol, depth, width), Seq("j", "bucket"))
      .groupBy("key").agg(max("n_exact").as("n_exact"), min("c").as("n_est"))
  }

  /** Bloom bit-set of a key relation: `kh` hash positions per key in an
    * `m`-bit filter, relationally represented as the distinct set-bit
    * positions (bounded by m rows — at real scale this materializes to
    * an actual bitmap broadcast to the probe side).
    */
  def bloomBits(set: DataFrame, keyCol: String, m: Int, kh: Int): DataFrame =
    set.select(col(keyCol).as("key"),
        explode(expr(s"sequence(0, ${kh - 1})")).as("j"))
      .select(expr(s"${h60("j", "key")} % $m").as("pos"))
      .distinct()

  /** Probe a bloom bit-set: a key is `maybe`-present iff all `kh`
    * positions are set. No false negatives by construction. Left join
    * (not semi) so keys whose positions all miss still surface with
    * maybe=false — every probe key yields exactly one output row.
    */
  def bloomProbe(probes: DataFrame, keyCol: String, bits: DataFrame,
      m: Int, kh: Int): DataFrame =
    probes.select(col(keyCol).as("key"),
        explode(expr(s"sequence(0, ${kh - 1})")).as("j"))
      .withColumn("pos", expr(s"${h60("j", "key")} % $m"))
      .join(bits.withColumn("hit", lit(1)), Seq("pos"), "left")
      .groupBy("key").agg(count(col("hit")).as("hits"))
      .select(col("key"), (col("hits") === kh).as("maybe"))

  /** HLL registers over the DISTINCT keys of `df(keyCol)`: bucket =
    * h % m, rho = trailing-zeros(h DIV m) + 1 capped at `rhoCap` (the
    * cap bounds the fixed-point exponent so the estimate stays in
    * bigint range; rho &gt; 40 needs ~2^40 distinct per bucket to
    * matter). Returns the full 0..m-1 grid (empty buckets → reg 0).
    * Trailing zeros are computed on the binary STRING (bin + rtrim) —
    * bit-exact on both engines, no float log anywhere.
    */
  def hllRegisters(df: DataFrame, keyCol: String, m: Int, rhoCap: Int = 40): DataFrame = {
    val s = df.sparkSession
    val regs = df.select(expr(s"${h60("'h'", keyCol)}").as("h")).distinct()
      .withColumn("bucket", expr(s"h % $m"))
      .withColumn("w", expr(s"h DIV $m"))
      .withColumn("rho", expr(
        s"least(length(bin(w)) - length(rtrim('0', bin(w))) + 1, $rhoCap)"))
      .groupBy("bucket").agg(max("rho").as("reg"))
    s.range(m).select(col("id").as("bucket"))
      .join(regs, Seq("bucket"), "left")
      .na.fill(0L, Seq("reg"))
  }

  /** Raw HLL estimate in pure fixed-point integer math:
    * est = alpha_m · m² / Σ 2^-reg, with the harmonic sum scaled by 2^40
    * (exact: reg ≤ 40) and alpha as a /2048 rational. All products are
    * proven &lt; 2^63 for m ≤ 64. Returns one row:
    * (m, est_distinct, sum_scaled, nonzero_buckets).
    */
  def hllEstimate(registers: DataFrame, m: Int): DataFrame = {
    require(m <= 64, "fixed-point overflow bound proven for m <= 64")
    val alphaNum = math.round(0.7213 / (1.0 + 1.079 / m) * 2048) // /2048
    registers.agg(
        sum(expr("CAST(pow(2, 40 - reg) AS BIGINT)")).as("sum_scaled"),
        sum(when(col("reg") > 0, 1L).otherwise(0L)).as("nonzero_buckets"))
      .select(lit(m).as("m"),
        expr(s"($alphaNum * ${m.toLong * m} * 1099511627776) DIV (sum_scaled * 2048)")
          .as("est_distinct"),
        col("sum_scaled"), col("nonzero_buckets"))
  }

  /** KMV (k-minimum-values) distinct estimate per group: the k-th
    * smallest 60-bit hash h_k over the group's distinct keys gives
    * est = (k-1)·2^56 / (h_k DIV 16) — hashes are uniform on [0,2^60),
    * shifted down 4 bits so (k-1)·2^56 fits bigint. Groups with fewer
    * than k distinct keys are exact by construction (the sketch holds
    * everything). One shuffle on the group key; sketch size k per group.
    */
  def kmvEstimate(df: DataFrame, grpCol: String, keyCol: String, k: Int): DataFrame = {
    // k capped at 128: the estimate's numerator (k-1)·2^56 overflows
    // signed 64-bit from k = 129 — Spark would wrap silently while the
    // DuckDB twin errors (ADVICE r3)
    require(k >= 2 && k <= 128, "k in [2,128]")
    val hashed = df.select(col(grpCol).as("grp"),
        expr(s"${h60("'k'", keyCol)} DIV 16").as("h")).distinct()
    val maxH = 72057594037927936L // 2^56
    hashed.groupBy("grp").agg(
        count(lit(1)).as("n_exact"),
        expr(s"sort_array(collect_list(h))").as("hs"))
      .select(col("grp"), col("n_exact"),
        when(col("n_exact") < k, col("n_exact"))
          .otherwise(expr(s"(${(k - 1).toLong} * $maxH) DIV element_at(hs, $k)"))
          .cast("long").as("n_est"))
  }

  /** Per-partition SpaceSaving candidate summaries (Metwally, Agrawal,
    * El Abbadi, "Efficient computation of frequent and top-k elements
    * in data streams", ICDT'05 — public): each partition keeps at most
    * `capacity` counters over its local stream, replacing a
    * minimum-count entry (smallest key on ties) when a new key arrives
    * at a full table. Returns the DISTINCT union of the partitions'
    * surviving keys.
    *
    * Guarantee (averaging argument across partitions): a key whose
    * GLOBAL count exceeds N/capacity must exceed N_p/capacity in at
    * least one partition — SpaceSaving never evicts a key holding more
    * than that partition's per-slot average — so the union is a
    * SUPERSET of every true heavy hitter. Keys below the threshold may
    * or may not surface (eviction depends on row order); consumers must
    * confirm against exact counts ([[heavyHitters]]) before emitting.
    *
    * Scale shape: per-partition state is capacity-bounded (never
    * data-sized), the raw stream is never shuffled, and the candidate
    * union ships at most capacity × partitions keys.
    */
  def spaceSavingCandidates(df: DataFrame, keyCol: String, capacity: Int): DataFrame = {
    require(capacity >= 1, "capacity >= 1")
    val s = df.sparkSession
    import s.implicits._
    df.select(col(keyCol).cast("string")).na.drop().as[String]
      .mapPartitions { it =>
        val counts = scala.collection.mutable.HashMap.empty[String, Long]
        it.foreach { k =>
          counts.get(k) match {
            case Some(c) => counts.update(k, c + 1)
            case None if counts.size < capacity => counts.update(k, 1L)
            case None =>
              var mk: String = null
              var mc = Long.MaxValue
              counts.foreach { case (kk, cc) =>
                if (cc < mc || (cc == mc && (mk == null || kk < mk))) { mk = kk; mc = cc }
              }
              counts.remove(mk)
              counts.update(k, mc + 1)
          }
        }
        counts.keysIterator
      }.toDF("key").distinct()
  }

  /** Heavy hitters above the frequency threshold N/capacity, computed
    * as SpaceSaving candidates + an exact confirmation pass — the
    * candidate-then-confirm shape that makes an order-dependent sketch
    * DETERMINISTIC: every true heavy hitter is guaranteed a candidate
    * ([[spaceSavingCandidates]]), and only exact counts decide the
    * output, so partition-order jitter in the sub-threshold candidates
    * can never change a row. Two scans total: one un-shuffled summary
    * pass, one confirm pass whose aggregate is candidate-bounded (all
    * non-candidates collapse into a single null-key group — the
    * grouped state is sketch-sized, not key-domain-sized). When the
    * key domain is no larger than `capacity` the summary degrades to
    * exact and the output is simply every key above threshold.
    * Returns (key, n_exact, n_total, share_bp) for confirmed keys.
    */
  def heavyHitters(df: DataFrame, keyCol: String, capacity: Int): DataFrame = {
    val cands = spaceSavingCandidates(df, keyCol, capacity)
    val counts = df.select(col(keyCol).cast("string").as("key")).na.drop()
      .join(broadcast(cands.withColumn("hit", lit(true))), Seq("key"), "left")
      .groupBy(when(col("hit"), col("key")).as("ckey"))
      .agg(count(lit(1)).as("n"))
      .persist() // candidate-bounded: <= capacity x partitions + 1 rows
    val total = counts.agg(sum("n").as("n_total"))
    counts.filter(col("ckey").isNotNull)
      .select(col("ckey").as("key"), col("n").as("n_exact"))
      .crossJoin(broadcast(total))
      .filter(expr(s"n_exact * CAST($capacity AS BIGINT) > n_total"))
      .withColumn("share_bp", expr("n_exact * 10000 DIV n_total"))
  }

  /** AMS tug-of-war counters for F2, the second frequency moment
    * (Alon, Matias & Szegedy, "The space complexity of approximating
    * the frequency moments", STOC'96 — public): `k` independent ±1
    * sign hashes (parity bit of the j-salted 60-bit md5 hash), each
    * counter c_j = Σ_key sign_j(key)·n(key). E[c_j²] = F2 and the
    * estimator is the mean of the k squares. Built from EXACT per-key
    * counts (one partial-agg shuffle over the raw rows), so the k-way
    * fan-out is over the bounded KEY set, never the row stream; the
    * counter state is k bigints no matter the data volume — the
    * mergeable-summary property that matters at 100 TB (per-shard
    * counters ADD). Deterministic hash ⇒ the estimate itself is
    * bit-reproducible cross-engine. Returns (j, c).
    */
  def amsCounters(exact: DataFrame, keyCol: String, nCol: String, k: Int): DataFrame = {
    require(k >= 1 && k <= 512, "k in [1,512]")
    val s = exact.sparkSession
    exact
      .crossJoin(broadcast(s.range(k).select(col("id").as("j"))))
      .select(col("j"), expr(
        s"CASE WHEN ${h60("CAST(j AS STRING)", keyCol)} % 2 = 0 THEN $nCol ELSE -$nCol END").as("v"))
      .groupBy("j").agg(sum("v").as("c"))
  }

  /** KMV multiset operations (Beyer et al., "On synopses for
    * distinct-value estimation under multiset operations", SIGMOD'07 —
    * public): from the two sides' k-minimum-value sketches alone,
    * estimate |A|, |B|, |A∪B| and |A∩B|. The union sketch is the k
    * smallest of the merged hash sets (exactly how KMV merges across
    * partitions/stages); ρ = |union-sketch ∩ A-sketch ∩ B-sketch| / k
    * estimates Jaccard, and |A∩B| ≈ ρ·|A∪B|. Everything integer (one
    * truncating division per estimate) — bit-reproducible cross-engine.
    *
    * Input: two key relations. Output: ONE row — the sketch-sized
    * summary two 100 TB scans ship to a coordinator instead of their
    * key sets. Each side is one distinct + top-k; sketch joins are
    * k-row joins.
    */
  def kmvSetOps(a: DataFrame, b: DataFrame, keyCol: String, k: Int): DataFrame = {
    // same 64-bit bound as kmvEstimate: (k-1)·2^56 must stay signed-safe
    require(k >= 2 && k <= 128, "k in [2,128]")
    val maxH = 72057594037927936L // 2^56
    def sketch(df: DataFrame): DataFrame =
      df.select(expr(s"${h60("'k'", keyCol)} DIV 16").as("h")).distinct()
        .orderBy("h").limit(k)
    val sa = sketch(a).persist()
    val sb = sketch(b).persist()
    // three consumers (match semi-joins, k_used, est) — persist the
    // k-row merged sketch like sa/sb (r13)
    val merged = sa.union(sb).distinct().orderBy("h").limit(k).persist()
    def est(s: DataFrame): DataFrame = s.agg(
      count(lit(1)).as("n"), sort_array(collect_list(col("h"))).as("hs"))
      .select(when(col("n") < k, col("n"))
        .otherwise(expr(s"(${(k - 1).toLong} * $maxH) DIV element_at(hs, $k)"))
        .cast("long").as("est"))
    val inBoth = merged
      .join(sa, Seq("h"), "left_semi").join(sb, Seq("h"), "left_semi")
      .agg(count(lit(1)).as("matches"))
    val kUsed = merged.agg(count(lit(1)).as("k_used"))
    val out = est(sa).withColumnRenamed("est", "est_a")
      .crossJoin(est(sb).withColumnRenamed("est", "est_b"))
      .crossJoin(est(merged).withColumnRenamed("est", "est_union"))
      .crossJoin(inBoth).crossJoin(kUsed)
      .select(lit(k.toLong).as("k"), col("k_used"), col("est_a"), col("est_b"),
        col("est_union"), col("matches"),
        expr("matches * est_union DIV k_used").as("est_inter"),
        expr("matches * 10000 DIV k_used").as("jacc_bp"))
    out
  }

  /** HDR-histogram bucket lower bound for a non-negative bigint `v` &lt;
    * 2^`maxBits` (Tene's HdrHistogram / DDSketch's fixed-grid cousin —
    * public): values below 2^(`subBits`+1) map to themselves (exact —
    * including 0, which is its own bucket);
    * above, the top `subBits`+1 significant bits are kept, i.e.
    * lb = (v DIV p)·p with p = 2^(floor(log₂ v) − subBits) — relative
    * error &lt; 2^−subBits, bucket count ≤ (maxBits − subBits)·2^subBits
    * + 2^(subBits+1): PARAMETER-bounded, never data-bounded, and
    * buckets MERGE by summing counts (the property that lets a 1000-
    * executor scan ship per-partition histograms instead of values).
    *
    * Emitted as one CASE chain picking p by value range + one truncating
    * divide — pure integer comparisons, codegen'd by Spark, and the
    * IDENTICAL text (modulo `div` = `DIV`/`//`) runs in DuckDB: no
    * float log₂ to disagree at power-of-two boundaries. Negative or
    * overflowing v raises loudly on the Spark side (`guard` = true);
    * the DuckDB twin passes guard = false — its `raise_error` is spelled
    * differently and the oracle only ever sees data the Spark run
    * already gated (the [[holtGuardSql]] precedent).
    */
  def hdrBucketSql(div: String, v: String, subBits: Int = 5,
      maxBits: Int = 21, guard: Boolean = true): String = {
    require(subBits >= 1 && maxBits > subBits + 1 && maxBits < 62)
    val cut = 1L << (subBits + 1)
    val branches = ((maxBits - 1) to (subBits + 1) by -1).map { b =>
      s"WHEN $v >= ${1L << b} THEN ${1L << (b - subBits)}"
    }
    val p = s"(CASE ${branches.mkString(" ")} ELSE 1 END)"
    val guardBranch = if (guard)
      s"""WHEN $v < 0 OR $v >= ${1L << maxBits}
        THEN CAST(raise_error(concat('hdr bucket domain: v must be in [0, 2^$maxBits), got ',
          CAST($v AS STRING))) AS BIGINT)""" else ""
    s"""(CASE $guardBranch
      WHEN $v < $cut THEN $v
      ELSE ($v $div $p) * $p END)"""
  }
}
