package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Dev-only: A/B probe for the BPE trainer's corpus representation
  * (ROADMAP/r4-verdict item). Variant A is the shipped framed-STRING
  * pipeline (ops/Text.bpeTrain): each round splits every sequence for
  * pair counts and rewrites it with one codegen'd `replace`. Variant B
  * carries the corpus as token ARRAYS across rounds: pair counts skip
  * the split, but the merge rewrite becomes an `aggregate` fold with a
  * carry slot (identical non-overlap semantics to `replace` — a merge
  * consumes its left token, so a merged pair can't chain into the next
  * match) — and HOF lambdas run INTERPRETED (the round-4 gram-index
  * finding), so the fold trades a codegen string scan for an
  * interpreted per-token loop.
  *
  * MEASURED at sf0.1 / local[32] (4 rounds, two sessions, round 5):
  * warm/best-of-2 strings 3.6-3.7 s vs arrays 5.0-5.3 s — the
  * interpreted fold costs more than the re-split saves, so variant A
  * stays shipped. COLD first-run inverts (strings 16-22 s vs arrays
  * 6-7 s): the 4-round nested-replace plan pays a large whole-stage-
  * codegen COMPILE tax that the interpreted fold never does — it
  * amortizes across reps/rounds, which is why the steady-state (what a
  * ~30k-round production trainer sees) favors strings. Both variants
  * produce IDENTICAL symbol counts (269303 at sf0.1 — the fold's
  * carry-slot semantics match `replace` exactly). Re-run this probe if
  * Spark ever codegens higher-order functions.
  *
  * ROUND 8: bpeTrain was re-architected driver-coordinated — each
  * round collects its 1-row winning merge and rebuilds the next round
  * as base-scan + accumulated LITERAL replaces in one collapsed
  * projection (no per-round persist/crossJoin chain, so the cold
  * compile tax above is gone by construction; variant A below now
  * measures the shipped trainer). MEASURED at sf0.1 / local[32]:
  * bpe_encode 10.0 s -> 2.06 s, bpe_pair_stats 2.63 s -> 1.46 s
  * (min-of-4 reps, noise ratio 1.77), both still bit-exact vs the
  * unchanged DuckDB oracles.
  */
object DevBpe {

  /** ROUND 12 — merge-DEPTH turnover sweep (r11 verdict task #3).
    *
    * A FULL training ladder is the wrong instrument: every round pays a
    * fixed ~2 s job + fresh-codegen tax regardless of depth (the first
    * probe measured 146 s for 64 chained merges on a 10k-row corpus —
    * per-round overhead, not depth cost), so a 1024-round training
    * measures scheduler throughput, not the chain.  Instead this probes
    * the DEPTH COST directly: a depth-k accumulated-replace projection
    * (k non-matching literal replaces — `replace` still scans the
    * string, corpus stays constant, so rung k isolates plan-structure
    * cost at fixed data) is timed COLD (includes analysis + codegen
    * compile of the k-deep chain) and WARM (same DF object — compiled
    * code cached; the steady-state a production trainer sees, since
    * round r+1's plan differs from round r's only by one replace).
    * Training round r evaluates exactly such a depth-r chain once, so
    * chained-training total = Σ_r cost(r) — integrate the curve;
    * rematEvery=R caps every round at depth ≤ R.  A real-training
    * equality check at modest depth rides in SeriesOpsSpec (remat
    * bit-equality) and the historical 64-merge numbers below.
    *
    * MEASURED (round 12, local[32], 10k×32 hex corpus):
    *   k=16..256: cold 0.37–0.63 s, warm 0.25–0.37 s, fresh-plan
    *   0.23–0.32 s — depth cost nearly flat; the scan term dominates.
    *   k=512: driver StackOverflowError inside StringReplace.doGenCode
    *   (codegen recurses the 512-deep expression spine) — a HARD CLIFF.
    * Hence ops/Text.MaxChainedMerges = 256 and the loud up-front guard:
    * the failure mode past the bound is a crash (and it would fire at
    * plan-compile time AFTER the full training spend), not a slowdown.
    */
  def runSweep(spark: SparkSession): Unit = {
    def corpus(): DataFrame = {
      val d = spark.range(10000).select(
        concat(lit(" "), array_join(
          regexp_extract_all(md5(col("id").cast("string")), lit("[0-9a-f]"), lit(0)),
          "  "), lit(" ")).as("seq"))
        .repartition(32).persist()
      d.count(); d
    }
    val base = corpus()
    for (k <- Seq(16, 64, 128, 256, 512, 1024, 2048)) {
      // non-matching framed literals: full scan per replace, zero rewrites
      val deep = (1 to k).foldLeft(base) { (df, i) =>
        df.withColumn("seq", org.apache.spark.sql.functions.replace(
          col("seq"), lit(s" zz$i  qq$i "), lit(s" zz${i}qq$i ")))
      }
      val probe = deep.agg(sum(length(col("seq"))))
      val t0 = System.nanoTime()
      val n0 = probe.head.getLong(0)
      val cold = (System.nanoTime() - t0) / 1e9
      val t1 = System.nanoTime()
      val n1 = probe.head.getLong(0)
      val warm = (System.nanoTime() - t1) / 1e9
      // a fresh but identical DF: codegen source identical -> compile
      // cache hit, but analysis/optimization re-run (the per-round cost
      // a trainer actually pays on its NEW plan each round)
      val deep2 = (1 to k).foldLeft(base) { (df, i) =>
        df.withColumn("seq", org.apache.spark.sql.functions.replace(
          col("seq"), lit(s" zz$i  qq$i "), lit(s" zz${i}qq$i ")))
      }
      val t2 = System.nanoTime()
      val n2 = deep2.agg(sum(length(col("seq")))).head.getLong(0)
      val fresh = (System.nanoTime() - t2) / 1e9
      println(f"[devbpe-depth] k=$k%4d cold=$cold%7.2f s warm=$warm%6.2f s " +
        f"fresh-plan=$fresh%7.2f s (sum=$n0 $n1 $n2)")
      require(n0 == n1 && n1 == n2)
    }
    spark.sparkContext.getPersistentRDDs.values.foreach(_.unpersist(blocking = true))
  }

  /** End-to-end proof past the old cliff: train 512 REAL merges (2× the
    * chained-form crash depth) with rematEvery=64 on the hex corpus —
    * must adopt all 512 rules and finish without the k=512 codegen
    * StackOverflow, with per-64-round wall printed to show the remat
    * keeps round cost flat (the chained form's cost would compound and
    * then crash at round ~512).
    */
  def runDeepTrain(spark: SparkSession): Unit = {
    val d = spark.range(10000).select(
      concat(lit(" "), array_join(
        regexp_extract_all(md5(col("id").cast("string")), lit("[0-9a-f]"), lit(0)),
        "  "), lit(" ")).as("seq"))
      .repartition(32)
    var done = 0
    val t0 = System.nanoTime()
    // train in 8 chunks of 64 so the wall clock per depth-band is visible;
    // each chunk re-trains from scratch WOULD be O(n²) — instead run the
    // single 512-round training and time it whole, plus a 64-round
    // reference for the per-round baseline
    val tRef0 = System.nanoTime()
    val (m64, _) = graft.ops.Text.bpeTrain(d, "seq", 64, rematEvery = 64)
    val ref = (System.nanoTime() - tRef0) / 1e9
    println(f"[devbpe-deep] 64 merges (remat64): ${ref}%.1f s (${ref / 64}%.2f s/round)")
    spark.sparkContext.getPersistentRDDs.values.foreach(_.unpersist(true))
    val t1 = System.nanoTime()
    val (m512, enc) = graft.ops.Text.bpeTrain(d, "seq", 512, rematEvery = 64)
    val full = (System.nanoTime() - t1) / 1e9
    done = m512.count().toInt
    val syms = enc.agg(sum(expr(
      "CASE WHEN length(trim(seq)) = 0 THEN 0 ELSE size(split(trim(seq), '  ')) END")))
      .head.getLong(0)
    println(f"[devbpe-deep] 512 merges (remat64): adopted=$done full=${full}%.1f s " +
      f"(${full / done}%.2f s/round vs ${ref / 64}%.2f baseline) final_syms=$syms")
    val prefixEq = m512.orderBy("round").limit(64).collect().map(_.toSeq).toSeq ==
      m64.orderBy("round").collect().map(_.toSeq).toSeq
    println(s"[devbpe-deep] first-64 merge prefix identical to the 64-round run: $prefixEq")
    require(done == 512, s"expected 512 adopted merges, got $done")
  }

  /** r12 verdict task #5: the production-depth rung — 4096 REAL merges
    * end-to-end (today's evidence stopped at 512), with per-256-round
    * band timing (the flat-cost certificate must hold across the whole
    * run, not just in aggregate) and checkpoint storage telemetry (the
    * localCheckpoint blocks are the only state that could grow with
    * depth). Two corpora:
    *  - sf0.01 documents: the REAL corpus — its 31-word vocabulary
    *    exhausts adoptable merges early, certifying graceful
    *    exhaustion at depth (the trainer stops, never crashes);
    *  - the md5-hex synthetic probe (non-exhausting): the actual
    *    4096-merge depth ladder.
    */
  def runDeepTrain4k(spark: SparkSession): Unit = {
    // (a) real corpus: requested depth far past the vocabulary's
    // adoptable-merge supply — certifies the exhaustion path
    val real = Tables.t(spark, "/root/testdata/sf0.01", "documents")
      .select(graft.ops.Text.bpeInitSeq(col("text")).as("seq")).repartition(32)
    val tR = System.nanoTime()
    val (mR, _) = graft.ops.Text.bpeTrain(real, "seq", 4096, rematEvery = 128)
    val nR = mR.count()
    println(f"[devbpe-4k] sf0.01 corpus: adopted=$nR%d of 4096 requested " +
      f"(vocabulary exhausted, graceful stop) in ${(System.nanoTime() - tR) / 1e9}%.1f s")
    spark.sparkContext.getPersistentRDDs.values.foreach(_.unpersist(true))
    System.gc()
    // (b) synthetic probe: 4096 real merges, banded flat-cost evidence
    val d = spark.range(10000).select(
      concat(lit(" "), array_join(
        regexp_extract_all(md5(col("id").cast("string")), lit("[0-9a-f]"), lit(0)),
        "  "), lit(" ")).as("seq"))
      .repartition(32)
    val band = 256
    var bandStart = System.nanoTime()
    val t0 = System.nanoTime()
    val onRound: Int => Unit = r =>
      if (r % band == 0) {
        val dt = (System.nanoTime() - bandStart) / 1e9
        val st = spark.sparkContext.getRDDStorageInfo
        val mem = st.map(_.memSize).sum / (1 << 20)
        val dsk = st.map(_.diskSize).sum / (1 << 20)
        println(f"[devbpe-4k] rounds ${r - band + 1}%4d-$r%4d: ${dt}%6.1f s " +
          f"(${dt / band}%.3f s/round) ckpt_blocks=${st.length}%2d " +
          f"ckpt_mem=${mem}%4d MiB ckpt_disk=${dsk}%4d MiB")
        bandStart = System.nanoTime()
      }
    val (m4k, enc) = graft.ops.Text.bpeTrain(d, "seq", 4096, rematEvery = 128,
      onRound = onRound)
    val full = (System.nanoTime() - t0) / 1e9
    val done = m4k.count().toInt
    val syms = enc.agg(sum(expr(
      "CASE WHEN length(trim(seq)) = 0 THEN 0 ELSE size(split(trim(seq), '  ')) END")))
      .head.getLong(0)
    println(f"[devbpe-4k] 4096 merges (remat128): adopted=$done full=${full}%.1f s " +
      f"(${full / done}%.3f s/round) final_syms=$syms")
    require(done == 4096, s"expected 4096 adopted merges, got $done")
  }

  def main(args: Array[String]): Unit = {
    if (args.contains("deeptrain4k")) {
      val spark = SparkSession.builder().master("local[32]")
        .config("spark.sql.shuffle.partitions", "32")
        .config("spark.ui.enabled", "false").getOrCreate()
      spark.sparkContext.setLogLevel("ERROR")
      runDeepTrain4k(spark)
      spark.stop()
      return
    }
    if (args.contains("deeptrain")) {
      val spark = SparkSession.builder().master("local[32]")
        .config("spark.sql.shuffle.partitions", "32")
        .config("spark.ui.enabled", "false").getOrCreate()
      spark.sparkContext.setLogLevel("ERROR")
      runDeepTrain(spark)
      spark.stop()
      return
    }
    if (args.contains("sweep")) {
      val spark = SparkSession.builder().master("local[32]")
        .config("spark.sql.shuffle.partitions", "32")
        .config("spark.ui.enabled", "false").getOrCreate()
      spark.sparkContext.setLogLevel("ERROR")
      runSweep(spark)
      spark.stop()
      return
    }
    val dir = if (args.nonEmpty) args(0) else "/root/testdata/sf0.1"
    val rounds = 4
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    def time[T](label: String)(f: => T): T = {
      val t0 = System.nanoTime(); val r = f
      println(f"[devbpe] $label: ${(System.nanoTime() - t0) / 1e9}%.2f s"); r
    }

    // ---- variant A: the shipped framed-string trainer ----
    def runStrings(): Long = {
      val d = Tables.t(spark, dir, "documents")
        .select(col("source"), graft.ops.Text.bpeInitSeq(col("text")).as("seq"))
      val (_, enc) = graft.ops.Text.bpeTrain(d, "seq", rounds)
      val n = enc.agg(sum(expr(
        "CASE WHEN length(trim(seq)) = 0 THEN 0 ELSE size(split(trim(seq), '  ')) END")))
        .head.getLong(0)
      spark.catalog.clearCache()
      n
    }

    // ---- variant B: token arrays carried across rounds ----
    def pairCountsArr(seqs: DataFrame): DataFrame =
      seqs.filter(size(col("toks")) >= 2)
        .select(explode(zip_with(
          expr("slice(toks, 1, size(toks) - 1)"), expr("slice(toks, 2, size(toks) - 1)"),
          (a, b) => struct(a.as("w1"), b.as("w2")))).as("p"))
        .groupBy(col("p.w1").as("w1"), col("p.w2").as("w2"))
        .agg(count(lit(1)).as("cnt"))
    def applyMergeArr(seqs: DataFrame, rule: DataFrame): DataFrame =
      seqs.crossJoin(broadcast(rule.select(col("w1").as("_mw1"), col("w2").as("_mw2"))))
        // left fold with a carry slot: prev == w1 and x == w2 merges and
        // clears the carry (non-overlapping, left-to-right — the exact
        // `replace` semantics on framed strings); the finisher flushes
        // the last carried token
        .withColumn("toks", expr(
          """aggregate(toks,
               named_struct('out', CAST(array() AS ARRAY<STRING>), 'prev', CAST(NULL AS STRING)),
               (acc, x) -> CASE
                 WHEN acc.prev = _mw1 AND x = _mw2 THEN
                   named_struct('out', array_append(acc.out, _mw1 || _mw2),
                                'prev', CAST(NULL AS STRING))
                 WHEN acc.prev IS NULL THEN named_struct('out', acc.out, 'prev', x)
                 ELSE named_struct('out', array_append(acc.out, acc.prev), 'prev', x) END,
               acc -> CASE WHEN acc.prev IS NULL THEN acc.out
                           ELSE array_append(acc.out, acc.prev) END)"""))
        .drop("_mw1", "_mw2")
    def runArrays(): Long = {
      var cur = Tables.t(spark, dir, "documents")
        .select(col("source"), regexp_extract_all(lower(col("text")),
          lit("[a-z]+|[0-9]+|[^a-z0-9\\s]"), lit(0)).as("toks"))
        .persist()
      for (_ <- 1 to rounds) {
        val rule = pairCountsArr(cur).orderBy(desc("cnt"), asc("w1"), asc("w2")).limit(1)
        cur = applyMergeArr(cur, rule).persist()
      }
      val n = cur.agg(sum(size(col("toks")))).head.getLong(0)
      spark.catalog.clearCache()
      n
    }

    var na = 0L; var nb = 0L
    for (rep <- 1 to 2) {
      na = time(s"strings (shipped) rep$rep")(runStrings())
      nb = time(s"arrays rep$rep")(runArrays())
    }
    println(s"[devbpe] final symbol counts: strings=$na arrays=$nb " +
      (if (na == nb) "(MATCH)" else "(MISMATCH — semantics bug!)"))
    spark.stop()
  }
}
