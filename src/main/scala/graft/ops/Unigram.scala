package graft.ops

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** SentencePiece-style UNIGRAM-LM tokenizer trainer (Kudo 2018,
  * arXiv:1804.10959) — the second tokenizer-training family beside
  * [[Text.bpeTrain]], re-expressed in the house disciplines:
  *
  *  - **Cap-free distributed E-step** (round 12; r11 verdict task #1):
  *    training reads ONE corpus-sized word-count aggregate — with NO
  *    head-cap (the former top-1024 cap hid 70% of token mass at the
  *    ×128 rung) — and each EM round's per-word Viterbi expectation
  *    runs as a vocabulary-sized DataFrame job ([[pathUsage]]: the
  *    encode DP's unrolled codegen'd projections plus an unrolled
  *    backtrack emitting the best-path pieces). Only piece-set-bounded
  *    decisions (seed selection, prune, renorm) touch the driver, so
  *    driver state never grows past |charset| + `SeedMulti` rows at
  *    ANY corpus size. Vocabularies under [[DriverStatsCutoff]] take
  *    the bit-identical counted-small driver path ([[trainFromStats]],
  *    the bpeTrain pattern) — a performance dispatch, not a cap.
  *  - **Fixed-point E-step** (the quantized-econometrics discipline):
  *    piece costs are −log₂ P(piece) in `FracBits`-bit fixed point,
  *    computed by the exact integer shift-and-square algorithm
  *    ([[log2Fix]]) — bit-identical on the driver, in Spark SQL, and
  *    in the DuckDB oracle's unrolled 16-stage square chain, so zero
  *    float divergence is possible anywhere in the loop.
  *  - **Hard (Viterbi) EM**: the E-step segments each word by min-cost
  *    dynamic programming with the deterministic (cost, start-pos)
  *    tie-break; the M-step recounts piece usages along those best
  *    paths and prunes to `KeepMulti` multi-char pieces (single chars
  *    are never pruned — the coverage guarantee every unigram trainer
  *    keeps). Hard EM instead of full lattice EM keeps every quantity
  *    an exact integer; the prune criterion (usage mass) is the same
  *    order full EM's expected counts converge to on this corpus.
  *
  * ENCODE (the fertility query) is fully distributed: distinct words
  * (one map-side-combining aggregate) run the SAME DP as a 12-position
  * unrolled chain of codegen'd projections with the trained vocab as a
  * literal map — zero joins, zero windows in the per-word path — and
  * broadcast the per-word piece count back onto the corpus-sized
  * (lang, source, word) relation. Out-of-vocab single chars cost
  * [[UnkCost]] so every word stays encodable (char fallback).
  *
  * The DuckDB oracle replays the ENTIRE pipeline as an unrolled
  * MATERIALIZED-CTE chain ([[emOracleCtes]]): seed → R×(cost chain +
  * relational DP with arg_min backtrack-by-path + usage recount +
  * prune) → final costs → encode DP — the same shape as the pagerank /
  * NSW / BPE oracle chains, with every multiply-referenced CTE
  * MATERIALIZED per the house inlining rule.
  */
object Unigram {

  val MaxPiece = 4 // max piece length considered (seed + DP lookback)
  val SeedMulti = 40 // seed-inventory FLOOR: min multi-char candidates kept

  /** Seed-inventory scaling (r12 verdict task #4): the former fixed
    * SeedMulti=40 head was the trainer family's last stats bound — at
    * the ×128 rung it captured 5% of multi-gram mass (the coverage
    * row's self-report). The inventory now scales with the vocabulary:
    * K = min(max([[SeedMulti]], [[SeedTypesMult]]·types), [[SeedAbsCap]])
    * where types = distinct training words. The absolute cap mirrors
    * SentencePiece's own bounded seed inventory (Kudo 2018 trains from
    * a size-capped seed set) and keeps the driver-held round-1 piece
    * table broadcastable; the coverage census reports the actual K so
    * a corpus that saturates it says so in a dashboard.
    */
  val SeedTypesMult = 8L
  val SeedAbsCap = 1L << 20

  def seedK(types: Long): Long =
    math.min(math.max(SeedMulti.toLong, SeedTypesMult * types), SeedAbsCap)

  /** The [[seedK]] formula as SQL over a types-count expression —
    * least/greatest parse identically in Spark and DuckDB.
    */
  def seedKSql(typesExpr: String): String =
    s"least(greatest($SeedMulti, $SeedTypesMult * ($typesExpr)), $SeedAbsCap)"

  /** Round-1 cost-table dispatch bound: piece sets at or under this
    * size ride as a LITERAL map into the DP projections (zero joins);
    * larger seed inventories build a per-word cost map via a candidate
    * explode + broadcast piece-table join ([[pathUsage]]) — same
    * `try_element_at(vm, …)` semantics, map column instead of map
    * literal. A PERFORMANCE dispatch, not a cap (both paths pinned
    * bit-identical in UnigramSpec).
    */
  val LiteralVocabCutoff = 1024
  /** Counted-small fast-path bound: word-stat tables at or under this
    * many DISTINCT words are collected and EM'd on the driver
    * ([[trainFromStats]]); larger vocabularies run the DISTRIBUTED
    * E-step ([[trainDistributed]]). A PERFORMANCE cutoff only — both
    * paths are bit-identical (pinned in UnigramSpec), unlike the
    * former top-1024 stats CAP this replaces, which silently dropped
    * the tail's token mass (the ×128 coverage ladder measured 70%
    * hidden; r11 verdict task #1).
    */
  val DriverStatsCutoff = 65536L
  val KeepMulti = 24 // per-round prune survivor count (multi-char)
  val Rounds = 3 // EM rounds
  val FracBits = 16 // fixed-point fractional bits of the log2 costs
  val UnkCost: Long = 60L << FracBits // out-of-vocab single-char cost
  val DpUnroll = 12 // DP position unroll bound (corpus max word len 8)

  final case class Piece(piece: String, isChar: Boolean, usage: Long, cost: Long)

  /** UTF-8 byte-order string comparison — the collation Spark's
    * UTF8String binary ordering AND DuckDB's default varchar sort use.
    * Every driver-side tie-break in this trainer (and its streaming
    * twin) goes through this, NOT Scala's UTF-16 code-unit `compareTo`,
    * so tied counts at a selection boundary pick the SAME word on the
    * driver, in Spark SQL, and in the DuckDB oracle even for
    * supplementary-plane characters.
    */
  def utf8Compare(a: String, b: String): Int = {
    val x = a.getBytes(java.nio.charset.StandardCharsets.UTF_8)
    val y = b.getBytes(java.nio.charset.StandardCharsets.UTF_8)
    val n = math.min(x.length, y.length)
    var i = 0
    while (i < n) {
      val c = (x(i) & 0xff) - (y(i) & 0xff)
      if (c != 0) return c
      i += 1
    }
    x.length - y.length
  }

  val utf8Ordering: Ordering[String] =
    new Ordering[String] { def compare(a: String, b: String): Int = utf8Compare(a, b) }

  /** (usage DESC, piece UTF-8) — the total selection order every
    * driver-side top-K in this trainer (seeds, prune survivors, the
    * coverage census) shares with its Spark `orderBy(desc, asc)` /
    * DuckDB `ORDER BY ... DESC, ...` twins.
    */
  val byUsageDescPiece: Ordering[(String, Long)] =
    Ordering.by[(String, Long), Long](-_._2)
      .orElse(Ordering.by[(String, Long), String](_._1)(utf8Ordering))

  /** Code-point segmentation of a word — the position space Spark's
    * `substr`/`length` (UTF8String.numChars) and DuckDB's varchar
    * functions index: code POINTS, not UTF-16 code units. Every
    * driver-side DP index, substring enumeration, and length guard in
    * this trainer walks these, so the driver twin is bit-identical to
    * the SQL twins even for supplementary-plane words (a 7-character
    * supplementary word is 14 Scala code units but 7 positions in both
    * engines — the r11 ADVICE parity gap, closed at the root).
    */
  def codePoints(w: String): Array[String] = {
    val b = Array.newBuilder[String]
    var i = 0
    while (i < w.length) {
      val n = Character.charCount(w.codePointAt(i))
      b += w.substring(i, i + n)
      i += n
    }
    b.result()
  }

  /** Code-point length — what SQL `length()` returns in both engines. */
  def cpLen(w: String): Int = w.codePointCount(0, w.length)

  /** Exact integer log₂(n/d) in [[FracBits]]-bit fixed point, n ≥ d > 0:
    * integer part k from the quotient's bit length, mantissa in [1,2)
    * as a truncating `FracBits`-bit ratio, fractional bits by the
    * classic shift-and-square walk. Every step is truncating integer
    * arithmetic (DIV ≡ Java / ≡ DuckDB // on positives), so the SQL
    * twin ([[costChainCtes]]) reproduces it bit-for-bit. The 2^44 gate
    * keeps `n << FracBits` inside BIGINT with headroom; corpora whose
    * word-instance counts exceed it must pre-scale the stats (loud
    * failure, never silent wrap — ANSI would throw anyway).
    */
  def log2Fix(n: Long, d: Long): Long = {
    require(d > 0 && n >= d, s"log2Fix domain: n=$n d=$d")
    require(n < (1L << 44),
      "unigram: word-stat mass exceeds the 2^44 fixed-point headroom — pre-scale counts")
    val q = n / d
    var k = 0
    while ((q >> (k + 1)) != 0) k += 1
    var m = (n << FracBits) / (d << k) // in [2^F, 2^(F+1))
    var frac = 0L
    var t = 1
    while (t <= FracBits) {
      m = (m * m) >> FracBits
      if (m >= (2L << FracBits)) { frac |= 1L << (FracBits - t); m >>= 1 }
      t += 1
    }
    (k.toLong << FracBits) + frac
  }

  /** Min-cost segmentation of `w` under `cost`, with the deterministic
    * tie-break the packed-state DP uses everywhere: smaller total cost,
    * then smaller start position of the last piece (strict `<` over
    * ascending j keeps the first winner). Out-of-vocab single chars
    * cost [[UnkCost]]; longer out-of-vocab substrings are infeasible.
    * Positions are CODE POINTS ([[codePoints]]) — the SQL twins' index
    * space.
    */
  def viterbi(w: String, cost: Map[String, Long]): List[String] = {
    val cp = codePoints(w)
    val n = cp.length
    val Inf = Long.MaxValue / 4
    val best = Array.fill(n + 1)(Inf)
    val bj = Array.fill(n + 1)(-1)
    best(0) = 0L
    var i = 1
    while (i <= n) {
      var j = math.max(0, i - MaxPiece)
      while (j < i) {
        val c = cost.getOrElse(cp.slice(j, i).mkString,
          if (i - j == 1) UnkCost else Inf)
        if (best(j) < Inf && c < Inf && best(j) + c < best(i)) {
          best(i) = best(j) + c
          bj(i) = j
        }
        j += 1
      }
      i += 1
    }
    var out = List.empty[String]
    var p = n
    while (p > 0) { out = cp.slice(bj(p), p).mkString :: out; p = bj(p) }
    out
  }

  /** FULL word stats of a documents relation — the ONE corpus-sized
    * trainer input (words = nonempty lowercase space tokens). CAP-FREE
    * since round 12: the former (cnt DESC, word) top-1024 head-cap is
    * gone — at the ×128 rung it hid 70% of token mass from the trainer
    * (the pipeline_trainer_coverage diagnostic's first real catch).
    * The output is vocabulary-sized, stays a DataFrame, and is never
    * collected on the distributed path.
    */
  def wordStats(docs: DataFrame): DataFrame =
    docs
      .select(explode(expr("filter(split(lower(text), ' '), x -> x != '')")).as("word"))
      .groupBy("word").agg(count(lit(1)).as("cnt"))

  /** Driver EM over word stats — the exact REFERENCE twin of
    * [[trainDistributed]] (pinned bit-identical in UnigramSpec) and
    * the counted-small fast path under [[DriverStatsCutoff]]. All
    * enumeration, DP indexing, and length guards are in CODE-POINT
    * space ([[codePoints]]), so this loop matches the Spark/DuckDB
    * substr/length semantics exactly, supplementary plane included.
    * Vocab is piece-set-bounded: |charset| + [[SeedMulti]] rows.
    */
  def trainFromStats(words: Seq[(String, Long)]): Seq[Piece] = {
    require(words.nonEmpty, "unigram: empty word stats")
    // the encode oracle's wd CTE errors loudly past the unroll bound;
    // the TRAINING side must too, or a long word would be segmented by
    // the driver but silently dropped from the oracle's 12-position
    // usage recount (query-vs-oracle divergence with no domain signal
    // — the loud-failure rule). Guard in code points = SQL length().
    words.find(w => cpLen(w._1) > DpUnroll).foreach { case (w, _) =>
      throw new IllegalArgumentException(
        s"unigram: training word longer than the $DpUnroll-position DP unroll: $w")
    }
    val charF = scala.collection.mutable.Map.empty[String, Long].withDefaultValue(0L)
    val multiF = scala.collection.mutable.Map.empty[String, Long].withDefaultValue(0L)
    for ((w, c) <- words) {
      val cp = codePoints(w)
      for (l <- 1 to MaxPiece; i <- 0 to cp.length - l) {
        val p = cp.slice(i, i + l).mkString
        if (l == 1) charF(p) += c else multiF(p) += c
      }
    }
    val chars = charF.toSeq.map { case (p, u) => (p, true, u) }
    val seeds = multiF.toSeq.sorted(byUsageDescPiece)
      .take(seedK(words.size.toLong).toInt)
      .map { case (p, u) => (p, false, u) }
    var vocab: Seq[(String, Boolean, Long)] = chars ++ seeds
    for (_ <- 1 to Rounds) {
      val total = vocab.map(_._3 + 1).sum
      val cost = vocab.map(v => v._1 -> log2Fix(total, v._3 + 1)).toMap
      val usage = scala.collection.mutable.Map.empty[String, Long].withDefaultValue(0L)
      for ((w, c) <- words; p <- viterbi(w, cost)) usage(p) += c
      val chars2 = vocab.filter(_._2).map(v => (v._1, true, usage(v._1)))
      val multi2 = usage.toSeq.filter(p => cpLen(p._1) >= 2)
        .sorted(byUsageDescPiece).take(KeepMulti)
        .map { case (p, u) => (p, false, u) }
      vocab = chars2 ++ multi2
    }
    val total = vocab.map(_._3 + 1).sum
    vocab.map(v => Piece(v._1, v._2, v._3, log2Fix(total, v._3 + 1)))
      .sortBy(_.piece)(utf8Ordering)
  }

  /** All multi-char seed grams of a `word` column (code-point lengths
    * 2..[[MaxPiece]]) — the Spark twin of [[trainFromStats]]'s multiF
    * enumeration and the oracle's sd0 CTE. The CASE guards short words
    * (Spark sequence(2, 1) DESCENDS — the house quirk — instead of
    * being empty).
    */
  def multiGramExpr: String =
    s"""CASE WHEN length(word) >= 2 THEN
          flatten(transform(sequence(2, least($MaxPiece, length(word))),
            l -> transform(sequence(1, length(word) - l + 1), i -> substr(word, i, l))))
        ELSE CAST(array() AS ARRAY<STRING>) END"""

  /** Backtrack stages appended after [[dpStages]]: walk the packed
    * states from the word's final position back to 0, emitting the
    * best-path piece of each step (≤ [[DpUnroll]] steps; pieces come
    * out last-first — irrelevant to the usage recount). The p0 stage
    * raise_errors past the unroll bound — the training-side loud
    * guard; the oracle's w0 CTE carries the same error() CASE.
    */
  def backtrackStages: Seq[Seq[(String, String)]] = {
    // shiftright() by NAME: Spark 4.1's selectExpr parser rejects the
    // `>>` operator when its LEFT operand ends in a closing paren (the
    // generics-vs-shift lexer ambiguity — `st3 >> 8` on a bare column,
    // as in dpStages, is fine; `element_at(...) >> 4` is a
    // PARSE_SYNTAX_ERROR)
    def stAt(p: String) =
      s"element_at(array(${(1 to DpUnroll).map(i => s"st$i").mkString(", ")}), CAST($p AS INT))"
    val init = Seq(Seq("p0" ->
      s"""CASE WHEN wl > $DpUnroll THEN raise_error(concat(
            'unigram: training word longer than the $DpUnroll-position DP unroll: ', word))
          ELSE CAST(wl AS BIGINT) END"""))
    val steps = (1 to DpUnroll).map { k =>
      val prev = s"p${k - 1}"
      val j = s"(shiftright(${stAt(prev)}, 4) & 15)"
      Seq(
        s"piece$k" -> s"""CASE WHEN $prev > 0
            THEN substr(word, CAST($j AS INT) + 1, CAST($prev - $j AS INT))
            ELSE CAST(NULL AS STRING) END""",
        s"p$k" -> s"CASE WHEN $prev > 0 THEN $j ELSE CAST(0 AS BIGINT) END")
    }
    init ++ steps
  }

  /** Every substring of `c` with code-point length 1..[[MaxPiece]] —
    * the DP's full candidate space (the join-path cost-map builder's
    * explode). No short-word CASE needed: both sequence() bounds are
    * ≥ 1 for any nonempty word.
    */
  def allGramExpr(c: String = "word"): String =
    s"""flatten(transform(sequence(1, least($MaxPiece, length($c))),
          l -> transform(sequence(1, length($c) - l + 1), i -> substr($c, i, l))))"""

  /** Per-piece best-path usage mass over a (word, cnt) relation —
    * the DISTRIBUTED E-step: ONE codegen'd job (DP + backtrack as
    * unrolled projections, a piece explode, a map-side-combining
    * aggregate), output bounded by the piece set. Piece sets up to
    * [[LiteralVocabCutoff]] ride as a literal map; larger seed
    * inventories (the [[seedK]] round-1 table) build a per-word map
    * via candidate explode + BROADCAST piece-table join — the scale
    * path: the piece table is seed-bounded (≤ [[SeedAbsCap]]),
    * per-word maps are ≤ [[DpUnroll]]·[[MaxPiece]] entries.
    */
  def pathUsage(words: DataFrame, cost: Seq[(String, Long)]): DataFrame = {
    val base0 = words.withColumn("wl", length(col("word")).cast("int"))
    val base =
      if (cost.size <= LiteralVocabCutoff) {
        val vm = map(cost.flatMap { case (p, c) => Seq(lit(p), lit(c)) }: _*)
        base0.withColumn("vm", vm)
      } else {
        val s = words.sparkSession
        import s.implicits._
        val costDf = cost.toDF("piece", "pcost")
        val wvm = words.select(col("word"))
          .select(col("word"), explode(expr(allGramExpr("word"))).as("piece"))
          .distinct()
          .join(broadcast(costDf), "piece")
          .groupBy("word")
          .agg(map_from_entries(collect_list(struct(col("piece"), col("pcost"))))
            .as("wvm"))
        base0.join(wvm, Seq("word"), "left")
          .withColumn("vm", coalesce(col("wvm"),
            expr("CAST(map() AS MAP<STRING, BIGINT>)")))
          .drop("wvm")
      }
    Geo.applyStages(Geo.applyStages(base, dpStages), backtrackStages)
      .select(explode(expr(
        s"filter(array(${(1 to DpUnroll).map(k => s"piece$k").mkString(", ")}), x -> x IS NOT NULL)"))
        .as("piece"), col("cnt"))
      .groupBy("piece").agg(sum("cnt").as("usage"))
  }

  /** DISTRIBUTED trainer (r11 verdict task #1): the same hard-EM as
    * [[trainFromStats]] with every corpus/vocabulary-sized step as a
    * DataFrame job — the stats path is CAP-FREE. Driver state is
    * piece-set-bounded only: the charset aggregate (Unicode-bounded),
    * the [[SeedMulti]] seed selection (TakeOrderedAndProject — never a
    * global sort), and per-round usage aggregates (≤ |vocab| rows).
    * `words` must be materialized by the caller (localCheckpoint —
    * 2 + [[Rounds]] small jobs re-read it).
    */
  def trainDistributed(words: DataFrame): Seq[Piece] = {
    val types = words.count()
    val chars = words
      .select(explode(expr(
        "transform(sequence(1, length(word)), i -> substr(word, i, 1))")).as("piece"),
        col("cnt"))
      .groupBy("piece").agg(sum("cnt").as("usage"))
      .collect().map(r => (r.getString(0), true, r.getLong(1))).toSeq
    require(chars.nonEmpty, "unigram: empty word stats")
    val seeds = words
      .select(explode(expr(multiGramExpr)).as("piece"), col("cnt"))
      .groupBy("piece").agg(sum("cnt").as("usage"))
      .orderBy(col("usage").desc, col("piece").asc).limit(seedK(types).toInt)
      .collect().map(r => (r.getString(0), false, r.getLong(1))).toSeq
    var vocab: Seq[(String, Boolean, Long)] = chars ++ seeds
    for (_ <- 1 to Rounds) {
      val total = vocab.map(_._3 + 1).sum
      val cost = vocab.map(v => v._1 -> log2Fix(total, v._3 + 1))
      val usage = pathUsage(words, cost).collect()
        .map(r => r.getString(0) -> r.getLong(1)).toMap.withDefaultValue(0L)
      val chars2 = vocab.filter(_._2).map(v => (v._1, true, usage(v._1)))
      val multi2 = usage.toSeq.filter(p => cpLen(p._1) >= 2)
        .sorted(byUsageDescPiece).take(KeepMulti)
        .map { case (p, u) => (p, false, u) }
      vocab = chars2 ++ multi2
    }
    val total = vocab.map(_._3 + 1).sum
    vocab.map(v => Piece(v._1, v._2, v._3, log2Fix(total, v._3 + 1)))
      .sortBy(_.piece)(utf8Ordering)
  }

  /** Train on the documents table: ONE corpus-sized word-count
    * aggregate (eagerly checkpointed — both paths and the count read
    * it without re-scanning the corpus), then the adaptive
    * counted-small dispatch: vocabularies at or under `driverCutoff`
    * distinct words collect and EM on the driver; larger ones run the
    * distributed E-step. Bit-identical either way (UnigramSpec pins
    * cutoff 0 ≡ default on the corpus and on planted vocabularies).
    */
  def train(docs: DataFrame, driverCutoff: Long = DriverStatsCutoff): Seq[Piece] = {
    val words = wordStats(docs).localCheckpoint(true)
    val n = words.count()
    require(n > 0, "unigram: empty word stats")
    if (n <= driverCutoff)
      trainFromStats(words.collect().toSeq.map(r => (r.getString(0), r.getLong(1))))
    else trainDistributed(words)
  }

  /** Driver census of the unigram trainer-coverage rows over a word-
    * stats table — the streaming twin's per-batch recompute (the
    * UnigramProcessor MapState is the stats table; all quantities are
    * piece-set/vocab-bounded) and the planted-corpus mirror the specs
    * pin the batch query against. Returns (trainer, cap, units, seen,
    * total) in the batch query's row order:
    *  - unigram_dp_unroll: token mass of words within the 12-position
    *    DP unroll (the trainer/encode raise past it).
    *  - unigram_seed_multi: gram mass captured by the [[seedK]]
    *    (types-scaled, r13) seed selection vs all multi-gram mass;
    *    cap column = the actual K. Partial only when the corpus
    *    saturates [[SeedAbsCap]].
    *  - unigram_stats_mass: cap 0 = UNCAPPED (successor of the r11
    *    unigram_top_words_mass row after the r12 head-cap removal) —
    *    structurally full coverage, kept so the ladder shows the cap
    *    is gone rather than silently dropping the row.
    */
  def coverageCensus(stats: Seq[(String, Long)]): Seq[(String, Long, String, Long, Long)] = {
    val massTotal = stats.map(_._2).sum
    val massUnroll = stats.filter(s => cpLen(s._1) <= DpUnroll).map(_._2).sum
    val grams = scala.collection.mutable.Map.empty[String, Long].withDefaultValue(0L)
    for ((w, c) <- stats) {
      val cp = codePoints(w)
      for (l <- 2 to MaxPiece; i <- 0 to cp.length - l)
        grams(cp.slice(i, i + l).mkString) += c
    }
    val gramTotal = grams.values.sum
    val k = seedK(stats.size.toLong)
    val gramSeen = grams.toSeq.sorted(byUsageDescPiece).take(k.toInt).map(_._2).sum
    Seq(
      ("unigram_dp_unroll", DpUnroll.toLong, "token_mass", massUnroll, massTotal),
      ("unigram_seed_multi", k, "gram_mass", gramSeen, gramTotal),
      ("unigram_stats_mass", 0L, "token_mass", massTotal, massTotal))
  }

  // ---- distributed encode: 12-position packed-state DP as unrolled ----
  // ---- codegen'd projections over a distinct-word relation          ----

  /** DP stages for [[Geo.applyStages]]: input needs columns `word`
    * (string), `wl` (int length) and `vm` (the piece→cost literal
    * map). State st_i packs (cost << 8) | (lastPieceStart << 4) | n —
    * min of the packed long IS the (cost, start) tie-break, and the
    * piece count rides in the low bits. Words shorter than i carry
    * NULL states (least() skips them); `npExpr` fails LOUDLY past the
    * unroll bound instead of silently dropping long words.
    */
  def dpStages: Seq[Seq[(String, String)]] = {
    val init = Seq(Seq("st0" -> "CAST(0 AS BIGINT)"))
    val steps = (1 to DpUnroll).map { i =>
      val cands = (math.max(0, i - MaxPiece) until i).map { j =>
        val piece = s"substr(word, ${j + 1}, ${i - j})"
        val cost =
          if (i - j == 1) s"coalesce(try_element_at(vm, $piece), CAST($UnkCost AS BIGINT))"
          else s"try_element_at(vm, $piece)"
        s"""CASE WHEN st$j IS NOT NULL AND $cost IS NOT NULL
            THEN (((st$j >> 8) + $cost) << 8) | (CAST($j AS BIGINT) << 4) | ((st$j & 15) + 1)
            ELSE NULL END"""
      }
      val bestCand = // Spark's least() requires >1 args; position 1 has one candidate
        if (cands.size == 1) cands.head else s"least(${cands.mkString(", ")})"
      Seq(s"st$i" ->
        s"CASE WHEN wl >= $i THEN $bestCand ELSE CAST(NULL AS BIGINT) END")
    }
    init ++ steps
  }

  /** The packed state at the word's final position; loud past the
    * unroll bound. np = low 4 bits, total best-path cost = bits ≥ 8.
    */
  def stFinalExpr: String =
    s"""CASE WHEN wl > $DpUnroll THEN raise_error(concat(
          'pipeline_unigram: word longer than the $DpUnroll-position DP unroll: ', word))
        ELSE element_at(array(${(1 to DpUnroll).map(i => s"st$i").mkString(", ")}), wl) END"""

  /** Per-word DP results for every distinct word of a `word` relation,
    * with `vocab` as a literal cost map: (word, np, wcost) — the
    * broadcastable side of the fertility / surprisal joins (np =
    * best-path piece count, wcost = best-path total cost in 2^-FracBits
    * bits units).
    */
  def pieceStats(distinctWords: DataFrame, vocab: Seq[Piece]): DataFrame = {
    val vm = map(vocab.flatMap(p => Seq(lit(p.piece), lit(p.cost))): _*)
    val base = distinctWords
      .withColumn("wl", length(col("word")).cast("int"))
      .withColumn("vm", vm)
    Geo.applyStages(base, dpStages)
      .selectExpr("word", s"($stFinalExpr) AS stf")
      .selectExpr("word", "CAST((stf & 15) AS BIGINT) AS np",
        "CAST((stf >> 8) AS BIGINT) AS wcost")
  }

  /** (word, np) projection of [[pieceStats]]. */
  def pieceCounts(distinctWords: DataFrame, vocab: Seq[Piece]): DataFrame =
    pieceStats(distinctWords, vocab).select("word", "np")

  // ---- DuckDB oracle: the whole pipeline as one unrolled CTE chain ----

  // CAP-FREE since round 12 (the Spark twin dropped the top-1024 head-
  // cap); the error() CASE is the training-side loud guard twin of the
  // driver trainFromStats throw / the distributed backtrack p0 raise —
  // without it a too-long word would silently vanish from the oracle's
  // 12-position DP recount instead of failing the query.
  private def ws(src: String): String =
    s"""SELECT CASE WHEN length(word) > $DpUnroll
              THEN error('unigram: training word longer than the $DpUnroll-position DP unroll: ' || word)
              ELSE word END AS word, cnt
        FROM (SELECT w AS word, CAST(count(*) AS BIGINT) AS cnt
              FROM (SELECT unnest(list_filter(string_split(lower(text), ' '), x -> x <> '')) AS w
                    FROM $src)
              GROUP BY 1)"""

  /** (i, j) candidate grid over a word relation: end position i in
    * 1..len, last-piece start j in [max(0, i−K), i−1]. range() is not
    * lateral-correlatable in DuckDB — unnest(list_transform(...)).
    */
  private def grid(wordsCte: String): String =
    s"""SELECT word, i, unnest(list_transform(range(greatest(i - $MaxPiece, 0), i), x -> x)) AS j
        FROM (SELECT word, unnest(list_transform(range(1, length(word) + 1), x -> x)) AS i
              FROM $wordsCte)"""

  /** The 6-stage binary-search + 16-stage shift-and-square log₂ chain
    * over a vocab CTE `vin(piece, usage, is_char)` → `c_$tag(piece,
    * usage, is_char, cost)`. Mirrors [[log2Fix]] step for step.
    */
  private def costChainCtes(vin: String, tag: String): String = {
    val carry = "piece, usage, is_char"
    val kSteps = Seq(32, 16, 8, 4, 2, 1).zipWithIndex.map { case (s, x) =>
      val prev = if (x == 0) s"tq_$tag" else s"k${x - 1}_$tag"
      val kin = if (x == 0) "0" else "k"
      s"""k${x}_$tag AS (SELECT $carry, total, q,
            $kin + (CASE WHEN (q >> ($kin + $s)) > 0 THEN $s ELSE 0 END) AS k
          FROM $prev)"""
    }
    val mSteps = (1 to FracBits).map { t =>
      val prev = if (t == 1) s"m0_$tag" else s"m${t - 1}_$tag"
      s"""m${t}_$tag AS (SELECT $carry, k,
            CASE WHEN ((m * m) >> $FracBits) >= ${2L << FracBits}
                 THEN ((m * m) >> $FracBits) >> 1 ELSE (m * m) >> $FracBits END AS m,
            frac + (CASE WHEN ((m * m) >> $FracBits) >= ${2L << FracBits}
                 THEN ${1L << (FracBits - t)} ELSE 0 END) AS frac
          FROM $prev)"""
    }
    (Seq(
      s"""tq_$tag AS (SELECT $carry, total, total // (usage + 1) AS q
          FROM (SELECT $carry, sum(usage + 1) OVER () AS total FROM $vin))""") ++
      kSteps ++ Seq(
      s"""m0_$tag AS (SELECT $carry, k,
            (total << $FracBits) // ((usage + 1) << k) AS m, CAST(0 AS BIGINT) AS frac
          FROM k5_$tag)""") ++
      mSteps ++ Seq(
      s"""c_$tag AS MATERIALIZED (SELECT $carry, (CAST(k AS BIGINT) << $FracBits) + frac AS cost
          FROM m${FracBits}_$tag)""")).mkString(",\n")
  }

  private def packed(stExpr: String, costExpr: String, jExpr: String): String =
    s"((($stExpr >> 8) + $costExpr) << 8) | (CAST($jExpr AS BIGINT) << 4) | (($stExpr & 15) + 1)"

  /** Training-round DP over `w0` (word, cnt) with cost CTE `c_$tag`:
    * positions chained as D CTEs each referenced twice (union + join)
    * — MATERIALIZED per the NSW rule. Paths ride as strings for the
    * usage recount (arg_min backtrack; packed keys are unique so the
    * argmin is deterministic).
    */
  private def trainDpCtes(tag: String): String = {
    val steps = (1 to DpUnroll).map { i =>
      s"""d${i}_$tag AS MATERIALIZED (
            SELECT word, cnt, pos, st, path FROM d${i - 1}_$tag
            UNION ALL
            SELECT d.word, d.cnt, $i AS pos,
              min(${packed("d.st", "c.cost", "c.j")}) AS st,
              arg_min(d.path || ' ' || substr(d.word, CAST(d.pos AS INT) + 1, $i - CAST(d.pos AS INT)),
                      ${packed("d.st", "c.cost", "c.j")}) AS path
            FROM d${i - 1}_$tag d
            JOIN cd_$tag c ON c.word = d.word AND c.i = $i AND c.j = d.pos
            GROUP BY d.word, d.cnt)"""
    }
    (Seq(
      s"""cd_$tag AS MATERIALIZED (
            SELECT g.word, g.i, g.j, c.cost
            FROM grid0 g JOIN c_$tag c
              ON c.piece = substr(g.word, CAST(g.j AS INT) + 1, CAST(g.i - g.j AS INT)))""",
      s"""d0_$tag AS (SELECT word, cnt, CAST(0 AS BIGINT) AS pos,
            CAST(0 AS BIGINT) AS st, '' AS path FROM w0)""") ++ steps).mkString(",\n")
  }

  /** The full EM oracle chain ending in `c_fin(piece, usage, is_char,
    * cost)` — the final vocab with costs. `src` is the documents
    * relation name.
    */
  def emOracleCtes(src: String = "documents"): String = {
    val rounds = (1 to Rounds).map { r =>
      val vin = if (r == 1) "v0" else s"v${r - 1}"
      s"""${costChainCtes(vin, s"r$r")},
${trainDpCtes(s"r$r")},
u_r$r AS MATERIALIZED (
  SELECT piece, CAST(sum(cnt) AS BIGINT) AS usage FROM (
    SELECT cnt, unnest(string_split(trim(path), ' ')) AS piece
    FROM d${DpUnroll}_r$r WHERE pos = length(word))
  GROUP BY 1),
v$r AS MATERIALIZED (
  SELECT c.piece, COALESCE(u.usage, 0) AS usage, TRUE AS is_char
  FROM (SELECT piece FROM $vin WHERE is_char) c LEFT JOIN u_r$r u USING (piece)
  UNION ALL
  SELECT piece, usage, FALSE AS is_char FROM (
    SELECT piece, usage FROM u_r$r WHERE length(piece) >= 2
    ORDER BY usage DESC, piece LIMIT $KeepMulti))"""
    }.mkString(",\n")
    s"""w0 AS MATERIALIZED (${ws(src)}),
grid0 AS MATERIALIZED (${grid("w0")}),
ch0 AS MATERIALIZED (
  SELECT piece, CAST(sum(cnt) AS BIGINT) AS usage FROM (
    SELECT substr(word, CAST(i AS INT), 1) AS piece, cnt
    FROM (SELECT word, cnt, unnest(list_transform(range(1, length(word) + 1), x -> x)) AS i
          FROM w0))
  GROUP BY 1),
tk0 AS (SELECT ${seedKSql("count(*)")} AS k FROM w0),
sd0 AS MATERIALIZED (
  SELECT piece, usage FROM (
    SELECT piece, usage,
      row_number() OVER (ORDER BY usage DESC, piece) AS rk
    FROM (
      SELECT piece, CAST(sum(cnt) AS BIGINT) AS usage FROM (
        SELECT substr(word, CAST(i AS INT), CAST(l AS INT)) AS piece, cnt
        FROM (SELECT word, cnt, i,
                unnest(list_transform(range(2, least($MaxPiece, length(word) - i + 1) + 1), x -> x)) AS l
              FROM (SELECT word, cnt, unnest(list_transform(range(1, length(word) + 1), x -> x)) AS i
                    FROM w0)))
      GROUP BY 1))
  WHERE rk <= (SELECT k FROM tk0)),
v0 AS MATERIALIZED (
  SELECT piece, usage, TRUE AS is_char FROM ch0
  UNION ALL
  SELECT piece, usage, FALSE AS is_char FROM sd0),
$rounds,
${costChainCtes(s"v$Rounds", "fin")}"""
  }

  /** Encode-side oracle CTEs (appended after [[emOracleCtes]]): the
    * same packed DP over ALL distinct corpus words against `c_fin`,
    * out-of-vocab single chars at [[UnkCost]], ending in
    * `fert(lang, source, n_docs-free fertility aggregates)`.
    */
  def fertilityOracleCtes(src: String = "documents"): String = {
    val steps = (1 to DpUnroll).map { i =>
      s"""e${i} AS MATERIALIZED (
            SELECT word, pos, st FROM e${i - 1}
            UNION ALL
            SELECT d.word, $i AS pos, min(${packed("d.st", "c.cost", "c.j")}) AS st
            FROM e${i - 1} d
            JOIN cf c ON c.word = d.word AND c.i = $i AND c.j = d.pos
            GROUP BY d.word)"""
    }.mkString(",\n")
    s"""wls AS MATERIALIZED (
  SELECT lang, source, w AS word, CAST(count(*) AS BIGINT) AS n
  FROM (SELECT lang, source,
          unnest(list_filter(string_split(lower(text), ' '), x -> x <> '')) AS w
        FROM $src)
  GROUP BY 1, 2, 3),
wd AS MATERIALIZED (
  SELECT CASE WHEN length(word) > $DpUnroll
              THEN error('pipeline_unigram: word longer than the $DpUnroll-position DP unroll: ' || word)
              ELSE word END AS word
  FROM (SELECT DISTINCT word FROM wls)),
gf AS MATERIALIZED (${grid("wd")}),
cf AS MATERIALIZED (
  SELECT word, i, j, cost FROM (
    SELECT g.word, g.i, g.j,
      COALESCE(c.cost, CASE WHEN g.i - g.j = 1 THEN CAST($UnkCost AS BIGINT) ELSE NULL END) AS cost
    FROM gf g LEFT JOIN c_fin c
      ON c.piece = substr(g.word, CAST(g.j AS INT) + 1, CAST(g.i - g.j AS INT)))
  WHERE cost IS NOT NULL),
e0 AS (SELECT word, CAST(0 AS BIGINT) AS pos, CAST(0 AS BIGINT) AS st FROM wd),
$steps,
np AS MATERIALIZED (SELECT word, st & 15 AS np, st >> 8 AS wcost
  FROM e$DpUnroll WHERE pos = length(word))"""
  }
}
