package graft.ops

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** SentencePiece-style UNIGRAM-LM tokenizer trainer (Kudo 2018,
  * arXiv:1804.10959) — the second tokenizer-training family beside
  * [[Text.bpeTrain]], re-expressed in the house disciplines:
  *
  *  - **Counted-small driver EM** (the bpeTrain pattern): the only
  *    distributed work in training is ONE word-count aggregate whose
  *    output is structurally bounded by the top-`TopWords` cap; the
  *    EM-prune rounds run on the driver in exact Long arithmetic over
  *    that bounded table, exactly where merges.txt lives in every real
  *    tokenizer trainer. At 100 TB the scan is the data-sized part and
  *    the trainer state never grows past `TopWords + SeedMulti` rows.
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
  val TopWords = 1024 // trainer word-stat cap: (cnt DESC, word) top-V
  val SeedMulti = 40 // seed multi-char candidates kept: (freq DESC, piece)
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
    */
  def viterbi(w: String, cost: Map[String, Long]): List[String] = {
    val n = w.length
    val Inf = Long.MaxValue / 4
    val best = Array.fill(n + 1)(Inf)
    val bj = Array.fill(n + 1)(-1)
    best(0) = 0L
    var i = 1
    while (i <= n) {
      var j = math.max(0, i - MaxPiece)
      while (j < i) {
        val c = cost.getOrElse(w.substring(j, i),
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
    while (p > 0) { out = w.substring(bj(p), p) :: out; p = bj(p) }
    out
  }

  /** Top-`TopWords` word stats of a documents relation — the ONE
    * distributed trainer input (words = nonempty lowercase space
    * tokens; selection order (cnt DESC, word) is total, so the
    * collected set is deterministic at every SF).
    */
  def wordStats(docs: DataFrame): DataFrame =
    docs
      .select(explode(expr("filter(split(lower(text), ' '), x -> x != '')")).as("word"))
      .groupBy("word").agg(count(lit(1)).as("cnt"))
      .orderBy(col("cnt").desc, col("word")).limit(TopWords)

  /** Driver EM over collected word stats. Bounded: `words` has at most
    * [[TopWords]] rows by construction (the limit sits in
    * [[wordStats]]), the vocab at most |chars| + [[SeedMulti]] rows.
    * Returns the final vocab sorted by piece.
    */
  def trainFromStats(words: Seq[(String, Long)]): Seq[Piece] = {
    require(words.nonEmpty, "unigram: empty word stats")
    require(words.size <= TopWords, s"unigram: word stats exceed TopWords cap (${words.size})")
    // the encode oracle's wd CTE errors loudly past the unroll bound;
    // the TRAINING side must too, or a long top-1024 word would be
    // segmented by the driver but silently dropped from the oracle's
    // 12-position usage recount (query-vs-oracle divergence with no
    // domain signal — the loud-failure rule).
    words.find(_._1.length > DpUnroll).foreach { case (w, _) =>
      throw new IllegalArgumentException(
        s"unigram: training word longer than the $DpUnroll-position DP unroll: $w")
    }
    val charF = scala.collection.mutable.Map.empty[String, Long].withDefaultValue(0L)
    val multiF = scala.collection.mutable.Map.empty[String, Long].withDefaultValue(0L)
    for ((w, c) <- words; l <- 1 to MaxPiece; i <- 0 to w.length - l) {
      val p = w.substring(i, i + l)
      if (l == 1) charF(p) += c else multiF(p) += c
    }
    val chars = charF.toSeq.map { case (p, u) => (p, true, u) }
    // (usage DESC, piece) ties resolved in UTF-8 byte order — the
    // collation the Spark/DuckDB twins of this selection sort by
    val byUsageDescPiece: Ordering[(String, Long)] =
      Ordering.by[(String, Long), Long](-_._2).orElse(Ordering.by[(String, Long), String](_._1)(utf8Ordering))
    val seeds = multiF.toSeq.sorted(byUsageDescPiece).take(SeedMulti)
      .map { case (p, u) => (p, false, u) }
    var vocab: Seq[(String, Boolean, Long)] = chars ++ seeds
    for (_ <- 1 to Rounds) {
      val total = vocab.map(_._3 + 1).sum
      val cost = vocab.map(v => v._1 -> log2Fix(total, v._3 + 1)).toMap
      val usage = scala.collection.mutable.Map.empty[String, Long].withDefaultValue(0L)
      for ((w, c) <- words; p <- viterbi(w, cost)) usage(p) += c
      val chars2 = vocab.filter(_._2).map(v => (v._1, true, usage(v._1)))
      val multi2 = usage.toSeq.filter(_._1.length >= 2)
        .sorted(byUsageDescPiece).take(KeepMulti)
        .map { case (p, u) => (p, false, u) }
      vocab = chars2 ++ multi2
    }
    val total = vocab.map(_._3 + 1).sum
    vocab.map(v => Piece(v._1, v._2, v._3, log2Fix(total, v._3 + 1)))
      .sortBy(_.piece)(utf8Ordering)
  }

  /** Train on the documents table: one bounded collect, driver EM. */
  def train(docs: DataFrame): Seq[Piece] =
    trainFromStats(wordStats(docs).collect().toSeq
      .map(r => (r.getString(0), r.getLong(1))))

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

  private def ws(src: String): String =
    s"""SELECT w AS word, CAST(count(*) AS BIGINT) AS cnt
        FROM (SELECT unnest(list_filter(string_split(lower(text), ' '), x -> x <> '')) AS w
              FROM $src)
        GROUP BY 1 ORDER BY cnt DESC, word LIMIT $TopWords"""

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
sd0 AS MATERIALIZED (
  SELECT piece, usage FROM (
    SELECT piece, CAST(sum(cnt) AS BIGINT) AS usage FROM (
      SELECT substr(word, CAST(i AS INT), CAST(l AS INT)) AS piece, cnt
      FROM (SELECT word, cnt, i,
              unnest(list_transform(range(2, least($MaxPiece, length(word) - i + 1) + 1), x -> x)) AS l
            FROM (SELECT word, cnt, unnest(list_transform(range(1, length(word) + 1), x -> x)) AS i
                  FROM w0)))
    GROUP BY 1)
  ORDER BY usage DESC, piece LIMIT $SeedMulti),
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
