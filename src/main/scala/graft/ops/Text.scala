package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Text-analysis primitives generic over any (id, text) relation — the
  * per-document feature layer of the training-data pipeline. All pure
  * column expressions (codegen'd, no UDFs), embarrassingly parallel.
  */
object Text {

  /** Lowercased space-split words, empties dropped. */
  def words(text: Column): Column =
    filter(split(lower(text), " "), w => w =!= "")

  /** Unicode NFC normalization via the native codegen'd
    * [[graft.expressions.NfcNormalize]] expression (registered on the
    * active/default sessions on first use, same pattern as [[Ann.dot]]).
    * Run this BEFORE fingerprinting/dedup: composed and decomposed
    * spellings of the same text must collide.
    */
  def nfc(text: Column): Column = {
    (org.apache.spark.sql.SparkSession.getActiveSession.toSeq ++
      org.apache.spark.sql.SparkSession.getDefaultSession.toSeq)
      .foreach(graft.expressions.NfcNormalize.register)
    call_function(graft.expressions.NfcNormalize.fnName, text)
  }

  /** Whitespace token count. */
  def wsTokens(text: Column): Column =
    size(filter(split(text, " "), w => w =!= "")).cast("bigint")

  /** BPE-ish token count: maximal alpha runs, digit runs, single marks. */
  def bpeTokens(text: Column): Column =
    regexp_count(text, lit("[A-Za-z]+|[0-9]+|[^A-Za-z0-9\\s]")).cast("bigint")

  /** Canonical content fingerprint: md5 of the sorted distinct word set
    * (boilerplate/template collision key; the dedup_incremental and
    * corpus_report primitive).
    */
  def fingerprint(text: Column): Column =
    md5(array_join(array_sort(array_distinct(words(text))), " "))

  /** Sliding-window token CHUNKING with overlap — the context-window
    * prep primitive (RAG indexing, splitting long documents for
    * embedding models, packing fixed windows for training): chunk j of
    * a document covers tokens [j·stride, j·stride + chunkTokens); every
    * document yields ≥ 1 chunk (the last one is the possibly-short
    * tail), chunk count = 1 + ⌈(n − chunkTokens) ⁄ stride⌉ for
    * n &gt; chunkTokens — all integer math, deterministic boundaries,
    * no rand() and no length-dependent drift. Output: (`idCol`,
    * `chunk_id`, `start_tok`, `n_tokens`, `chunk_md5`).
    *
    * Scale shape: pure per-row array expressions (the transform runs
    * over ≤ a handful of chunk slots per doc) — embarrassingly
    * parallel, zero shuffles; the fan-out is bounded by n ⁄ stride per
    * document, never corpus-sized.
    */
  def chunk(
      df: DataFrame,
      idCol: String,
      wordsCol: String,
      chunkTokens: Int,
      stride: Int): DataFrame = {
    require(chunkTokens >= 1, "chunkTokens >= 1")
    require(stride >= 1 && stride <= chunkTokens,
      "stride in [1, chunkTokens] (larger strides would drop tokens)")
    df.select(col(idCol), col(wordsCol).as("_w"))
      .withColumn("_n", size(col("_w")))
      // ceil((n - chunk) / stride) in exact integer form; the CASE keeps
      // sequence() ascending (Spark sequence(1, 0) DESCENDS — guarded)
      .withColumn("_nc", expr(
        s"1 + CASE WHEN _n > $chunkTokens THEN (_n - $chunkTokens + ${stride - 1}) DIV $stride ELSE 0 END"))
      .select(col(idCol), posexplode(expr(
        s"""transform(sequence(0, _nc - 1), j -> named_struct(
             'start_tok', CAST(j * $stride AS BIGINT),
             'toks', slice(_w, j * $stride + 1, $chunkTokens)))"""))
        .as(Seq("chunk_id", "c")))
      .select(col(idCol), col("chunk_id").cast("bigint").as("chunk_id"),
        col("c.start_tok"),
        size(col("c.toks")).cast("bigint").as("n_tokens"),
        md5(array_join(col("c.toks"), " ")).as("chunk_md5"))
  }

  /** Sentence-boundary-aware chunking — the multilingual alternative to
    * fixed-stride [[chunk]]: chunk edges snap to SENTENCE boundaries
    * (never mid-sentence), sentences pack greedily into chunks of at
    * most `maxTokens` whitespace tokens, and a single sentence longer
    * than the budget becomes its own over-budget chunk rather than being
    * split. Boundary grammar: a terminator in `.!?` or the CJK full-width
    * `。！？` followed by whitespace ends a sentence (the standard
    * language-agnostic heuristic; CJK terminators make it multilingual
    * without a language model). Output: one row per chunk —
    * (`idCol`, `chunk_idx` 1-based, `n_sentences`, `n_tokens`,
    * `chunk_md5`).
    *
    * Scale shape: one LINEAR per-document fold (Spark `aggregate` HOF
    * over the sentence array — state is the open chunk plus the emitted
    * list, O(sentences) per doc), then a posexplode. Zero shuffles; the
    * fold never leaves the row, so this parallelizes per-document
    * exactly like [[chunk]].
    */
  def chunkSentences(
      df: DataFrame,
      idCol: String,
      textCol: String,
      maxTokens: Int): DataFrame = {
    require(maxTokens >= 1, "maxTokens >= 1")
    val sep = "\u0001"
    df.select(col(idCol),
        filter(transform(
          split(regexp_replace(col(textCol),
            "([.!?。！？])\\s+", "$1" + sep), sep),
          s => trim(s)), s => s =!= "").as("_sents"))
      .filter(size(col("_sents")) >= 1)
      // zip each sentence with its whitespace-token count once
      .withColumn("_st", expr(
        """transform(_sents, s -> named_struct('s', s,
             't', CAST(size(filter(split(s, ' '), x -> x <> '')) AS BIGINT)))"""))
      // greedy pack: close the open chunk when the next sentence would
      // overflow the budget; the finish lambda flushes the last chunk
      .withColumn("_chunks", expr(s"""
        aggregate(_st,
          named_struct(
            'chunks', array_repeat(named_struct('ns', CAST(0 AS BIGINT),
              'nt', CAST(0 AS BIGINT), 'txt', ''), 0),
            'cs', CAST(0 AS BIGINT), 'ct', CAST(0 AS BIGINT), 'ctxt', ''),
          (acc, p) -> CASE WHEN acc.ct > 0 AND acc.ct + p.t > $maxTokens
            THEN named_struct(
              'chunks', array_append(acc.chunks, named_struct('ns', acc.cs,
                'nt', acc.ct, 'txt', acc.ctxt)),
              'cs', CAST(1 AS BIGINT), 'ct', p.t, 'ctxt', p.s)
            ELSE named_struct('chunks', acc.chunks, 'cs', acc.cs + 1,
              'ct', acc.ct + p.t,
              'ctxt', IF(acc.cs = 0, p.s, concat(acc.ctxt, ' ', p.s))) END,
          acc -> IF(acc.ct > 0,
            array_append(acc.chunks, named_struct('ns', acc.cs,
              'nt', acc.ct, 'txt', acc.ctxt)),
            acc.chunks))"""))
      .select(col(idCol), posexplode(col("_chunks")).as(Seq("_ci", "_c")))
      .select(col(idCol), (col("_ci") + 1).cast("bigint").as("chunk_idx"),
        col("_c.ns").as("n_sentences"), col("_c.nt").as("n_tokens"),
        md5(col("_c.txt")).as("chunk_md5"))
  }

  /** Composite quality score in EXACT integer basis points over the
    * common denominator n_chars·n_words — integer floor-division cannot
    * straddle float round-boundaries between engines (the text_stats
    * formula: length, alpha ratio, distinct-word ratio).
    */
  def qualityBp(df: DataFrame, textCol: String): DataFrame =
    df.withColumn("_c", length(col(textCol)).cast("bigint"))
      .withColumn("_w", wsTokens(col(textCol)))
      .withColumn("_a", regexp_count(col(textCol), lit("[a-z]")).cast("bigint"))
      .withColumn("_d", size(array_distinct(words(col(textCol)))).cast("bigint"))
      .withColumn("quality_bp", expr(
        """(40 * least(_w, 100) * _c * _w + 3000 * _a * _w + 3000 * _d * _c)
           DIV nullif(_c * _w, 0)"""))
      .drop("_c", "_w", "_a", "_d")

  /** Reproducible percentile-bucket of an id (md5-derived, 0..99) — the
    * rand()-free membership primitive behind hash splits and mix
    * sampling: a pure function of the key, stable across engines,
    * retries, and scales.
    */
  def hashBucket(id: Column, salt: String = ""): Column = {
    graft.expressions.Md5Hash60.registerActive()
    call_function(graft.expressions.Md5Hash60.fnName,
      concat(lit(salt), id.cast("string"))) % 100
  }

  /** Winnowing fingerprints (Schleimer, Wilkerson, Aiken — "Winnowing:
    * Local Algorithms for Document Fingerprinting", SIGMOD'03, public):
    * the SPAN-level dup signal whole-doc hashing can't give. Every
    * `k`-gram gets an md5-derived 60-bit hash; each sliding window of
    * `win` consecutive gram hashes contributes its minimum; the distinct
    * selected set is the document's fingerprint sketch. Guarantee: two
    * documents sharing any run of ≥ `win + k - 1` words share at least
    * one fingerprint.
    *
    * Pure per-row array expression over an already-split words column —
    * zero shuffle, O(len·win) per doc. The identical formula is easy to
    * emit as DuckDB SQL (md5-bigint is the cross-engine hash), so
    * downstream queries stay hash-exact.
    *
    * `wordsCol` must name an ARRAY<STRING> column; returns
    * ARRAY<BIGINT> (empty when the doc has fewer than `k + win - 1`
    * words).
    */
  def winnowFingerprints(
      df: DataFrame,
      wordsCol: String,
      outCol: String = "fps",
      k: Int = 3,
      win: Int = 4): DataFrame =
    // two hoisted steps, NOT one nested expression: gram hashes land in a
    // real intermediate column so each md5 is computed exactly once —
    // a lambda-nested formulation re-hashes every gram `win` times
    // (HOFs don't do subexpression elimination), which measured 8×
    // slower. Guards matter: Spark's sequence(1, 0) DESCENDS ([1,0])
    // rather than returning empty, so each step only generates positions
    // when at least one gram/window exists.
    {
    graft.expressions.Md5Hash60.register(df.sparkSession)
    df.withColumn("_graft_gh", expr(
        s"""CASE WHEN size($wordsCol) >= $k THEN transform(
            sequence(1, size($wordsCol) - ${k - 1}),
            j -> graft_h60(concat_ws(' ', slice($wordsCol, j, $k))))
          ELSE CAST(array() AS ARRAY<BIGINT>) END"""))
      .withColumn(outCol, expr(
        s"""CASE WHEN size(_graft_gh) >= $win THEN array_distinct(transform(
            sequence(1, size(_graft_gh) - ${win - 1}),
            i -> array_min(slice(_graft_gh, i, $win))))
          ELSE CAST(array() AS ARRAY<BIGINT>) END"""))
      .drop("_graft_gh")
    }

  /** The DuckDB twin of [[winnowFingerprints]]'s gram-hash step —
    * emitted into generated oracle SQL (hoist it in a CTE, then apply
    * [[winnowSelectSql]]).
    */
  def winnowGramHashesSql(wordsExpr: String, k: Int = 3): String =
    s"""list_transform(range(1, greatest(len($wordsExpr) - ${k - 1}, 0) + 1),
        j -> CAST('0x' || substr(md5(list_aggregate(($wordsExpr)[j:j+${k - 1}], 'string_agg', ' ')), 1, 15) AS BIGINT))"""

  /** The DuckDB twin of the window-min selection over a hoisted
    * gram-hash list expression.
    */
  def winnowSelectSql(ghExpr: String, win: Int = 4): String =
    s"""list_distinct(list_transform(
        range(1, greatest(len($ghExpr) - ${win - 1}, 0) + 1),
        i -> list_min(($ghExpr)[i:i+${win - 1}])))"""

  /** POSITIONAL k-gram hash index: one (key, p, gh) row per k-gram,
    * p = 0-based gram start — the inverted-index substrate of span-level
    * exact-substring deduplication (Lee et al., "Deduplicating Training
    * Data Makes Language Models Better", ACL'22 — public; their suffix
    * array finds maximal repeated substrings, relationally the same
    * spans are maximal runs on matching DIAGONALS of the k-gram
    * dotplot).
    *
    * Unlike [[winnowFingerprints]] (which NEEDS the per-doc hash array
    * for its window-min selection, so it pays a transform lambda), the
    * positional index is per-ROW output — so positions explode FIRST
    * (a cheap integer sequence; InferFiltersFromGenerate re-evaluating
    * it is free) and each gram hashes through the codegen'd
    * [[graft.expressions.Md5Hash60]] on its own row. Measured 9× over
    * the lambda form: HOF lambdas run interpreted, and the whole-stage
    * codegen span stays unbroken here.
    *
    * `wordsCol` must name an ARRAY<STRING> column.
    */
  def gramPositionIndex(
      df: DataFrame,
      keyCol: String,
      wordsCol: String,
      k: Int): DataFrame = {
    graft.expressions.Md5Hash60.register(df.sparkSession)
    df.filter(expr(s"size($wordsCol) >= $k"))
      .select(col(keyCol), col(wordsCol),
        posexplode(expr(s"sequence(1, size($wordsCol) - ${k - 1})"))
          .as(Seq("p", "_j")))
      .select(col(keyCol), col("p").cast("bigint").as("p"),
        expr(s"graft_h60(concat_ws(' ', slice($wordsCol, _j, $k)))").as("gh"))
  }

  // ---- BPE merge training (byte-pair encoding over word-ish symbols) ----
  //
  // A BPE round = count adjacent symbol pairs, pick the most frequent
  // pair (deterministic tie-break), rewrite every sequence with the pair
  // merged. The sequence is carried as a SINGLE STRING with a strict
  // framing invariant — one space at each end, two spaces between
  // symbols, i.e. every symbol is surrounded by its "own" space:
  //
  //   [a, b, c]  ⇒  " a  b  c "
  //
  // Applying merge (w1, w2) is then one literal `replace`:
  //   " w1  w2 "  →  " w1w2 "
  // Non-overlapping left-to-right replace gives exactly the greedy
  // leftmost BPE merge, AND the framing invariant is preserved (the
  // pattern consumes one space from each outer separator, the
  // replacement restores it) — so rounds chain with no re-normalization,
  // and `replace` has identical semantics in Spark and DuckDB: the whole
  // trainer is bit-exact cross-engine with zero custom state.
  //
  // Scale shape per round: one map-side-combining groupBy over exploded
  // pairs (the only shuffle) + a broadcast of the 1-row merge rule.
  // A production tokenizer runs this loop a few thousand times — each
  // round is linear in corpus size, and nothing ever leaves the cluster.

  /** BPE symbol inventory of a document (lowercased alpha runs, digit
    * runs, single marks — same grammar as [[bpeTokens]]), framed into
    * the merge-invariant sequence string.
    */
  def bpeInitSeq(text: Column): Column =
    concat(lit(" "), array_join(
      regexp_extract_all(lower(text), lit("[a-z]+|[0-9]+|[^a-z0-9\\s]"), lit(0)),
      "  "), lit(" "))

  /** Adjacent-pair counts over framed sequence strings: (w1, w2, cnt). */
  def bpePairCounts(seqs: DataFrame, seqCol: String): DataFrame = {
    val toks = seqs.select(split(trim(col(seqCol)), "  ").as("_t"))
      .filter(size(col("_t")) >= 2)
    toks.select(explode(zip_with(
        expr("slice(_t, 1, size(_t) - 1)"), expr("slice(_t, 2, size(_t) - 1)"),
        (a, b) => struct(a.as("w1"), b.as("w2")))).as("p"))
      .groupBy(col("p.w1").as("w1"), col("p.w2").as("w2"))
      .agg(count(lit(1)).as("cnt"))
  }

  /** The winning merge rule of a round: most frequent pair, ties broken
    * lexicographically — a 1-row DataFrame (w1, w2, cnt).
    */
  def bpeTopMerge(pairCounts: DataFrame): DataFrame =
    pairCounts.orderBy(desc("cnt"), asc("w1"), asc("w2")).limit(1)

  /** Rewrite every sequence with the (broadcast) 1-row merge applied. */
  def bpeApplyMerge(seqs: DataFrame, seqCol: String, rule: DataFrame): DataFrame =
    seqs.crossJoin(broadcast(rule.select(col("w1").as("_mw1"), col("w2").as("_mw2"))))
      .withColumn(seqCol, expr(
        s"""replace($seqCol, ' ' || _mw1 || '  ' || _mw2 || ' ',
            ' ' || _mw1 || _mw2 || ' ')"""))
      .drop("_mw1", "_mw2")

  /** Full BPE training loop: `rounds` merge rounds over framed
    * sequences. Returns (merges, finalSeqs): `merges` is the ordered
    * rule table (round, w1, w2, cnt — the tokenizer's merges.txt), and
    * `finalSeqs` the rewritten corpus for inspection or further rounds.
    * DRIVER-COORDINATED (round 8): each round's winning merge is ONE
    * row — bounded state, so it is collected to the driver (the same
    * counted-small discipline as the graph fast paths; merges.txt lives
    * on the driver in every real tokenizer trainer). Round r's input is
    * then rebuilt as base-corpus scan + r-1 accumulated LITERAL
    * `replace`es collapsed into a single codegen'd projection — no
    * per-round persist of the rewritten corpus, no crossJoin chain, no
    * per-level whole-stage-codegen compile tax (the DevBpe 16-22 s cold
    * signature). Only the raw framed corpus is persisted, once; each
    * round is one shallow pair-count aggregation job. Bit-exactness is
    * unchanged: the literal replace applies the identical framed
    * greedy-leftmost rewrite the broadcast-column variant did.
    */
  /** Max merge rounds certified for ONE accumulated-replace projection
    * without re-materialization — set from the DevBpe depth probe
    * (round 12, SCALE.md): evaluation cost of the k-deep replace chain
    * is nearly FLAT through k=256 (cold 0.37–0.53 s, warm 0.25–0.37 s
    * on the 10k×32-symbol probe — the per-round scan term, not depth,
    * dominates), but k=512 DIES with a driver StackOverflowError in
    * Catalyst codegen (`StringReplace.doGenCode` recurses the whole
    * expression spine) — a hard cliff, not a slowdown. Past this bound
    * the trainer THROWS up front (the unigram DP-unroll discipline —
    * never a mid-training crash): deep trainings pass `rematEvery` to
    * periodically localCheckpoint the rewritten corpus, which resets
    * the chain depth and keeps every plan inside the certified range.
    */
  val MaxChainedMerges = 256

  def bpeTrain(
      seqs: DataFrame,
      seqCol: String,
      rounds: Int,
      rematEvery: Int = 0,
      onRound: Int => Unit = _ => ()): (DataFrame, DataFrame) = {
    require(rounds >= 1)
    require(rematEvery >= 0, "rematEvery: 0 = never, else checkpoint period")
    if (rematEvery > MaxChainedMerges)
      throw new IllegalArgumentException(
        s"bpeTrain: rematEvery=$rematEvery lets the accumulated-replace " +
          s"chain reach uncertified depth (> $MaxChainedMerges — the " +
          "StringReplace.doGenCode stack cliff); pass rematEvery <= " +
          s"$MaxChainedMerges")
    if (rematEvery == 0 && rounds > MaxChainedMerges)
      throw new IllegalArgumentException(
        s"bpeTrain: $rounds merge rounds on a single accumulated-replace " +
          s"projection exceeds the certified depth $MaxChainedMerges " +
          "(DevBpe turnover measurement) — pass rematEvery (e.g. 64) to " +
          "re-materialize the rewritten corpus periodically")
    import org.apache.spark.sql.functions.{lit, replace => sqlReplace}
    val spark = seqs.sparkSession
    var base = seqs.persist()
    var adopted = Vector.empty[(Long, String, String, Long)]
    // replaces adopted since the last materialization — the only ones
    // the next round's projection re-evaluates
    var pending = Vector.empty[(String, String)]
    def applied: DataFrame = pending.foldLeft(base) { case (df, (w1, w2)) =>
      df.withColumn(seqCol, sqlReplace(col(seqCol),
        lit(s" $w1  $w2 "), lit(s" $w1$w2 ")))
    }
    var r = 1
    var exhausted = false
    while (r <= rounds && !exhausted) {
      val top = bpeTopMerge(bpePairCounts(applied, seqCol)).collect()
      if (top.isEmpty) exhausted = true // corpus has no adjacent pair left
      else {
        val row = top(0)
        adopted :+= ((r.toLong, row.getString(0), row.getString(1), row.getLong(2)))
        pending :+= ((row.getString(0), row.getString(1)))
        if (rematEvery > 0 && pending.size >= rematEvery && r < rounds) {
          // eager truncation: the checkpointed corpus is self-contained,
          // so the previous base (persist or earlier checkpoint) can go
          val mat = applied.localCheckpoint(true)
          base.unpersist(blocking = false)
          base = mat
          pending = Vector.empty
        }
        onRound(r)
        r += 1
      }
    }
    import spark.implicits._
    val merges = adopted.toDF("round", "w1", "w2", "cnt")
    (merges, applied)
  }

  /** WORDPIECE training loop (Schuster &amp; Nakajima 2012; the BERT
    * tokenizer) — the third trainer beside BPE and unigram-LM: same
    * framed-sequence machinery as [[bpeTrain]], but each round's merge
    * maximizes the LIKELIHOOD GAIN score p(ab)/(p(a)p(b)) =
    * cnt_ab·N/(n_a·n_b) instead of raw pair count, so rare-but-
    * exclusive pairs beat frequent-but-independent ones. The score is
    * exact quantized integer: score_e6 = (cnt_ab·10⁶) DIV
    * ((n_a·n_b DIV N) + 1) — denominator quantized FIRST (the
    * quantized-econometrics discipline; +1 clears div-zero), total
    * order (score DESC, cnt DESC, w1, w2). Driver-coordinated like
    * bpeTrain: one collected 1-row winner per round, literal replaces
    * folded into one projection. Overflow headroom: n_a·n_b ≤ N² needs
    * N &lt; 3·10⁹ symbols — pre-scale counts past that (ANSI throws,
    * never wraps).
    *
    * Returns (merges, finalSeqs); merges = (round, w1, w2, cnt_pair,
    * n_a, n_b, score_e6).
    */
  def wordpieceTrain(
      seqs: DataFrame,
      seqCol: String,
      rounds: Int,
      rematEvery: Int = 0): (DataFrame, DataFrame) = {
    require(rounds >= 1)
    require(rematEvery >= 0, "rematEvery: 0 = never, else checkpoint period")
    if (rematEvery > MaxChainedMerges)
      throw new IllegalArgumentException(
        s"wordpieceTrain: rematEvery=$rematEvery lets the accumulated-" +
          s"replace chain reach uncertified depth (> $MaxChainedMerges — " +
          "the StringReplace.doGenCode stack cliff); pass rematEvery <= " +
          s"$MaxChainedMerges")
    if (rematEvery == 0 && rounds > MaxChainedMerges)
      throw new IllegalArgumentException(
        s"wordpieceTrain: $rounds merge rounds on a single accumulated-" +
          s"replace projection exceeds the certified depth $MaxChainedMerges " +
          "(DevBpe turnover, shared shape) — pass rematEvery (e.g. 64)")
    import org.apache.spark.sql.functions.{lit, replace => sqlReplace}
    val spark = seqs.sparkSession
    var base = seqs.persist()
    var adopted = Vector.empty[(Long, String, String, Long, Long, Long, Long)]
    var pending = Vector.empty[(String, String)]
    def applied: DataFrame = pending.foldLeft(base) { case (df, (w1, w2)) =>
      df.withColumn(seqCol, sqlReplace(col(seqCol),
        lit(s" $w1  $w2 "), lit(s" $w1$w2 ")))
    }
    var r = 1
    var exhausted = false
    while (r <= rounds && !exhausted) {
      val cur = applied
      val syms = cur.select(explode(split(trim(col(seqCol)), "  ")).as("sym"))
        .filter(col("sym") =!= "").groupBy("sym").agg(count(lit(1)).as("n"))
      val tot = syms.agg(sum("n").as("nt"))
      val top = bpePairCounts(cur, seqCol)
        .join(syms.select(col("sym").as("w1"), col("n").as("na")), "w1")
        .join(syms.select(col("sym").as("w2"), col("n").as("nb")), "w2")
        .crossJoin(broadcast(tot))
        .withColumn("score_e6", expr("(cnt * 1000000) DIV (((na * nb) DIV nt) + 1)"))
        .orderBy(desc("score_e6"), desc("cnt"), asc("w1"), asc("w2")).limit(1)
        .select("w1", "w2", "cnt", "na", "nb", "score_e6")
        .collect()
      if (top.isEmpty) exhausted = true
      else {
        val t = top(0)
        adopted :+= ((r.toLong, t.getString(0), t.getString(1), t.getLong(2),
          t.getLong(3), t.getLong(4), t.getLong(5)))
        pending :+= ((t.getString(0), t.getString(1)))
        if (rematEvery > 0 && pending.size >= rematEvery && r < rounds) {
          val mat = applied.localCheckpoint(true)
          base.unpersist(blocking = false)
          base = mat
          pending = Vector.empty
        }
        r += 1
      }
    }
    import spark.implicits._
    (adopted.toDF("round", "w1", "w2", "cnt_pair", "n_a", "n_b", "score_e6"),
      applied)
  }

  /** DuckDB twin of one [[wordpieceTrain]] round's scoring pick over a
    * framed CTE `srcCte` — a 1-row (w1, w2, cnt, na, nb, score_e6)
    * relation; `uCte` must be the round's symbol-count CTE.
    */
  def wordpiecePickSql(srcCte: String, uCte: String): String =
    s"""SELECT p.w1, p.w2, p.cnt, a.n AS na, b.n AS nb,
          (p.cnt * 1000000) // (((a.n * b.n)
             // (SELECT CAST(sum(n) AS BIGINT) FROM $uCte)) + 1) AS score_e6
        FROM (${bpePairCountsSql(srcCte, "seq")}) p
        JOIN $uCte a ON a.sym = p.w1 JOIN $uCte b ON b.sym = p.w2
        ORDER BY score_e6 DESC, cnt DESC, w1, w2 LIMIT 1"""

  /** DuckDB twin of a round's symbol counts over `srcCte`. */
  def wordpieceSymsSql(srcCte: String): String =
    s"""SELECT sym, CAST(count(*) AS BIGINT) AS n FROM (
          SELECT unnest(string_split(trim(seq), '  ')) AS sym FROM $srcCte)
        WHERE sym <> '' GROUP BY 1"""

  /** DuckDB twin of [[bpeInitSeq]]. */
  def bpeInitSeqSql(textExpr: String): String =
    s"""' ' || list_aggregate(regexp_extract_all(lower($textExpr),
        '[a-z]+|[0-9]+|[^a-z0-9\\s]'), 'string_agg', '  ') || ' '"""

  /** DuckDB twin of [[bpePairCounts]] as a full SELECT over `srcCte`
    * exposing a framed-sequence column `seqExpr`.
    */
  def bpePairCountsSql(srcCte: String, seqExpr: String): String =
    s"""SELECT split_part(pr, ' ', 1) AS w1, split_part(pr, ' ', 2) AS w2,
          count(*)::BIGINT AS cnt
        FROM (SELECT unnest(list_transform(range(1, len(t)), i -> t[i] || ' ' || t[i + 1])) AS pr
          FROM (SELECT string_split(trim($seqExpr), '  ') AS t FROM $srcCte)
          WHERE len(t) >= 2)
        GROUP BY 1, 2"""

  /** DuckDB twin of [[bpeApplyMerge]]: `ruleCte` is a 1-row (w1, w2)
    * relation, applied via scalar subqueries.
    */
  def bpeApplyMergeSql(seqExpr: String, ruleCte: String): String =
    s"""replace($seqExpr,
        ' ' || (SELECT w1 FROM $ruleCte) || '  ' || (SELECT w2 FROM $ruleCte) || ' ',
        ' ' || (SELECT w1 FROM $ruleCte) || (SELECT w2 FROM $ruleCte) || ' ')"""

  /** Document-level word co-occurrence with exact support counts —
    * the collocation/PMI primitive. Returns one row per unordered word
    * pair: (word_a, word_b, n_ab, n_a, n_b, n_docs), everything an
    * exact integer so ranking scores stay fixed-point downstream.
    *
    * Scale shape: the pair space is bounded BEFORE the self-join by a
    * document-frequency vocabulary cap (`vocabTop` — deterministic
    * (df DESC, word) order), so the per-doc join fans out at most
    * vocabTop² pairs regardless of corpus size; the join key is doc_id
    * (no hot word key anywhere), and `minPair` prunes the long tail at
    * the first aggregation. The word explode is NOT cached — a cheap
    * split re-evaluates faster than a cache round-trip (same
    * measurement as the winnow/shingle paths).
    */
  /** Skip-gram (center, context) pair counts within a ±`window`
    * positional window — the word2vec/GloVe training-pair extraction.
    * Pairs are generated per row as pure array expressions (one array
    * per offset and direction, no positional self-join anywhere), so
    * the only shuffle is the final map-side-combining count. Returns
    * (center, context, n).
    */
  def skipgrams(df: DataFrame, textCol: String, window: Int): DataFrame = {
    require(window >= 1 && window <= 8, "window in [1,8]")
    val w = df.select(words(col(textCol)).as("w"))
    // for each offset: forward pairs (w[i], w[i+off]) and their mirror —
    // guard with CASE: Spark's sequence(1, 0) DESCENDS rather than
    // returning empty
    val pairArrays = (1 to window).flatMap { off =>
      Seq(
        s"""CASE WHEN size(w) >= ${off + 1} THEN transform(
             sequence(1, size(w) - $off),
             i -> struct(element_at(w, i) AS center, element_at(w, i + $off) AS context))
           ELSE array() END""",
        s"""CASE WHEN size(w) >= ${off + 1} THEN transform(
             sequence(1, size(w) - $off),
             i -> struct(element_at(w, i + $off) AS center, element_at(w, i) AS context))
           ELSE array() END""")
    }
    w.select(explode(expr(pairArrays.mkString("concat(", ", ", ")"))).as("p"))
      .select(col("p.center"), col("p.context"))
      .groupBy("center", "context").agg(count(lit(1)).as("n"))
  }

  def cooccurrence(df: DataFrame, idCol: String, textCol: String,
      vocabTop: Int, minPair: Long): DataFrame = {
    val w = df.select(col(idCol).as("_d"),
      explode(array_distinct(words(col(textCol)))).as("word"))
    val byDf = w.groupBy("word").agg(count(lit(1)).as("n_w"))
    val vocab = byDf.orderBy(col("n_w").desc, col("word")).limit(vocabTop)
    val wv = w.join(broadcast(vocab), Seq("word"))
    val pairs = wv.select(col("_d"), col("word").as("word_a"), col("n_w").as("n_a"))
      .join(wv.select(col("_d"), col("word").as("word_b"), col("n_w").as("n_b")), Seq("_d"))
      .filter(col("word_a") < col("word_b"))
      .groupBy("word_a", "word_b")
      .agg(count(lit(1)).as("n_ab"), max("n_a").as("n_a"), max("n_b").as("n_b"))
      .filter(col("n_ab") >= minPair)
    val nd = df.agg(count(lit(1)).as("n_docs"))
    pairs.crossJoin(nd)
  }

  /** Content-defined chunks of a (id, text) relation: one row per
    * chunk, `(idCol, ck, n_w, chash)` — boundaries after words whose
    * md5 hits `1/64` (Rabin-style CDC at word granularity: boundaries
    * depend ONLY on content, so shared passages chunk identically in
    * every document — the invariant all CDC dedup rests on). Shared by
    * `text_cdc_chunks` (corpus dup-rate report) and
    * `dedup_cdc_rewrite` (keep-first rewrite); extend here, not in the
    * queries. Scale: posexplode → per-doc running-sum window → per-
    * chunk aggregate; one shuffle on the doc key, chunk hashes via the
    * sorted in-chunk fold (chunks are ≈64 words — bounded, unlike a
    * per-doc collect).
    */
  def cdcChunks(df: DataFrame, idCol: String, textCol: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val wx = df
      .select(col(idCol), posexplode(words(col(textCol))))
      .select(col(idCol), (col("pos") + 1).cast("bigint").as("p"), col("col").as("w"))
    val bx = wx.withColumn("b",
      expr(s"CASE WHEN ${graft.ops.Sketch.h60("'cdc'", "w")} % 64 = 0 THEN 1L ELSE 0L END"))
    val cx = bx.withColumn("ck", coalesce(
      sum("b").over(Window.partitionBy(idCol).orderBy("p")
        .rowsBetween(Window.unboundedPreceding, -1)), lit(0L)))
    cx.groupBy(col(idCol), col("ck"))
      .agg(count(lit(1)).as("n_w"),
        expr(graft.ops.Sketch.h60("'ck'",
          "concat_ws(' ', transform(array_sort(collect_list(struct(p, w))), x -> x.w))"))
          .as("chash"))
  }

  /** DuckDB twin of [[cdcChunks]] as CTEs ending in
    * `ch(idCol, ck, n_w, chash)` over table `table`. */
  def cdcChunksSqlCtes(table: String, idCol: String, textCol: String): String =
    s"""d AS (
      SELECT $idCol, list_filter(string_split(lower($textCol), ' '), x -> x <> '') AS w
      FROM $table),
    wx AS (SELECT $idCol,
        unnest(list_transform(range(1, len(w) + 1), i -> {'p': i, 'w': w[i]})) AS u
      FROM d),
    bx AS (SELECT $idCol, CAST(u.p AS BIGINT) AS p, u.w AS w,
        CASE WHEN CAST('0x' || substr(md5('cdc:' || u.w), 1, 15) AS BIGINT) % 64 = 0
          THEN 1 ELSE 0 END AS b
      FROM wx),
    cx AS (SELECT $idCol, p, w, coalesce(CAST(sum(b) OVER (PARTITION BY $idCol
        ORDER BY p ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING) AS BIGINT), 0) AS ck
      FROM bx),
    ch AS (SELECT $idCol, ck, count(*)::BIGINT AS n_w,
        CAST('0x' || substr(md5('ck:' || string_agg(w, ' ' ORDER BY p)), 1, 15) AS BIGINT) AS chash
      FROM cx GROUP BY 1, 2)"""

  // ---- URL canonicalization (the crawl-dedup normalizer) ----
  //
  // The canonical form a web-scale dedup pipeline keys on BEFORE any
  // content hashing: lowercase scheme+host, default port stripped
  // (:443 for https, :80 for http), fragment dropped, trailing
  // path-slash run stripped, tracking params (utm_*) dropped, the
  // remaining query params SORTED (param order is transport noise).
  // Both dialects implement the IDENTICAL step list with the engines'
  // shared string semantics (instr/substr/lower, regexp '$' anchor,
  // binary-collation sorts, substr-prefix test instead of LIKE so no
  // wildcard divergence), so canonical keys are bit-equal cross-engine.
  // Pure per-row column work — zero shuffle; the dedup groupBy
  // downstream is the only exchange, keyed on the canonical string
  // (hash it with Md5Hash60 at corpus scale, like the gram miners).
  // Built by textual substitution into ONE flat expression per engine;
  // Spark's subexpression elimination dedups the repeated fragments in
  // codegen.

  /** Spark-dialect canonicalizer over a URL string expression. */
  def canonicalUrlExpr(url: String): String = {
    val nofrag = s"substring_index($url, '#', 1)"
    val base = s"substring_index($nofrag, '?', 1)"
    val qs = s"(CASE WHEN instr($nofrag, '?') > 0 THEN substr($nofrag, instr($nofrag, '?') + 1) ELSE '' END)"
    val scheme = s"lower(substring_index($base, '://', 1))"
    val rest = s"substr($base, instr($base, '://') + 3)"
    val hostport = s"lower(CASE WHEN instr($rest, '/') > 0 THEN substr($rest, 1, instr($rest, '/') - 1) ELSE $rest END)"
    val host = s"(CASE WHEN $scheme = 'https' THEN regexp_replace($hostport, ':443$$', '')" +
      s" WHEN $scheme = 'http' THEN regexp_replace($hostport, ':80$$', '') ELSE $hostport END)"
    val path = s"regexp_replace(CASE WHEN instr($rest, '/') > 0 THEN substr($rest, instr($rest, '/')) ELSE '' END, '/+$$', '')"
    val params = s"array_join(array_sort(filter(split($qs, '&'), p -> p != '' AND substr(p, 1, 4) != 'utm_')), '&')"
    s"concat($scheme, '://', $host, $path, CASE WHEN $params = '' THEN '' ELSE concat('?', $params) END)"
  }

  /** DuckDB twin of [[canonicalUrlExpr]] — the identical step list in
    * DuckDB's dialect (split_part/instr/list_* + string_agg; the empty
    * list aggregates to NULL, coalesced to '').
    */
  def canonicalUrlSql(url: String): String = {
    val nofrag = s"split_part($url, '#', 1)"
    val base = s"split_part($nofrag, '?', 1)"
    val qs = s"(CASE WHEN instr($nofrag, '?') > 0 THEN substr($nofrag, instr($nofrag, '?') + 1) ELSE '' END)"
    val scheme = s"lower(split_part($base, '://', 1))"
    val rest = s"substr($base, instr($base, '://') + 3)"
    val hostport = s"lower(CASE WHEN instr($rest, '/') > 0 THEN substr($rest, 1, instr($rest, '/') - 1) ELSE $rest END)"
    val host = s"(CASE WHEN $scheme = 'https' THEN regexp_replace($hostport, ':443$$', '')" +
      s" WHEN $scheme = 'http' THEN regexp_replace($hostport, ':80$$', '') ELSE $hostport END)"
    val path = s"regexp_replace(CASE WHEN instr($rest, '/') > 0 THEN substr($rest, instr($rest, '/')) ELSE '' END, '/+$$', '')"
    val params = s"coalesce(list_aggregate(list_sort(list_filter(string_split($qs, '&'), p -> p <> '' AND substr(p, 1, 4) <> 'utm_')), 'string_agg', '&'), '')"
    s"($scheme || '://' || $host || $path || CASE WHEN $params = '' THEN '' ELSE '?' || $params END)"
  }
}
