package graft.queries

import graft.{Q, Tables}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Text-analysis operators for a large-scale training-data pipeline over
  * the `documents` table: quality scoring, language ID, token counting,
  * canonical fingerprinting. All pure column pipelines (codegen'd, no
  * UDFs), embarrassingly parallel per document — the shape that scales to
  * 100 TB with zero shuffle except the deterministic output ORDER BY.
  */
object TextOps {

  def all: Seq[Q] = Seq(editPairs, textHapax, textWordBurstiness, textStats, langId, tokenCount, docFingerprint,
    multimodalMeta, posExplodeWords, docChunk, contextPack, fuzzyMatch,
    textRedact, wordEntropy, corpusReport, topNgrams, tfidfTopTerms,
    qualityRepetition, mixSample, textBm25, stratifiedSample, packTokenBudget,
    textWinnow, bpePairStats, samplePriority, textNormalize, textVocabGrowth,
    textKeywords, textPmi, textSkipgrams, bpeEncode, textLmBigram,
    multimodalFrames, sampleTemperature, pipelineChunkIndex,
    textPhraseOccurrences, docChunkSentences, multimodalResize,
    multimodalMips, pipelineCurriculum, qualityDsirWeights,
    multimodalAudioMeta, multimodalPhash, multimodalPhashPairs,
    multimodalPhashClusters, multimodalDctPhash, sampleNeymanAlloc, multimodalAudioFingerprint,
    pipelineDatasetCard, pipelineDomainMixture, textCdcChunks, samplePps, sampleBootstrap,
    multimodalScenecut, pipelineShardBalance, sampleHtEstimate,
    multimodalIntegrity, textKneserNey, mixEpochUpsample,
    tokenizerFertility, multimodalVideoMeta, multimodalJpegMeta,
    multimodalMp4Meta, unigramVocab, unigramFertility, unigramSurprisal,
    wordpieceMerges, trainerCoverage, epochShuffle, dedupImpact, resumeCursor,
    packBoundaries, epochPack)

  /** Bigram language-model perplexity scoring with add-one smoothing —
    * the CCNet-style "does this read like the corpus" filter (Wenzek et
    * al., arXiv:1911.00359 trains a 5-gram LM for exactly this; bigrams
    * are the relational core of it). Per bigram, surprisal =
    * ⌊log₂((c(w₁)+V)·1024 ⁄ (c(w₁w₂)+1))⌋ in EXACT integer math (the
    * `length(bin(x))−1` floor-log₂ — same trick as quality_surprisal);
    * per doc, the mean bigram surprisal in basis points ranks the 25
    * most out-of-model documents. Shape: one windowed bigram pass, two
    * partial-agg count shuffles, then a broadcast of the (small) bigram
    * model back onto the bigram stream — the model table is vocabulary-
    * sized, never corpus-sized.
    */
  val textLmBigram: Q = Q("text_lm_bigram", (s, dir) => {
    val d = Tables.t(s, dir, "documents")
      .select(col("doc_id"), graft.ops.Text.words(col("text")).as("ws"))
    val pos = d.select(col("doc_id"), posexplode(col("ws")))
      .toDF("doc_id", "pos", "w")
    val ww = Window.partitionBy("doc_id").orderBy("pos")
    val pairs = pos.withColumn("w2", lead("w", 1).over(ww))
      .filter(col("w2").isNotNull)
      .select(col("doc_id"), col("w").as("w1"), col("w2"))
    val c2 = pairs.groupBy("w1", "w2").agg(count(lit(1)).as("c2"))
    val c1 = pairs.groupBy("w1").agg(count(lit(1)).as("c1"))
    val v = pos.agg(countDistinct("w").as("vocab"))
    val model = c2.join(c1, "w1").crossJoin(broadcast(v))
      .withColumn("surprise",
        expr("length(bin(((c1 + vocab) * 1024) DIV (c2 + 1))) - 1"))
      .select(col("w1"), col("w2"), col("surprise"))
    pairs.join(broadcast(model), Seq("w1", "w2"))
      .groupBy("doc_id")
      .agg(count(lit(1)).as("n_bigrams"), sum("surprise").as("surprise_sum"))
      .withColumn("ppl_bp", expr("surprise_sum * 10000 DIV n_bigrams"))
      .orderBy(col("ppl_bp").desc, col("doc_id")).limit(25)
  }, Some("""WITH d AS (
      SELECT doc_id, list_filter(string_split(lower(text), ' '), x -> x <> '') AS ws
      FROM documents),
    pr AS (SELECT doc_id,
        unnest(list_transform(range(1, greatest(len(ws) - 1, 0) + 1),
          i -> [ws[i], ws[i + 1]])) AS p
      FROM d),
    pairs AS (SELECT doc_id, p[1] AS w1, p[2] AS w2 FROM pr),
    c2 AS (SELECT w1, w2, count(*)::BIGINT AS c2 FROM pairs GROUP BY w1, w2),
    c1 AS (SELECT w1, count(*)::BIGINT AS c1 FROM pairs GROUP BY w1),
    v AS (SELECT count(DISTINCT w)::BIGINT AS vocab FROM (
      SELECT unnest(ws) AS w FROM d) u),
    model AS (SELECT c2.w1, c2.w2,
        length(bin(((c1.c1 + v.vocab) * 1024) // (c2.c2 + 1))) - 1 AS surprise
      FROM c2 JOIN c1 USING (w1), v)
    SELECT doc_id, count(*)::BIGINT AS n_bigrams,
      sum(m.surprise)::BIGINT AS surprise_sum,
      (sum(m.surprise)::BIGINT * 10000) // count(*)::BIGINT AS ppl_bp
    FROM pairs JOIN model m USING (w1, w2)
    GROUP BY doc_id
    ORDER BY ppl_bp DESC, doc_id LIMIT 25"""))

  /** Frame-sampling schedule for the multimodal column: each asset's
    * frame count comes from the REAL container decode (APNG acTL
    * num_frames; static BMP/GIF decode to 1 — see [[multimodalMeta]]),
    * then emit the k = min(4, frames) uniformly-spaced frame indices
    * ⌊j·frames ⁄ k⌋ a video pipeline would pull — the WORK-PLAN side
    * of frame extraction (the pixel pass belongs to the codec stage;
    * planning which frames to decode is pure relational math and is
    * what must scale). Per-asset generation, zero shuffle; the
    * position generator is guarded `sequence(0, k−1)` with k ≥ 1 by
    * construction.
    */
  val multimodalFrames: Q = Q("multimodal_frames", (s, dir) => {
    graft.expressions.ImageHeaderDecode.register(s)
    val assetHex = graft.ops.Media.assetHexExpr(
      "doc_id", "CAST(octet_length(text) AS BIGINT)")
    Tables.t(s, dir, "documents")
      .select(col("doc_id"),
        expr(s"image_header_decode(unhex($assetHex)).frames").as("frames"))
      .withColumn("k", least(lit(4L), col("frames")))
      .select(col("doc_id"), col("frames"), col("k"),
        explode(expr("transform(sequence(0, CAST(k - 1 AS INT)), j -> j * frames DIV k)"))
          .as("frame_idx"))
      .orderBy("doc_id", "frame_idx")
  }, Some {
    val assetHex = graft.ops.Media.assetHexExpr(
      "doc_id", "CAST(octet_length(encode(text)) AS BIGINT)")
    s"""WITH hx AS (SELECT doc_id, hex(unhex($assetHex)) AS h FROM documents),
    a AS (SELECT doc_id,
        CAST(${graft.ops.Media.duckFramesExpr("h")} AS BIGINT) AS frames
      FROM hx),
    b AS (SELECT doc_id, frames, least(4, frames) AS k FROM a)
    SELECT doc_id, frames, CAST(k AS BIGINT) AS k,
      unnest(list_transform(range(0, k), j -> j * frames // k)) AS frame_idx
    FROM b ORDER BY doc_id, frame_idx"""
  })

  /** Span-level dup detection via winnowing fingerprints
    * (ops/Text.winnowFingerprints — SIGMOD'03 local fingerprinting):
    * per doc, the count of selected fingerprints and how many of them
    * appear in OTHER docs too. The sharing count goes through an
    * inverted fingerprint index (explode → document frequency → join
    * back) — bounded by fingerprint df, never a doc×doc pair join. The
    * whole-doc fingerprint (doc_fingerprint) catches identical content;
    * this catches shared RUNS of ≥ 6 words inside otherwise-different
    * docs — the copy-paste/boilerplate signal.
    */
  val textWinnow: Q = Q("text_winnow", (s, dir) => {
    val d = graft.ops.Text.winnowFingerprints(
      Tables.t(s, dir, "documents")
        .select(col("doc_id"), graft.ops.Text.words(col("text")).as("w")), "w")
    // explode_OUTER on purpose: inner explode triggers
    // InferFiltersFromGenerate, which pushes `size(fps)>0 AND isnotnull`
    // down as a filter with the WHOLE winnow expression inlined — the
    // gram hashing then runs twice more per raw row (measured 8-40s at
    // sf0.1 vs ~1s without). The null rows an outer explode adds are
    // dropped by the inner fp join below, so results are identical.
    val ex = d.select(col("doc_id"), explode_outer(col("fps")).as("fp"))
    val dfreq = ex.groupBy("fp").agg(countDistinct(col("doc_id")).as("nd"))
    ex.join(dfreq, "fp")
      .groupBy("doc_id")
      .agg(count(lit(1)).as("n_fps"),
        sum(when(col("nd") > 1, 1L).otherwise(0L)).as("n_shared_fps"))
      .orderBy("doc_id")
  }, Some(s"""WITH g AS (SELECT doc_id,
      ${graft.ops.Text.winnowGramHashesSql(
        "list_filter(string_split(lower(text), ' '), x -> x <> '')")} AS gh
      FROM documents),
    d AS (SELECT doc_id, ${graft.ops.Text.winnowSelectSql("gh")} AS fps FROM g),
    ex AS (SELECT doc_id, unnest(fps) AS fp FROM d),
    df AS (SELECT fp, count(DISTINCT doc_id) AS nd FROM ex GROUP BY fp)
    SELECT doc_id, count(*) AS n_fps,
      CAST(sum(CASE WHEN nd > 1 THEN 1 ELSE 0 END) AS BIGINT) AS n_shared_fps
    FROM ex JOIN df USING (fp)
    GROUP BY doc_id ORDER BY doc_id"""))

  /** Exact-count stratified sampling — 25 docs per source by reproducible
    * hash order (ops/Sample.stratifiedTopN): the equal-size eval-slice /
    * audit-sample primitive rate sampling can't give you. Per-source
    * window, parallelism = #sources, no global sort.
    */
  val stratifiedSample: Q = Q("stratified_sample", (s, dir) => {
    graft.ops.Sample.stratifiedTopN(
        Tables.t(s, dir, "documents").select(col("doc_id"), col("source")),
        "source", "doc_id", n = 25)
      .select(col("source"), col("rn"), col("doc_id"))
      .orderBy("source", "rn")
  }, Some("""SELECT source, rn, doc_id FROM (
      SELECT source, doc_id,
        CAST(row_number() OVER (PARTITION BY source
          ORDER BY CAST('0x' || substr(md5('strat' || CAST(doc_id AS VARCHAR)), 1, 15) AS BIGINT),
          doc_id) AS BIGINT) AS rn
      FROM documents)
    WHERE rn <= 25 ORDER BY source, rn"""))

  /** Per-source token-budget cap (ops/Sample.budgetCap): admit docs in
    * reproducible hash order until each source has contributed 20k
    * tokens — the "up to N tokens per source" mixing step of a training
    * run. Greedy cut admits a row iff the EXCLUSIVE prefix sum is under
    * budget (overshoot ≤ 1 doc). Output is the per-source manifest the
    * mixing job would ship.
    */
  val packTokenBudget: Q = Q("pack_token_budget", (s, dir) => {
    val d = Tables.t(s, dir, "documents")
      .select(col("doc_id"), col("source"), graft.ops.Text.bpeTokens(col("text")).as("tok"))
    graft.ops.Sample.budgetCap(d, "source", "doc_id", "tok", budget = 20000L)
      .groupBy("source")
      .agg(count(lit(1)).as("n_docs"), sum("tok").as("kept_tokens"),
        max(col("cum_before") + col("tok")).as("final_cum"))
      .orderBy("source")
  }, Some("""WITH d AS (SELECT doc_id, source,
      CAST(len(regexp_extract_all(text, '[A-Za-z]+|[0-9]+|[^A-Za-z0-9\s]')) AS BIGINT) AS tok
      FROM documents),
    o AS (SELECT *,
        coalesce(sum(tok) OVER (PARTITION BY source
          ORDER BY CAST('0x' || substr(md5('budget' || CAST(doc_id AS VARCHAR)), 1, 15) AS BIGINT), doc_id
          ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS cum_before
      FROM d)
    SELECT source, count(*) AS n_docs, CAST(sum(tok) AS BIGINT) AS kept_tokens,
      CAST(max(cum_before + tok) AS BIGINT) AS final_cum
    FROM o WHERE cum_before < 20000
    GROUP BY source ORDER BY source"""))

  /** Okapi BM25 top-20 for a fixed 3-term query — the retrieval-grade
    * relevance ranking tf-idf approximates (k1=1.2, b=0.75, the
    * `ln(1 + (N-df+0.5)/(df+0.5))` idf that never goes negative).
    *
    * Scale shape: per-doc term frequencies are array ops on the already-
    * split word array (zero shuffle); corpus stats (N, avgdl, one df per
    * query term) are ONE tiny partial-aggregated pass broadcast back; the
    * top-20 plans as TakeOrderedAndProject (per-partition top-k + merge,
    * no global sort). The score formula is the same SQL text on both
    * engines so the float expression trees match; selection and order
    * compare on round(,6) with a doc_id tie-break.
    */
  val textBm25: Q = Q("text_bm25", (s, dir) => {
    val terms = Seq("spark", "join", "window")
    val t = Tables.t(s, dir, "documents")
      .select(col("doc_id"), filter(split(lower(col("text")), " "), w => w =!= "").as("w"))
      .withColumn("dl", size(col("w")).cast("bigint"))
      .select(Seq(col("doc_id"), col("dl")) ++ terms.map(q =>
        expr(s"CAST(size(filter(w, x -> x = '$q')) AS BIGINT)").as(s"tf_$q")): _*)
    val statsCols = Seq(count(lit(1)).as("n"),
      expr("CAST(sum(dl) AS DOUBLE) / count(*)").as("avgdl")) ++ terms.map(q =>
      sum(when(col(s"tf_$q") > 0, 1L).otherwise(0L)).as(s"df_$q"))
    val stats = t.agg(statsCols.head, statsCols.tail: _*)
    val scoreSql = terms.map(q =>
      s"ln(1 + (n - df_$q + 0.5) / (df_$q + 0.5)) * (tf_$q * 2.2) / (tf_$q + 1.2 * (0.25 + 0.75 * dl / avgdl))")
      .mkString(" + ")
    t.crossJoin(broadcast(stats))
      .withColumn("score", expr(scoreSql))
      .select(col("doc_id"), col("dl"), col("tf_spark"), col("tf_join"), col("tf_window"),
        round(col("score"), 4).as("bm25"))
      .orderBy(expr("round(score, 6)").desc, col("doc_id").asc)
      .limit(20)
  }, Some("""WITH w AS (SELECT doc_id,
        list_filter(string_split(lower(text), ' '), x -> x <> '') AS w
      FROM documents),
    t AS (SELECT doc_id, CAST(len(w) AS BIGINT) AS dl,
        CAST(len(list_filter(w, x -> x = 'spark')) AS BIGINT) AS tf_spark,
        CAST(len(list_filter(w, x -> x = 'join')) AS BIGINT) AS tf_join,
        CAST(len(list_filter(w, x -> x = 'window')) AS BIGINT) AS tf_window
      FROM w),
    s AS (SELECT count(*) AS n, CAST(sum(dl) AS DOUBLE) / count(*) AS avgdl,
        sum(CASE WHEN tf_spark > 0 THEN 1 ELSE 0 END) AS df_spark,
        sum(CASE WHEN tf_join > 0 THEN 1 ELSE 0 END) AS df_join,
        sum(CASE WHEN tf_window > 0 THEN 1 ELSE 0 END) AS df_window
      FROM t),
    sc AS (SELECT doc_id, dl, tf_spark, tf_join, tf_window,
        ln(1 + (n - df_spark + 0.5) / (df_spark + 0.5)) * (tf_spark * 2.2) / (tf_spark + 1.2 * (0.25 + 0.75 * dl / avgdl))
      + ln(1 + (n - df_join + 0.5) / (df_join + 0.5)) * (tf_join * 2.2) / (tf_join + 1.2 * (0.25 + 0.75 * dl / avgdl))
      + ln(1 + (n - df_window + 0.5) / (df_window + 0.5)) * (tf_window * 2.2) / (tf_window + 1.2 * (0.25 + 0.75 * dl / avgdl)) AS score
      FROM t, s)
    SELECT doc_id, dl, tf_spark, tf_join, tf_window, round(score, 4) AS bm25
    FROM sc ORDER BY round(score, 6) DESC, doc_id ASC LIMIT 20"""))

  /** Data-mixing downsampler — equalize source contributions for a
    * training mix: every source is hash-downsampled to the token mass of
    * the SMALLEST source. Keep-rate per source is exact integer basis
    * points (10000·min_tokens DIV src_tokens); membership is the
    * reproducible md5 hash of the doc id (no rand() — stable across
    * engines, retries, and scales; same primitive as sample_hash_split).
    * Plan: one aggregation for source masses, a 1-row global min
    * broadcast, rate join back, per-doc hash test — no global ordering
    * anywhere.
    */
  /** Epoch-upsampling PLAN for a target mixture — the other direction
    * from [[mixSample]] (which downsamples to the smallest source):
    * to hit a uniform token share per source, small sources must be
    * REPEATED. The plan says exactly how: per source, the full-epoch
    * count ⌈target/tokens⌉ (capped at 16 — the repeat ceiling real
    * pretraining mixes enforce before quality degrades; Muennighoff et
    * al., "Scaling Data-Constrained Language Models", NeurIPS 2023
    * finds ~4 epochs near-lossless and diminishing returns past it —
    * the cap is where a pipeline flags "get more data"), the fraction
    * of the final partial pass in basis points, and the oversampling
    * ratio. All integer math: ceil division as (t + n − 1) DIV n,
    * truncating bp fractions, so the plan is bit-stable cross-engine.
    * Scale shape: ONE per-source aggregate + a 1-row total broadcast —
    * the plan is #sources rows of metadata; the 100-TB repeat itself
    * is then a per-source `explode(sequence(1, epochs))` at write time,
    * embarrassingly parallel, no shuffle beyond the agg here.
    */
  /** Tokenizer-fertility eval per (lang, source) — the multilingual
    * tokenizer-quality metric (Rust et al., "How Good is Your
    * Tokenizer? On the Monolingual Performance of Multilingual
    * Language Models", ACL 2021 — public: fertility = subword tokens
    * per word; high fertility means the tokenizer fragments that
    * language and its docs cost more context budget per sentence):
    * corpus-mass fertility (tokens·100/words) and compression
    * (chars·100/tokens) as exact integer centi-ratios over the BPE-ish
    * regex token count. The table a pipeline reads before setting
    * per-language sampling weights — a language with 2× fertility
    * needs 2× the token budget for the same document mass. One
    * map-side-combining aggregate over per-row column math: no joins,
    * no windows, #lang×#source output rows.
    */
  val tokenizerFertility: Q = Q("pipeline_tokenizer_fertility", (s, dir) => {
    Tables.t(s, dir, "documents")
      .select(col("lang"), col("source"),
        graft.ops.Text.bpeTokens(col("text")).as("tok"),
        expr("CAST(size(filter(split(text, ' '), w -> w != '')) AS BIGINT)").as("nw"),
        length(col("text")).cast("bigint").as("nc"))
      .groupBy("lang", "source")
      .agg(count(lit(1)).as("n_docs"), sum("tok").as("tokens"),
        sum("nw").as("words"), sum("nc").as("chars"))
      .withColumn("fertility_e2", expr("(tokens * 100) DIV nullif(words, 0)"))
      .withColumn("chars_per_tok_e2", expr("(chars * 100) DIV nullif(tokens, 0)"))
      .orderBy("lang", "source")
  }, Some("""SELECT lang, source, count(*)::BIGINT AS n_docs,
      CAST(sum(len(regexp_extract_all(text, '[A-Za-z]+|[0-9]+|[^A-Za-z0-9\s]'))) AS BIGINT) AS tokens,
      CAST(sum(len(list_filter(string_split(text, ' '), w -> w <> ''))) AS BIGINT) AS words,
      CAST(sum(length(text)) AS BIGINT) AS chars,
      (CAST(sum(len(regexp_extract_all(text, '[A-Za-z]+|[0-9]+|[^A-Za-z0-9\s]'))) AS BIGINT) * 100)
        // nullif(CAST(sum(len(list_filter(string_split(text, ' '), w -> w <> ''))) AS BIGINT), 0)
        AS fertility_e2,
      (CAST(sum(length(text)) AS BIGINT) * 100)
        // nullif(CAST(sum(len(regexp_extract_all(text, '[A-Za-z]+|[0-9]+|[^A-Za-z0-9\s]'))) AS BIGINT), 0)
        AS chars_per_tok_e2
    FROM documents GROUP BY lang, source ORDER BY lang, source"""))

  val mixEpochUpsample: Q = Q("mix_epoch_upsample", (s, dir) => {
    val per = Tables.t(s, dir, "documents")
      .select(col("source"),
        expr("CAST(size(filter(split(text, ' '), w -> w != '')) AS BIGINT)").as("nw"))
      .groupBy("source")
      .agg(count(lit(1)).as("n_docs"), sum("nw").as("tokens"))
    val tot = per.agg(sum("tokens").as("t_total"), count(lit(1)).as("n_src"))
    per.crossJoin(broadcast(tot))
      .withColumn("target", expr("t_total DIV n_src"))
      .withColumn("epochs_raw", expr("(target + tokens - 1) DIV nullif(tokens, 0)"))
      .withColumn("epochs", expr("least(epochs_raw, CAST(16 AS BIGINT))"))
      .withColumn("capped", expr("epochs_raw > 16"))
      .withColumn("final_pass_bp", expr("""CASE WHEN epochs_raw > 16 THEN 10000
        ELSE ((target - (epochs_raw - 1) * tokens) * 10000) DIV nullif(tokens, 0) END"""))
      .withColumn("oversample_e2", expr("(target * 100) DIV nullif(tokens, 0)"))
      .select("source", "n_docs", "tokens", "target", "epochs", "capped",
        "final_pass_bp", "oversample_e2")
      .orderBy("source")
  }, Some("""WITH per AS (SELECT source, count(*)::BIGINT AS n_docs,
      CAST(sum(len(list_filter(string_split(text, ' '), w -> w <> ''))) AS BIGINT) AS tokens
    FROM documents GROUP BY source),
    tot AS (SELECT sum(tokens)::BIGINT AS t_total, count(*)::BIGINT AS n_src FROM per)
    SELECT source, n_docs, tokens, t_total // n_src AS target,
      CAST(least((t_total // n_src + tokens - 1) // nullif(tokens, 0), 16) AS BIGINT) AS epochs,
      ((t_total // n_src + tokens - 1) // nullif(tokens, 0)) > 16 AS capped,
      CASE WHEN (t_total // n_src + tokens - 1) // nullif(tokens, 0) > 16 THEN 10000
        ELSE ((t_total // n_src - ((t_total // n_src + tokens - 1) // nullif(tokens, 0) - 1) * tokens)
          * 10000) // nullif(tokens, 0) END AS final_pass_bp,
      (t_total // n_src * 100) // nullif(tokens, 0) AS oversample_e2
    FROM per, tot ORDER BY source"""))

  /** DETERMINISTIC EPOCH SHUFFLE — the reproducible training-order
    * primitive for a 100-TB corpus: position = 3-round Feistel
    * permutation of doc_id keyed by epoch
    * ([[graft.ops.Sample.feistelPosSql]] — one codegen'd integer
    * expression per row, bijective on [0, 2^40) by construction). The
    * alternatives both fail at scale: ORDER BY rand() is a full
    * data-sized sort AND non-reproducible across retries; a
    * materialized permutation table is a second corpus-sized dataset
    * to shuffle-join against every epoch. Here the training order is
    * pure per-row arithmetic — a consumer seeks its range-shard
    * [shard·2^36, (shard+1)·2^36) and streams docs sorted by pos, and
    * a preempted job resumes from a (epoch, pos) cursor with zero
    * recomputation.
    *
    * Output: per (epoch, shard) — doc count, share in bp, min/max
    * position — for 2 epochs × 16 range-shards, plus the bijectivity
    * certificate (count(distinct pos) == count(*) per epoch, exact).
    * Distinct epochs produce visibly different shard loads (the
    * reshuffle is real), while every epoch's loads stay near 625 bp
    * (the round function disperses). Scale shape: one corpus scan per
    * epoch, two linear aggregates (the distinct-pos census and the
    * shard rollup) — no join, no window, no sort; the doc_id domain is
    * gated into [0, 2^40) by a loud broadcast raise_error.
    */
  val epochShuffle: Q = Q("pipeline_epoch_shuffle", (s, dir) => {
    val shardW = (1L << 40) / 16 // 16 range-shards over the position domain
    val docs = Tables.t(s, dir, "documents").select(col("doc_id"))
    val gate = docs.agg(max("doc_id").as("mx"), min("doc_id").as("mn"))
      .select(expr(s"""CASE WHEN mx >= ${1L << 40} OR mn < 0 THEN raise_error(
          'pipeline_epoch_shuffle: doc_id outside the 2^40 Feistel domain')
        ELSE 1 END""").as("_ok"))
    val posSql = graft.ops.Sample.feistelPosSql("doc_id", "epoch", duck = false)
    val p = docs.crossJoin(broadcast(gate)).where(col("_ok") === 1)
      .select(col("doc_id"), explode(expr("array(0L, 1L)")).as("epoch"))
      .withColumn("pos", expr(posSql))
      .withColumn("shard", expr(s"pos DIV $shardW"))
    val tot = p.groupBy("epoch").agg(count(lit(1)).as("n_total"),
      countDistinct("pos").as("n_distinct"))
    p.groupBy("epoch", "shard")
      .agg(count(lit(1)).as("n_docs"), min("pos").as("min_pos"),
        max("pos").as("max_pos"))
      .join(broadcast(tot), "epoch")
      .withColumn("share_bp", expr("n_docs * 10000 DIV n_total"))
      .withColumn("bijective", expr("CAST(n_distinct = n_total AS BIGINT)"))
      .select("epoch", "shard", "n_docs", "share_bp", "min_pos", "max_pos",
        "bijective")
      .orderBy("epoch", "shard")
  }, Some {
    val posSql = graft.ops.Sample.feistelPosSql("doc_id", "epoch", duck = true)
    s"""WITH d AS (SELECT doc_id FROM documents),
    g AS (SELECT CASE WHEN max(doc_id) >= ${1L << 40} OR min(doc_id) < 0
        THEN error('pipeline_epoch_shuffle: doc_id outside the 2^40 Feistel domain')
        ELSE 1 END AS ok FROM d),
    e AS (SELECT CAST(x AS BIGINT) AS epoch FROM (VALUES (0), (1)) t(x)),
    p AS (SELECT doc_id, epoch, $posSql AS pos FROM d, e, g WHERE g.ok = 1),
    ps AS (SELECT epoch, pos, pos // ${(1L << 40) / 16} AS shard FROM p),
    tot AS (SELECT epoch, CAST(count(*) AS BIGINT) AS n_total,
        CAST(count(DISTINCT pos) AS BIGINT) AS n_distinct FROM ps GROUP BY 1)
    SELECT ps.epoch, ps.shard, CAST(count(*) AS BIGINT) AS n_docs,
      CAST(count(*) AS BIGINT) * 10000 // t.n_total AS share_bp,
      CAST(min(pos) AS BIGINT) AS min_pos, CAST(max(pos) AS BIGINT) AS max_pos,
      CAST(t.n_distinct = t.n_total AS BIGINT) AS bijective
    FROM ps JOIN tot t ON t.epoch = ps.epoch
    GROUP BY ps.epoch, ps.shard, t.n_total, t.n_distinct
    ORDER BY ps.epoch, ps.shard"""
  })

  /** RESUME CURSOR over the epoch-shuffle order — the preemption-
    * recovery primitive beside [[epochShuffle]]: a training job that
    * consumed K documents of epoch e resumes at the K-th SMALLEST
    * Feistel position, found here as an EXACT order statistic WITHOUT a
    * global sort (the bucketedMedian discipline lifted to arbitrary
    * rank): (1) one linear pass buckets positions by their high bits
    * (4096 buckets) and counts; (2) the cumulative bucket census (a
    * #buckets-sized window on an aggregate — sanctioned) locates the
    * bucket each target rank falls in; (3) one bounded per-bucket
    * row_number over ONLY the hit buckets (semi-join filtered; bucket
    * load is hash-dispersed by the permutation) yields the exact row.
    * Positions are a bijection image, so the order is total with no tie
    * discipline needed anywhere. Reported for K = 25/50/75% of each
    * epoch: the cursor position, its range-shard, and the doc at the
    * cursor — what a resuming consumer seeks to. The oracle sorts (it
    * may; we must not).
    */
  val resumeCursor: Q = Q("pipeline_resume_cursor", (s, dir) => {
    import org.apache.spark.sql.expressions.Window
    val bktW = graft.ops.Sample.CursorBucketWidth // 4096 buckets over 2^40
    val docs = Tables.t(s, dir, "documents").select(col("doc_id"))
    val gate = docs.agg(max("doc_id").as("mx"), min("doc_id").as("mn"))
      .select(expr(s"""CASE WHEN mx >= ${1L << 40} OR mn < 0 THEN raise_error(
          'pipeline_resume_cursor: doc_id outside the 2^40 Feistel domain')
        ELSE 1 END""").as("_ok"))
    val posSql = graft.ops.Sample.feistelPosSql("doc_id", "epoch", duck = false)
    val p = docs.crossJoin(broadcast(gate)).where(col("_ok") === 1)
      .select(col("doc_id"), explode(expr("array(0L, 1L)")).as("epoch"))
      .withColumn("pos", expr(posSql))
      .withColumn("bkt", expr(s"pos DIV $bktW"))
      .persist()
    val n = p.groupBy("epoch").agg(count(lit(1)).as("n"))
    val targets = n.select(col("epoch"), explode(expr(
        """array(struct(CAST(25 AS BIGINT) AS pct, n DIV 4 AS k),
                 struct(CAST(50 AS BIGINT) AS pct, n DIV 2 AS k),
                 struct(CAST(75 AS BIGINT) AS pct, (3 * n) DIV 4 AS k))""")).as("t"))
      .select(col("epoch"), col("t.pct").as("pct"), col("t.k").as("k"))
    val wB = Window.partitionBy("epoch").orderBy("bkt")
      .rowsBetween(Window.unboundedPreceding, -1)
    val cum = p.groupBy("epoch", "bkt").agg(count(lit(1)).as("c"))
      .withColumn("before", coalesce(sum("c").over(wB), lit(0L)))
    val hit = targets.join(broadcast(cum), Seq("epoch"))
      .filter(col("k") > col("before") && col("k") <= col("before") + col("c"))
      .select(col("epoch"), col("pct"), col("k"), col("bkt"),
        (col("k") - col("before")).as("off"))
    val wIn = Window.partitionBy("epoch", "bkt").orderBy("pos")
    val inB = p.join(broadcast(hit.select("epoch", "bkt").distinct()),
        Seq("epoch", "bkt"), "left_semi")
      .withColumn("rn", row_number().over(wIn).cast("bigint"))
    inB.join(broadcast(hit), Seq("epoch", "bkt"))
      .filter(col("rn") === col("off"))
      .select(col("epoch"), col("pct"), col("k"), col("pos").as("cursor_pos"),
        expr(s"pos DIV ${(1L << 40) / 16}").as("cursor_shard"),
        col("doc_id").as("cursor_doc"))
      .orderBy("epoch", "pct")
  }, Some {
    val posSql = graft.ops.Sample.feistelPosSql("doc_id", "epoch", duck = true)
    s"""WITH d AS (SELECT doc_id FROM documents),
    g AS (SELECT CASE WHEN max(doc_id) >= ${1L << 40} OR min(doc_id) < 0
        THEN error('pipeline_resume_cursor: doc_id outside the 2^40 Feistel domain')
        ELSE 1 END AS ok FROM d),
    e AS (SELECT CAST(x AS BIGINT) AS epoch FROM (VALUES (0), (1)) t(x)),
    p AS (SELECT doc_id, epoch, $posSql AS pos FROM d, e, g WHERE g.ok = 1),
    n AS (SELECT epoch, CAST(count(*) AS BIGINT) AS n FROM p GROUP BY 1),
    t AS (SELECT epoch, CAST(25 AS BIGINT) AS pct, n // 4 AS k FROM n
      UNION ALL SELECT epoch, 50, n // 2 FROM n
      UNION ALL SELECT epoch, 75, (3 * n) // 4 FROM n),
    r AS (SELECT epoch, doc_id, pos,
        CAST(row_number() OVER (PARTITION BY epoch ORDER BY pos) AS BIGINT) AS rn
      FROM p)
    SELECT t.epoch, t.pct, t.k, r.pos AS cursor_pos,
      r.pos // ${(1L << 40) / 16} AS cursor_shard, r.doc_id AS cursor_doc
    FROM t JOIN r ON r.epoch = t.epoch AND r.rn = t.k
    ORDER BY t.epoch, t.pct"""
  })

  /** DEDUP → MIXTURE IMPACT — the before/after report a curation run
    * publishes beside its keep-list: apply the exact-dedup keep rule
    * (min doc_id per md5 content hash — the dedup_exact contract) and
    * recompute the per-source token mixture on the survivors. A source
    * whose share SHIFTS after dedup was inflating its weight with
    * duplicate mass (cross-source dups leave the source entirely when
    * a smaller-id copy lives elsewhere — hence the COALESCE-to-0 arms).
    * Scale shape: one persisted doc projection feeds the keep
    * aggregate, the (hash, keep_id)-keyed join-back (same key as the
    * aggregate — no extra exchange pattern; Aggregate boundary, lint-
    * exempt) and both source rollups; totals ride a broadcast.
    */
  val dedupImpact: Q = Q("pipeline_dedup_impact", (s, dir) => {
    val d = Tables.t(s, dir, "documents").select(col("doc_id"), col("source"),
        md5(col("text")).as("h"),
        expr("CAST(size(filter(split(text, ' '), w -> w != '')) AS BIGINT)").as("nw"))
      .persist()
    val keep = d.groupBy("h").agg(min("doc_id").as("keep_id"))
      .select(col("h").as("kh"), col("keep_id"))
    val surv = d.join(keep,
      col("h") === col("kh") && col("doc_id") === col("keep_id"))
    val before = d.groupBy("source")
      .agg(count(lit(1)).as("n_docs"), sum("nw").as("tokens"))
    val after = surv.groupBy("source")
      .agg(count(lit(1)).as("n_kept"), sum("nw").as("tokens_kept"))
    val tb = before.agg(sum("tokens").as("tb"))
    val ta = after.agg(sum("tokens_kept").as("ta"))
    before.join(after, Seq("source"), "left")
      .crossJoin(broadcast(tb)).crossJoin(broadcast(ta))
      .select(col("source"), col("n_docs"),
        coalesce(col("n_kept"), lit(0L)).as("n_kept"), col("tokens"),
        coalesce(col("tokens_kept"), lit(0L)).as("tokens_kept"),
        expr("tokens * 10000 DIV tb").as("share_before_bp"),
        expr("coalesce(tokens_kept, 0L) * 10000 DIV ta").as("share_after_bp"),
        expr("coalesce(tokens_kept, 0L) * 10000 DIV ta - tokens * 10000 DIV tb")
          .as("shift_bp"))
      .orderBy("source")
  }, Some("""WITH d AS (SELECT doc_id, source, md5(text) AS h,
      CAST(len(list_filter(string_split(text, ' '), w -> w <> '')) AS BIGINT) AS nw
    FROM documents),
    k AS (SELECT h, min(doc_id) AS keep_id FROM d GROUP BY 1),
    sv AS (SELECT d.source, d.nw FROM d JOIN k ON k.h = d.h AND k.keep_id = d.doc_id),
    b AS (SELECT source, CAST(count(*) AS BIGINT) AS n_docs,
        CAST(sum(nw) AS BIGINT) AS tokens FROM d GROUP BY 1),
    a AS (SELECT source, CAST(count(*) AS BIGINT) AS n_kept,
        CAST(sum(nw) AS BIGINT) AS tokens_kept FROM sv GROUP BY 1),
    tb AS (SELECT CAST(sum(tokens) AS BIGINT) AS tb FROM b),
    ta AS (SELECT CAST(sum(tokens_kept) AS BIGINT) AS ta FROM a)
    SELECT b.source, b.n_docs, COALESCE(a.n_kept, 0) AS n_kept, b.tokens,
      COALESCE(a.tokens_kept, 0) AS tokens_kept,
      b.tokens * 10000 // t1.tb AS share_before_bp,
      COALESCE(a.tokens_kept, 0) * 10000 // t2.ta AS share_after_bp,
      COALESCE(a.tokens_kept, 0) * 10000 // t2.ta - b.tokens * 10000 // t1.tb AS shift_bp
    FROM b LEFT JOIN a USING (source) CROSS JOIN tb t1 CROSS JOIN ta t2
    ORDER BY b.source"""))

  val mixSample: Q = Q("mix_sample", (s, dir) => {
    val d = Tables.t(s, dir, "documents")
      .select(col("doc_id"), col("source"),
        graft.ops.Text.bpeTokens(col("text")).as("tok"))
    val st = d.groupBy("source")
      .agg(sum("tok").as("src_tokens"), count(lit(1)).as("n_docs"))
    val minTok = st.agg(min("src_tokens").as("min_tokens"))
    val rates = st.crossJoin(broadcast(minTok))
      .withColumn("rate_bp", expr("10000 * min_tokens DIV src_tokens"))
    d.join(rates, "source")
      .withColumn("keep", expr(
        "CAST(conv(substr(md5(concat('mix', CAST(doc_id AS STRING))), 1, 15), 16, 10) AS BIGINT) % 10000") < col("rate_bp"))
      .groupBy("source")
      .agg(max("n_docs").as("n_docs"), max("rate_bp").as("rate_bp"),
        count(when(col("keep"), 1)).as("n_kept"),
        coalesce(sum(when(col("keep"), col("tok"))), lit(0L)).as("kept_tokens"))
      .orderBy("source")
  }, Some("""WITH d AS (SELECT doc_id, source,
      CAST(len(regexp_extract_all(text, '[A-Za-z]+|[0-9]+|[^A-Za-z0-9\s]')) AS BIGINT) AS tok
      FROM documents),
    st AS (SELECT source, sum(tok) AS src_tokens, count(*) AS n_docs FROM d GROUP BY source),
    m AS (SELECT min(src_tokens) AS min_tokens FROM st),
    r AS (SELECT source, n_docs, CAST(10000 * m.min_tokens // src_tokens AS BIGINT) AS rate_bp
      FROM st, m)
    SELECT d.source, CAST(max(r.n_docs) AS BIGINT) AS n_docs, max(r.rate_bp) AS rate_bp,
      count(CASE WHEN CAST('0x' || substr(md5('mix' || CAST(doc_id AS VARCHAR)), 1, 15) AS BIGINT)
        % 10000 < r.rate_bp THEN 1 END) AS n_kept,
      CAST(coalesce(sum(CASE WHEN CAST('0x' || substr(md5('mix' || CAST(doc_id AS VARCHAR)), 1, 15) AS BIGINT)
        % 10000 < r.rate_bp THEN tok END), 0) AS BIGINT) AS kept_tokens
    FROM d JOIN r USING (source)
    GROUP BY d.source ORDER BY source"""))

  /** Temperature-based (α = 1/2) source mixing — allocate a 100-doc
    * training budget across sources ∝ √n_i ([[graft.ops.Sample
    * .temperatureAlloc]]: exact integer sqrt + cumulative-quota
    * apportionment that sums EXACTLY to the budget), then materialize
    * the sample per source in salted-hash order (the stratifiedTopN
    * window with a data-driven per-stratum n). Output is the mixing
    * manifest: counts, weight, allocation, and an md5 of the ordered
    * selected-id list — one hash catches any drift in the sqrt, the
    * apportionment, or the hash ordering.
    */
  val sampleTemperature: Q = Q("sample_temperature", (s, dir) => {
    val d = Tables.t(s, dir, "documents").select(col("doc_id"), col("source"))
    val alloc = graft.ops.Sample.temperatureAlloc(d, "source", budget = 100L)
      .persist()
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy("source").orderBy("h", "doc_id")
    val ranked = d
      .withColumn("h", graft.ops.Sample.hashOrder(col("doc_id"), "strat"))
      .withColumn("rn", row_number().over(w).cast("bigint"))
    val sel = ranked
      .join(broadcast(alloc.select(col("source"), col("alloc"))), "source")
      .filter(col("rn") <= col("alloc"))
    val agg = sel.groupBy("source")
      .agg(count(lit(1)).as("n_selected"),
        md5(array_join(expr(
          "transform(array_sort(collect_list(struct(rn, doc_id))), x -> CAST(x.doc_id AS STRING))"),
          ",")).as("sel_md5"))
    alloc.join(agg, Seq("source"), "left_outer")
      .select(col("source"), col("n_rows").as("n_docs"), col("weight"),
        col("alloc"),
        coalesce(col("n_selected"), lit(0L)).as("n_selected"),
        coalesce(col("sel_md5"), md5(lit(""))).as("sel_md5"))
      .orderBy("source")
  }, Some("""WITH c AS (
      SELECT source, count(*)::BIGINT AS n_rows FROM documents GROUP BY source),
    k AS (SELECT source, n_rows,
        CAST(floor(sqrt(CAST(n_rows AS DOUBLE))) AS BIGINT) AS k0 FROM c),
    wt AS (SELECT source, n_rows,
        CASE WHEN (k0 + 1) * (k0 + 1) <= n_rows THEN k0 + 1
             WHEN k0 * k0 > n_rows THEN k0 - 1 ELSE k0 END AS weight FROM k),
    cw AS (SELECT source, n_rows, weight,
        sum(weight) OVER (ORDER BY source ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cumw
      FROM wt),
    tw AS (SELECT sum(weight) AS tw FROM wt),
    alloc AS (SELECT source, n_rows, weight,
        (100 * cumw) // tw.tw - (100 * (cumw - weight)) // tw.tw AS alloc
      FROM cw, tw),
    r AS (SELECT doc_id, source, CAST(row_number() OVER (PARTITION BY source
        ORDER BY CAST('0x' || substr(md5('strat' || CAST(doc_id AS VARCHAR)), 1, 15) AS BIGINT),
          doc_id) AS BIGINT) AS rn
      FROM documents),
    sel AS (SELECT r.source, r.doc_id, r.rn
      FROM r JOIN alloc a ON a.source = r.source AND r.rn <= a.alloc),
    sa AS (SELECT source, count(*)::BIGINT AS n_selected,
        md5(list_aggregate(list(CAST(doc_id AS VARCHAR) ORDER BY rn), 'string_agg', ',')) AS sel_md5
      FROM sel GROUP BY source)
    SELECT a.source, a.n_rows AS n_docs, a.weight, CAST(a.alloc AS BIGINT) AS alloc,
      coalesce(sa.n_selected, 0) AS n_selected,
      coalesce(sa.sel_md5, md5('')) AS sel_md5
    FROM alloc a LEFT JOIN sa USING (source)
    ORDER BY source"""))

  /** Per-document top-3 TF-IDF terms — the classic distinctive-term
    * extractor (keyword tagging, near-boilerplate triage). Plan shape at
    * scale: one shuffle for per-(doc,word) TF, one vocabulary-keyed
    * shuffle for DF, the 1-row corpus count broadcast, and a per-doc
    * window for the top-k — nothing global, nothing driver-side. The
    * vocabulary join is left to AQE: DF fits in a broadcast for most
    * corpora but grows with vocabulary, so no forced hint.
    * Ranking key is round(,6) with a word tie-break (both engines order
    * identically at float boundaries); ln() over doubles is identical
    * IEEE math both sides (same pattern as text_word_entropy).
    */
  val tfidfTopTerms: Q = Q("text_tfidf", (s, dir) => {
    val words = Tables.t(s, dir, "documents")
      .select(col("doc_id"),
        explode(filter(split(lower(col("text")), " "), w => w =!= "")).as("word"))
    val tf = words.groupBy("doc_id", "word").agg(count(lit(1)).as("c"))
    val dl = tf.groupBy("doc_id").agg(sum("c").as("dl"))
    val dfreq = tf.groupBy("word").agg(count(lit(1)).as("df"))
    val ndocs = tf.agg(countDistinct(col("doc_id")).as("ndocs"))
    val scored = tf.join(dl, "doc_id").join(dfreq, "word")
      .crossJoin(broadcast(ndocs))
      .withColumn("s", (col("c") / col("dl")) * log(col("ndocs") / col("df")))
    val w = Window.partitionBy("doc_id").orderBy(round(col("s"), 6).desc, asc("word"))
    scored.withColumn("rnk", row_number().over(w).cast("bigint"))
      .filter(col("rnk") <= 3)
      .select(col("doc_id"), col("rnk"), col("word"), round(col("s"), 4).as("tfidf"))
      .orderBy("doc_id", "rnk")
  }, Some("""WITH w AS (SELECT doc_id,
        unnest(list_filter(string_split(lower(text), ' '), x -> x <> '')) AS word
      FROM documents),
    tf AS (SELECT doc_id, word, count(*) AS c FROM w GROUP BY doc_id, word),
    dl AS (SELECT doc_id, sum(c) AS dl FROM tf GROUP BY doc_id),
    df AS (SELECT word, count(*) AS df FROM tf GROUP BY word),
    n AS (SELECT count(DISTINCT doc_id) AS ndocs FROM tf),
    sc AS (SELECT tf.doc_id, tf.word,
        (tf.c * 1.0 / dl.dl) * ln(n.ndocs * 1.0 / df.df) AS s
      FROM tf JOIN dl USING (doc_id) JOIN df USING (word) CROSS JOIN n),
    r AS (SELECT doc_id, word, s,
        CAST(row_number() OVER (PARTITION BY doc_id
          ORDER BY round(s, 6) DESC, word ASC) AS BIGINT) AS rnk
      FROM sc)
    SELECT doc_id, rnk, word, round(s, 4) AS tfidf
    FROM r WHERE rnk <= 3 ORDER BY doc_id, rnk"""))

  /** Repetition-based quality filters (the Gopher/MassiveText family):
    * per-document fraction of bigram mass in duplicated bigrams, mass of
    * the most frequent bigram, and mass of the most frequent word — the
    * signals that catch boilerplate and degenerate repetition that
    * entropy alone smooths over. All ratios are integer basis points
    * (10000·x DIV n): exact integer arithmetic, immune to cross-engine
    * float rounding (same trick as text_stats.quality_bp). Per-doc
    * aggregation only — embarrassingly parallel at 100 TB.
    */
  /** Run-length stats over a SORTED string array, per row: (max run,
    * total length of runs longer than 1) == (top term count, duplicate
    * term occurrences) without exploding the array. Pure integer math on
    * exact string equality — bit-identical to the explode→count twin it
    * replaces, with ZERO shuffles instead of four: per-doc stats must
    * not pay a corpus-wide exchange at 100 TB.
    */
  private def runStats(sortedArr: String): String =
    s"""aggregate(
      $sortedArr,
      named_struct('prev', CAST(NULL AS STRING), 'run', CAST(0 AS BIGINT),
                   'maxr', CAST(0 AS BIGINT), 'dup', CAST(0 AS BIGINT)),
      (acc, x) -> IF(acc.prev IS NOT NULL AND x = acc.prev,
        named_struct('prev', x, 'run', acc.run + 1, 'maxr', acc.maxr, 'dup', acc.dup),
        named_struct('prev', x, 'run', CAST(1 AS BIGINT),
                     'maxr', greatest(acc.maxr, acc.run),
                     'dup', acc.dup + IF(acc.run > 1, acc.run, CAST(0 AS BIGINT)))),
      acc -> named_struct(
        'maxr', greatest(acc.maxr, acc.run),
        'dup', acc.dup + IF(acc.run > 1, acc.run, CAST(0 AS BIGINT))))"""

  val qualityRepetition: Q = Q("quality_repetition", (s, dir) => {
    Tables.t(s, dir, "documents")
      .select(col("doc_id"), filter(split(lower(col("text")), " "), w => w =!= "").as("w"))
      .filter(size(col("w")) >= 2)
      .withColumn("bg", expr(
        """array_sort(transform(sequence(1, size(w) - 1),
           i -> concat_ws(' ', element_at(w, i), element_at(w, i + 1))))"""))
      .withColumn("bs", expr(runStats("bg")))
      .withColumn("ws", expr(runStats("array_sort(w)")))
      .withColumn("n_words", size(col("w")).cast("bigint"))
      .withColumn("n_big", (size(col("w")) - 1).cast("bigint"))
      .select(col("doc_id"), col("n_words"), col("n_big"),
        expr("10000 * bs.dup DIV n_big").as("dup_bigram_bp"),
        expr("10000 * bs.maxr DIV n_big").as("top_bigram_bp"),
        expr("10000 * ws.maxr DIV n_words").as("top_word_bp"))
      .orderBy("doc_id")
  }, Some("""WITH d AS (SELECT doc_id,
        list_filter(string_split(lower(text), ' '), x -> x <> '') AS w
      FROM documents),
    d2 AS (SELECT doc_id, w FROM d WHERE len(w) >= 2),
    big AS (SELECT doc_id,
        unnest(list_transform(range(1, len(w)), i -> w[i] || ' ' || w[i+1])) AS bigram
      FROM d2),
    bc AS (SELECT doc_id, bigram, count(*) AS c FROM big GROUP BY doc_id, bigram),
    bstats AS (SELECT doc_id, sum(c) AS n_big,
        sum(CASE WHEN c > 1 THEN c ELSE 0 END) AS dup_big, max(c) AS top_big
      FROM bc GROUP BY doc_id),
    wc AS (SELECT doc_id, unnest(w) AS word FROM d2),
    wcc AS (SELECT doc_id, word, count(*) AS c FROM wc GROUP BY doc_id, word),
    wstats AS (SELECT doc_id, sum(c) AS n_words, max(c) AS top_word
      FROM wcc GROUP BY doc_id)
    SELECT b.doc_id, CAST(n_words AS BIGINT) AS n_words, CAST(n_big AS BIGINT) AS n_big,
      CAST(10000 * dup_big // n_big AS BIGINT) AS dup_bigram_bp,
      CAST(10000 * top_big // n_big AS BIGINT) AS top_bigram_bp,
      CAST(10000 * top_word // n_words AS BIGINT) AS top_word_bp
    FROM bstats b JOIN wstats USING (doc_id)
    ORDER BY doc_id"""))

  /** Corpus-wide top-20 bigrams — the vocabulary/collocation statistic a
    * tokenizer-training or data-audit pass computes: explode bigrams,
    * count, take the top-k. Partial (map-side) aggregation absorbs the
    * explosion before the single shuffle; the ordered limit plans as
    * TakeOrderedAndProject, so only 20 rows ever reach the driver side
    * regardless of corpus size. Ties broken lexicographically.
    */
  val topNgrams: Q = Q("text_top_ngrams", (s, dir) => {
    val w = Tables.t(s, dir, "documents")
      .select(filter(split(lower(col("text")), " "), x => x =!= "").as("w"))
      .filter(size(col("w")) >= 2)
    w.select(explode(transform(sequence(lit(1), size(col("w")) - 1), i =>
        concat_ws(" ", element_at(col("w"), i), element_at(col("w"), i + 1)))).as("bigram"))
      .groupBy("bigram").agg(count(lit(1)).as("n"))
      .orderBy(desc("n"), asc("bigram")).limit(20)
  }, Some("""SELECT bigram, count(*) AS n FROM (
      SELECT unnest(list_transform(range(1, len(w)), i -> w[i] || ' ' || w[i+1])) AS bigram
      FROM (SELECT list_filter(string_split(lower(text), ' '), x -> x <> '') AS w
        FROM documents) WHERE len(w) >= 2)
    GROUP BY bigram ORDER BY n DESC, bigram ASC LIMIT 20"""))

  /** Per-source corpus report — the dataset-card dashboard that composes
    * the per-doc operators: volume, token mass, integer-exact mean
    * quality, language spread, and fingerprint-duplicate incidence.
    */
  val corpusReport: Q = Q("corpus_report", (s, dir) => {
    val d = Tables.t(s, dir, "documents")
      .select(col("doc_id"), col("source"), col("lang"),
        length(col("text")).cast("bigint").as("n_chars"),
        size(filter(split(col("text"), " "), w => w =!= "")).cast("bigint").as("n_words"),
        regexp_count(col("text"), lit("[a-z]")).cast("bigint").as("n_alpha"),
        size(array_distinct(filter(split(lower(col("text")), " "), w => w =!= "")))
          .cast("bigint").as("n_distinct"),
        regexp_count(col("text"), lit("[A-Za-z]+|[0-9]+|[^A-Za-z0-9\\s]"))
          .cast("bigint").as("bpe_tokens"),
        md5(array_join(array_sort(array_distinct(
          filter(split(lower(col("text")), " "), w => w =!= ""))), " ")).as("fp"))
      .withColumn("quality_bp", expr("""(40 * least(n_words, 100) * n_chars * n_words
        + 3000 * n_alpha * n_words + 3000 * n_distinct * n_chars)
        DIV nullif(n_chars * n_words, 0)"""))
    val dupFps = d.groupBy("fp").agg(count(lit(1)).as("cnt")).filter(col("cnt") > 1)
      .select(col("fp").as("dup_fp"))
    // No broadcast hint: dup_fps grows with corpus size (unbounded at
    // 100 TB); AQE broadcasts it at runtime only when it actually fits.
    d.join(dupFps, col("fp") === col("dup_fp"), "left_outer")
      .groupBy("source")
      .agg(count(lit(1)).as("n_docs"),
        sum("bpe_tokens").as("total_tokens"),
        sum("quality_bp").as("sum_q"),
        countDistinct(col("lang")).as("n_langs"),
        count(col("dup_fp")).as("n_fp_dupes"))
      .select(col("source"), col("n_docs"), col("total_tokens"),
        expr("sum_q DIV n_docs").as("avg_quality_bp_floor"),
        col("n_langs"), col("n_fp_dupes"))
      .orderBy("source")
  }, Some("""WITH d AS (SELECT doc_id, source, lang,
      CAST(length(text) AS BIGINT) AS n_chars,
      CAST(len(list_filter(string_split(text, ' '), w -> w <> '')) AS BIGINT) AS n_words,
      CAST(len(regexp_extract_all(text, '[a-z]')) AS BIGINT) AS n_alpha,
      CAST(len(list_distinct(list_filter(string_split(lower(text), ' '), w -> w <> ''))) AS BIGINT) AS n_distinct,
      CAST(len(regexp_extract_all(text, '[A-Za-z]+|[0-9]+|[^A-Za-z0-9\s]')) AS BIGINT) AS bpe_tokens,
      md5(list_aggregate(list_sort(list_distinct(
        list_filter(string_split(lower(text), ' '), w -> w <> ''))), 'string_agg', ' ')) AS fp
      FROM documents),
    q AS (SELECT *, (40 * least(n_words, 100) * n_chars * n_words
        + 3000 * n_alpha * n_words + 3000 * n_distinct * n_chars)
        // nullif(n_chars * n_words, 0) AS quality_bp FROM d),
    dup AS (SELECT fp AS dup_fp FROM d GROUP BY fp HAVING count(*) > 1)
    SELECT source, count(*) AS n_docs,
      CAST(sum(bpe_tokens) AS BIGINT) AS total_tokens,
      CAST(sum(quality_bp) // count(*) AS BIGINT) AS avg_quality_bp_floor,
      count(DISTINCT lang) AS n_langs,
      count(dup_fp) AS n_fp_dupes
    FROM q LEFT JOIN dup ON q.fp = dup.dup_fp
    GROUP BY source ORDER BY source"""))

  /** Per-document word-distribution entropy (nats, rounded) — a
    * repetitiveness/quality signal: low entropy = templated or repeated
    * text. Shannon entropy over word frequencies, identical ln() double
    * math in both engines.
    */
  val wordEntropy: Q = Q("text_word_entropy", (s, dir) => {
    val words = Tables.t(s, dir, "documents")
      .select(col("doc_id"), explode(filter(split(lower(col("text")), " "), w => w =!= "")).as("word"))
    val freq = words.groupBy("doc_id", "word").agg(count(lit(1)).as("c"))
    val tot = freq.groupBy("doc_id").agg(sum("c").as("n"))
    freq.join(tot, "doc_id")
      .groupBy("doc_id")
      .agg(round(-sum((col("c") / col("n")) * log(col("c") / col("n"))), 6).as("entropy"),
        count(lit(1)).as("n_unique"))
      .orderBy("doc_id")
  }, Some("""WITH w AS (SELECT doc_id,
        unnest(list_filter(string_split(lower(text), ' '), x -> x <> '')) AS word
      FROM documents),
    f AS (SELECT doc_id, word, count(*) AS c FROM w GROUP BY doc_id, word),
    t AS (SELECT doc_id, c, sum(c) OVER (PARTITION BY doc_id) AS n FROM f)
    SELECT doc_id, round(-sum((c * 1.0 / n) * ln(c * 1.0 / n)), 6) AS entropy,
      count(*) AS n_unique
    FROM t GROUP BY doc_id ORDER BY doc_id"""))

  /** PII-style scrubbing: regex redaction of email-shaped tokens and long
    * digit runs (the pre-training safety pass). Patterns restricted to
    * the RE2 ∩ Java-regex common subset so both engines rewrite
    * identically; docs are synthesized with planted PII from events.
    */
  val textRedact: Q = Q("text_redact", (s, dir) => {
    val e = Tables.events(s, dir).select(col("event_id"),
      expr("""concat('contact u', CAST(user_id AS STRING), '@mail', CAST(user_id % 7 AS STRING),
        '.com id ', CAST(ts_us AS STRING), ' type ', event_type)""").as("text"))
    e.select(col("event_id"),
        regexp_replace(
          regexp_replace(col("text"), lit("[A-Za-z0-9._]+@[A-Za-z0-9.]+\\.[A-Za-z]+"), lit("<EMAIL>")),
          lit("[0-9]{6,}"), lit("<NUM>")).as("redacted"),
        regexp_count(col("text"), lit("[A-Za-z0-9._]+@[A-Za-z0-9.]+\\.[A-Za-z]+"))
          .cast("bigint").as("n_emails"),
        regexp_count(col("text"), lit("[0-9]{6,}")).cast("bigint").as("n_long_nums"))
      .orderBy("event_id")
  }, Some("""SELECT event_id,
      regexp_replace(
        regexp_replace(text, '[A-Za-z0-9._]+@[A-Za-z0-9.]+\.[A-Za-z]+', '<EMAIL>', 'g'),
        '[0-9]{6,}', '<NUM>', 'g') AS redacted,
      CAST(len(regexp_extract_all(text, '[A-Za-z0-9._]+@[A-Za-z0-9.]+\.[A-Za-z]+')) AS BIGINT) AS n_emails,
      CAST(len(regexp_extract_all(text, '[0-9]{6,}')) AS BIGINT) AS n_long_nums
    FROM (SELECT event_id,
      'contact u' || CAST(user_id AS VARCHAR) || '@mail' || CAST(user_id % 7 AS VARCHAR) ||
      '.com id ' || CAST(epoch_us(ts) AS VARCHAR) || ' type ' || event_type AS text
      FROM events)
    ORDER BY event_id"""))

  /** Edit-distance fuzzy normalization: truncated (typo'd) event types
    * matched back to their nearest canonical form by levenshtein — the
    * fuzzy-dedup / label-normalization primitive.
    */
  val fuzzyMatch: Q = Q("text_fuzzy_match", (s, dir) => {
    val e = Tables.events(s, dir)
    val typos = e.select(expr("substr(event_type, 1, length(event_type) - 1)").as("typo")).distinct()
    val canon = e.select(col("event_type").as("canon")).distinct()
    val pairs = typos.crossJoin(canon)
      .withColumn("lev", levenshtein(col("typo"), col("canon")).cast("bigint"))
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy("typo").orderBy(asc("lev"), asc("canon"))
    pairs.withColumn("rn", row_number().over(w)).filter(col("rn") === 1)
      .select("typo", "canon", "lev")
      .orderBy("typo")
  }, Some("""SELECT typo, canon, lev FROM (
      SELECT t.typo, c.canon,
        CAST(levenshtein(t.typo, c.canon) AS BIGINT) AS lev,
        row_number() OVER (PARTITION BY t.typo
          ORDER BY levenshtein(t.typo, c.canon) ASC, c.canon ASC) AS rn
      FROM (SELECT DISTINCT substr(event_type, 1, length(event_type) - 1) AS typo FROM events) t,
           (SELECT DISTINCT event_type AS canon FROM events) c)
    WHERE rn = 1 ORDER BY typo"""))

  /** Sliding-window document chunking (50-token windows, stride 40 — the
    * RAG/pre-tokenization context-prep step): one row per chunk with a
    * content hash, via the generic [[graft.ops.Text.chunk]] (chunk count
    * = 1 + ⌈(n − 50) ⁄ 40⌉ exactly — a document whose tail is already
    * fully covered gets NO redundant dangling chunk, unlike the naive
    * range-step emission). Pure per-doc array expressions —
    * embarrassingly parallel, zero shuffles before the presentation sort.
    */
  val docChunk: Q = Q("doc_chunk", (s, dir) => {
    val d = Tables.t(s, dir, "documents")
      .select(col("doc_id"), filter(split(col("text"), " "), w => w =!= "").as("w"))
      .filter(size(col("w")) >= 1)
    graft.ops.Text.chunk(d, "doc_id", "w", chunkTokens = 50, stride = 40)
      .select(col("doc_id"), (col("chunk_id") + 1).as("chunk_idx"),
        (col("start_tok") + 1).as("start_tok"), col("n_tokens"), col("chunk_md5"))
      .orderBy("doc_id", "chunk_idx")
  }, Some("""WITH d AS (
      SELECT doc_id, list_filter(string_split(text, ' '), x -> x <> '') AS w
      FROM documents),
    g AS (SELECT doc_id, w,
        1 + CASE WHEN len(w) > 50 THEN (len(w) - 50 + 39) // 40 ELSE 0 END AS nc
      FROM d WHERE len(w) >= 1),
    c AS (SELECT doc_id, j AS chunk_id, w[j*40+1 : j*40+50] AS toks
      FROM (SELECT doc_id, w, unnest(range(0, nc)) AS j FROM g))
    SELECT doc_id, CAST(chunk_id + 1 AS BIGINT) AS chunk_idx,
      CAST(chunk_id * 40 + 1 AS BIGINT) AS start_tok,
      CAST(len(toks) AS BIGINT) AS n_tokens,
      md5(list_aggregate(toks, 'string_agg', ' ')) AS chunk_md5
    FROM c ORDER BY doc_id, chunk_idx"""))

  /** Systematic PPS sample of the corpus weighted by word count
    * ([[graft.ops.Sample.ppsSystematic]] — Madow 1949, public; the
    * survey-sampling complement to [[samplePriority]]'s randomized-
    * order draw: inclusion here is proportional to document LENGTH, so
    * a token-budget-faithful audit sample weights long docs up
    * deterministically, and hits telescope to exactly n=50). Docs
    * heavier than T/50 appear with multiplicity — the certainty
    * stratum a PPS design surfaces explicitly.
    */
  val samplePps: Q = Q("sample_pps_systematic", (s, dir) => {
    val d = Tables.t(s, dir, "documents")
      .select(col("doc_id"),
        size(graft.ops.Text.words(col("text"))).cast("bigint").as("n_words"))
    graft.ops.Sample.ppsSystematic(d, "doc_id", "n_words", n = 50)
      .select(col("doc_id"), col("n_words"), col("n_hits"))
      .orderBy("doc_id")
  }, Some("""WITH d AS (
      SELECT doc_id,
        CAST(len(list_filter(string_split(lower(text), ' '), x -> x <> '')) AS BIGINT) AS n_words
      FROM documents),
    c AS (SELECT doc_id, n_words,
        CAST(sum(n_words) OVER (ORDER BY doc_id) AS BIGINT) AS cum,
        (SELECT CAST(sum(n_words) AS BIGINT) FROM d) AS t
      FROM d)
    SELECT doc_id, n_words,
      (cum * 50) // t - ((cum - n_words) * 50) // t AS n_hits
    FROM c
    WHERE (cum * 50) // t - ((cum - n_words) * 50) // t > 0
    ORDER BY doc_id"""))

  /** CONTENT-DEFINED chunking + chunk-level dup report (the
    * Karp–Rabin cut-point family behind LBFS/rsync/FastCDC — public;
    * [[docChunk]]'s fixed stride shifts every boundary after one
    * inserted word, CDC boundaries depend only on LOCAL content, so
    * shared passages chunk identically wherever they sit — the chunk
    * store dedup property). Stateless cut rule: a word ends a chunk
    * iff h60('cdc', word) % 64 == 0 (expected chunk ≈ 64 words; the
    * min/max clamps of FastCDC are an optimization, not semantics).
    * Chunks hash via the house md5-60 over their joined words; the
    * output is the corpus-level chunk-dedup report a 100 TB pipeline
    * reads before enabling chunk-store compression: chunk counts,
    * distinct chunks, dup rate, mean chunk length (all exact
    * integers).
    *
    * Scale shape: one posexplode, one per-doc cumulative-boundary
    * window (doc-bounded, never global), one grouped hash, one
    * summary aggregate — no joins at all.
    */
  val textCdcChunks: Q = Q("text_cdc_chunks", (s, dir) => {
    val ch = graft.ops.Text.cdcChunks(
      Tables.t(s, dir, "documents"), "doc_id", "text")
    ch.agg(countDistinct("doc_id").as("n_docs"),
        count(lit(1)).as("n_chunks"),
        countDistinct("chash").as("n_distinct_chunks"),
        sum("n_w").as("sum_w"))
      .select(col("n_docs"), col("n_chunks"), col("n_distinct_chunks"),
        expr("10000 * (n_chunks - n_distinct_chunks) DIV n_chunks").as("dup_bp"),
        expr("sum_w * 100 DIV n_chunks").as("avg_chunk_words_e2"))
  }, Some(s"""WITH ${graft.ops.Text.cdcChunksSqlCtes("documents", "doc_id", "text")}
    SELECT count(DISTINCT doc_id)::BIGINT AS n_docs,
      count(*)::BIGINT AS n_chunks,
      count(DISTINCT chash)::BIGINT AS n_distinct_chunks,
      CAST(10000 * (count(*) - count(DISTINCT chash)) // count(*) AS BIGINT) AS dup_bp,
      CAST(sum(n_w) * 100 // count(*) AS BIGINT) AS avg_chunk_words_e2
    FROM ch"""))

  /** Sentence-boundary-aware chunking ([[graft.ops.Text.chunkSentences]]
    * — ROADMAP "multilingual chunking grammar"): chunk edges snap to
    * sentence boundaries instead of a fixed stride; sentences pack
    * greedily into ≤ 25-token chunks, an over-budget sentence becomes
    * its own chunk. The synthetic corpus has no punctuation, so the
    * binding first injects deterministic terminators: word i (1-based)
    * of each doc ends a sentence iff h60(doc_id:':':i) % 5 == 0 — the
    * house md5 hash, identical in both engines, average sentence ≈ 5
    * tokens. The op itself is grammar-driven ([.!?。！？]\s+), so real
    * punctuated corpora (incl. CJK) need no injection. Shape: pure
    * per-doc array fold, zero shuffles before the presentation sort.
    */
  val docChunkSentences: Q = Q("doc_chunk_sentences", (s, dir) => {
    // the lambda runs interpreted either way (HOF), but graft_h60 is one
    // digest with no hex-string round-trip vs the md5→substr→conv chain
    graft.expressions.Md5Hash60.register(s)
    val d = Tables.t(s, dir, "documents")
      .select(col("doc_id"), filter(split(col("text"), " "), w => w =!= "").as("w"))
      .filter(size(col("w")) >= 1)
      .withColumn("txt", expr(
        """array_join(transform(w, (x, i) -> CASE
             WHEN graft_h60(concat(CAST(doc_id AS STRING), ':',
               CAST(i + 1 AS STRING))) % 5 = 0
             THEN concat(x, '.') ELSE x END), ' ')"""))
    graft.ops.Text.chunkSentences(d, "doc_id", "txt", maxTokens = 25)
      .orderBy("doc_id", "chunk_idx")
  }, Some("""WITH d AS (
      SELECT doc_id, list_filter(string_split(text, ' '), x -> x <> '') AS w
      FROM documents),
    r AS (
      SELECT doc_id,
        list_aggregate(list_transform(range(1, len(w)+1), i ->
          CASE WHEN ('0x'||substr(md5(doc_id::VARCHAR || ':' || i::VARCHAR),1,15))::BIGINT % 5 = 0
               THEN w[i] || '.' ELSE w[i] END), 'string_agg', ' ') AS txt
      FROM d WHERE len(w) >= 1),
    s0 AS (
      SELECT doc_id,
        list_filter(list_transform(string_split(
          regexp_replace(txt, '([.!?]|。|！|？)\s+', '\1' || chr(1), 'g'),
          chr(1)), x -> trim(x)), x -> x <> '') AS sents
      FROM r),
    s1 AS (
      SELECT doc_id, sents,
        list_transform(sents, s ->
          CAST(len(list_filter(string_split(s, ' '), x -> x <> '')) AS BIGINT)) AS tc
      FROM s0 WHERE len(sents) >= 1),
    a AS (
      SELECT doc_id, sents, tc,
        list_transform(range(1, len(sents)+1), i ->
          list_reduce(list_prepend(CAST(0 AS BIGINT), tc[1:i]), (acc, t) ->
            CASE WHEN acc % 1048576 > 0 AND acc % 1048576 + t > 25
                 THEN ((acc // 1048576) + 1) * 1048576 + t
                 ELSE acc + t END) // 1048576) AS cid
      FROM s1),
    e AS (
      SELECT doc_id, unnest(cid) AS chunk_id, unnest(sents) AS sent,
             unnest(tc) AS t, unnest(range(1, len(sents)+1)) AS si
      FROM a)
    SELECT doc_id, CAST(chunk_id + 1 AS BIGINT) AS chunk_idx,
      CAST(count(*) AS BIGINT) AS n_sentences, CAST(sum(t) AS BIGINT) AS n_tokens,
      md5(string_agg(sent, ' ' ORDER BY si)) AS chunk_md5
    FROM e GROUP BY doc_id, chunk_id
    ORDER BY doc_id, chunk_idx"""))

  /** Greedy sequential context packing: documents (in doc_id order) are
    * packed into 512-token training contexts by cumulative token count —
    * the batch-assembly step before tokenized examples ship to trainers.
    *
    * Distributed prefix-sum, NOT a global window: docs shard into
    * contiguous doc_id ranges (doc_id DIV 4096), the cumsum window is
    * partitioned per shard (parallel), and each shard's offset is the
    * prefix-sum of per-shard TOTALS — a second window over the tiny
    * aggregated relation (N/4096 rows), the only place a global ordering
    * survives. Results are bit-identical to the sequential cumsum.
    */
  val contextPack: Q = Q("context_pack", (s, dir) => {
    val d = Tables.t(s, dir, "documents")
      .select(col("doc_id"),
        size(filter(split(col("text"), " "), w => w =!= "")).cast("bigint").as("n_tokens"))
    // generic distributed prefix-sum packer in ops/Pack
    graft.ops.Pack.assignBins(d, "doc_id", "n_tokens", binTokens = 512L)
      .groupBy("bin")
      .agg(count(lit(1)).as("n_docs"), sum("n_tokens").as("sum_tokens"),
        min("doc_id").as("first_doc"), max("doc_id").as("last_doc"))
      .orderBy("bin")
  }, Some("""SELECT CAST(bin AS BIGINT) AS bin, count(*) AS n_docs,
      CAST(sum(n_tokens) AS BIGINT) AS sum_tokens,
      min(doc_id) AS first_doc, max(doc_id) AS last_doc
    FROM (SELECT doc_id, n_tokens,
        CAST((sum(n_tokens) OVER (ORDER BY doc_id ROWS UNBOUNDED PRECEDING) - n_tokens) // 512 AS BIGINT) AS bin
      FROM (SELECT doc_id,
          CAST(len(list_filter(string_split(text, ' '), x -> x <> '')) AS BIGINT) AS n_tokens
        FROM documents))
    GROUP BY bin ORDER BY bin"""))

  /** PACKED-CONTEXT BOUNDARY MANIFEST — the attention-mask spec that
    * rides with [[contextPack]]'s concatenation packing: a trainer that
    * packs documents into fixed 512-token contexts must RESET attention
    * at every document boundary (block-diagonal masking — the
    * sequence-packing correctness detail; Krell et al., "Efficient
    * Sequence Packing without Cross-contamination", arXiv:2107.02027 —
    * public). Per context: the sorted in-context start offsets of every
    * document beginning there (the mask reset points), doc/token
    * counts, and whether the context OPENS mid-document (a straddler
    * spilled in — its head tokens attend back into the previous
    * context's doc unless the consumer carries the boundary over).
    * Same distributed prefix-sum as the packer ([[graft.ops.Pack]]
    * `keepStart` — exclusive cumsum exposed), one aggregate on the bin
    * key; offsets sort NUMERICALLY before string-join on both engines
    * (the ann_shard_manifest cells discipline).
    *
    * GAP SEMANTICS (part of the contract, both engines agree): the bin
    * spine is SPARSE — a context bin with NO row in the manifest is one
    * that lies entirely inside a single straddling document (no document
    * starts there). Consumers must read a missing bin id as
    * `n_docs = 0, boundaries = '', starts_mid = 1` — wholly
    * mid-document, attention carries straight through. Only bins where
    * at least one document begins get a row; a document spanning k > 1
    * full 512-token contexts therefore leaves k-1 (or more) silent bins
    * between its start bin and the next emitted bin.
    */
  val packBoundaries: Q = Q("pipeline_pack_boundaries", (s, dir) => {
    val d = Tables.t(s, dir, "documents")
      .select(col("doc_id"),
        size(filter(split(col("text"), " "), w => w =!= "")).cast("bigint").as("n_tokens"))
    val b = graft.ops.Pack.assignBins(d, "doc_id", "n_tokens", binTokens = 512L,
        keepStart = true)
      .withColumn("off_in_bin", expr("start - bin * 512"))
    b.groupBy("bin")
      .agg(count(lit(1)).as("n_docs"), sum("n_tokens").as("sum_tokens"),
        expr("CAST(min(off_in_bin) > 0 AS BIGINT)").as("starts_mid"),
        expr("""array_join(transform(array_sort(
            collect_list(struct(off_in_bin, doc_id))),
            x -> CAST(x.off_in_bin AS STRING)), ',')""").as("boundaries"))
      .select(col("bin"), col("n_docs"), col("sum_tokens"), col("starts_mid"),
        col("boundaries"))
      .orderBy("bin")
  }, Some("""WITH d AS (SELECT doc_id,
      CAST(len(list_filter(string_split(text, ' '), x -> x <> '')) AS BIGINT) AS n_tokens
    FROM documents),
    p AS (SELECT doc_id, n_tokens,
        CAST(sum(n_tokens) OVER (ORDER BY doc_id ROWS UNBOUNDED PRECEDING) - n_tokens
          AS BIGINT) AS start
      FROM d),
    q AS (SELECT doc_id, n_tokens, start, start // 512 AS bin,
        start - (start // 512) * 512 AS off_in_bin FROM p)
    SELECT bin, CAST(count(*) AS BIGINT) AS n_docs,
      CAST(sum(n_tokens) AS BIGINT) AS sum_tokens,
      CAST(min(off_in_bin) > 0 AS BIGINT) AS starts_mid,
      string_agg(CAST(off_in_bin AS VARCHAR), ',' ORDER BY off_in_bin, doc_id)
        AS boundaries
    FROM q GROUP BY bin ORDER BY bin"""))

  /** EPOCH-AWARE PACKER — the end-to-end training-loader composition
    * (r12 verdict wishlist #2): pack fixed 512-token contexts in the
    * SHUFFLED training order of each epoch, not in doc_id order. The
    * position is the [[epochShuffle]] 3-round Feistel bijection (pos is
    * a valid pack key precisely because of the bijectivity
    * certificate), the packer is the same distributed prefix-sum
    * ([[graft.ops.Pack.assignBins]] keyed on pos — per-shard cumsum
    * windows, ONE sanctioned global window over the per-shard-totals
    * aggregate), and the emitted rows are the [[packBoundaries]]
    * attention-mask manifest per (epoch, context): sorted in-context
    * start offsets, doc/token counts, straddler flag. Missing-bin gap
    * semantics are identical to [[packBoundaries]] (a silent bin is
    * wholly mid-document). Scale shape: per epoch one corpus scan +
    * per-row Feistel arithmetic + the pack windows + one (epoch, bin)
    * aggregate — no data-sized global sort anywhere; this is the
    * relation a 1000-executor loader streams to read epoch e's
    * contexts in training order. Domain gate: loud broadcast
    * raise_error past the 2^40 Feistel domain (the epochShuffle
    * discipline).
    */
  val epochPack: Q = Q("pipeline_epoch_pack", (s, dir) => {
    val posSql = graft.ops.Sample.feistelPosSql("doc_id", "epoch", duck = false)
    val docs = Tables.t(s, dir, "documents")
      .select(col("doc_id"),
        size(filter(split(col("text"), " "), w => w =!= "")).cast("bigint").as("n_tokens"))
    val gate = docs.agg(max("doc_id").as("mx"), min("doc_id").as("mn"))
      .select(expr(s"""CASE WHEN mx >= ${1L << 40} OR mn < 0 THEN raise_error(
          'pipeline_epoch_pack: doc_id outside the 2^40 Feistel domain')
        ELSE 1 END""").as("_ok"))
    val gated = docs.crossJoin(broadcast(gate)).where(col("_ok") === 1)
      .drop("_ok")
    def packedEpoch(e: Long): org.apache.spark.sql.DataFrame = {
      val d = gated.withColumn("epoch", lit(e)).withColumn("pos", expr(posSql))
      // shardSize is a POSITION-DOMAIN width here, not a dense-id one:
      // 2^28-wide shards = 4096 shards over the 2^40 Feistel domain
      // (the resume-cursor bucket grid), each holding ~N/4096 dispersed
      // docs — the default 4096 would leave ~every doc alone in its own
      // shard and turn the per-shard-TOTALS window data-sized
      graft.ops.Pack.assignBins(d, "pos", "n_tokens", binTokens = 512L,
        shardSize = graft.ops.Sample.CursorBucketWidth, keepStart = true)
    }
    packedEpoch(0L).unionByName(packedEpoch(1L))
      .withColumn("off_in_bin", expr("start - bin * 512"))
      .groupBy("epoch", "bin")
      .agg(count(lit(1)).as("n_docs"), sum("n_tokens").as("sum_tokens"),
        expr("CAST(min(off_in_bin) > 0 AS BIGINT)").as("starts_mid"),
        expr("""array_join(transform(array_sort(
            collect_list(struct(off_in_bin, doc_id))),
            x -> CAST(x.off_in_bin AS STRING)), ',')""").as("boundaries"))
      .orderBy("epoch", "bin")
  }, Some {
    val posSql = graft.ops.Sample.feistelPosSql("doc_id", "epoch", duck = true)
    s"""WITH d AS (SELECT doc_id,
        CAST(len(list_filter(string_split(text, ' '), x -> x <> '')) AS BIGINT) AS n_tokens
      FROM documents),
    g AS (SELECT CASE WHEN max(doc_id) >= ${1L << 40} OR min(doc_id) < 0
        THEN error('pipeline_epoch_pack: doc_id outside the 2^40 Feistel domain')
        ELSE 1 END AS ok FROM d),
    e AS (SELECT CAST(x AS BIGINT) AS epoch FROM (VALUES (0), (1)) t(x)),
    p AS (SELECT doc_id, n_tokens, epoch, $posSql AS pos
      FROM d, e, g WHERE g.ok = 1),
    q AS (SELECT epoch, doc_id, n_tokens,
        CAST(sum(n_tokens) OVER (PARTITION BY epoch ORDER BY pos ROWS UNBOUNDED PRECEDING)
          - n_tokens AS BIGINT) AS start
      FROM p),
    r AS (SELECT epoch, doc_id, n_tokens, start // 512 AS bin,
        start - (start // 512) * 512 AS off_in_bin FROM q)
    SELECT epoch, bin, CAST(count(*) AS BIGINT) AS n_docs,
      CAST(sum(n_tokens) AS BIGINT) AS sum_tokens,
      CAST(min(off_in_bin) > 0 AS BIGINT) AS starts_mid,
      string_agg(CAST(off_in_bin AS VARCHAR), ',' ORDER BY off_in_bin, doc_id)
        AS boundaries
    FROM r GROUP BY epoch, bin ORDER BY epoch, bin"""
  })

  /** Composed CHUNK-INDEX pipeline — the embedding-index prep a RAG
    * system runs between raw corpus and encoder: (1) sliding-window
    * chunking ([[graft.ops.Text.chunk]], 50/40 — the registered
    * doc_chunk grammar), (2) EXACT chunk dedup by content hash (the
    * first (doc_id, chunk_id) copy survives — shared boilerplate
    * windows collapse before they waste encoder FLOPs), (3) packing
    * survivors into 512-token encoder batches
    * ([[graft.ops.Pack.assignBins]] — the distributed prefix-sum, no
    * global data window). One hash-exact oracle across the three
    * stages: a regression in the chunk grammar, the dedup rule, or the
    * packer surfaces here even if each stage's own query still passes.
    * Chunk key = doc_id·4096 + chunk_id (chunk counts are len/stride
    * bounded far under 4096), so the packer's shard key stays the
    * document.
    */
  val pipelineChunkIndex: Q = Q("pipeline_chunk_index", (s, dir) => {
    val d = Tables.t(s, dir, "documents")
      .select(col("doc_id"), filter(split(col("text"), " "), w => w =!= "").as("w"))
      .filter(size(col("w")) >= 1)
    val chunks = graft.ops.Text.chunk(d, "doc_id", "w", chunkTokens = 50, stride = 40)
    val wd = Window.partitionBy("chunk_md5").orderBy("doc_id", "chunk_id")
    val surv = chunks.withColumn("rn", row_number().over(wd))
      .filter(col("rn") === 1)
      .select(expr("doc_id * 4096 + chunk_id").as("ck_id"), col("n_tokens"))
    graft.ops.Pack.assignBins(surv, "ck_id", "n_tokens", binTokens = 512L)
      .groupBy("bin")
      .agg(count(lit(1)).as("n_chunks"), sum("n_tokens").as("sum_tokens"),
        min("ck_id").as("first_chunk"), max("ck_id").as("last_chunk"))
      .orderBy("bin")
  }, Some("""WITH d AS (
      SELECT doc_id, list_filter(string_split(text, ' '), x -> x <> '') AS w
      FROM documents),
    g AS (SELECT doc_id, w,
        1 + CASE WHEN len(w) > 50 THEN (len(w) - 50 + 39) // 40 ELSE 0 END AS nc
      FROM d WHERE len(w) >= 1),
    c0 AS (SELECT doc_id, j AS chunk_id, w[j*40+1 : j*40+50] AS toks
      FROM (SELECT doc_id, w, unnest(range(0, nc)) AS j FROM g)),
    ch AS (SELECT doc_id, chunk_id, CAST(len(toks) AS BIGINT) AS n_tokens,
        md5(list_aggregate(toks, 'string_agg', ' ')) AS chunk_md5 FROM c0),
    s AS (SELECT *, row_number() OVER (PARTITION BY chunk_md5
        ORDER BY doc_id, chunk_id) AS rn FROM ch),
    k AS (SELECT doc_id * 4096 + chunk_id AS ck_id, n_tokens FROM s WHERE rn = 1),
    b AS (SELECT ck_id, n_tokens,
        CAST((sum(n_tokens) OVER (ORDER BY ck_id ROWS UNBOUNDED PRECEDING) - n_tokens) // 512 AS BIGINT) AS bin
      FROM k)
    SELECT bin, count(*)::BIGINT AS n_chunks,
      CAST(sum(n_tokens) AS BIGINT) AS sum_tokens,
      min(ck_id) AS first_chunk, max(ck_id) AS last_chunk
    FROM b GROUP BY bin ORDER BY bin"""))

  /** DSIR-style importance weights for domain selection (Xie et al.,
    * "Data Selection for Language Models via Importance Resampling",
    * NeurIPS'23 — public): score every raw document by how much its
    * bigrams look like a TARGET domain (here lang='en', a subset of the
    * same corpus — the hashed-ngram feature space of the paper, minus
    * the hashing since the vocab is bounded). Per bigram the likelihood
    * ratio is the EXACT integer surrogate
    *   ratio_bp = 10000·(c_target+1)·n_raw DIV ((c_raw+1)·n_target)
    * (add-one smoothed both sides, total-count normalized), and a doc's
    * importance is the mean ratio over its bigrams — top 25 are the
    * docs importance RESAMPLING would keep first. Shape: one bigram
    * window pass, two partial-agg count shuffles over the
    * vocabulary-sized model, 1-row total broadcasts, model broadcast
    * back onto the bigram stream. At much larger corpora the
    * c_target·n_raw product needs the scale factored down (headroom
    * note: products stay < 2^63 while c·n < 9·10^14).
    */
  val qualityDsirWeights: Q = Q("quality_dsir_weights", (s, dir) => {
    val d = Tables.t(s, dir, "documents")
      .select(col("doc_id"), col("lang"), graft.ops.Text.words(col("text")).as("ws"))
    val pos = d.select(col("doc_id"), col("lang"), posexplode(col("ws")))
      .toDF("doc_id", "lang", "pos", "w")
    val ww = Window.partitionBy("doc_id").orderBy("pos")
    val pairs = pos.withColumn("w2", lead("w", 1).over(ww))
      .filter(col("w2").isNotNull)
      .select(col("doc_id"), col("lang"), col("w").as("w1"), col("w2"))
    val cRaw = pairs.groupBy("w1", "w2").agg(count(lit(1)).as("c_raw"))
    val cTgt = pairs.filter(col("lang") === "en")
      .groupBy("w1", "w2").agg(count(lit(1)).as("c_t"))
    val totals = pairs.agg(
      count(lit(1)).as("n_raw"),
      count(when(col("lang") === "en", 1)).as("n_t"))
    val model = cRaw.join(cTgt, Seq("w1", "w2"), "left")
      .na.fill(0L, Seq("c_t"))
      .crossJoin(broadcast(totals))
      .withColumn("ratio_bp", expr(
        "(10000 * (c_t + 1) * n_raw) DIV ((c_raw + 1) * n_t)"))
      .select(col("w1"), col("w2"), col("ratio_bp"))
    pairs.join(broadcast(model), Seq("w1", "w2"))
      .groupBy("doc_id").agg(
        first("lang").as("lang"),
        count(lit(1)).as("n_bigrams"),
        expr("sum(ratio_bp) DIV count(1)").as("importance_bp"))
      .orderBy(col("importance_bp").desc, col("doc_id")).limit(25)
  }, Some("""WITH d AS (
      SELECT doc_id, lang,
        list_filter(string_split(lower(text), ' '), x -> x <> '') AS ws
      FROM documents),
    pr AS (SELECT doc_id, lang,
        unnest(list_transform(range(1, greatest(len(ws) - 1, 0) + 1),
          i -> [ws[i], ws[i + 1]])) AS p
      FROM d),
    pairs AS (SELECT doc_id, lang, p[1] AS w1, p[2] AS w2 FROM pr),
    craw AS (SELECT w1, w2, count(*)::BIGINT AS c_raw FROM pairs GROUP BY w1, w2),
    ctgt AS (SELECT w1, w2, count(*)::BIGINT AS c_t FROM pairs
      WHERE lang = 'en' GROUP BY w1, w2),
    tot AS (SELECT count(*)::BIGINT AS n_raw,
        count(CASE WHEN lang = 'en' THEN 1 END)::BIGINT AS n_t FROM pairs),
    model AS (SELECT craw.w1, craw.w2,
        CAST((10000 * (coalesce(ctgt.c_t, 0) + 1) * tot.n_raw)
          // ((craw.c_raw + 1) * tot.n_t) AS BIGINT) AS ratio_bp
      FROM craw LEFT JOIN ctgt USING (w1, w2), tot)
    SELECT doc_id, min(lang) AS lang, count(*)::BIGINT AS n_bigrams,
      CAST(CAST(sum(m.ratio_bp) AS BIGINT) // count(*) AS BIGINT) AS importance_bp
    FROM pairs JOIN model m USING (w1, w2)
    GROUP BY doc_id
    ORDER BY importance_bp DESC, doc_id LIMIT 25"""))

  /** DoReMi-lite domain-mixture weights (Xie et al., "DoReMi:
    * Optimizing Data Mixtures Speeds Up Language Model Pretraining",
    * NeurIPS 2023 — public), the multiplicative-weights sibling of
    * [[qualityDsirWeights]]: per training domain (lang), iterate
    * w ← normalize(w · (1 + η·excess_loss)) for a fixed 4 rounds and
    * report both the final and the round-averaged mixture (DoReMi's
    * actual deliverable is the average). The reference-loss proxy is
    * deterministic — mean tokens per doc, truncating — and the whole
    * iteration is EXACT integer math: the linear (1 + ηx) update
    * replaces exp(ηx) (their first-order agreement is the mirror-
    * descent vs hedge equivalence), and each round renormalizes to
    * exactly 10⁴ bp via the telescoping cumulative-quota apportionment
    * (floor(10⁴·cum/W) diffed — the temperatureAlloc discipline).
    * Domains are a bounded categorical (#langs), so after one
    * distributed agg the iteration runs driver-side in identical Long
    * arithmetic (counted-small discipline, loud 4096 gate); the oracle
    * unrolls the 4 rounds as MATERIALIZED single-reference CTEs with a
    * running `aw` column so no round is referenced twice.
    */
  val pipelineDomainMixture: Q = Q("pipeline_domain_mixture", (s, dir) => {
    val Rounds = 4
    val Eta = 50L
    val perDomain = Tables.t(s, dir, "documents")
      .select(col("lang"),
        expr("CAST(size(filter(split(text, ' '), w -> w != '')) AS BIGINT)").as("nw"))
      .groupBy("lang")
      .agg(count(lit(1)).as("n_docs"), expr("sum(nw) DIV count(1)").as("loss"))
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2)))
      .sortBy(_._1)
    require(perDomain.length <= 4096,
      s"pipeline_domain_mixture: ${perDomain.length} domains exceed the counted-small gate")
    val d = perDomain.length.toLong
    val minLoss = perDomain.map(_._3).min
    val excess = perDomain.map(_._3 - minLoss)
    // equal start, apportioned to exactly 10^4
    val w = Array.tabulate(perDomain.length) { i =>
      10000L * (i + 1) / d - 10000L * i / d
    }
    val aw = new Array[Long](perDomain.length)
    (1 to Rounds).foreach { _ =>
      val u = Array.tabulate(perDomain.length)(i => w(i) * (10000L + Eta * excess(i)))
      val total = u.sum
      var cum = 0L
      var i = 0
      while (i < u.length) {
        val prev = cum
        cum += u(i)
        w(i) = 10000L * cum / total - 10000L * prev / total
        aw(i) += w(i)
        i += 1
      }
    }
    import s.implicits._
    perDomain.zipWithIndex.map { case ((lang, nDocs, loss), i) =>
      (lang, nDocs, loss, excess(i), w(i), aw(i) / Rounds)
    }.toSeq.toDF("lang", "n_docs", "loss", "excess", "w_bp", "w_avg_bp")
      .repartition(1).orderBy("lang")
  }, Some {
    val round: Int => String = r =>
      s"""r$r AS MATERIALIZED (SELECT lang, n_docs, loss, excess,
        (10000 * cu) // tw - (10000 * (cu - u)) // tw AS w,
        aw + ((10000 * cu) // tw - (10000 * (cu - u)) // tw) AS aw
      FROM (SELECT lang, n_docs, loss, excess, aw, u,
          sum(u) OVER (ORDER BY lang) AS cu, sum(u) OVER () AS tw
        FROM (SELECT *, w * (10000 + 50 * excess) AS u FROM r${r - 1})))"""
    s"""WITH ls AS MATERIALIZED (SELECT lang, count(*)::BIGINT AS n_docs,
        CAST(sum(len(list_filter(string_split(text, ' '), w -> w <> ''))) AS BIGINT)
          // count(*) AS loss
      FROM documents GROUP BY lang),
    ex AS MATERIALIZED (SELECT lang, n_docs, loss,
        loss - min(loss) OVER () AS excess,
        row_number() OVER (ORDER BY lang) AS idx,
        count(*) OVER () AS d
      FROM ls),
    r0 AS MATERIALIZED (SELECT lang, n_docs, loss, excess,
        10000 * idx // d - 10000 * (idx - 1) // d AS w, 0 AS aw FROM ex),
    ${(1 to 4).map(round).mkString(",\n    ")}
    SELECT lang, n_docs, CAST(loss AS BIGINT) AS loss,
      CAST(excess AS BIGINT) AS excess, CAST(w AS BIGINT) AS w_bp,
      CAST(aw // 4 AS BIGINT) AS w_avg_bp
    FROM r4 ORDER BY lang"""
  })

  /** Curriculum schedule assembly (Bengio et al., "Curriculum
    * Learning", ICML'09 — public): docs are tiered by the integer
    * quality score (easy ≥ 6400 bp, medium ≥ 5800, hard below — fixed
    * thresholds, so tiering is scale-stable), then interleaved
    * round-robin 1:1:1 into one deterministic training order:
    * position = 3·(rank within tier) + tier. Early positions mix one
    * doc from every difficulty band — the anti-collapse property a
    * curriculum wants — while within-tier order stays reproducible
    * (doc_id). The per-tier ranks are [[graft.ops.Sample.shardedRank]]
    * distributed prefix-counts, NOT a global row_number: parallelism =
    * #tiers × #id-shards at any corpus size.
    */
  val pipelineCurriculum: Q = Q("pipeline_curriculum", (s, dir) => {
    val feat = graft.ops.Text.qualityBp(Tables.t(s, dir, "documents"), "text")
      .select(col("doc_id"), col("quality_bp"))
      .withColumn("tier", expr(
        "CAST(CASE WHEN quality_bp >= 6400 THEN 0 WHEN quality_bp >= 5800 THEN 1 ELSE 2 END AS BIGINT)"))
    graft.ops.Sample.shardedRank(feat, "tier", "doc_id")
      .select(expr("rn * 3 + tier").as("pos"), col("doc_id"), col("tier"),
        col("quality_bp"))
      .orderBy("pos")
  }, Some("""WITH feat AS (SELECT doc_id,
      CAST(length(text) AS BIGINT) AS n_chars,
      CAST(len(list_filter(string_split(text, ' '), w -> w <> '')) AS BIGINT) AS n_words,
      CAST(len(regexp_extract_all(text, '[a-z]')) AS BIGINT) AS n_alpha,
      CAST(len(list_distinct(list_filter(string_split(lower(text), ' '), w -> w <> ''))) AS BIGINT) AS n_distinct
      FROM documents),
    qual AS (SELECT doc_id, CAST((40 * least(n_words, 100) * n_chars * n_words
        + 3000 * n_alpha * n_words + 3000 * n_distinct * n_chars)
        // nullif(n_chars * n_words, 0) AS BIGINT) AS quality_bp FROM feat),
    t AS (SELECT doc_id, quality_bp,
        CAST(CASE WHEN quality_bp >= 6400 THEN 0
          WHEN quality_bp >= 5800 THEN 1 ELSE 2 END AS BIGINT) AS tier FROM qual),
    r AS (SELECT doc_id, quality_bp, tier,
        row_number() OVER (PARTITION BY tier ORDER BY doc_id) - 1 AS rn FROM t)
    SELECT rn * 3 + tier AS pos, doc_id, tier, quality_bp
    FROM r ORDER BY pos"""))

  /** Boilerplate-phrase audit via the positional gram index — "where
    * does the corpus's most repeated 5-word phrase occur": the top gram
    * by (count, hash) from [[graft.ops.Text.gramPositionIndex]], every
    * (doc, position) occurrence, and the phrase TEXT recovered from the
    * first occurrence (which also verifies the index's positions round-
    * trip back to the words). This is the inspection step before a
    * span-dedup run — the same positional index, read as an IR phrase
    * lookup: an exact-phrase search is this query with the probe gram
    * hash supplied instead of argmaxed. Shape: one gram shuffle, a
    * 1-row broadcast probe, a broadcast phrase constant — the
    * occurrence scan never self-joins.
    */
  val textPhraseOccurrences: Q = Q("text_phrase_occurrences", (s, dir) => {
    val docs = Tables.t(s, dir, "documents")
      .select(col("doc_id"), graft.ops.Text.words(col("text")).as("w"))
    // persisted: the index feeds the argmax and the occurrence scan
    val idx = graft.ops.Text.gramPositionIndex(docs, "doc_id", "w", 5).persist()
    val top = idx.groupBy("gh").agg(count(lit(1)).as("n_occ"))
      .orderBy(desc("n_occ"), asc("gh")).limit(1)
    val occ = idx.join(broadcast(top), "gh").persist()
    val first = occ.orderBy("doc_id", "p").limit(1)
      .select(col("doc_id").as("f_doc"), col("p").as("f_p"))
    val phrase = docs.join(broadcast(first), col("doc_id") === col("f_doc"))
      .select(array_join(expr("slice(w, CAST(f_p AS INT) + 1, 5)"), " ").as("phrase"))
    occ.crossJoin(broadcast(phrase))
      .select(col("phrase"), col("doc_id"), col("p"), col("n_occ"))
      .orderBy("doc_id", "p")
  }, Some("""WITH d AS (
      SELECT doc_id, list_filter(string_split(lower(text), ' '), x -> x <> '') AS w
      FROM documents),
    jd AS (SELECT doc_id, w,
        unnest(range(1, greatest(len(w) - 4, 0) + 1)) AS j
      FROM d),
    g AS (SELECT doc_id, CAST(j - 1 AS BIGINT) AS p,
        CAST('0x' || substr(md5(list_aggregate(w[j:j+4], 'string_agg', ' ')), 1, 15) AS BIGINT) AS gh
      FROM jd),
    top AS (SELECT gh, count(*)::BIGINT AS n_occ FROM g GROUP BY gh
      ORDER BY n_occ DESC, gh ASC LIMIT 1),
    occ AS (SELECT doc_id, p, n_occ FROM g JOIN top USING (gh)),
    f AS (SELECT doc_id AS f_doc, p AS f_p FROM occ ORDER BY doc_id, p LIMIT 1),
    ph AS (SELECT list_aggregate(d.w[CAST(f.f_p AS BIGINT) + 1 : CAST(f.f_p AS BIGINT) + 5],
        'string_agg', ' ') AS phrase
      FROM d JOIN f ON d.doc_id = f.f_doc)
    SELECT ph.phrase, occ.doc_id, occ.p, occ.n_occ
    FROM occ, ph ORDER BY occ.doc_id, occ.p"""))

  /** Generator surface (posexplode / LATERAL VIEW): the first three words
    * of each doc with their ordinal positions.
    */
  val posExplodeWords: Q = Q("text_posexplode", (s, dir) => {
    Tables.t(s, dir, "documents")
      .select(col("doc_id"),
        posexplode(slice(filter(split(lower(col("text")), " "), w => w =!= ""), 1, 3)))
      .select(col("doc_id"), (col("pos") + 1).cast("bigint").as("ord"), col("col").as("word"))
      .orderBy("doc_id", "ord")
  }, Some("""SELECT doc_id, CAST(i AS BIGINT) AS ord, w[i] AS word
    FROM (SELECT doc_id,
      list_filter(string_split(lower(text), ' '), x -> x <> '') AS w
      FROM documents), range(1, 4) r(i)
    WHERE i <= len(w)
    ORDER BY doc_id, ord"""))

  /** Length / word / punctuation / duplication statistics + a composite
    * quality score (the classic pre-training quality-filter features).
    * The score is computed in EXACT integer arithmetic (basis points over
    * the common denominator n_chars*n_words): floating-point rounding of
    * 0.4*min(w/100,1)+0.3*a/c+0.3*d/w straddles round-boundaries between
    * engines (observed at sf0.1), integer floor-division cannot.
    */
  val textStats: Q = Q("text_stats", (s, dir) => {
    Tables.t(s, dir, "documents")
      .select(col("doc_id"),
        length(col("text")).cast("bigint").as("n_chars"),
        size(filter(split(col("text"), " "), w => w =!= "")).cast("bigint").as("n_words"),
        regexp_count(col("text"), lit("[a-z]")).cast("bigint").as("n_alpha"),
        size(array_distinct(filter(split(lower(col("text")), " "), w => w =!= "")))
          .cast("bigint").as("n_distinct"))
      .select(col("doc_id"), col("n_chars"), col("n_words"), col("n_alpha"), col("n_distinct"),
        expr("""(40 * least(n_words, 100) * n_chars * n_words
          + 3000 * n_alpha * n_words + 3000 * n_distinct * n_chars)
          DIV nullif(n_chars * n_words, 0)""").as("quality_bp"))
      .orderBy("doc_id")
  }, Some("""SELECT doc_id, n_chars, n_words, n_alpha, n_distinct,
      (40 * least(n_words, 100) * n_chars * n_words
        + 3000 * n_alpha * n_words + 3000 * n_distinct * n_chars)
        // nullif(n_chars * n_words, 0) AS quality_bp
    FROM (SELECT doc_id,
      CAST(length(text) AS BIGINT) AS n_chars,
      CAST(len(list_filter(string_split(text, ' '), w -> w <> '')) AS BIGINT) AS n_words,
      CAST(len(regexp_extract_all(text, '[a-z]')) AS BIGINT) AS n_alpha,
      CAST(len(list_distinct(list_filter(string_split(lower(text), ' '), w -> w <> ''))) AS BIGINT) AS n_distinct
    FROM documents) ORDER BY doc_id"""))

  /** Stopword-profile language ID (n-gram/stopword heuristic): score each
    * candidate language by distinct-stopword hits, argmax with a fixed
    * priority tie-break. A real pipeline swaps in bigger profiles; the
    * operator shape (per-doc set intersection against broadcast literal
    * lists) is the point.
    */
  val langId: Q = Q("lang_id", (s, dir) => {
    val en = Seq("the", "a", "and", "of", "to", "in", "is")
    val de = Seq("der", "die", "das", "und", "ist", "nicht")
    val fr = Seq("le", "la", "les", "et", "est", "une")
    val es = Seq("el", "los", "y", "es", "una", "que")
    def score(words: org.apache.spark.sql.Column, list: Seq[String]) =
      size(filter(words, w => w.isin(list.map(lit(_)): _*))).cast("bigint")
    val d = Tables.t(s, dir, "documents")
      .select(col("doc_id"), col("lang"),
        array_distinct(filter(split(lower(col("text")), " "), w => w =!= "")).as("words"))
      .select(col("doc_id"), col("lang"),
        score(col("words"), en).as("s_en"), score(col("words"), de).as("s_de"),
        score(col("words"), fr).as("s_fr"), score(col("words"), es).as("s_es"))
    d.select(col("doc_id"), col("lang"), col("s_en"), col("s_de"), col("s_fr"), col("s_es"),
        expr("""CASE WHEN s_en >= s_de AND s_en >= s_fr AND s_en >= s_es AND s_en > 0 THEN 'en'
          WHEN s_de >= s_fr AND s_de >= s_es AND s_de > 0 THEN 'de'
          WHEN s_fr >= s_es AND s_fr > 0 THEN 'fr'
          WHEN s_es > 0 THEN 'es'
          ELSE 'und' END""").as("pred_lang"))
      .orderBy("doc_id")
  }, Some("""SELECT doc_id, lang, s_en, s_de, s_fr, s_es,
      CASE WHEN s_en >= s_de AND s_en >= s_fr AND s_en >= s_es AND s_en > 0 THEN 'en'
        WHEN s_de >= s_fr AND s_de >= s_es AND s_de > 0 THEN 'de'
        WHEN s_fr >= s_es AND s_fr > 0 THEN 'fr'
        WHEN s_es > 0 THEN 'es'
        ELSE 'und' END AS pred_lang
    FROM (SELECT doc_id, lang,
      CAST(len(list_filter(words, w -> w IN ('the','a','and','of','to','in','is'))) AS BIGINT) AS s_en,
      CAST(len(list_filter(words, w -> w IN ('der','die','das','und','ist','nicht'))) AS BIGINT) AS s_de,
      CAST(len(list_filter(words, w -> w IN ('le','la','les','et','est','une'))) AS BIGINT) AS s_fr,
      CAST(len(list_filter(words, w -> w IN ('el','los','y','es','una','que'))) AS BIGINT) AS s_es
      FROM (SELECT doc_id, lang,
        list_distinct(list_filter(string_split(lower(text), ' '), w -> w <> '')) AS words
        FROM documents))
    ORDER BY doc_id"""))

  /** Whitespace + BPE-ish tokenization counts: maximal alpha runs, digit
    * runs, and single non-alnum marks — a cheap, deterministic proxy for
    * subword token counts.
    */
  val tokenCount: Q = Q("token_count", (s, dir) => {
    Tables.t(s, dir, "documents")
      .select(col("doc_id"),
        size(filter(split(col("text"), " "), w => w =!= "")).cast("bigint").as("ws_tokens"),
        regexp_count(col("text"), lit("[A-Za-z]+|[0-9]+|[^A-Za-z0-9\\s]")).cast("bigint").as("bpe_tokens"),
        length(col("text")).cast("bigint").as("n_chars"))
      .withColumn("chars_per_token", round(col("n_chars") / col("bpe_tokens"), 4))
      .orderBy("doc_id")
  }, Some("""SELECT doc_id,
      CAST(len(list_filter(string_split(text, ' '), w -> w <> '')) AS BIGINT) AS ws_tokens,
      CAST(len(regexp_extract_all(text, '[A-Za-z]+|[0-9]+|[^A-Za-z0-9\s]')) AS BIGINT) AS bpe_tokens,
      CAST(length(text) AS BIGINT) AS n_chars,
      round(length(text) * 1.0 / len(regexp_extract_all(text, '[A-Za-z]+|[0-9]+|[^A-Za-z0-9\s]')), 4) AS chars_per_token
    FROM documents ORDER BY doc_id"""))

  /** Canonical document fingerprint: md5 of the sorted distinct word set —
    * key-collision clustering for template/boilerplate detection.
    */
  val docFingerprint: Q = Q("doc_fingerprint", (s, dir) => {
    Tables.t(s, dir, "documents")
      .select(col("doc_id"),
        graft.ops.Text.fingerprint(col("text")).as("fingerprint"))
      .orderBy("doc_id")
  }, Some("""SELECT doc_id,
      md5(list_aggregate(list_sort(list_distinct(
        list_filter(string_split(lower(text), ' '), w -> w <> ''))), 'string_agg', ' ')) AS fingerprint
    FROM documents ORDER BY doc_id"""))

  /** Multimodal column plumbing over a REAL binary container: each doc
    * carries actual BMP / animated-PNG / GIF header bytes
    * (ops/Media.assetHexExpr builds the per-format layout — correct
    * magics, endianness, fixed-offset dimension fields — from
    * deterministic per-doc parameters, since the testdata ships no
    * image blobs), and the metadata comes out of the codegen'd
    * byte-level decoder [[graft.expressions.ImageHeaderDecode]]:
    * magic sniff, le/be dimension parse, APNG acTL frame count. The
    * DuckDB oracle re-decodes the SAME blob by hex offset arithmetic,
    * so the two sides agree only if the byte layout and the parse are
    * both right. The checksum hashes the canonical hex encoding of
    * the asset (DuckDB's sha256 is VARCHAR-only). Per-row, zero
    * shuffle, whole-stage codegen throughout.
    */
  val multimodalMeta: Q = Q("multimodal_meta", (s, dir) => {
    graft.expressions.ImageHeaderDecode.register(s)
    val assetHex = graft.ops.Media.assetHexExpr(
      "doc_id", "CAST(octet_length(text) AS BIGINT)")
    Tables.t(s, dir, "documents")
      .select(col("doc_id"), expr(s"unhex($assetHex)").as("asset"))
      .withColumn("m", expr("image_header_decode(asset)"))
      .select(col("doc_id"),
        expr("CAST(octet_length(asset) AS BIGINT)").as("byte_len"),
        expr("sha2(hex(asset), 256)").as("sha"),
        col("m.format").as("format"), col("m.width").as("width"),
        col("m.height").as("height"), col("m.frames").as("frames"))
      .orderBy("doc_id")
  }, Some {
    val assetHex = graft.ops.Media.assetHexExpr(
      "doc_id", "CAST(octet_length(encode(text)) AS BIGINT)")
    s"""WITH a AS (SELECT doc_id, unhex($assetHex) AS asset FROM documents),
    hx AS (SELECT doc_id, asset, hex(asset) AS h FROM a)
    SELECT doc_id, CAST(octet_length(asset) AS BIGINT) AS byte_len,
      sha256(hex(asset)) AS sha,
      ${graft.ops.Media.duckFormatExpr("h")} AS format,
      CAST(${graft.ops.Media.duckWidthExpr("h")} AS BIGINT) AS width,
      CAST(${graft.ops.Media.duckHeightExpr("h")} AS BIGINT) AS height,
      CAST(${graft.ops.Media.duckFramesExpr("h")} AS BIGINT) AS frames
    FROM hx ORDER BY doc_id"""
  })

  /** Resize/letterbox planning for the multimodal column: dimensions
    * come from the REAL container decode (the same
    * [[graft.expressions.ImageHeaderDecode]] pass as
    * [[multimodalMeta]] — the two ops read the same bytes so they can
    * never disagree about an asset), then compute the fixed-point
    * scale that fits a 224×224 canvas without upscaling, the scaled
    * output box, and the centering pad offsets. This is the WORK-PLAN
    * side of image resize — what a preprocessing cluster must agree on
    * deterministically before any pixel moves; the pixel pass belongs
    * to the codec stage. Pure per-row integer math (scale in
    * millionths, truncating DIV both engines), zero shuffle.
    */
  /** Audio twin of [[multimodalMeta]]: each doc carries a REAL 44-byte
    * PCM WAV header (ops/Media.wavHexExpr — to-spec RIFF layout,
    * little-endian fields, rotated sample rates, mono/stereo
    * alternation) decoded by the codegen'd byte-level
    * [[graft.expressions.AudioHeaderDecode]]: magic checks, fmt-chunk
    * field parse, per-channel sample count from data size / block
    * align, plus the derived integer duration. The DuckDB oracle
    * re-decodes the SAME blob by hex offsets. Per-row, zero shuffle.
    */
  val multimodalAudioMeta: Q = Q("multimodal_audio_meta", (s, dir) => {
    graft.expressions.AudioHeaderDecode.register(s)
    val wavHex = graft.ops.Media.wavHexExpr(
      "doc_id", "CAST(octet_length(text) AS BIGINT)")
    Tables.t(s, dir, "documents")
      .select(col("doc_id"), expr(s"audio_header_decode(unhex($wavHex))").as("m"))
      .select(col("doc_id"), col("m.format").as("format"),
        col("m.channels").as("channels"), col("m.sample_rate").as("sample_rate"),
        col("m.bits").as("bits"), col("m.n_samples").as("n_samples"))
      .withColumn("duration_ms", expr("1000 * n_samples DIV sample_rate"))
      .orderBy("doc_id")
  }, Some {
    import graft.ops.Media
    val wavHex = Media.wavHexExpr(
      "doc_id", "CAST(octet_length(encode(text)) AS BIGINT)")
    s"""WITH hx AS (SELECT doc_id, hex(unhex($wavHex)) AS h FROM documents),
    d AS (SELECT doc_id,
        CASE WHEN ${Media.duckWavOk("h")} THEN 'wav' END AS format,
        CAST(${Media.duckWavChannels("h")} AS BIGINT) AS channels,
        CAST(${Media.duckWavSampleRate("h")} AS BIGINT) AS sample_rate,
        CAST(${Media.duckWavBits("h")} AS BIGINT) AS bits,
        CAST(${Media.duckWavSamples("h")} AS BIGINT) AS n_samples
      FROM hx)
    SELECT doc_id, format, channels, sample_rate, bits, n_samples,
      CAST(1000 * n_samples // sample_rate AS BIGINT) AS duration_ms
    FROM d ORDER BY doc_id"""
  })

  /** Video-container metadata scan — completes the multimodal container
    * family (BMP/APNG/GIF images, WAV audio) with the AVI (RIFF) sibling:
    * REAL byte decode through the codegen'd
    * [[graft.expressions.VideoHeaderDecode]] (canonical 88-byte header
    * built by [[graft.ops.Media.aviHexExpr]] in the shared hex dialect;
    * the oracle re-decodes the same bytes via hex-offset arithmetic).
    * Derives the two numbers a frame-sampling pipeline schedules by:
    * duration (frames × µs-per-frame, exact integer ms) and fps in
    * centi-fps (10⁸ DIV µs-per-frame — 2400/2500/3000). Pure per-row
    * column math inside whole-stage codegen, no joins.
    */
  val multimodalVideoMeta: Q = Q("multimodal_video_meta", (s, dir) => {
    graft.expressions.VideoHeaderDecode.register(s)
    val aviHex = graft.ops.Media.aviHexExpr("doc_id")
    Tables.t(s, dir, "documents")
      .select(col("doc_id"), expr(s"video_header_decode(unhex($aviHex))").as("m"))
      .select(col("doc_id"), col("m.format").as("format"),
        col("m.usec_per_frame").as("usec_per_frame"),
        col("m.n_frames").as("n_frames"), col("m.streams").as("streams"),
        col("m.width").as("width"), col("m.height").as("height"))
      .withColumn("duration_ms", expr("(n_frames * usec_per_frame) DIV 1000"))
      .withColumn("fps_e2", expr("100000000 DIV usec_per_frame"))
      .orderBy("doc_id")
  }, Some {
    import graft.ops.Media
    val aviHex = Media.aviHexExpr("doc_id")
    s"""WITH hx AS (SELECT doc_id, hex(unhex($aviHex)) AS h FROM documents),
    d AS (SELECT doc_id,
        CASE WHEN ${Media.duckAviOk("h")} THEN 'avi' END AS format,
        CAST(${Media.duckAviUsec("h")} AS BIGINT) AS usec_per_frame,
        CAST(${Media.duckAviFrames("h")} AS BIGINT) AS n_frames,
        CAST(${Media.duckAviStreams("h")} AS BIGINT) AS streams,
        CAST(${Media.duckAviWidth("h")} AS BIGINT) AS width,
        CAST(${Media.duckAviHeight("h")} AS BIGINT) AS height
      FROM hx)
    SELECT doc_id, format, usec_per_frame, n_frames, streams, width, height,
      CAST((n_frames * usec_per_frame) // 1000 AS BIGINT) AS duration_ms,
      CAST(100000000 // usec_per_frame AS BIGINT) AS fps_e2
    FROM d ORDER BY doc_id"""
  })

  /** JPEG (JFIF) frame-header metadata — the one container in the
    * multimodal family whose fields are NOT at fixed offsets: SOF sits
    * behind a marker walk over variable-length segments
    * ([[graft.expressions.JpegHeaderDecode]], bounded at MaxSegments;
    * the oracle unrolls the IDENTICAL walk as a hex-offset CTE chain —
    * [[graft.ops.Media.duckJpegWalkCtes]]). The synthetic headers vary
    * both segment LENGTH (doc-derived COM payload) and segment COUNT
    * (a second COM on every 4th doc), and rotate baseline/progressive
    * SOF markers, so the walk is exercised, not decorative. Pure
    * per-row codegen'd decode — zero shuffle beyond the output sort.
    */
  val multimodalJpegMeta: Q = Q("multimodal_jpeg_meta", (s, dir) => {
    graft.expressions.JpegHeaderDecode.register(s)
    val jh = graft.ops.Media.jpegHexExpr("doc_id", "n_chars")
    Tables.t(s, dir, "documents")
      .select(col("doc_id"), expr(s"jpeg_header_decode(unhex($jh))").as("m"))
      .select(col("doc_id"), col("m.format").as("format"),
        col("m.precision").as("bit_depth"), col("m.width").as("width"),
        col("m.height").as("height"),
        col("m.n_components").as("n_components"),
        col("m.n_skipped").as("n_skipped"), col("m.has_exif").as("has_exif"))
      .withColumn("pixels", expr("width * height"))
      .orderBy("doc_id")
  }, Some {
    import graft.ops.Media
    val jh = Media.jpegHexExpr("doc_id", "n_chars")
    val (walk, last) = Media.duckJpegWalkCtes("hx", "h")
    val k = graft.expressions.JpegHeaderDecode.MaxSegments
    s"""WITH hx AS (SELECT doc_id, hex(unhex($jh)) AS h FROM documents),
    $walk
    SELECT doc_id,
      CASE WHEN s$k IS NULL THEN NULL
        WHEN substr(h, s$k * 2 + 1, 4) = 'FFC0' THEN 'jpeg_baseline'
        ELSE 'jpeg_progressive' END AS format,
      CAST('0x' || substr(h, (s$k + 4) * 2 + 1, 2) AS BIGINT) AS bit_depth,
      CAST('0x' || substr(h, (s$k + 7) * 2 + 1, 4) AS BIGINT) AS width,
      CAST('0x' || substr(h, (s$k + 5) * 2 + 1, 4) AS BIGINT) AS height,
      CAST('0x' || substr(h, (s$k + 9) * 2 + 1, 2) AS BIGINT) AS n_components,
      CASE WHEN s$k IS NULL THEN NULL ELSE f$k END AS n_skipped,
      CASE WHEN s$k IS NULL THEN NULL ELSE e$k END AS has_exif,
      CAST('0x' || substr(h, (s$k + 7) * 2 + 1, 4) AS BIGINT)
        * CAST('0x' || substr(h, (s$k + 5) * 2 + 1, 4) AS BIGINT) AS pixels
    FROM $last ORDER BY doc_id"""
  })

  /** MP4 / ISO-BMFF movie-header metadata — the dominant video
    * container, and the second walk-shaped one beside JPEG: `mvhd`
    * sits behind a BOX WALK over variable-size boxes
    * ([[graft.expressions.Mp4HeaderDecode]], bounded at MaxBoxes; the
    * oracle unrolls the IDENTICAL walk as a hex-offset CTE chain —
    * [[graft.ops.Media.duckMp4WalkCtes]]). The synthetic headers vary
    * both box LENGTH (doc-derived `free` payload) and box COUNT (a
    * `skip` box on every 5th doc), rotate major brands and timescales,
    * and carry a full spec-shaped 108-byte version-0 mvhd. duration_ms
    * is exact integer math (units · 1000 DIV timescale). Pure per-row
    * codegen'd decode — zero shuffle beyond the output sort.
    */
  val multimodalMp4Meta: Q = Q("multimodal_mp4_meta", (s, dir) => {
    graft.expressions.Mp4HeaderDecode.register(s)
    val mh = graft.ops.Media.mp4HexExpr("doc_id", "n_chars")
    Tables.t(s, dir, "documents")
      .select(col("doc_id"), expr(s"mp4_header_decode(unhex($mh))").as("m"))
      .select(col("doc_id"), col("m.major_brand").as("major_brand"),
        col("m.n_skipped").as("n_skipped"), col("m.has_free").as("has_free"),
        col("m.timescale").as("timescale"), col("m.duration").as("duration"))
      .withColumn("duration_ms", expr("duration * 1000 DIV timescale"))
      .orderBy("doc_id")
  }, Some {
    import graft.ops.Media
    val mh = Media.mp4HexExpr("doc_id", "n_chars")
    val (walk, last) = Media.duckMp4WalkCtes("hx", "h")
    val k = graft.expressions.Mp4HeaderDecode.MaxBoxes
    s"""WITH hx AS (SELECT doc_id, hex(unhex($mh)) AS h FROM documents),
    $walk
    SELECT doc_id,
      CASE WHEN m$k IS NULL THEN NULL
        WHEN br$k = '69736F6D' THEN 'isom'
        WHEN br$k = '6D703432' THEN 'mp42'
        WHEN br$k = '61766331' THEN 'avc1' END AS major_brand,
      CASE WHEN m$k IS NULL THEN NULL ELSE n$k END AS n_skipped,
      CASE WHEN m$k IS NULL THEN NULL ELSE fr$k END AS has_free,
      CAST('0x' || substr(h, m$k * 2 + 57, 8) AS BIGINT) AS timescale,
      CAST('0x' || substr(h, m$k * 2 + 65, 8) AS BIGINT) AS duration,
      CAST('0x' || substr(h, m$k * 2 + 65, 8) AS BIGINT) * 1000
        // CAST('0x' || substr(h, m$k * 2 + 57, 8) AS BIGINT) AS duration_ms
    FROM $last ORDER BY doc_id"""
  })

  val multimodalResize: Q = Q("multimodal_resize", (s, dir) => {
    graft.expressions.ImageHeaderDecode.register(s)
    val assetHex = graft.ops.Media.assetHexExpr(
      "doc_id", "CAST(octet_length(text) AS BIGINT)")
    Tables.t(s, dir, "documents")
      .select(col("doc_id"),
        expr(s"image_header_decode(unhex($assetHex))").as("m"))
      .select(col("doc_id"), col("m.width").as("width"),
        col("m.height").as("height"))
      .withColumn("scale_e6", expr(
        "least(224000000 DIV width, 224000000 DIV height, 1000000)"))
      .withColumn("out_w", expr("greatest(1, (width * scale_e6) DIV 1000000)"))
      .withColumn("out_h", expr("greatest(1, (height * scale_e6) DIV 1000000)"))
      .withColumn("pad_x", expr("(224 - out_w) DIV 2"))
      .withColumn("pad_y", expr("(224 - out_h) DIV 2"))
      .orderBy("doc_id")
  }, Some {
    val assetHex = graft.ops.Media.assetHexExpr(
      "doc_id", "CAST(octet_length(encode(text)) AS BIGINT)")
    s"""WITH hx AS (SELECT doc_id, hex(unhex($assetHex)) AS h FROM documents),
    d AS (SELECT doc_id,
        CAST(${graft.ops.Media.duckWidthExpr("h")} AS BIGINT) AS width,
        CAST(${graft.ops.Media.duckHeightExpr("h")} AS BIGINT) AS height
      FROM hx),
    sc AS (SELECT *,
        least(224000000 // width, 224000000 // height, 1000000) AS scale_e6
      FROM d),
    o AS (SELECT *, greatest(1, (width * scale_e6) // 1000000) AS out_w,
        greatest(1, (height * scale_e6) // 1000000) AS out_h FROM sc)
    SELECT doc_id, width, height, scale_e6, out_w, out_h,
      (224 - out_w) // 2 AS pad_x, (224 - out_h) // 2 AS pad_y
    FROM o ORDER BY doc_id"""
  })

  /** Maximum-inner-product retrieval over STUB-extracted multimodal
    * features: a deterministic fake 16-dim integer feature vector per
    * asset (the h60 hash per (dim, doc) — standing in for the codec+
    * encoder this environment lacks), then exact MIPS of 4 query assets
    * against the corpus, top-3 each. The Spark-side shape is the real
    * one — feature rows generated per (doc, dim) AFTER an explode so
    * the hash is a codegen'd per-row expression (HOF lambdas run
    * interpreted — the measured 9× rule), the 64-row query side
    * broadcast against the corpus dims, dot products as one keyed
    * partial-agg shuffle bounded by queries × corpus, and a top-k
    * window partitioned per query. All-integer dots: bit-exact
    * cross-engine, no cosine float anywhere.
    */
  val multimodalMips: Q = Q("multimodal_mips", (s, dir) => {
    import org.apache.spark.sql.expressions.Window
    val h = graft.ops.Sketch.h60("concat('emb', CAST(j AS STRING))",
      "CAST(doc_id AS STRING)")
    val dims = Tables.t(s, dir, "documents")
      .select(col("doc_id"), explode(expr("sequence(0, 15)")).as("j"))
      .withColumn("x", expr(s"$h % 199 - 99"))
    val q = dims.filter(col("doc_id") < 4)
      .select(col("doc_id").as("qid"), col("j"), col("x").as("qx"))
    val dots = broadcast(q).join(dims, "j")
      .filter(col("qid") =!= col("doc_id"))
      .groupBy(col("qid"), col("doc_id").as("cid"))
      .agg(sum(expr("qx * x")).as("dot"))
    dots.withColumn("rank", row_number().over(
        Window.partitionBy("qid").orderBy(col("dot").desc, col("cid"))))
      .filter(col("rank") <= 3)
      .orderBy("qid", "rank")
  }, Some("""WITH dims AS (
      SELECT doc_id, j,
        CAST('0x' || substr(md5('emb' || CAST(j AS VARCHAR) || ':'
          || CAST(doc_id AS VARCHAR)), 1, 15) AS BIGINT) % 199 - 99 AS x
      FROM documents CROSS JOIN range(16) t(j)),
    q AS (SELECT doc_id AS qid, j, x AS qx FROM dims WHERE doc_id < 4),
    d AS (SELECT qid, dims.doc_id AS cid, sum(qx * x)::BIGINT AS dot
      FROM q JOIN dims ON q.j = dims.j AND dims.doc_id <> q.qid
      GROUP BY 1, 2),
    r AS (SELECT qid, cid, dot,
        CAST(row_number() OVER (PARTITION BY qid ORDER BY dot DESC, cid)
          AS INT) AS rank
      FROM d)
    SELECT qid, cid, dot, rank FROM r WHERE rank <= 3
    ORDER BY qid, rank"""))

  /** Two unrolled rounds of BPE merge training over the corpus symbol
    * stream — the vocabulary-construction step of a training-data
    * pipeline (count adjacent symbol pairs, adopt the most frequent pair
    * as a merge, rewrite, repeat). Uses ops/Text's framed-string merge
    * representation: every round is one map-side-combining groupBy plus
    * a broadcast 1-row rule join, fully declarative (no driver collect),
    * and bit-exact vs DuckDB because greedy leftmost merging is carried
    * by literal `replace` with identical semantics in both engines. A
    * production tokenizer runs the identical loop ~30k rounds; per-round
    * cost is linear in corpus bytes.
    *
    * Output: the adopted merge rules (stage merge_1/merge_2) + the
    * post-merge top-20 pair table (stage final).
    */
  val bpePairStats: Q = Q("bpe_pair_stats", (s, dir) => {
    import graft.ops.Text
    // driver-coordinated trainer (ops/Text.bpeTrain): only the raw
    // framed corpus is persisted; each round re-reads it with the
    // accumulated LITERAL merges folded into one codegen'd projection
    val seq0 = Tables.t(s, dir, "documents").select(Text.bpeInitSeq(col("text")).as("seq"))
    val (merges, seq2) = Text.bpeTrain(seq0, "seq", 2)
    val fin = Text.bpePairCounts(seq2, "seq")
      .orderBy(desc("cnt"), asc("w1"), asc("w2")).limit(20)
    merges.select(concat(lit("merge_"), col("round")).as("stage"),
        col("w1"), col("w2"), col("cnt"))
      .union(fin.select(lit("final").as("stage"), col("w1"), col("w2"), col("cnt")))
      .orderBy(asc("stage"), desc("cnt"), asc("w1"), asc("w2"))
  }, Some {
    import graft.ops.Text
    s"""WITH s0 AS (SELECT ${Text.bpeInitSeqSql("text")} AS seq FROM documents),
      p1 AS (${Text.bpePairCountsSql("s0", "seq")}),
      m1 AS (SELECT w1, w2, cnt FROM p1 ORDER BY cnt DESC, w1, w2 LIMIT 1),
      s1 AS (SELECT ${Text.bpeApplyMergeSql("seq", "m1")} AS seq FROM s0),
      p2 AS (${Text.bpePairCountsSql("s1", "seq")}),
      m2 AS (SELECT w1, w2, cnt FROM p2 ORDER BY cnt DESC, w1, w2 LIMIT 1),
      s2 AS (SELECT ${Text.bpeApplyMergeSql("seq", "m2")} AS seq FROM s1),
      p3 AS (${Text.bpePairCountsSql("s2", "seq")}),
      fin AS (SELECT w1, w2, cnt FROM p3 ORDER BY cnt DESC, w1, w2 LIMIT 20)
      SELECT 'merge_1' AS stage, w1, w2, cnt FROM m1
      UNION ALL SELECT 'merge_2' AS stage, w1, w2, cnt FROM m2
      UNION ALL SELECT 'final' AS stage, w1, w2, cnt FROM fin
      ORDER BY stage, cnt DESC, w1, w2"""
  })

  /** Deterministic weighted sampling without replacement
    * (ops/Sample.priorityWeighted — priority sampling): 100 docs drawn
    * with probability proportional to length, as a pure integer function
    * of doc_id. The "sample long documents more" curation draw, with a
    * global top-k that runs as per-partition heaps (no sort, no
    * shuffle). Exact integer priorities make the oracle twin trivially
    * bit-exact.
    */
  val samplePriority: Q = Q("sample_priority", (s, dir) => {
    graft.ops.Sample.priorityWeighted(
        Tables.t(s, dir, "documents").select(col("doc_id"), col("n_chars")),
        "doc_id", "n_chars", k = 100)
      .select(col("doc_id"), col("n_chars"), col("h"), col("priority"))
      .orderBy(desc("priority"), asc("doc_id"))
  }, Some(s"""SELECT doc_id, n_chars, h, n_chars * ${graft.ops.Sample.PriorityScale} // (h + 1) AS priority
    FROM (SELECT doc_id, n_chars,
        CAST('0x' || substr(md5('prio' || CAST(doc_id AS VARCHAR)), 1, 15) AS BIGINT)
          % ${graft.ops.Sample.PriorityModulus} AS h
      FROM documents)
    ORDER BY priority DESC, doc_id LIMIT 100"""))

  /** Canonical Unicode normalization pass (native codegen'd NFC
    * expression — ops/Text.nfc): per doc, raw vs normalized length,
    * whether the doc was already NFC, and the md5 of the normalized
    * text (the fingerprint dedup should key on). DuckDB's
    * `nfc_normalize` is the identical Unicode algorithm, so the md5s
    * are bit-exact cross-engine; the non-ASCII behavior itself is
    * covered on literals in UrlEncodeWarpSpec. Pure per-row codegen'd
    * column work — zero shuffle beyond the output ORDER BY.
    */
  val textNormalize: Q = Q("text_normalize", (s, dir) => {
    Tables.t(s, dir, "documents")
      .select(col("doc_id"), col("text"),
        length(col("text")).cast("bigint").as("n_raw"),
        graft.ops.Text.nfc(col("text")).as("norm"))
      .select(col("doc_id"), col("n_raw"),
        length(col("norm")).cast("bigint").as("n_norm"),
        (col("norm") === col("text")).as("was_nfc"),
        md5(col("norm")).as("norm_md5"))
      .orderBy("doc_id")
  }, Some("""SELECT doc_id,
      CAST(length(text) AS BIGINT) AS n_raw,
      CAST(length(nfc_normalize(text)) AS BIGINT) AS n_norm,
      nfc_normalize(text) = text AS was_nfc,
      md5(nfc_normalize(text)) AS norm_md5
    FROM documents ORDER BY doc_id"""))

  /** Per-source vocabulary statistics (Heaps/Zipf dataset-card numbers):
    * token mass, distinct types, type/token ratio and hapax-legomena
    * share in exact integer basis points. One explode → (source, word)
    * count (map-side combined) → per-source rollup; no floats anywhere.
    */
  val textVocabGrowth: Q = Q("text_vocab_growth", (s, dir) => {
    val w = Tables.t(s, dir, "documents")
      .select(col("source"), explode(graft.ops.Text.words(col("text"))).as("word"))
      .groupBy("source", "word").agg(count(lit(1)).as("c"))
    w.groupBy("source").agg(
        sum("c").as("n_tokens"),
        count(lit(1)).as("n_types"),
        sum(when(col("c") === 1, 1L).otherwise(0L)).as("n_hapax"))
      .select(col("source"), col("n_tokens"), col("n_types"), col("n_hapax"),
        expr("10000 * n_types DIV n_tokens").as("type_token_bp"),
        expr("10000 * n_hapax DIV n_types").as("hapax_bp"))
      .orderBy("source")
  }, Some("""WITH w AS (
      SELECT source, unnest(list_filter(string_split(lower(text), ' '), x -> x <> '')) AS word
      FROM documents),
    c AS (SELECT source, word, count(*) AS c FROM w GROUP BY source, word),
    a AS (SELECT source, CAST(sum(c) AS BIGINT) AS n_tokens,
        count(*)::BIGINT AS n_types,
        CAST(sum(CASE WHEN c = 1 THEN 1 ELSE 0 END) AS BIGINT) AS n_hapax
      FROM c GROUP BY source)
    SELECT source, n_tokens, n_types, n_hapax,
      10000 * n_types // n_tokens AS type_token_bp,
      10000 * n_hapax // n_types AS hapax_bp
    FROM a ORDER BY source"""))

  /** RAKE keyword extraction (Rose et al. 2010 — public): candidate
    * phrases are maximal runs of content words (boundaries at stopwords
    * and any non-alphabetic token), each word scores degree/frequency
    * over the candidate-phrase graph, and a phrase scores the sum of
    * its word scores. All scoring is INTEGER basis points
    * (10000·deg DIV freq summed over words) — order-independent, no
    * float divergence anywhere. Shape: per-doc phrase split (no
    * shuffle), one word-stats aggregation, one broadcast-size join of
    * word scores back onto the distinct-phrase relation, top-25 via
    * ordered limit.
    */
  val textKeywords: Q = Q("text_keywords", (s, dir) => {
    val stops = Seq("the", "a", "an", "and", "of", "to", "in", "is", "for",
      "on", "with", "as", "by", "at", "it", "that", "this", "are", "be",
      "or", "from")
    val stopSql = stops.map(w => s"'$w'").mkString(", ")
    val ph = Tables.t(s, dir, "documents")
      .select(filter(split(lower(col("text")), " "), w => w =!= "").as("w"))
      .withColumn("marked", expr(
        s"""transform(w, x -> CASE WHEN x IN ($stopSql)
            OR NOT x RLIKE '^[a-z]+$$' THEN '|' ELSE x END)"""))
      .select(explode(split(array_join(col("marked"), " "), "\\|")).as("raw"))
      .select(trim(col("raw")).as("phrase"))
      .filter(col("phrase") =!= "")
      .withColumn("plen", size(split(col("phrase"), " ")).cast("bigint"))
      .filter(col("plen") <= 3)
    val pw = ph.select(col("phrase"), col("plen"),
      explode(split(col("phrase"), " ")).as("word"))
    val wstats = pw.groupBy("word")
      .agg(count(lit(1)).as("freq"), sum("plen").as("deg"))
      .withColumn("wscore_bp", expr("10000 * deg DIV freq"))
    val uniq = ph.groupBy("phrase").agg(count(lit(1)).as("n"))
    val scored = uniq
      .select(col("phrase"), col("n"), explode(split(col("phrase"), " ")).as("word"))
      .join(wstats.select(col("word"), col("wscore_bp")), "word")
      .groupBy("phrase").agg(max("n").as("n"), sum("wscore_bp").as("score_bp"))
    scored.select(col("phrase"), col("n"), col("score_bp"))
      .orderBy(desc("score_bp"), desc("n"), asc("phrase")).limit(25)
  }, Some("""WITH w AS (
      SELECT list_filter(string_split(lower(text), ' '), x -> x <> '') AS w
      FROM documents),
    m AS (SELECT list_transform(w, x -> CASE WHEN x IN ('the', 'a', 'an', 'and',
        'of', 'to', 'in', 'is', 'for', 'on', 'with', 'as', 'by', 'at', 'it',
        'that', 'this', 'are', 'be', 'or', 'from')
        OR NOT regexp_full_match(x, '[a-z]+') THEN '|' ELSE x END) AS marked
      FROM w),
    ph AS (SELECT phrase, CAST(len(string_split(phrase, ' ')) AS BIGINT) AS plen
      FROM (SELECT trim(unnest(string_split(list_aggregate(marked, 'string_agg', ' '), '|'))) AS phrase
        FROM m)
      WHERE phrase <> '' AND len(string_split(phrase, ' ')) <= 3),
    pw AS (SELECT phrase, plen, unnest(string_split(phrase, ' ')) AS word FROM ph),
    ws AS (SELECT word, count(*)::BIGINT AS freq, CAST(sum(plen) AS BIGINT) AS deg,
        10000 * CAST(sum(plen) AS BIGINT) // count(*) AS wscore_bp
      FROM pw GROUP BY word),
    uniq AS (SELECT phrase, count(*)::BIGINT AS n FROM ph GROUP BY phrase),
    sc AS (SELECT u.phrase, max(u.n) AS n,
        CAST(sum(ws.wscore_bp) AS BIGINT) AS score_bp
      FROM (SELECT phrase, n, unnest(string_split(phrase, ' ')) AS word FROM uniq) u
      JOIN ws USING (word) GROUP BY u.phrase)
    SELECT phrase, CAST(n AS BIGINT) AS n, score_bp FROM sc
    ORDER BY score_bp DESC, n DESC, phrase ASC LIMIT 25"""))

  /** Top collocations by PMI lift over the documents corpus: word pairs
    * co-occurring in more docs than independence predicts. Runs
    * [[graft.ops.Text.cooccurrence]] (doc-frequency-capped vocabulary,
    * pair space bounded before the self-join), then ranks by the
    * fixed-point lift ratio lift_bp = n_ab·n_docs·10000 DIV (n_a·n_b) —
    * a MONOTONE transform of PMI (PMI = log of lift), so the ranking is
    * identical to PMI's with zero float math anywhere.
    */
  val textPmi: Q = Q("text_pmi", (s, dir) => {
    graft.ops.Text.cooccurrence(Tables.t(s, dir, "documents"), "doc_id", "text",
        vocabTop = 200, minPair = 5L)
      .withColumn("lift_bp", expr("(n_ab * n_docs * 10000) DIV (n_a * n_b)"))
      .select("word_a", "word_b", "n_ab", "n_a", "n_b", "lift_bp")
      .orderBy(col("lift_bp").desc, col("word_a"), col("word_b")).limit(30)
  }, Some("""
    WITH w AS (
      SELECT doc_id AS d, unnest(list_distinct(
        list_filter(string_split(lower(text), ' '), x -> x <> ''))) AS word
      FROM documents),
    bydf AS (SELECT word, count(*)::BIGINT AS n_w FROM w GROUP BY word),
    vocab AS (SELECT word, n_w FROM bydf ORDER BY n_w DESC, word LIMIT 200),
    wv AS (SELECT w.d, w.word, vocab.n_w FROM w JOIN vocab USING (word)),
    pairs AS (
      SELECT a.word AS word_a, b.word AS word_b,
        count(*)::BIGINT AS n_ab, max(a.n_w)::BIGINT AS n_a, max(b.n_w)::BIGINT AS n_b
      FROM wv a JOIN wv b ON a.d = b.d AND a.word < b.word
      GROUP BY 1, 2 HAVING count(*) >= 5),
    nd AS (SELECT count(*)::BIGINT AS n_docs FROM documents)
    SELECT word_a, word_b, n_ab, n_a, n_b,
      (n_ab * n_docs * 10000) // (n_a * n_b) AS lift_bp
    FROM pairs, nd
    ORDER BY lift_bp DESC, word_a, word_b LIMIT 30"""))

  /** Top skip-gram pairs within a ±2 positional window — the word2vec
    * training-pair extraction, via [[graft.ops.Text.skipgrams]] (pure
    * per-row array generation, the final count is the only shuffle).
    */
  val textSkipgrams: Q = Q("text_skipgrams", (s, dir) => {
    graft.ops.Text.skipgrams(Tables.t(s, dir, "documents"), "text", window = 2)
      .orderBy(col("n").desc, col("center"), col("context")).limit(40)
  }, Some("""
    WITH w AS (
      SELECT list_filter(string_split(lower(text), ' '), x -> x <> '') AS w
      FROM documents),
    pr AS (
      SELECT unnest(list_transform(range(1, greatest(len(w) - 1, 0) + 1),
        i -> [w[i], w[i + 1]])) AS p FROM w
      UNION ALL
      SELECT unnest(list_transform(range(1, greatest(len(w) - 1, 0) + 1),
        i -> [w[i + 1], w[i]])) FROM w
      UNION ALL
      SELECT unnest(list_transform(range(1, greatest(len(w) - 2, 0) + 1),
        i -> [w[i], w[i + 2]])) FROM w
      UNION ALL
      SELECT unnest(list_transform(range(1, greatest(len(w) - 2, 0) + 1),
        i -> [w[i + 2], w[i]])) FROM w)
    SELECT p[1] AS center, p[2] AS context, count(*)::BIGINT AS n
    FROM pr GROUP BY 1, 2
    ORDER BY n DESC, center, context LIMIT 40"""))

  /** Framed-sequence symbol count; the empty-doc guard is identical on
    * both engines (split('') yields one empty element on both).
    */
  private def symCountExpr(seqCol: String) =
    s"CASE WHEN length(trim($seqCol)) = 0 THEN 0L ELSE CAST(size(split(trim($seqCol), '  ')) AS BIGINT) END"

  private val bpeEncodeRounds = 4

  /** Tokenizer APPLY: train `bpeEncodeRounds` BPE merges on the corpus
    * (ops/Text.bpeTrain — the framed-string replace trainer), encode
    * every document with them, and report per-source compression:
    * symbols before/after and the saved fraction in basis points. This
    * is the round trip a tokenizer pipeline ships — train on the
    * corpus, re-tokenize the corpus — with each merge round one
    * map-side-combining pair count plus a broadcast 1-row rule.
    */
  val bpeEncode: Q = Q("bpe_encode", (s, dir) => {
    import graft.ops.Text
    val d = Tables.t(s, dir, "documents")
      .select(col("source"), Text.bpeInitSeq(col("text")).as("seq"))
      .withColumn("tok0", expr(symCountExpr("seq")))
    val (_, enc) = Text.bpeTrain(d, "seq", bpeEncodeRounds)
    enc.withColumn("tok", expr(symCountExpr("seq")))
      .groupBy("source")
      .agg(count(lit(1)).as("n_docs"),
        sum("tok0").as("tokens_raw"), sum("tok").as("tokens_bpe"))
      .withColumn("saved_bp",
        expr("((tokens_raw - tokens_bpe) * 10000) DIV nullif(tokens_raw, 0)"))
      .orderBy("source")
  }, Some {
    import graft.ops.Text
    def symSql(e: String) =
      s"CASE WHEN length(trim($e)) = 0 THEN 0 ELSE len(string_split(trim($e), '  ')) END::BIGINT"
    val chain = (1 to bpeEncodeRounds).map { r =>
      s""",
      p$r AS (${Text.bpePairCountsSql(s"s${r - 1}", "seq")}),
      m$r AS (SELECT w1, w2, cnt FROM p$r ORDER BY cnt DESC, w1, w2 LIMIT 1),
      s$r AS MATERIALIZED (SELECT source, ${Text.bpeApplyMergeSql("seq", s"m$r")} AS seq, tok0
        FROM s${r - 1})"""
    }.mkString
    s"""WITH s0 AS MATERIALIZED (
      SELECT source, ${Text.bpeInitSeqSql("text")} AS seq,
        ${symSql(Text.bpeInitSeqSql("text"))} AS tok0
      FROM documents)$chain
    SELECT source, count(*)::BIGINT AS n_docs,
      sum(tok0)::BIGINT AS tokens_raw,
      sum(${symSql("seq")})::BIGINT AS tokens_bpe,
      ((sum(tok0)::BIGINT - sum(${symSql("seq")})::BIGINT) * 10000)
        // nullif(sum(tok0)::BIGINT, 0) AS saved_bp
    FROM s$bpeEncodeRounds GROUP BY source ORDER BY source"""
  })

  // ---- perceptual hashing over REAL pixel data ----

  /** Shared thumbnail-hash frame: every doc gets a complete 8×8 24bpp
    * grayscale BMP (real header + real pixel array, ops/Media layout;
    * image-order pixel k's luminance byte is the first md5 byte of the
    * doc's (k mod n_words)-th word, so near-identical texts produce
    * near-identical images), and the 64-bit aHash comes out of the
    * codegen'd byte-level decoder [[graft.expressions.ImageAHash]] —
    * header parse, bottom-up pixel walk, integer mean threshold.
    */
  private def phashDf(s: org.apache.spark.sql.SparkSession, dir: String) = {
    graft.expressions.ImageAHash.register(s)
    val px: Int => String = k =>
      s"upper(substr(md5(element_at(ws, $k % nw + 1)), 1, 2))"
    val thumbHex = graft.ops.Media.thumbBmpHexExpr(px)
    Tables.t(s, dir, "documents")
      .withColumn("ws", split(col("text"), " "))
      .withColumn("nw", expr("size(ws)"))
      .select(col("doc_id"), expr(s"image_ahash(unhex($thumbHex))").as("ahash"))
  }

  /** The DuckDB twin of [[phashDf]] as a CTE chain ending in
    * `hh(doc_id, ahash)` — same container bytes via the common hex
    * dialect, same hash via hex offset arithmetic (Media.duckAHashFold).
    */
  private def phashOracleCtes: String = {
    val px: Int => String = k =>
      s"upper(substr(md5(ws[($k % nw) + 1]), 1, 2))"
    val thumbHex = graft.ops.Media.thumbBmpHexExpr(px)
    s"""d AS (SELECT doc_id, string_split(text, ' ') AS ws,
        len(string_split(text, ' ')) AS nw FROM documents),
    hx AS (SELECT doc_id, hex(unhex($thumbHex)) AS h FROM d),
    lm AS (SELECT doc_id, ${graft.ops.Media.duckAHashSql("h", "lums")} FROM hx),
    tt AS (SELECT doc_id, lums, ${graft.ops.Media.duckLumSum("lums")} AS t FROM lm),
    hh AS (SELECT doc_id, ${graft.ops.Media.duckAHashFold("lums", "t")} AS ahash FROM tt)"""
  }

  /** Per-doc perceptual hash manifest: the aHash long plus its
    * popcount (a cheap luminance-balance diagnostic — by construction
    * of the mean threshold it sits near 32). Per-row codegen'd pixel
    * decode, zero shuffle; the oracle recomputes the identical hash
    * from the identical blob by pure SQL byte arithmetic.
    */
  val multimodalPhash: Q = Q("multimodal_phash", (s, dir) => {
    phashDf(s, dir)
      .withColumn("bits_set", expr("CAST(bit_count(ahash) AS BIGINT)"))
      .orderBy("doc_id")
  }, Some(s"""WITH ${phashOracleCtes}
    SELECT doc_id, ahash, CAST(bit_count(ahash) AS BIGINT) AS bits_set
    FROM hh ORDER BY doc_id"""))

  /** Near-duplicate IMAGE pairs by banded Hamming join over DISTINCT
    * hashes — candidate generation is an exact equi-join on
    * clean-triple block keys (see [[phashBandsOf]]: 6 blocks, C(6,3)
    * triples, the Manku–Jain–Das Sarma WWW'07 construction — every
    * Hamming ≤ 3 pair shares an exact triple, never all-pairs), mined
    * at the REPRESENTATIVE layer (r12 verdict #1): the band join runs
    * over `SELECT DISTINCT ahash`, so band postings scale with
    * distinct perceptual content, and per-hash doc groups re-expand
    * afterwards — cross-hash representative pairs fan back out
    * through the group membership join; same-hash pairs (Hamming 0)
    * come straight from the group self-join. Both the representative
    * band buckets and the expansion groups pass the [[PhashBandCap]]
    * hot-key bound (one degenerate key / one million-copy image
    * cannot emit df² rows past the cap), and the cap-bite census
    * audits BOTH relations ([[graft.queries.Dedup.capCoverage]] sites
    * `phash_bands`, `phash_groups`). The oracle applies the identical
    * construction with QUALIFY cuts.
    */
  /** The phash band-bucket AND group-expansion cap — ONE constant
    * interpolated into the miner, its oracle, and the cap-census (the
    * shared-constant rule).
    */
  private[graft] val PhashBandCap = 128L

  /** 6-block split of the 64-bit hash (widths 11/11/11/11/10/10) and
    * the C(6,3) = 20 clean-triple combinations — the Manku–Jain–
    * Das Sarma block-permutation construction ("Detecting
    * Near-Duplicates for Web Crawling", WWW 2007 — public): 3 bit
    * errors dirty at most 3 of 6 blocks, so every Hamming ≤ 3 pair
    * shares at least one EXACT triple of clean blocks. Keying the band
    * join on (triple id, 3 block values) gives a ~33-bit key space
    * (20·2^33 ≈ 1.7e11) instead of the former 4×16-bit pigeonhole's
    * 262,144 keys — the r12/r13 capcov ladders measured that fixed
    * space EXHAUSTED at ×128 (262,109 keys occupied; rep-pair mass
    * 11.35M and quadratic, because DISTINCT content itself outgrew
    * the key space — a representative layer cannot fix a key space
    * smaller than the corpus). With ~33-bit keys, accidental
    * collisions are ~D²·20/2^34 — sub-thousand at ×128 — so pair mass
    * tracks true near-duplicate volume. (x >> s) & mask is
    * cross-engine safe on negative BIGINTs (arithmetic shift + mask —
    * the house rule).
    */
  private val PhashBlocks: Seq[(Int, Long)] =
    Seq((0, 2047L), (11, 2047L), (22, 2047L), (33, 2047L), (44, 1023L), (54, 1023L))
  private val PhashTriples: Seq[Seq[Int]] =
    PhashBlocks.indices.combinations(3).map(_.toSeq).toSeq // 20, deterministic order

  private def phashBlockSql(c: String, b: Int, spark: Boolean): String = {
    val (off, mask) = PhashBlocks(b)
    if (spark) s"(shiftright($c, $off) & $mask)" else s"(($c >> $off) & $mask)"
  }

  private def phashTripleKeySql(c: String, t: Int, spark: Boolean): String = {
    val Seq(i, j, k) = PhashTriples(t)
    s"((($t * 2048 + ${phashBlockSql(c, i, spark)}) * 2048 + " +
      s"${phashBlockSql(c, j, spark)}) * 2048 + ${phashBlockSql(c, k, spark)})"
  }

  /** The UNCAPPED clean-triple band relation (ahash, bk) over DISTINCT
    * hashes — exposed (with its SQL twin [[phashBandsOracleCtes]]) so
    * the cap-bite census audits the same relation the miner caps.
    */
  private[graft] def phashBandsOf(
      hh: org.apache.spark.sql.DataFrame): org.apache.spark.sql.DataFrame =
    hh.select(col("ahash")).distinct()
      .select(col("ahash"), explode(array(PhashTriples.indices.map(t =>
        expr(phashTripleKeySql("ahash", t, spark = true))): _*)).as("bk"))

  private[graft] def phashBands(s: org.apache.spark.sql.SparkSession, dir: String) =
    phashBandsOf(phashDf(s, dir))

  /** The (doc_id, ahash) manifest relation, exposed for the cap-bite
    * census's `phash_groups` site (the expansion-cap audit).
    */
  private[graft] def phashHashes(s: org.apache.spark.sql.SparkSession, dir: String) =
    phashDf(s, dir)

  /** DuckDB twin of [[phashBandsOf]]: [[phashOracleCtes]] + `reps` +
    * `pbands` (clean-triple keys over distinct hashes).
    */
  private[graft] def phashBandsOracleCtes: String = {
    val keys = PhashTriples.indices.map(t =>
      s"SELECT ahash, ${phashTripleKeySql("ahash", t, spark = false)} AS bk FROM reps")
      .mkString("\n      UNION ALL ")
    s"""$phashOracleCtes,
    reps AS (SELECT DISTINCT ahash FROM hh),
    pbands AS (
      $keys)"""
  }

  /** The shared representative-pair + expansion-group construction of
    * the phash miner: (rep pairs (ha, hb, hamming), capped per-hash
    * doc groups (ahash, doc_id)).
    *
    * KNOWN COST of the eager localCheckpoint below: merely CONSTRUCTING
    * the pairs/clusters Q.fn executes Spark jobs (the md5 scan + grp
    * aggregate run at truncation time), so plan-only consumers
    * (DevExplain's registry sweep, SelfJoinAudit.audit, ScaleSpec
    * analyzed-plan pins) pay real execution and fn needs readable
    * testdata. Accepted deliberately: the checkpoint is load-bearing for
    * the 4-consumer re-walk (r13 A/B), and every plan-only consumer
    * already runs against a real sf dir.
    */
  private def phashRepPairs(s: org.apache.spark.sql.SparkSession, dir: String) = {
    import graft.ops.Scale
    val hh = phashDf(s, dir).persist()
    // grp feeds FOUR references in the pairs query (both expansion joins
    // + both sides of the same-hash join): it is aggregate-bounded tiny
    // state, so TRUNCATE it (the r7 checkpoint rule) — four consumers of
    // a lazy plan each re-walk the md5-scan DAG otherwise. capped feeds
    // BOTH sides of the band self-join: persist (not checkpoint) so the
    // capGroups `_gn` window stays visible in the analyzed plan for the
    // self-join lint and the ScaleSpec plan-shape pin, while the
    // distinct+explode+window subtree materializes once instead of once
    // per join side (the r13 quiet bench measured the unpersisted form
    // planning 28 Exchanges).
    val grp = Scale.capGroups(hh, "ahash", PhashBandCap).localCheckpoint(true)
    val capped = Scale.capGroups(phashBandsOf(hh), "bk", PhashBandCap).persist()
    val rp = capped.select(col("bk"), col("ahash").as("ha"))
      .join(capped.select(col("bk"), col("ahash").as("hb")), "bk")
      .filter(col("ha") < col("hb"))
      .select("ha", "hb").distinct()
      .withColumn("hamming", expr("CAST(bit_count(ha ^ hb) AS BIGINT)"))
      .filter(col("hamming") <= 3)
    (rp, grp)
  }

  /** The UNSORTED expanded pair set (cross-hash expansion ∪ same-hash
    * groups) — shared by [[multimodalPhashPairs]] (which adds the
    * deterministic ORDER BY) and [[multimodalPhashClusters]] (whose
    * component propagation does not need the sort — composing from the
    * sorted query paid a wasted Exchange+Sort below the cache barrier).
    */
  private def phashExpandedPairs(
      s: org.apache.spark.sql.SparkSession, dir: String) = {
    val (rp, grp) = phashRepPairs(s, dir)
    val cross = rp
      .join(grp.select(col("ahash").as("ha"), col("doc_id").as("da")), "ha")
      .join(grp.select(col("ahash").as("hb"), col("doc_id").as("db")), "hb")
      .select(least(col("da"), col("db")).as("doc_a"),
        greatest(col("da"), col("db")).as("doc_b"), col("hamming"))
    val same = grp.select(col("ahash"), col("doc_id").as("da"))
      .join(grp.select(col("ahash"), col("doc_id").as("db")), "ahash")
      .filter(col("da") < col("db"))
      .select(col("da").as("doc_a"), col("db").as("doc_b"),
        lit(0L).as("hamming"))
    cross.unionByName(same)
  }

  /** DuckDB twin of [[phashRepPairs]] + the expanded pair union —
    * shared by the pairs and clusters oracles.
    */
  private def phashPairOracleCtes: String =
    s"""${phashBandsOracleCtes},
    grp AS (SELECT doc_id, ahash FROM hh
      QUALIFY count(*) OVER (PARTITION BY ahash) <= $PhashBandCap),
    rcapped AS (SELECT * FROM pbands
      QUALIFY count(*) OVER (PARTITION BY bk) <= $PhashBandCap),
    rp AS (SELECT DISTINCT a.ahash AS ha, b.ahash AS hb
      FROM rcapped a JOIN rcapped b ON a.bk = b.bk AND a.ahash < b.ahash
      WHERE bit_count(xor(a.ahash, b.ahash)) <= 3),
    prx AS (
      SELECT least(ga.doc_id, gb.doc_id) AS doc_a,
        greatest(ga.doc_id, gb.doc_id) AS doc_b,
        CAST(bit_count(xor(rp.ha, rp.hb)) AS BIGINT) AS hamming
      FROM rp JOIN grp ga ON ga.ahash = rp.ha JOIN grp gb ON gb.ahash = rp.hb
      UNION ALL
      SELECT a.doc_id AS doc_a, b.doc_id AS doc_b, CAST(0 AS BIGINT) AS hamming
      FROM grp a JOIN grp b ON a.ahash = b.ahash AND a.doc_id < b.doc_id)"""

  val multimodalPhashPairs: Q = Q("multimodal_phash_pairs", (s, dir) =>
    phashExpandedPairs(s, dir).orderBy("doc_a", "doc_b"),
    Some(s"""WITH ${phashPairOracleCtes}
    SELECT doc_a, doc_b, hamming FROM prx
    ORDER BY doc_a, doc_b"""))

  /** Near-duplicate IMAGE clusters: min-label connected components over
    * the [[multimodalPhashPairs]] edge set (ops/Graph propagation —
    * checkpointed distributed loop, counted-small driver fast path),
    * with per-cluster size and the canonical-member flag (the min doc
    * id — what a dedup pipeline keeps). Only docs that collided appear:
    * singletons need no cluster decision. The oracle walks the same
    * edges with a recursive reachability CTE.
    */
  val multimodalPhashClusters: Q = Q("multimodal_phash_clusters", (s, dir) => {
    import org.apache.spark.sql.expressions.Window
    val pairs = phashExpandedPairs(s, dir).select("doc_a", "doc_b").persist()
    val cl = graft.ops.Graph.connectedComponents(pairs, "doc_a", "doc_b")
      .select(col("v").as("doc_id"), col("component").as("cluster_id"))
    cl.withColumn("n_members",
        count(lit(1)).over(Window.partitionBy("cluster_id")))
      .withColumn("is_canonical", col("doc_id") === col("cluster_id"))
      .orderBy("doc_id")
  }, Some(s"""WITH RECURSIVE ${phashPairOracleCtes},
    pr AS (SELECT doc_a, doc_b FROM prx),
    edges AS (SELECT doc_a AS src, doc_b AS dst FROM pr
      UNION ALL SELECT doc_b, doc_a FROM pr),
    reach AS (
      SELECT DISTINCT src AS v, src AS r FROM edges
      UNION
      SELECT e.dst AS v, r.r FROM reach r JOIN edges e ON e.src = r.v),
    cl AS (SELECT v AS doc_id, min(r) AS cluster_id FROM reach GROUP BY v)
    SELECT doc_id, cluster_id,
      count(*) OVER (PARTITION BY cluster_id) AS n_members,
      doc_id = cluster_id AS is_canonical
    FROM cl ORDER BY doc_id"""))

  /** DCT perceptual hash manifest — the 2D-DCT sibling of
    * [[multimodalPhash]] (classic pHash; Zauner 2010 — public) over the
    * SAME real thumbnail bytes: the codegen'd
    * [[graft.expressions.ImageDctHash]] decodes the 8×8 24bpp BMP,
    * runs the separable fixed-point DCT-II (cosine basis = shared
    * integer literals, see cosTable), and sets bit 8u+v iff the
    * coefficient clears the cross-multiplied AC mean — structure-
    * sensitive where aHash is brightness-sensitive, so the two hashes
    * disagree exactly where spatial frequency matters. DC bit is 0 by
    * construction (hash ≥ 0 — asserted in ImageHeaderDecodeSpec).
    * Per-row codegen'd decode, zero shuffle; the oracle re-runs the
    * identical integer DCT from the identical blob through two list
    * CTE passes (Media.duckDctG/duckDctF/duckDctFold).
    */
  val multimodalDctPhash: Q = Q("multimodal_dct_phash", (s, dir) => {
    graft.expressions.ImageAHash.register(s)
    graft.expressions.ImageDctHash.register(s)
    val px: Int => String = k =>
      s"upper(substr(md5(element_at(ws, $k % nw + 1)), 1, 2))"
    val thumbHex = graft.ops.Media.thumbBmpHexExpr(px)
    Tables.t(s, dir, "documents")
      .withColumn("ws", split(col("text"), " "))
      .withColumn("nw", expr("size(ws)"))
      .withColumn("blob", expr(s"unhex($thumbHex)"))
      .select(col("doc_id"), expr("image_ahash(blob)").as("ahash"),
        expr("image_dct_hash(blob)").as("dhash"))
      .select(col("doc_id"), col("dhash"),
        expr("CAST(bit_count(dhash) AS BIGINT)").as("bits_set"),
        expr("CAST(bit_count(dhash ^ ahash) AS BIGINT)").as("vs_ahash_dist"))
      .orderBy("doc_id")
  }, Some(s"""WITH ${phashOracleCtes},
    gg AS (SELECT doc_id, ${graft.ops.Media.duckDctG("lums", "g")} FROM lm),
    ff AS (SELECT doc_id, ${graft.ops.Media.duckDctF("g", "f")} FROM gg),
    ft AS (SELECT doc_id, f, CAST(list_sum(f) AS BIGINT) AS t FROM ff),
    dh AS (SELECT doc_id, ${graft.ops.Media.duckDctFold("f", "t")} AS dhash FROM ft)
    SELECT dh.doc_id, dhash, CAST(bit_count(dhash) AS BIGINT) AS bits_set,
      CAST(bit_count(xor(dhash, ahash)) AS BIGINT) AS vs_ahash_dist
    FROM dh JOIN hh ON hh.doc_id = dh.doc_id ORDER BY dh.doc_id"""))

  /** NEYMAN optimal allocation (Neyman 1934 — public; the
    * variance-proportional stratified budget every survey/eval pipeline
    * uses when strata differ in spread): sample budget per stratum
    * n_h ∝ N_h·S_h, kept EXACT end-to-end. The trick that keeps the
    * float out: N_h·S_h = √(N_h·Σx² − (Σx)²) — n²-scaled population
    * variance is an INTEGER — so the weight is one exact integer sqrt
    * (floor(sqrt(double)) corrected ±1 by SQUARING, the
    * temperatureAlloc discipline) and the per-stratum budget comes from
    * the telescoping cumulative-quota apportionment that provably sums
    * to the budget. Headroom: cents ≤ 10⁴ ⟹ N·Σx² < 2⁶³ up to N ≈ 10⁷
    * rows per stratum — pre-scale x DIV k beyond that (weights only
    * need relative precision). One keyed agg + one sanctioned window
    * over the #strata relation.
    */
  val sampleNeymanAlloc: Q = Q("sample_neyman_alloc", (s, dir) => {
    import org.apache.spark.sql.expressions.Window
    val budget = 1000L
    val a = Tables.events(s, dir)
      .withColumn("x", expr("CAST(round(value * 100) AS BIGINT)"))
      .groupBy("event_type")
      .agg(count(lit(1)).as("n_rows"), sum("x").as("sx"),
        sum(expr("x * x")).as("sxx"))
      .withColumn("vv", expr("n_rows * sxx - sx * sx"))
      .withColumn("_k0", expr("CAST(floor(sqrt(CAST(vv AS DOUBLE))) AS BIGINT)"))
      .withColumn("sd_weight", expr(
        """CASE WHEN (_k0 + 1) * (_k0 + 1) <= vv THEN _k0 + 1
                WHEN _k0 * _k0 > vv THEN _k0 - 1 ELSE _k0 END"""))
    val wCum = Window.orderBy(col("event_type").asc)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val withCum = a.withColumn("cumw", sum("sd_weight").over(wCum))
    val tot = a.agg(sum("sd_weight").as("tw"))
    withCum.crossJoin(broadcast(tot))
      .select(col("event_type"), col("n_rows"), col("sd_weight"),
        expr(s"""CASE WHEN tw = 0 THEN 0L ELSE
          ($budget * cumw) DIV tw - ($budget * (cumw - sd_weight)) DIV tw
          END""").as("alloc"))
      .orderBy("event_type")
  }, Some("""WITH e AS (
      SELECT event_type, CAST(round(value * 100) AS BIGINT) AS x FROM events),
    a AS (SELECT event_type, count(*)::BIGINT AS n_rows,
        CAST(sum(x) AS BIGINT) AS sx, CAST(sum(x * x) AS BIGINT) AS sxx
      FROM e GROUP BY event_type),
    v AS (SELECT *, n_rows * sxx - sx * sx AS vv FROM a),
    k AS (SELECT *, CAST(floor(sqrt(CAST(vv AS DOUBLE))) AS BIGINT) AS k0 FROM v),
    w AS (SELECT event_type, n_rows,
        CASE WHEN (k0 + 1) * (k0 + 1) <= vv THEN k0 + 1
             WHEN k0 * k0 > vv THEN k0 - 1 ELSE k0 END AS sd_weight
      FROM k),
    c AS (SELECT event_type, n_rows, sd_weight,
        CAST(sum(sd_weight) OVER (ORDER BY event_type
          ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT) AS cumw
      FROM w),
    t AS (SELECT CAST(sum(sd_weight) AS BIGINT) AS tw FROM w)
    SELECT event_type, n_rows, sd_weight,
      CAST(CASE WHEN tw = 0 THEN 0 ELSE
        (1000 * cumw) // tw - (1000 * (cumw - sd_weight)) // tw
        END AS BIGINT) AS alloc
    FROM c, t ORDER BY event_type"""))

  /** Audio twin of [[multimodalPhash]] over a REAL PCM payload: each
    * doc's WAV now carries 65 actual mono 16-bit samples (little-endian
    * int16s from per-word md5, so near-identical texts give
    * near-identical streams), and the codegen'd byte-level
    * [[graft.expressions.AudioFingerprint]] decoder derives the 64-bit
    * sign-of-difference fingerprint (Haitsma–Kalker ISMIR'02, one-band
    * form) — header validation, signed-sample parse, delta bits. The
    * oracle re-reads the identical samples by hex offset arithmetic and
    * refolds the identical bits. Per-row, zero shuffle; the banded
    * near-dup machinery is shared with the image path (same 4×16
    * pigeonhole applies downstream).
    */
  val multimodalAudioFingerprint: Q = Q("multimodal_audio_fingerprint", (s, dir) => {
    graft.expressions.AudioFingerprint.register(s)
    val sx: Int => String = k => {
      val md5 = s"upper(md5(element_at(ws, $k % nw + 1)))"
      s"(substr($md5, 3, 2) || substr($md5, 1, 2))" // LE byte order
    }
    val wavHex = graft.ops.Media.pcmWavHexExpr(sx)
    Tables.t(s, dir, "documents")
      .withColumn("ws", split(col("text"), " "))
      .withColumn("nw", expr("size(ws)"))
      .select(col("doc_id"), expr(s"audio_fingerprint(unhex($wavHex))").as("afp"))
      .withColumn("bits_set", expr("CAST(bit_count(afp) AS BIGINT)"))
      .orderBy("doc_id")
  }, Some {
    val sx: Int => String = k => {
      val md5 = s"upper(md5(ws[($k % nw) + 1]))"
      s"(substr($md5, 3, 2) || substr($md5, 1, 2))"
    }
    val wavHex = graft.ops.Media.pcmWavHexExpr(sx)
    s"""WITH d AS (SELECT doc_id, string_split(text, ' ') AS ws,
        len(string_split(text, ' ')) AS nw FROM documents),
    hx AS (SELECT doc_id, hex(unhex($wavHex)) AS h FROM d),
    sm AS (SELECT doc_id, ${graft.ops.Media.duckPcmSamples("h", "ss")} FROM hx),
    fp AS (SELECT doc_id, ${graft.ops.Media.duckDeltaFold("ss")} AS afp FROM sm)
    SELECT doc_id, afp, CAST(bit_count(afp) AS BIGINT) AS bits_set
    FROM fp ORDER BY doc_id"""
  })

  /** Per-source DATASET CARD — the one-row-per-slice manifest a
    * training pipeline publishes with every snapshot (Gebru et al.,
    * "Datasheets for Datasets", CACM 2021 — public, motivates the
    * shape; the numbers here are the mechanical integrity half):
    * volume (docs, words, truncating mean), composition (language
    * count, dominant language and its share), length risk (share of
    * sub-30-word docs) and exact-duplicate exposure (share of docs
    * whose full text md5 collides inside the source) — every metric an
    * exact count or basis-point integer. Shape: one doc-level pass
    * feeding three keyed aggregations + a per-source top-1 window;
    * everything joins back on the low-cardinality source key.
    */
  val pipelineDatasetCard: Q = Q("pipeline_dataset_card", (s, dir) => {
    import org.apache.spark.sql.expressions.Window
    val d = Tables.t(s, dir, "documents")
      .withColumn("w_n", expr("CAST(size(split(text, ' ')) AS BIGINT)"))
      .withColumn("th", md5(col("text")))
    val base = d.groupBy("source").agg(
      count(lit(1)).as("n_docs"), sum("w_n").as("words"),
      sum(when(col("w_n") < 30, 1L).otherwise(0L)).as("short_n"))
    val dups = d.groupBy("source", "th").agg(count(lit(1)).as("k"))
      .groupBy("source")
      .agg(sum(expr("CASE WHEN k > 1 THEN k ELSE 0L END")).as("dup_docs"))
    val langs = d.groupBy("source", "lang").agg(count(lit(1)).as("ln"))
    val topLang = langs.withColumn("rn", row_number().over(
        Window.partitionBy("source").orderBy(col("ln").desc, col("lang").asc)))
      .filter(col("rn") === 1)
      .select(col("source"), col("lang").as("top_lang"), col("ln").as("top_n"))
    val nLangs = langs.groupBy("source").agg(count(lit(1)).as("n_langs"))
    base.join(nLangs, "source").join(topLang, "source").join(dups, "source")
      .select(col("source"), col("n_docs"), col("words"),
        expr("words DIV n_docs").as("mean_words"),
        expr("short_n * 10000 DIV n_docs").as("short_bp"),
        col("n_langs"), col("top_lang"),
        expr("top_n * 10000 DIV n_docs").as("top_lang_bp"),
        expr("dup_docs * 10000 DIV n_docs").as("dup_bp"))
      .orderBy("source")
  }, Some("""WITH d AS (
      SELECT source, lang, md5(text) AS th,
        CAST(len(string_split(text, ' ')) AS BIGINT) AS w_n
      FROM documents),
    base AS (SELECT source, count(*)::BIGINT AS n_docs,
        CAST(sum(w_n) AS BIGINT) AS words,
        CAST(sum(CASE WHEN w_n < 30 THEN 1 ELSE 0 END) AS BIGINT) AS short_n
      FROM d GROUP BY source),
    dg AS (SELECT source, th, count(*)::BIGINT AS k
      FROM d GROUP BY source, th),
    dups AS (SELECT source,
        CAST(sum(CASE WHEN k > 1 THEN k ELSE 0 END) AS BIGINT) AS dup_docs
      FROM dg GROUP BY source),
    langs AS (SELECT source, lang, count(*)::BIGINT AS ln
      FROM d GROUP BY source, lang),
    top_l AS (SELECT source, lang AS top_lang, ln AS top_n FROM langs
      QUALIFY row_number() OVER (PARTITION BY source
        ORDER BY ln DESC, lang ASC) = 1),
    nl AS (SELECT source, count(*)::BIGINT AS n_langs FROM langs GROUP BY source)
    SELECT base.source, n_docs, words,
      words // n_docs AS mean_words,
      short_n * 10000 // n_docs AS short_bp,
      n_langs, top_lang,
      top_n * 10000 // n_docs AS top_lang_bp,
      dup_docs * 10000 // n_docs AS dup_bp
    FROM base JOIN nl USING (source) JOIN top_l USING (source)
      JOIN dups USING (source)
    ORDER BY base.source"""))

  /** Deterministic Poisson bootstrap of the corpus mean document length
    * — the distributed-bootstrap construction (Chamandy et al., "Teaching
    * statistics at Google scale", and the classic Poissonized resample:
    * each doc enters replica b with multiplicity k ~ Poisson(1)), with
    * the randomness replaced by the repo's md5 hash so both engines draw
    * IDENTICAL multiplicities: u = h60(doc_id:b) mod 1e9 inverted
    * through the exact Poisson(1) CDF thresholds (e9-scaled, k capped at
    * 9 where the tail mass is 1.1e-7). The 32 replicate means ARE the
    * bootstrap distribution — rank them and read any CI off the order
    * statistics; means are truncating integer division, so every value
    * is exact. Scale: the explode is a fixed 32× fan-out feeding a
    * map-side-combinable 32-group aggregate — no shuffle grows with
    * replica count, the canonical one-pass bootstrap every distributed
    * engine ships.
    */
  val sampleBootstrap: Q = Q("sample_bootstrap", (s, dir) => {
    graft.expressions.Md5Hash60.registerActive()
    val cum = Seq(367879441L, 735758882L, 919698602L, 981011843L,
      996340153L, 999405815L, 999916758L, 999989750L, 999998874L)
    val kExpr = cum.map(c => s"(CASE WHEN u >= ${c}L THEN 1 ELSE 0 END)").mkString(" + ")
    Tables.t(s, dir, "documents")
      .select(col("doc_id"), col("n_chars"),
        explode(expr("sequence(1, 32)")).as("b"))
      .withColumn("u", expr(
        "graft_h60(concat('boot', CAST(doc_id AS STRING), ':', CAST(b AS STRING))) % 1000000000"))
      .withColumn("k", expr(kExpr))
      .groupBy("b")
      .agg(sum("k").as("n_eff"),
        expr("sum(k * n_chars) DIV sum(k)").as("mean_chars"))
      .orderBy("b")
  }, Some {
    val cum = Seq(367879441L, 735758882L, 919698602L, 981011843L,
      996340153L, 999405815L, 999916758L, 999989750L, 999998874L)
    val kExpr = cum.map(c => s"(CASE WHEN u >= $c THEN 1 ELSE 0 END)").mkString(" + ")
    s"""WITH r AS (
      SELECT doc_id, n_chars, t.b,
        CAST('0x' || substr(md5('boot' || CAST(doc_id AS VARCHAR) || ':' || CAST(t.b AS VARCHAR)), 1, 15) AS BIGINT)
          % 1000000000 AS u
      FROM documents CROSS JOIN (SELECT unnest(range(1, 33)) AS b) t),
    k AS (SELECT b, n_chars, $kExpr AS k FROM r)
    SELECT CAST(b AS INT) AS b, sum(k)::BIGINT AS n_eff,
      CAST(sum(k * n_chars) // sum(k) AS BIGINT) AS mean_chars
    FROM k GROUP BY b ORDER BY b"""
  })

  /** Container integrity audit — the corruption gate an ingest pipeline
    * runs BEFORE any decoder touches a blob (truncated uploads are the
    * dominant real-world multimodal defect, and every format declares
    * enough to catch them): BMP's header carries the exact file size
    * (le32 at offset 2 — must equal the actual byte count), a GIF must
    * END with the 0x3B trailer byte, and the APNG synthesis has a fixed
    * 53-byte minimum (signature + IHDR + acTL). Corruption is INJECTED
    * deterministically — every 13th doc's asset loses its last 3 bytes —
    * and the audit's flag set must reproduce the injection set exactly
    * (the `agree` column proves recall AND precision per format). Byte
    * arithmetic runs on the common hex dialect in both engines; per-row
    * column work, zero shuffle before the 3-group rollup.
    */
  val multimodalIntegrity: Q = Q("multimodal_integrity", (s, dir) => {
    val assetHex = graft.ops.Media.assetHexExpr(
      "doc_id", "CAST(octet_length(text) AS BIGINT)")
    def le32(o: Int) = s"CAST(conv(substr(h, ${2 * o + 7}, 2) || substr(h, ${2 * o + 5}, 2) || " +
      s"substr(h, ${2 * o + 3}, 2) || substr(h, ${2 * o + 1}, 2), 16, 10) AS BIGINT)"
    Tables.t(s, dir, "documents")
      .withColumn("h0", expr(assetHex))
      .withColumn("inj", expr("doc_id % 13 = 0"))
      .withColumn("h", expr("CASE WHEN doc_id % 13 = 0 THEN substr(h0, 1, length(h0) - 6) ELSE h0 END"))
      .withColumn("actual", expr("length(h) DIV 2"))
      .withColumn("format", expr("""CASE WHEN substr(h, 1, 4) = '424D' THEN 'bmp'
        WHEN substr(h, 1, 16) = '89504E470D0A1A0A' THEN 'png' ELSE 'gif' END"""))
      .withColumn("intact", expr(s"""CASE format
        WHEN 'bmp' THEN ${le32(2)} = actual
        WHEN 'png' THEN actual >= 53
        ELSE substr(h, length(h) - 1, 2) = '3B' END"""))
      .groupBy("format")
      .agg(count(lit(1)).as("n_assets"),
        sum(when(col("inj"), 1L).otherwise(0L)).as("n_injected"),
        sum(when(!col("intact"), 1L).otherwise(0L)).as("n_flagged"),
        min(col("inj") === !col("intact")).as("agree"))
      .orderBy("format")
  }, Some {
    val assetHex = graft.ops.Media.assetHexExpr(
      "doc_id", "CAST(octet_length(encode(text)) AS BIGINT)")
    def le32(o: Int) = s"CAST('0x' || substr(h, ${2 * o + 7}, 2) || substr(h, ${2 * o + 5}, 2) || " +
      s"substr(h, ${2 * o + 3}, 2) || substr(h, ${2 * o + 1}, 2) AS BIGINT)"
    s"""WITH a AS (SELECT doc_id, $assetHex AS h0, doc_id % 13 = 0 AS inj
      FROM documents),
    t AS (SELECT doc_id, inj,
        CASE WHEN inj THEN substr(h0, 1, length(h0) - 6) ELSE h0 END AS h
      FROM a),
    d AS (SELECT doc_id, inj, h, length(h) // 2 AS actual,
        CASE WHEN substr(h, 1, 4) = '424D' THEN 'bmp'
          WHEN substr(h, 1, 16) = '89504E470D0A1A0A' THEN 'png' ELSE 'gif' END AS format
      FROM t),
    i AS (SELECT format, inj,
        CASE format
          WHEN 'bmp' THEN ${le32(2)} = actual
          WHEN 'png' THEN actual >= 53
          ELSE substr(h, length(h) - 1, 2) = '3B' END AS intact
      FROM d)
    SELECT format, count(*)::BIGINT AS n_assets,
      sum(CASE WHEN inj THEN 1 ELSE 0 END)::BIGINT AS n_injected,
      sum(CASE WHEN NOT intact THEN 1 ELSE 0 END)::BIGINT AS n_flagged,
      min(inj = (NOT intact)) AS agree
    FROM i GROUP BY format ORDER BY format"""
  })

  /** Snake-order shard layout: documents are ranked by size (chars
    * desc) and dealt onto 8 output shards boustrophedon-style (lap 0
    * deals 0→7, lap 1 deals 7→0, …) — the classic longest-processing-
    * time-first balancing deal that bounds any shard's excess by one
    * document, i.e. how training corpora are split into same-cost
    * shards so no data-parallel worker straggles. The global size rank
    * comes from [[graft.ops.Sample.shardedRank]]'s DISTRIBUTED
    * prefix-count over a packed (size, id) key — bit-identical to
    * `row_number() OVER (ORDER BY n_chars DESC, doc_id)` with NO
    * data-sized global window (the join lint's contract); a loud gate
    * bounds n_chars under the 2¹² packing limit. Output: per-shard doc
    * and char totals plus the signed deviation from the ideal in bp —
    * the imbalance a straggler analysis reads.
    */
  val pipelineShardBalance: Q = Q("pipeline_shard_balance", (s, dir) => {
    val d = Tables.t(s, dir, "documents")
      .withColumn("_nc", expr("""CASE WHEN n_chars > 0 AND n_chars < 4096 THEN n_chars
        ELSE CAST(raise_error(concat('pipeline_shard_balance: n_chars out of (0, 4096): ',
          CAST(n_chars AS STRING))) AS BIGINT) END"""))
      .withColumn("_key", expr("(4096 - _nc) * 4294967296 + doc_id"))
      .withColumn("_one", lit(1))
    val ranked = graft.ops.Sample.shardedRank(d, "_one", "_key",
      shardSize = 64L * 4294967296L)
    ranked
      .withColumn("shard", expr(
        "CASE WHEN (rn DIV 8) % 2 = 0 THEN rn % 8 ELSE 7 - rn % 8 END"))
      .groupBy("shard")
      .agg(count(lit(1)).as("n_docs"), sum("n_chars").as("chars"))
      .crossJoin(broadcast(
        Tables.t(s, dir, "documents")
          .agg(expr("sum(n_chars) DIV 8").as("ideal"))))
      .select(col("shard"), col("n_docs"), col("chars"),
        expr("10000 * (chars - ideal) DIV ideal").as("dev_bp"))
      .orderBy("shard")
  }, Some("""WITH r AS (
      SELECT doc_id, n_chars,
        row_number() OVER (ORDER BY n_chars DESC, doc_id) - 1 AS rn
      FROM documents),
    sh AS (SELECT doc_id, n_chars,
        CASE WHEN (rn // 8) % 2 = 0 THEN rn % 8 ELSE 7 - rn % 8 END AS shard
      FROM r),
    i AS (SELECT CAST(sum(n_chars) // 8 AS BIGINT) AS ideal FROM documents)
    SELECT CAST(shard AS BIGINT) AS shard, count(*)::BIGINT AS n_docs,
      sum(n_chars)::BIGINT AS chars,
      CAST(10000 * (sum(n_chars) - i.ideal) // i.ideal AS BIGINT) AS dev_bp
    FROM sh CROSS JOIN i
    GROUP BY shard, i.ideal ORDER BY shard"""))

  /** Horvitz–Thompson estimation under unequal-rate stratified
    * sampling (Horvitz &amp; Thompson 1952, public — THE design-
    * unbiased estimator every survey-sampled corpus audit rests on):
    * each source stratum samples at its own deterministic rate 1/k
    * (md5 coin, k ∈ {2..5} derived from the source name), and the
    * stratum total is recovered as k·Σ(sampled chars) — inverse-
    * inclusion-probability weighting in EXACT integers (rates are
    * unit fractions, so the weight is the integer k itself; no float
    * division anywhere). Output per source: truth, sample size, the
    * HT estimate and its signed error in bp — the accuracy-vs-cost
    * table that justifies sampled audits at 100 TB (scan 1/k of the
    * bytes, bounded relative error). One pass, map-side combinable.
    */
  val sampleHtEstimate: Q = Q("sample_ht_estimate", (s, dir) => {
    graft.expressions.Md5Hash60.registerActive()
    Tables.t(s, dir, "documents")
      .withColumn("k", expr("2 + graft_h60(concat('htk:', source)) % 4"))
      .withColumn("picked", expr("graft_h60(concat('ht:', CAST(doc_id AS STRING))) % k = 0"))
      .groupBy("source")
      .agg(max("k").as("k"),
        count(lit(1)).as("n_docs"),
        sum("n_chars").as("true_chars"),
        sum(when(col("picked"), 1L).otherwise(0L)).as("n_sampled"),
        (max("k") * sum(when(col("picked"), col("n_chars")).otherwise(0L))).as("ht_chars"))
      .withColumn("err_bp", expr("10000 * (ht_chars - true_chars) DIV true_chars"))
      .orderBy("source")
  }, Some("""WITH d AS (
      SELECT source, doc_id, n_chars,
        2 + CAST('0x' || substr(md5('htk:' || source), 1, 15) AS BIGINT) % 4 AS k
      FROM documents),
    p AS (SELECT *,
        CAST('0x' || substr(md5('ht:' || CAST(doc_id AS VARCHAR)), 1, 15) AS BIGINT) % k = 0 AS picked
      FROM d)
    SELECT source, CAST(max(k) AS BIGINT) AS k, count(*)::BIGINT AS n_docs,
      sum(n_chars)::BIGINT AS true_chars,
      sum(CASE WHEN picked THEN 1 ELSE 0 END)::BIGINT AS n_sampled,
      CAST(max(k) * sum(CASE WHEN picked THEN n_chars ELSE 0 END) AS BIGINT) AS ht_chars,
      CAST(10000 * (max(k) * sum(CASE WHEN picked THEN n_chars ELSE 0 END) - sum(n_chars))
        // sum(n_chars) AS BIGINT) AS err_bp
    FROM p GROUP BY source ORDER BY source"""))

  /** Video scene-cut detection by perceptual-hash jump — the shot-
    * boundary detector real video pipelines run on sampled frames
    * (consecutive-frame aHash Hamming distance over a threshold ⇒ cut;
    * cheap, codec-agnostic, and robust to per-frame noise, unlike raw
    * pixel SAD). Frames are REAL 8×8 BMP bytes built per (doc, frame)
    * by the common hex dialect: each 5-frame shot renders a stable
    * word-seeded luminance pattern, plus a per-frame md5 jitter of
    * 0–7 levels (so within-shot hashes differ by a FEW bits — the
    * realistic regime — while shot changes flip ~half the hash). The
    * codegen'd [[graft.expressions.ImageAHash]] decodes every frame's
    * bytes; the oracle re-decodes the identical bytes by hex-offset
    * arithmetic and agrees bit-for-bit, jitter and all. Scale: frame
    * fan-out is bounded (≤30/doc), hashing is per-row codegen, the only
    * shuffle is the per-doc lag window + final rollup — video-frame
    * volume never joins anything.
    */
  val multimodalScenecut: Q = Q("multimodal_scenecut", (s, dir) => {
    import org.apache.spark.sql.expressions.Window
    graft.expressions.ImageAHash.register(s)
    val px: Int => String = k =>
      s"upper(lpad(hex((CAST(conv(substr(md5(element_at(ws, CAST(($k + 11 * shot) % nw + 1 AS INT))), 1, 2), 16, 10) AS BIGINT)" +
        s" + CAST(conv(substr(jh, ${(k % 16) * 2 + 1}, 2), 16, 10) AS BIGINT) % 8) % 256), 2, '0'))"
    val thumbHex = graft.ops.Media.thumbBmpHexExpr(px)
    val frames = Tables.t(s, dir, "documents")
      .withColumn("ws", split(col("text"), " "))
      .withColumn("nw", expr("size(ws)"))
      .withColumn("f", explode(expr("sequence(0, doc_id % 30)")))
      .withColumn("shot", expr("f DIV 5"))
      .withColumn("jh", expr("md5(concat('jit', CAST(doc_id AS STRING), ':', CAST(f AS STRING)))"))
      .select(col("doc_id"), col("f"),
        expr(s"image_ahash(unhex($thumbHex))").as("ahash"))
    val w = Window.partitionBy("doc_id").orderBy("f")
    frames.withColumn("prev", lag("ahash", 1).over(w))
      .withColumn("ham", expr("CAST(bit_count(ahash ^ prev) AS BIGINT)"))
      .groupBy("doc_id")
      .agg(count(lit(1)).as("n_frames"),
        sum(when(col("ham") >= 12, 1L).otherwise(0L)).as("n_cuts"),
        max("ham").as("max_ham"),
        sum(when(col("ham") < 12, col("ham")).otherwise(0L)).as("intra_ham_sum"))
      .orderBy("doc_id")
  }, Some {
    val px: Int => String = k =>
      s"upper(lpad(hex((CAST('0x' || substr(md5(ws[(($k + 11 * shot) % nw) + 1]), 1, 2) AS BIGINT)" +
        s" + CAST('0x' || substr(jh, ${(k % 16) * 2 + 1}, 2) AS BIGINT) % 8) % 256), 2, '0'))"
    val thumbHex = graft.ops.Media.thumbBmpHexExpr(px)
    s"""WITH d AS (SELECT doc_id, string_split(text, ' ') AS ws,
        len(string_split(text, ' ')) AS nw FROM documents),
    fr0 AS (SELECT doc_id, ws, nw,
        unnest(range(0, 1 + doc_id % 30)) AS f FROM d),
    fr AS (SELECT doc_id, ws, nw, f, f // 5 AS shot,
        md5('jit' || CAST(doc_id AS VARCHAR) || ':' || CAST(f AS VARCHAR)) AS jh
      FROM fr0),
    hx AS (SELECT doc_id, f, hex(unhex($thumbHex)) AS h FROM fr),
    lm AS (SELECT doc_id, f, ${graft.ops.Media.duckAHashSql("h", "lums")} FROM hx),
    tt AS (SELECT doc_id, f, lums, ${graft.ops.Media.duckLumSum("lums")} AS t FROM lm),
    hh AS (SELECT doc_id, f, ${graft.ops.Media.duckAHashFold("lums", "t")} AS ahash FROM tt),
    lg AS (SELECT doc_id, f, ahash,
        lag(ahash) OVER (PARTITION BY doc_id ORDER BY f) AS prev FROM hh),
    hm AS (SELECT doc_id,
        CASE WHEN prev IS NULL THEN NULL
             ELSE CAST(bit_count(xor(ahash, prev)) AS BIGINT) END AS ham
      FROM lg)
    SELECT doc_id, count(*)::BIGINT AS n_frames,
      sum(CASE WHEN ham >= 12 THEN 1 ELSE 0 END)::BIGINT AS n_cuts,
      max(ham) AS max_ham,
      sum(CASE WHEN ham < 12 THEN ham ELSE 0 END)::BIGINT AS intra_ham_sum
    FROM hm GROUP BY doc_id ORDER BY doc_id"""
  })

  /** Edit-distance-1 word-pair mining via the SymSpell deletion
    * neighborhood (Garbe's symmetric-delete algorithm — public): two
    * words are at Levenshtein distance ≤ 1 only if they share a key in
    * {word} ∪ single-character-deletions(word), so candidates come
    * from an EQUI-join on that bounded key set (≤ len+1 keys per vocab
    * entry), never a vocab×vocab cross — the near-duplicate-identifier
    * primitive behind typo normalization and entity resolution, bound
    * here to the customer-name universe (IDs differing in one digit
    * are exactly the fat-finger duplicates an account deduper hunts;
    * the doc-word corpus has no distance-1 pairs by construction).
    * Both engines dedupe the per-word key set before the join
    * (array_union / list_distinct), the key index is df-capped at 64
    * with the identical QUALIFY cut in the oracle (hot short keys are
    * the stop-grams of this miner), and the final levenshtein(wa,wb)=1
    * filter is exact in both engines (ASCII-only vocab keeps
    * codepoint-vs-byte semantics out of play). Output is the per-name
    * neighbor summary (count + lexical extremes), keeping result size
    * linear in the vocabulary while still hash-pinning every mined
    * pair through the counts. Shapes: one distinct (Aggregate boundary
    * for the self-join lint), one bounded key explode, one
    * key-partitioned cap window co-located with the equi-join key.
    */
  val editPairs: Q = Q("text_edit_pairs", (s, dir) => {
    val vocab = Tables.t(s, dir, "customer")
      .select(lower(col("c_name")).as("word")).distinct()
      .filter(col("word").rlike("^[a-z#0-9]{4,24}$"))
    val keyed = vocab.select(col("word"),
      explode(expr("""array_union(array(word),
        transform(sequence(1, length(word)),
          i -> concat(substring(word, 1, i - 1), substring(word, i + 1))))""")).as("k"))
    val capped = graft.ops.Scale.capGroups(keyed, "k", 64L)
    val a = capped.select(col("k"), col("word").as("wa"))
    val b = capped.select(col("k"), col("word").as("wb"))
    a.join(b, Seq("k")).filter(col("wa") < col("wb"))
      .select("wa", "wb").distinct()
      .filter(levenshtein(col("wa"), col("wb")) === 1)
      .groupBy("wa")
      .agg(count(lit(1)).as("n_nbrs"), min("wb").as("wb_min"), max("wb").as("wb_max"))
      .orderBy("wa")
  }, Some("""WITH v AS (
      SELECT DISTINCT lower(c_name) AS word FROM customer
      WHERE regexp_matches(lower(c_name), '^[a-z#0-9]{4,24}$')),
    k0 AS (SELECT word, unnest(list_distinct(list_prepend(word,
        list_transform(range(1, len(word) + 1),
          i -> substr(word, 1, i - 1) || substr(word, i + 1))))) AS k
      FROM v),
    kc AS (SELECT word, k FROM k0
      QUALIFY count(*) OVER (PARTITION BY k) <= 64),
    p AS (SELECT DISTINCT a.word AS wa, b.word AS wb
      FROM kc a JOIN kc b ON a.k = b.k AND a.word < b.word)
    SELECT wa, count(*)::BIGINT AS n_nbrs,
      min(wb) AS wb_min, max(wb) AS wb_max
    FROM p WHERE levenshtein(wa, wb) = 1
    GROUP BY wa ORDER BY wa"""))

  /** Lexical-richness profile per language: hapax legomena (words seen
    * exactly once corpus-wide), dis legomena (exactly twice), the
    * vocabulary size, and the type-token ratio — all in exact integer
    * basis points. Herdan/Zipf vocabulary-growth laws make
    * hapax-share ≈ 50% the healthy-corpus signature; a far lower
    * share means templated/duplicated text (the cheap tripwire before
    * running dedup), far higher means OCR noise or tokenizer damage.
    * Two partial-agg shuffles (word counts, then count-of-count
    * classes per language) over the bounded (lang, word) key space.
    */
  /** Word burstiness — the dispersion statistic behind Church & Gale's
    * "Poisson mixtures" (1995) and Katz's "adaptation" (1996 — both
    * public): natural-language content words CLUMP (one mention begets
    * another in the same document) while function words spread evenly,
    * so cf/df (mean occurrences per containing document) and
    * P(repeat | occurs) = (cf−df)/cf separate topical vocabulary from
    * glue — and from spam (pathologically bursty). Exact integers:
    * burst_e4 = 10⁴·cf DIV df, adapt_bp = 10⁴·(cf−df) DIV cf; words
    * with cf < 5 are dropped for stability, output is the top-30 by
    * (burst desc, word). One (doc, word) count, one word-keyed agg,
    * one TakeOrdered.
    */
  val textWordBurstiness: Q = Q("text_word_burstiness", (s, dir) => {
    val dw = Tables.t(s, dir, "documents")
      .select(col("doc_id"), explode(graft.ops.Text.words(col("text"))).as("word"))
      .groupBy("doc_id", "word").agg(count(lit(1)).as("c"))
    dw.groupBy("word")
      .agg(sum("c").as("cf"), count(lit(1)).as("df"))
      .filter(col("cf") >= 5)
      .withColumn("burst_e4", expr("10000 * cf DIV df"))
      .withColumn("adapt_bp", expr("10000 * (cf - df) DIV cf"))
      .select("word", "cf", "df", "burst_e4", "adapt_bp")
      .orderBy(col("burst_e4").desc, col("word").asc).limit(30)
  }, Some("""WITH w AS (
      SELECT doc_id,
        unnest(list_filter(string_split(lower(text), ' '), x -> x <> '')) AS word
      FROM documents),
    dw AS (SELECT doc_id, word, count(*)::BIGINT AS c FROM w GROUP BY 1, 2),
    a AS (SELECT word, CAST(sum(c) AS BIGINT) AS cf, count(*)::BIGINT AS df
      FROM dw GROUP BY word)
    SELECT word, cf, df,
      CAST(10000 * cf // df AS BIGINT) AS burst_e4,
      CAST(10000 * (cf - df) // cf AS BIGINT) AS adapt_bp
    FROM a WHERE cf >= 5
    ORDER BY burst_e4 DESC, word ASC LIMIT 30"""))

  val textHapax: Q = Q("text_hapax", (s, dir) => {
    val w = Tables.t(s, dir, "documents")
      .select(col("lang"),
        explode(filter(split(lower(col("text")), " "), x => x =!= "")).as("word"))
    val wc = w.groupBy("lang", "word").agg(count(lit(1)).as("n"))
    wc.groupBy("lang")
      .agg(count(lit(1)).as("vocab"),
        sum("n").as("tokens"),
        sum(expr("CASE WHEN n = 1 THEN 1L ELSE 0L END")).as("hapax"),
        sum(expr("CASE WHEN n = 2 THEN 1L ELSE 0L END")).as("dis"))
      .select(col("lang"), col("vocab"), col("tokens"), col("hapax"), col("dis"),
        expr("hapax * 10000 DIV vocab").as("hapax_share_bp"),
        expr("vocab * 10000 DIV tokens").as("ttr_bp"))
      .orderBy("lang")
  }, Some("""WITH w AS (
      SELECT lang,
        unnest(list_filter(string_split(lower(text), ' '), x -> x <> '')) AS word
      FROM documents),
    wc AS (SELECT lang, word, count(*)::BIGINT AS n FROM w GROUP BY lang, word),
    ag AS (SELECT lang, count(*)::BIGINT AS vocab,
        CAST(sum(n) AS BIGINT) AS tokens,
        CAST(sum(CASE WHEN n = 1 THEN 1 ELSE 0 END) AS BIGINT) AS hapax,
        CAST(sum(CASE WHEN n = 2 THEN 1 ELSE 0 END) AS BIGINT) AS dis
      FROM wc GROUP BY lang)
    SELECT lang, vocab, tokens, hapax, dis,
      hapax * 10000 // vocab AS hapax_share_bp,
      vocab * 10000 // tokens AS ttr_bp
    FROM ag ORDER BY lang"""))

  /** Interpolated Kneser–Ney bigram probabilities (Kneser & Ney, ICASSP
    * 1995; Chen & Goodman 1998 — public), the smoothing every serious
    * n-gram LM pipeline ships, in EXACT fixed point: with discount
    * d = 0.75 carried as 75⁄100, P_KN(w₂|w₁) = max(c(w₁w₂)−d, 0)⁄c(w₁)
    * + d·N₁₊(w₁·)⁄c(w₁) · P_cont(w₂), where the continuation prob
    * P_cont(w₂) = N₁₊(·w₂)⁄N counts bigram TYPES — the "how many
    * contexts does this word follow" mass that separates KN from the
    * add-k smoothing of [[textLmBigram]]. Each term is its own
    * truncating e6 DIV, so both engines walk identical integer paths.
    * Every model statistic (c₁, N₁₊(w₁·), N₁₊(·w₂), N) derives from ONE
    * pass over the c₂ table — the bigram-type relation — so the plan is
    * the bigram count shuffle plus three vocabulary-sized partial aggs
    * and a 1-row broadcast; no second scan of the corpus. Headroom:
    * 10⁸·c₂ holds to c₂ ≈ 9·10¹⁰ adjacent repeats of one bigram.
    */
  val textKneserNey: Q = Q("text_kneser_ney", (s, dir) => {
    val d = Tables.t(s, dir, "documents")
      .select(col("doc_id"), graft.ops.Text.words(col("text")).as("ws"))
    val pos = d.select(col("doc_id"), posexplode(col("ws")))
      .toDF("doc_id", "pos", "w")
    val ww = Window.partitionBy("doc_id").orderBy("pos")
    val pairs = pos.withColumn("w2", lead("w", 1).over(ww))
      .filter(col("w2").isNotNull)
      .select(col("w").as("w1"), col("w2"))
    val c2 = pairs.groupBy("w1", "w2").agg(count(lit(1)).as("c2"))
    val ctx = c2.groupBy("w1")
      .agg(sum("c2").as("c1"), count(lit(1)).as("n1w1"))
    val cont = c2.groupBy("w2").agg(count(lit(1)).as("nc"))
    val nTypes = c2.agg(count(lit(1)).as("n_types"))
    c2.join(ctx, "w1").join(cont, "w2").crossJoin(broadcast(nTypes))
      .withColumn("pcont_e6", expr("1000000 * nc DIV n_types"))
      .withColumn("pkn_e6", expr(
        """1000000 * greatest(100 * c2 - 75, 0) DIV (100 * c1)
           + 75 * n1w1 * pcont_e6 DIV (100 * c1)"""))
      .select("w1", "w2", "c2", "c1", "n1w1", "nc", "pcont_e6", "pkn_e6")
      .orderBy(col("c2").desc, col("w1"), col("w2")).limit(50)
  }, Some("""WITH d AS (
      SELECT doc_id, list_filter(string_split(lower(text), ' '), x -> x <> '') AS ws
      FROM documents),
    pr AS (SELECT doc_id,
        unnest(list_transform(range(1, greatest(len(ws) - 1, 0) + 1),
          i -> [ws[i], ws[i + 1]])) AS p
      FROM d),
    pairs AS (SELECT p[1] AS w1, p[2] AS w2 FROM pr),
    c2 AS (SELECT w1, w2, count(*)::BIGINT AS c2 FROM pairs GROUP BY w1, w2),
    ctx AS (SELECT w1, CAST(sum(c2) AS BIGINT) AS c1, count(*)::BIGINT AS n1w1
      FROM c2 GROUP BY w1),
    cont AS (SELECT w2, count(*)::BIGINT AS nc FROM c2 GROUP BY w2),
    nt AS (SELECT count(*)::BIGINT AS n_types FROM c2)
    SELECT c2.w1, c2.w2, c2.c2, ctx.c1, ctx.n1w1, cont.nc,
      CAST(1000000 * cont.nc // nt.n_types AS BIGINT) AS pcont_e6,
      CAST(1000000 * greatest(100 * c2.c2 - 75, 0) // (100 * ctx.c1)
        + 75 * ctx.n1w1 * (1000000 * cont.nc // nt.n_types) // (100 * ctx.c1)
        AS BIGINT) AS pkn_e6
    FROM c2 JOIN ctx USING (w1) JOIN cont USING (w2), nt
    ORDER BY c2 DESC, w1, w2 LIMIT 50"""))

  private val wordpieceRounds = 3

  /** WORDPIECE tokenizer training — the third trainer of the family
    * (BPE = count-greedy, unigram-LM = EM-prune, WordPiece =
    * likelihood-gain greedy; Schuster &amp; Nakajima 2012, the BERT
    * tokenizer). Emits the ordered merge table with the exact
    * quantized-integer evidence behind each pick (pair count, both
    * unigram counts, score_e6) — [[graft.ops.Text.wordpieceTrain]]
    * holds the scoring note. Scale shape identical to bpe_pair_stats:
    * per round one pair-count aggregate + one symbol-count aggregate
    * over the framed corpus, a broadcast 1-row total, and a collected
    * 1-row winner; the oracle unrolls the rounds as MATERIALIZED CTEs.
    */
  val wordpieceMerges: Q = Q("pipeline_wordpiece_merges", (s, dir) => {
    val d = Tables.t(s, dir, "documents")
      .select(graft.ops.Text.bpeInitSeq(col("text")).as("seq"))
    val (merges, _) = graft.ops.Text.wordpieceTrain(d, "seq", wordpieceRounds)
    merges.orderBy("round")
  }, Some {
    import graft.ops.Text
    val chain = (1 to wordpieceRounds).map { r =>
      s""",
      u$r AS MATERIALIZED (${Text.wordpieceSymsSql(s"s${r - 1}")}),
      m$r AS MATERIALIZED (${Text.wordpiecePickSql(s"s${r - 1}", s"u$r")}),
      s$r AS MATERIALIZED (SELECT ${Text.bpeApplyMergeSql("seq", s"m$r")} AS seq
        FROM s${r - 1})"""
    }.mkString
    val out = (1 to wordpieceRounds).map { r =>
      s"""SELECT CAST($r AS BIGINT) AS round, w1, w2, cnt AS cnt_pair,
          na AS n_a, nb AS n_b, score_e6 FROM m$r"""
    }.mkString(" UNION ALL ")
    s"""WITH s0 AS MATERIALIZED (
      SELECT ${Text.bpeInitSeqSql("text")} AS seq FROM documents)$chain
    SELECT * FROM ($out) ORDER BY round"""
  })

  // ---- unigram-LM tokenizer (SentencePiece-style EM + prune) ----

  /** UNIGRAM-LM tokenizer TRAINING — the second tokenizer-training
    * family beside BPE ([[graft.ops.Unigram]] holds the full design
    * note). The distributed part is ONE word-count aggregate bounded
    * by the top-1024 cap; the EM-prune rounds run on the driver in
    * exact fixed-point Long arithmetic (the bpeTrain counted-small
    * pattern), and the DuckDB oracle replays seed → 3×(16-stage
    * integer-log₂ cost chain + relational Viterbi DP with arg_min
    * path backtrack + usage recount + prune) → final costs as one
    * unrolled MATERIALIZED-CTE chain. Output: the final vocabulary
    * with usage mass and −log₂ cost (2^-16 units).
    */
  val unigramVocab: Q = Q("pipeline_unigram_vocab", (s, dir) => {
    import s.implicits._
    graft.ops.Unigram.train(Tables.t(s, dir, "documents"))
      .map(p => (p.piece, p.isChar, p.usage, p.cost))
      .toDF("piece", "is_char", "usage", "cost_fix")
      .orderBy("piece")
  }, Some(s"""WITH ${graft.ops.Unigram.emOracleCtes()}
    SELECT piece, is_char, usage, cost AS cost_fix FROM c_fin ORDER BY piece"""))

  /** UNIGRAM-LM tokenizer APPLY: encode the corpus with the trained
    * vocabulary and report per-(lang, source) fertility (pieces per
    * word, basis points) — the unigram twin of bpe_encode /
    * pipeline_tokenizer_fertility. Scale shape: the corpus-sized work
    * is one (lang, source, word) count aggregate; the Viterbi DP runs
    * once per DISTINCT word as a 12-position unrolled chain of
    * codegen'd projections (packed cost|start|count states, vocab as
    * a literal map, out-of-vocab chars at the UNK cost) and the
    * per-word piece counts broadcast back onto the counts — no
    * data-sized join, window, or collect anywhere in the encode path.
    */
  val unigramFertility: Q = Q("pipeline_unigram_fertility", (s, dir) => {
    val docs = Tables.t(s, dir, "documents")
    val vocab = graft.ops.Unigram.train(docs)
    val wls = docs.select(col("lang"), col("source"),
        explode(expr("filter(split(lower(text), ' '), x -> x != '')")).as("word"))
      .groupBy("lang", "source", "word").agg(count(lit(1)).as("n"))
    val np = graft.ops.Unigram.pieceCounts(wls.select("word").distinct(), vocab)
    wls.join(broadcast(np), Seq("word"))
      .groupBy("lang", "source")
      .agg(sum("n").as("words"), sum(expr("n * np")).as("pieces"))
      .withColumn("fertility_bp", expr("(pieces * 10000) DIV words"))
      .orderBy("lang", "source")
  }, Some(s"""WITH ${graft.ops.Unigram.emOracleCtes()},
    ${graft.ops.Unigram.fertilityOracleCtes()}
    SELECT w.lang, w.source,
      CAST(sum(w.n) AS BIGINT) AS words,
      CAST(sum(w.n * p.np) AS BIGINT) AS pieces,
      (CAST(sum(w.n * p.np) AS BIGINT) * 10000) // CAST(sum(w.n) AS BIGINT) AS fertility_bp
    FROM wls w JOIN np p USING (word)
    GROUP BY 1, 2 ORDER BY 1, 2"""))

  /** UNIGRAM-LM DOCUMENT PERPLEXITY — CCNet's "does this read like the
    * corpus" filter (Wenzek et al. 1911.00359) scored by the engine's
    * OWN trained tokenizer instead of an external LM: a document's
    * surprisal is the total best-path cost (−log₂ P in 2^-16 units) of
    * its words under the corpus-trained unigram vocabulary, and the 25
    * highest bits-per-word documents are the out-of-model tail a
    * pipeline reviews or down-weights. Everything is exact integer
    * (the DP's packed state carries the cost in bits ≥ 8); ranking is
    * total-ordered by (bits_per_word_e3 DESC, doc_id). Scale shape:
    * per-(doc, word) counts (one corpus-sized aggregate), the
    * distinct-word DP (vocabulary-sized, codegen'd), broadcast join
    * back, TakeOrdered 25 — no data-sized window or collect.
    */
  val unigramSurprisal: Q = Q("quality_unigram_surprisal", (s, dir) => {
    val docs = Tables.t(s, dir, "documents")
    val vocab = graft.ops.Unigram.train(docs)
    val wdc = docs.select(col("doc_id"), col("lang"),
        explode(expr("filter(split(lower(text), ' '), x -> x != '')")).as("word"))
      .groupBy("doc_id", "lang", "word").agg(count(lit(1)).as("n"))
    val st = graft.ops.Unigram.pieceStats(wdc.select("word").distinct(), vocab)
    wdc.join(broadcast(st), Seq("word"))
      .groupBy("doc_id", "lang")
      .agg(sum("n").as("n_words"), sum(expr("n * np")).as("pieces"),
        sum(expr("n * wcost")).as("cost_fix"))
      .withColumn("bits_per_word_e3", expr("(cost_fix * 1000) DIV (n_words * 65536)"))
      .orderBy(desc("bits_per_word_e3"), asc("doc_id")).limit(25)
      .select("doc_id", "lang", "n_words", "pieces", "cost_fix", "bits_per_word_e3")
  }, Some(s"""WITH ${graft.ops.Unigram.emOracleCtes()},
    ${graft.ops.Unigram.fertilityOracleCtes()},
    wdc AS MATERIALIZED (
      SELECT doc_id, lang, w AS word, CAST(count(*) AS BIGINT) AS n
      FROM (SELECT doc_id, lang,
              unnest(list_filter(string_split(lower(text), ' '), x -> x <> '')) AS w
            FROM documents)
      GROUP BY 1, 2, 3)
    SELECT d.doc_id, d.lang,
      CAST(sum(d.n) AS BIGINT) AS n_words,
      CAST(sum(d.n * p.np) AS BIGINT) AS pieces,
      CAST(sum(d.n * p.wcost) AS BIGINT) AS cost_fix,
      (CAST(sum(d.n * p.wcost) AS BIGINT) * 1000)
        // (CAST(sum(d.n) AS BIGINT) * 65536) AS bits_per_word_e3
    FROM wdc d JOIN np p USING (word)
    GROUP BY 1, 2
    ORDER BY bits_per_word_e3 DESC, doc_id LIMIT 25"""))

  /** TRAINER COVERAGE diagnostic — un-silences every quality bound the
    * tokenizer trainers carry (the repo's no-silent-caps rule): a cap
    * that bounds trainer STATE is fine at 100 TB, but nothing upstream
    * reported what fraction of the corpus the capped trainer actually
    * saw. One row per bound, exact integers:
    *
    *  - `unigram_dp_unroll`: token mass of words within the 12-position
    *    DP unroll (the trainer AND encode paths raise loudly past it —
    *    this row says how close the corpus sits to that edge).
    *  - `unigram_seed_multi`: multi-gram mass captured by the
    *    [[graft.ops.Unigram.seedK]] (types-scaled since r13; formerly
    *    the fixed SeedMulti=40 head that self-reported 5% at the ×128
    *    rung) seed selection vs all 2..4-gram mass; the cap column
    *    carries the actual K. Partial only when the corpus saturates
    *    [[graft.ops.Unigram.SeedAbsCap]].
    *  - `unigram_stats_mass`: cap 0 = UNCAPPED — the successor of the
    *    r11 `unigram_top_words_mass` row. The top-1024 word-stat
    *    head-cap this row used to measure (2960 bp at the ×128 rung —
    *    its first real catch) is GONE: training stats are cap-free and
    *    the E-step is distributed ([[graft.ops.Unigram.pathUsage]]),
    *    so the row now reports structurally-full coverage. Kept so the
    *    rung ladder SHOWS the cap removed instead of silently dropping
    *    the row.
    *  - `wordpiece_merge_mass`: adjacent-pair mass captured by the
    *    adopted likelihood-gain merges vs the round-0 pair total (the
    *    rounds hyperparameter's coverage; wordpiece has NO stats cap —
    *    it scans the full corpus each round).
    *
    * Scale shape: one word-count aggregate (persisted, bounded reads),
    * a gram explode feeding a TakeOrdered-[[graft.ops.Unigram.seedK]]
    * re-aggregate, and the same per-round aggregates
    * pipeline_wordpiece_merges already runs — every output relation is
    * 1 row; no data-sized window/collect. The streaming twin
    * ([[graft.streaming.TrainerCoverageProcessor]]) recomputes the
    * unigram rows per batch from its word-stat MapState.
    */
  val trainerCoverage: Q = Q("pipeline_trainer_coverage", (s, dir) => {
    import graft.ops.{Text, Unigram}
    val docs = Tables.t(s, dir, "documents")
    val wc = docs
      .select(explode(expr("filter(split(lower(text), ' '), x -> x != '')")).as("word"))
      .groupBy("word").agg(count(lit(1)).as("cnt")).persist()
    val tot = wc.agg(
      sum("cnt").as("mass_total"),
      sum(expr(s"CASE WHEN length(word) <= ${Unigram.DpUnroll} THEN cnt ELSE 0L END"))
        .as("mass_unroll"))
    val gram = wc.select(explode(expr(Unigram.multiGramExpr)).as("g"), col("cnt"))
      .groupBy("g").agg(sum("cnt").as("u"))
    val gramTot = gram.agg(coalesce(sum("u"), lit(0L)).as("gram_total"))
    // types-scaled seed inventory (r13): wc is persisted, the count is
    // one counted-small action — keeps the selection TakeOrdered (a
    // literal-k limit), never a global rank window over the gram table.
    // (r14 A/B: overlapping this action with the wordpiece trainer via
    // Scale.concurrently LOST 4.00→4.25 s reps-4 — both branches are
    // corpus-wide scans that each saturate the box; §2.6 overlap only
    // pays for small-stage chains.)
    val seedk = Unigram.seedK(wc.count())
    val gramSeen = gram.orderBy(col("u").desc, col("g").asc).limit(seedk.toInt)
      .agg(coalesce(sum("u"), lit(0L)).as("gram_seen"))
    val base = docs.select(Text.bpeInitSeq(col("text")).as("seq"))
    val (merges, _) = Text.wordpieceTrain(base, "seq", wordpieceRounds)
    val pairTot = Text.bpePairCounts(base, "seq")
      .agg(sum("cnt").as("pair_total"))
    val mergeMass = merges.agg(coalesce(sum("cnt_pair"), lit(0L)).as("merge_mass"))
    val r1 = tot.select(lit("unigram_dp_unroll").as("trainer"),
      lit(Unigram.DpUnroll.toLong).as("cap"), lit("token_mass").as("units"),
      col("mass_unroll").as("seen"), col("mass_total").as("total"))
    val r2 = gramSeen.crossJoin(broadcast(gramTot))
      .select(lit("unigram_seed_multi").as("trainer"),
        lit(seedk).as("cap"), lit("gram_mass").as("units"),
        col("gram_seen").as("seen"), col("gram_total").as("total"))
    val r3 = tot.select(lit("unigram_stats_mass").as("trainer"),
      lit(0L).as("cap"), lit("token_mass").as("units"),
      col("mass_total").as("seen"), col("mass_total").as("total"))
    val r4 = mergeMass.crossJoin(broadcast(pairTot))
      .select(lit("wordpiece_merge_mass").as("trainer"),
        lit(wordpieceRounds.toLong).as("cap"), lit("pair_mass").as("units"),
        col("merge_mass").as("seen"), col("pair_total").as("total"))
    r1.unionByName(r2).unionByName(r3).unionByName(r4)
      .withColumn("coverage_bp", expr("seen * 10000 DIV total"))
      .orderBy("trainer")
  }, Some {
    import graft.ops.{Text, Unigram}
    val chain = (1 to wordpieceRounds).map { r =>
      s""",
      u$r AS MATERIALIZED (${Text.wordpieceSymsSql(s"s${r - 1}")}),
      m$r AS MATERIALIZED (${Text.wordpiecePickSql(s"s${r - 1}", s"u$r")}),
      s$r AS MATERIALIZED (SELECT ${Text.bpeApplyMergeSql("seq", s"m$r")} AS seq
        FROM s${r - 1})"""
    }.mkString
    val mergeCnts = (1 to wordpieceRounds)
      .map(r => s"SELECT cnt FROM m$r").mkString(" UNION ALL ")
    s"""WITH wc AS MATERIALIZED (
      SELECT w AS word, CAST(count(*) AS BIGINT) AS cnt
      FROM (SELECT unnest(list_filter(string_split(lower(text), ' '), x -> x <> '')) AS w
            FROM documents)
      GROUP BY 1),
    tot AS (SELECT CAST(sum(cnt) AS BIGINT) AS mass_total,
        CAST(sum(CASE WHEN length(word) <= ${Unigram.DpUnroll} THEN cnt ELSE 0 END) AS BIGINT) AS mass_unroll
      FROM wc),
    gm AS MATERIALIZED (
      SELECT g, CAST(sum(cnt) AS BIGINT) AS u FROM (
        SELECT substr(word, CAST(i AS INT), CAST(l AS INT)) AS g, cnt
        FROM (SELECT word, cnt, i,
                unnest(list_transform(range(2, least(${Unigram.MaxPiece}, length(word) - i + 1) + 1), x -> x)) AS l
              FROM (SELECT word, cnt, unnest(list_transform(range(1, length(word) + 1), x -> x)) AS i
                    FROM wc)))
      GROUP BY 1),
    gt AS (SELECT CAST(COALESCE(sum(u), 0) AS BIGINT) AS gram_total FROM gm),
    tk AS (SELECT CAST(${Unigram.seedKSql("count(*)")} AS BIGINT) AS k FROM wc),
    gs AS (SELECT CAST(COALESCE(sum(u), 0) AS BIGINT) AS gram_seen
      FROM (SELECT u, row_number() OVER (ORDER BY u DESC, g) AS rk FROM gm)
      WHERE rk <= (SELECT k FROM tk)),
    s0 AS MATERIALIZED (
      SELECT ${Text.bpeInitSeqSql("text")} AS seq FROM documents)$chain,
    pt AS (SELECT CAST(sum(cnt) AS BIGINT) AS pair_total
      FROM (${Text.bpePairCountsSql("s0", "seq")})),
    mm AS (SELECT CAST(COALESCE(sum(cnt), 0) AS BIGINT) AS merge_mass
      FROM ($mergeCnts))
    SELECT trainer, cap, units, seen, total, seen * 10000 // total AS coverage_bp
    FROM (
      SELECT 'unigram_dp_unroll' AS trainer, CAST(${Unigram.DpUnroll} AS BIGINT) AS cap,
        'token_mass' AS units, mass_unroll AS seen, mass_total AS total FROM tot
      UNION ALL
      SELECT 'unigram_seed_multi', (SELECT k FROM tk),
        'gram_mass', gram_seen, gram_total FROM gs, gt
      UNION ALL
      SELECT 'unigram_stats_mass', CAST(0 AS BIGINT),
        'token_mass', mass_total, mass_total FROM tot
      UNION ALL
      SELECT 'wordpiece_merge_mass', CAST($wordpieceRounds AS BIGINT),
        'pair_mass', merge_mass, pair_total FROM mm, pt)
    ORDER BY trainer"""
  })
}
