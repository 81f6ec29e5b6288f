package graft.queries

import graft.{Q, Tables}
import org.apache.spark.sql.functions._

/** Data-quality operators (deequ/dbt-test-shaped): the profiling and
  * constraint layer every production table pipeline runs before
  * publishing a snapshot. All metrics are exact counts or integer-safe
  * roundings — nothing sketched — so the oracle twins are bit-exact.
  */
object Quality {

  def all: Seq[Q] = Seq(dataProfile, dataQualityChecks, datasetDiff,
    qualitySurprisal, qualityDriftChi2, qualityDriftKs, qualityGopherRules,
    langidEval, qualityReadability, datasetMerkle, qualityBenford,
    qualityConformal, qualityEncoding, qualityKlSource, qualityPiiCensus,
    qualityZipfFit, qualityKAnonymity, qualityDiversityIndex,
    qualityTCloseness, qualitySurprisalBuckets)

  /** Classifier evaluation of the lang_id operator against the labeled
    * `lang` column: the full confusion matrix with per-cell recall and
    * precision in exact integer basis points (diagonal cells read as the
    * class metrics) — the model-eval loop a training-data pipeline runs
    * on every heuristic filter it ships. Composes the REGISTERED lang_id
    * query as its input on both sides (same Spark plan, same oracle
    * subquery), so the eval can never drift from the operator it grades.
    * Two partial-agg shuffles over a ≤25-cell grid.
    */
  val langidEval: Q = Q("quality_langid_eval", (s, dir) => {
    val p = TextOps.langId.fn(s, dir).select("lang", "pred_lang")
    val cell = p.groupBy("lang", "pred_lang").agg(count(lit(1)).as("n"))
    val rowT = cell.groupBy("lang").agg(sum("n").as("n_true"))
    val colT = cell.groupBy("pred_lang").agg(sum("n").as("n_pred"))
    cell.join(rowT, "lang").join(colT, "pred_lang")
      .select(col("lang"), col("pred_lang"), col("n"), col("n_true"), col("n_pred"),
        expr("n * 10000 DIV n_true").as("recall_bp"),
        expr("n * 10000 DIV n_pred").as("precision_bp"))
      .orderBy("lang", "pred_lang")
  }, Some(s"""WITH pr AS (${TextOps.langId.oracle.get}),
    cell AS (SELECT lang, pred_lang, count(*)::BIGINT AS n
      FROM pr GROUP BY lang, pred_lang),
    rt AS (SELECT lang, sum(n)::BIGINT AS n_true FROM cell GROUP BY lang),
    ct AS (SELECT pred_lang, sum(n)::BIGINT AS n_pred FROM cell GROUP BY pred_lang)
    SELECT cell.lang, cell.pred_lang, n, n_true, n_pred,
      n * 10000 // n_true AS recall_bp,
      n * 10000 // n_pred AS precision_bp
    FROM cell JOIN rt USING (lang) JOIN ct USING (pred_lang)
    ORDER BY lang, pred_lang"""))

  /** Gopher-style document quality rules (Rae et al., "Scaling Language
    * Models: Methods, Analysis & Insights from Training Gopher",
    * arXiv:2112.11446 §A1.1 — public paper): word-count bounds, mean
    * word length bounds, minimum stopword evidence, and a
    * repeated-single-word cap, each as an exact integer predicate
    * (mean word length in exact hundredths by integer division; the
    * top-word share in basis points), plus the conjunction `passes` —
    * the pre-training filter pass every corpus gets before dedup.
    * Shape: one per-(doc, word) partial-agg shuffle for the mode/
    * stopword evidence, everything else per-row column math.
    */
  val qualityGopherRules: Q = Q("quality_gopher_rules", (s, dir) => {
    val d = Tables.t(s, dir, "documents")
    val w = d.select(col("doc_id"),
      explode(graft.ops.Text.words(col("text"))).as("word"))
    val wc = w.groupBy("doc_id", "word").agg(count(lit(1)).as("c"))
    val perDoc = wc.groupBy("doc_id").agg(
      sum("c").as("n_words"), max("c").as("top_word_c"),
      sum(when(col("word").isin("the", "a", "and", "of", "to"), 1L)
        .otherwise(0L)).as("stop_distinct"))
    d.select(col("doc_id"),
        length(regexp_replace(col("text"), " ", "")).cast("bigint").as("chars_ns"))
      .join(perDoc, "doc_id")
      .withColumn("mwl_e2", expr("chars_ns * 100 DIV nullif(n_words, 0)"))
      .withColumn("top_word_bp", expr("top_word_c * 10000 DIV nullif(n_words, 0)"))
      .select(col("doc_id"), col("n_words"), col("mwl_e2"),
        col("stop_distinct"), col("top_word_bp"),
        expr("""coalesce(n_words BETWEEN 10 AND 80
             AND mwl_e2 BETWEEN 300 AND 1000
             AND stop_distinct >= 1
             AND top_word_bp <= 2000, false)""").as("passes"))
      .orderBy("doc_id")
  }, Some("""WITH w AS (
      SELECT doc_id,
        unnest(list_filter(string_split(lower(text), ' '), x -> x <> '')) AS word
      FROM documents),
    wc AS (SELECT doc_id, word, count(*)::BIGINT AS c FROM w GROUP BY doc_id, word),
    pd AS (SELECT doc_id, sum(c)::BIGINT AS n_words, max(c)::BIGINT AS top_word_c,
        sum(CASE WHEN word IN ('the', 'a', 'and', 'of', 'to') THEN 1 ELSE 0 END)::BIGINT
          AS stop_distinct
      FROM wc GROUP BY doc_id),
    ch AS (SELECT doc_id, CAST(length(replace(text, ' ', '')) AS BIGINT) AS chars_ns
      FROM documents),
    m AS (SELECT ch.doc_id, pd.n_words,
        chars_ns * 100 // nullif(pd.n_words, 0) AS mwl_e2,
        pd.stop_distinct, top_word_c * 10000 // nullif(pd.n_words, 0) AS top_word_bp
      FROM ch JOIN pd USING (doc_id))
    SELECT doc_id, n_words, mwl_e2, stop_distinct, top_word_bp,
      coalesce(n_words BETWEEN 10 AND 80
        AND mwl_e2 BETWEEN 300 AND 1000
        AND stop_distinct >= 1
        AND top_word_bp <= 2000, false) AS passes
    FROM m ORDER BY doc_id"""))

  /** Per-column profile of lineitem via the generic one-pass
    * [[graft.ops.Profile.profile]] (rows, nulls, distincts, min/max —
    * numeric/timestamp min/max as doubles with timestamps in epoch µs,
    * strings as strings). Single scan (plan-asserted in ScaleSpec): the
    * profiler a 100 TB snapshot publish runs.
    */
  val dataProfile: Q = Q("data_profile", (s, dir) => {
    graft.ops.Profile.profile(Tables.t(s, dir, "lineitem"),
      Seq("l_orderkey", "l_quantity", "l_discount", "l_returnflag", "l_shipdate"))
  }, Some {
    def numSql(name: String, c: String) =
      s"""SELECT '$name' AS col_name, count(*)::BIGINT AS n,
        (count(*) - count($c))::BIGINT AS n_null,
        count(DISTINCT $c)::BIGINT AS n_distinct,
        round(CAST(min($c) AS DOUBLE), 4) AS min_num,
        round(CAST(max($c) AS DOUBLE), 4) AS max_num,
        CAST(NULL AS VARCHAR) AS min_str, CAST(NULL AS VARCHAR) AS max_str
      FROM lineitem"""
    s"""SELECT * FROM (
      ${numSql("l_orderkey", "l_orderkey")}
      UNION ALL ${numSql("l_quantity", "l_quantity")}
      UNION ALL ${numSql("l_discount", "l_discount")}
      UNION ALL SELECT 'l_returnflag', count(*)::BIGINT,
        (count(*) - count(l_returnflag))::BIGINT,
        count(DISTINCT l_returnflag)::BIGINT,
        CAST(NULL AS DOUBLE), CAST(NULL AS DOUBLE),
        min(l_returnflag), max(l_returnflag) FROM lineitem
      UNION ALL ${numSql("l_shipdate", "epoch_us(l_shipdate)")})
    ORDER BY col_name"""
  })

  /** Constraint suite over the order tables — range, null, referential-
    * integrity, and uniqueness rules with exact violation counts (the
    * uniqueness rule genuinely fires on this data: (l_orderkey,
    * l_linenumber) is NOT a key). Each rule is a cheap aggregate; the
    * referential check is a broadcast-able anti-join — the only
    * join-shaped rule, and the shape that scales (never a driver-side
    * existence loop).
    */
  val dataQualityChecks: Q = Q("data_quality_checks", (s, dir) => {
    val li = Tables.t(s, dir, "lineitem")
    val o = Tables.t(s, dir, "orders")
    val ranges = li.agg(
      sum(when(col("l_quantity") < 1 || col("l_quantity") > 50, 1L).otherwise(0L)).as("quantity_range_1_50"),
      sum(when(col("l_discount") < 0 || col("l_discount") > 0.06, 1L).otherwise(0L)).as("discount_range_0_006"),
      sum(when(col("l_shipdate").isNull, 1L).otherwise(0L)).as("shipdate_not_null"))
    val orphans = li.join(o, col("l_orderkey") === col("o_orderkey"), "left_anti")
      .agg(count(lit(1)).as("n")).select(lit("lineitem_order_fk").as("rule"), col("n").as("n_violations"))
    val price = o.agg(sum(when(col("o_totalprice") <= 0, 1L).otherwise(0L)).as("n"))
      .select(lit("totalprice_positive").as("rule"), col("n").as("n_violations"))
    val dupKeys = li.groupBy("l_orderkey", "l_linenumber").agg(count(lit(1)).as("c"))
      .agg(sum(col("c") - 1).as("n"))
      .select(lit("unique_order_line").as("rule"), col("n").as("n_violations"))
    ranges.select(explode(array(
        struct(lit("quantity_range_1_50").as("rule"), col("quantity_range_1_50").as("n_violations")),
        struct(lit("discount_range_0_006").as("rule"), col("discount_range_0_006").as("n_violations")),
        struct(lit("shipdate_not_null").as("rule"), col("shipdate_not_null").as("n_violations")))).as("p"))
      .select("p.*")
      .union(orphans).union(price).union(dupKeys)
      .orderBy("rule")
  }, Some("""SELECT 'quantity_range_1_50' AS rule,
      CAST(sum(CASE WHEN l_quantity < 1 OR l_quantity > 50 THEN 1 ELSE 0 END) AS BIGINT) AS n_violations
    FROM lineitem
    UNION ALL SELECT 'discount_range_0_006',
      CAST(sum(CASE WHEN l_discount < 0 OR l_discount > 0.06 THEN 1 ELSE 0 END) AS BIGINT)
    FROM lineitem
    UNION ALL SELECT 'shipdate_not_null',
      CAST(sum(CASE WHEN l_shipdate IS NULL THEN 1 ELSE 0 END) AS BIGINT)
    FROM lineitem
    UNION ALL SELECT 'lineitem_order_fk', count(*)::BIGINT
    FROM lineitem l WHERE NOT EXISTS (
      SELECT 1 FROM orders o WHERE o.o_orderkey = l.l_orderkey)
    UNION ALL SELECT 'totalprice_positive',
      CAST(sum(CASE WHEN o_totalprice <= 0 THEN 1 ELSE 0 END) AS BIGINT)
    FROM orders
    UNION ALL SELECT 'unique_order_line', CAST(sum(c - 1) AS BIGINT)
    FROM (SELECT count(*) AS c FROM lineitem GROUP BY l_orderkey, l_linenumber)
    ORDER BY rule"""))

  /** Snapshot diff (CDC-style): given two versions of the documents
    * table — A drops doc_id%7==0, B drops doc_id%5==0 and rewrites
    * doc_id%11==0 — classify every id as added/removed/changed/
    * unchanged by content fingerprint and report per-status counts and
    * id extents. The publish-gate diff a dataset registry computes
    * between consecutive snapshot versions; one full-outer join on the
    * id (equi-shuffle, AQE-safe), fingerprints are per-row md5 — no
    * content ever compared byte-wise across the join.
    */
  val datasetDiff: Q = Q("dataset_diff", (s, dir) => {
    val d = Tables.t(s, dir, "documents")
    val snapA = d.filter(col("doc_id") % 7 =!= 0)
      .select(col("doc_id"), md5(col("text")).as("fp_a"))
    val snapB = d.filter(col("doc_id") % 5 =!= 0)
      .select(col("doc_id"), md5(when(col("doc_id") % 11 === 0,
        concat(col("text"), lit(" [rev2]"))).otherwise(col("text"))).as("fp_b"))
    snapA.join(snapB, Seq("doc_id"), "full_outer")
      .withColumn("status",
        when(col("fp_a").isNull, "added")
          .when(col("fp_b").isNull, "removed")
          .when(col("fp_a") =!= col("fp_b"), "changed")
          .otherwise("unchanged"))
      .groupBy("status")
      .agg(count(lit(1)).as("n"), min("doc_id").as("min_id"), max("doc_id").as("max_id"))
      .orderBy("status")
  }, Some("""WITH a AS (
      SELECT doc_id, md5(text) AS fp_a FROM documents WHERE doc_id % 7 <> 0),
    b AS (
      SELECT doc_id, md5(CASE WHEN doc_id % 11 = 0 THEN text || ' [rev2]'
        ELSE text END) AS fp_b
      FROM documents WHERE doc_id % 5 <> 0),
    j AS (SELECT coalesce(a.doc_id, b.doc_id) AS doc_id, fp_a, fp_b
      FROM a FULL OUTER JOIN b ON a.doc_id = b.doc_id)
    SELECT CASE WHEN fp_a IS NULL THEN 'added'
        WHEN fp_b IS NULL THEN 'removed'
        WHEN fp_a <> fp_b THEN 'changed' ELSE 'unchanged' END AS status,
      count(*)::BIGINT AS n, min(doc_id) AS min_id, max(doc_id) AS max_id
    FROM j GROUP BY 1 ORDER BY status"""))

  /** MERKLE-bucket snapshot comparison — the anti-entropy primitive
    * behind large-scale replica sync (Merkle 1987; Dynamo/Cassandra
    * repair — public): instead of shipping [[datasetDiff]]'s full
    * per-row fingerprint join, each side summarizes doc-id ranges
    * hierarchically — leaf = bit_xor of row hashes per 32-id bucket
    * (order-insensitive, overflow-free), level-1 = md5-60 over the
    * SORTED child hashes per 32-leaf span, root likewise — and the
    * sides compare top-down, descending only into mismatched subtrees.
    * The report: buckets vs mismatches at each level, i.e. how much of
    * the tree a sync would actually walk. Same synthetic snapshots as
    * dataset_diff (A drops id%7, B drops id%5 and revises id%11), so
    * the two reports cross-validate.
    *
    * Scale shape: two grouped aggregates per side (map-side
    * combinable), bucket-keyed full-outer joins over BUCKET-sized
    * relations — row-level data never crosses the comparison.
    */
  val datasetMerkle: Q = Q("dataset_merkle", (s, dir) => {
    val h60 = graft.ops.Sketch.h60 _
    val d = Tables.t(s, dir, "documents")
    val a = d.filter(col("doc_id") % 7 =!= 0)
      .select(col("doc_id"), md5(col("text")).as("fp"))
    val b = d.filter(col("doc_id") % 5 =!= 0)
      .select(col("doc_id"), md5(when(col("doc_id") % 11 === 0,
        concat(col("text"), lit(" [rev2]"))).otherwise(col("text"))).as("fp"))
    def leaves(snap: org.apache.spark.sql.DataFrame) = snap
      .withColumn("bkt", expr("doc_id DIV 32"))
      .withColumn("h", expr(h60("'mk'", "concat(CAST(doc_id AS STRING), ':', fp)")))
      .groupBy("bkt").agg(expr("bit_xor(h)").as("lh"))
    def lvl1(lv: org.apache.spark.sql.DataFrame) = lv
      .groupBy(expr("bkt DIV 32").as("b1"))
      .agg(expr(h60("'l1'",
        "concat_ws(',', transform(array_sort(collect_list(lh)), x -> CAST(x AS STRING)))"))
        .as("h1"))
    def root(l1: org.apache.spark.sql.DataFrame) = l1
      .groupBy(lit(0L).as("b0"))
      .agg(expr(h60("'rt'",
        "concat_ws(',', transform(array_sort(collect_list(h1)), x -> CAST(x AS STRING)))"))
        .as("hr"))
    val (la, lb) = (leaves(a), leaves(b))
    val (oa, ob) = (lvl1(la), lvl1(lb))
    def cmp(x: org.apache.spark.sql.DataFrame, y: org.apache.spark.sql.DataFrame,
        key: String, hc: String, level: String) =
      x.withColumnRenamed(hc, "ha")
        .join(y.withColumnRenamed(hc, "hb"), Seq(key), "full_outer")
        .agg(count(lit(1)).as("n_buckets"),
          sum(when(expr("NOT (ha <=> hb)"), 1L).otherwise(0L)).as("n_mismatch"))
        .select(lit(level).as("level"), col("n_buckets"), col("n_mismatch"))
    cmp(la, lb, "bkt", "lh", "leaf")
      .union(cmp(oa, ob, "b1", "h1", "l1"))
      .union(cmp(root(oa), root(ob), "b0", "hr", "root"))
      .orderBy("level")
  }, Some {
    def oh60(salt: String, key: String) =
      s"CAST('0x' || substr(md5('$salt:' || $key), 1, 15) AS BIGINT)"
    s"""WITH a AS (
      SELECT doc_id, md5(text) AS fp FROM documents WHERE doc_id % 7 <> 0),
    b AS (
      SELECT doc_id, md5(CASE WHEN doc_id % 11 = 0 THEN text || ' [rev2]'
        ELSE text END) AS fp
      FROM documents WHERE doc_id % 5 <> 0),
    la AS (SELECT doc_id // 32 AS bkt,
        bit_xor(${oh60("mk", "CAST(doc_id AS VARCHAR) || ':' || fp")}) AS lh
      FROM a GROUP BY 1),
    lb AS (SELECT doc_id // 32 AS bkt,
        bit_xor(${oh60("mk", "CAST(doc_id AS VARCHAR) || ':' || fp")}) AS lh
      FROM b GROUP BY 1),
    oa AS (SELECT bkt // 32 AS b1,
        ${oh60("l1", "string_agg(CAST(lh AS VARCHAR), ',' ORDER BY lh)")} AS h1
      FROM la GROUP BY 1),
    ob AS (SELECT bkt // 32 AS b1,
        ${oh60("l1", "string_agg(CAST(lh AS VARCHAR), ',' ORDER BY lh)")} AS h1
      FROM lb GROUP BY 1),
    ra AS (SELECT CAST(0 AS BIGINT) AS b0,
        ${oh60("rt", "string_agg(CAST(h1 AS VARCHAR), ',' ORDER BY h1)")} AS hr
      FROM oa),
    rb AS (SELECT CAST(0 AS BIGINT) AS b0,
        ${oh60("rt", "string_agg(CAST(h1 AS VARCHAR), ',' ORDER BY h1)")} AS hr
      FROM ob)
    SELECT 'leaf' AS level, count(*)::BIGINT AS n_buckets,
      CAST(sum(CASE WHEN la.lh IS DISTINCT FROM lb.lh THEN 1 ELSE 0 END) AS BIGINT) AS n_mismatch
    FROM la FULL OUTER JOIN lb USING (bkt)
    UNION ALL
    SELECT 'l1', count(*)::BIGINT,
      CAST(sum(CASE WHEN oa.h1 IS DISTINCT FROM ob.h1 THEN 1 ELSE 0 END) AS BIGINT)
    FROM oa FULL OUTER JOIN ob USING (b1)
    UNION ALL
    SELECT 'root', count(*)::BIGINT,
      CAST(sum(CASE WHEN ra.hr IS DISTINCT FROM rb.hr THEN 1 ELSE 0 END) AS BIGINT)
    FROM ra FULL OUTER JOIN rb USING (b0)
    ORDER BY level"""
  })

  /** Unigram-LM surprisal scoring — the cheap perplexity-shaped quality
    * filter: docs whose words are corpus-rare score high. The log2 is
    * INTEGER (floor-log2 = binary-string length − 1 of the scaled ratio
    * N·1024/c_w — same bin() trick as the HLL rho), so per-doc means in
    * basis points are exact bigint division: zero float anywhere,
    * bit-exact cross-engine. One tiny vocabulary aggregate broadcast
    * back over the word stream, one per-doc aggregate — two shuffles of
    * vocab/doc-count size.
    */
  val qualitySurprisal: Q = Q("quality_surprisal", (s, dir) => {
    val w = Tables.t(s, dir, "documents").select(col("doc_id"),
      explode(graft.ops.Text.words(col("text"))).as("word"))
    val c = w.groupBy("word").agg(count(lit(1)).as("c"))
    val n = c.agg(sum("c").as("n_corpus"))
    val scored = w.join(broadcast(c.crossJoin(n)), "word")
      .withColumn("surprise", expr("length(bin((n_corpus * 1024) DIV c)) - 1"))
    scored.groupBy("doc_id")
      .agg(count(lit(1)).as("n_words"), sum("surprise").as("surprise_sum"))
      .withColumn("surprise_bp", expr("(surprise_sum * 10000) DIV n_words"))
      .orderBy(col("surprise_bp").desc, col("doc_id")).limit(25)
  }, Some("""
    WITH w AS (
      SELECT doc_id, unnest(list_filter(string_split(lower(text), ' '), x -> x <> '')) AS word
      FROM documents),
    c AS (SELECT word, count(*)::BIGINT AS c FROM w GROUP BY word),
    n AS (SELECT sum(c)::BIGINT AS n_corpus FROM c),
    sc AS (
      SELECT doc_id, length(bin((n_corpus * 1024) // c)) - 1 AS surprise
      FROM w JOIN c USING (word), n)
    SELECT doc_id, count(*)::BIGINT AS n_words,
      sum(surprise)::BIGINT AS surprise_sum,
      (sum(surprise)::BIGINT * 10000) // count(*)::BIGINT AS surprise_bp
    FROM sc GROUP BY doc_id
    ORDER BY surprise_bp DESC, doc_id LIMIT 25"""))

  /** CCNet-style head/middle/tail corpus partitioning (Wenzek et al.,
    * "CCNet: Extracting High Quality Monolingual Datasets from Web
    * Crawl Data", arXiv:1911.00359 — public; their §4.3 splits each
    * language's crawl into perplexity terciles and trains on the
    * head): per language, bucket every document's unigram surprisal
    * (the [[qualitySurprisal]] score, full corpus) into a ~150-bucket
    * integer histogram, derive the tercile THRESHOLDS from the
    * histogram's cumulative counts, and tier docs by threshold
    * comparison. Thresholds-from-histogram rather than per-doc ntile
    * is the scale-correct form: the only window runs over the
    * aggregate-bounded (lang × bucket) histogram — never a data-sized
    * rank per language — exactly how CCNet itself ships fixed cutoffs.
    * Output: per (lang, tier) doc/token masses and the share each tier
    * holds of its language in basis points.
    */
  val qualitySurprisalBuckets: Q = Q("quality_surprisal_buckets", (s, dir) => {
    import org.apache.spark.sql.expressions.Window
    val w = Tables.t(s, dir, "documents").select(col("doc_id"), col("lang"),
      explode(graft.ops.Text.words(col("text"))).as("word"))
    val c = w.groupBy("word").agg(count(lit(1)).as("c"))
    val n = c.agg(sum("c").as("n_corpus"))
    val perDoc = w.join(broadcast(c.crossJoin(n)), "word")
      .withColumn("surprise", expr("length(bin((n_corpus * 1024) DIV c)) - 1"))
      .groupBy("doc_id", "lang")
      .agg(count(lit(1)).as("n_words"), sum("surprise").as("surprise_sum"))
      .withColumn("surprise_bp", expr("(surprise_sum * 10000) DIV n_words"))
      .withColumn("hb", expr("surprise_bp DIV 1000"))
      .persist()
    val hist = perDoc.groupBy("lang", "hb").agg(count(lit(1)).as("cnt"))
    val wl = Window.partitionBy("lang").orderBy("hb")
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val th = hist
      .withColumn("cum", sum("cnt").over(wl))
      .withColumn("nl", sum("cnt").over(Window.partitionBy("lang")))
      .groupBy("lang").agg(
        min(when(expr("cum * 3 >= nl"), col("hb"))).as("t1"),
        min(when(expr("cum * 3 >= nl * 2"), col("hb"))).as("t2"),
        max("nl").as("n_lang"))
    perDoc.join(broadcast(th), "lang")
      .withColumn("tier", expr(
        "CASE WHEN hb <= t1 THEN 'head' WHEN hb <= t2 THEN 'middle' ELSE 'tail' END"))
      .groupBy("lang", "tier")
      .agg(count(lit(1)).as("n_docs"), sum("n_words").as("tokens"),
        min("surprise_bp").as("lo_bp"), max("surprise_bp").as("hi_bp"),
        expr("(count(1) * 10000) DIV max(n_lang)").as("share_bp"))
      .orderBy("lang", "tier")
  }, Some("""
    WITH w AS (
      SELECT doc_id, lang,
        unnest(list_filter(string_split(lower(text), ' '), x -> x <> '')) AS word
      FROM documents),
    c AS (SELECT word, count(*)::BIGINT AS c FROM w GROUP BY word),
    n AS (SELECT sum(c)::BIGINT AS n_corpus FROM c),
    pd AS (
      SELECT doc_id, lang, count(*)::BIGINT AS n_words,
        sum(length(bin((n_corpus * 1024) // c)) - 1)::BIGINT AS surprise_sum
      FROM w JOIN c USING (word), n GROUP BY doc_id, lang),
    pb AS (SELECT doc_id, lang, n_words,
        (surprise_sum * 10000) // n_words AS surprise_bp,
        (surprise_sum * 10000) // n_words // 1000 AS hb
      FROM pd),
    hist AS (SELECT lang, hb, count(*)::BIGINT AS cnt FROM pb GROUP BY lang, hb),
    cu AS (SELECT lang, hb, cnt,
        sum(cnt) OVER (PARTITION BY lang ORDER BY hb
          ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cum,
        sum(cnt) OVER (PARTITION BY lang) AS nl
      FROM hist),
    th AS (SELECT lang,
        min(CASE WHEN cum * 3 >= nl THEN hb END) AS t1,
        min(CASE WHEN cum * 3 >= nl * 2 THEN hb END) AS t2,
        max(nl)::BIGINT AS n_lang
      FROM cu GROUP BY lang)
    SELECT pb.lang,
      CASE WHEN hb <= t1 THEN 'head' WHEN hb <= t2 THEN 'middle' ELSE 'tail' END AS tier,
      count(*)::BIGINT AS n_docs, sum(n_words)::BIGINT AS tokens,
      min(surprise_bp) AS lo_bp, max(surprise_bp) AS hi_bp,
      (count(*)::BIGINT * 10000) // max(n_lang) AS share_bp
    FROM pb JOIN th USING (lang)
    GROUP BY pb.lang, tier ORDER BY lang, tier"""))

  /** Distribution-drift score per event type between the first and
    * second half of the time range — the PSI-style monitor a pipeline
    * runs between snapshot publishes, in pure integer math: 10
    * equi-width cent buckets over the global value range, per-side
    * proportions in basis points, and the symmetric chi-square-style
    * score Σ (p−q)²/(p+q) — no float log, bit-exact cross-engine. Two
    * passes: one 1-row range/midpoint aggregate, one bucket-grid
    * aggregate (map-side combined).
    */
  val qualityDriftChi2: Q = Q("quality_drift_chi2", (s, dir) => {
    val e = Tables.events(s, dir)
      .withColumn("cents", expr("CAST(round(value * 100) AS BIGINT)"))
    val rng = e.agg(min("ts_us").as("t0"), max("ts_us").as("t1"),
      min("cents").as("c0"), max("cents").as("c1"))
    val b = e.crossJoin(broadcast(rng))
      .withColumn("late", expr("ts_us > (t0 + t1) DIV 2"))
      .withColumn("bucket", expr("least(((cents - c0) * 10) DIV (c1 - c0 + 1), 9)"))
      .groupBy("event_type", "bucket")
      .agg(sum(when(!col("late"), 1L).otherwise(0L)).as("n1"),
        sum(when(col("late"), 1L).otherwise(0L)).as("n2"))
    val tot = b.groupBy("event_type")
      .agg(sum("n1").as("t1n"), sum("n2").as("t2n"))
    b.join(tot, "event_type")
      .withColumn("p_bp", expr("(n1 * 10000) DIV t1n"))
      .withColumn("q_bp", expr("(n2 * 10000) DIV t2n"))
      .groupBy("event_type")
      .agg(max("t1n").as("n_early"), max("t2n").as("n_late"),
        sum(expr("""CASE WHEN p_bp + q_bp > 0
          THEN ((p_bp - q_bp) * (p_bp - q_bp)) DIV (p_bp + q_bp)
          ELSE 0 END""")).as("drift_score"))
      .orderBy("event_type")
  }, Some("""
    WITH e AS (
      SELECT event_type, epoch_us(ts) AS ts_us,
        CAST(round(value * 100) AS BIGINT) AS cents
      FROM events),
    rng AS (SELECT min(ts_us) AS t0, max(ts_us) AS t1,
        min(cents) AS c0, max(cents) AS c1 FROM e),
    b AS (
      SELECT event_type,
        least(((cents - c0) * 10) // (c1 - c0 + 1), 9) AS bucket,
        sum(CASE WHEN ts_us > (t0 + t1) // 2 THEN 0 ELSE 1 END)::BIGINT AS n1,
        sum(CASE WHEN ts_us > (t0 + t1) // 2 THEN 1 ELSE 0 END)::BIGINT AS n2
      FROM e, rng GROUP BY 1, 2),
    tot AS (SELECT event_type, sum(n1)::BIGINT AS t1n, sum(n2)::BIGINT AS t2n
      FROM b GROUP BY 1),
    pq AS (
      SELECT b.event_type, t1n, t2n,
        (n1 * 10000) // t1n AS p_bp, (n2 * 10000) // t2n AS q_bp
      FROM b JOIN tot USING (event_type))
    SELECT event_type, max(t1n)::BIGINT AS n_early, max(t2n)::BIGINT AS n_late,
      sum(CASE WHEN p_bp + q_bp > 0
        THEN ((p_bp - q_bp) * (p_bp - q_bp)) // (p_bp + q_bp)
        ELSE 0 END)::BIGINT AS drift_score
    FROM pq GROUP BY event_type ORDER BY event_type"""))

  /** Two-sample Kolmogorov–Smirnov drift per event type — the
    * CONTINUOUS-distribution companion to [[qualityDriftChi2]]'s
    * categorical chi²: split the stream at the midpoint timestamp,
    * quantize values onto a fixed 256-bin grid, and take the max
    * absolute ECDF gap between the halves. Everything integer-exact:
    * the gap is compared as |cumA·nB − cumB·nA| (cross-multiplied — no
    * division until the final basis-point report), so ks_num is the
    * EXACT numerator of D·nA·nB on the binned ECDFs. One partitioned
    * cumulative window over the (event_type, bin) aggregate — 256 rows
    * per partition no matter the data volume. Products stay in bigint
    * for per-side counts up to ~3e9 rows; past that ANSI mode fails
    * loudly rather than wrapping.
    */
  val qualityDriftKs: Q = Q("quality_drift_ks", (s, dir) => {
    import org.apache.spark.sql.expressions.Window
    val e = Tables.events(s, dir)
      .withColumn("cents", expr("CAST(round(value * 100) AS BIGINT)"))
    val rng = e.agg(min("ts_us").as("t0"), max("ts_us").as("t1"),
      min("cents").as("c0"), max("cents").as("c1"))
    val b = e.crossJoin(broadcast(rng))
      .withColumn("late", expr("ts_us > (t0 + t1) DIV 2"))
      .withColumn("bin", expr("least(((cents - c0) * 256) DIV (c1 - c0 + 1), 255)"))
      .groupBy("event_type", "bin")
      .agg(sum(when(!col("late"), 1L).otherwise(0L)).as("n1"),
        sum(when(col("late"), 1L).otherwise(0L)).as("n2"))
    val w = Window.partitionBy("event_type").orderBy("bin")
    val tot = b.groupBy("event_type").agg(sum("n1").as("na"), sum("n2").as("nb"))
    b.withColumn("ca", sum("n1").over(w))
      .withColumn("cb", sum("n2").over(w))
      .join(tot, "event_type")
      .withColumn("d", expr("abs(ca * nb - cb * na)"))
      .groupBy("event_type")
      .agg(max("na").as("n_early"), max("nb").as("n_late"),
        max("d").as("ks_num"))
      .withColumn("ks_bp", expr("(ks_num * 10000) DIV (n_early * n_late)"))
      .orderBy("event_type")
  }, Some("""
    WITH e AS (
      SELECT event_type, epoch_us(ts) AS ts_us,
        CAST(round(value * 100) AS BIGINT) AS cents
      FROM events),
    rng AS (SELECT min(ts_us) AS t0, max(ts_us) AS t1,
        min(cents) AS c0, max(cents) AS c1 FROM e),
    b AS (
      SELECT event_type,
        least(((cents - c0) * 256) // (c1 - c0 + 1), 255) AS bin,
        sum(CASE WHEN ts_us > (t0 + t1) // 2 THEN 0 ELSE 1 END)::BIGINT AS n1,
        sum(CASE WHEN ts_us > (t0 + t1) // 2 THEN 1 ELSE 0 END)::BIGINT AS n2
      FROM e, rng GROUP BY 1, 2),
    c AS (
      SELECT event_type, bin, n1, n2,
        sum(n1) OVER (PARTITION BY event_type ORDER BY bin) AS ca,
        sum(n2) OVER (PARTITION BY event_type ORDER BY bin) AS cb
      FROM b),
    tot AS (SELECT event_type, sum(n1)::BIGINT AS na, sum(n2)::BIGINT AS nb
      FROM b GROUP BY 1)
    SELECT c.event_type,
      max(na)::BIGINT AS n_early, max(nb)::BIGINT AS n_late,
      CAST(max(abs(ca * nb - cb * na)) AS BIGINT) AS ks_num,
      CAST((max(abs(ca * nb - cb * na)) * 10000) // (max(na) * max(nb)) AS BIGINT) AS ks_bp
    FROM c JOIN tot USING (event_type)
    GROUP BY c.event_type ORDER BY c.event_type"""))

  /** Syllable-based readability grading per language — the FORCAST
    * formula (Caylor/Sticht 1973 — the one classic readability index
    * with NO sentence-count term, which these boundary-less synthetic
    * docs lack): grade = 20 − (single-syllable words per 150)/10,
    * pooled per language and also averaged over per-document grades.
    * Syllables are the maximal-vowel-run count (min 1) — the standard
    * dictionary-free heuristic — computed by collapsing `[aeiouy]+`
    * runs to a sentinel and differencing lengths, which both engines'
    * regex engines agree on over `[a-z]` tokens. All derived metrics
    * are exact fixed-point bigints (·10³ syllable density, basis-point
    * polysyllable share, ·10² grades), nothing floats. Scale: one
    * explode + two keyed partial-agg shuffles (doc then lang); no
    * window, no join.
    */
  val qualityReadability: Q = Q("quality_readability", (s, dir) => {
    val d = Tables.t(s, dir, "documents")
    val words = d.select(col("doc_id"), col("lang"),
      explode(split(col("text"), " ")).as("w"))
      .filter(length(col("w")) > 0)
      .withColumn("runs", expr("""length(regexp_replace(w, '[aeiouy]+', 'V'))
        - length(replace(regexp_replace(w, '[aeiouy]+', 'V'), 'V', ''))"""))
      .withColumn("syl", greatest(lit(1L), col("runs").cast("long")))
    val perDoc = words.groupBy("doc_id", "lang").agg(
      count(lit(1)).as("w_n"),
      sum("syl").as("syl_n"),
      sum(when(col("syl") === 1, 1L).otherwise(0L)).as("single_n"),
      sum(when(col("syl") >= 3, 1L).otherwise(0L)).as("poly_n"))
      .withColumn("g_e2", expr("2000 - single_n * 1500 DIV w_n"))
    perDoc.groupBy("lang").agg(
      count(lit(1)).as("n_docs"),
      sum("w_n").as("words"),
      expr("sum(syl_n) * 1000 DIV sum(w_n)").as("syl_per_word_e3"),
      expr("sum(poly_n) * 10000 DIV sum(w_n)").as("poly_bp"),
      expr("2000 - sum(single_n) * 1500 DIV sum(w_n)").as("forcast_e2"),
      expr("sum(g_e2) DIV count(1)").as("avg_doc_forcast_e2"))
      .orderBy("lang")
  }, Some("""WITH w AS (
      SELECT doc_id, lang, unnest(string_split(text, ' ')) AS w
      FROM documents),
    f AS (SELECT doc_id, lang,
        length(regexp_replace(w, '[aeiouy]+', 'V', 'g'))
          - length(replace(regexp_replace(w, '[aeiouy]+', 'V', 'g'), 'V', '')) AS runs
      FROM w WHERE length(w) > 0),
    sy AS (SELECT doc_id, lang, greatest(1, runs) AS syl FROM f),
    pd AS (SELECT doc_id, lang, count(*)::BIGINT AS w_n,
        CAST(sum(syl) AS BIGINT) AS syl_n,
        CAST(sum(CASE WHEN syl = 1 THEN 1 ELSE 0 END) AS BIGINT) AS single_n,
        CAST(sum(CASE WHEN syl >= 3 THEN 1 ELSE 0 END) AS BIGINT) AS poly_n
      FROM sy GROUP BY doc_id, lang),
    pg AS (SELECT *, 2000 - single_n * 1500 // w_n AS g_e2 FROM pd)
    SELECT lang, count(*)::BIGINT AS n_docs,
      CAST(sum(w_n) AS BIGINT) AS words,
      CAST(sum(syl_n) AS BIGINT) * 1000 // CAST(sum(w_n) AS BIGINT) AS syl_per_word_e3,
      CAST(sum(poly_n) AS BIGINT) * 10000 // CAST(sum(w_n) AS BIGINT) AS poly_bp,
      2000 - CAST(sum(single_n) AS BIGINT) * 1500 // CAST(sum(w_n) AS BIGINT) AS forcast_e2,
      CAST(sum(g_e2) AS BIGINT) // count(*) AS avg_doc_forcast_e2
    FROM pg GROUP BY lang ORDER BY lang"""))

  /** The first-significant-digit CASE (Benford expected shares in basis
    * points, log10(1+1/d) pre-rounded to integer constants — the SAME
    * literal table on both engines, so no float ever enters the
    * comparison). 3010+1761+1249+969+792+669+580+512+458 = 10000.
    */
  private val benfordCase: String =
    """CASE digit WHEN '1' THEN 3010 WHEN '2' THEN 1761 WHEN '3' THEN 1249
      WHEN '4' THEN 969 WHEN '5' THEN 792 WHEN '6' THEN 669
      WHEN '7' THEN 580 WHEN '8' THEN 512 WHEN '9' THEN 458 END"""

  /** Benford first-digit conformance of the invoice amounts (Benford,
    * "The law of anomalous numbers", Proc. Am. Phil. Soc. 1938; the
    * standard forensic-accounting fraud screen and a cheap synthetic-
    * data smell test for any positive, scale-spanning column): the
    * observed first-significant-digit distribution of l_extendedprice
    * in exact basis points beside the Benford expectation, with the
    * per-digit deviation. Digits come from the exact cent integers
    * (round(x·100) — the repo-wide money convention), so the leading
    * digit is a pure string head, no log/float anywhere. Shape: one
    * 9-group partial-agg shuffle + a broadcast 1-row total.
    */
  val qualityBenford: Q = Q("quality_benford", (s, dir) => {
    val d = Tables.t(s, dir, "lineitem")
      .select(expr(
        "substring(CAST(CAST(round(l_extendedprice * 100) AS BIGINT) AS STRING), 1, 1)")
        .as("digit"))
    val byD = d.groupBy("digit").agg(count(lit(1)).as("n"))
    val tot = d.agg(count(lit(1)).as("total"))
    byD.crossJoin(broadcast(tot))
      .select(col("digit"), col("n"), col("total"),
        expr("n * 10000 DIV total").as("share_bp"),
        expr(s"CAST($benfordCase AS BIGINT)").as("benford_bp"),
        expr(s"abs(n * 10000 DIV total - $benfordCase)").as("dev_bp"))
      .orderBy("digit")
  }, Some(s"""WITH d AS (
      SELECT substr(CAST(CAST(round(l_extendedprice * 100) AS BIGINT) AS VARCHAR), 1, 1) AS digit
      FROM lineitem),
    byd AS (SELECT digit, count(*)::BIGINT AS n FROM d GROUP BY digit),
    tot AS (SELECT count(*)::BIGINT AS total FROM d)
    SELECT digit, n, total,
      n * 10000 // total AS share_bp,
      CAST($benfordCase AS BIGINT) AS benford_bp,
      abs(n * 10000 // total - $benfordCase) AS dev_bp
    FROM byd, tot ORDER BY digit"""))

  /** Split-conformal calibration (Vovk et al., "Algorithmic Learning in
    * a Random World", 2005; Angelopoulos & Bates, "A Gentle
    * Introduction to Conformal Prediction", 2021 — public): the
    * distribution-free uncertainty gate a filtering pipeline puts in
    * front of any scorer. Even event_ids are the calibration split,
    * odd the test split; the "model" is the exact calibration median
    * per event type, the nonconformity score |cents − median|, and the
    * 90% conformal quantile q̂ is the ⌈0.9·(n+1)⌉-th smallest
    * calibration score — EXACT rank selection (ceiling division
    * (9(n+1)+9) DIV 10, capped at n), no interpolation, so the
    * finite-sample ≥90% marginal coverage guarantee holds verbatim.
    * Reported: per-type q̂ and the realized test coverage in bp — the
    * exchangeability check itself. Shapes: two per-type rank windows
    * (count + row_number, state per row), two broadcast joins of
    * #type-sized tables, one keyed agg.
    */
  val qualityConformal: Q = Q("quality_conformal_bounds", (s, dir) => {
    import org.apache.spark.sql.expressions.Window
    val e = Tables.events(s, dir).select(col("event_type"), col("event_id"),
      expr("CAST(round(value * 100) AS BIGINT)").as("c"))
    val cal = e.filter(col("event_id") % 2 === 0)
    val tst = e.filter(col("event_id") % 2 === 1)
    val med = cal
      .withColumn("rv", row_number().over(
        Window.partitionBy("event_type").orderBy("c", "event_id")).cast("bigint"))
      .withColumn("nn", count(lit(1)).over(Window.partitionBy("event_type")))
      .filter(expr("rv = (nn + 1) DIV 2"))
      .select(col("event_type"), col("c").as("med"))
    val qh = cal.join(broadcast(med), "event_type")
      .withColumn("sc", expr("abs(c - med)"))
      .withColumn("rv", row_number().over(
        Window.partitionBy("event_type").orderBy("sc", "event_id")).cast("bigint"))
      .withColumn("nc", count(lit(1)).over(Window.partitionBy("event_type")))
      .filter(expr("rv = least((9 * (nc + 1) + 9) DIV 10, nc)"))
      .select(col("event_type"), col("sc").as("qhat"), col("nc").as("n_cal"))
    tst.join(broadcast(med), "event_type").join(broadcast(qh), "event_type")
      .groupBy("event_type")
      .agg(first("n_cal").as("n_cal"), first("med").as("med"),
        first("qhat").as("qhat"), count(lit(1)).as("n_test"),
        sum(expr("CASE WHEN abs(c - med) <= qhat THEN 1L ELSE 0L END")).as("covered"))
      .withColumn("coverage_bp", expr("covered * 10000 DIV n_test"))
      .orderBy("event_type")
  }, Some("""WITH e AS (
      SELECT event_type, event_id,
        CAST(round(value * 100) AS BIGINT) AS c
      FROM events),
    cal AS (SELECT * FROM e WHERE event_id % 2 = 0),
    tst AS (SELECT * FROM e WHERE event_id % 2 = 1),
    med AS (SELECT event_type, c AS med FROM (
      SELECT event_type, c,
        CAST(row_number() OVER (PARTITION BY event_type ORDER BY c, event_id) AS BIGINT) AS rv,
        count(*) OVER (PARTITION BY event_type) AS nn
      FROM cal) WHERE rv = (nn + 1) // 2),
    qh AS (SELECT event_type, sc AS qhat, nc AS n_cal FROM (
      SELECT cal.event_type, abs(c - med) AS sc, event_id,
        CAST(row_number() OVER (PARTITION BY cal.event_type
          ORDER BY abs(c - med), event_id) AS BIGINT) AS rv,
        count(*) OVER (PARTITION BY cal.event_type) AS nc
      FROM cal JOIN med USING (event_type))
      WHERE rv = least((9 * (nc + 1) + 9) // 10, nc))
    SELECT tst.event_type, CAST(n_cal AS BIGINT) AS n_cal, med, qhat,
      count(*)::BIGINT AS n_test,
      CAST(sum(CASE WHEN abs(c - med) <= qhat THEN 1 ELSE 0 END) AS BIGINT) AS covered,
      CAST(sum(CASE WHEN abs(c - med) <= qhat THEN 1 ELSE 0 END) AS BIGINT)
        * 10000 // count(*) AS coverage_bp
    FROM tst JOIN med USING (event_type) JOIN qh USING (event_type)
    GROUP BY tst.event_type, n_cal, med, qhat
    ORDER BY event_type"""))

  /** Per-source vocabulary divergence — the domain-mix diagnostic a
    * multi-corpus training pipeline tracks per ingest batch: for each
    * source, the KL divergence of its word distribution from the whole
    * corpus, in deci-bits, via the same EXACT floor-log₂
    * (`length(bin(x))−1`) integer dialect as [[qualitySurprisal]].
    * Per word w in source s with count a_w (source total A), corpus
    * count n_w (total N): the scaled ratio r = (a_w·N·1024) DIV (A·n_w)
    * carries floor(log₂) + 10 of the likelihood ratio, so
    * KL·10 ≈ Σ a_w·(⌊log₂ r⌋ − 10)·10 DIV A — a one-number "this
    * source does not read like the mix" alarm (the quantity DSIR
    * importance weights integrate per-document; here aggregated
    * per-source). Word counts are one partial-agg shuffle; the corpus
    * table is vocabulary-sized and broadcast back.
    */
  val qualityKlSource: Q = Q("quality_kl_source", (s, dir) => {
    val w = Tables.t(s, dir, "documents").select(col("source"),
      explode(graft.ops.Text.words(col("text"))).as("word"))
    val a = w.groupBy("source", "word").agg(count(lit(1)).as("a"))
    val n = w.groupBy("word").agg(count(lit(1)).as("nw"))
    val tot = w.groupBy("source").agg(count(lit(1)).as("asum"))
    val big = n.agg(sum("nw").as("nsum"))
    a.join(broadcast(n), "word").join(broadcast(tot), "source")
      .crossJoin(broadcast(big))
      .withColumn("lr10",
        expr("length(bin((a * nsum * 1024) DIV (asum * nw))) - 1 - 10"))
      .groupBy("source")
      .agg(first("asum").as("n_words"),
        countDistinct("word").as("n_vocab"),
        sum(expr("a * lr10")).as("kl_num"))
      .withColumn("kl_decibits", expr("kl_num * 10 DIV n_words"))
      .select(col("source"), col("n_words"), col("n_vocab"), col("kl_decibits"))
      .orderBy("source")
  }, Some("""WITH w AS (
      SELECT source,
        unnest(list_filter(string_split(lower(text), ' '), x -> x <> '')) AS word
      FROM documents),
    a AS (SELECT source, word, count(*)::BIGINT AS a FROM w GROUP BY source, word),
    n AS (SELECT word, count(*)::BIGINT AS nw FROM w GROUP BY word),
    tot AS (SELECT source, count(*)::BIGINT AS asum FROM w GROUP BY source),
    big AS (SELECT sum(nw)::BIGINT AS nsum FROM n)
    SELECT a.source, CAST(tot.asum AS BIGINT) AS n_words,
      count(DISTINCT a.word)::BIGINT AS n_vocab,
      CAST(sum(a.a * (length(bin((a.a * big.nsum * 1024) // (tot.asum * n.nw))) - 1 - 10))
        * 10 // tot.asum AS BIGINT) AS kl_decibits
    FROM a JOIN n USING (word) JOIN tot ON tot.source = a.source, big
    GROUP BY a.source, tot.asum
    ORDER BY a.source"""))

  /** Encoding-damage (mojibake) detection — the byte-level hygiene scan
    * a web-scale text pipeline runs before any tokenizer sees the data:
    * classify every byte by its UTF-8 role (ASCII / continuation /
    * 2-, 3-, 4-byte lead / control) and flag documents whose
    * continuation-byte count disagrees with what their lead bytes
    * promise (orphan continuations and truncated sequences are THE
    * mojibake signatures) or that carry non-whitespace control bytes
    * (NUL from binary bleed-through). The corpus text is clean ASCII,
    * so damage is PLANTED deterministically — every byte position
    * p ≡ doc_id (mod 7) is overwritten with a rotating damage byte
    * (BF orphan continuation / C3 dangling lead / F0 truncated 4-byte
    * lead / 00 NUL) — and the detector must recover exactly the
    * per-class imbalance the plant implies. All classification happens
    * on the first HEX DIGIT of each byte (no hex→int conversion
    * needed), in the same hex dialect both engines share for the
    * multimodal decoders. Per-row work is linear in bytes, the explode
    * is position-bounded (64 bytes/doc), and the only shuffle is the
    * per-doc count aggregation.
    */
  /** Per-doc UTF-8 byte-class metrics behind [[qualityEncoding]] —
    * shared with the streaming Utf8GateProcessor parity test (compose
    * from the builder, never from another query's `.fn`). Keeps the
    * `source` column so gate-level aggregation can group by it.
    */
  def encodingMetrics(s: org.apache.spark.sql.SparkSession, dir: String): org.apache.spark.sql.DataFrame = {
    val d = Tables.t(s, dir, "documents")
      .select(col("doc_id"), col("source"),
        expr("upper(hex(substring(text, 1, 64)))").as("hx"))
      .withColumn("nb", expr("length(hx) DIV 2"))
      .filter(col("nb") >= 1)
    val bytes = d.select(col("doc_id"), col("source"), col("hx"),
        explode(expr("sequence(1, nb)")).as("p"))
      .withColumn("bb", expr("""CASE WHEN p % 7 = doc_id % 7 THEN
          CASE doc_id % 4 WHEN 0 THEN 'BF' WHEN 1 THEN 'C3'
                          WHEN 2 THEN 'F0' ELSE '00' END
        ELSE substr(hx, 2 * p - 1, 2) END"""))
      .withColumn("d1", expr("substr(bb, 1, 1)"))
    bytes.groupBy("doc_id", "source")
      .agg(
        count(lit(1)).as("n_bytes"),
        sum(expr("CASE WHEN d1 IN ('8','9','A','B') THEN 1L ELSE 0L END")).as("n_cont"),
        sum(expr("""CASE WHEN d1 IN ('C','D') THEN 1L WHEN d1 = 'E' THEN 2L
          WHEN d1 = 'F' THEN 3L ELSE 0L END""")).as("cont_expected"),
        sum(expr("""CASE WHEN d1 IN ('0','1') AND bb NOT IN ('09','0A','0D')
          THEN 1L ELSE 0L END""")).as("n_ctrl"))
      .withColumn("cont_excess", expr("n_cont - cont_expected"))
      .withColumn("damage_score", expr("abs(cont_excess) * 10 + n_ctrl"))
  }

  /** Corpus composition diversity — the one-number concentration
    * indices a mixture-planning pipeline tracks per snapshot (Simpson
    * 1949; Berger & Parker 1970 — public): for each composition
    * dimension (source, lang), Simpson's λ = Σn(n−1)/(N(N−1)) — the
    * probability two random documents share the group — its inverse
    * (the "effective number of groups"), and the Berger–Parker share of
    * the single largest group. λ drifting UP means the mix is
    * collapsing into few sources. Exact integer rationals (e6 / e4 /
    * bp via truncating DIV); two tiny grouped aggregations unioned.
    */
  val qualityDiversityIndex: Q = Q("quality_diversity_index", (s, dir) => {
    val d = Tables.t(s, dir, "documents")
    def dim(c: String): org.apache.spark.sql.DataFrame =
      d.groupBy(col(c).as("grp")).agg(count(lit(1)).as("n"))
        .agg(lit(c).as("dimension"),
          count(lit(1)).as("n_groups"),
          sum("n").as("n_docs"),
          sum(expr("n * (n - 1)")).as("ss"),
          max("n").as("nmax"))
        .withColumn("simpson_e6",
          expr("1000000 * ss DIV nullif(n_docs * (n_docs - 1), 0)"))
        .withColumn("inv_simpson_e4",
          expr("10000 * n_docs * (n_docs - 1) DIV nullif(ss, 0)"))
        .withColumn("berger_parker_bp", expr("10000 * nmax DIV n_docs"))
        .select("dimension", "n_groups", "n_docs", "simpson_e6",
          "inv_simpson_e4", "berger_parker_bp")
    dim("source").unionByName(dim("lang")).orderBy("dimension")
  }, Some("""WITH s AS (SELECT source AS grp, count(*)::BIGINT AS n
      FROM documents GROUP BY source),
    l AS (SELECT lang AS grp, count(*)::BIGINT AS n
      FROM documents GROUP BY lang),
    a AS (
      SELECT 'source' AS dimension, count(*)::BIGINT AS n_groups,
        CAST(sum(n) AS BIGINT) AS n_docs,
        CAST(sum(n * (n - 1)) AS BIGINT) AS ss,
        CAST(max(n) AS BIGINT) AS nmax
      FROM s
      UNION ALL
      SELECT 'lang', count(*)::BIGINT, CAST(sum(n) AS BIGINT),
        CAST(sum(n * (n - 1)) AS BIGINT), CAST(max(n) AS BIGINT)
      FROM l)
    SELECT dimension, n_groups, n_docs,
      CAST(1000000 * ss // nullif(n_docs * (n_docs - 1), 0) AS BIGINT) AS simpson_e6,
      CAST(10000 * n_docs * (n_docs - 1) // nullif(ss, 0) AS BIGINT) AS inv_simpson_e4,
      CAST(10000 * nmax // n_docs AS BIGINT) AS berger_parker_bp
    FROM a ORDER BY dimension"""))

  /** k-anonymity / l-diversity audit (Sweeney, IJUFKS 2002; Machanavajjhala
    * et al., ICDE 2006 — public) — the privacy-governance twin of
    * [[qualityPiiCensus]]: before an event table leaves the house,
    * measure how re-identifiable its quasi-identifier tuples are. Quasi
    * = (event_type, hour-of-day, 10-unit value band); for thresholds
    * k ∈ {2, 5, 10} report how many quasi-groups and how many ROWS sit
    * below k (the re-identification exposure, in basis points of the
    * table), plus the global minimum group size and the minimum
    * l-diversity (distinct exact values inside a group — a group can be
    * k-anonymous yet value-homogeneous, which is the l-diversity
    * failure). All exact integers; one quasi-group aggregation (the
    * group table is bounded by the quasi domain), a 3-row threshold
    * explode over it, one final agg.
    */
  val qualityKAnonymity: Q = Q("quality_k_anonymity", (s, dir) => {
    val g = Tables.events(s, dir)
      .select(col("event_type"),
        expr("(ts_us DIV 3600000000) % 24").as("hod"),
        expr("CAST(round(value * 100) AS BIGINT) DIV 1000").as("vb"),
        expr("CAST(round(value * 100) AS BIGINT)").as("c"))
      .groupBy("event_type", "hod", "vb")
      .agg(count(lit(1)).as("ksize"), countDistinct("c").as("ldiv"))
    g.select(col("ksize"), col("ldiv"),
        explode(expr("array(2L, 5L, 10L)")).as("kt"))
      .groupBy("kt").agg(
        count(lit(1)).as("n_groups"),
        sum(expr("CASE WHEN ksize < kt THEN 1L ELSE 0L END")).as("groups_below"),
        sum("ksize").as("n_rows"),
        sum(expr("CASE WHEN ksize < kt THEN ksize ELSE 0L END")).as("rows_below"),
        min("ksize").as("min_k"),
        min("ldiv").as("min_l"))
      .withColumn("exposure_bp", expr("10000 * rows_below DIV n_rows"))
      .select("kt", "n_groups", "groups_below", "rows_below", "exposure_bp",
        "min_k", "min_l")
      .orderBy("kt")
  }, Some("""WITH q AS (
      SELECT event_type,
        (epoch_us(ts) // 3600000000) % 24 AS hod,
        CAST(round(value * 100) AS BIGINT) // 1000 AS vb,
        CAST(round(value * 100) AS BIGINT) AS c
      FROM events),
    g AS (SELECT event_type, hod, vb,
        count(*)::BIGINT AS ksize, count(DISTINCT c)::BIGINT AS ldiv
      FROM q GROUP BY 1, 2, 3),
    x AS (SELECT ksize, ldiv, unnest([2::BIGINT, 5::BIGINT, 10::BIGINT]) AS kt FROM g)
    SELECT kt,
      count(*)::BIGINT AS n_groups,
      CAST(sum(CASE WHEN ksize < kt THEN 1 ELSE 0 END) AS BIGINT) AS groups_below,
      CAST(sum(CASE WHEN ksize < kt THEN ksize ELSE 0 END) AS BIGINT) AS rows_below,
      CAST(10000 * sum(CASE WHEN ksize < kt THEN ksize ELSE 0 END)
        // sum(ksize) AS BIGINT) AS exposure_bp,
      CAST(min(ksize) AS BIGINT) AS min_k,
      CAST(min(ldiv) AS BIGINT) AS min_l
    FROM x GROUP BY kt ORDER BY kt"""))

  /** t-closeness census (Li, Li & Venkatasubramanian, "t-Closeness:
    * Privacy Beyond k-Anonymity and l-Diversity", ICDE 2007 — public):
    * completes the governance family around [[qualityKAnonymity]]
    * (same quasi-identifier groups: event_type × hour-of-day × value
    * kilo-bucket). For each quasi-group, the ordered-distance Earth
    * Mover's Distance between the group's sensitive-value distribution
    * (cents binned at 200) and the GLOBAL distribution:
    * EMD = (1/(m−1))·Σᵢ |CumP(i) − CumQ(i)| over the m global bins.
    * Fixed-point and cross-engine exact: cumulative fractions are
    * ×10⁶-scaled truncating rationals (safe to ~9·10¹² rows per group
    * before the ×10⁶ product nears the BIGINT ceiling — same headroom
    * class as the cointegration gate), |diffs| summed as integers,
    * one shared DIV (m−1). Reported like the k-anonymity census: for
    * each disclosure threshold t, how many groups (and rows) exceed it,
    * plus the worst group's EMD — "this release tells an attacker more
    * than t about the sensitive attribute" in one row per t.
    *
    * Scale shape: group×bin and global-bin relations are DOMAIN-sized
    * aggregates (quasi-groups × ≤ value-range/200 bins), the spine
    * join is domain², never data²; cumulative windows run partitioned
    * on those bounded relations; the raw data is touched by exactly
    * two map-side-combining aggregations.
    */
  /** Per-quasi-group t-closeness rows (event_type, hod, vb, ksize,
    * emd_e6) — the intermediate the census aggregates and the
    * [[graft.streaming.TClosenessProcessor]] parity spec compares
    * against: shared builder, so the streaming twin cannot drift from
    * the batch query (the piiDetections discipline).
    */
  def tClosenessGroups(s: org.apache.spark.sql.SparkSession, dir: String): org.apache.spark.sql.DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val base = Tables.events(s, dir).select(col("event_type"),
      expr("(ts_us DIV 3600000000) % 24").as("hod"),
      expr("CAST(round(value * 100) AS BIGINT) DIV 1000").as("vb"),
      expr("CAST(round(value * 100) AS BIGINT) DIV 200").as("sb"))
    val gg = base.groupBy("event_type", "hod", "vb", "sb").agg(count(lit(1)).as("cnt"))
    val gl = base.groupBy("sb").agg(count(lit(1)).as("gcnt"))
      .withColumn("cumN", sum("gcnt").over(
        Window.orderBy("sb").rowsBetween(Window.unboundedPreceding, Window.currentRow)))
    val tot = gl.agg(sum("gcnt").as("nTot"), count(lit(1)).as("m"))
    val groups = gg.groupBy("event_type", "hod", "vb").agg(sum("cnt").as("ksize"))
    // spine: every quasi-group × every GLOBAL bin (absent bins still
    // contribute |CumP − CumQ| — the flat-segment terms)
    val spine = groups.crossJoin(broadcast(gl.select("sb", "cumN")))
      .join(gg, Seq("event_type", "hod", "vb", "sb"), "left")
      .withColumn("cnt0", coalesce(col("cnt"), lit(0L)))
    val wg = Window.partitionBy("event_type", "hod", "vb").orderBy("sb")
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    spine
      .withColumn("cumg", sum("cnt0").over(wg))
      .crossJoin(broadcast(tot))
      .withColumn("d", expr(
        "abs((cumg * 1000000) DIV ksize - (cumN * 1000000) DIV nTot)"))
      .groupBy("event_type", "hod", "vb")
      .agg(first("ksize").as("ksize"),
        expr("sum(d) DIV nullif(max(m) - 1, 0)").as("emd_e6"))
  }

  val qualityTCloseness: Q = Q("quality_t_closeness", (s, dir) => {
    val emd = tClosenessGroups(s, dir)
    emd.select(col("ksize"), col("emd_e6"),
        explode(expr("array(50000L, 100000L, 200000L)")).as("t_e6"))
      .groupBy("t_e6").agg(
        count(lit(1)).as("n_groups"),
        sum(expr("CASE WHEN emd_e6 > t_e6 THEN 1L ELSE 0L END")).as("groups_above"),
        sum("ksize").as("n_rows"),
        sum(expr("CASE WHEN emd_e6 > t_e6 THEN ksize ELSE 0L END")).as("rows_above"),
        max("emd_e6").as("max_emd_e6"))
      .withColumn("exposure_bp", expr("10000 * rows_above DIV n_rows"))
      .select("t_e6", "n_groups", "groups_above", "rows_above", "exposure_bp",
        "max_emd_e6")
      .orderBy("t_e6")
  }, Some("""WITH base AS (
      SELECT event_type,
        (epoch_us(ts) // 3600000000) % 24 AS hod,
        CAST(round(value * 100) AS BIGINT) // 1000 AS vb,
        CAST(round(value * 100) AS BIGINT) // 200 AS sb
      FROM events),
    gg AS (SELECT event_type, hod, vb, sb, count(*)::BIGINT AS cnt
      FROM base GROUP BY 1, 2, 3, 4),
    gl AS (SELECT sb, count(*)::BIGINT AS gcnt,
        CAST(sum(count(*)) OVER (ORDER BY sb
          ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT) AS cumN
      FROM base GROUP BY sb),
    tot AS (SELECT CAST(sum(gcnt) AS BIGINT) AS nTot, count(*)::BIGINT AS m FROM gl),
    groups AS (SELECT event_type, hod, vb, CAST(sum(cnt) AS BIGINT) AS ksize
      FROM gg GROUP BY 1, 2, 3),
    spine AS (SELECT g.event_type, g.hod, g.vb, g.ksize, gl.sb, gl.cumN,
        coalesce(gg.cnt, 0)::BIGINT AS cnt0
      FROM groups g CROSS JOIN gl
      LEFT JOIN gg ON gg.event_type = g.event_type AND gg.hod = g.hod
        AND gg.vb = g.vb AND gg.sb = gl.sb),
    cums AS (SELECT event_type, hod, vb, ksize, cumN,
        CAST(sum(cnt0) OVER (PARTITION BY event_type, hod, vb ORDER BY sb
          ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT) AS cumg
      FROM spine),
    emd AS (SELECT c.event_type, c.hod, c.vb,
        CAST(max(c.ksize) AS BIGINT) AS ksize,
        CAST(sum(abs((c.cumg * 1000000) // c.ksize
          - (c.cumN * 1000000) // t.nTot)) // nullif(max(t.m) - 1, 0) AS BIGINT) AS emd_e6
      FROM cums c CROSS JOIN tot t GROUP BY 1, 2, 3),
    x AS (SELECT ksize, emd_e6,
        unnest([50000::BIGINT, 100000::BIGINT, 200000::BIGINT]) AS t_e6 FROM emd)
    SELECT t_e6,
      count(*)::BIGINT AS n_groups,
      CAST(sum(CASE WHEN emd_e6 > t_e6 THEN 1 ELSE 0 END) AS BIGINT) AS groups_above,
      CAST(sum(CASE WHEN emd_e6 > t_e6 THEN ksize ELSE 0 END) AS BIGINT) AS rows_above,
      CAST(10000 * sum(CASE WHEN emd_e6 > t_e6 THEN ksize ELSE 0 END)
        // sum(ksize) AS BIGINT) AS exposure_bp,
      CAST(max(emd_e6) AS BIGINT) AS max_emd_e6
    FROM x GROUP BY t_e6 ORDER BY t_e6"""))

  /** Zipf rank-frequency fit — the vocabulary-naturalness health check
    * (Zipf's law: natural language word frequencies follow f ∝ r^−s
    * with s ≈ 1; machine-generated, templated, or spam-like text bends
    * the curve — a corpus whose slope drifts from ~−1 warrants a look
    * before it trains anything). Per source: rank words by frequency
    * (count DESC, word ASC tie-break) and least-squares-fit y = ⌊log₂ f⌋
    * against x = ⌊log₂ r⌋ in the EXACT `length(bin(x))−1` integer
    * dialect of [[qualityKlSource]]; the slope is the cross-multiplied
    * rational 10⁴·(n·Σxy − Σx·Σy) DIV (n·Σx² − (Σx)²) — truncation
    * toward zero agrees across engines even when negative. One word
    * count shuffle, one per-source rank window, one keyed agg.
    */
  val qualityZipfFit: Q = Q("quality_zipf_fit", (s, dir) => {
    import org.apache.spark.sql.expressions.Window
    val w = Tables.t(s, dir, "documents").select(col("source"),
      explode(graft.ops.Text.words(col("text"))).as("word"))
    val f = w.groupBy("source", "word").agg(count(lit(1)).as("f"))
    val rk = f.withColumn("r", row_number().over(
        Window.partitionBy("source").orderBy(col("f").desc, col("word").asc)).cast("bigint"))
      .withColumn("x", expr("CAST(length(bin(r)) - 1 AS BIGINT)"))
      .withColumn("y", expr("CAST(length(bin(f)) - 1 AS BIGINT)"))
    rk.groupBy("source").agg(
        count(lit(1)).as("n_types"),
        sum("f").as("n_tokens"),
        sum("x").as("sx"), sum("y").as("sy"),
        sum(expr("x * y")).as("sxy"), sum(expr("x * x")).as("sxx"))
      .withColumn("slope_e4",
        expr("10000 * (n_types * sxy - sx * sy) DIV nullif(n_types * sxx - sx * sx, 0)"))
      .select("source", "n_types", "n_tokens", "slope_e4")
      .orderBy("source")
  }, Some("""WITH w AS (
      SELECT source,
        unnest(list_filter(string_split(lower(text), ' '), x -> x <> '')) AS word
      FROM documents),
    f AS (SELECT source, word, count(*)::BIGINT AS f FROM w GROUP BY source, word),
    rk AS (SELECT source, f,
        CAST(row_number() OVER (PARTITION BY source ORDER BY f DESC, word ASC) AS BIGINT) AS r
      FROM f),
    l AS (SELECT source, f,
        CAST(length(bin(r)) - 1 AS BIGINT) AS x,
        CAST(length(bin(f)) - 1 AS BIGINT) AS y
      FROM rk),
    a AS (SELECT source, count(*)::BIGINT AS n_types,
        CAST(sum(f) AS BIGINT) AS n_tokens,
        CAST(sum(x) AS BIGINT) AS sx, CAST(sum(y) AS BIGINT) AS sy,
        CAST(sum(x * y) AS BIGINT) AS sxy, CAST(sum(x * x) AS BIGINT) AS sxx
      FROM l GROUP BY source)
    SELECT source, n_types, n_tokens,
      CAST(10000 * (n_types * sxy - sx * sy)
        // nullif(n_types * sxx - sx * sx, 0) AS BIGINT) AS slope_e4
    FROM a ORDER BY source"""))

  /** Unrolled Luhn (mod-10) digit sum over an all-digit string column:
    * positions 1..`upTo` of a number whose FULL length is `totalLen`;
    * a digit at left-index i sits at right-position totalLen − i + 1
    * and is doubled (with the >4 ⇒ 2d−9 casting-out-nines fold) when
    * that right-position is even. Pure substr/CAST/CASE — the identical
    * text parses in Spark SQL and DuckDB, so plant and detector share
    * one arithmetic definition.
    */
  private def luhnSumSql(c: String, totalLen: Int, upTo: Int): String =
    (1 to upTo).map { i =>
      val d = s"CAST(substr($c, $i, 1) AS INT)"
      if ((totalLen - i + 1) % 2 == 0)
        s"(CASE WHEN $d > 4 THEN 2 * $d - 9 ELSE 2 * $d END)"
      else d
    }.mkString("(", " + ", ")")

  private val emailRe = "[a-z0-9._%+-]+@[a-z0-9.-]+[.][a-z]+"
  private val phoneRe = "[0-9]{3}-[0-9]{3}-[0-9]{4}"
  private val ipv4Re = "[0-9]+[.][0-9]+[.][0-9]+[.][0-9]+"

  /** PII census — the compliance scan a training-data pipeline runs
    * before release: per-source counts of e-mail addresses, NANP-shaped
    * phone numbers, dotted-quad IPs, and 16-digit card candidates, with
    * card candidates VERIFIED by the Luhn mod-10 checksum (the check
    * that separates a real PAN from a random digit run). The corpus is
    * synthetic clean text, so PII is PLANTED deterministically (the
    * quality_encoding discipline): doc_id mod 7 selects the plant —
    * e-mail / phone / IP / card — and card check digits are Luhn-VALID
    * exactly when doc_id is even, so the detector must recover both the
    * plant rates and the 50/50 valid/invalid split. Detection is
    * regex + unrolled integer Luhn (shared textual SQL, no dialect
    * fork beyond the STRING/VARCHAR cast); per-row work is linear in
    * text bytes and the only shuffle is the per-source aggregation.
    */
  /** Per-document PII detections on the planted-PII corpus — the ONE
    * detection pipeline under the batch census AND the streaming
    * [[graft.streaming.PiiProcessor]] apply (the dedup_lsh_eval no-drift
    * rule: the stream gate can never diverge from the batch detector it
    * mirrors because they run the identical expressions). Detection is
    * STATELESS — regexes + the unrolled Luhn checksum — so the stream
    * side runs it per micro-batch row and keeps only bounded per-source
    * counters as state.
    */
  private[graft] def piiDetections(
      s: org.apache.spark.sql.SparkSession, dir: String): org.apache.spark.sql.DataFrame =
    Tables.t(s, dir, "documents")
      .withColumn("ccb", expr("'4' || lpad(CAST(doc_id % 100000000 AS STRING), 14, '0')"))
      .withColumn("c0", expr(s"(10 - (${luhnSumSql("ccb", 16, 15)} % 10)) % 10"))
      .withColumn("cd", expr("CASE WHEN doc_id % 2 = 0 THEN c0 ELSE (c0 + 3) % 10 END"))
      .withColumn("aug", expr("""text || CASE doc_id % 7
          WHEN 0 THEN ' contact user' || CAST(doc_id AS STRING) || '@example.com now'
          WHEN 1 THEN ' call 415-555-' || lpad(CAST(doc_id % 10000 AS STRING), 4, '0') || ' today'
          WHEN 2 THEN ' host 10.' || CAST(doc_id % 256 AS STRING) || '.0.1 up'
          WHEN 3 THEN ' card ' || ccb || CAST(cd AS STRING) || ' used'
          ELSE '' END"""))
      .withColumn("n_email", expr(s"size(regexp_extract_all(aug, '$emailRe', 0))").cast("long"))
      .withColumn("n_phone", expr(s"size(regexp_extract_all(aug, '$phoneRe', 0))").cast("long"))
      .withColumn("n_ipv4", expr(s"size(regexp_extract_all(aug, '$ipv4Re', 0))").cast("long"))
      .withColumn("cc", expr("regexp_extract(aug, '[0-9]{16}', 0)"))
      .withColumn("cc_luhn", expr(s"""CASE WHEN length(cc) = 16 THEN
          (CASE WHEN ${luhnSumSql("cc", 16, 16)} % 10 = 0 THEN 1L ELSE 0L END)
        ELSE 0L END"""))

  val qualityPiiCensus: Q = Q("quality_pii_census", (s, dir) => {
    val det = piiDetections(s, dir)
    det.groupBy("source").agg(
        count(lit(1)).as("n_docs"),
        sum("n_email").as("n_email"),
        sum("n_phone").as("n_phone"),
        sum("n_ipv4").as("n_ipv4"),
        sum(expr("CASE WHEN length(cc) = 16 THEN 1L ELSE 0L END")).as("n_cc"),
        sum("cc_luhn").as("n_cc_luhn"),
        sum(expr("""CASE WHEN n_email + n_phone + n_ipv4 > 0 OR length(cc) = 16
          THEN 1L ELSE 0L END""")).as("n_pii_docs"))
      .withColumn("pii_bp", expr("10000 * n_pii_docs DIV n_docs"))
      .orderBy("source")
  }, Some(s"""WITH p AS (
      SELECT doc_id, source,
        '4' || lpad(CAST(doc_id % 100000000 AS VARCHAR), 14, '0') AS ccb
      FROM documents),
    p2 AS (SELECT doc_id, source, ccb,
        (10 - (${luhnSumSql("ccb", 16, 15)} % 10)) % 10 AS c0
      FROM p),
    p3 AS (SELECT doc_id, source, ccb,
        CASE WHEN doc_id % 2 = 0 THEN c0 ELSE (c0 + 3) % 10 END AS cd
      FROM p2),
    a AS (SELECT d.doc_id, d.source,
        d.text || CASE d.doc_id % 7
          WHEN 0 THEN ' contact user' || CAST(d.doc_id AS VARCHAR) || '@example.com now'
          WHEN 1 THEN ' call 415-555-' || lpad(CAST(d.doc_id % 10000 AS VARCHAR), 4, '0') || ' today'
          WHEN 2 THEN ' host 10.' || CAST(d.doc_id % 256 AS VARCHAR) || '.0.1 up'
          WHEN 3 THEN ' card ' || p3.ccb || CAST(p3.cd AS VARCHAR) || ' used'
          ELSE '' END AS aug
      FROM documents d JOIN p3 ON p3.doc_id = d.doc_id),
    det AS (SELECT doc_id, source,
        len(regexp_extract_all(aug, '$emailRe'))::BIGINT AS n_email,
        len(regexp_extract_all(aug, '$phoneRe'))::BIGINT AS n_phone,
        len(regexp_extract_all(aug, '$ipv4Re'))::BIGINT AS n_ipv4,
        regexp_extract(aug, '[0-9]{16}') AS cc
      FROM a),
    lu AS (SELECT *, CASE WHEN length(cc) = 16 THEN
          (CASE WHEN ${luhnSumSql("cc", 16, 16)} % 10 = 0 THEN 1 ELSE 0 END)
        ELSE 0 END AS cc_luhn
      FROM det)
    SELECT source,
      count(*)::BIGINT AS n_docs,
      CAST(sum(n_email) AS BIGINT) AS n_email,
      CAST(sum(n_phone) AS BIGINT) AS n_phone,
      CAST(sum(n_ipv4) AS BIGINT) AS n_ipv4,
      CAST(sum(CASE WHEN length(cc) = 16 THEN 1 ELSE 0 END) AS BIGINT) AS n_cc,
      CAST(sum(cc_luhn) AS BIGINT) AS n_cc_luhn,
      CAST(sum(CASE WHEN n_email + n_phone + n_ipv4 > 0 OR length(cc) = 16
        THEN 1 ELSE 0 END) AS BIGINT) AS n_pii_docs,
      CAST(10000 * sum(CASE WHEN n_email + n_phone + n_ipv4 > 0 OR length(cc) = 16
        THEN 1 ELSE 0 END) // count(*) AS BIGINT) AS pii_bp
    FROM lu GROUP BY source ORDER BY source"""))

  val qualityEncoding: Q = Q("quality_encoding", (s, dir) => {
    encodingMetrics(s, dir)
      .select(col("doc_id"), col("n_bytes"), col("n_cont"), col("cont_expected"),
        col("n_ctrl"), col("cont_excess"), col("damage_score"))
      .orderBy(col("damage_score").desc, col("doc_id")).limit(25)
  }, Some("""WITH d AS (
      SELECT doc_id, upper(hex(substring(text, 1, 64))) AS hx
      FROM documents WHERE length(hex(substring(text, 1, 64))) >= 2),
    b AS (SELECT doc_id, hx,
        unnest(range(1, length(hx) // 2 + 1)) AS p
      FROM d),
    c AS (SELECT doc_id,
        CASE WHEN p % 7 = doc_id % 7 THEN
          CASE doc_id % 4 WHEN 0 THEN 'BF' WHEN 1 THEN 'C3'
                          WHEN 2 THEN 'F0' ELSE '00' END
        ELSE substr(hx, CAST(2 * p - 1 AS INT), 2) END AS bb
      FROM b),
    k AS (SELECT doc_id, bb, substr(bb, 1, 1) AS d1 FROM c)
    SELECT doc_id,
      count(*)::BIGINT AS n_bytes,
      CAST(sum(CASE WHEN d1 IN ('8','9','A','B') THEN 1 ELSE 0 END) AS BIGINT) AS n_cont,
      CAST(sum(CASE WHEN d1 IN ('C','D') THEN 1 WHEN d1 = 'E' THEN 2
        WHEN d1 = 'F' THEN 3 ELSE 0 END) AS BIGINT) AS cont_expected,
      CAST(sum(CASE WHEN d1 IN ('0','1') AND bb NOT IN ('09','0A','0D')
        THEN 1 ELSE 0 END) AS BIGINT) AS n_ctrl,
      CAST(sum(CASE WHEN d1 IN ('8','9','A','B') THEN 1 ELSE 0 END)
        - sum(CASE WHEN d1 IN ('C','D') THEN 1 WHEN d1 = 'E' THEN 2
            WHEN d1 = 'F' THEN 3 ELSE 0 END) AS BIGINT) AS cont_excess,
      CAST(abs(sum(CASE WHEN d1 IN ('8','9','A','B') THEN 1 ELSE 0 END)
          - sum(CASE WHEN d1 IN ('C','D') THEN 1 WHEN d1 = 'E' THEN 2
              WHEN d1 = 'F' THEN 3 ELSE 0 END)) * 10
        + sum(CASE WHEN d1 IN ('0','1') AND bb NOT IN ('09','0A','0D')
            THEN 1 ELSE 0 END) AS BIGINT) AS damage_score
    FROM k GROUP BY doc_id
    ORDER BY damage_score DESC, doc_id LIMIT 25"""))
}
