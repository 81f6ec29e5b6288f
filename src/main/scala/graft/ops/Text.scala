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
  def hashBucket(id: Column, salt: String = ""): Column =
    conv(substring(md5(concat(lit(salt), id.cast("string"))), 1, 15), 16, 10)
      .cast("bigint") % 100
}
