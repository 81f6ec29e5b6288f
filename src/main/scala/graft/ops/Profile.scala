package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{NumericType, StringType, TimestampNTZType, TimestampType}

/** Generic one-pass column profiler — the deequ/dbt-style snapshot
  * statistics (rows, nulls, distincts, min/max) for any subset of a
  * relation's columns, computed in a SINGLE scan: one multi-aggregate
  * (Spark plans the multiple DISTINCT aggregates via expand) exploded
  * into a row per column.
  *
  * Numeric columns surface min/max as doubles, timestamps as epoch-µs
  * doubles, strings as strings — so mixed column types fit one tidy
  * output schema: (col_name, n, n_null, n_distinct, min_num, max_num,
  * min_str, max_str).
  */
object Profile {

  def profile(df: DataFrame, cols: Seq[String]): DataFrame = {
    require(cols.nonEmpty, "profile needs at least one column")
    val types = df.schema.fields.map(f => f.name -> f.dataType).toMap
    cols.foreach(c => require(types.contains(c), s"no such column: $c"))

    def sur(c: String) = types(c) match {
      // session is expected to be pinned UTC: the NTZ→LTZ cast is then
      // the identity wall-time mapping (same contract as Tables.tune)
      case _: TimestampType | _: TimestampNTZType =>
        expr(s"CAST(unix_micros(CAST(`$c` AS TIMESTAMP)) AS DOUBLE)")
      case _: NumericType => col(c).cast("double")
      case _: StringType => col(c)
      case other => col(c).cast("string") // booleans, etc. — profile as text
    }
    def isNum(c: String) = types(c) match {
      case _: NumericType | _: TimestampType | _: TimestampNTZType => true
      case _ => false
    }

    val surfaced = cols.foldLeft(df)((acc, c) => acc.withColumn(s"_p_$c", sur(c)))
    val aggs = cols.flatMap { c =>
      Seq(count(col(s"_p_$c")).as(s"_nn_$c"),
        countDistinct(col(s"_p_$c")).as(s"_nd_$c"),
        min(col(s"_p_$c")).as(s"_mn_$c"),
        max(col(s"_p_$c")).as(s"_mx_$c"))
    }
    val a = surfaced.agg(count(lit(1)).as("_n"), aggs: _*)
    val rows = cols.map { c =>
      val (mnN, mxN, mnS, mxS) =
        if (isNum(c))
          (round(col(s"_mn_$c"), 4), round(col(s"_mx_$c"), 4),
            lit(null).cast("string"), lit(null).cast("string"))
        else
          (lit(null).cast("double"), lit(null).cast("double"),
            col(s"_mn_$c"), col(s"_mx_$c"))
      struct(lit(c).as("col_name"), col("_n").as("n"),
        (col("_n") - col(s"_nn_$c")).as("n_null"),
        col(s"_nd_$c").as("n_distinct"),
        mnN.as("min_num"), mxN.as("max_num"), mnS.as("min_str"), mxS.as("max_str"))
    }
    a.select(explode(array(rows: _*)).as("p")).select("p.*").orderBy("col_name")
  }
}
