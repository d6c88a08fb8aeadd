package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Data profiling (the ANALYZE/quality-report primitive of ingestion
  * pipelines): per-column null counts, exact distinct cardinalities,
  * and numeric ranges for any set of columns — in ONE scan.
  *
  * Scale shape: all metrics fold into a single aggregate node (the
  * multi-distinct rewrite plans one Expand over the scan — columns ×
  * rows map-side, no per-column rescans), then the 1-row wide result
  * unpivots driver-cheaply through `stack`. Profiling N columns costs
  * one pass over the table regardless of N.
  */
object Profile {

  /** Long-format numeric profile: (col, n_null, n_distinct, min_v,
    * max_v) per requested column.
    */
  def numericProfile(df: DataFrame, cols: Seq[String]): DataFrame = {
    require(cols.nonEmpty, "profile needs at least one column")
    val aggs = cols.flatMap { c =>
      Seq(
        sum(when(col(c).isNull, 1L).otherwise(0L)).as(s"${c}__nn"),
        countDistinct(col(c)).as(s"${c}__nd"),
        min(col(c)).cast("double").as(s"${c}__mn"),
        max(col(c)).cast("double").as(s"${c}__mx"))
    }
    val one = df.agg(aggs.head, aggs.tail: _*)
    val stackArgs = cols.map { c =>
      s"'$c', ${c}__nn, ${c}__nd, round(${c}__mn, 4), round(${c}__mx, 4)"
    }.mkString(", ")
    one.select(expr(
      s"stack(${cols.length}, $stackArgs) as (col, n_null, n_distinct, min_v, max_v)"))
  }
}
