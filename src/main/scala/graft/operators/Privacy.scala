package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Privacy-risk auditing for release pipelines (the structured
  * counterpart to TextAnalysis.piiRedact's free-text scrubbing):
  * k-anonymity — every quasi-identifier combination must describe at
  * least k records — and l-diversity — each combination must carry at
  * least l distinct sensitive values, or the group's sensitive
  * attribute is inferable even when k holds (Sweeney 2002; Machanavajjhala
  * et al. 2007).
  *
  * Scale shape: one map-side-combined groupBy on the quasi-identifier
  * key; the distinct-sensitive count is exact (Expand-based distinct
  * aggregation) at the group grain, never a second scan.
  */
object Privacy {

  /** Per quasi-identifier group: size, sensitive diversity, and the
    * k/l verdicts. Output: quasiCols ++ (n, l_div, k_anonymous,
    * l_diverse).
    */
  def kAnonymity(
      df: DataFrame,
      quasiCols: Seq[Column],
      sensitive: Column,
      k: Int,
      l: Int): DataFrame =
    df.groupBy(quasiCols: _*)
      .agg(
        count(lit(1)).as("n"),
        countDistinct(sensitive).as("l_div"))
      .withColumn("k_anonymous", col("n") >= k)
      .withColumn("l_diverse", col("l_div") >= l)
}
