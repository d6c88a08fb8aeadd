package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Analysis-layer rollups mirroring the reference's
  * novelty_distribution.py / novelty_approval.py query shapes:
  * ranked pick per key (row_number over an ordering — the
  * therapeutic-area selection at novelty_distribution.py:81–98),
  * windowed first/max (novelty_approval.py:374, 405), distinct-count
  * rollups (novelty_distribution.py:499–562) and crosstabs
  * (novelty_distribution.py:746–798).
  */
object Rollups {

  /** Keep the top-n rows per key under `order` (deterministic — include
    * a unique tie-breaker in `order`).
    */
  def topRank(df: DataFrame, partCols: Seq[String], order: Seq[Column], n: Int = 1): DataFrame =
    df.withColumn("rank",
        row_number().over(Window.partitionBy(partCols.map(col): _*).orderBy(order: _*)))
      .filter(col("rank") <= n)

  /** Ranked-dimension pick: left-join a broadcast priority dim on
    * `itemCol`, fill unranked items with `fill` (they must survive, not
    * win — novelty_distribution.py:81–98's `fillna(1000)`), and keep
    * each key's best-ranked item. The reference orders by ranking
    * alone, which is nondeterministic among unranked items; `itemCol`
    * is the tie-break here so results are stable across engines.
    */
  def rankedDimPick(
      df: DataFrame,
      keyCol: String,
      itemCol: String,
      dim: DataFrame,
      rankCol: String,
      fill: Int = 1000): DataFrame =
    df.join(broadcast(dim), Seq(itemCol), "left")
      .na.fill(Map(rankCol -> fill))
      .transform(topRank(_, Seq(keyCol), Seq(col(rankCol), col(itemCol))))
      .drop("rank", rankCol)

  /** Windowed min/max attachments without collapsing rows. */
  def attachWindowAgg(df: DataFrame, partCols: Seq[String], agg: Column, out: String): DataFrame =
    df.withColumn(out, agg.over(Window.partitionBy(partCols.map(col): _*)))

  /** Distinct-count rollup per group (count-distinct shuffles once per
    * grouping; composite keys are concatenated for engine portability).
    */
  def distinctRollup(df: DataFrame, groupCols: Seq[String], distinctCol: Column, out: String): DataFrame =
    df.groupBy(groupCols.map(col): _*)
      .agg(countDistinct(distinctCol).as(out))

  /** Conditional-aggregation crosstab: one column per pivot value
    * (static pivot list keeps the plan a single aggregate — no
    * two-phase pivot scan).
    */
  def crosstab(df: DataFrame, groupCols: Seq[String], pivotCol: String, values: Seq[String]): DataFrame =
    df.groupBy(groupCols.map(col): _*)
      .agg(
        values.head.pipe(v => count(when(col(pivotCol) === v, 1)).as(s"n_$v")),
        values.tail.map(v => count(when(col(pivotCol) === v, 1)).as(s"n_$v")): _*)

  private implicit class Piped[A](private val a: A) extends AnyVal {
    def pipe[B](f: A => B): B = f(a)
  }
}
