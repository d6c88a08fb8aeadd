package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** The reusable scale-safe rewrite forms for the two plan classes the
  * sf1 decade bench caught as super-linear instances (q12's
  * window-attach chain ending in distinct, 33× wall for 10× data;
  * q13's multi-distinct Expand, 52×) — extracted so the next query in
  * either shape reuses the safe form instead of re-deriving it.
  * `graft.plans.PlanLint` statically flags both source shapes in
  * every registered query's plan.
  */
private[operators] trait RollupsScaleForms {

  /** Scale-safe form of the "window-attach chain ending in .distinct()"
    * shape: each attachment is a map-side-combined aggregate at its own
    * key grain, joined back at the collapsed output grain. The window
    * form sorts the FULL data grain inside fixed-width partitions
    * before collapsing (the q12 sf1 catch: 33x wall for 10x data);
    * this form only ever shuffles collapsed grains. Attachments whose
    * keys equal `grain` become the base aggregate (no extra distinct).
    * Keep `attachWindowAgg` for chains that do NOT collapse afterwards.
    */
  def keyGrainAttach(
      df: DataFrame,
      grain: Seq[String],
      attachments: Seq[(Seq[String], Seq[Column])]): DataFrame = {
    val (atGrain, others) = attachments.partition(_._1.toSet == grain.toSet)
    val base =
      if (atGrain.nonEmpty) {
        val aggs = atGrain.flatMap(_._2)
        df.groupBy(grain.map(col): _*).agg(aggs.head, aggs.tail: _*)
      } else df.select(grain.map(col): _*).distinct()
    others.foldLeft(base) { case (acc, (keys, aggs)) =>
      acc.join(df.groupBy(keys.map(col): _*).agg(aggs.head, aggs.tail: _*), keys)
    }
  }

  /** Two nested distinct-counts per group WITHOUT the Expand: Spark
    * plans N distinct aggregates in one Aggregate as an N-way row
    * Expand (the q13 sf1 catch: 52x wall for 10x data). Collapse to
    * the distinct (group, key, extra) tuple once — map-side partial
    * dedup — then count at (group, key) grain and roll up, so
    * `keyOut` = distinct key tuples and `pairOut` = distinct
    * (key, extra) tuples per group, with every shuffle on an
    * already-collapsed grain. Null keys count as a group of their own
    * (tuple semantics, not count(DISTINCT)'s null-dropping — mirror
    * the same tuple-distinct cascade in any oracle).
    */
  def distinctCascade(
      df: DataFrame,
      groupCols: Seq[String],
      keyCols: Seq[String],
      extraCols: Seq[String],
      keyOut: String,
      pairOut: String): DataFrame =
    df.select((groupCols ++ keyCols ++ extraCols).map(col): _*).distinct()
      .groupBy((groupCols ++ keyCols).map(col): _*)
      .agg(count(lit(1)).as("__subn"))
      .groupBy(groupCols.map(col): _*)
      .agg(count(lit(1)).as(keyOut), sum("__subn").as(pairOut))
}
