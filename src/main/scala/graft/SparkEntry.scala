package graft

import graft.operators._
import graft.sources.Tables
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Driver contract — query registry + DuckDB oracle SQL.
  *
  * Column names are aligned between each query and its oracle (the
  * driver sorts columns by name before hashing). All float outputs are
  * rounded only at the final projection on both sides (SURVEY.md §3).
  */
object SparkEntry {

  /** Flagship: cumulative per-datasource association scores on sf0.001. */
  def entry(spark: SparkSession): DataFrame =
    queries("q01_assoc_datasource")(spark, "/root/testdata/sf0.001")

  // Shared SQL fragments for the oracles (DuckDB dialect).
  private val EvSql =
    """ev AS (
      |  SELECT l_suppkey AS diseaseId, l_partkey AS targetId,
      |         l_returnflag AS datasourceId, l_discount*10 AS score,
      |         CAST(year(l_shipdate) AS INT) AS year
      |  FROM lineitem
      |)""".stripMargin

  /** Per-(pair, datasource, year) cumulative harmonic score, years
    * 1995..2002 (2002 = undated surrogate), NULL score before first
    * evidence. Mirrors graft.operators.AssociationScore.byDatasource.
    */
  private val BySourceSql =
    s"""$EvSql,
       |pairs AS (SELECT DISTINCT diseaseId, targetId, datasourceId FROM ev),
       |years AS (SELECT CAST(unnest(range(1995, 2003)) AS INT) AS year),
       |ranked AS (
       |  SELECT p.diseaseId, p.targetId, p.datasourceId, y.year, e.score,
       |         row_number() OVER (
       |           PARTITION BY p.diseaseId, p.targetId, p.datasourceId, y.year
       |           ORDER BY e.score DESC) AS rn
       |  FROM pairs p CROSS JOIN years y
       |  LEFT JOIN ev e ON e.diseaseId = p.diseaseId AND e.targetId = p.targetId
       |    AND e.datasourceId = p.datasourceId AND e.year <= y.year
       |),
       |bysource AS (
       |  SELECT diseaseId, targetId, datasourceId, year,
       |         sum(score/(rn*rn)) / 1.6449340668482264 AS score
       |  FROM ranked WHERE rn <= 50
       |  GROUP BY 1, 2, 3, 4
       |)""".stripMargin

  /** Weighted overall harmonic score per (pair, year). */
  private val OverallSql =
    s"""$BySourceSql,
       |weights(datasourceId, weight) AS (VALUES ('A', 1.0), ('N', 0.5), ('R', 0.2)),
       |overall AS (
       |  SELECT diseaseId, targetId, year,
       |         sum(CASE WHEN rn <= 50 THEN wscore/(rn*rn) END) / 1.6449340668482264 AS score
       |  FROM (
       |    SELECT b.diseaseId, b.targetId, b.year, b.score * w.weight AS wscore,
       |           row_number() OVER (
       |             PARTITION BY b.diseaseId, b.targetId, b.year
       |             ORDER BY b.score * w.weight DESC NULLS LAST) AS rn
       |    FROM bysource b LEFT JOIN weights w USING (datasourceId)
       |  )
       |  GROUP BY 1, 2, 3
       |)""".stripMargin

  def queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q01_assoc_datasource" -> ((s, dir) => {
      val t = Tables(s, dir)
      AssociationScore.byDatasource(t.evidence)
        .withColumn("score", round(col("score"), 4))
    }),
    "q02_assoc_overall" -> ((s, dir) => {
      val t = Tables(s, dir)
      AssociationScore.overall(AssociationScore.byDatasource(t.evidence), t.weights)
        .withColumn("score", round(col("score"), 4))
    }),
    "q03_novelty" -> ((s, dir) => {
      val t = Tables(s, dir)
      val overall = AssociationScore.overall(
        AssociationScore.byDatasource(t.evidence), t.weights)
      Novelty.attach(overall, Seq("diseaseId", "targetId"))
    }),
  )

  def oracleSql: Map[String, String] = Map(
    "q01_assoc_datasource" ->
      s"""WITH $BySourceSql
         |SELECT diseaseId, targetId, datasourceId,
         |       CASE WHEN year = 2002 THEN NULL ELSE year END AS year,
         |       round(score, 4) AS score
         |FROM bysource""".stripMargin,
    "q02_assoc_overall" ->
      s"""WITH $OverallSql
         |SELECT diseaseId, targetId,
         |       CASE WHEN year = 2002 THEN NULL ELSE year END AS year,
         |       round(score, 4) AS score
         |FROM overall""".stripMargin,
    "q03_novelty" ->
      s"""WITH $OverallSql,
         |peaks AS (
         |  SELECT diseaseId, targetId, year AS peakYear,
         |         coalesce(score, 0) - lag(coalesce(score, 0)) OVER (
         |           PARTITION BY diseaseId, targetId ORDER BY year) AS peak
         |  FROM overall
         |),
         |decayed AS (
         |  SELECT diseaseId, targetId, peakYear + d.delta AS year,
         |         round(max(peak / (1 + exp(2.0 * (d.delta - 2.0)))), 3) AS novelty
         |  FROM peaks CROSS JOIN (SELECT unnest(range(0, 11)) AS delta) d
         |  WHERE peak > 0
         |  GROUP BY 1, 2, 3
         |)
         |SELECT o.diseaseId, o.targetId,
         |       CASE WHEN o.year = 2002 THEN NULL ELSE o.year END AS year,
         |       round(o.score, 4) AS score,
         |       coalesce(n.novelty, 0.0) AS novelty
         |FROM overall o
         |LEFT JOIN decayed n
         |  ON n.diseaseId = o.diseaseId AND n.targetId = o.targetId AND n.year = o.year""".stripMargin,
  )
}
