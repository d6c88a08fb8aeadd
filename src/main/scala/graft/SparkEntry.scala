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
    "q04_novelty_datasource" -> ((s, dir) => {
      val t = Tables(s, dir)
      Novelty.attach(
        AssociationScore.byDatasource(t.evidence),
        Seq("diseaseId", "targetId", "datasourceId"))
    }),
    "q05_indirect" -> ((s, dir) => {
      val t = Tables(s, dir)
      OntologyPropagate.indirect(t.evidence, t.ontology)
        .groupBy("diseaseId", "datasourceId")
        .agg(
          count(lit(1)).as("n_evidence"),
          round(sum("score"), 4).as("sum_score"))
    }),
    "q06_evidence_dating" -> ((s, dir) => {
      val t = Tables(s, dir)
      val candidates = t.lineitem
        .join(
          t.orders.select(
            col("o_orderkey"),
            year(col("o_orderdate")).cast("int").as("orderYear")),
          col("l_orderkey") === col("o_orderkey"), "left")
        .withColumn("studyYear",
          when(col("l_returnflag") === "R", year(col("l_shipdate")).cast("int")))
        .withColumn("curationYear",
          when(col("l_linenumber") <= 2, year(col("l_shipdate")).cast("int") - 1))
      Dating.bestDate(candidates, Seq("studyYear", "curationYear", "orderYear"))
        .groupBy("l_orderkey")
        .agg(
          min("year").as("year"),
          count(lit(1)).as("n_items"),
          array_join(array_sort(collect_set("l_returnflag")), ",").as("flags"))
        .withColumnRenamed("l_orderkey", "orderkey")
    }),
    "q07_union_recover" -> ((s, dir) => {
      val t = Tables(s, dir)
      val enriched = t.events
        .filter(col("event_type").isin("click", "view"))
        .withColumn("k", get_json_object(col("props"), "$.k").cast("int"))
      Dating.recoverUndated(enriched, t.events, "event_id")
        .groupBy("event_type")
        .agg(
          count(lit(1)).as("n"),
          count(col("k")).as("n_k"),
          sum("k").cast("bigint").as("sum_k"))
    }),
    "q08_dated_counts" -> ((s, dir) => {
      val t = Tables(s, dir)
      val sparse = t.lineitem
        .withColumn("datasourceId", col("l_returnflag"))
        .withColumn("year",
          when(col("l_returnflag") === "R", year(col("l_shipdate")).cast("int"))
            .when(col("l_linenumber") <= 2, year(col("l_shipdate")).cast("int") - 1))
      Dating.datedCounts(sparse)
    }),
    "q09_peaks" -> ((s, dir) => {
      val t = Tables(s, dir)
      val overall = AssociationScore.overall(
        AssociationScore.byDatasource(t.evidence), t.weights)
      Novelty.peaks(overall, Seq("diseaseId", "targetId"))
        .withColumn("peak", round(col("peak"), 4))
        .filter(col("peak") > 0)
        .select("diseaseId", "targetId", "peakYear", "peak")
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
    "q04_novelty_datasource" ->
      s"""WITH $BySourceSql,
         |peaks AS (
         |  SELECT diseaseId, targetId, datasourceId, year AS peakYear,
         |         coalesce(score, 0) - lag(coalesce(score, 0)) OVER (
         |           PARTITION BY diseaseId, targetId, datasourceId ORDER BY year) AS peak
         |  FROM bysource
         |),
         |decayed AS (
         |  SELECT diseaseId, targetId, datasourceId, peakYear + d.delta AS year,
         |         round(max(peak / (1 + exp(2.0 * (d.delta - 2.0)))), 3) AS novelty
         |  FROM peaks CROSS JOIN (SELECT unnest(range(0, 11)) AS delta) d
         |  WHERE peak > 0
         |  GROUP BY 1, 2, 3, 4
         |)
         |SELECT b.diseaseId, b.targetId, b.datasourceId,
         |       CASE WHEN b.year = 2002 THEN NULL ELSE b.year END AS year,
         |       round(b.score, 4) AS score,
         |       coalesce(n.novelty, 0.0) AS novelty
         |FROM bysource b
         |LEFT JOIN decayed n
         |  ON n.diseaseId = b.diseaseId AND n.targetId = b.targetId
         | AND n.datasourceId = b.datasourceId AND n.year = b.year""".stripMargin,
    "q05_indirect" ->
      s"""WITH $EvSql,
         |ont AS (
         |  SELECT s.s_suppkey AS id,
         |         [CAST(s.s_suppkey AS BIGINT),
         |          CAST(s.s_nationkey + 100 AS BIGINT),
         |          CAST(n.n_regionkey + 200 AS BIGINT)] AS nodes
         |  FROM supplier s JOIN nation n ON s.s_nationkey = n.n_nationkey
         |),
         |prop AS (
         |  SELECT unnest(o.nodes) AS diseaseId, e.targetId, e.datasourceId, e.score
         |  FROM ev e JOIN ont o ON e.diseaseId = o.id
         |)
         |SELECT diseaseId, datasourceId,
         |       CAST(count(*) AS BIGINT) AS n_evidence,
         |       round(sum(score), 4) AS sum_score
         |FROM prop GROUP BY 1, 2""".stripMargin,
    "q06_evidence_dating" ->
      """WITH candidates AS (
        |  SELECT l.l_orderkey, l.l_returnflag,
        |         CASE WHEN l.l_returnflag = 'R'
        |              THEN CAST(year(l.l_shipdate) AS INT) END AS studyYear,
        |         CASE WHEN l.l_linenumber <= 2
        |              THEN CAST(year(l.l_shipdate) AS INT) - 1 END AS curationYear,
        |         CAST(year(o.o_orderdate) AS INT) AS orderYear
        |  FROM lineitem l LEFT JOIN orders o ON l.l_orderkey = o.o_orderkey
        |)
        |SELECT l_orderkey AS orderkey,
        |       min(coalesce(studyYear, curationYear, orderYear)) AS year,
        |       CAST(count(*) AS BIGINT) AS n_items,
        |       array_to_string(list_sort(list_distinct(list(l_returnflag))), ',') AS flags
        |FROM candidates GROUP BY 1""".stripMargin,
    "q07_union_recover" ->
      """WITH enriched AS (
        |  SELECT *, CAST(json_extract_string(props, '$.k') AS INT) AS k
        |  FROM events WHERE event_type IN ('click', 'view')
        |),
        |recovered AS (
        |  SELECT * FROM enriched
        |  UNION ALL
        |  SELECT e.*, NULL AS k FROM events e
        |  ANTI JOIN enriched en ON e.event_id = en.event_id
        |)
        |SELECT event_type,
        |       CAST(count(*) AS BIGINT) AS n,
        |       CAST(count(k) AS BIGINT) AS n_k,
        |       CAST(sum(k) AS BIGINT) AS sum_k
        |FROM recovered GROUP BY 1""".stripMargin,
    "q08_dated_counts" ->
      """WITH sparse AS (
        |  SELECT l_returnflag AS datasourceId,
        |         CASE WHEN l_returnflag = 'R' THEN CAST(year(l_shipdate) AS INT)
        |              WHEN l_linenumber <= 2 THEN CAST(year(l_shipdate) AS INT) - 1
        |         END AS year
        |  FROM lineitem
        |)
        |SELECT datasourceId,
        |       CAST(count(*) AS BIGINT) AS n_evidence,
        |       CAST(count(year) AS BIGINT) AS n_dated
        |FROM sparse GROUP BY 1""".stripMargin,
    "q09_peaks" ->
      s"""WITH $OverallSql,
         |peaks AS (
         |  SELECT diseaseId, targetId, year AS peakYear,
         |         coalesce(score, 0) - lag(coalesce(score, 0)) OVER (
         |           PARTITION BY diseaseId, targetId ORDER BY year) AS peak
         |  FROM overall
         |)
         |SELECT diseaseId, targetId, peakYear, round(peak, 4) AS peak
         |FROM peaks WHERE round(peak, 4) > 0""".stripMargin,
  )
}
